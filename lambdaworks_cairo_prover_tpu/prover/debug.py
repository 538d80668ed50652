"""Trace validation oracle (reference src/starks/debug.rs:14-82).

Evaluates every boundary and transition constraint pointwise on the raw trace
(host python ints) and reports violations.  Intended for tests and debug runs
on small traces before any FFT work happens."""

from __future__ import annotations

from ..air.frame import HostFrame
from ..air.trace import TraceTable


def validate_trace(air, main_trace: TraceTable, aux_trace, rap_challenges) -> bool:
    cols = main_trace.to_int_columns()
    if aux_trace is not None and not aux_trace.is_empty():
        cols = cols + aux_trace.to_int_columns()
    n_rows = len(cols[0])
    ok = True

    for c in air.boundary_constraints(rap_challenges).constraints:
        actual = cols[c.col][c.step]
        if actual != c.value:
            ok = False
            print(
                f"Boundary constraint violation: col {c.col} step {c.step}: "
                f"expected {c.value}, got {actual}"
            )

    ctx = air.context
    exemption_steps = [n_rows - e for e in ctx.transition_exemptions]
    offsets = ctx.transition_offsets
    for step in range(n_rows):
        rows = [
            [cols[c][(step + o) % n_rows] for c in range(len(cols))] for o in offsets
        ]
        frame = HostFrame(rows)
        rap_fv = air.wrap_rap_challenges(frame.ctx, rap_challenges)
        evals = air.compute_transition(frame, rap_fv)
        for i, fv in enumerate(evals):
            if step < exemption_steps[i] and fv.v != 0:
                ok = False
                print(
                    f"Transition constraint {i} violated at step {step}: {fv.v}"
                )
    return ok
