"""Cairo trace builder + AIR consistency (constraint-level oracle, host-only).

Mirrors the reference debug validate_trace (src/starks/debug.rs) applied to
Cairo programs, before any proving."""

from lambdaworks_cairo_prover_tpu.cairo.air import CairoAIR, CairoRAPChallenges
from lambdaworks_cairo_prover_tpu.cairo.programs import (
    fibonacci_program,
    mul_program,
    rc_program,
    simple_program,
)
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.debug import validate_trace


def _validate(program):
    main_trace, pub_inputs = generate_prover_args(program)
    options = ProofOptions.default_test_options()
    air = CairoAIR(main_trace.n_rows, pub_inputs, options)
    challenges = CairoRAPChallenges(
        alpha_memory=12345, z_memory=67890, z_range_check=13579
    )
    aux = air.build_auxiliary_trace(main_trace, challenges)
    assert aux.n_cols == air.number_auxiliary_rap_columns()
    assert validate_trace(air, main_trace, aux, challenges)
    return main_trace, pub_inputs


def test_simple_program_trace_satisfies_air():
    _validate(simple_program())


def test_mul_program_trace_satisfies_air():
    _validate(mul_program())


def test_fibonacci_trace_satisfies_air():
    trace, pub = _validate(fibonacci_program(5))
    assert trace.n_rows & (trace.n_rows - 1) == 0


def test_rc_program_trace_satisfies_air():
    trace, pub = _validate(rc_program((250, 77, 1 << 100)))
    assert "range_check" in pub.memory_segments
    assert trace.n_cols == 43


def test_device_aux_trace_matches_host():
    for program in (fibonacci_program(5), rc_program((250, 77, 1 << 100))):
        main_trace, pub_inputs = generate_prover_args(program)
        options = ProofOptions.default_test_options()
        air = CairoAIR(main_trace.n_rows, pub_inputs, options)
        challenges = CairoRAPChallenges(12345, 67890, 13579)
        aux_dev = air.build_auxiliary_trace(main_trace, challenges)
        aux_host = air.build_auxiliary_trace_host(main_trace, challenges)
        assert aux_dev.to_int_columns() == aux_host.to_int_columns()
