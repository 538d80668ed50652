"""Builtin runners with memory deduction (cairo-vm semantics).

The reference executes programs through the `cairo-vm` crate
(/root/reference/src/cairo/runner/run.rs:76-101), whose builtin runners
deduce the output cells of each builtin instance when they are first read
(`deduce_memory_cell`).  This module implements those deduction rules for
the auto-deduction builtins covered by the prover's layouts
(cairo_layout.rs:2-29):

  * ``bitwise``  — 5 cells/instance: [x, y, x & y, x ^ y, x | y]
  * ``pedersen`` — 3 cells/instance: [a, b, H(a, b)] with H the
    STARK-curve Pedersen hash (curve y^2 = x^3 + x + BETA over the
    Stark252 prime; constant points are the standard cairo-lang
    `pedersen_params` values, validated against the canonical vector
    H(1, 2) = 0x5bb9440e27889a364bcb678b1f679ecd1347acdedcbf36e83494f857cc58026)
  * ``ec_op``    — 7 cells/instance: [px, py, qx, qy, m, rx, ry] with
    (rx, ry) = P + m * Q on the same curve

Deduced cells are written back into the builtin segment, so they reach the
relocated memory and flow into the proof through the memory argument
exactly like instruction-accessed cells (execution_trace.rs:195-255).
"""

from __future__ import annotations

from ..field.params import P

# ---------------------------------------------------------------------------
# STARK curve + Pedersen constants (cairo-lang pedersen_params)
# ---------------------------------------------------------------------------

ALPHA = 1
BETA = 0x6F21413EFBE40DE150E596D72F7A8C5609AD26C15C915C1F4CDFCB99CEE9E89

SHIFT_POINT = (
    0x49EE3EBA8C1600700EE1B87EB599F16716B0B1022947733551FDE4050CA6804,
    0x3CA0CFE4B3BC6DDF346D49D06EA0ED34E621062C0E056C1D0405D266E10268A,
)
PEDERSEN_POINTS = (
    (0x234287DCBAFFE7F969C748655FCA9E58FA8120B6D56EB0C1080D17957EBE47B,
     0x3B056F100F96FB21E889527D41F4E39940135DD7A6C94CC6ED0268EE89E5615),
    (0x4FA56F376C83DB33F9DAB2656558F3399099EC1DE5E3018B7A6932DBA8AA378,
     0x3FA0984C931C9E38113E0C0E47E4401562761F92A7A23B45168F4E80FF5B54D),
    (0x4BA4CC166BE8DEC764910F75B45F74B40C690C74709E90F3AA372F0BD2D6997,
     0x40301CF5C1751F4B971E46C4EDE85FCAC5C59A5CE5AE7C48151F27B24B219C),
    (0x54302DCB0E6CC1C6E44CCA8F61A63BB2CA65048D53FB325D36FF12C49A58202,
     0x1B77B3E37D13504B348046268D8AE25CE98AD783C25561A879DCC77E99C2426),
)

_LOW_MASK = (1 << 248) - 1


def _ec_add(a, b):
    """Affine addition on y^2 = x^3 + ALPHA*x + BETA; None = infinity."""
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        m = (3 * x1 * x1 + ALPHA) * pow(2 * y1, P - 2, P) % P
    else:
        m = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (m * m - x1 - x2) % P
    y3 = (m * (x1 - x3) - y1) % P
    return (x3, y3)


def _ec_mul(k: int, pt):
    acc = None
    while k:
        if k & 1:
            acc = _ec_add(acc, pt)
        pt = _ec_add(pt, pt)
        k >>= 1
    return acc


def pedersen_hash(a: int, b: int) -> int:
    """STARK-curve Pedersen hash: x-coordinate of
    shift + a_low*P0 + a_high*P1 + b_low*P2 + b_high*P3."""
    pt = SHIFT_POINT
    for x, (p_low, p_high) in ((a, PEDERSEN_POINTS[0:2]),
                               (b, PEDERSEN_POINTS[2:4])):
        if x >> 252:
            raise ValueError(f"pedersen input {x:#x} exceeds 252 bits")
        lo, hi = x & _LOW_MASK, x >> 248
        if lo:
            pt = _ec_add(pt, _ec_mul(lo, p_low))
        if hi:
            pt = _ec_add(pt, _ec_mul(hi, p_high))
    return pt[0]


def ec_op(px: int, py: int, qx: int, qy: int, m: int):
    """r = P + m*Q on the STARK curve (cairo-vm EcOp builtin semantics)."""
    r = _ec_add((px, py), _ec_mul(m, (qx, qy)))
    if r is None:
        raise ValueError("ec_op result is the point at infinity")
    return r


# ---------------------------------------------------------------------------
# Deduction rules: (segment_cells: dict[int, value], offset) -> value | None
# ---------------------------------------------------------------------------

BITWISE_TOTAL_N_BITS = 251  # cairo-vm BitwiseBuiltinRunner default


def deduce_bitwise(cells: dict, offset: int):
    """Cells 2..4 of a 5-cell instance from inputs at 0/1."""
    index = offset % 5
    if index < 2:
        return None
    base = offset - index
    x = cells.get(base)
    y = cells.get(base + 1)
    if not isinstance(x, int) or not isinstance(y, int):
        return None
    for v in (x, y):
        if v >> BITWISE_TOTAL_N_BITS:
            raise ValueError(
                f"bitwise input {v:#x} exceeds {BITWISE_TOTAL_N_BITS} bits")
    if index == 2:
        return x & y
    if index == 3:
        return x ^ y
    return x | y


def deduce_pedersen(cells: dict, offset: int):
    """Cell 2 of a 3-cell instance: H(a, b) from inputs at 0/1."""
    if offset % 3 != 2:
        return None
    a = cells.get(offset - 2)
    b = cells.get(offset - 1)
    if not isinstance(a, int) or not isinstance(b, int):
        return None
    return pedersen_hash(a, b)


def deduce_ec_op(cells: dict, offset: int):
    """Cells 5/6 of a 7-cell instance: P + m*Q from inputs at 0..4."""
    index = offset % 7
    if index < 5:
        return None
    base = offset - index
    vals = [cells.get(base + i) for i in range(5)]
    if not all(isinstance(v, int) for v in vals):
        return None
    rx, ry = ec_op(*vals)
    return rx if index == 5 else ry


DEDUCERS = {
    "bitwise": deduce_bitwise,
    "pedersen": deduce_pedersen,
    "ec_op": deduce_ec_op,
}
