"""Device field arithmetic vs exact python-int arithmetic."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field import host as fh
from lambdaworks_cairo_prover_tpu.field.params import P, get_primitive_root_of_unity

rng = random.Random(1234)


def rand_felts(n):
    vals = [rng.randrange(P) for _ in range(n)]
    # sprinkle edge cases
    edge = [0, 1, 2, P - 1, P - 2, (P - 1) // 2, 1 << 251, 17 << 192]
    for i, e in enumerate(edge[: min(len(edge), n)]):
        vals[i] = e
    return vals


def test_roundtrip():
    vals = rand_felts(32)
    arr = fd.from_ints(vals)
    assert fd.to_ints(arr) == vals
    arr2 = fd.from_ints(vals, mont=False)
    assert fd.to_ints(arr2, mont=False) == vals


def test_add_sub_mul():
    a_vals = rand_felts(64)
    b_vals = rand_felts(64)[::-1]
    a = jnp.asarray(fd.from_ints(a_vals))
    b = jnp.asarray(fd.from_ints(b_vals))

    got_add = fd.to_ints(fd.add(a, b))
    got_sub = fd.to_ints(fd.sub(a, b))
    got_mul = fd.to_ints(fd.mul(a, b))
    for i, (x, y) in enumerate(zip(a_vals, b_vals)):
        assert got_add[i] == (x + y) % P
        assert got_sub[i] == (x - y) % P
        assert got_mul[i] == (x * y) % P


def test_neg_square_eq():
    vals = rand_felts(16)
    a = jnp.asarray(fd.from_ints(vals))
    assert fd.to_ints(fd.neg(a)) == [(-v) % P for v in vals]
    assert fd.to_ints(fd.square(a)) == [v * v % P for v in vals]
    assert bool(fd.eq(a, a).all())
    assert list(np.asarray(fd.is_zero(a))) == [v == 0 for v in vals]


def test_inv_and_batch_inverse():
    vals = rand_felts(40)
    a = jnp.asarray(fd.from_ints(vals))
    got = fd.to_ints(fd.inv(a))
    for v, g in zip(vals, got):
        assert g == (pow(v, P - 2, P))

    got_b = fd.to_ints(fd.batch_inverse(a, chunk=8))
    for v, g in zip(vals, got_b):
        assert g == (pow(v, P - 2, P) if v else 0)


def test_pow_u64():
    vals = rand_felts(8)
    a = jnp.asarray(fd.from_ints(vals))
    for e in [1, 2, 3, 7, 1023]:
        got = fd.to_ints(fd.pow_u64(a, e))
        assert got == [pow(v, e, P) for v in vals]


def test_powers_table():
    w = get_primitive_root_of_unity(4)
    tab = fd.powers(w, 16)
    got = fd.to_ints(tab)
    assert got == [pow(w, i, P) for i in range(16)]


def test_host_helpers():
    v = rng.randrange(P)
    assert fh.from_bytes_be(fh.to_bytes_be(v)) == v
    assert fh.from_bytes_le(fh.to_bytes_le(v)) == v
    vals = rand_felts(10)
    invs = fh.batch_inverse(vals)
    for v, g in zip(vals, invs):
        assert g == (pow(v, P - 2, P) if v else 0)


def test_randomness_to_field_reference_vectors():
    # reference src/starks/transcript.rs:97-137
    r1 = bytes([248] + [0] * 30 + [32])
    assert fh.randomness_to_field(r1) == 32
    r2 = bytes([255, 0] * 16)
    expected = int(
        "0700FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00FF00", 16
    )
    assert fh.randomness_to_field(r2) == expected


def test_prefix_product_matches_host():
    """Blocked device prefix product == host cumulative product (the aux
    RAP permutation columns are built from this; associative_scan's full
    width XLA muls OOM'd the chip at 2^19 rows — see field/device.py)."""
    import numpy as np

    from lambdaworks_cairo_prover_tpu.field import device as fd
    from lambdaworks_cairo_prover_tpu.field.params import P

    rng = np.random.default_rng(7)
    for n in (1, 5, 256, 1000, 2048):
        vals = [int(v) for v in rng.integers(1, 1 << 63, size=n)]
        x = jnp.asarray(fd.from_ints(vals))
        got = fd.to_ints(np.asarray(fd.prefix_product(x)))
        want, acc = [], 1
        for v in vals:
            acc = acc * v % P
            want.append(acc)
        assert got == want, f"prefix_product mismatch at n={n}"
