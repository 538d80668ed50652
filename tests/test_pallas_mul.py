"""Fused Pallas Montgomery-mul kernel vs the XLA limb path and host ints.

Runs in interpreter mode so it validates on the CPU test mesh; the same
kernel code lowers through Mosaic on real TPUs (exercised by bench.py when
LCP_PALLAS is enabled there)."""

import random

import jax.numpy as jnp

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field import pallas_mul as pm
from lambdaworks_cairo_prover_tpu.field.params import P

rng = random.Random(99)


def test_pallas_mul_matches_host_and_xla():
    n = 3500  # forces padding to four 1024-element blocks (catches block-index bugs)
    xs = [rng.randrange(P) for _ in range(n)] + [0, 1, P - 1]
    ys = [rng.randrange(P) for _ in range(n)] + [P - 1, 0, P - 1]
    a = jnp.asarray(fd.from_ints(xs))
    b = jnp.asarray(fd.from_ints(ys))

    got = fd.to_ints(pm.mul(a, b, interpret=True))
    expected = [x * y % P for x, y in zip(xs, ys)]
    assert got == expected

    xla = fd.to_ints(fd.mul(a, b))
    assert xla == expected


def test_pallas_add_sub_match_host():
    n = 2100
    xs = [rng.randrange(P) for _ in range(n)] + [0, P - 1, P - 1]
    ys = [rng.randrange(P) for _ in range(n)] + [0, P - 1, 1]
    a = jnp.asarray(fd.from_ints(xs))
    b = jnp.asarray(fd.from_ints(ys))
    assert fd.to_ints(pm.add(a, b, interpret=True)) == [
        (x + y) % P for x, y in zip(xs, ys)]
    assert fd.to_ints(pm.sub(a, b, interpret=True)) == [
        (x - y) % P for x, y in zip(xs, ys)]


def test_pallas_butterfly_matches_host():
    n = 1300
    xs = [rng.randrange(P) for _ in range(n)]
    ys = [rng.randrange(P) for _ in range(n)]
    ws = [rng.randrange(P) for _ in range(n)]
    a = jnp.asarray(fd.from_ints(xs))
    b = jnp.asarray(fd.from_ints(ys))
    w = jnp.asarray(fd.from_ints(ws))
    o0, o1 = pm.butterfly(a, b, w, interpret=True)
    assert fd.to_ints(o0) == [(x + y * z) % P for x, y, z in zip(xs, ys, ws)]
    assert fd.to_ints(o1) == [(x - y * z) % P for x, y, z in zip(xs, ys, ws)]


def test_pallas_mul_broadcast_scalar():
    xs = [rng.randrange(P) for _ in range(64)]
    k = rng.randrange(P)
    a = jnp.asarray(fd.from_ints(xs))
    s = jnp.asarray(fd.from_int(k))
    got = fd.to_ints(pm.mul(a, s, interpret=True))
    assert got == [x * k % P for x in xs]
