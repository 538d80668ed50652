"""Fused-stage Pallas NTT (ntt/fused.py) vs the plain XLA stage loop.

Interpreter mode on CPU: validates the DIF restructuring (contiguous-quarter
global writes + analytic block-permutation reads + VMEM-resident local
stages) against core._ntt_impl, which is itself golden-tested against
lambdaworks semantics in test_ntt.py.  Sizes cover: local-only (2^12), one
global single stage (2^13), one global pair (2^14), and pair+single (2^15),
plus a batched transform.
"""

import functools
import random

import jax
import jax.numpy as jnp
import pytest

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field.params import P
from lambdaworks_cairo_prover_tpu.ntt import core as nttc
from lambdaworks_cairo_prover_tpu.ntt import fused

rng = random.Random(7)


def _rand(shape_batch, n):
    total = n
    for d in shape_batch:
        total *= d
    vals = [rng.randrange(P) for _ in range(total)]
    arr = jnp.asarray(fd.from_ints(vals))
    return arr.reshape((16,) + shape_batch + (n,))


@functools.partial(jax.jit, static_argnames=("log_n", "inverse"))
def _fused(x, log_n, inverse):
    return fused.ntt_fused(x, log_n, inverse, interpret=True)


def _reference(x, log_n, inverse):
    return nttc._ntt_impl(x, nttc._stage_twiddles(log_n, inverse), log_n)


@pytest.mark.parametrize("log_n", [12, 13])
@pytest.mark.parametrize("inverse", [False, True])
def test_fused_matches_xla(log_n, inverse):
    x = _rand((), 1 << log_n)
    got = _fused(x, log_n, inverse)
    want = _reference(x, log_n, inverse)
    assert jnp.array_equal(got, want), f"mismatch at n=2^{log_n}"


# interpret-mode Pallas at 2^14/2^15 takes many minutes on CPU — slow tier
# only (the 2^12/2^13 fast cases above cover local stages + one global
# single stage; these add the global pair and pair+single schedules; the
# conftest _SLOW_TESTS set routes this name to the slow tier)
@pytest.mark.parametrize("log_n", [14, 15])
@pytest.mark.parametrize("inverse", [False, True])
def test_fused_matches_xla_large(log_n, inverse):
    x = _rand((), 1 << log_n)
    got = _fused(x, log_n, inverse)
    want = _reference(x, log_n, inverse)
    assert jnp.array_equal(got, want), f"mismatch at n=2^{log_n}"


def test_fused_batched():
    log_n = 13
    x = _rand((3,), 1 << log_n)
    got = _fused(x, log_n, False)
    want = _reference(x, log_n, False)
    assert jnp.array_equal(got, want)


def test_fused_roundtrip_values():
    """End-to-end value check: interpolate+evaluate through the fused path
    equals direct polynomial evaluation for a few points."""
    log_n = 12
    n = 1 << log_n
    coeff_ints = [rng.randrange(P) for _ in range(n)]
    coeffs = jnp.asarray(fd.from_ints(coeff_ints))
    evals = _fused(coeffs, log_n, False)
    w = nttc.get_primitive_root_of_unity(log_n)
    for i in (0, 1, n // 2, n - 1):
        x = pow(w, i, P)
        want = 0
        for c in reversed(coeff_ints):
            want = (want * x + c) % P
        got = fd.to_ints(evals[:, i : i + 1])[0]
        assert got == want, f"eval {i}"
