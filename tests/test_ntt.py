"""NTT / LDE vs direct python-int polynomial evaluation."""

import random

import jax.numpy as jnp

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field.params import P, get_primitive_root_of_unity
from lambdaworks_cairo_prover_tpu.ntt import core as nttc

rng = random.Random(99)


def eval_poly_int(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def test_ntt_matches_direct_evaluation():
    log_n = 4
    n = 1 << log_n
    coeffs = [rng.randrange(P) for _ in range(n)]
    arr = jnp.asarray(fd.from_ints(coeffs))
    evals = fd.to_ints(nttc.ntt(arr))
    w = get_primitive_root_of_unity(log_n)
    for i in range(n):
        assert evals[i] == eval_poly_int(coeffs, pow(w, i, P))


def test_intt_roundtrip():
    n = 32
    coeffs = [rng.randrange(P) for _ in range(n)]
    arr = jnp.asarray(fd.from_ints(coeffs))
    back = fd.to_ints(nttc.intt(nttc.ntt(arr)))
    assert back == coeffs


def test_evaluate_on_lde_domain():
    # mirrors reference prover.rs tests (test_evaluate_polynomial_on_lde_domain_*)
    n, blowup, offset = 8, 2, 3
    coeffs = [rng.randrange(P) for _ in range(n)]
    arr = jnp.asarray(fd.from_ints(coeffs))
    evals = fd.to_ints(nttc.evaluate_on_lde_domain(arr, blowup, n, offset))
    w = get_primitive_root_of_unity(4)  # order n*blowup = 16
    assert len(evals) == n * blowup
    for i, e in enumerate(evals):
        assert e == eval_poly_int(coeffs, offset * pow(w, i, P) % P)


def test_evaluate_on_lde_domain_edge_case_step_subsample():
    # poly = x^8, blowup 4, domain_size 8 (reference prover.rs:865-882)
    coeffs = [0] * 8 + [1]
    arr = jnp.asarray(fd.from_ints(coeffs))
    evals = fd.to_ints(nttc.evaluate_on_lde_domain(arr, 4, 8, 3))
    assert len(evals) == 32
    w = get_primitive_root_of_unity(5)  # order 32
    for i, e in enumerate(evals):
        assert e == pow(3 * pow(w, i, P) % P, 8, P)


def test_interpolate_offset_roundtrip():
    n, offset = 16, 5
    vals = [rng.randrange(P) for _ in range(n)]
    arr = jnp.asarray(fd.from_ints(vals))
    coeffs = nttc.interpolate_offset_fft(arr, offset)
    evals_back = fd.to_ints(nttc.evaluate_on_lde_domain(coeffs, 1, n, offset))
    assert evals_back == vals


def test_poly_eval_at_and_sum_reduce():
    n = 16
    coeffs = [rng.randrange(P) for _ in range(n)]
    arr = jnp.asarray(fd.from_ints(coeffs))
    x = rng.randrange(P)
    got = fd.to_int(nttc.poly_eval_at(arr, x).reshape(16, 1))
    assert got == eval_poly_int(coeffs, x)


def test_four_step_dispatch_matches_flat(monkeypatch):
    """The large-transform four-step plan (ntt/core.py::_ntt_four_impl) must
    be bit-identical to the flat radix-2/4 schedule.  Production only engages
    it at 2^17+; lowering the threshold exercises the dispatch cheaply."""
    monkeypatch.setattr(nttc, "FOUR_STEP_MIN_LOG", 8)
    log_n = 9
    n = 1 << log_n
    coeffs = [rng.randrange(P) for _ in range(n)]
    arr = jnp.asarray(fd.from_ints(coeffs)).reshape(16, 1, n)
    four = nttc.ntt(arr)
    flat = nttc._ntt_impl(arr, nttc._stage_twiddles(log_n, False), log_n)
    assert fd.to_ints(four[:, 0]) == fd.to_ints(flat[:, 0])
    back = nttc.intt(four)
    assert fd.to_ints(back[:, 0]) == coeffs
