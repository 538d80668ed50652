"""On-hardware NTT regression tier (LCP_TPU_TESTS=1): the Mosaic kernels
only lower on a real TPU, so the CPU suite exercises them in interpreter
mode only — these tests are the hardware truth check (round-4 review ask
#9).  Run in the bench session:

    LCP_TPU_TESTS=1 python -m pytest tests/test_tpu_ntt.py -q

Covers: fused-vs-XLA-four-step value identity on non-periodic input at
2^17 and 2^20, a host-math cross-check at 2^12, and proof-byte identity
of a full Cairo prove with the fused path on vs off."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("LCP_TPU_TESTS"),
    reason="on-hardware tier (set LCP_TPU_TESTS=1 on a TPU host)",
)


def _random_limbs(n, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint16)
    raw = raw.astype(np.uint32)
    raw[15] &= 0x3FF  # valid felts
    return raw


@pytest.mark.parametrize("log_n", [17, 20])
def test_fused_matches_four_step_on_tpu(log_n):
    import jax.numpy as jnp

    from lambdaworks_cairo_prover_tpu.ntt import core as nttc
    from lambdaworks_cairo_prover_tpu.ntt import fused as fmod

    x = jnp.asarray(_random_limbs(1 << log_n))
    orig = fmod.use_fused
    try:
        fmod.use_fused = lambda lg: True
        y_fused = np.asarray(nttc.ntt(x))
        fmod.use_fused = lambda lg: False
        y_xla = np.asarray(nttc.ntt(x))
    finally:
        fmod.use_fused = orig
    assert np.array_equal(y_fused, y_xla)


def test_ntt_matches_host_math():
    """Device forward NTT vs an independent host-bigint DFT on a random
    size-2^12 input (evaluation convention: out[i] = p(w^i))."""
    import jax.numpy as jnp

    from lambdaworks_cairo_prover_tpu.field import device as fd
    from lambdaworks_cairo_prover_tpu.field.params import (
        P,
        get_primitive_root_of_unity,
    )
    from lambdaworks_cairo_prover_tpu.ntt import core as nttc
    from lambdaworks_cairo_prover_tpu.prover.prove import _host_fft

    log_n = 12
    n = 1 << log_n
    raw = _random_limbs(n, seed=3)
    vals = fd.to_ints(raw)
    x = jnp.asarray(fd.to_mont(jnp.asarray(raw)))
    got = fd.to_ints(np.asarray(nttc.ntt(x)), mont=True)
    want = _host_fft(vals, get_primitive_root_of_unity(log_n))
    assert got == want


def test_proof_bytes_fused_on_off():
    """Full Cairo prove with the fused NTT path on vs off: identical
    proof bytes (the fused path must be a pure performance choice)."""
    from lambdaworks_cairo_prover_tpu.cairo.air import generate_cairo_proof
    from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
    from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
    from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
    from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof
    from lambdaworks_cairo_prover_tpu.prover import kernels as pk

    trace, pub = generate_prover_args(fibonacci_program(500))
    options = ProofOptions.default_test_options()

    def prove_with(fused_env):
        old = os.environ.get("LCP_FUSED_NTT")
        os.environ["LCP_FUSED_NTT"] = fused_env
        pk._KERNEL_CACHE.clear()  # ntt tables are baked at kernel build
        try:
            return serialize_proof(
                generate_cairo_proof(trace, pub, options))
        finally:
            if old is None:
                os.environ.pop("LCP_FUSED_NTT", None)
            else:
                os.environ["LCP_FUSED_NTT"] = old
            pk._KERNEL_CACHE.clear()

    assert prove_with("1") == prove_with("0")
