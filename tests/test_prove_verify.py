"""End-to-end prove + verify for the example AIRs
(mirrors reference tests/integration_tests.rs:36-112)."""

from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
    FibonacciAIR,
    FibonacciPublicInputs,
    fibonacci_trace,
)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.prove import prove
from lambdaworks_cairo_prover_tpu.verifier.verify import verify


def test_prove_verify_simple_fibonacci():
    trace = fibonacci_trace([1, 1], 8)
    pub_inputs = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(trace, pub_inputs, options, FibonacciAIR)
    assert verify(proof, pub_inputs, options, FibonacciAIR)


def test_wrong_pub_inputs_fails():
    trace = fibonacci_trace([1, 1], 8)
    options = ProofOptions.default_test_options()
    proof = prove(trace, FibonacciPublicInputs(a0=1, a1=1), options, FibonacciAIR)
    assert not verify(proof, FibonacciPublicInputs(a0=2, a1=1), options, FibonacciAIR)


def test_four_step_prover_path_bytes_identical(monkeypatch):
    """End-to-end prove with the four-step NTT plan engaged inside the
    jitted kernels (table injection path: ("four", log, inv) keys flow
    through ProverKernels.ntt_tables -> inject_tables).  Production only
    engages it at LDE >= 2^17; lowering the threshold exercises it cheaply
    and proof bytes must match the flat-schedule prover exactly."""
    from lambdaworks_cairo_prover_tpu.ntt import core as nttc
    from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof
    from lambdaworks_cairo_prover_tpu.prover import kernels as pk

    trace = fibonacci_trace([1, 1], 128)  # LDE = 512 = 2^9
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    baseline = serialize_proof(prove(trace, pub, options, FibonacciAIR))

    monkeypatch.setattr(nttc, "FOUR_STEP_MIN_LOG", 8)
    pk._KERNEL_CACHE.clear()
    try:
        proof = prove(fibonacci_trace([1, 1], 128), pub, options,
                      FibonacciAIR)
        assert serialize_proof(proof) == baseline
        assert verify(proof, pub, options, FibonacciAIR)
    finally:
        pk._KERNEL_CACHE.clear()


def test_device_fri_chain_bytes_identical(monkeypatch):
    """All three FRI-commit execution strategies must produce byte-identical
    proofs: (a) full device chain incl. final fold (production default at
    N <= 2^_FULL_CHAIN_MAX_LOG), (b) partial chain + host tail, (c) no
    chain at all (per-layer device folds + host tail)."""
    from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof
    from lambdaworks_cairo_prover_tpu.prover import prove as pv

    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    full = serialize_proof(
        pv.prove(fibonacci_trace([1, 1], 128), pub, options, FibonacciAIR))

    monkeypatch.setattr(pv, "_FULL_CHAIN_MAX_LOG", 0)
    monkeypatch.setattr(pv, "_HOST_FRI_THRESHOLD", 64)  # 2 device folds
    partial_proof = pv.prove(fibonacci_trace([1, 1], 128), pub, options,
                             FibonacciAIR)
    assert serialize_proof(partial_proof) == full

    monkeypatch.setattr(pv, "_HOST_FRI_THRESHOLD", 1 << 20)  # chain disabled
    nochain_proof = pv.prove(fibonacci_trace([1, 1], 128), pub, options,
                             FibonacciAIR)
    assert serialize_proof(nochain_proof) == full
    assert verify(nochain_proof, pub, options, FibonacciAIR)
