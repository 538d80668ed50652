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
