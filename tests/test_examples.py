"""Prove+verify for the remaining example AIRs
(reference tests/integration_tests.rs:36-112, 174-204)."""

from lambdaworks_cairo_prover_tpu.air.examples.dummy_air import DummyAIR, dummy_trace
from lambdaworks_cairo_prover_tpu.air.examples.fibonacci_2_columns import (
    Fibonacci2ColsAIR,
    Fibonacci2PublicInputs,
    fibonacci_trace_2_columns,
)
from lambdaworks_cairo_prover_tpu.air.examples.fibonacci_rap import (
    FibonacciRAP,
    FibonacciRAPPublicInputs,
    fibonacci_rap_trace,
)
from lambdaworks_cairo_prover_tpu.air.examples.quadratic_air import (
    QuadraticAIR,
    QuadraticPublicInputs,
    quadratic_trace,
)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.prove import prove
from lambdaworks_cairo_prover_tpu.verifier.verify import verify

OPTIONS = ProofOptions.default_test_options()


def test_fibonacci_2_columns():
    trace = fibonacci_trace_2_columns([1, 1], 16)
    pub = Fibonacci2PublicInputs(a0=1, a1=1)
    proof = prove(trace, pub, OPTIONS, Fibonacci2ColsAIR)
    assert verify(proof, pub, OPTIONS, Fibonacci2ColsAIR)


def test_quadratic_air():
    trace = quadratic_trace(3, 16)
    pub = QuadraticPublicInputs(a0=3)
    proof = prove(trace, pub, OPTIONS, QuadraticAIR)
    assert verify(proof, pub, OPTIONS, QuadraticAIR)


def test_dummy_air():
    trace = dummy_trace(16)
    proof = prove(trace, None, OPTIONS, DummyAIR)
    assert verify(proof, None, OPTIONS, DummyAIR)


def test_fibonacci_rap():
    steps = 16
    trace = fibonacci_rap_trace([1, 1], steps)
    pub = FibonacciRAPPublicInputs(steps=steps, a0=1, a1=1)
    proof = prove(trace, pub, OPTIONS, FibonacciRAP)
    assert verify(proof, pub, OPTIONS, FibonacciRAP)
