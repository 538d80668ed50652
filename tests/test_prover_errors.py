"""Typed prover-side failures (reference prover.rs:40-43, options.rs:86-91,
prover.rs:573-580)."""

import os

import pytest

from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
    FibonacciAIR,
    FibonacciPublicInputs,
    fibonacci_trace,
)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.prove import ProvingError, prove


def test_validate_trace_gate_rejects_bad_trace(monkeypatch):
    """With LCP_VALIDATE_TRACE set, a trace violating the AIR aborts the
    prover with a typed error instead of producing an unverifiable proof."""
    monkeypatch.setenv("LCP_VALIDATE_TRACE", "1")
    trace = fibonacci_trace([1, 1], 8)
    # break the fibonacci recurrence mid-trace
    from lambdaworks_cairo_prover_tpu.air.trace import TraceTable

    cols = trace.to_int_columns()
    cols[0][4] += 1
    bad_trace = TraceTable.from_int_columns(cols)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    with pytest.raises(ProvingError):
        prove(bad_trace, pub, options, FibonacciAIR)


def test_validate_trace_gate_accepts_good_trace(monkeypatch):
    monkeypatch.setenv("LCP_VALIDATE_TRACE", "1")
    trace = fibonacci_trace([1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(trace, pub, options, FibonacciAIR)
    assert proof is not None


def test_non_power_of_two_trace_rejected():
    import jax.numpy as jnp

    from lambdaworks_cairo_prover_tpu.air.trace import TraceTable
    from lambdaworks_cairo_prover_tpu.field import device as fd

    bad = TraceTable.from_int_columns([[1, 1, 2, 3, 5, 8][:6]])
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    with pytest.raises(ProvingError):
        prove(bad, pub, options, FibonacciAIR)
