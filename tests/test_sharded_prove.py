"""Mesh-shape invariance: proof bytes must be identical for any sharding
(SURVEY §7.7 key invariant).  Runs on the virtual 8-device CPU mesh."""

import jax
import pytest

from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
    FibonacciAIR,
    FibonacciPublicInputs,
    fibonacci_trace,
)
from lambdaworks_cairo_prover_tpu.parallel.sharding import make_mesh
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof
from lambdaworks_cairo_prover_tpu.prover.prove import prove
from lambdaworks_cairo_prover_tpu.verifier.verify import verify


def _cpu_devices():
    try:
        return jax.devices("cpu")
    except RuntimeError:
        return []


@pytest.mark.skipif(len(_cpu_devices()) < 8, reason="needs 8 cpu devices")
def test_proof_bytes_mesh_invariant():
    """Column-sharded layout (shard_axis="columns"); the domain-sharded
    layout's mesh invariance is covered by tests/test_domain_sharded.py."""
    trace = fibonacci_trace([1, 1], 32)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()

    proof_single = prove(trace, pub, options, FibonacciAIR)
    mesh = make_mesh(8, devices=_cpu_devices())
    trace2 = fibonacci_trace([1, 1], 32)
    proof_sharded = prove(trace2, pub, options, FibonacciAIR, mesh=mesh,
                          shard_axis="columns")

    assert serialize_proof(proof_single) == serialize_proof(proof_sharded)
    assert verify(proof_sharded, pub, options, FibonacciAIR)


def test_unknown_shard_axis_rejected():
    from lambdaworks_cairo_prover_tpu.prover.prove import ProvingError

    trace = fibonacci_trace([1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    with pytest.raises(ProvingError, match="shard_axis"):
        prove(trace, pub, options, FibonacciAIR, shard_axis="column")
