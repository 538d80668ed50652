"""Domain-sharded prover: proof bytes must be identical to single-device
for any mesh shape (VERDICT r1 item 1; SURVEY §5 long-context plan).

The LDE-domain axis of every round-1..4 tensor is block-sharded over the
mesh; NTTs run as four-step transforms with all_to_all stage transposes
(parallel/four_step.py), constraint eval / Merkle leaves / DEEP are
shard-local.  Runs on the virtual 8-device CPU mesh.
"""

import os

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


needs_mesh = pytest.mark.skipif(len(_cpu_devices()) < 8,
                                reason="needs 8 cpu devices")


@needs_mesh
def test_fibonacci_domain_sharded_bytes_invariant():
    """1024-row fib: single-device vs 8-way and 2-way domain sharding."""
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()

    proof_single = prove(fibonacci_trace([1, 1], 1024), pub, options,
                         FibonacciAIR)
    reference_bytes = serialize_proof(proof_single)

    for n_dev in (8, 2):
        mesh = make_mesh(n_dev, devices=_cpu_devices())
        proof = prove(fibonacci_trace([1, 1], 1024), pub, options,
                      FibonacciAIR, mesh=mesh, shard_axis="domain")
        assert serialize_proof(proof) == reference_bytes, (
            f"proof bytes diverge on a {n_dev}-device mesh"
        )
    assert verify(proof, pub, options, FibonacciAIR)


@needs_mesh
def test_cairo_air_domain_sharded_bytes_invariant():
    """Full Cairo AIR (aux RAP trace, 60+ columns) on the 8-device mesh."""
    from lambdaworks_cairo_prover_tpu.cairo.air import (
        generate_cairo_proof,
        verify_cairo_proof,
    )
    from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
    from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args

    options = ProofOptions.default_test_options()
    trace1, pub1 = generate_prover_args(fibonacci_program(30))
    proof_single = generate_cairo_proof(trace1, pub1, options)

    trace2, pub2 = generate_prover_args(fibonacci_program(30))
    mesh = make_mesh(8, devices=_cpu_devices())
    proof_sharded = generate_cairo_proof(trace2, pub2, options, mesh=mesh)

    assert serialize_proof(proof_single) == serialize_proof(proof_sharded)
    assert verify_cairo_proof(proof_sharded, pub1, options)


@needs_mesh
@pytest.mark.skipif(not os.environ.get("LCP_BIG_TESTS"),
                    reason="set LCP_BIG_TESTS=1 (≈30 min on CPU)")
def test_large_trace_domain_sharded():
    """2^18-row trace through the full sharded pipeline (VERDICT r1 gate)."""
    n = 1 << 18
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof_single = prove(fibonacci_trace([1, 1], n), pub, options,
                         FibonacciAIR)
    mesh = make_mesh(8, devices=_cpu_devices())
    proof_sharded = prove(fibonacci_trace([1, 1], n), pub, options,
                          FibonacciAIR, mesh=mesh, shard_axis="domain")
    assert serialize_proof(proof_single) == serialize_proof(proof_sharded)
    assert verify(proof_sharded, pub, options, FibonacciAIR)
