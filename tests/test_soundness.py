"""Soundness (negative) tests, mirroring reference
tests/integration_tests.rs:207-357: tampered public inputs, traces and
options must fail verification.  Also determinism: identical inputs yield
byte-identical proofs regardless of repetition (the reference gets this from
rayon-purity; we get it from JAX purity — asserted here)."""

import pytest

from lambdaworks_cairo_prover_tpu.cairo.air import (
    generate_cairo_proof,
    verify_cairo_proof,
)
from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof


@pytest.fixture(scope="module")
def fib_proof():
    main_trace, pub_inputs = generate_prover_args(fibonacci_program(5))
    options = ProofOptions.default_test_options()
    proof = generate_cairo_proof(main_trace, pub_inputs, options)
    return main_trace, pub_inputs, options, proof


def test_baseline_verifies(fib_proof):
    _, pub_inputs, options, proof = fib_proof
    assert verify_cairo_proof(proof, pub_inputs, options)


def test_corrupted_public_memory_fails(fib_proof):
    # integration_tests.rs:207-224: change a public memory cell
    _, pub_inputs, options, proof = fib_proof
    import copy

    bad = copy.deepcopy(pub_inputs)
    first_addr = next(iter(bad.public_memory))
    bad.public_memory[first_addr] = (bad.public_memory[first_addr] + 1)
    assert not verify_cairo_proof(proof, bad, options)


def test_wrong_rc_bounds_fail(fib_proof):
    # integration_tests.rs:226-241
    _, pub_inputs, options, proof = fib_proof
    import copy

    bad = copy.deepcopy(pub_inputs)
    bad.range_check_min = bad.range_check_min + 1
    assert not verify_cairo_proof(proof, bad, options)

    bad2 = copy.deepcopy(pub_inputs)
    bad2.range_check_max = bad2.range_check_max - 1
    assert not verify_cairo_proof(proof, bad2, options)


def test_mismatched_options_fail(fib_proof):
    # integration_tests.rs:340-357: different security params
    _, pub_inputs, options, proof = fib_proof
    other = ProofOptions(
        blowup_factor=options.blowup_factor,
        fri_number_of_queries=options.fri_number_of_queries + 2,
        coset_offset=options.coset_offset,
        grinding_factor=options.grinding_factor,
    )
    assert not verify_cairo_proof(proof, pub_inputs, other)


def test_tampered_nonce_fails(fib_proof):
    _, pub_inputs, options, proof = fib_proof
    import copy

    bad = copy.deepcopy(proof)
    bad.nonce += 1
    # challenge stream diverges -> every downstream check breaks
    assert not verify_cairo_proof(bad, pub_inputs, options)


def test_tampered_trace_commitment_fails(fib_proof):
    _, pub_inputs, options, proof = fib_proof
    import copy

    bad = copy.deepcopy(proof)
    root = bytearray(bad.lde_trace_merkle_roots[0])
    root[0] ^= 1
    bad.lde_trace_merkle_roots[0] = bytes(root)
    assert not verify_cairo_proof(bad, pub_inputs, options)


def test_determinism_same_inputs_same_bytes(fib_proof):
    main_trace, pub_inputs, options, proof = fib_proof
    proof2 = generate_cairo_proof(main_trace, pub_inputs, options)
    assert serialize_proof(proof) == serialize_proof(proof2)


def test_truncated_openings_rejected_not_crash(fib_proof):
    """A proof with fewer deep_poly_openings / shorter auth paths than the
    query count must be REJECTED, not raise (the batched native Merkle fold
    requires regular batches; adversarial shapes take the safe path)."""
    _, pub_inputs, options, proof = fib_proof
    import copy

    bad = copy.deepcopy(proof)
    bad.deep_poly_openings = bad.deep_poly_openings[:-1]
    assert not verify_cairo_proof(bad, pub_inputs, options)

    bad2 = copy.deepcopy(proof)
    bad2.query_list[0].layers_auth_paths[0] = (
        bad2.query_list[0].layers_auth_paths[0][:-1])
    assert not verify_cairo_proof(bad2, pub_inputs, options)

    bad3 = copy.deepcopy(proof)
    bad3.deep_poly_openings[0].lde_composition_poly_proof[0] = b"\x00" * 16
    assert not verify_cairo_proof(bad3, pub_inputs, options)
