"""Serialization round-trip properties (reference proptest suites:
frame.rs:183-194, fri_decommit.rs:219-243, air.rs:1489-1508): a freshly
generated proof and its public inputs must survive
serialize -> deserialize -> serialize with identical bytes."""

from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
    FibonacciAIR,
    FibonacciPublicInputs,
    fibonacci_trace,
)
from lambdaworks_cairo_prover_tpu.cairo.air import PublicInputs
from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.proof.serde import (
    deserialize_proof,
    read_proof_file,
    serialize_proof,
    write_proof_file,
)
from lambdaworks_cairo_prover_tpu.prover.prove import prove


def test_proof_roundtrip_bytes_identical():
    trace = fibonacci_trace([1, 1], 16)
    options = ProofOptions.default_test_options()
    proof = prove(trace, FibonacciPublicInputs(a0=1, a1=1), options,
                  FibonacciAIR)
    blob = serialize_proof(proof)
    proof2 = deserialize_proof(blob)
    assert serialize_proof(proof2) == blob


def test_cairo_proof_file_roundtrip():
    main_trace, pub = generate_prover_args(fibonacci_program(5))
    options = ProofOptions.default_test_options()
    from lambdaworks_cairo_prover_tpu.cairo.air import generate_cairo_proof

    proof = generate_cairo_proof(main_trace, pub, options)
    data = write_proof_file(proof, pub.serialize())
    proof2, rest = read_proof_file(data)
    pub2 = PublicInputs.deserialize(rest)
    assert write_proof_file(proof2, pub2.serialize()) == data


def test_public_inputs_roundtrip():
    _, pub = generate_prover_args(fibonacci_program(5))
    blob = pub.serialize()
    pub2 = PublicInputs.deserialize(blob)
    assert pub2.serialize() == blob
