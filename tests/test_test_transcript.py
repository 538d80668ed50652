"""Deterministic TestTranscript plumbing (the reference's `test_fiat_shamir`
feature, prover.rs:85-88 / verifier.rs:31-34): prover and verifier agree
under any shared transcript implementation, and the counter transcript is
hash-independent."""

from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
    FibonacciAIR,
    FibonacciPublicInputs,
    fibonacci_trace,
)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.prove import prove
from lambdaworks_cairo_prover_tpu.transcript import (
    DefaultTranscript,
    TestTranscript,
)
from lambdaworks_cairo_prover_tpu.verifier.verify import verify


def test_prove_verify_with_test_transcript():
    trace = fibonacci_trace([1, 1], 32)
    options = ProofOptions.default_test_options()
    pub = FibonacciPublicInputs(a0=1, a1=1)
    proof = prove(trace, pub, options, FibonacciAIR,
                  transcript_factory=TestTranscript)
    assert verify(proof, pub, options, FibonacciAIR,
                  transcript_factory=TestTranscript)
    # a proof built under the counter transcript must NOT verify under the
    # keccak transcript (challenges differ)
    assert not verify(proof, pub, options, FibonacciAIR,
                      transcript_factory=DefaultTranscript)


def test_test_transcript_sequence():
    t = TestTranscript()
    t.append(b"ignored")
    assert t.challenge() == (0).to_bytes(32, "big")
    assert t.challenge() == (1).to_bytes(32, "big")
