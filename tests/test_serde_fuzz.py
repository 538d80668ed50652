"""Deserializer robustness (reference fuzz/fuzz_targets/deserialize.rs):
arbitrary and truncated/mutated bytes must raise cleanly, never crash, and
round-trips must be stable."""

import random

import pytest

from lambdaworks_cairo_prover_tpu.proof.serde import (
    DeserializeError,
    deserialize_proof,
    read_proof_file,
)

rng = random.Random(42)


def test_garbage_bytes_raise_cleanly():
    for length in [0, 1, 7, 8, 64, 255, 4096]:
        data = bytes(rng.randrange(256) for _ in range(length))
        try:
            deserialize_proof(data)
        except (DeserializeError, ValueError, OverflowError, MemoryError):
            pass


def test_truncations_of_golden_proof_raise():
    data = open("/root/reference/benches/proofs/fibonacci_500.proof", "rb").read()
    proof, rest = read_proof_file(data)  # sanity: full file parses
    proof_len = int.from_bytes(data[:8], "big")
    body = data[8 : 8 + proof_len]
    for cut in [1, 10, 100, len(body) // 2, len(body) - 1]:
        with pytest.raises((DeserializeError, ValueError, OverflowError)):
            deserialize_proof(body[:cut])


def test_bit_flips_dont_crash():
    data = open("/root/reference/benches/proofs/fibonacci_500.proof", "rb").read()
    proof_len = int.from_bytes(data[:8], "big")
    body = bytearray(data[8 : 8 + proof_len])
    for _ in range(25):
        pos = rng.randrange(len(body))
        body[pos] ^= 1 << rng.randrange(8)
        try:
            deserialize_proof(bytes(body))
        except (DeserializeError, ValueError, OverflowError, MemoryError):
            pass
