"""Full-file byte round-trip of the reference's golden proofs.

Reads each `benches/proofs/*.proof` file (wire format main.rs:98-102:
len(8B BE) || proof || pub_inputs), deserializes proof AND public inputs,
re-serializes both, and asserts the ENTIRE file reproduces byte-exactly —
including the pub-inputs section, whose `public_memory` entries must be
re-emitted in file (HashMap) order, not sorted (air.rs:223-449).
"""

import os

import pytest

from lambdaworks_cairo_prover_tpu.cairo.air import PublicInputs
from lambdaworks_cairo_prover_tpu.proof.serde import (
    read_proof_file,
    write_proof_file,
)

GOLDEN_DIR = "/root/reference/benches/proofs"
GOLDEN = ["fibonacci_500.proof", "fibonacci_1000.proof",
          "fibonacci_70000.proof"]


@pytest.mark.parametrize("name", GOLDEN)
def test_golden_file_roundtrips_byte_exact(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip("reference golden proofs unavailable")
    with open(path, "rb") as f:
        data = f.read()
    proof, pub_bytes = read_proof_file(data)
    pub = PublicInputs.deserialize(pub_bytes)
    out = write_proof_file(proof, pub.serialize())
    assert out == data


def test_unsorted_public_memory_preserved():
    """Deserialize -> serialize keeps an arbitrary (non-sorted) pub-memory
    order, as the reference's HashMap serialization produces."""
    pub = PublicInputs(
        pc_init=1, ap_init=2, fp_init=2, pc_final=5, ap_final=9,
        range_check_min=0, range_check_max=3,
        memory_segments={}, public_memory={7: 11, 3: 13, 5: 17},
        num_steps=4,
    )
    blob = pub.serialize()
    again = PublicInputs.deserialize(blob)
    assert list(again.public_memory.items()) == [(7, 11), (3, 13), (5, 17)]
    assert again.serialize() == blob
