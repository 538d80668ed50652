"""Keccak-256 (host + device) and Merkle tree tests."""

import random

import jax.numpy as jnp
import numpy as np

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field.params import P
from lambdaworks_cairo_prover_tpu.hash import keccak_device as kd
from lambdaworks_cairo_prover_tpu.hash.keccak_host import keccak256
from lambdaworks_cairo_prover_tpu.hash.merkle import (
    MerkleTree,
    hash_leaf_felts_host,
    verify_proof,
)

rng = random.Random(7)


def test_keccak256_known_vectors():
    # Original Keccak-256 (0x01 padding), not SHA3-256.
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block (> 136 bytes)
    msg = bytes(range(256)) * 2
    assert len(keccak256(msg)) == 32


def test_grinding_reference_vector():
    # reference src/starks/grinding.rs:54-77: nonce 33 for this challenge at factor 10
    challenge = bytes(
        [226, 27, 133, 168, 62, 203, 20, 59, 122, 230, 227, 33, 76, 44, 53, 150,
         200, 45, 136, 162, 249, 239, 142, 90, 204, 191, 45, 4, 53, 22, 103, 240]
    )
    from lambdaworks_cairo_prover_tpu.prover.grinding import (
        generate_nonce_with_grinding,
        leading_zeros_of_nonce,
    )
    nonce = generate_nonce_with_grinding(challenge, 10)
    assert nonce == 33
    assert leading_zeros_of_nonce(challenge, nonce) >= 10


def test_device_keccak_matches_host():
    vals = [rng.randrange(P) for _ in range(6)]
    arr = jnp.asarray(fd.from_ints(vals, mont=False))
    # single-felt leaves
    digests = np.asarray(kd.hash_felt_leaves(arr))
    for i, v in enumerate(vals):
        assert kd.digest_to_bytes(digests[i]) == keccak256(v.to_bytes(32, "big"))
    # rows of 3 felts
    rows = arr.reshape(16, 2, 3)
    row_digests = np.asarray(kd.hash_felt_rows(rows, 3))
    for r in range(2):
        expect = keccak256(b"".join(v.to_bytes(32, "big") for v in vals[3 * r : 3 * r + 3]))
        assert kd.digest_to_bytes(row_digests[r]) == expect
    # digest pairs
    pair_digests = np.asarray(kd.hash_digest_pairs(jnp.asarray(digests[:4])))
    for k in range(2):
        expect = keccak256(
            kd.digest_to_bytes(digests[2 * k]) + kd.digest_to_bytes(digests[2 * k + 1])
        )
        assert kd.digest_to_bytes(pair_digests[k]) == expect


def test_merkle_tree_proofs():
    n, cols = 8, 2
    vals = [rng.randrange(P) for _ in range(n * cols)]
    arr = jnp.asarray(fd.from_ints(vals, mont=False)).reshape(16, n, cols)
    tree = MerkleTree.build_batch(arr, cols)
    root = tree.root
    for idx in [0, 3, 7]:
        path = tree.get_proof(idx)
        leaf = hash_leaf_felts_host(vals[idx * cols : idx * cols + cols])
        assert verify_proof(root, idx, leaf, path)
        assert not verify_proof(root, idx ^ 1, leaf, path)

    single = MerkleTree.build_single(jnp.asarray(fd.from_ints(vals[:8], mont=False)))
    for idx in [0, 5]:
        leaf = keccak256(vals[idx].to_bytes(32, "big"))
        assert verify_proof(single.root, idx, leaf, single.get_proof(idx))


def test_transcript_basic():
    from lambdaworks_cairo_prover_tpu.transcript import (
        DefaultTranscript,
        transcript_to_field,
    )

    t1 = DefaultTranscript()
    t1.append(b"hello")
    c1 = t1.challenge()
    assert c1 == keccak256(b"hello")
    c2 = t1.challenge()
    assert c2 == keccak256(c1)
    t2 = DefaultTranscript()
    t2.append(b"hel")
    t2.append(b"lo")
    assert t2.challenge() == c1
    f = transcript_to_field(t2)
    assert 0 <= f < P


def test_native_keccak_matches_python():
    """native/libkeccak256.so vs the pure-python permutation (all padding
    paths: empty, sub-block, exact block, multi-block)."""
    import random

    from lambdaworks_cairo_prover_tpu.hash import keccak_host as kh

    if kh._NATIVE is None:
        import pytest

        pytest.skip("native keccak library not built")
    rng = random.Random(17)
    for ln in [0, 1, 32, 64, 135, 136, 137, 272, 1000]:
        data = bytes(rng.randrange(256) for _ in range(ln))
        assert kh.keccak256(data) == kh._keccak256_py(data)


def test_batch_helpers_match_scalar_paths():
    """keccak256_batch / merkle_fold / merkle_fold_batch vs their scalar
    definitions, including the ragged-batch python fallbacks."""
    import random

    from lambdaworks_cairo_prover_tpu.hash import keccak_host as kh

    rng = random.Random(23)
    msgs = [bytes(rng.randrange(256) for _ in range(64)) for _ in range(7)]
    assert kh.keccak256_batch(msgs) == [kh.keccak256(m) for m in msgs]
    ragged = msgs + [b"xy"]
    assert kh.keccak256_batch(ragged) == [kh.keccak256(m) for m in ragged]
    assert kh.keccak256_batch([]) == []

    def fold_py(leaf, path, idx):
        h = leaf
        for sib in path:
            h = (kh.keccak256(h + sib) if idx % 2 == 0
                 else kh.keccak256(sib + h))
            idx >>= 1
        return h

    leaves, paths, idxs = [], [], []
    for _ in range(9):
        leaves.append(bytes(rng.randrange(256) for _ in range(32)))
        paths.append([bytes(rng.randrange(256) for _ in range(32))
                      for _ in range(5)])
        idxs.append(rng.randrange(1 << 5))
    want = [fold_py(lf, p, i) for lf, p, i in zip(leaves, paths, idxs)]
    assert kh.merkle_fold_batch(leaves, paths, idxs) == want
    assert [kh.merkle_fold(lf, p, i)
            for lf, p, i in zip(leaves, paths, idxs)] == want
    # ragged depths -> per-path fallback
    paths[3] = paths[3][:2]
    want[3] = fold_py(leaves[3], paths[3], idxs[3])
    assert kh.merkle_fold_batch(leaves, paths, idxs) == want
