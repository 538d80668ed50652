"""Merkle trees over batched device Keccak-256.

Mirrors lambdaworks-crypto `MerkleTree` with the two backends used by the
reference (config.rs:10-20):
  * ``build_single``  — `Keccak256Tree`: leaf = Keccak256(felt BE bytes)
  * ``build_batch``   — `BatchKeccak256Tree`: leaf = Keccak256(row of felts, BE)
Inner node = Keccak256(left_digest || right_digest).  Proof verification uses
the index-parity rule (even index -> value on the left), matching
lambdaworks `Proof::verify`.

All leaf/level hashing runs on device; proof extraction gathers the few
sibling digests per query level-by-level in one device op each.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import jax

from . import keccak_device as kd
from .keccak_host import keccak256, merkle_fold


@jax.jit
def _gather_rows(level, idx):
    return jnp.take(level, idx, axis=0)


@jax.jit
def _gather_levels(levels, idxs):
    """One fused gather of per-level sibling digests: a single dispatch and
    a single host transfer per get_proofs call instead of one per tree
    level (which over a remote-tunnel link dominates query time)."""
    return jnp.concatenate(
        [jnp.take(lv, ix, axis=0) for lv, ix in zip(levels, idxs)], axis=0
    )


class MerkleTree:
    def __init__(self, levels):
        # levels[0] = leaf digests (n, 8) ... levels[-1] = root (1, 8)
        self.levels = levels
        self._root_bytes = None

    @classmethod
    def build_batch(cls, limbs: jnp.ndarray, n_cols: int) -> "MerkleTree":
        """limbs: (16, n_rows, n_cols) row-leaf tree."""
        leaves = kd.hash_felt_rows(limbs, n_cols)
        return cls._build_from_leaves(leaves)

    @classmethod
    def build_single(cls, limbs: jnp.ndarray) -> "MerkleTree":
        """limbs: (16, n) single-felt-leaf tree."""
        leaves = kd.hash_felt_leaves(limbs)
        return cls._build_from_leaves(leaves)

    @classmethod
    def _build_from_leaves(cls, leaves: jnp.ndarray) -> "MerkleTree":
        levels = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = kd.hash_digest_pairs(cur)
            levels.append(cur)
        return cls(levels)

    @property
    def root(self) -> bytes:
        # cached: prove() reads each root twice (transcript append + proof
        # container) and every fetch is a synchronous tunnel round trip
        if self._root_bytes is None:
            from ..parallel.sharding import fetch_np

            self._root_bytes = kd.digest_to_bytes(fetch_np(self.levels[-1])[0])
        return self._root_bytes

    def get_proof(self, index: int) -> list[bytes]:
        return self.get_proofs([index])[0]

    def get_proofs(self, indices: list[int]) -> list[list[bytes]]:
        """Authentication paths (sibling digests leaf->root) for each index."""
        q = len(indices)
        if q == 0:
            return []
        sib_idxs = []
        idxs = list(indices)
        for _ in self.levels[:-1]:
            sib_idxs.append([i ^ 1 for i in idxs])
            idxs = [i >> 1 for i in idxs]
        if isinstance(self.levels[0], np.ndarray):
            # host-resident levels: pure-numpy gather — a jitted gather here
            # would round-trip megabytes through the accelerator per call
            sibs = np.concatenate(
                [lv[ix] for lv, ix in zip(self.levels[:-1], sib_idxs)], axis=0
            )
        else:
            # device-resident levels: one fused gather dispatch + one small
            # transfer (q digests per level), never the full tree
            from ..parallel.sharding import fetch_np

            sibs = fetch_np(
                _gather_levels(
                    tuple(self.levels[:-1]),
                    tuple(jnp.asarray(ix) for ix in sib_idxs),
                )
            )
        paths = [[] for _ in range(q)]
        for li in range(len(self.levels) - 1):
            for qi in range(q):
                paths[qi].append(kd.digest_to_bytes(sibs[li * q + qi]))
        return paths


def fetch_tree(levels) -> MerkleTree:
    """A MerkleTree over device-resident level arrays.

    Nothing is transferred at build time; `root` fetches 32 bytes and
    `get_proofs` gathers only the queried sibling digests on device (one
    dispatch + one small transfer).  Naive per-level full-tree fetches cost
    a synchronous tunnel round trip per level and ~2n digests of bandwidth
    per tree — ~130 MB per 2^19-LDE proof — and dominated commit time on
    remote TPUs."""
    return MerkleTree(list(levels))


def verify_proof(root: bytes, index: int, leaf_hash: bytes, path: list[bytes]) -> bool:
    """Host-side path verification (lambdaworks `Proof::verify` semantics)."""
    return merkle_fold(leaf_hash, path, index) == root


def hash_leaf_felts_host(felt_ints: list[int]) -> bytes:
    """Host leaf hash of a row of felts (BE bytes concatenated)."""
    return keccak256(b"".join(v.to_bytes(32, "big") for v in felt_ints))
