"""Proof-of-work grinding (reference src/starks/grinding.rs).

The nonce search runs on device in batches (vectorized Keccak over candidate
nonces), scanning from 0 upward so the found nonce is bit-identical to the
reference's linear search.  The per-nonce check on host mirrors
`hash_transcript_with_int_and_get_leading_zeros` exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..hash import keccak_device as kd
from ..hash.keccak_host import keccak256


def leading_zeros_of_nonce(challenge: bytes, nonce: int) -> int:
    """Reference grinding.rs:17-29 (trailing zeros of the BE-read u64 head)."""
    digest = keccak256(challenge + nonce.to_bytes(8, "little"))
    head = int.from_bytes(digest[:8], "big")
    if head == 0:
        return 64
    return (head & -head).bit_length() - 1


def generate_nonce_with_grinding(
    challenge: bytes, grinding_factor: int, batch: int | None = None,
    pipeline: int = 8,
) -> int:
    """Smallest u64 nonce whose grinding hash meets the factor.

    Keeps `pipeline` batches of the device search in flight before reading
    the first result: JAX dispatch is asynchronous, so the expensive part
    (the `bool(found)` sync, a full tunnel round trip on remote TPUs) is
    paid once per `pipeline` batches instead of once per batch.  Results
    are drained in launch order, preserving the reference's linear-search
    semantics (grinding.rs:40-48: the returned nonce is the smallest)."""
    if grinding_factor <= 12:
        # host path: expected few iterations
        nonce = 0
        while leading_zeros_of_nonce(challenge, nonce) < grinding_factor:
            nonce += 1
        return nonce
    if batch is None:
        # Device keccak throughput grows ~7x from 2^16- to 2^20-lane batches
        # (small batches are dispatch-bound); the expected first hit is at
        # ~0.69 * 2^factor, so size batches to finish in a few waves without
        # overshooting much past the hit.
        batch = 1 << min(20, max(16, grinding_factor - 1))
    from collections import deque

    challenge_words = jnp.asarray(
        np.frombuffer(challenge, dtype="<u4").copy(), dtype=jnp.uint32
    )
    inflight: deque = deque()
    next_start = 0
    while inflight or next_start < 1 << 64:
        while len(inflight) < pipeline and next_start < 1 << 64:
            res = kd.grinding_batch(
                challenge_words,
                jnp.uint32(next_start & 0xFFFFFFFF),
                jnp.uint32(next_start >> 32),
                batch,
                grinding_factor,
            )
            inflight.append((next_start, res))
            next_start += batch
        start, (found, first) = inflight.popleft()
        if bool(found):
            nonce = start + int(first)
            if leading_zeros_of_nonce(challenge, nonce) < grinding_factor:
                raise RuntimeError(
                    "device grinding result disagrees with host check"
                )
            return nonce
    raise RuntimeError("u64 nonce space exhausted without a grinding hit")
