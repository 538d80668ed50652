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
    challenge: bytes, grinding_factor: int, batch: int = 1 << 16
) -> int:
    """Smallest u64 nonce whose grinding hash meets the factor."""
    if grinding_factor <= 12:
        # host path: expected few iterations
        nonce = 0
        while leading_zeros_of_nonce(challenge, nonce) < grinding_factor:
            nonce += 1
        return nonce
    challenge_words = jnp.asarray(
        np.frombuffer(challenge, dtype="<u4").copy(), dtype=jnp.uint32
    )
    start = 0
    while start < 1 << 64:
        found, first = kd.grinding_batch(
            challenge_words,
            jnp.uint32(start & 0xFFFFFFFF),
            jnp.uint32(start >> 32),
            batch,
            grinding_factor,
        )
        if bool(found):
            nonce = start + int(first)
            if leading_zeros_of_nonce(challenge, nonce) < grinding_factor:
                raise RuntimeError(
                    "device grinding result disagrees with host check"
                )
            return nonce
        start += batch
    raise RuntimeError("u64 nonce space exhausted without a grinding hit")
