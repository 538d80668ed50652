"""Device grinding search over the full u64 nonce space (reference
grinding.rs:40-48 searches u64; the device batch kernel must produce
correct digests for nonces with a non-zero high word)."""

import jax.numpy as jnp
import numpy as np

from lambdaworks_cairo_prover_tpu.hash import keccak_device as kd
from lambdaworks_cairo_prover_tpu.prover.grinding import (
    leading_zeros_of_nonce,
)


def test_grinding_batch_beyond_2_32():
    challenge = bytes(range(32))
    start = 1 << 32
    factor = 4

    # host oracle: first valid nonce at/after 2^32
    expected = start
    while leading_zeros_of_nonce(challenge, expected) < factor:
        expected += 1
    assert expected - start < 1024, "test window too small"

    challenge_words = jnp.asarray(
        np.frombuffer(challenge, dtype="<u4").copy(), dtype=jnp.uint32
    )
    found, first = kd.grinding_batch(
        challenge_words,
        jnp.uint32(start & 0xFFFFFFFF),
        jnp.uint32(start >> 32),
        1024,
        factor,
    )
    assert bool(found)
    assert start + int(first) == expected


def test_grinding_batch_carry_across_2_32():
    """A batch straddling the 2^32 boundary must carry into the high word."""
    challenge = b"\xab" * 32
    factor = 3
    start = (1 << 32) - 512

    expected = None
    for nonce in range(start, start + 4096):
        if leading_zeros_of_nonce(challenge, nonce) >= factor:
            expected = nonce
            break
    assert expected is not None

    challenge_words = jnp.asarray(
        np.frombuffer(challenge, dtype="<u4").copy(), dtype=jnp.uint32
    )
    found, first = kd.grinding_batch(
        challenge_words,
        jnp.uint32(start & 0xFFFFFFFF),
        jnp.uint32(start >> 32),
        4096,
        factor,
    )
    assert bool(found)
    assert start + int(first) == expected
