"""Batched Keccak-256 on TPU: keccak-f[1600] vectorized over leaves.

64-bit lanes are represented as (lo, hi) uint32 pairs so the whole permutation
is straight-line uint32 VPU code over an arbitrary batch axis.  This replaces
`lambdaworks-crypto`'s per-leaf `Keccak256` hashing of Merkle leaves/nodes
(reference config.rs:10-20) with whole-domain batched hashing.

Digests are (n, 8) uint32 arrays in little-endian byte order (word j holds
digest bytes 4j..4j+4, LE) — i.e. lane j of the final state = w[2j] | w[2j+1]<<32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.params import N_LIMBS

U32 = jnp.uint32

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_RATE_WORDS = 34  # 136 bytes / 4


def _rotl64(lo, hi, r):
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        nlo = (lo << r) | (hi >> (32 - r))
        nhi = (hi << r) | (lo >> (32 - r))
        return nlo, nhi
    r -= 32
    nlo = (hi << r) | (lo >> (32 - r))
    nhi = (lo << r) | (hi >> (32 - r))
    return nlo, nhi


_RC_ARR = np.array(
    [[rc & 0xFFFFFFFF, rc >> 32] for rc in _RC], dtype=np.uint32
)  # (24, 2)


def _keccak_round(a, rc_lo, rc_hi):
    """One keccak round on a list of 25 (lo, hi) uint32 array pairs."""
    c = []
    for x in range(5):
        lo = a[x][0] ^ a[x + 5][0] ^ a[x + 10][0] ^ a[x + 15][0] ^ a[x + 20][0]
        hi = a[x][1] ^ a[x + 5][1] ^ a[x + 10][1] ^ a[x + 15][1] ^ a[x + 20][1]
        c.append((lo, hi))
    d = []
    for x in range(5):
        rl, rh = _rotl64(c[(x + 1) % 5][0], c[(x + 1) % 5][1], 1)
        d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
    a = [(a[i][0] ^ d[i % 5][0], a[i][1] ^ d[i % 5][1]) for i in range(25)]
    b = [None] * 25
    for x in range(5):
        for y in range(5):
            b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(
                a[x + 5 * y][0], a[x + 5 * y][1], _ROT[x][y]
            )
    out = []
    for i in range(25):
        x, y = i % 5, i // 5
        b1 = b[(x + 1) % 5 + 5 * y]
        b2 = b[(x + 2) % 5 + 5 * y]
        out.append((b[i][0] ^ (~b1[0] & b2[0]), b[i][1] ^ (~b1[1] & b2[1])))
    out[0] = (out[0][0] ^ rc_lo, out[0][1] ^ rc_hi)
    return out


def _keccak_f(lanes):
    """lanes: list of 25 (lo, hi) uint32 array pairs; returns new list.

    Rounds run under lax.fori_loop (only the round constant varies) to keep
    the XLA graph small."""
    state = jnp.stack([jnp.stack(pair, axis=0) for pair in lanes], axis=0)
    rc = jnp.asarray(_RC_ARR)

    def body(r, st):
        a = [(st[i, 0], st[i, 1]) for i in range(25)]
        out = _keccak_round(a, rc[r, 0], rc[r, 1])
        return jnp.stack([jnp.stack(pair, axis=0) for pair in out], axis=0)

    state = jax.lax.fori_loop(0, 24, body, state)
    return [(state[i, 0], state[i, 1]) for i in range(25)]


def _absorb_words(words: jnp.ndarray) -> jnp.ndarray:
    """Absorb pre-padded messages.

    words: (n, W) uint32 with W a multiple of 34 (136-byte blocks, LE words).
    Returns digests (n, 8) uint32.
    """
    n, w = words.shape
    assert w % _RATE_WORDS == 0
    zero = jnp.zeros((n,), dtype=U32)
    lanes = [(zero, zero) for _ in range(25)]
    for blk in range(w // _RATE_WORDS):
        base = blk * _RATE_WORDS
        new = []
        for i in range(25):
            lo, hi = lanes[i]
            if 2 * i < _RATE_WORDS:
                lo = lo ^ words[:, base + 2 * i]
                if 2 * i + 1 < _RATE_WORDS:
                    hi = hi ^ words[:, base + 2 * i + 1]
            new.append((lo, hi))
        lanes = _keccak_f(new)
    out = []
    for j in range(4):
        out.append(lanes[j][0])
        out.append(lanes[j][1])
    return jnp.stack(out, axis=1)


def _pad_vector(msg_bytes_len: int) -> np.ndarray:
    """For a fixed message byte length (multiple of 4), an (total_words,)
    uint32 vector to XOR onto the zero-padded message, implementing keccak
    0x01...0x80 padding."""
    rate = 136
    nblocks = msg_bytes_len // rate + 1
    total_bytes = nblocks * rate
    buf = np.zeros(total_bytes, dtype=np.uint8)
    buf[msg_bytes_len] = 0x01
    buf[total_bytes - 1] |= 0x80
    return buf.view("<u4").copy()


def felts_to_be_words(limbs: jnp.ndarray) -> jnp.ndarray:
    """Limb tensor (16, ...) -> uint32 LE words of the 32-byte BE encoding.

    Output shape (..., 8): word j covers BE bytes 4j..4j+4 read as LE u32.
    """
    words = []
    for j in range(8):
        la = limbs[15 - 2 * j]
        lb = limbs[14 - 2 * j]
        w = (la >> 8) | ((la & 0xFF) << 8) | ((lb >> 8) << 16) | ((lb & 0xFF) << 24)
        words.append(w)
    return jnp.stack(words, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_cols",))
def hash_felt_rows(limbs: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """Hash each row of felts: limbs shape (16, n_rows, n_cols) -> (n_rows, 8).

    Equivalent of lambdaworks `BatchKeccak256Tree` leaf hashing: Keccak256 of
    the concatenated 32-byte BE encodings of the row's elements.

    Tiny batches are zero-padded to 128 rows: sub-tile u32 batches have
    produced wrong digests on the axon TPU backend, and full tiles use the
    VPU lanes properly anyway.
    """
    n_rows = limbs.shape[1]
    if n_rows < 128:
        pad = jnp.zeros((16, 128 - n_rows, n_cols), dtype=U32)
        return hash_felt_rows(jnp.concatenate([limbs, pad], axis=1),
                              n_cols)[:n_rows]
    msg_words = felts_to_be_words(limbs)  # (n_rows, n_cols, 8)
    msg_words = msg_words.reshape(n_rows, n_cols * 8)
    pad_vec = _pad_vector(n_cols * 32)
    pad = jnp.zeros((n_rows, len(pad_vec) - n_cols * 8), dtype=U32)
    words = jnp.concatenate([msg_words, pad], axis=1) ^ jnp.asarray(pad_vec)[None, :]
    return _absorb_words(words)


@jax.jit
def hash_felt_leaves(limbs: jnp.ndarray) -> jnp.ndarray:
    """Hash single-felt leaves: (16, n) -> (n, 8) (lambdaworks `Keccak256Tree`)."""
    return hash_felt_rows(limbs[:, :, None], 1)


@jax.jit
def hash_digest_pairs(digests: jnp.ndarray) -> jnp.ndarray:
    """Parent nodes: (2k, 8) -> (k, 8), Keccak256(left || right).

    Zero-pads tiny batches to 128 pairs (see hash_felt_rows)."""
    k = digests.shape[0] // 2
    if k < 128:
        pad = jnp.zeros((256 - digests.shape[0], 8), dtype=U32)
        return hash_digest_pairs(jnp.concatenate([digests, pad], axis=0))[:k]
    msg_words = digests.reshape(k, 16)
    pad_vec = _pad_vector(64)
    pad = jnp.zeros((k, len(pad_vec) - 16), dtype=U32)
    words = jnp.concatenate([msg_words, pad], axis=1) ^ jnp.asarray(pad_vec)[None, :]
    return _absorb_words(words)


def digest_words_to_masked_limbs(digest: jnp.ndarray) -> jnp.ndarray:
    """(8,) u32 LE-word digest -> (16, 1) RAW (non-Montgomery) limbs of the
    251-bit-masked big-endian integer — the device twin of
    transcript_to_field (field/host.py::randomness_to_field): interpret the
    32 digest bytes as a BE integer and clear the top 5 bits.

    Limb i (16-bit, LSB first) = byte[31-2i] | byte[30-2i] << 8, which per
    LE word w[k] is the byte-swapped 16-bit halves of w[7-k]."""
    w = digest[::-1].astype(U32)  # w[k] = digest word 7-k
    hi = (w >> 16) & 0xFFFF
    lo = w & 0xFFFF

    def bs16(x):
        return ((x & 0xFF) << 8) | (x >> 8)

    limbs = jnp.stack([bs16(hi), bs16(lo)], axis=1).reshape(16)
    limbs = limbs.at[15].set(limbs[15] & 0x7FF)  # clear top 5 of 256 bits
    return limbs[:, None]


def digest_to_bytes(digest_row: np.ndarray) -> bytes:
    """(8,) uint32 -> 32 bytes."""
    return np.asarray(digest_row, dtype="<u4").tobytes()


@functools.partial(jax.jit, static_argnames=("size", "grinding_factor"))
def grinding_batch(challenge_words: jnp.ndarray, start_lo: jnp.ndarray,
                   start_hi: jnp.ndarray, size: int, grinding_factor: int):
    """Search a batch of candidate u64 nonces [start, start+size).

    challenge_words: (8,) uint32 (LE words of the 32-byte challenge);
    start_lo/start_hi: uint32 scalars, the u64 batch start (the reference
    searches the full u64 space, grinding.rs:40-48).
    Returns (found: bool, index-in-batch of first hit).
    Message = challenge || nonce_le_u64 (40 bytes; reference grinding.rs:21-28);
    condition: trailing_zeros(first 8 digest bytes read as BE u64) >= factor.
    """
    idx = jnp.arange(size, dtype=U32)
    nonce_lo = start_lo.astype(U32) + idx
    carry = (nonce_lo < idx).astype(U32)  # wrapped past 2^32
    nonce_hi = jnp.broadcast_to(start_hi.astype(U32), (size,)) + carry
    # nonce u64 LE bytes: words 8 = lo, 9 = hi
    msg = jnp.broadcast_to(challenge_words[None, :], (size, 8))
    words10 = jnp.concatenate([msg, nonce_lo[:, None], nonce_hi[:, None]], axis=1)
    pad_vec = _pad_vector(40)
    pad = jnp.zeros((size, len(pad_vec) - 10), dtype=U32)
    words = jnp.concatenate([words10, pad], axis=1) ^ jnp.asarray(pad_vec)[None, :]
    digests = _absorb_words(words)  # (size, 8)
    # first 8 digest bytes = words 0,1 (LE). BE u64 head: byte0 is MSB.
    # trailing zeros of that u64 = trailing zeros of byte-reversed(words01).
    # BE-read u64: b0..b7 -> value; its trailing zeros come from b7 upward.
    w0, w1 = digests[:, 0], digests[:, 1]
    # byteswap each word and swap words to get the BE-read u64 as (lo', hi')
    def bswap(w):
        return ((w & 0xFF) << 24) | ((w & 0xFF00) << 8) | ((w >> 8) & 0xFF00) | (w >> 24)
    lo64 = bswap(w1)
    hi64 = bswap(w0)
    # trailing zeros of u64 (lo64, hi64)
    def tz32(w):
        # count trailing zeros of uint32; tz(0) = 32
        w = w.astype(jnp.uint32)
        c = jnp.full(w.shape, 32, dtype=jnp.int32)
        found = w != 0
        lsb = w & (jnp.uint32(0) - w)
        # log2 of power of two via float trick is unsafe; use iterative
        t = jnp.zeros(w.shape, dtype=jnp.int32)
        for shift, mask in [(16, 0x0000FFFF), (8, 0x00FF00FF), (4, 0x0F0F0F0F),
                            (2, 0x33333333), (1, 0x55555555)]:
            cond = (lsb & jnp.uint32(mask)) == 0
            t = t + jnp.where(cond, shift, 0)
            lsb = jnp.where(cond, lsb >> shift, lsb)
        return jnp.where(found, t, c)
    tz = jnp.where(lo64 != 0, tz32(lo64), 32 + tz32(hi64))
    ok = tz >= grinding_factor
    any_ok = jnp.any(ok)
    first = jnp.argmax(ok)
    return any_ok, first
