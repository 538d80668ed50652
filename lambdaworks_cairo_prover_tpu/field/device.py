"""Device (TPU) Stark252 arithmetic over 16x16-bit limb tensors.

All functions operate on uint32 arrays whose LEADING axis is the limb axis
(shape ``(16, ...)``, little-endian 16-bit limbs).  Elements are kept in
Montgomery form (R = 2^256) and canonically reduced (< p) unless noted.

This is the TPU-native replacement for `lambdaworks-math`'s Montgomery-backed
`FieldElement<Stark252PrimeField>` (reference import sites:
/root/reference/src/starks/prover.rs:11-16).  The design is whole-array SIMD:
every scalar op of the reference becomes an op over an arbitrary batch, with
the 16-limb schoolbook product and the sparse-prime Montgomery reduction
unrolled into straight-line uint32 vector code that XLA maps onto the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_MASK, N_LIMBS, P, P_LIMBS, R, R2

U32 = jnp.uint32
MASK = jnp.uint32(LIMB_MASK)

# ---------------------------------------------------------------------------
# Host <-> device conversion helpers (numpy; exact, no device work)
# ---------------------------------------------------------------------------


def from_ints(values, mont: bool = True) -> np.ndarray:
    """Python ints -> limb array of shape (16, len(values)) (numpy uint32).

    If ``mont`` the values are converted to Montgomery form on the host.
    """
    vals = [(v * R) % P if mont else v % P for v in values]
    buf = b"".join(v.to_bytes(32, "little") for v in vals)
    limbs = np.frombuffer(buf, dtype=np.uint16).reshape(len(vals), N_LIMBS)
    return limbs.astype(np.uint32).T.copy()


def to_ints(limbs, mont: bool = True) -> list:
    """Limb array (16, n) -> list of python ints (converted out of Montgomery)."""
    arr = np.asarray(limbs, dtype=np.uint32).astype(np.uint16)
    n = arr.shape[1] if arr.ndim > 1 else 1
    arr = arr.reshape(N_LIMBS, -1).T.copy()
    out = []
    r_inv = pow(R, P - 2, P)
    for row in arr:
        v = int.from_bytes(row.tobytes(), "little")
        out.append((v * r_inv) % P if mont else v)
    return out


def from_int(value: int, mont: bool = True) -> np.ndarray:
    """Single python int -> shape (16, 1) limb array."""
    return from_ints([value], mont=mont)


def to_int(limbs, mont: bool = True) -> int:
    return to_ints(limbs, mont=mont)[0]


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros((N_LIMBS,) + tuple(shape), dtype=U32)


def ones(shape=()) -> jnp.ndarray:
    """Montgomery-form one (= R mod p) broadcast to batch shape."""
    one = from_int(1).reshape((N_LIMBS,) + (1,) * len(tuple(shape)))
    return jnp.broadcast_to(jnp.asarray(one, dtype=U32), (N_LIMBS,) + tuple(shape))


_P_ARR = np.array(P_LIMBS, dtype=np.uint32)

# ---------------------------------------------------------------------------
# Core limb arithmetic
# ---------------------------------------------------------------------------


def _carry_propagate(cols, n_out):
    """Resolve lazy uint32 columns into ``n_out`` clean 16-bit limbs.

    ``cols`` is a list of uint32 arrays (same batch shape); values may exceed
    16 bits.  Returns a list of n_out arrays each < 2^16.
    """
    out = []
    carry = None
    for k in range(n_out):
        v = cols[k] if k < len(cols) else jnp.zeros_like(cols[0])
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> 16
    return out


def _cond_sub_p(limbs):
    """If value >= p, subtract p.  ``limbs``: list of 16 clean arrays."""
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for k in range(N_LIMBS):
        rhs = jnp.uint32(int(_P_ARR[k])) + borrow
        b = (limbs[k] < rhs).astype(U32)
        diff.append((limbs[k] - rhs) & MASK)
        borrow = b
    # borrow == 0  =>  value >= p  =>  take diff
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, limbs[k], diff[k]) for k in range(N_LIMBS)]


def _stack(limb_list):
    return jnp.stack(limb_list, axis=0)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular addition of canonical limb tensors."""
    cols = [a[k] + b[k] for k in range(N_LIMBS)]
    limbs = _carry_propagate(cols, N_LIMBS)  # sum < 2p < 2^253: carry out is 0
    return _stack(_cond_sub_p(limbs))


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular subtraction a - b."""
    borrow = jnp.zeros_like(a[0])
    diff = []
    for k in range(N_LIMBS):
        rhs = b[k] + borrow
        nb = (a[k] < rhs).astype(U32)
        diff.append((a[k] - rhs) & MASK)
        borrow = nb
    # if borrow: result underflowed, add p back
    neg = borrow.astype(jnp.bool_)
    cols = [diff[k] + jnp.where(neg, jnp.uint32(int(_P_ARR[k])), jnp.uint32(0))
            for k in range(N_LIMBS)]
    limbs = _carry_propagate(cols, N_LIMBS)
    return _stack(limbs)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return sub(jnp.zeros_like(a), a)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery modular multiplication REDC(a*b); canonical output.

    Schoolbook 16x16 product into 32 lazy uint32 columns (each 16x16-bit
    product is split into lo/hi halves so columns stay < 2^21), one carry
    sweep, then 16 Montgomery steps exploiting m_i = (-T_i) mod 2^16 and the
    sparse prime limbs {1@0, 17@12, 2048@15}.
    """
    zero = jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), dtype=U32)
    cols = [zero] * 33
    for i in range(N_LIMBS):
        ai = a[i]
        for j in range(N_LIMBS):
            pr = ai * b[j]
            cols[i + j] = cols[i + j] + (pr & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (pr >> 16)

    t = _carry_propagate(cols, 33)

    # REDC: 16 steps; after step i, column i is zero (mod 2^16).
    for i in range(N_LIMBS):
        ti = t[i]
        m = (jnp.uint32(0x10000) - ti) & MASK      # (-T_i) mod 2^16
        # column i: ti + m*1 = 0 or 0x10000 -> carry (1 unless ti == 0)
        t[i + 1] = t[i + 1] + ((ti + m) >> 16)
        t[i + 12] = t[i + 12] + m * jnp.uint32(17)
        pr = m * jnp.uint32(2048)
        t[i + 15] = t[i + 15] + (pr & MASK)
        t[i + 16] = t[i + 16] + (pr >> 16)
        # keep next column clean for the next iteration's m
        c = t[i + 1] >> 16
        t[i + 1] = t[i + 1] & MASK
        t[i + 2] = t[i + 2] + c

    limbs = _carry_propagate(t[N_LIMBS:], N_LIMBS + 1)
    # result < 2p < 2^253 so limbs[16] == 0; drop it.
    return _stack(_cond_sub_p(limbs[:N_LIMBS]))


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


_INT_ONE = None


def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical residue limbs (REDC with 1)."""
    global _INT_ONE
    if _INT_ONE is None:
        _INT_ONE = jnp.asarray(from_ints([1], mont=False))
    return mul(a, _INT_ONE.reshape((N_LIMBS,) + (1,) * (a.ndim - 1)))


def to_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Canonical residue limbs -> Montgomery form (multiply by R^2)."""
    r2 = jnp.asarray(from_ints([R2], mont=False)).reshape(
        (N_LIMBS,) + (1,) * (a.ndim - 1)
    )
    return mul(a, r2)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask over batch shape: element == 0."""
    acc = a[0]
    for k in range(1, N_LIMBS):
        acc = acc | a[k]
    return acc == 0


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    acc = (a[0] ^ b[0])
    for k in range(1, N_LIMBS):
        acc = acc | (a[k] ^ b[k])
    return acc == 0


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise where over the batch shape (mask broadcast against limbs)."""
    return jnp.where(mask[None, ...], a, b)


# ---------------------------------------------------------------------------
# Exponentiation / inversion
# ---------------------------------------------------------------------------

_P_MINUS_2_BITS = np.array([(P - 2) >> i & 1 for i in range(252)], dtype=np.uint32)


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse a^(p-2) via left-to-right square-and-multiply scan.

    0 maps to 0 (as in Fermat exponentiation).
    """
    bits = jnp.asarray(_P_MINUS_2_BITS[::-1].copy())  # MSB first

    def body(acc, bit):
        acc = mul(acc, acc)
        acc = select(bit.astype(jnp.bool_) & jnp.ones_like(acc[0], dtype=jnp.bool_),
                     mul(acc, a), acc)
        return acc, None

    acc = ones(a.shape[1:])
    acc, _ = jax.lax.scan(body, acc, bits)
    return acc


def pow_u64(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """Power with a static python-int exponent (unrolled; use for small e)."""
    if e == 0:
        return ones(a.shape[1:])
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def batch_inverse(x: jnp.ndarray, chunk: int = 256) -> jnp.ndarray:
    """Vectorized Montgomery-trick batch inversion along the batch axis.

    ``x``: shape (16, n).  Zeros map to zero.  Mirrors the semantics of
    lambdaworks `inplace_batch_inverse` (usage: reference verifier.rs:252).

    Strategy: split the batch into chunks of ``chunk``; sequential prefix
    product within a chunk (vectorized across chunks), one Fermat inversion
    of the chunk totals, then the standard backward sweep.
    """
    n = x.shape[1]
    if n == 0:
        return x
    zmask = is_zero(x)
    xs = select(zmask, ones((n,)), x)

    pad = (-n) % chunk
    if pad:
        xs = jnp.concatenate([xs, ones((pad,))], axis=1)
    k = xs.shape[1] // chunk
    xs = xs.reshape(N_LIMBS, k, chunk)

    def fwd(carry, xt):
        nxt = mul(carry, xt)
        return nxt, nxt

    init = ones((k,))
    # scan over the chunk axis: move it to the front
    xs_t = jnp.moveaxis(xs, 2, 0)  # (chunk, 16, k)
    totals, prefixes = jax.lax.scan(lambda c, xt: fwd(c, xt), init, xs_t)
    # prefixes: (chunk, 16, k) with prefixes[t] = x_0 * ... * x_t
    inv_tot = inv(totals)  # (16, k)

    def bwd(carry, inputs):
        prefix_prev, xt = inputs
        inv_xt = mul(carry, prefix_prev)
        new_carry = mul(carry, xt)
        return new_carry, inv_xt

    # iterate t = chunk-1 .. 1; for t = 0, inverse = carry after processing t=1
    prefix_prev = prefixes[:-1]          # (chunk-1, 16, k): prefix up to t-1
    xs_rev = xs_t[1:][::-1]              # x_t for t = chunk-1 .. 1
    prefix_rev = prefix_prev[::-1]
    carry, inv_rev = jax.lax.scan(bwd, inv_tot, (prefix_rev, xs_rev))
    # carry now = inverse of x_0
    if chunk > 1:
        inv_seq = jnp.concatenate([carry[None], inv_rev[::-1]], axis=0)
    else:
        inv_seq = carry[None]
    out = jnp.moveaxis(inv_seq, 0, 2).reshape(N_LIMBS, k * chunk)[:, :n]
    return select(zmask, zeros((n,)), out)


# ---------------------------------------------------------------------------
# Power tables (twiddles, offset powers) built on device
# ---------------------------------------------------------------------------


def powers(base_int: int, n: int) -> jnp.ndarray:
    """[1, b, b^2, ..., b^(n-1)] as (16, n) Montgomery limbs (device).

    Built by repeated doubling: log2(n) device multiplies over growing arrays.
    """
    if n <= 0:
        return zeros((0,))
    cur = jnp.asarray(from_ints([1]))
    length = 1
    b_pow = base_int % P  # b^(length)
    while length < n:
        take = min(length, n - length)
        factor = jnp.asarray(from_int(b_pow))
        nxt = mul(cur[:, :take], factor)
        cur = jnp.concatenate([cur, nxt], axis=1)
        b_pow = (b_pow * b_pow) % P
        length *= 2
    return cur[:, :n]
