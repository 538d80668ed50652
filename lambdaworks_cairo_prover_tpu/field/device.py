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
# Packed at-rest representation: two 16-bit limbs per u32 lane.
#
# Large resident tensors (the LDE trace, trace polys) halve their HBM
# footprint by storing limb pairs packed; compute kernels unpack the chunk
# they touch (two cheap elementwise ops that XLA fuses into the consumer).
# Lossless because canonical limbs are always < 2^16.
# ---------------------------------------------------------------------------


def pack(a: jnp.ndarray) -> jnp.ndarray:
    """(16, ...) 16-bit limbs -> (8, ...) u32 with limb pairs packed."""
    return a[0::2] | (a[1::2] << 16)


def unpack(p: jnp.ndarray) -> jnp.ndarray:
    """(8, ...) packed -> (16, ...) 16-bit limbs."""
    lo = p & MASK
    hi = p >> 16
    return jnp.stack([lo, hi], axis=1).reshape((N_LIMBS,) + p.shape[1:])

# ---------------------------------------------------------------------------
# Core limb arithmetic
# ---------------------------------------------------------------------------


def _carry_scan(cols: jnp.ndarray) -> jnp.ndarray:
    """Resolve lazy uint32 columns (K, ...) into clean 16-bit limbs (K, ...).

    Sequential by nature; lowered as ONE lax.scan over the limb axis so the
    XLA graph stays tiny.  The final carry out is dropped (callers guarantee
    it is zero or intend mod-2^(16K) semantics)."""

    def body(carry, x):
        v = x + carry
        return v >> 16, v & MASK

    _, limbs = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols)
    return limbs


def _bcast_limb_const(vec: np.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """(K,) numpy constant -> (K, ...) broadcast against ref's batch shape."""
    k = vec.shape[0]
    arr = jnp.asarray(vec).reshape((k,) + (1,) * (ref.ndim - 1))
    return jnp.broadcast_to(arr, (k,) + ref.shape[1:])


def _cond_sub_p(limbs: jnp.ndarray) -> jnp.ndarray:
    """If value >= p, subtract p.  ``limbs``: (16, ...) clean array."""
    p_arr = _bcast_limb_const(_P_ARR, limbs)

    def body(borrow, xs):
        a_k, p_k = xs
        rhs = p_k + borrow
        nb = (a_k < rhs).astype(U32)
        return nb, (a_k - rhs) & MASK

    borrow, diff = jax.lax.scan(body, jnp.zeros_like(limbs[0]), (limbs, p_arr))
    # borrow == 0  =>  value >= p  =>  take diff
    return jnp.where((borrow == 0)[None], diff, limbs)


def _batch_elems(a, b) -> int:
    n = 1
    for d in jnp.broadcast_shapes(a.shape[1:], b.shape[1:]):
        n *= d
    return n


def add(a: jnp.ndarray, b: jnp.ndarray, prefer_pallas: bool = True) -> jnp.ndarray:
    """Modular addition of canonical limb tensors."""
    if prefer_pallas and _batch_elems(a, b) >= 1024 and _pallas_enabled():
        from . import pallas_mul

        return pallas_mul.add(a, b)
    limbs = _carry_scan(a + b)  # sum < 2p < 2^253: carry out is 0
    return _cond_sub_p(limbs)


def sub(a: jnp.ndarray, b: jnp.ndarray, prefer_pallas: bool = True) -> jnp.ndarray:
    """Modular subtraction a - b."""
    if prefer_pallas and _batch_elems(a, b) >= 1024 and _pallas_enabled():
        from . import pallas_mul

        return pallas_mul.sub(a, b)
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (N_LIMBS,) + bshape)
    b = jnp.broadcast_to(b, (N_LIMBS,) + bshape)

    def body(borrow, xs):
        a_k, b_k = xs
        rhs = b_k + borrow
        nb = (a_k < rhs).astype(U32)
        return nb, (a_k - rhs) & MASK

    borrow, diff = jax.lax.scan(body, jnp.zeros_like(a[0]), (a, b))
    # if borrow: result underflowed; add p back (single carry sweep)
    p_fix = jnp.where((borrow == 1)[None], _bcast_limb_const(_P_ARR, a),
                      jnp.zeros_like(a))
    return _carry_scan(diff + p_fix)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return sub(jnp.zeros_like(a), a)


_PINV_ARR = None  # lazy numpy (16,) of -p^-1 mod 2^256 limbs


def _anti_diagonal_sums(parts: jnp.ndarray, shift: int) -> jnp.ndarray:
    """sum_i parts[i, k - shift - i] for k in [0, 33)  —  via a stride trick.

    parts: (16, 16, ...) u32.  Pad rows to width 34 and flatten rows
    row-major; element (i, j) lands at flat index 34i + j, so the diagonal
    k = i + j sits at 33i + k: slicing [shift : shift + 16*33] and reshaping
    to (16, 33, ...) aligns all anti-diagonals as columns — three cheap ops
    instead of per-diagonal gathers/rolls.
    """
    bshape = parts.shape[2:]
    pad = jnp.zeros((N_LIMBS, 34 - N_LIMBS) + bshape, dtype=U32)
    flat = jnp.concatenate([parts, pad], axis=1).reshape((16 * 34,) + bshape)
    if shift:
        flat = jnp.concatenate(
            [jnp.zeros((shift,) + bshape, dtype=U32), flat], axis=0
        )
    window = flat[: 16 * 33].reshape((16, 33) + bshape)
    return jnp.sum(window, axis=0)


def _long_mul_columns(a, b, n_cols: int):
    """Lazy column sums of the long product of two 16-limb tensors.

    a, b: (16, ...) with limbs < 2^16.  Returns (n_cols, ...) uint32 with
    column k = sum_{i+j=k} (a_i*b_j & 0xffff) + sum_{i+j=k-1} (a_i*b_j >> 16)
    (each column < 32 * 2^16 < 2^21).  One broadcast outer product + two
    stride-trick diagonal reductions — ~10 XLA ops total.
    """
    prod = a[:, None] * b[None, :]  # (16, 16, ...) exact u32 products
    cols = _anti_diagonal_sums(prod & MASK, 0) + _anti_diagonal_sums(
        prod >> 16, 1
    )
    return cols[:n_cols]


def _pallas_enabled() -> bool:
    """True when the default execution target is a real TPU (the fused
    Mosaic mul kernel only lowers there).  `LCP_PALLAS=0/1` overrides."""
    import os

    env = os.environ.get("LCP_PALLAS")
    if env is not None:
        return env == "1"
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", str(dd)) not in (
            "tpu", "axon"):
        return False
    return jax.default_backend() in ("tpu", "axon")


def mul(a: jnp.ndarray, b: jnp.ndarray, prefer_pallas: bool = True) -> jnp.ndarray:
    """Montgomery modular multiplication REDC(a*b); canonical output.

    Long product via one outer product + anti-diagonal gathers, then
    single-shot Montgomery reduction: m = T_lo * (-p^-1) mod 2^256 and
    (T + m*p) >> 256 using the sparse prime limbs {1@0, 17@12, 2048@15}.

    On TPU, batches of >= 1024 elements route to the fused Pallas kernel
    (pallas_mul.py) — one HBM read per operand instead of materialized
    intermediates and per-limb scan passes.
    """
    global _PINV_ARR
    from .params import P_INV_NEG_LIMBS

    from .params import SPARSE_P

    bs = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    n_elems = 1
    for d in bs:
        n_elems *= d
    # the fused Pallas kernel bakes the sparse Stark252 reduction; toy
    # fields (LCP_FIELD) always take the generic XLA path below
    if prefer_pallas and n_elems >= 1024 and SPARSE_P and _pallas_enabled():
        from . import pallas_mul

        return pallas_mul.mul(a, b)

    if _PINV_ARR is None:
        _PINV_ARR = np.array(P_INV_NEG_LIMBS, dtype=np.uint32)

    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def _bcast(x):
        pad = len(bshape) - (x.ndim - 1)
        x = x.reshape((N_LIMBS,) + (1,) * pad + x.shape[1:])
        return jnp.broadcast_to(x, (N_LIMBS,) + bshape)

    a = _bcast(a)
    b = _bcast(b)

    t_cols = _long_mul_columns(a, b, 33)  # lazy columns of a*b (<2^21 each)
    t = _carry_scan(t_cols)               # (33, ...) clean

    # m = T_lo * pinv mod 2^256, as clean 16-bit limbs (top carry dropped)
    pinv = _bcast_limb_const(_PINV_ARR, a)
    m = _carry_scan(_long_mul_columns(t[:N_LIMBS], pinv, N_LIMBS))

    t34 = jnp.concatenate(
        [t, jnp.zeros((1,) + t.shape[1:], dtype=U32)], axis=0
    )
    if SPARSE_P:
        # T + m*p with p = 1 + 17*2^192 + 2048*2^240 (limbs 0, 12, 15):
        # shifted whole-vector adds of m and the lo/hi halves of 17m/2048m.
        def shifted(x, k):
            pre = jnp.zeros((k,) + x.shape[1:], dtype=U32)
            post = jnp.zeros((34 - k - x.shape[0],) + x.shape[1:], dtype=U32)
            return jnp.concatenate([pre, x, post], axis=0)

        p17 = m * jnp.uint32(17)
        p2048 = m * jnp.uint32(2048)
        acc = (
            t34
            + shifted(m, 0)
            + shifted(p17 & MASK, 12)
            + shifted(p17 >> 16, 13)
            + shifted(p2048 & MASK, 15)
            + shifted(p2048 >> 16, 16)
        )
    else:
        # generic prime: full m*p column sums (toy-field path)
        p_arr = _bcast_limb_const(_P_ARR, a)
        mp = _long_mul_columns(m, p_arr, 33)
        acc = t34 + jnp.concatenate(
            [mp, jnp.zeros((1,) + mp.shape[1:], dtype=U32)], axis=0
        )
    limbs = _carry_scan(acc)
    # (T + m*p) / 2^256 < 2p: take limbs 16..32 (limb 33 is zero)
    return _cond_sub_p(limbs[N_LIMBS : 2 * N_LIMBS])


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


_INT_ONE_NP = None
_R2_NP = None


def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical residue limbs (REDC with 1)."""
    global _INT_ONE_NP
    if _INT_ONE_NP is None:
        _INT_ONE_NP = from_ints([1], mont=False)  # numpy: trace-safe cache
    one = jnp.asarray(_INT_ONE_NP).reshape((N_LIMBS,) + (1,) * (a.ndim - 1))
    return mul(a, one)


def to_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Canonical residue limbs -> Montgomery form (multiply by R^2)."""
    global _R2_NP
    if _R2_NP is None:
        _R2_NP = from_ints([R2], mont=False)
    r2 = jnp.asarray(_R2_NP).reshape((N_LIMBS,) + (1,) * (a.ndim - 1))
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


def prefix_product(x: jnp.ndarray, chunk: int = 256) -> jnp.ndarray:
    """Inclusive prefix product along the batch axis of ``x``: (16, n).

    TPU-first replacement for ``lax.associative_scan(mul, ...)`` at large n:
    the associative-scan tree issues full-length XLA multiplies whose
    anti-diagonal long-mul windows transiently materialize ~33x the operand
    (multi-GB at n = 2^21 — the round-1 OOM on fib(70000)).  Here the only
    full-length multiply is the final block-offset application, which routes
    to the fused Pallas kernel on TPU; everything else is a lax.scan of
    (16, n/chunk)-sized steps, the same shape discipline as batch_inverse.
    """
    n = x.shape[1]
    if n == 0:
        return x
    pad = (-n) % chunk
    xs = x
    if pad:
        xs = jnp.concatenate([xs, ones((pad,))], axis=1)
    k = xs.shape[1] // chunk
    xs = xs.reshape(N_LIMBS, k, chunk)
    xs_t = jnp.moveaxis(xs, 2, 0)  # (chunk, 16, k)

    def fwd(carry, xt):
        nxt = mul(carry, xt)
        return nxt, nxt

    totals, prefixes = jax.lax.scan(fwd, ones((k,)), xs_t)
    # exclusive prefix of per-block totals (k is small: n/chunk)
    block_incl = jax.lax.associative_scan(
        lambda a, b: mul(a, b, prefer_pallas=False), totals, axis=1
    )
    block_excl = jnp.concatenate(
        [ones((1,)), block_incl[:, :-1]], axis=1
    )  # (16, k)
    # one full-length multiply: Pallas-fused on TPU, so no giant transient
    out = mul(jnp.moveaxis(prefixes, 0, 2), block_excl[:, :, None])
    return out.reshape(N_LIMBS, k * chunk)[:, :n]


# ---------------------------------------------------------------------------
# Power tables (twiddles, offset powers) built on device
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n",))
def _powers_outer(small: jnp.ndarray, big: jnp.ndarray, n: int) -> jnp.ndarray:
    """(16, s) x (16, k) -> (16, s*k)[:, :n] outer product of power blocks."""
    prod = mul(small[:, None, :], big[:, :, None])  # (16, k, s)
    return prod.reshape(N_LIMBS, -1)[:, :n]


def powers(base_int: int, n: int) -> jnp.ndarray:
    """[1, b, b^2, ..., b^(n-1)] as (16, n) Montgomery limbs.

    Split-point construction: 2*sqrt(n) host modmuls build b^i (i < s) and
    b^(s*j) blocks; ONE jitted device multiply forms the outer product.
    No eager device dispatches (critical on tunneled TPU backends).
    """
    if n <= 0:
        return zeros((0,))
    base_int %= P
    if n <= 1024:
        vals = [1] * n
        cur = 1
        for i in range(1, n):
            cur = cur * base_int % P
            vals[i] = cur
        return jnp.asarray(from_ints(vals))
    s = 1 << ((n - 1).bit_length() + 1) // 2
    k = -(-n // s)
    small_vals = [1] * s
    cur = 1
    for i in range(1, s):
        cur = cur * base_int % P
        small_vals[i] = cur
    step = cur * base_int % P  # b^s
    big_vals = [1] * k
    cur = 1
    for j in range(1, k):
        cur = cur * step % P
        big_vals[j] = cur
    small = jnp.asarray(from_ints(small_vals))
    big = jnp.asarray(from_ints(big_vals))
    return _powers_outer(small, big, n)
