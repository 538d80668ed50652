"""Radix-2 NTT / coset LDE over Stark252 limb tensors (TPU).

Replaces `lambdaworks-math`'s FFT stack (`interpolate_fft`,
`evaluate_offset_fft`, `interpolate_offset_fft`; reference usage
src/starks/trace.rs:107, prover.rs:117, evaluation_table.rs:32) with a
whole-array JAX implementation: bit-reverse gather + log2(n) butterfly stages,
each stage a broadcasted Montgomery multiply over the full batch.

Evaluation convention matches lambdaworks: ``evaluate(coeffs)[i] =
p(offset * w^i)`` with ``w = get_primitive_root_of_unity(log2(N))`` and
evaluations in natural order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import device as fd
from ..field.params import N_LIMBS, P, get_primitive_root_of_unity

# ---------------------------------------------------------------------------
# Twiddle / permutation caches (host-initiated, device-resident)
# ---------------------------------------------------------------------------

_twiddle_cache: dict = {}
_bitrev_cache: dict = {}
_powers_cache: dict = {}


def _bitrev_indices(log_n: int) -> jnp.ndarray:
    if log_n not in _bitrev_cache:
        n = 1 << log_n
        idx = np.arange(n)
        rev = np.zeros(n, dtype=np.int32)
        for b in range(log_n):
            rev |= ((idx >> b) & 1) << (log_n - 1 - b)
        _bitrev_cache[log_n] = rev  # numpy: safe to lift inside any trace
    return jnp.asarray(_bitrev_cache[log_n])


def _is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)


# Table injection: jitted prover kernels pass power/twiddle tables as traced
# ARGUMENTS (huge tables baked as literals blow up compile past n ~ 2^14).
# Inside the kernel body, `with inject_tables(mapping):` makes the cache
# lookups below return the traced arguments instead of concrete arrays.
_injected_tables: list = []


class inject_tables:
    def __init__(self, mapping):
        self.mapping = mapping

    def __enter__(self):
        _injected_tables.append(self.mapping)
        return self

    def __exit__(self, *exc):
        _injected_tables.pop()
        return False


def pack_table_tree(v):
    """Recursively pack 16-limb u32 table arrays to the (8, ...) resident
    layout (kernels keep their injected NTT tables packed — ~1.9 GB of
    twiddle/power tables at a 2^22 LDE otherwise)."""
    if isinstance(v, (tuple, list)):
        return tuple(pack_table_tree(x) for x in v)
    if (N_LIMBS == 16 and hasattr(v, "shape") and v.ndim >= 1
            and v.shape[0] == N_LIMBS):
        return fd.pack(v)
    return v


def _unpack_table_tree(v):
    if isinstance(v, (tuple, list)):
        return tuple(_unpack_table_tree(x) for x in v)
    if (N_LIMBS == 16 and hasattr(v, "shape") and v.ndim >= 1
            and v.shape[0] == N_LIMBS // 2):
        return fd.unpack(v)
    return v


def _injected(key):
    for mapping in reversed(_injected_tables):
        if key in mapping:
            # tables may arrive packed; the unpack ops land inside the
            # consuming kernel's trace, so the 16-limb copy is transient
            return _unpack_table_tree(mapping[key])
    return None


def _stage_twiddles(log_n: int, inverse: bool):
    """Tuple of per-stage twiddle arrays; stage s (m = 2^s) holds w_{2m}^j, j<m.

    Results are cached ONLY when computed outside a jit trace (a first call
    inside tracing would cache tracers that leak into later programs)."""
    key = (log_n, inverse)
    inj = _injected(("tw", log_n, inverse))
    if inj is not None:
        return inj
    if key not in _twiddle_cache:
        stages = []
        for s in range(log_n):
            m = 1 << s
            w = get_primitive_root_of_unity(s + 1)
            if inverse:
                w = pow(w, P - 2, P)
            stages.append(fd.powers(w, m))
        if any(_is_tracer(st) for st in stages):
            return tuple(stages)
        _twiddle_cache[key] = tuple(stages)
    return _twiddle_cache[key]


def offset_powers(offset: int, n: int) -> jnp.ndarray:
    """[offset^0 .. offset^(n-1)] (Montgomery limbs), cached when concrete."""
    key = (offset % P, n)
    inj = _injected(("pw", offset % P, n))
    if inj is not None:
        return inj
    if key not in _powers_cache:
        arr = fd.powers(offset, n)
        if _is_tracer(arr):
            return arr
        _powers_cache[key] = arr
    return _powers_cache[key]


# ---------------------------------------------------------------------------
# Four-step (Bailey) decomposition tables for large single-chip transforms
# ---------------------------------------------------------------------------

# Above this size the flat radix-2/4 schedule makes XLA materialise badly
# tile-padded temps (the m=1/m=2 butterfly views have trailing dims of 1-4,
# which the (8,128) tiling pads 8x; at n=2^21 that is 2x8GB -> HBM OOM).
# The four-step split n = R*C keeps every transform axis at ~sqrt(n) where
# tiling is dense, at the cost of two well-tiled transposes and one
# elementwise twiddle multiply.
FOUR_STEP_MIN_LOG = 17

_four_cache: dict = {}


def four_factors(log_n: int) -> tuple[int, int]:
    """log2 factors (logR, logC) of the four-step split (same plan as the
    distributed ShardedNTT: C = 2^(log/2), R = n/C)."""
    logc = log_n // 2
    return log_n - logc, logc


def build_inter_table(a_bits: jnp.ndarray, r: int) -> jnp.ndarray:
    """(16, C, R) table T[c, t] = w^(c*t) from per-bit power rows.

    a_bits[b] = [w^(c * 2^b) for c in range(C)] as (16, C) limbs; the
    product over set bits of t reconstructs w^(c*t) with log2(R) batched
    multiplies (no host-side N-element loop)."""
    n_bits = a_bits.shape[0]
    c = a_bits.shape[2]
    t_idx = jax.lax.iota(jnp.uint32, r)
    one = fd.ones((1, 1))  # (16, 1, 1) broadcastable Montgomery 1
    t = jnp.broadcast_to(one, (N_LIMBS, c, r))
    for b in range(n_bits):
        sel = ((t_idx >> b) & 1).astype(jnp.bool_)
        fac = jnp.where(sel[None, None, :], a_bits[b][:, :, None], one)
        t = fd.mul(t, fac)
    return t


def _four_table(log_n: int, inverse: bool) -> jnp.ndarray:
    """Inter-factor twiddles T[c, t] = w_N^(c*t), injectable/cached."""
    key = ("four", log_n, inverse)
    inj = _injected(key)
    if inj is not None:
        return inj
    if key not in _four_cache:
        logr, logc = four_factors(log_n)
        r, c = 1 << logr, 1 << logc
        w = get_primitive_root_of_unity(log_n)
        if inverse:
            w = pow(w, P - 2, P)
        a_bits = jnp.stack(
            [jnp.asarray(fd.powers(pow(w, 1 << b, P), c))
             for b in range(logr)]
        )
        tbl = jax.jit(build_inter_table, static_argnames=("r",))(a_bits, r=r)
        if _is_tracer(tbl):
            return tbl
        _four_cache[key] = tbl
    return _four_cache[key]


@functools.partial(jax.jit, static_argnames=("log_n",))
def _ntt_four_impl(x, twr, twc, tbl, log_n: int):
    """Four-step DFT along the last axis (natural order in and out):

        X[s*R + t] = NTT_C over c [ w_N^(c*t) * NTT_R over r [ x[r*C + c] ] ]

    Identical math to parallel/four_step.py::ShardedNTT.transform with the
    all-to-all transposes replaced by local swapaxes."""
    logr, logc = four_factors(log_n)
    r, c = 1 << logr, 1 << logc
    lead = x.shape[1:-1]
    xv = x.reshape(N_LIMBS, -1, r, c)
    xv = jnp.swapaxes(xv, 2, 3)          # (16, B, c, r)
    xv = _ntt_impl(xv, twr, logr)        # G[c, t]
    xv = fd.mul(xv, tbl[:, None, :, :])  # * w_N^(c*t)
    xv = jnp.swapaxes(xv, 2, 3)          # (16, B, t, c)
    xv = _ntt_impl(xv, twc, logc)        # H[t, s]
    xv = jnp.swapaxes(xv, 2, 3)          # (16, B, s, t)
    return xv.reshape((N_LIMBS,) + lead + (1 << log_n,))


def _ntt_dispatch(x, log_n: int, inverse: bool):
    from . import fused as fused_mod

    if fused_mod.use_fused(log_n):
        # fused-stage Pallas path — DEFAULT at n >= 2^17 (measured table in
        # fused.use_fused: >=90 Mpts/s through 2^21 vs the four-step plan's
        # collapse to 27 once an inner factor reaches 2^10).
        return fused_mod.ntt_fused(x, log_n, inverse)
    if log_n >= FOUR_STEP_MIN_LOG:
        logr, logc = four_factors(log_n)
        return _ntt_four_impl(
            x,
            _stage_twiddles(logr, inverse),
            _stage_twiddles(logc, inverse),
            _four_table(log_n, inverse),
            log_n,
        )
    return _ntt_impl(x, _stage_twiddles(log_n, inverse), log_n)


# ---------------------------------------------------------------------------
# Core transform
# ---------------------------------------------------------------------------


def _bitrev_traced(log_n: int) -> jnp.ndarray:
    """Bit-reversal permutation computed in-graph (no large index literal)."""
    n = 1 << log_n
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    rev = jnp.zeros_like(idx)
    for b in range(log_n):
        rev = rev | (((idx >> b) & 1) << (log_n - 1 - b))
    return rev


def _bitrev_permute(x: jnp.ndarray, log_n: int) -> jnp.ndarray:
    """y[j] = x[rev(j)] along the last axis.

    Large axes use a two-level decomposition: with j = u*2^h + v,
    rev(j) = rev_h(v)*2^l + rev_l(u), so the permutation factors into two
    short per-axis gathers plus one transpose of the trailing (2^h, 2^l)
    view.  A flat gather of 2^20+ elements makes XLA materialise
    tile-padded index/select temps (8x expansion at n=2^21 -> HBM OOM);
    the factored form stays within normal (8,128) tiling.
    """
    if log_n < 12:
        return jnp.take(x, _bitrev_traced(log_n), axis=-1)
    h = log_n // 2
    l = log_n - h
    lead = x.shape[:-1]
    xv = x.reshape(lead + (1 << h, 1 << l))
    xv = jnp.take(xv, _bitrev_traced(h), axis=-2)
    xv = jnp.take(xv, _bitrev_traced(l), axis=-1)
    xv = jnp.swapaxes(xv, -1, -2)
    return xv.reshape(lead + (1 << log_n,))


@functools.partial(jax.jit, static_argnames=("log_n",))
def _ntt_impl(x, twiddles, log_n: int):
    """Transform along the LAST axis; leading axes (limbs first) are batch."""
    n = 1 << log_n
    lead = x.shape[1:-1]
    x = x.reshape(N_LIMBS, -1, n)
    x = _bitrev_permute(x, log_n)
    use_fused = n * max(1, x.shape[1]) // 2 >= 1024 and fd._pallas_enabled()
    s = 0
    while s < log_n:
        m = 1 << s
        if use_fused and s + 1 < log_n:
            # two stages at once: radix-4 step in one fused kernel
            from ..field import pallas_mul

            g4 = n // (4 * m)
            xv = x.reshape(N_LIMBS, x.shape[1], g4, 4, m)
            quarters = tuple(xv[:, :, :, j, :] for j in range(4))
            w = twiddles[s][:, None, None, :]
            w2 = twiddles[s + 1]
            tws = (w, w2[:, None, None, :m], w2[:, None, None, m:])
            outs = pallas_mul.butterfly2(quarters, tws)
            x = jnp.stack(outs, axis=3).reshape(N_LIMBS, x.shape[1], n)
            s += 2
            continue
        g = n // (2 * m)
        xv = x.reshape(N_LIMBS, x.shape[1], g, 2, m)
        a = xv[:, :, :, 0, :]
        b = xv[:, :, :, 1, :]
        w = twiddles[s][:, None, None, :]  # (16, 1, 1, m)
        if use_fused:
            from ..field import pallas_mul

            hi, lo = pallas_mul.butterfly(a, b, w)
        else:
            t = fd.mul(b, w)
            hi, lo = fd.add(a, t), fd.sub(a, t)
        x = jnp.stack([hi, lo], axis=3).reshape(N_LIMBS, x.shape[1], n)
        s += 1
    return x.reshape((N_LIMBS,) + lead + (n,))


def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward transform: coefficients -> evaluations at w^i (natural order).

    Operates along the last axis; any leading batch axes after the limb axis.
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    if n == 1:
        return x
    return _ntt_dispatch(x, log_n, inverse=False)


def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform: evaluations at w^i (natural order) -> coefficients."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    y = _ntt_dispatch(x, log_n, inverse=True)
    n_inv = pow(n, P - 2, P)
    return fd.mul(y, jnp.asarray(fd.from_int(n_inv)).reshape((N_LIMBS,) + (1,) * (y.ndim - 1)))


# ---------------------------------------------------------------------------
# Polynomial-level API (mirrors lambdaworks FFTPoly semantics)
# ---------------------------------------------------------------------------


def interpolate_fft(evals: jnp.ndarray) -> jnp.ndarray:
    """Coefficients of the poly with values ``evals`` on the natural domain."""
    return intt(evals)


def scale_poly(coeffs: jnp.ndarray, factor: int) -> jnp.ndarray:
    """p(factor * X): multiply coeff i by factor^i (last axis)."""
    return fd.mul(coeffs, offset_powers(factor, coeffs.shape[-1]))


def evaluate_offset_fft(
    coeffs: jnp.ndarray, blowup: int, domain_size: int | None, offset: int
) -> jnp.ndarray:
    """lambdaworks `evaluate_offset_fft`: evaluations of p on the coset
    offset * <w_N>, N = next_pow2(max(len(coeffs), domain_size)) * blowup."""
    num_coeffs = coeffs.shape[-1]
    base = max(num_coeffs, domain_size or 0)
    n_fft = _next_pow2(base) * blowup
    scaled = scale_poly(coeffs, offset)
    padded = _pad_coeffs(scaled, n_fft)
    return ntt(padded)


def evaluate_fft(coeffs: jnp.ndarray, blowup: int = 1, domain_size: int | None = None):
    num_coeffs = coeffs.shape[-1]
    base = max(num_coeffs, domain_size or 0)
    n_fft = _next_pow2(base) * blowup
    return ntt(_pad_coeffs(coeffs, n_fft))


def evaluate_on_lde_domain(
    coeffs: jnp.ndarray, blowup: int, domain_size: int, offset: int
) -> jnp.ndarray:
    """Reference `evaluate_polynomial_on_lde_domain` (prover.rs:106-123):
    evaluate then subsample down to domain_size * blowup points."""
    evals = evaluate_offset_fft(coeffs, blowup, domain_size, offset)
    n = evals.shape[-1]
    step = n // (domain_size * blowup)
    if step > 1:
        evals = evals[..., ::step]
    return evals


def interpolate_offset_fft(evals: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Coefficients of the poly interpolating ``evals`` on offset * <w_n>."""
    coeffs = intt(evals)
    inv_off = pow(offset, P - 2, P)
    return scale_poly(coeffs, inv_off)


# ---------------------------------------------------------------------------
# Misc polynomial helpers
# ---------------------------------------------------------------------------


def _next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


def _pad_coeffs(coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
    cur = coeffs.shape[-1]
    if cur == n:
        return coeffs
    if cur > n:
        return coeffs[..., :n]
    pad = jnp.zeros(coeffs.shape[:-1] + (n - cur,), dtype=coeffs.dtype)
    return jnp.concatenate([coeffs, pad], axis=-1)


def sum_reduce(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Modular sum along a batch axis via pairwise folding."""
    x = jnp.moveaxis(x, axis, 1)
    n = x.shape[1]
    while n > 1:
        if n % 2:
            pad = jnp.zeros(x.shape[:1] + (1,) + x.shape[2:], dtype=x.dtype)
            x = jnp.concatenate([x, pad], axis=1)
            n += 1
        x = fd.add(x[:, 0::2], x[:, 1::2])
        n //= 2
    return x[:, 0]


def poly_eval_at(coeffs: jnp.ndarray, point: int) -> jnp.ndarray:
    """Evaluate a device coefficient array at a host scalar point.

    Returns a (16,) limb vector.  dot(coeffs, powers(point)) with a
    log-depth modular reduction; replaces Horner (reference frame.rs:79)
    which would serialize on TPU.
    """
    n = coeffs.shape[-1]
    pw = offset_powers(point, n)
    return sum_reduce(fd.mul(coeffs, pw), axis=-1)
