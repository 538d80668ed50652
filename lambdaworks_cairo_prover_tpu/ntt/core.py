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


def _injected(key):
    for mapping in reversed(_injected_tables):
        if key in mapping:
            return mapping[key]
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


@functools.partial(jax.jit, static_argnames=("log_n",))
def _ntt_impl(x, twiddles, log_n: int):
    """Transform along the LAST axis; leading axes (limbs first) are batch."""
    n = 1 << log_n
    lead = x.shape[1:-1]
    x = x.reshape(N_LIMBS, -1, n)
    x = jnp.take(x, _bitrev_traced(log_n), axis=-1)
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
    return _ntt_impl(x, _stage_twiddles(log_n, False), log_n)


def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform: evaluations at w^i (natural order) -> coefficients."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if n == 1:
        return x
    y = _ntt_impl(x, _stage_twiddles(log_n, True), log_n)
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
