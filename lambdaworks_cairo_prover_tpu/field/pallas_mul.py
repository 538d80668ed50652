"""Fused Pallas TPU kernel for Stark252 Montgomery multiplication.

Same math as `device.mul` (schoolbook 16x16-bit limb product + single-shot
sparse-prime REDC), but executed as ONE Mosaic kernel: every intermediate —
the 256 partial products, the 33 lazy columns, the carry chains, m = T_lo *
(-p^-1), the T + m*p accumulation and the conditional subtract — lives in
vector registers / VMEM, so HBM sees exactly 2 operand reads and 1 result
write per element instead of the dozens of materialized (16, 16, ...)
intermediates and per-limb `lax.scan` passes of the XLA lowering.

Data layout: operands are reshaped to ``(16, G*8, 128)`` so each limb row of
a block is one native (8, 128) vreg tile; the grid walks G blocks of
8*128 = 1024 elements.  All loops are unrolled at trace time — the kernel is
straight-line u32 vector code (~2.5 vector ops per element).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import LIMB_MASK, N_LIMBS, P_INV_NEG_LIMBS, P_LIMBS

import os

# LCP_PALLAS_INTERPRET=1 forces interpreter-mode pallas everywhere — used by
# the CPU test suite to exercise the exact fused-kernel code paths
_FORCE_INTERPRET = os.environ.get("LCP_PALLAS_INTERPRET") == "1"


def _interp(flag: bool) -> bool:
    return flag or _FORCE_INTERPRET

_SUB = 8
_LANE = 128
_BLOCK = _SUB * _LANE  # elements per grid step


def _carry(cols):
    """Resolve lazy u32 columns (< 2^22) into clean 16-bit limbs."""
    out = []
    carry = None
    for c in cols:
        v = c if carry is None else c + carry
        out.append(v & LIMB_MASK)
        carry = v >> 16
    return out


def _redc_product(a, b, zero):
    """16 canonical limbs of REDC(a*b) from two 16-limb register lists."""
    cols = [zero] * 33
    for i in range(N_LIMBS):
        ai = a[i]
        for j in range(N_LIMBS):
            prod = ai * b[j]
            cols[i + j] = cols[i + j] + (prod & LIMB_MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> 16)
    t = _carry(cols)  # 33 clean limbs (carry out of limb 32 is zero)

    # m = T_lo * (-p^-1) mod 2^256
    mcols = [zero] * N_LIMBS
    for i in range(N_LIMBS):
        ti = t[i]
        for j in range(N_LIMBS - i):
            pij = P_INV_NEG_LIMBS[j]
            if pij == 0:
                continue
            prod = ti * pij
            mcols[i + j] = mcols[i + j] + (prod & LIMB_MASK)
            if i + j + 1 < N_LIMBS:
                mcols[i + j + 1] = mcols[i + j + 1] + (prod >> 16)
    m = _carry(mcols)  # 16 limbs, top carry dropped (mod 2^256)

    # acc = T + m*p with p = 1 + 17*2^192 + 2048*2^240 (limbs 0, 12, 15)
    acc = list(t) + [zero]
    for k in range(N_LIMBS):
        mk = m[k]
        acc[k] = acc[k] + mk
        p17 = mk * 17
        acc[12 + k] = acc[12 + k] + (p17 & LIMB_MASK)
        acc[13 + k] = acc[13 + k] + (p17 >> 16)
        p2048 = mk * 2048
        acc[15 + k] = acc[15 + k] + (p2048 & LIMB_MASK)
        acc[16 + k] = acc[16 + k] + (p2048 >> 16)
    u = _carry(acc)[N_LIMBS : 2 * N_LIMBS]  # (T + m*p) / 2^256 < 2p
    return _cond_sub_p(u, zero)


def _cond_sub_p(u, zero):
    """If u >= p subtract p (borrow chain; borrow==0 <=> u >= p)."""
    borrow = zero
    diff = []
    for k in range(N_LIMBS):
        rhs = P_LIMBS[k] + borrow
        nb = (u[k] < rhs).astype(jnp.uint32)
        diff.append((u[k] - rhs) & LIMB_MASK)
        borrow = nb
    ge = borrow == 0
    return [jnp.where(ge, diff[k], u[k]) for k in range(N_LIMBS)]


def _add_mod(a, t, zero):
    """Canonical limbs of a + t (both < p)."""
    return _cond_sub_p(_carry([a[k] + t[k] for k in range(N_LIMBS)]), zero)


def _sub_mod(a, t, zero):
    """Canonical limbs of a - t (both < p)."""
    borrow = zero
    diff = []
    for k in range(N_LIMBS):
        rhs = t[k] + borrow
        nb = (a[k] < rhs).astype(jnp.uint32)
        diff.append((a[k] - rhs) & LIMB_MASK)
        borrow = nb
    # on underflow add p back (one lazy carry sweep; P_LIMBS are constants)
    under = borrow  # 0 or 1
    return _carry([diff[k] + P_LIMBS[k] * under for k in range(N_LIMBS)])


def _mul_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(N_LIMBS)]
    b = [b_ref[i] for i in range(N_LIMBS)]
    zero = jnp.zeros_like(a[0])
    out = _redc_product(a, b, zero)
    for k in range(N_LIMBS):
        o_ref[k] = out[k]


def _add_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(N_LIMBS)]
    b = [b_ref[i] for i in range(N_LIMBS)]
    out = _add_mod(a, b, jnp.zeros_like(a[0]))
    for k in range(N_LIMBS):
        o_ref[k] = out[k]


def _sub_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(N_LIMBS)]
    b = [b_ref[i] for i in range(N_LIMBS)]
    out = _sub_mod(a, b, jnp.zeros_like(a[0]))
    for k in range(N_LIMBS):
        o_ref[k] = out[k]


def _butterfly2_kernel(a_ref, b_ref, c_ref, d_ref, w_ref, w2a_ref, w2b_ref,
                       x0_ref, x1_ref, x2_ref, x3_ref):
    """Two fused radix-2 NTT stages (a radix-4 step): for a block
    [A, B, C, D] of four m-strided quarters,
      stage s:   A' = A + w*B,  B' = A - w*B,  C' = C + w*D,  D' = C - w*D
      stage s+1: X0 = A' + w2a*C', X2 = A' - w2a*C',
                 X1 = B' + w2b*D', X3 = B' - w2b*D'
    — 3 Montgomery products per 4 points (vs 4 over two separate stages)
    and ONE HBM round trip instead of two."""
    a = [a_ref[i] for i in range(N_LIMBS)]
    b = [b_ref[i] for i in range(N_LIMBS)]
    c = [c_ref[i] for i in range(N_LIMBS)]
    d = [d_ref[i] for i in range(N_LIMBS)]
    w = [w_ref[i] for i in range(N_LIMBS)]
    w2a = [w2a_ref[i] for i in range(N_LIMBS)]
    w2b = [w2b_ref[i] for i in range(N_LIMBS)]
    zero = jnp.zeros_like(a[0])
    t = _redc_product(b, w, zero)
    a1 = _add_mod(a, t, zero)
    b1 = _sub_mod(a, t, zero)
    t = _redc_product(d, w, zero)
    c1 = _add_mod(c, t, zero)
    d1 = _sub_mod(c, t, zero)
    u = _redc_product(c1, w2a, zero)
    x0 = _add_mod(a1, u, zero)
    x2 = _sub_mod(a1, u, zero)
    v = _redc_product(d1, w2b, zero)
    x1 = _add_mod(b1, v, zero)
    x3 = _sub_mod(b1, v, zero)
    for k in range(N_LIMBS):
        x0_ref[k] = x0[k]
        x1_ref[k] = x1[k]
        x2_ref[k] = x2[k]
        x3_ref[k] = x3[k]


def _butterfly_kernel(a_ref, b_ref, w_ref, o0_ref, o1_ref):
    """Radix-2 NTT butterfly: t = b*w (Montgomery), o0 = a+t, o1 = a-t —
    one fused kernel per tile instead of three (mul/add/sub) HBM round
    trips plus a materialized t."""
    a = [a_ref[i] for i in range(N_LIMBS)]
    b = [b_ref[i] for i in range(N_LIMBS)]
    w = [w_ref[i] for i in range(N_LIMBS)]
    zero = jnp.zeros_like(a[0])
    t = _redc_product(b, w, zero)
    o0 = _add_mod(a, t, zero)
    o1 = _sub_mod(a, t, zero)
    for k in range(N_LIMBS):
        o0_ref[k] = o0[k]
        o1_ref[k] = o1[k]


_KERNELS = {"mul": _mul_kernel, "add": _add_kernel, "sub": _sub_kernel}


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def _binop_blocks(a, b, op, interpret=False):
    """a, b: (16, G*8, 128) u32 -> elementwise modular op."""
    g = a.shape[1] // _SUB
    # Blocked semantics: the index map returns BLOCK indices (scaled by the
    # block shape internally), so block i along the padded-batch axis is
    # (0, i, 0), not an element offset.
    spec = pl.BlockSpec((N_LIMBS, _SUB, _LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _KERNELS[op],
        grid=(g,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        interpret=_interp(interpret),
    )(a, b)


def _binop(a, b, op, interpret):
    """Broadcast, flatten the batch, pad to a block multiple, run the fused
    kernel and restore the shape.  Callers gate on batch size (small/scalar
    shapes stay on the XLA path — padding waste dominates there)."""
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

    def _bcast(x):
        pad = len(bshape) - (x.ndim - 1)
        x = x.reshape((N_LIMBS,) + (1,) * pad + x.shape[1:])
        return jnp.broadcast_to(x, (N_LIMBS,) + bshape)

    a = _bcast(a).reshape(N_LIMBS, -1)
    b = _bcast(b).reshape(N_LIMBS, -1)
    n = a.shape[1]
    padded = -(-n // _BLOCK) * _BLOCK
    if padded != n:
        pad = ((0, 0), (0, padded - n))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    out = _binop_blocks(a.reshape(N_LIMBS, -1, _LANE),
                        b.reshape(N_LIMBS, -1, _LANE), op,
                        interpret=interpret)
    return out.reshape(N_LIMBS, -1)[:, :n].reshape((N_LIMBS,) + bshape)


def mul(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Drop-in replacement for `device.mul` on large batches."""
    return _binop(a, b, "mul", interpret)


def add(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Drop-in replacement for `device.add` on large batches."""
    return _binop(a, b, "add", interpret)


def sub(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Drop-in replacement for `device.sub` on large batches."""
    return _binop(a, b, "sub", interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _butterfly_blocks(a, b, w, interpret=False):
    g = a.shape[1] // _SUB
    spec = pl.BlockSpec((N_LIMBS, _SUB, _LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(a.shape, jnp.uint32)
    return pl.pallas_call(
        _butterfly_kernel,
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(shape, shape),
        interpret=_interp(interpret),
    )(a, b, w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _butterfly2_blocks(a, b, c, d, w, w2a, w2b, interpret=False):
    g = a.shape[1] // _SUB
    spec = pl.BlockSpec((N_LIMBS, _SUB, _LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(a.shape, jnp.uint32)
    return pl.pallas_call(
        _butterfly2_kernel,
        grid=(g,),
        in_specs=[spec] * 7,
        out_specs=(spec,) * 4,
        out_shape=(shape,) * 4,
        interpret=_interp(interpret),
    )(a, b, c, d, w, w2a, w2b)


def butterfly2(quarters, tws, interpret: bool = False):
    """Fused two-stage butterfly on four quarters with three twiddle
    vectors; all operands broadcast to a common batch shape."""
    ops = list(quarters) + list(tws)
    bshape = jnp.broadcast_shapes(*[o.shape[1:] for o in ops])

    def _bcast(x):
        pad = len(bshape) - (x.ndim - 1)
        x = x.reshape((N_LIMBS,) + (1,) * pad + x.shape[1:])
        return jnp.broadcast_to(x, (N_LIMBS,) + bshape).reshape(N_LIMBS, -1)

    ops = [_bcast(o) for o in ops]
    n = ops[0].shape[1]
    padded = -(-n // _BLOCK) * _BLOCK
    if padded != n:
        ops = [jnp.pad(o, ((0, 0), (0, padded - n))) for o in ops]
    outs = _butterfly2_blocks(
        *[o.reshape(N_LIMBS, -1, _LANE) for o in ops], interpret=interpret)
    out_shape = (N_LIMBS,) + bshape
    return tuple(o.reshape(N_LIMBS, -1)[:, :n].reshape(out_shape)
                 for o in outs)


def butterfly(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray,
              interpret: bool = False):
    """Fused radix-2 butterfly: returns (a + b*w, a - b*w) elementwise.

    All three operands are broadcast to a common batch shape first (the NTT
    passes w as (16, 1, 1, m) against (16, B, g, m) values)."""
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:], w.shape[1:])

    def _bcast(x):
        pad = len(bshape) - (x.ndim - 1)
        x = x.reshape((N_LIMBS,) + (1,) * pad + x.shape[1:])
        return jnp.broadcast_to(x, (N_LIMBS,) + bshape)

    a = _bcast(a).reshape(N_LIMBS, -1)
    b = _bcast(b).reshape(N_LIMBS, -1)
    w = _bcast(w).reshape(N_LIMBS, -1)
    n = a.shape[1]
    padded = -(-n // _BLOCK) * _BLOCK
    if padded != n:
        pad = ((0, 0), (0, padded - n))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
        w = jnp.pad(w, pad)
    o0, o1 = _butterfly_blocks(a.reshape(N_LIMBS, -1, _LANE),
                               b.reshape(N_LIMBS, -1, _LANE),
                               w.reshape(N_LIMBS, -1, _LANE),
                               interpret=interpret)
    out_shape = (N_LIMBS,) + bshape
    return (o0.reshape(N_LIMBS, -1)[:, :n].reshape(out_shape),
            o1.reshape(N_LIMBS, -1)[:, :n].reshape(out_shape))
