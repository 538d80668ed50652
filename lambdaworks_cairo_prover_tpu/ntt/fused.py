"""Fused-stage Pallas NTT: the whole transform in ~(T+4) HBM passes.

The radix-2/4 schedule in ntt/core.py dispatches one Pallas butterfly per
stage pair and lets XLA glue the stages together; the glue is what costs:
per stage XLA materializes broadcast twiddle operands (3 full-size arrays),
strided quarter slices and a stack/reshape — ~5 extra HBM round trips per
stage, which is why 2^20 measured ~16 M pts/s while the Montgomery-mul
kernel alone sustains ~2.4 G modmul/s (tools/microbench.py).

This module runs the SAME math (decimation-in-frequency radix-2, identical
field values, hence identical proof bytes) restructured so data crosses HBM
once per kernel:

  * Global stages (m >= CHUNK): one Pallas call per stage PAIR.  The four
    quarter blocks of every 2m-group are fetched by block-index maps (no
    XLA slicing), per-position twiddle tables are read block-wise (never
    broadcast), and the four output quarters are written CONTIGUOUSLY as
    one (4*CHUNK)-element block — the resulting block permutation
    (physical = 4*(g*mq + j) + q) is undone analytically by the NEXT
    kernel's input index maps, so no reshuffle pass ever materializes.
  * Local stages (m < CHUNK): ONE Pallas call runs all log2(CHUNK) stages
    with the chunk resident in VMEM.  Stages with m >= 128 use sublane
    slab slicing (classic radix-4 pairing, 0.5 mul/pt/stage); stages with
    m < 128 pair within a 128-lane row and use a dense roll/select
    formulation (1 mul/pt/stage, but full-lane vectors instead of the
    128x-padded sub-lane ops XLA would emit).
  * DIF ordering: natural input -> bit-reversed output, fixed by the one
    factored bit-reverse permutation at the end (core._bitrev_permute).

Replaces the four-step single-chip path of ntt/core.py for large n; the
sharded (multi-device) four-step in parallel/four_step.py is unchanged.
Reference semantics: lambdaworks evaluate/interpolate FFT stack (usage
/root/reference/src/starks/prover.rs:106-159, trace.rs:104-110).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import device as fd
from ..field.pallas_mul import (
    _FORCE_INTERPRET,
    _add_mod,
    _redc_product,
    _sub_mod,
)
from ..field.params import N_LIMBS, P, get_primitive_root_of_unity

CHUNK_LOG = 12           # 4096 elements per VMEM-resident block
CHUNK = 1 << CHUNK_LOG
SUB = CHUNK // 128       # sublane rows per block
FUSED_MIN_LOG = CHUNK_LOG
_LANE_LOG = 7            # stages with m < 128 pair within a lane row


DEFAULT_MIN_LOG = 17     # fused is the default at n >= 2^17 (see table)


def use_fused(log_n: int) -> bool:
    """Fused path is the DEFAULT for log_n >= 17 (round-5 v5e measurement,
    non-periodic input, per-transform best-of-3 after warm):

        n      four-step   fused
        2^17    70-74       169
        2^18     176        327
        2^19      67        165
        2^20      33         91
        2^21      27         90     [Mpts/s]

    The four-step plan collapses whenever an inner factor reaches 2^10
    (XLA materializes broadcast twiddles + strided quarter slices each
    stage); the fused DIF kernels keep >=90 Mpts/s through 2^21, the
    flagship LDE size.  `LCP_FUSED_NTT=0` force-disables (pure XLA
    four-step); `LCP_FUSED_NTT=1` forces fused down to 2^12."""
    env = os.environ.get("LCP_FUSED_NTT")
    if env == "1":
        return log_n >= FUSED_MIN_LOG
    if env == "0":
        return False
    # Mosaic kernels only lower on real TPU; CPU (tests, virtual meshes)
    # stays on the XLA four-step path unless interpret mode is forced.
    return log_n >= DEFAULT_MIN_LOG and (
        fd._pallas_enabled() or _FORCE_INTERPRET)


def enabled() -> bool:
    """Back-compat alias: is the fused path active at any size?"""
    return use_fused(DEFAULT_MIN_LOG)


# ---------------------------------------------------------------------------
# Twiddle tables
# ---------------------------------------------------------------------------

_table_cache: dict = {}


def _root(log_n: int, inverse: bool) -> int:
    w = get_primitive_root_of_unity(log_n)
    return pow(w, P - 2, P) if inverse else w


def local_table(log_chunk: int, inverse: bool):
    """(16, L, chunk) per-position table: row s holds, at position p,
    w_{2^(s+1)}^(p mod 2^s) — exactly the factor each DIF stage needs at
    every position of its view, for sublane quarter slices and lane rolls
    alike."""
    key = ("local", log_chunk, inverse)
    if key not in _table_cache:
        chunk = 1 << log_chunk
        rows = []
        for s in range(log_chunk):
            w = _root(s + 1, inverse)
            row = jnp.asarray(fd.powers(w, 1 << s))
            rows.append(jnp.tile(row, (1, chunk >> s)))
        tbl = jnp.stack(rows, axis=1)  # (16, L, chunk)
        if isinstance(tbl, jax.core.Tracer):
            return tbl
        _table_cache[key] = tbl
    return _table_cache[key]


def global_tables(log_n: int, inverse: bool):
    """Stage twiddle tables for s in [CHUNK_LOG, log_n): table s is
    (16, 2^s) with entry j = w_{2^(s+1)}^j."""
    key = ("global", log_n, inverse)
    if key not in _table_cache:
        tabs = []
        for s in range(CHUNK_LOG, log_n):
            w = _root(s + 1, inverse)
            tabs.append(jnp.asarray(fd.powers(w, 1 << s)))
        tabs = tuple(tabs)
        if any(isinstance(t, jax.core.Tracer) for t in tabs):
            return tabs
        _table_cache[key] = tabs
    return _table_cache[key]


def fused_tables(log_n: int, inverse: bool):
    """Injectable bundle for jitted prover kernels (see core.inject_tables,
    key ("fused", log_n, inverse))."""
    return (local_table(CHUNK_LOG, inverse), global_tables(log_n, inverse))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _limbs(ref):
    return [ref[i] for i in range(N_LIMBS)]


def _where(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def _gpair_kernel(a_ref, b_ref, c_ref, d_ref, w1a_ref, w1b_ref, w2_ref,
                  o_ref):
    """Two DIF stages (m, m/2) on four quarter blocks of a 2m-group:
        s1 = A+C   s2 = B+D   t1 = (A-C)*w1[k]     t2 = (B-D)*w1[m/2+k]
        out = [ s1+s2 | (s1-s2)*w2[k'] | t1+t2 | (t1-t2)*w2[k'] ]
    written contiguously as one 4*CHUNK block (quarter q at sublane rows
    [q*SUB, (q+1)*SUB))."""
    a, b, c, d = _limbs(a_ref), _limbs(b_ref), _limbs(c_ref), _limbs(d_ref)
    w1a, w1b, w2 = _limbs(w1a_ref), _limbs(w1b_ref), _limbs(w2_ref)
    zero = jnp.zeros_like(a[0])
    s1 = _add_mod(a, c, zero)
    s2 = _add_mod(b, d, zero)
    t1 = _redc_product(_sub_mod(a, c, zero), w1a, zero)
    t2 = _redc_product(_sub_mod(b, d, zero), w1b, zero)
    oa = _add_mod(s1, s2, zero)
    ob = _redc_product(_sub_mod(s1, s2, zero), w2, zero)
    oc = _add_mod(t1, t2, zero)
    od = _redc_product(_sub_mod(t1, t2, zero), w2, zero)
    for l in range(N_LIMBS):
        o_ref[l, 0 * SUB:1 * SUB] = oa[l]
        o_ref[l, 1 * SUB:2 * SUB] = ob[l]
        o_ref[l, 2 * SUB:3 * SUB] = oc[l]
        o_ref[l, 3 * SUB:4 * SUB] = od[l]


def _gsingle_kernel(a_ref, b_ref, w_ref, o_ref):
    """One DIF stage on two half blocks: out = [A+B | (A-B)*w[k]]."""
    a, b, w = _limbs(a_ref), _limbs(b_ref), _limbs(w_ref)
    zero = jnp.zeros_like(a[0])
    hi = _add_mod(a, b, zero)
    lo = _redc_product(_sub_mod(a, b, zero), w, zero)
    for l in range(N_LIMBS):
        o_ref[l, :SUB] = hi[l]
        o_ref[l, SUB:2 * SUB] = lo[l]


def _local_kernel_body(x_ref, tw_ref, o_ref, log_chunk: int):
    """All DIF stages with m < CHUNK on one VMEM-resident chunk."""
    x = _limbs(x_ref)  # each (SUB, 128)
    zero = jnp.zeros_like(x[0])

    def tw_row(s):
        return [tw_ref[l, s] for l in range(N_LIMBS)]

    def qview(arrs, mr):
        """(SUB,128) -> (G2, 4, mr, 128) quarter view for a 2m-group of
        4*mr rows."""
        return [v.reshape(SUB // (4 * mr), 4, mr, 128) for v in arrs]

    def qcat(parts):
        """Inverse of qview: 4 quarter lists -> (SUB,128) list."""
        out = []
        for l in range(N_LIMBS):
            st = jnp.stack([p[l] for p in parts], axis=1)
            out.append(st.reshape(SUB, 128))
        return out

    s = log_chunk - 1
    while s >= _LANE_LOG:
        m = 1 << s
        if s - 1 >= _LANE_LOG:
            # fused pair (m, m/2): quarters are sublane slabs of mr rows
            mr = (m // 2) // 128
            xv = qview(x, mr)
            a = [v[:, 0] for v in xv]
            b = [v[:, 1] for v in xv]
            c = [v[:, 2] for v in xv]
            d = [v[:, 3] for v in xv]
            r1 = qview(tw_row(s), mr)
            r2 = qview(tw_row(s - 1), mr)
            w1a = [v[:, 0] for v in r1]
            w1b = [v[:, 1] for v in r1]
            w2b = [v[:, 1] for v in r2]
            w2d = [v[:, 3] for v in r2]
            z = jnp.zeros_like(a[0])
            s1 = _add_mod(a, c, z)
            s2 = _add_mod(b, d, z)
            t1 = _redc_product(_sub_mod(a, c, z), w1a, z)
            t2 = _redc_product(_sub_mod(b, d, z), w1b, z)
            oa = _add_mod(s1, s2, z)
            ob = _redc_product(_sub_mod(s1, s2, z), w2b, z)
            oc = _add_mod(t1, t2, z)
            od = _redc_product(_sub_mod(t1, t2, z), w2d, z)
            x = qcat([oa, ob, oc, od])
            s -= 2
        else:
            # single sublane stage at m = 128: halves are alternate rows
            hv = [v.reshape(SUB // 2, 2, 128) for v in x]
            a = [v[:, 0] for v in hv]
            b = [v[:, 1] for v in hv]
            w = [v[:, 1] for v in
                 [t.reshape(SUB // 2, 2, 128) for t in tw_row(s)]]
            z = jnp.zeros_like(a[0])
            hi = _add_mod(a, b, z)
            lo = _redc_product(_sub_mod(a, b, z), w, z)
            x = [jnp.stack([h, lw], axis=1).reshape(SUB, 128)
                 for h, lw in zip(hi, lo)]
            s -= 1

    # lane stages (m < 128): dense roll/select — pairs sit within one
    # 128-lane row (2m divides 128), so a lane-axis roll aligns partners.
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    while s >= 0:
        m = 1 << s
        xp = [jnp.roll(v, -m, axis=1) for v in x]   # x[p+m] (valid at a)
        xm = [jnp.roll(v, m, axis=1) for v in x]    # x[p-m] (valid at b)
        ssum = _add_mod(x, xp, zero)
        diff = _sub_mod(xm, x, zero)
        t = _redc_product(diff, tw_row(s), zero)
        is_a = ((lane >> s) & 1) == 0
        x = _where(is_a, ssum, t)
        s -= 1

    for l in range(N_LIMBS):
        o_ref[l] = x[l]


# ---------------------------------------------------------------------------
# Stage drivers
# ---------------------------------------------------------------------------


def _interpret(flag: bool = False) -> bool:
    return flag or _FORCE_INTERPRET


def _phys_block(lr, prev):
    """Physical (within-row) block index of math block ``lr`` after the
    previous global stage's contiguous-quarter write.

    prev = None        identity (first stage reads natural layout)
    prev = ("pair", mq)  lr = g*4mq + q*mq + j  ->  4*(g*mq + j) + q
    prev = ("single", mh) lr = g*2mh + h*mh + j ->  2*(g*mh + j) + h
    """
    if prev is None:
        return lr
    kind, mq = prev
    if kind == "pair":
        q = (lr // mq) % 4
        g = lr // (4 * mq)
        j = lr % mq
        return 4 * (g * mq + j) + q
    q = (lr // mq) % 2
    g = lr // (2 * mq)
    j = lr % mq
    return 2 * (g * mq + j) + q


def _block_spec(block_rows, index_fn):
    return pl.BlockSpec((N_LIMBS, block_rows, 128),
                        lambda i, _f=index_fn: (0, _f(i), 0),
                        memory_space=pltpu.VMEM)


def _global_pair(x, w1, w2, s: int, nb_row: int, prev, interpret=False):
    """One Pallas call for DIF stages (2^s, 2^(s-1)); x: (16, TOT//128, 128)."""
    mq = (1 << (s - 1)) // CHUNK   # blocks per quarter
    steps_row = nb_row // 4
    total_steps = (x.shape[1] * 128) // (4 * CHUNK)

    def math_block(i, q):
        row = i // steps_row
        rem = i % steps_row
        g = rem // mq
        j = rem % mq
        lr = g * 4 * mq + q * mq + j
        return row * nb_row + _phys_block(lr, prev)

    def tw1_block(i, half):
        return half * mq + (i % steps_row) % mq

    def tw2_block(i):
        return (i % steps_row) % mq

    in_specs = [
        _block_spec(SUB, lambda i, q=q: math_block(i, q)) for q in range(4)
    ] + [
        _block_spec(SUB, lambda i: tw1_block(i, 0)),
        _block_spec(SUB, lambda i: tw1_block(i, 1)),
        _block_spec(SUB, tw2_block),
    ]
    out = pl.pallas_call(
        _gpair_kernel,
        grid=(total_steps,),
        in_specs=in_specs,
        out_specs=_block_spec(4 * SUB, lambda i: i),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        interpret=_interpret(interpret),
    )(x, x, x, x, w1, w1, w2)
    return out, ("pair", mq)


def _global_single(x, w1, s: int, nb_row: int, prev, interpret=False):
    mh = (1 << s) // CHUNK
    steps_row = nb_row // 2
    total_steps = (x.shape[1] * 128) // (2 * CHUNK)

    def math_block(i, h):
        row = i // steps_row
        rem = i % steps_row
        g = rem // mh
        j = rem % mh
        lr = g * 2 * mh + h * mh + j
        return row * nb_row + _phys_block(lr, prev)

    in_specs = [
        _block_spec(SUB, lambda i: math_block(i, 0)),
        _block_spec(SUB, lambda i: math_block(i, 1)),
        _block_spec(SUB, lambda i: (i % steps_row) % mh),
    ]
    out = pl.pallas_call(
        _gsingle_kernel,
        grid=(total_steps,),
        in_specs=in_specs,
        out_specs=_block_spec(2 * SUB, lambda i: i),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        interpret=_interpret(interpret),
    )(x, x, w1)
    return out, ("single", mh)


def _local(x, tw, nb_row: int, prev, log_chunk: int, interpret=False):
    total_steps = (x.shape[1] * 128) // CHUNK
    nl = tw.shape[1]

    def in_block(i):
        row = i // nb_row
        return row * nb_row + _phys_block(i % nb_row, prev)

    kernel = functools.partial(_local_kernel_body, log_chunk=log_chunk)
    return pl.pallas_call(
        kernel,
        grid=(total_steps,),
        in_specs=[
            _block_spec(SUB, in_block),
            pl.BlockSpec((N_LIMBS, nl, SUB, 128), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_block_spec(SUB, lambda i: i),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        interpret=_interpret(interpret),
    )(x, tw.reshape(N_LIMBS, nl, SUB, 128))


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def ntt_fused(x: jnp.ndarray, log_n: int, inverse: bool,
              tables=None, interpret: bool = False) -> jnp.ndarray:
    """DIF transform along the last axis (natural order in AND out; the
    trailing bit-reverse is applied here).  Identical values to
    core._ntt_impl.  ``tables``: optional (local_tw, global_tabs) from
    fused_tables() — pass traced arrays inside jitted kernels."""
    from . import core as nttc  # late import: core imports this module

    n = 1 << log_n
    assert x.shape[-1] == n and log_n >= CHUNK_LOG
    if tables is None:
        tables = nttc._injected(("fused", log_n, inverse))
    if tables is None:
        tables = fused_tables(log_n, inverse)
    tw_local, gtabs = tables

    lead = x.shape[1:-1]
    flat = x.reshape(N_LIMBS, -1)
    tot = flat.shape[1]
    nb_row = n // CHUNK
    xr = flat.reshape(N_LIMBS, tot // 128, 128)

    prev = None
    s = log_n - 1
    while s >= CHUNK_LOG:
        if s - 1 >= CHUNK_LOG:
            w1 = gtabs[s - CHUNK_LOG].reshape(N_LIMBS, -1, 128)
            w2 = gtabs[s - 1 - CHUNK_LOG].reshape(N_LIMBS, -1, 128)
            xr, prev = _global_pair(xr, w1, w2, s, nb_row, prev,
                                    interpret=interpret)
            s -= 2
        else:
            w1 = gtabs[s - CHUNK_LOG].reshape(N_LIMBS, -1, 128)
            xr, prev = _global_single(xr, w1, s, nb_row, prev,
                                      interpret=interpret)
            s -= 1

    xr = _local(xr, tw_local, nb_row, prev, CHUNK_LOG,
                interpret=interpret)

    out = xr.reshape((N_LIMBS,) + lead + (n,))
    return nttc._bitrev_permute(out, log_n)
