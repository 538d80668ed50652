"""Domain-sharded NTT: the four-step (Bailey) factorization over a device
mesh, with the single all-to-all transpose that SURVEY §5 identifies as THE
communication pattern of a distributed STARK prover ("NTT over the long
axis as multi-stage butterflies with all-to-all transposes").

The trace-column sharding in `sharding.py` scales round 1 until one column's
domain no longer fits a chip; this module scales the domain axis itself:

    N = N1 * N2, input x[n1 + N1*n2] viewed as M[n2, n1] (N2 x N1),
    n1 sharded over the mesh:
      1. local NTTs of size N2 along n2 (each device: N1/D columns)
      2. twiddle by w_N^(n1*k2)                       (local)
      3. all-to-all transpose: n1-sharded -> k2-sharded
      4. local NTTs of size N1 along n1
    output X[N2*k1 + k2] = C[k2, k1], returned k2-sharded.

Every step is compute-local except step 3, which XLA lowers to a single
ICI all-to-all.  Compare the reference, whose FFT is a single-process
rayon loop (lambdaworks-math fft; SURVEY §2.2 N2)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import device as fd
from ..field.params import N_LIMBS, P as PRIME, get_primitive_root_of_unity
from ..ntt import core as nttc


def _inter_twiddles(n1: int, n2: int) -> np.ndarray:
    """(16, n2, n1) Montgomery table T[k2, n1] = w_N^(n1*k2)."""
    n = n1 * n2
    w = get_primitive_root_of_unity(n.bit_length() - 1)
    rows = []
    for k2 in range(n2):
        base = pow(w, k2, PRIME)
        acc = 1
        row = []
        for _ in range(n1):
            row.append(acc)
            acc = acc * base % PRIME
        rows.append(row)
    flat = [v for row in rows for v in row]
    return fd.from_ints(flat).reshape(N_LIMBS, n2, n1)


def distributed_ntt_fn(mesh: Mesh, n: int, axis: str = "dom"):
    """Returns (fn, twiddle_table).  ``fn(m, tw)`` expects the input already
    viewed as (16, N2, N1) = x.reshape(16, N2, N1) (so M[n2, n1] with
    x[n1 + N1*n2]), sharded P(None, None, axis); it returns the (16, N2, N1)
    matrix C[k2, k1], sharded P(None, axis, None), with
    NTT(x)[N2*k1 + k2] = C[k2, k1]."""
    d = mesh.shape[axis]
    n1 = d * d if d * d * d <= n else d  # any multiple of d dividing n works
    while n % n1:
        n1 //= 2
    n2 = n // n1
    tw = _inter_twiddles(n1, n2)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis)),
        out_specs=P(None, axis, None),
    )
    def fn(m_local, tw_local):
        # (16, N2, N1/D): step 1 — local size-N2 NTTs along axis 1
        cols = jnp.swapaxes(m_local, 1, 2)          # (16, N1/D, N2)
        cols = nttc.ntt(cols)
        b = jnp.swapaxes(cols, 1, 2)                # (16, N2, N1/D)
        # step 2 — inter-factor twiddles (table sharded identically)
        b = fd.mul(b, tw_local)
        # step 3 — THE all-to-all: n1-sharded -> k2-sharded
        b = jax.lax.all_to_all(b, axis, split_axis=1, concat_axis=2,
                               tiled=True)          # (16, N2/D, N1)
        # step 4 — local size-N1 NTTs along the last axis
        return nttc.ntt(b)

    return fn, tw


def distributed_ntt(mesh: Mesh, x: jnp.ndarray, axis: str = "dom"):
    """Convenience wrapper: full NTT of (16, n) via the sharded four-step
    plan; returns the (16, n) result unsharded (natural order)."""
    n = x.shape[-1]
    fn, tw = distributed_ntt_fn(mesh, n, axis)
    n2, n1 = tw.shape[1], tw.shape[2]
    m = x.reshape(N_LIMBS, n2, n1)
    c = fn(jax.device_put(m, NamedSharding(mesh, P(None, None, axis))),
           jax.device_put(jnp.asarray(tw),
                          NamedSharding(mesh, P(None, None, axis))))
    # X[N2*k1 + k2] = C[k2, k1]
    return jnp.swapaxes(c, 1, 2).reshape(N_LIMBS, n)
