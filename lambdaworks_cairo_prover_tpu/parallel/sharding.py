"""Multi-chip sharding of the prover's bulk math (SURVEY §2.3).

The reference is a single-process rayon program; the TPU-native scaling
dimensions are:
  * trace columns  — round-1 interpolation/LDE is independent per column
                     (TP-flavored sharding of the (16, cols, n) tensor);
  * the LDE domain — constraint evaluation, DEEP combination and Merkle leaf
                     hashing are pointwise over the domain axis (DP-flavored);
                     frame shifts become collective permutes, NTT stages
                     become all-to-alls, all inserted by XLA from shardings.

Proof bytes are mesh-shape invariant: sharding only changes op placement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..field import device as fd
from ..ntt import core as nttc


def fetch_np(x):
    """Host numpy copy of an array, valid under multi-process SPMD.

    `np.asarray` cannot fetch a `jax.Array` spanning non-addressable
    devices; reshard to fully-replicated first (an all-gather over the
    mesh) so every process holds the complete value — the prover's host
    work (transcript, Merkle paths, FRI tail) then stays in lockstep on
    all processes.  Single-process arrays pass straight through."""
    import numpy as np

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def make_mesh(n_devices: int | None = None, axis: str = "dom",
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def shard_columns(mesh: Mesh, data: jnp.ndarray, axis: str = "dom"):
    """Shard a (16, cols, n) trace tensor over the column axis."""
    return jax.device_put(data, NamedSharding(mesh, PSpec(None, axis, None)))


def shard_domain(mesh: Mesh, data: jnp.ndarray, axis: str = "dom"):
    """Shard a (16, ..., N) evaluation tensor over the domain (last) axis."""
    spec = [None] * (data.ndim - 1) + [axis]
    return jax.device_put(data, NamedSharding(mesh, PSpec(*spec)))


def sharded_lde_pipeline(mesh: Mesh, blowup: int, domain_size: int,
                         offset: int, axis: str = "dom"):
    """A jitted column-sharded interpolate+LDE pipeline over `mesh`.

    Input (16, cols, n) sharded by columns; output (16, cols, N) sharded by
    columns.  Per-column NTTs have no cross-device communication."""
    in_spec = NamedSharding(mesh, PSpec(None, axis, None))

    @jax.jit
    def pipeline(data):
        polys = nttc.interpolate_fft(data)
        return nttc.evaluate_on_lde_domain(polys, blowup, domain_size, offset)

    return pipeline, in_spec
