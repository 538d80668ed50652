"""Four-step (Bailey) distributed NTT over a device mesh.

This is THE communication pattern of the distributed STARK prover (SURVEY
§5: "NTT over the long axis as multi-stage butterflies with all-to-all
transposes").  The domain axis of every large transform in `prove(mesh=)`
runs through this module; compare the reference, whose FFT is a
single-process rayon loop (lambdaworks-math fft; SURVEY §2.2 N2).

Layout convention: domain-axis tensors are (16, B, N) with the LAST axis
block-sharded over the mesh (device d holds indices [d*N/D, (d+1)*N/D)),
so Merkle leaf hashing, subtree construction, constraint evaluation and
DEEP combination downstream are shard-local in natural domain order.

The transform factorizes N = R*C and keeps natural order on both ends:

    view x as M[r, c] = x[r*C + c]   (r-blocks = the input sharding)
    1. all-to-all #1:  r-sharded -> c-sharded        (transpose)
    2. local NTT_R along r:          G[c, t]
    3. twiddle:        G'[c, t] = G[c, t] * w_N^(c*t) (table sharded by c)
    4. all-to-all #2:  c-sharded -> t-sharded        (transpose)
    5. local NTT_C along c:          H[t, s] = X[s*R + t]
    6. all-to-all #3:  t-sharded -> s-sharded        (transpose to natural)

Three all-to-alls per transform ride the ICI; all compute is shard-local.
(A strided-layout variant would save two transposes but breaks the
natural-block layout every other prover stage depends on.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import device as fd
from ..field.params import N_LIMBS, P as PRIME, get_primitive_root_of_unity
from ..ntt import core as nttc


# Inter-factor table builder shared with the single-chip four-step path.
_build_inter = nttc.build_inter_table


class ShardedNTT:
    """Distributed DFTs for one mesh axis; caches twiddle tables and the
    compiled shard_map programs per (size, batch-shape, direction)."""

    def __init__(self, mesh: Mesh, axis: str = "dom"):
        self.mesh = mesh
        self.axis = axis
        self.d = mesh.shape[axis]
        self.spec_dom = NamedSharding(mesh, P(None, None, axis))
        self._inter_cache: dict = {}
        self._fn_cache: dict = {}
        self._pow_cache: dict = {}

    # -- planning -----------------------------------------------------------

    def plan(self, n: int):
        """Factorization N = R*C with D | R and D | C, or None if the size
        is too small to shard (falls back to a replicated transform)."""
        d = self.d
        if d == 1 or n < d * d:
            return None
        log = n.bit_length() - 1
        if (1 << log) != n:
            return None
        c = 1 << (log // 2)
        r = n // c
        if c % d or r % d:
            return None
        return r, c

    def supported(self, n: int) -> bool:
        return self.plan(n) is not None

    # -- tables -------------------------------------------------------------

    def inter_table(self, n: int, inverse: bool) -> jnp.ndarray:
        key = (n, inverse)
        if key not in self._inter_cache:
            r, c = self.plan(n)
            w = get_primitive_root_of_unity(n.bit_length() - 1)
            if inverse:
                w = pow(w, PRIME - 2, PRIME)
            a_bits = jnp.stack(
                [jnp.asarray(fd.powers(pow(w, 1 << b, PRIME), c))
                 for b in range(r.bit_length() - 1)]
            )
            sharding = NamedSharding(self.mesh, P(None, self.axis, None))
            build = jax.jit(functools.partial(_build_inter, r=r),
                            out_shardings=sharding)
            self._inter_cache[key] = build(a_bits)
        return self._inter_cache[key]

    def powers(self, base: int, n: int) -> jnp.ndarray:
        """Block-sharded (16, n) powers table [1, base, base^2, ...]
        (replicated when n does not divide the mesh — deep fold layers)."""
        key = (base % PRIME, n)
        if key not in self._pow_cache:
            self._pow_cache[key] = self.shard(
                jnp.asarray(nttc.offset_powers(base, n)))
        return self._pow_cache[key]

    def shard(self, x: jnp.ndarray) -> jnp.ndarray:
        """Block-shard the last axis of a (16, ..., N) tensor; tiny axes
        that do not divide the mesh (deep FRI fold layers) replicate."""
        spec = [None] * x.ndim
        if x.shape[-1] % self.d == 0:
            spec[-1] = self.axis
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    # -- transforms ---------------------------------------------------------

    def transform(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """DFT (no 1/n scaling) along the last axis of (16, B, n) or
        (16, n), block-sharded in and out, natural order both ends."""
        if x.ndim == 2:
            return self.transform(x[:, None, :], inverse)[:, 0, :]
        n = x.shape[-1]
        plan = self.plan(n)
        if plan is None:
            # fallback for sizes below the shard threshold: transform
            # replicated, then restore the block layout (or stay
            # replicated when the axis does not divide the mesh)
            return self.shard(_plain_dft(x, n, inverse))
        r, c = plan
        tbl = self.inter_table(n, inverse)
        key = (n, x.shape, inverse)
        if key not in self._fn_cache:
            d = self.d
            axis = self.axis
            logr = r.bit_length() - 1
            logc = c.bit_length() - 1
            twr = nttc._stage_twiddles(logr, inverse)
            twc = nttc._stage_twiddles(logc, inverse)

            @jax.jit
            @functools.partial(
                jax.shard_map,
                mesh=self.mesh,
                in_specs=(P(None, None, axis), P(None, axis, None)),
                out_specs=P(None, None, axis),
            )
            def fn(xl, tl):
                b = xl.shape[1]
                # local rows r of M[r, c]
                xv = xl.reshape(N_LIMBS, b, r // d, c)
                # A2A #1: r-sharded -> c-sharded
                xv = jax.lax.all_to_all(xv, axis, split_axis=3,
                                        concat_axis=2, tiled=True)
                xv = jnp.swapaxes(xv, 2, 3)          # (16, B, c/d, r)
                xv = nttc._ntt_impl(xv, twr, logr)   # G[c_local, t]
                xv = fd.mul(xv, tl[:, None, :, :])   # inter-factor twiddles
                # A2A #2: c-sharded -> t-sharded
                xv = jax.lax.all_to_all(xv, axis, split_axis=3,
                                        concat_axis=2, tiled=True)
                xv = jnp.swapaxes(xv, 2, 3)          # (16, B, r/d, c)
                xv = nttc._ntt_impl(xv, twc, logc)   # H[t_local, s]
                # A2A #3: t-sharded -> s-sharded (natural block order)
                xv = jax.lax.all_to_all(xv, axis, split_axis=3,
                                        concat_axis=2, tiled=True)
                xv = jnp.swapaxes(xv, 2, 3)          # (16, B, c/d, r)
                return xv.reshape(N_LIMBS, b, (r * c) // d)

            self._fn_cache[key] = fn
        return self._fn_cache[key](x, tbl)

    def interpolate(self, evals: jnp.ndarray) -> jnp.ndarray:
        """lambdaworks `interpolate_fft`: natural-order evals -> coeffs."""
        n = evals.shape[-1]
        y = self.transform(evals, inverse=True)
        n_inv = pow(n, PRIME - 2, PRIME)
        return _scale_const(y, n_inv)

    def evaluate_offset(self, coeffs: jnp.ndarray, domain_size: int,
                        offset: int) -> jnp.ndarray:
        """Evaluations of p on the coset offset*<w_domain_size> in natural
        order.  Exactly equals lambdaworks `evaluate_offset_fft` followed by
        the reference's step-subsampling (prover.rs:106-123): evaluating at
        w_{kN}^{ki} = w_N^i directly skips the k-fold oversample."""
        scaled = _scale_table(coeffs, self.powers(offset, coeffs.shape[-1]))
        padded = self._pad(scaled, domain_size)
        return self.transform(padded, inverse=False)

    def interpolate_offset(self, evals: jnp.ndarray, offset: int) -> jnp.ndarray:
        """Coefficients of the poly interpolating evals on offset*<w_n>."""
        coeffs = self.interpolate(evals)
        inv_off = pow(offset, PRIME - 2, PRIME)
        return _scale_table(coeffs, self.powers(inv_off, coeffs.shape[-1]))

    def _pad(self, x: jnp.ndarray, n_target: int) -> jnp.ndarray:
        if x.shape[-1] == n_target:
            return x
        pad = jnp.zeros(x.shape[:-1] + (n_target - x.shape[-1],), x.dtype)
        return self.shard(jnp.concatenate([x, pad], axis=-1))


@functools.partial(jax.jit, static_argnames=("n", "inverse"))
def _plain_dft(x, n: int, inverse: bool):
    log_n = n.bit_length() - 1
    return nttc._ntt_impl(x, nttc._stage_twiddles(log_n, inverse), log_n)


def _scale_const(x, c: int):
    return _scale_const_jit(x, jnp.asarray(fd.from_int(c)))


@jax.jit
def _scale_const_jit(x, c_arr):
    return fd.mul(x, c_arr.reshape((N_LIMBS,) + (1,) * (x.ndim - 1)))


@jax.jit
def _scale_table(x, table):
    # x: (16, B, n); table: (16, n)
    return fd.mul(x, table[:, None, :] if x.ndim == 3 else table)
