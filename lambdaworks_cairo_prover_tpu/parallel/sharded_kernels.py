"""Domain-sharded prover kernels: rounds 1-4 with the LDE domain axis
block-sharded over a device mesh (SURVEY §5 long-context plan; the part
of the reference this generalizes is prover.rs:169-184's rayon loop).

Layout: every (16, ..., N) domain tensor is block-sharded on its last
axis (device d holds points [d*N/D, (d+1)*N/D) in natural coset order).
Under that layout:

  * NTT/iNTT/LDE        -> four-step transforms, 3 all-to-alls each
                           (parallel/four_step.py)
  * constraint eval     -> shard-local; the frame's forward row shifts
                           (jnp.roll by k*blowup) lower to collective
                           permutes exchanging only the halo
  * Merkle leaf hashing -> shard-local (leaves stay in natural order)
  * tree levels         -> shard-local subtrees; the top log2(D) levels
                           reduce across shards (XLA inserts the gather)
  * DEEP combination    -> shard-local + batch-inverse scan
  * FRI folds           -> strided even/odd split (reshard) + four-step

Challenges enter as runtime limb arrays exactly like the single-chip
kernels, so the transcript schedule and therefore the proof bytes are
identical for any mesh shape (asserted by tests/test_domain_sharded.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..air.frame import _DeviceRow
from ..air.values import DeviceCtx
from ..field import device as fd
from ..hash import keccak_device as kd
from ..ntt import core as nttc
from ..prover.kernels import ProverKernels, _tree_levels
from .four_step import ShardedNTT


class _RollFrame:
    """Whole-domain frame: row k = the LDE evaluations shifted by
    k*blowup with wraparound (identical values to the chunked halo frame
    in prover/kernels.py; the roll becomes a collective permute).

    NOTE: expressed as whole-domain shifts inside one jit program — XLA is
    free to fuse the shifted views into the constraint evaluation, but if
    it materialises them the per-device working set gains one LDE-shard
    copy per distinct frame offset (3 for the Cairo AIR).  If per-device
    HBM becomes the binding constraint before shard count can grow, port
    the _EVAL_CHUNK sub-chunking from prover/kernels.py::round2 to run
    shard-locally here."""

    def __init__(self, data, offsets, blowup, out_len):
        self.ctx = DeviceCtx(batch_shape=(out_len,))
        self._rows = {
            k: _DeviceRow(self.ctx, jnp.roll(data, -k * blowup, axis=2))
            for k in set(offsets)
        }

    def get_row(self, k):
        return self._rows[k]


class ShardedProverKernels(ProverKernels):
    """Same interface as ProverKernels; the domain axis lives on a mesh."""

    supports_fri_chain = True  # async per-layer chain (fri_commit_chain)
    # round 5: the RESIDENT polys/LDE buffers are packed (8, cols, N) u32 —
    # same layout as the single-chip kernels — so per-device HBM gets BOTH
    # halvings: packing AND the 1/D domain shard.  Transforms still run in
    # the unpacked 16-limb layout ShardedNTT expects; packing happens on the
    # way into the resident buffers and consumers unpack transiently.
    packed_resident = True
    # constraint tables stay UNPACKED here: the whole-domain sharded
    # round2/deep read them directly and the per-device share is already
    # N/D; packing would add an unpack pass to every whole-domain eval
    packed_tables = False

    def __init__(self, air, domain, mesh, axis: str | None = None):
        if axis is None:
            axis = mesh.axis_names[0]
        # mesh/sntt must exist before super().__init__ builds the domain
        # tables: the _place hook shards their inputs so the derived tables
        # compute block-sharded instead of materialising on one device
        self.mesh = mesh
        self.axis = axis
        self.sntt = ShardedNTT(mesh, axis)
        super().__init__(air, domain)

    def _finalize_tables(self, t: dict) -> dict:
        # re-assert the block-sharded layout on every table (tables derived
        # from small replicated literals, e.g. the tiled zerofier, may come
        # out of the jitted build with a different placement)
        return {k: self.sntt.shard(v) for k, v in t.items()}

    def _place(self, arr):
        return self.sntt.shard(arr)

    def _build_ntt_tables(self) -> dict:
        # rounds 1-4 transform via self.sntt (ShardedNTT carries its own
        # sharded factor tables); the single-chip injection tables are unused
        return {}

    # ------------------------------------------------------------------
    # round 1
    # ------------------------------------------------------------------

    def alloc_buffers(self, total_cols: int):
        """Packed zero buffers, block-sharded on the domain axis."""
        return tuple(self.sntt.shard(b)
                     for b in super().alloc_buffers(total_cols))

    def _pack_update(self, buf, piece, start: int):
        """Pack an unpacked (16, c, N) piece into the packed resident buffer
        at column offset `start` (donated in-place update)."""
        key = ("s_pack_upd", buf.shape, piece.shape)
        if key not in self._jit_cache:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def upd(b, p, s):
                return jax.lax.dynamic_update_slice_in_dim(
                    b, fd.pack(p), s, axis=1)

            self._jit_cache[key] = upd
        return self._jit_cache[key](buf, piece, jnp.int32(start))

    def interpolate_commit(self, trace_data, bufs=None, col_start: int = 0):
        domain = self.domain
        if trace_data.shape[0] == 8:  # packed resident trace layout
            trace_data = fd.unpack(trace_data)
        data = self.sntt.shard(trace_data)
        polys = self.sntt.interpolate(data)
        lde = self.sntt.evaluate_offset(polys, domain.lde_size,
                                        domain.coset_offset)
        if bufs is None:
            bufs = self.alloc_buffers(trace_data.shape[1])
            col_start = 0
        polys_buf, lde_buf = bufs
        polys_buf = self._pack_update(polys_buf, polys, col_start)
        lde_buf = self._pack_update(lde_buf, lde, col_start)
        # leaf hashing reads this call's unpacked transient directly (the
        # packed copy is the RESIDENT one); the transient dies afterwards
        levels = self._commit_rows(lde)
        return polys_buf, lde_buf, levels

    def _commit_rows(self, lde):
        """Leaf-hash (16, cols, N) rows and build the Merkle levels."""
        n_cols = lde.shape[1]
        key = ("s_leaves", lde.shape)
        if key not in self._jit_cache:

            @jax.jit
            def leaves_fn(lde_):
                rows = fd.from_mont(jnp.moveaxis(lde_, 1, 2))
                return kd.hash_felt_rows(rows, n_cols)

            @jax.jit
            def tree_fn(leaves):
                return _tree_levels(leaves)

            self._jit_cache[key] = (leaves_fn, tree_fn)
        leaves_fn, tree_fn = self._jit_cache[key]
        return tree_fn(leaves_fn(lde))

    # ------------------------------------------------------------------
    # round 2
    # ------------------------------------------------------------------

    def round2(self, lde_evals, boundary_ab, transition_ab, boundary_values,
               rap_arrays):
        air = self.air
        domain = self.domain
        ctxc = air.context
        N = domain.lde_size
        key = ("s_r2", lde_evals.shape)
        if key not in self._jit_cache:
            b_cols = list(self.boundary_cols)
            b_steps = list(self.boundary_steps)
            groups = {}
            for i, (d, e) in enumerate(zip(ctxc.transition_degrees,
                                           ctxc.transition_exemptions)):
                groups.setdefault((d, e), []).append(i)
            group_list = sorted(groups.items())
            offsets = ctxc.transition_offsets
            blowup = domain.blowup_factor

            @jax.jit
            def r2_eval(lde, b_ab, t_ab, b_vals, rap, tables):
                if lde.shape[0] == 8:  # packed resident LDE
                    lde = fd.unpack(lde)
                d_adj = tables["d_adj_boundary"]
                acc = fd.zeros((N,))
                step_groups = {}
                for i, (col, step) in enumerate(zip(b_cols, b_steps)):
                    step_groups.setdefault(step, []).append(i)
                for step, idxs in step_groups.items():
                    nums = jnp.stack(
                        [lde[:, b_cols[i], :] for i in idxs], axis=1
                    )
                    vals = jnp.stack([b_vals[:, i: i + 1] for i in idxs],
                                     axis=1)
                    alphas = jnp.stack([b_ab[0][:, i: i + 1] for i in idxs],
                                       axis=1)
                    betas = jnp.stack([b_ab[1][:, i: i + 1] for i in idxs],
                                      axis=1)
                    nums = fd.sub(nums, vals)
                    coeff = fd.add(fd.mul(d_adj[:, None, :], alphas), betas)
                    summed = nttc.sum_reduce(fd.mul(nums, coeff), axis=1)
                    acc = fd.add(acc, fd.mul(summed, tables[f"bz_inv_{step}"]))

                frame = _RollFrame(lde, offsets, blowup, N)
                rap_fv = air.wrap_rap_challenges(frame.ctx, rap)
                evals = air.compute_transition(frame, rap_fv)
                for (degree, exemption), idxs in group_list:
                    evs = jnp.stack([evals[i].v for i in idxs], axis=1)
                    alphas = jnp.stack([t_ab[0][:, i: i + 1] for i in idxs],
                                       axis=1)
                    betas = jnp.stack([t_ab[1][:, i: i + 1] for i in idxs],
                                      axis=1)
                    coeff = fd.add(
                        fd.mul(tables[f"d_adj_{degree}"][:, None, :], alphas),
                        betas,
                    )
                    summed = nttc.sum_reduce(fd.mul(evs, coeff), axis=1)
                    summed = fd.mul(summed, tables["zerofier_inv"])
                    if exemption > 0:
                        summed = fd.mul(summed, tables[f"exemption_{exemption}"])
                    acc = fd.add(acc, summed)
                return acc

            self._jit_cache[key] = r2_eval

        acc = self._jit_cache[key](lde_evals, boundary_ab, transition_ab,
                                   boundary_values, rap_arrays, self.tables)
        h_coeffs = self.sntt.interpolate_offset(acc, domain.coset_offset)
        h1 = self.sntt.shard(h_coeffs[:, 0::2])
        h2 = self.sntt.shard(h_coeffs[:, 1::2])
        # direct evaluation at the N coset points == the reference's 2x
        # oversample + stride-2 subsample (see four_step.evaluate_offset)
        h1_lde = self.sntt.evaluate_offset(h1, N, domain.coset_offset)
        h2_lde = self.sntt.evaluate_offset(h2, N, domain.coset_offset)
        levels = self._commit_h(h1_lde, h2_lde)
        return h1, h2, h1_lde, h2_lde, levels

    def _commit_h(self, h1_lde, h2_lde):
        key = ("s_r2c", h1_lde.shape)
        if key not in self._jit_cache:

            @jax.jit
            def commit(h1_, h2_):
                rows = fd.from_mont(jnp.stack([h1_, h2_], axis=2))
                leaves = kd.hash_felt_rows(rows, 2)
                return _tree_levels(leaves)

            self._jit_cache[key] = commit
        return self._jit_cache[key](h1_lde, h2_lde)

    # ------------------------------------------------------------------
    # round 4: DEEP + FRI
    # ------------------------------------------------------------------

    def deep_poly(self, lde_evals, h1_lde, h2_lde, point_arrs, gamma_arr,
                  gammas_hh, ood_rows):
        N = self.domain.lde_size
        n_offsets = len(self.air.context.transition_offsets)
        key = ("s_r4", lde_evals.shape)
        if key not in self._jit_cache:

            @jax.jit
            def deep_eval(lde, h1_, h2_, points, gammas, ghh, ood, tables):
                if lde.shape[0] == 8:  # packed resident LDE
                    lde = fd.unpack(lde)
                diffs = [
                    fd.sub(tables["lde_values"], points[k][:, :1])
                    for k in range(n_offsets + 1)
                ]
                inv_all = fd.batch_inverse(jnp.concatenate(diffs, axis=1))
                invs = [
                    inv_all[:, k * N: (k + 1) * N]
                    for k in range(n_offsets + 1)
                ]
                acc = fd.zeros((N,))
                for ki in range(n_offsets):
                    nums = fd.sub(lde, ood[ki][:, :, None])
                    terms = fd.mul(nums, invs[ki][:, None, :])
                    g = gammas[:, ki::n_offsets]
                    terms = fd.mul(terms, g[:, :, None])
                    acc = fd.add(acc, nttc.sum_reduce(terms, axis=1))
                acc = fd.add(
                    acc,
                    fd.mul(fd.mul(fd.sub(h1_, ood[n_offsets][:, 0:1]),
                                  invs[n_offsets]), ghh[0][:, :1]),
                )
                acc = fd.add(
                    acc,
                    fd.mul(fd.mul(fd.sub(h2_, ood[n_offsets][:, 1:2]),
                                  invs[n_offsets]), ghh[1][:, :1]),
                )
                return acc

            self._jit_cache[key] = deep_eval
        acc = self._jit_cache[key](lde_evals, h1_lde, h2_lde, point_arrs,
                                   gamma_arr, gammas_hh, ood_rows,
                                   self.tables)
        coeffs = self.sntt.interpolate_offset(acc, self.domain.coset_offset)
        return coeffs[..., : self.air.trace_length()]

    def fri_first_layer(self, coeffs):
        domain = self.domain
        evals = self.sntt.evaluate_offset(
            self.sntt.shard(coeffs), domain.lde_size, domain.coset_offset
        )
        levels = self._commit_single(evals)
        return evals, levels

    def fri_fold_layer(self, coeffs, zeta_arr, offset_int, domain_size):
        key = ("s_fold", coeffs.shape)
        if key not in self._jit_cache:

            @jax.jit
            def fold(cs, zeta):
                even = cs[:, 0::2]
                odd = cs[:, 1::2]
                return fd.add(even, fd.mul(odd, zeta[:, :1]))

            self._jit_cache[key] = fold
        folded = self.sntt.shard(self._jit_cache[key](coeffs, zeta_arr))
        evals = self.sntt.evaluate_offset(folded, domain_size, offset_int)
        levels = self._commit_single(evals)
        return folded, evals, levels

    def _commit_single(self, evals):
        key = ("s_leaf1", evals.shape)
        if key not in self._jit_cache:

            @jax.jit
            def commit(evals_):
                leaves = kd.hash_felt_leaves(fd.from_mont(evals_))
                return _tree_levels(leaves)

            self._jit_cache[key] = commit
        return self._jit_cache[key](evals)

    # ------------------------------------------------------------------
    # FRI commit chain, sharded flavor
    # ------------------------------------------------------------------

    def _chain_zeta(self, state, root):
        """Advance the device Fiat-Shamir chain: state' = keccak256(state ||
        root), zeta = 251-bit-masked Montgomery draw — bit-identical to
        transcript/fiat_shamir.py and the single-chip chain kernel."""
        if "s_chain_zeta" not in self._jit_cache:

            @jax.jit
            def step(st, rt):
                new_state = kd.hash_digest_pairs(
                    jnp.stack([st, rt], axis=0))[0]
                zeta = fd.to_mont(kd.digest_words_to_masked_limbs(new_state))
                return new_state, zeta

            self._jit_cache["s_chain_zeta"] = step
        return self._jit_cache["s_chain_zeta"](state, root)

    def _fold_z(self, cs, zeta):
        key = ("s_fold_z", cs.shape)
        if key not in self._jit_cache:

            @jax.jit
            def fold(cs_, z):
                return fd.add(cs_[:, 0::2], fd.mul(cs_[:, 1::2], z))

            self._jit_cache[key] = fold
        return self._jit_cache[key](cs, zeta)

    def fri_commit_chain(self, coeffs, state_words, plan, final_fold=False):
        """Same contract as ProverKernels.fri_commit_chain, built from
        per-layer sharded dispatches instead of one XLA program: the
        Fiat-Shamir state advances ON DEVICE (state' = keccak256(state ||
        root)), so every fold / four-step evaluate / commit dispatches
        asynchronously and the caller's single stacked-roots readback is the
        only host sync in the whole commit phase (reference folds with a
        synchronous transcript draw per layer, fri/mod.rs:20-72)."""
        domain = self.domain
        state = jnp.asarray(state_words)
        evals0 = self.sntt.evaluate_offset(
            self.sntt.shard(coeffs), domain.lde_size, domain.coset_offset)
        levels = self._commit_single(evals0)
        roots = [levels[-1][0]]
        evals_out = [evals0]
        levels_out = [levels]
        cs = coeffs
        for off, ds in plan:
            state, zeta = self._chain_zeta(state, roots[-1])
            cs = self.sntt.shard(self._fold_z(cs, zeta))
            evals = self.sntt.evaluate_offset(cs, ds, off)
            levels = self._commit_single(evals)
            roots.append(levels[-1][0])
            evals_out.append(evals)
            levels_out.append(levels)
        out_rows = roots
        if final_fold:
            state, zeta = self._chain_zeta(state, roots[-1])
            last = self._fold_z(cs, zeta)
            if "s_last_raw" not in self._jit_cache:

                @jax.jit
                def last_raw_fn(x):
                    return fd.from_mont(x[:, :1]).reshape(2, 8)

                self._jit_cache["s_last_raw"] = last_raw_fn
            out_rows = roots + [self._jit_cache["s_last_raw"](last)]
        roots_dev = jnp.concatenate([r.reshape(-1, 8) for r in out_rows],
                                    axis=0)
        return roots_dev, tuple(evals_out), tuple(levels_out), cs


_SHARDED_CACHE: dict = {}


def get_sharded_kernels(air, domain, mesh) -> ShardedProverKernels:
    """Per-(AIR shape, mesh) cache, mirroring prover.kernels.get_kernels."""
    key = (type(air).__name__, air.trace_length(), air.context.trace_columns,
           air.context.proof_options, tuple(air.context.transition_exemptions),
           air.kernel_cache_key(), mesh)
    if key not in _SHARDED_CACHE:
        _SHARDED_CACHE[key] = ShardedProverKernels(air, domain, mesh)
    return _SHARDED_CACHE[key]
