"""Jitted prover round-kernels, cached per (AIR shape, trace length).

Each STARK round becomes one (or a few) XLA programs; Fiat-Shamir challenges
enter as runtime limb arrays so repeated proofs never recompile.  Domain
tables (LDE coset values, degree-adjustment powers, zerofier cycles,
exemption evaluations, boundary zerofier inverses) are computed once per
domain and passed as inputs."""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp

_DEBUG = os.environ.get("LCP_DEBUG_KERNELS")


def _timed(name, fn, *args):
    if not _DEBUG:
        return fn(*args)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"[kernel {name}] {time.perf_counter() - t0:.2f}s", flush=True)
    return out

from ..air.frame import DeviceFrame
from ..field import device as fd
from ..field.params import N_LIMBS, P
from ..hash import keccak_device as kd
from ..ntt import core as nttc
from ..ntt import fused as fused_ntt


_LEAF_CHUNK = 1 << 15  # rows per leaf-hash kernel call (HBM headroom)
_EVAL_CHUNK = 1 << 15  # domain points per constraint-eval / DEEP kernel call
_COL_CHUNK = 8         # trace columns per interpolate/LDE kernel call
_DOT_CHUNK = 1 << 14   # coeffs per OOD powers-dot kernel call


class _ChunkFrame:
    """DeviceFrame over a domain chunk with a frame halo: row k of the frame
    is the [k*blowup, k*blowup + chunk) slice of the halo'd chunk."""

    def __init__(self, data, offsets, blowup, out_len):
        from ..air.frame import _DeviceRow
        from ..air.values import DeviceCtx

        self.ctx = DeviceCtx(batch_shape=(out_len,))
        self._rows = {
            k: _DeviceRow(
                self.ctx,
                jax.lax.slice_in_dim(data, k * blowup, k * blowup + out_len,
                                     axis=2),
            )
            for k in set(offsets)
        }

    def get_row(self, k):
        return self._rows[k]


def _tree_levels(leaves):
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = kd.hash_digest_pairs(cur)
        levels.append(cur)
    return tuple(levels)


class ProverKernels:
    """Holds jitted closures + domain tables for one (air, domain) shape."""

    # the single-program FRI commit chain (fri_commit_chain) relies on the
    # injected single-chip NTT tables; the sharded kernels transform via
    # ShardedNTT instead and keep the per-layer path
    supports_fri_chain = True

    # resident trace polys / LDE live PACKED (two 16-bit limbs per u32,
    # fd.pack) in caller-preallocated buffers filled by donated in-place
    # updates — at 2^19 rows x 61 cols the unpacked LDE alone is 8 GB and
    # the old pieces-then-concatenate pattern held it twice, OOMing the
    # 16 GB v5e on the reference's flagship fib(70000) workload
    packed_resident = True

    # constraint tables (lde_values / d_adj / zerofier / bz_inv /
    # exemptions — all (16, N)) also live packed; round2/deep unpack the
    # chunk slice they read.  The sharded kernels keep these unpacked
    # (their per-device share is already N/D).
    packed_tables = True

    def __init__(self, air, domain):
        self.air = air
        self.domain = domain
        n = air.trace_length()
        N = domain.lde_size
        bound = air.composition_poly_degree_bound()
        ctxc = air.context

        # ---- boundary layout (host inspection) ----
        bc_probe = air.boundary_constraints(self._probe_challenges())
        self.boundary_steps = [c.step for c in bc_probe.constraints]
        self.boundary_cols = [c.col for c in bc_probe.constraints]
        distinct = []
        for s in self.boundary_steps:
            if s not in distinct:
                distinct.append(s)
        self.distinct_steps = distinct

        # ---- domain tables: host powers + ONE jitted device program ----
        pow_inputs = {"lde_values": nttc.offset_powers(domain.lde_primitive_root, N)}
        scale_consts = {"lde_values": domain.coset_offset}
        for name, e in [("d_adj_boundary", bound - n)] + [
            (f"d_adj_{d}", bound - n * (d - 1))
            for d in sorted(set(ctxc.transition_degrees))
        ]:
            we = pow(domain.lde_primitive_root, e, P)
            pow_inputs[name] = fd.powers(we, N)
            scale_consts[name] = pow(domain.coset_offset, e, P)

        blowup = domain.blowup_factor
        hn = pow(domain.coset_offset, n, P)
        wb = pow(domain.lde_primitive_root, n, P)
        zf_inv_ints = [
            pow((hn * pow(wb, j, P) - 1) % P, P - 2, P) for j in range(blowup)
        ]
        exemption_roots = {
            c: air.exemption_roots(c) for c in air.transition_exemption_counts()
        }
        step_points = {s: domain.trace_root_pow(s) for s in distinct}

        pack_tables = self.packed_tables

        @jax.jit
        def build_tables(pins):
            t = {
                name: fd.mul(arr, jnp.asarray(fd.from_int(scale_consts[name])))
                for name, arr in pins.items()
            }
            zf = jnp.asarray(fd.from_ints(zf_inv_ints))
            t["zerofier_inv"] = jnp.tile(zf, (1, N // blowup))
            for count, roots in exemption_roots.items():
                prod = None
                for r in roots:
                    f = fd.sub(t["lde_values"], jnp.asarray(fd.from_int(r)))
                    prod = f if prod is None else fd.mul(prod, f)
                t[f"exemption_{count}"] = prod
            if distinct:
                diffs = [
                    fd.sub(t["lde_values"],
                           jnp.asarray(fd.from_int(step_points[s])))
                    for s in distinct
                ]
                inv_big = fd.batch_inverse(jnp.concatenate(diffs, axis=1))
                for i, s in enumerate(distinct):
                    t[f"bz_inv_{s}"] = inv_big[:, i * N: (i + 1) * N]
            if pack_tables:
                # resident (16, N) tables halve to (8, N) inside this one
                # program (intermediates die at trace exit); consumers
                # unpack per chunk slice — at 2^22 LDE the ~18 whole-domain
                # tables otherwise hold 4.9 GB of the 16 GB chip
                t = {k: fd.pack(v) for k, v in t.items()}
            return t

        pow_inputs = {k: self._place(v) for k, v in pow_inputs.items()}
        self.tables = self._finalize_tables(build_tables(pow_inputs))
        # the LDE-root power table was only a build input; drop its global
        # cache entry so a (16, N) array does not stay resident for nothing
        nttc._powers_cache.pop((domain.lde_primitive_root % P, N), None)
        self._jit_cache = {}
        self.ntt_tables = self._build_ntt_tables()

    def _finalize_tables(self, t: dict) -> dict:
        """Placement hook for the finished table dict (sharded subclass
        re-asserts block sharding)."""
        return t

    def _place(self, arr):
        """Placement hook for freshly-built domain tables (the sharded
        subclass block-shards them so derived tables compute sharded)."""
        return arr

    def _build_ntt_tables(self) -> dict:
        # NTT tables (powers + twiddles) used INSIDE the jitted kernels are
        # computed eagerly here and passed to each kernel as runtime
        # ARGUMENTS via nttc.inject_tables — baking multi-MB tables as graph
        # literals blows up compilation beyond n ~ 2^14.  The sharded
        # subclass overrides this to {}: its rounds transform via ShardedNTT
        # (own tables), so building these would waste per-device HBM at
        # exactly the scales the mesh exists for.
        domain = self.domain
        n = self.air.trace_length()
        N = domain.lde_size
        h = domain.coset_offset
        h_inv = pow(h, P - 2, P)
        ntt_tables = {}

        def add_pw(off, m):
            if m >= 1:
                ntt_tables[("pw", off % P, m)] = nttc.offset_powers(off, m)

        def add_tw(log, inv):
            if log < 1:
                return
            if fused_ntt.use_fused(log):
                # fused-stage Pallas path takes (local, global-stages) tables
                ntt_tables[("fused", log, inv)] = fused_ntt.fused_tables(
                    log, inv)
                return
            if log >= nttc.FOUR_STEP_MIN_LOG:
                # large transforms run the four-step plan: inject its factor
                # twiddles + inter table instead of 2^log stage twiddles
                logr, logc = nttc.four_factors(log)
                ntt_tables[("tw", logr, inv)] = nttc._stage_twiddles(logr, inv)
                ntt_tables[("tw", logc, inv)] = nttc._stage_twiddles(logc, inv)
                ntt_tables[("four", log, inv)] = nttc._four_table(log, inv)
            else:
                ntt_tables[("tw", log, inv)] = nttc._stage_twiddles(log, inv)

        add_pw(h, n)
        add_pw(h, N // 2)
        add_pw(h_inv, N)
        add_tw(n.bit_length() - 1, True)
        add_tw(N.bit_length() - 1, True)
        add_tw(N.bit_length() - 1, False)
        add_tw((2 * N).bit_length() - 1, False)
        off = h
        size_c = n
        size_d = N
        for _ in range(1, domain.root_order):
            off = off * off % P
            size_c //= 2
            size_d //= 2
            add_pw(off, size_c)
            add_tw(size_d.bit_length() - 1, False)
        # resident tables stay packed; nttc._injected unpacks transiently
        # inside each consuming kernel (~1.9 GB -> ~0.95 GB at a 2^22 LDE)
        packed = {k: nttc.pack_table_tree(v) for k, v in ntt_tables.items()}
        # evict the UNPACKED originals from the module-level caches for
        # large sizes (they would otherwise keep a second full-size copy
        # alive; small entries stay cached for reuse)
        big = 1 << 17
        for cache, pred in (
            (nttc._twiddle_cache, lambda k: (1 << k[0]) >= big),
            (nttc._powers_cache, lambda k: k[1] >= big),
            (nttc._four_cache, lambda k: (1 << k[1]) >= big),
            (fused_ntt._table_cache,
             lambda k: k[0] == "global" and (1 << k[1]) >= big),
        ):
            for k in [k for k in cache if pred(k)]:
                cache.pop(k, None)
        return packed

    def _probe_challenges(self):
        """Dummy rap challenges for structural inspection (boundary layout)."""
        return self.air.build_rap_challenges(_ProbeTranscript())

    # ------------------------------------------------------------------
    # round 1: interpolate columns, LDE, leaf/tree hash
    # ------------------------------------------------------------------

    def _col_chunk(self) -> int:
        # the four-step NTT's transient working set scales with cols x N
        # (each butterfly stage keeps several full-size intermediates
        # live); shrink the column chunk at the largest domains so the
        # per-chunk transient fits alongside the packed resident buffers
        env = os.environ.get("LCP_COL_CHUNK")
        if env:
            return max(1, int(env))
        N = self.domain.lde_size
        if N >= 1 << 21:
            return 1
        if N >= 1 << 19:
            return max(1, _COL_CHUNK // 2)
        return _COL_CHUNK

    def alloc_buffers(self, total_cols: int):
        """Packed (8, total_cols, n | N) zero buffers that successive
        interpolate_commit calls (main trace, then aux trace) fill in place
        via donated updates — no pieces list, no concatenate, one resident
        copy of polys + LDE at half the unpacked width."""
        n = self.air.trace_length()
        N = self.domain.lde_size
        return (
            jnp.zeros((N_LIMBS // 2, total_cols, n), dtype=jnp.uint32),
            jnp.zeros((N_LIMBS // 2, total_cols, N), dtype=jnp.uint32),
        )

    def _updater(self, buf_shape, piece_shape):
        ukey = ("r1_upd", buf_shape, piece_shape)
        if ukey not in self._jit_cache:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def upd(buf, piece, start):
                return jax.lax.dynamic_update_slice_in_dim(
                    buf, piece, start, axis=1)

            self._jit_cache[ukey] = upd
        return self._jit_cache[ukey]

    def interpolate_commit(self, trace_data, bufs=None, col_start: int = 0):
        """Interpolate + LDE the columns of ``trace_data`` into the packed
        buffers at column offset ``col_start`` and Merkle-commit THIS call's
        columns.  Split into small XLA programs (interpolate+LDE per column
        chunk, leaf hash per row chunk, tree) so remote compiles stay fast
        and the NTT working set fits HBM at large domains.

        Returns (polys_buf, lde_buf, levels); the input ``bufs`` handles are
        consumed (donated).  With ``bufs=None`` a right-sized buffer pair is
        allocated for just these columns."""
        n_cols = trace_data.shape[1]
        if bufs is None:
            bufs = self.alloc_buffers(n_cols)
            col_start = 0
        polys_buf, lde_buf = bufs
        col_chunk = min(n_cols, self._col_chunk())
        key = ("r1_poly", col_chunk, trace_data.shape[2],
               trace_data.shape[0])
        if key not in self._jit_cache:
            domain = self.domain

            @jax.jit
            def r1_poly(data, ntts):
                if data.shape[0] == N_LIMBS // 2:  # packed resident trace
                    data = fd.unpack(data)
                with nttc.inject_tables(ntts):
                    polys = nttc.interpolate_fft(data)
                    lde = nttc.evaluate_on_lde_domain(
                        polys, domain.blowup_factor,
                        domain.interpolation_domain_size, domain.coset_offset,
                    )
                return fd.pack(polys), fd.pack(lde)

            self._jit_cache[key] = r1_poly
        r1_poly = self._jit_cache[key]

        # column-chunked transform (columns are independent; pad to a
        # multiple of the chunk so one compiled shape serves all chunks),
        # each chunk written straight into the packed buffers
        t0 = time.perf_counter()
        pad_cols = (-n_cols) % col_chunk
        data = trace_data
        if pad_cols:
            data = jnp.concatenate(
                [data, jnp.zeros((data.shape[0], pad_cols, data.shape[2]),
                                 dtype=data.dtype)], axis=1
            )
        n_chunks = data.shape[1] // col_chunk
        # At the largest domains, letting all chunk dispatches enqueue
        # ahead allocates every in-flight program's output buffers at once
        # (donation only releases at execution) — a periodic sync caps the
        # number of outstanding transients at the cost of a tunnel
        # round-trip each (LCP_R1_SYNC_EVERY overrides; 0 disables).
        sync_env = os.environ.get("LCP_R1_SYNC_EVERY")
        sync_every = (int(sync_env) if sync_env
                      else (4 if lde_buf.shape[2] >= (1 << 22) else 0))
        for c in range(n_chunks):
            pp, ll = r1_poly(
                jax.lax.slice_in_dim(data, c * col_chunk,
                                     (c + 1) * col_chunk, axis=1),
                self.ntt_tables,
            )
            valid = min(col_chunk, n_cols - c * col_chunk)
            if valid < col_chunk:  # zero-padded tail: write only real cols
                pp = jax.lax.slice_in_dim(pp, 0, valid, axis=1)
                ll = jax.lax.slice_in_dim(ll, 0, valid, axis=1)
            start = jnp.int32(col_start + c * col_chunk)
            polys_buf = self._updater(polys_buf.shape, pp.shape)(
                polys_buf, pp, start)
            lde_buf = self._updater(lde_buf.shape, ll.shape)(
                lde_buf, ll, start)
            if sync_every and (c + 1) % sync_every == 0:
                jax.block_until_ready(lde_buf)
            if _DEBUG:
                jax.block_until_ready(lde_buf)
                print(f"[kernel r1 chunk {c + 1}/{n_chunks}] "
                      f"{time.perf_counter() - t0:.2f}s", flush=True)
        if _DEBUG:
            jax.block_until_ready(lde_buf)
            print(f"[kernel r1_poly x{n_chunks}] "
                  f"{time.perf_counter() - t0:.2f}s", flush=True)
        # leaf hashing in chunks: the limb->bytes expansion peaks at ~50x the
        # row bytes, which OOMs HBM if done over the whole domain at once;
        # at the largest domains the resident set leaves little headroom,
        # so the chunk shrinks with N (2^20-row traces run within ~1 GB of
        # the v5e ceiling)
        N = lde_buf.shape[2]
        env_leaf = os.environ.get("LCP_LEAF_CHUNK")
        chunk = (max(128, int(env_leaf)) if env_leaf
                 else min(N, _LEAF_CHUNK if N < (1 << 22)
                          else _LEAF_CHUNK // 4))
        lkey = ("r1_leaves", lde_buf.shape, col_start, n_cols, chunk)
        if lkey not in self._jit_cache:

            @jax.jit
            def r1_leaves(row_chunk):
                cols = jax.lax.slice_in_dim(row_chunk, col_start,
                                            col_start + n_cols, axis=1)
                rows = fd.from_mont(jnp.moveaxis(fd.unpack(cols), 1, 2))
                return kd.hash_felt_rows(rows, rows.shape[2])

            @jax.jit
            def r1_tree(leaves):
                return _tree_levels(leaves)

            self._jit_cache[lkey] = (r1_leaves, r1_tree)
        r1_leaves, r1_tree = self._jit_cache[lkey]
        if N <= chunk:
            leaves = _timed("r1_leaves", r1_leaves, lde_buf)
        else:
            parts = [
                r1_leaves(jax.lax.slice_in_dim(lde_buf, i, i + chunk, axis=2))
                for i in range(0, N, chunk)
            ]
            leaves = jnp.concatenate(parts, axis=0)
        levels = _timed("r1_tree", r1_tree, leaves)
        return polys_buf, lde_buf, levels

    def gather_columns(self, lde_evals, idxs):
        """All-column openings at the query indices: (16, cols, len(idxs))
        unpacked limbs out of the packed resident LDE."""
        key = ("qgather", lde_evals.shape, len(idxs))
        if key not in self._jit_cache:

            @jax.jit
            def g(src, ix):
                return fd.unpack(jnp.take(src, ix, axis=-1))

            self._jit_cache[key] = g
        return self._jit_cache[key](lde_evals, jnp.asarray(idxs))

    # ------------------------------------------------------------------
    # round 2: whole-domain constraint evaluation + H + commit
    # ------------------------------------------------------------------

    def round2(self, lde_evals, boundary_ab, transition_ab, boundary_values,
               rap_arrays):
        """boundary_ab: (2, 16, n_bc); transition_ab: (2, 16, n_tc);
        boundary_values: (16, n_bc); rap_arrays: pytree of (16,1) arrays.

        Split into three XLA programs (evaluation, polynomial work,
        commitment) to keep per-graph compile time bounded; the constraint
        coefficient application is grouped by (degree, exemption) so each
        group is one batched multiply chain."""
        air = self.air
        domain = self.domain
        tables = self.tables
        ctxc = air.context
        N = domain.lde_size
        chunk = min(N, _EVAL_CHUNK)
        halo = max(ctxc.transition_offsets) * domain.blowup_factor
        key = ("r2_eval", lde_evals.shape, chunk)
        if key not in self._jit_cache:
            b_cols = list(self.boundary_cols)
            b_steps = list(self.boundary_steps)

            # constraint groups: (degree, exemption) -> constraint indices
            groups = {}
            for i, (d, e) in enumerate(zip(ctxc.transition_degrees,
                                           ctxc.transition_exemptions)):
                groups.setdefault((d, e), []).append(i)
            group_list = sorted(groups.items())
            table_names = (["d_adj_boundary", "zerofier_inv"]
                           + [f"d_adj_{d}" for d in sorted(set(ctxc.transition_degrees))]
                           + [f"exemption_{c}" for c in air.transition_exemption_counts()]
                           + [f"bz_inv_{st}" for st in self.distinct_steps])

            @jax.jit
            def r2_eval_chunk(lde_p, b_ab, t_ab, b_vals, rap, tables, start,
                              wrap_start):
                # this chunk + its frame halo out of the PACKED resident
                # LDE: the halo rows live at the NEXT chunk boundary
                # ((start+chunk) mod N — always in-bounds), so wraparound
                # needs no extended copy of the whole LDE
                main_p = jax.lax.dynamic_slice_in_dim(lde_p, start, chunk,
                                                      axis=2)
                if halo:
                    halo_p = jax.lax.dynamic_slice_in_dim(
                        lde_p, wrap_start, halo, axis=2)
                    main_p = jnp.concatenate([main_p, halo_p], axis=2)
                lde_c = fd.unpack(main_p)

                def table_chunk(name):
                    sl = jax.lax.dynamic_slice_in_dim(tables[name], start,
                                                      chunk, axis=1)
                    return fd.unpack(sl) if sl.shape[0] == N_LIMBS // 2 else sl

                tc = {name: table_chunk(name) for name in table_names}
                d_adj = tc["d_adj_boundary"]
                acc = fd.zeros((chunk,))
                step_groups = {}
                for i, (col, step) in enumerate(zip(b_cols, b_steps)):
                    step_groups.setdefault(step, []).append(i)
                for step, idxs in step_groups.items():
                    nums = jnp.stack(
                        [lde_c[:, b_cols[i], :chunk] for i in idxs], axis=1
                    )  # (16, g, chunk)
                    vals = jnp.stack(
                        [b_vals[:, i: i + 1] for i in idxs], axis=1
                    )
                    alphas = jnp.stack([b_ab[0][:, i: i + 1] for i in idxs], axis=1)
                    betas = jnp.stack([b_ab[1][:, i: i + 1] for i in idxs], axis=1)
                    nums = fd.sub(nums, vals)
                    coeff = fd.add(fd.mul(d_adj[:, None, :], alphas), betas)
                    summed = nttc.sum_reduce(fd.mul(nums, coeff), axis=1)
                    acc = fd.add(acc, fd.mul(summed, tc[f"bz_inv_{step}"]))

                frame = _ChunkFrame(lde_c, ctxc.transition_offsets,
                                    domain.blowup_factor, chunk)
                rap_fv = air.wrap_rap_challenges(frame.ctx, rap)
                evals = air.compute_transition(frame, rap_fv)
                for (degree, exemption), idxs in group_list:
                    evs = jnp.stack([evals[i].v for i in idxs], axis=1)
                    alphas = jnp.stack([t_ab[0][:, i: i + 1] for i in idxs], axis=1)
                    betas = jnp.stack([t_ab[1][:, i: i + 1] for i in idxs], axis=1)
                    coeff = fd.add(
                        fd.mul(tc[f"d_adj_{degree}"][:, None, :], alphas),
                        betas,
                    )
                    summed = nttc.sum_reduce(fd.mul(evs, coeff), axis=1)
                    summed = fd.mul(summed, tc["zerofier_inv"])
                    if exemption > 0:
                        summed = fd.mul(summed, tc[f"exemption_{exemption}"])
                    acc = fd.add(acc, summed)
                return acc

            self._jit_cache[key] = r2_eval_chunk

        key2 = ("r2_poly", lde_evals.shape)
        if key2 not in self._jit_cache:

            @jax.jit
            def r2_poly(acc, ntts):
                with nttc.inject_tables(ntts):
                    h_coeffs = nttc.interpolate_offset_fft(acc, domain.coset_offset)
                    h1 = h_coeffs[:, 0::2]
                    h2 = h_coeffs[:, 1::2]
                    h1_lde = nttc.evaluate_on_lde_domain(
                        h1, domain.blowup_factor, air.trace_length(),
                        domain.coset_offset,
                    )
                    h2_lde = nttc.evaluate_on_lde_domain(
                        h2, domain.blowup_factor, air.trace_length(),
                        domain.coset_offset,
                    )
                return h1, h2, h1_lde, h2_lde

            self._jit_cache[key2] = r2_poly

        key3 = ("r2_commit", lde_evals.shape)
        if key3 not in self._jit_cache:

            @jax.jit
            def r2_commit(h1_lde, h2_lde):
                rows = fd.from_mont(jnp.stack([h1_lde, h2_lde], axis=2))
                leaves = kd.hash_felt_rows(rows, 2)
                return _tree_levels(leaves)

            self._jit_cache[key3] = r2_commit

        # chunked evaluation straight off the packed LDE (wraparound halo
        # handled inside the kernel by a second boundary-aligned slice)
        kernel = self._jit_cache[key]
        parts = []
        t0 = time.perf_counter()
        for a in range(0, N, chunk):
            parts.append(kernel(lde_evals, boundary_ab, transition_ab,
                                boundary_values, rap_arrays, self.tables,
                                jnp.int32(a), jnp.int32((a + chunk) % N)))
        acc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        if _DEBUG:
            jax.block_until_ready(acc)
            print(f"[kernel r2_eval x{len(parts)}] "
                  f"{time.perf_counter() - t0:.2f}s", flush=True)
        h1, h2, h1_lde, h2_lde = _timed("r2_poly", self._jit_cache[key2], acc,
                                        self.ntt_tables)
        levels = _timed("r2_commit", self._jit_cache[key3], h1_lde, h2_lde)
        return h1, h2, h1_lde, h2_lde, levels

    # ------------------------------------------------------------------
    # round 3: OOD evaluations via powers-dot
    # ------------------------------------------------------------------

    def eval_at_powers(self, coeffs, powers_table):
        L = coeffs.shape[-1]
        chunk = min(L, _DOT_CHUNK)
        key = ("r3", coeffs.shape, powers_table.shape, chunk)
        if key not in self._jit_cache:

            @jax.jit
            def ev_chunk(cs, pw, start):
                c = jax.lax.dynamic_slice_in_dim(cs, start, chunk, axis=-1)
                if c.shape[0] == N_LIMBS // 2:  # packed resident polys
                    c = fd.unpack(c)
                p = jax.lax.dynamic_slice_in_dim(pw, start, chunk, axis=-1)
                return nttc.sum_reduce(fd.mul(c, p), axis=-1)

            @jax.jit
            def ev_final(stacked):
                return fd.from_mont(nttc.sum_reduce(stacked, axis=1))

            self._jit_cache[key] = (ev_chunk, ev_final)
        ev_chunk, ev_final = self._jit_cache[key]
        t0 = time.perf_counter()
        parts = [ev_chunk(coeffs, powers_table, jnp.int32(a))
                 for a in range(0, L, chunk)]
        out = ev_final(jnp.stack(parts, axis=1))
        if _DEBUG:
            jax.block_until_ready(out)
            print(f"[kernel eval_at x{len(parts)}] "
                  f"{time.perf_counter() - t0:.2f}s", flush=True)
        return out

    # ------------------------------------------------------------------
    # round 4: DEEP evaluation-form combination + interpolation
    # ------------------------------------------------------------------

    def deep_poly(self, lde_evals, h1_lde, h2_lde, point_arrs, gamma_arr,
                  gammas_hh, ood_rows):
        """point_arrs: (n_offsets+1, 16, 1) points (z*g^k..., z^2);
        gamma_arr: (16, n_offsets*total_cols) trace gammas;
        gammas_hh: (2, 16, 1); ood_rows: (n_offsets, 16, total_cols)."""
        N = self.domain.lde_size
        chunk = min(N, _EVAL_CHUNK)
        n_offsets = len(self.air.context.transition_offsets)
        key = ("r4", lde_evals.shape, chunk)
        if key not in self._jit_cache:
            air = self.air
            domain = self.domain
            tables = self.tables

            @jax.jit
            def deep_inv(points, tables):
                lv = tables["lde_values"]
                if lv.shape[0] == N_LIMBS // 2:  # packed resident table
                    lv = fd.unpack(lv)
                diffs = [
                    fd.sub(lv, points[k][:, :1])
                    for k in range(n_offsets + 1)
                ]
                return fd.batch_inverse(jnp.concatenate(diffs, axis=1))

            @jax.jit
            def deep_chunk(lde, h1_lde_, h2_lde_, inv_all, gammas, ghh, ood,
                           start):
                total_cols = lde.shape[1]
                lde_c = jax.lax.dynamic_slice_in_dim(lde, start, chunk, axis=2)
                if lde_c.shape[0] == N_LIMBS // 2:  # packed resident LDE
                    lde_c = fd.unpack(lde_c)
                h1_c = jax.lax.dynamic_slice_in_dim(h1_lde_, start, chunk, axis=1)
                h2_c = jax.lax.dynamic_slice_in_dim(h2_lde_, start, chunk, axis=1)
                invs = [
                    jax.lax.dynamic_slice_in_dim(inv_all, k * N + start, chunk,
                                                 axis=1)
                    for k in range(n_offsets + 1)
                ]
                acc = fd.zeros((chunk,))
                for ki in range(n_offsets):
                    nums = fd.sub(lde_c, ood[ki][:, :, None])
                    terms = fd.mul(nums, invs[ki][:, None, :])
                    g = gammas[:, ki::n_offsets]  # (16, cols)
                    terms = fd.mul(terms, g[:, :, None])
                    acc = fd.add(acc, nttc.sum_reduce(terms, axis=1))
                acc = fd.add(
                    acc,
                    fd.mul(fd.mul(fd.sub(h1_c, ood[n_offsets][:, 0:1]),
                                  invs[n_offsets]), ghh[0][:, :1]),
                )
                acc = fd.add(
                    acc,
                    fd.mul(fd.mul(fd.sub(h2_c, ood[n_offsets][:, 1:2]),
                                  invs[n_offsets]), ghh[1][:, :1]),
                )
                return acc

            @jax.jit
            def deep_final(acc, ntts):
                with nttc.inject_tables(ntts):
                    coeffs = nttc.interpolate_offset_fft(acc, domain.coset_offset)
                return coeffs[:, : air.trace_length()]

            self._jit_cache[key] = (deep_inv, deep_chunk, deep_final)

        deep_inv, deep_chunk, deep_final = self._jit_cache[key]
        t0 = time.perf_counter()
        inv_all = deep_inv(point_arrs, self.tables)
        parts = [
            deep_chunk(lde_evals, h1_lde, h2_lde, inv_all, gamma_arr,
                       gammas_hh, ood_rows, jnp.int32(a))
            for a in range(0, N, chunk)
        ]
        acc = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        out = deep_final(acc, self.ntt_tables)
        if _DEBUG:
            jax.block_until_ready(out)
            print(f"[kernel deep x{len(parts)}] {time.perf_counter() - t0:.2f}s",
                  flush=True)
        return out

    # ------------------------------------------------------------------
    # FRI layers
    # ------------------------------------------------------------------

    def fri_first_layer(self, coeffs):
        key = ("fri0", coeffs.shape)
        if key not in self._jit_cache:
            domain = self.domain

            @jax.jit
            def layer0(cs, ntts):
                with nttc.inject_tables(ntts):
                    evals = nttc.evaluate_offset_fft(
                        cs, 1, domain.lde_size, domain.coset_offset
                    )
                leaves = kd.hash_felt_leaves(fd.from_mont(evals))
                return evals, _tree_levels(leaves)

            self._jit_cache[key] = layer0
        return _timed("fri0", self._jit_cache[key], coeffs, self.ntt_tables)

    def fri_fold_layer(self, coeffs, zeta_arr, offset_int, domain_size):
        key = ("fri", coeffs.shape, offset_int, domain_size)
        if key not in self._jit_cache:

            @jax.jit
            def fold(cs, zeta, ntts):
                even = cs[:, 0::2]
                odd = cs[:, 1::2]
                folded = fd.add(even, fd.mul(odd, zeta[:, :1]))
                with nttc.inject_tables(ntts):
                    evals = nttc.evaluate_offset_fft(folded, 1, domain_size,
                                                     offset_int)
                leaves = kd.hash_felt_leaves(fd.from_mont(evals))
                return folded, evals, _tree_levels(leaves)

            self._jit_cache[key] = fold
        return _timed(f"fri_{domain_size}", self._jit_cache[key], coeffs,
                      zeta_arr, self.ntt_tables)

    def fri_commit_chain(self, coeffs, state_words, plan, final_fold=False):
        """The whole device part of the FRI commit phase as ONE jitted
        program: first-layer LDE + commit, then ``len(plan)`` folds whose
        zetas come from the Fiat-Shamir chain computed ON DEVICE
        (state' = keccak256(state || root), zeta = 251-bit-masked draw —
        bit-identical to transcript/fiat_shamir.py).  The protocol forces
        zeta_k to depend on root_k, which the per-layer path pays for with
        a synchronous root readback per layer; chaining on device collapses
        those round trips into one dispatch + one stacked-roots readback.

        plan: static tuple of (offset_int, domain_size) per fold layer.
        With ``final_fold`` the chain also performs the protocol's LAST fold
        (one more device zeta after the final layer root) and appends the
        resulting constant's raw limbs — reshaped (2, 8) — to the roots
        array, so ``fri_last_value`` rides the same readback and the host
        tail disappears entirely.
        Returns (roots (L+1[+2], 8) u32, evals tuple, levels tuple, coeffs)."""
        key = ("fri_chain", coeffs.shape, plan, final_fold)
        if key not in self._jit_cache:
            domain = self.domain

            @jax.jit
            def chain(cs, state, ntts):
                with nttc.inject_tables(ntts):
                    evals0 = nttc.evaluate_offset_fft(
                        cs, 1, domain.lde_size, domain.coset_offset
                    )
                    leaves = kd.hash_felt_leaves(fd.from_mont(evals0))
                    levels = _tree_levels(leaves)
                    roots = [levels[-1][0]]
                    evals_out = [evals0]
                    levels_out = [levels]
                    for off, ds in plan:
                        state = kd.hash_digest_pairs(
                            jnp.stack([state, roots[-1]], axis=0)
                        )[0]
                        zeta = fd.to_mont(
                            kd.digest_words_to_masked_limbs(state)
                        )
                        cs = fd.add(cs[:, 0::2], fd.mul(cs[:, 1::2], zeta))
                        evals = nttc.evaluate_offset_fft(cs, 1, ds, off)
                        leaves = kd.hash_felt_leaves(fd.from_mont(evals))
                        levels = _tree_levels(leaves)
                        roots.append(levels[-1][0])
                        evals_out.append(evals)
                        levels_out.append(levels)
                    out_rows = roots
                    if final_fold:
                        state_f = kd.hash_digest_pairs(
                            jnp.stack([state, roots[-1]], axis=0)
                        )[0]
                        zeta = fd.to_mont(
                            kd.digest_words_to_masked_limbs(state_f)
                        )
                        last = fd.add(cs[:, 0::2],
                                      fd.mul(cs[:, 1::2], zeta))
                        last_raw = fd.from_mont(last[:, :1])  # (16, 1)
                        out_rows = roots + [last_raw.reshape(2, 8)]
                return (jnp.concatenate(
                            [r.reshape(-1, 8) for r in out_rows], axis=0),
                        tuple(evals_out), tuple(levels_out), cs)

            self._jit_cache[key] = chain
        return _timed("fri_chain", self._jit_cache[key], coeffs, state_words,
                      self.ntt_tables)


class _ProbeTranscript:
    """Deterministic stand-in used only to inspect boundary-constraint layout
    (columns/steps) ahead of proving; never used for real challenges."""

    def challenge(self) -> bytes:
        return b"\x01" * 32

    def append(self, data: bytes) -> None:
        pass


_KERNEL_CACHE: dict = {}


def get_kernels(air, domain) -> ProverKernels:
    pub_key = air.kernel_cache_key()
    key = (type(air).__name__, air.trace_length(), air.context.trace_columns,
           air.context.proof_options, tuple(air.context.transition_exemptions),
           pub_key)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = ProverKernels(air, domain)
    return _KERNEL_CACHE[key]
