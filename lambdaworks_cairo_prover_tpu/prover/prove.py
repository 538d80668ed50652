"""The STARK prover (reference src/starks/prover.rs:532-766).

Host python orchestrates the protocol rounds and the Fiat-Shamir transcript;
all bulk math runs on device through per-shape cached jitted round kernels
(prover/kernels.py) — challenges enter as runtime limb arrays so repeated
proofs never recompile.  The transcript interaction order is normative and
matches the reference exactly (see SURVEY §3.2)."""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..air.trace import TraceTable
from ..field import device as fd
from ..field import host as fh
from ..field.params import N_LIMBS, P
from ..hash.keccak_host import keccak256, keccak256_batch
from ..hash.merkle import MerkleTree, fetch_tree
from ..ntt import core as nttc
from ..proof.options import ProofOptions
from ..proof.stark import DeepPolynomialOpenings, FriDecommitment, StarkProof
from ..transcript import (
    DefaultTranscript,
    batch_sample_challenges,
    transcript_to_field,
    transcript_to_usize,
)
from .domain import Domain
from .grinding import generate_nonce_with_grinding
from .kernels import get_kernels
from ..parallel.sharding import fetch_np

import jax


def _mem(tag: str) -> None:
    """HBM telemetry (LCP_DEBUG_MEM=1): prints live/peak device bytes after
    syncing outstanding dispatches, so OOMs can be localized per phase."""
    import os

    if not os.environ.get("LCP_DEBUG_MEM"):
        return
    try:
        # allocator stats are unavailable on tunneled backends (axon returns
        # zeros), so sum the live-array working set instead — exact for
        # framework-held buffers, excludes XLA scratch
        live = jax.live_arrays()
        total = sum(a.nbytes for a in live)
        top = sorted(live, key=lambda a: -a.nbytes)[:6]
        tops = ", ".join(f"{a.shape}:{a.nbytes / 1e9:.2f}" for a in top)
        print(f"[mem {tag}] live={total / 1e9:.2f}GB n={len(live)} "
              f"top=[{tops}]", flush=True)
    except Exception as e:  # pragma: no cover
        print(f"[mem {tag}] unavailable: {e}", flush=True)


@jax.jit
def _query_gather(srcs, idxs, dig_srcs, dig_idxs):
    """All query-phase openings in one program: limb-value gathers along the
    last axis (flattened to one (16, M) array) and Merkle sibling-digest
    gathers for every device tree (one (K, 8) array).  Retraced per proof
    shape; cached thereafter."""
    limbs = jnp.concatenate(
        [jnp.take(s, i, axis=-1).reshape(N_LIMBS, -1)
         for s, i in zip(srcs, idxs)],
        axis=1,
    )
    digs = [
        jnp.take(lv, ix, axis=0)
        for levels, per_level in zip(dig_srcs, dig_idxs)
        for lv, ix in zip(levels, per_level)
    ]
    if digs:
        return limbs, jnp.concatenate(digs, axis=0)
    return limbs, jnp.zeros((0, 8), dtype=jnp.uint32)


class ProvingError(Exception):
    """Typed prover failure (reference prover.rs:40-43 `ProvingError`)."""


_HOST_FRI_THRESHOLD = 4096  # fold FRI layers of this size or less on host
# LDE domains up to 2^this run EVERY FRI layer + the final fold inside the
# device chain (fri_last_value rides the roots readback, no host tail); at
# larger domains the single XLA program would grow past what the remote
# compile helper digests quickly, so the tail stays on host.
_FULL_CHAIN_MAX_LOG = int(__import__("os").environ.get(
    "LCP_FULL_FRI_CHAIN_MAX_LOG", "16"))
# Rationale: each device FRI layer costs a dispatch + a root transfer; over
# a remote link those round-trips dominate the tail (the polynomial shrinks
# geometrically).  With the native keccak library the host finishes all
# remaining layers in a few ms with zero device traffic.


def _host_fold(coeffs: list[int], zeta: int) -> list[int]:
    """even + zeta*odd, keeping the length (= next domain size)."""
    return [
        (coeffs[2 * i] + zeta * coeffs[2 * i + 1]) % P
        for i in range(len(coeffs) // 2)
    ]


def _host_evaluate_offset_fft(coeffs: list[int], domain_size: int,
                              offset: int) -> list[int]:
    """lambdaworks `evaluate_offset_fft` semantics for the host tail
    (blowup 1): scale by offset powers, pad to domain_size, radix-2 FFT."""
    from ..field.params import get_primitive_root_of_unity

    scaled = []
    o = 1
    for c in coeffs:
        scaled.append(c * o % P)
        o = o * offset % P
    scaled.extend([0] * (domain_size - len(scaled)))
    # helper takes log2(order) (lambdaworks convention)
    return _host_fft(scaled,
                     get_primitive_root_of_unity(domain_size.bit_length() - 1))


def _host_fft(a: list[int], w: int) -> list[int]:
    n = len(a)
    if n == 1:
        return a
    even = _host_fft(a[0::2], w * w % P)
    odd = _host_fft(a[1::2], w * w % P)
    out = [0] * n
    x = 1
    for i in range(n // 2):
        t = x * odd[i] % P
        out[i] = (even[i] + t) % P
        out[i + n // 2] = (even[i] - t) % P
        x = x * w % P
    return out


class _HostMerkle:
    """Host Merkle tree over precomputed leaf digests; same node rule and
    proof API as hash.merkle.MerkleTree (node = keccak(left || right))."""

    def __init__(self, leaf_digests: list[bytes]):
        levels = [leaf_digests]
        cur = leaf_digests
        while len(cur) > 1:
            cur = keccak256_batch(
                [cur[i] + cur[i + 1] for i in range(0, len(cur), 2)]
            )
            levels.append(cur)
        self.levels = levels

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    def get_proofs(self, indices: list[int]) -> list[list[bytes]]:
        paths = [[] for _ in indices]
        idxs = list(indices)
        for level in self.levels[:-1]:
            for q, i in enumerate(idxs):
                paths[q].append(level[i ^ 1])
            idxs = [i >> 1 for i in idxs]
        return paths


def _arr(ints) -> jnp.ndarray:
    return jnp.asarray(fd.from_ints(list(ints)))


def _sample_z_ood(domain: Domain, transcript) -> int:
    while True:
        z = transcript_to_field(transcript)
        if not domain.contains_in_lde_coset(z) and not domain.contains_in_trace_roots(z):
            return z


def prove(
    main_trace: TraceTable,
    pub_inputs,
    proof_options: ProofOptions,
    air_class,
    instrument: bool = False,
    mesh=None,
    shard_axis: str = "domain",
    transcript_factory=DefaultTranscript,
    donate_trace: bool = False,
) -> StarkProof:
    """Generate a STARK proof.

    With ``mesh`` (a jax.sharding.Mesh with one axis) the prover runs as an
    SPMD program over the mesh.  ``shard_axis`` selects the layout:

    * ``"domain"`` (default) — the LDE-domain axis of every round-1..4
      tensor is block-sharded across devices; NTT/iNTT/LDE run as four-step
      transforms whose stage transposes are ``all_to_all`` collectives
      (parallel/four_step.py), constraint evaluation / DEEP / Merkle leaf
      hashing are shard-local, and frame row shifts lower to collective
      permutes.  This is the layout that scales trace length past one
      chip's HBM (SURVEY §5 long-context plan).
    * ``"columns"`` — the trace-column axis is sharded; per-column NTTs
      are communication-free but the domain axis stays replicated.

    Proof bytes are identical for any mesh shape and either layout
    (asserted by tests/test_sharded_prove.py, tests/test_domain_sharded.py).
    """
    import os

    profile_dir = os.environ.get("LCP_PROFILE")
    if profile_dir:
        # SURVEY §5 tracing parity: XLA/TPU timeline for xprof/tensorboard
        jax.profiler.start_trace(profile_dir)

    timings = {}
    t0 = time.perf_counter()

    if shard_axis not in ("domain", "columns"):
        raise ProvingError(
            f"unknown shard_axis {shard_axis!r}; expected 'domain' or 'columns'"
        )
    if mesh is not None and shard_axis == "columns":
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        sharding = NamedSharding(mesh, PartitionSpec(None, None, axis))
        main_trace = TraceTable(jax.device_put(main_trace.data, sharding))

    if main_trace.n_rows == 0 or main_trace.n_rows & (main_trace.n_rows - 1):
        raise ProvingError(
            f"trace length must be a power of two, got {main_trace.n_rows}"
        )
    air = air_class(main_trace.n_rows, pub_inputs, proof_options)
    domain = Domain(air)
    # Reference options.rs:86-91 caps the max domain at 2^NUM_BITS_MAX_DOMAIN_SIZE
    # when checking field security; enforce the same bound at prove time.
    if domain.lde_size > 1 << ProofOptions.NUM_BITS_MAX_DOMAIN_SIZE:
        raise ProvingError(
            f"LDE domain size 2^{domain.lde_size.bit_length() - 1} exceeds "
            f"the maximum 2^{ProofOptions.NUM_BITS_MAX_DOMAIN_SIZE}"
        )
    if mesh is not None and shard_axis == "domain":
        from ..parallel.sharded_kernels import get_sharded_kernels

        kern = get_sharded_kernels(air, domain, mesh)
    else:
        kern = get_kernels(air, domain)
    transcript = transcript_factory()
    n = air.trace_length()
    N = domain.lde_size
    h = domain.coset_offset
    g = domain.trace_primitive_root
    offsets = air.context.transition_offsets
    timings["round0"] = time.perf_counter() - t0
    _mem("round0: kernels+tables built")

    # ======================= Round 1: RAP =================================
    t1 = time.perf_counter()
    packed = getattr(kern, "packed_resident", False)
    n_main_cols = main_trace.data.shape[1]
    if packed:
        # one packed (8, main+aux cols, n|N) buffer pair for the whole
        # trace; both commits write into it in place (kernels.py rationale)
        bufs = kern.alloc_buffers(
            n_main_cols + air.number_auxiliary_rap_columns())
        trace_polys, lde_evals, main_levels = kern.interpolate_commit(
            main_trace.data, bufs=bufs, col_start=0)
    else:
        trace_polys, lde_evals, main_levels = kern.interpolate_commit(
            main_trace.data)
    _mem("round1: main trace committed")
    main_tree = fetch_tree(main_levels)
    transcript.append(main_tree.root)
    lde_trace_merkle_roots = [main_tree.root]
    lde_trace_merkle_trees = [main_tree]

    rap_challenges = air.build_rap_challenges(transcript)
    if donate_trace:
        # allow the AIR to free the resident trace as soon as it has read
        # the columns it needs (the aux sort/scan transients then reuse
        # that HBM); prove's fallback below frees it if the AIR does not
        main_trace._release_after_read = True
    if (os.environ.get("LCP_AUX_HOST") == "1"
            and hasattr(air, "build_auxiliary_trace_host")):
        # HBM relief valve for the largest single-chip traces: the aux
        # sort/scan device transients (~2 GB at 2^20 rows) are what tips a
        # 13 GB-resident prove over the v5e ceiling — the host build is the
        # reference-path implementation (identical values; asserted by
        # tests) and touches no device memory beyond the final upload
        aux_trace = air.build_auxiliary_trace_host(main_trace, rap_challenges)
        if donate_trace and main_trace.data is not None:
            main_trace.data.delete()
            main_trace.data = None
    else:
        aux_trace = air.build_auxiliary_trace(main_trace, rap_challenges)
    _mem("round1: aux trace built")
    if os.environ.get("LCP_VALIDATE_TRACE"):
        # Reference prover.rs:573-580 runs the pointwise constraint oracle on
        # every debug-build prove; here it is env-gated (it is O(n·constraints)
        # host work) and failures abort with a typed error instead of letting
        # a buggy AIR/trace surface only as a failed verify.
        from .debug import validate_trace

        if not validate_trace(air, main_trace, aux_trace, rap_challenges):
            raise ProvingError("trace does not satisfy the AIR constraints")
    if donate_trace and main_trace.data is not None:
        # CLI-style single-shot proves: the resident main trace is not
        # needed past the aux build — freeing it buys ~1.1-2.3 GB of HBM at
        # 2^20 rows (the margin that fits that size on one v5e).  The
        # caller's TraceTable is invalidated (documented on the kwarg).
        # (An AIR may already have released it mid-aux-build via the
        # _release_after_read flag, set before the build above.)
        main_trace.data.delete()
        main_trace.data = None
    if not aux_trace.is_empty():
        if packed:
            trace_polys, lde_evals, aux_levels = kern.interpolate_commit(
                aux_trace.data, bufs=(trace_polys, lde_evals),
                col_start=n_main_cols)
        else:
            aux_polys, aux_lde, aux_levels = kern.interpolate_commit(
                aux_trace.data)
            trace_polys = jnp.concatenate([trace_polys, aux_polys], axis=1)
            lde_evals = jnp.concatenate([lde_evals, aux_lde], axis=1)
        aux_trace = None  # the (16, aux_cols, n) transient is committed
        aux_tree = fetch_tree(aux_levels)
        transcript.append(aux_tree.root)
        lde_trace_merkle_roots.append(aux_tree.root)
        lde_trace_merkle_trees.append(aux_tree)
    total_cols = trace_polys.shape[1]
    timings["round1"] = time.perf_counter() - t1
    _mem("round1: aux committed")

    # ======================= Round 2: composition poly ====================
    t2 = time.perf_counter()
    bc = air.boundary_constraints(rap_challenges)
    n_boundary = len(bc.constraints)
    boundary_alphas = batch_sample_challenges(n_boundary, transcript)
    boundary_betas = batch_sample_challenges(n_boundary, transcript)
    transition_alphas = batch_sample_challenges(
        air.context.num_transition_constraints, transcript
    )
    transition_betas = batch_sample_challenges(
        air.context.num_transition_constraints, transcript
    )

    boundary_ab = (_arr(boundary_alphas), _arr(boundary_betas))
    transition_ab = (_arr(transition_alphas), _arr(transition_betas))
    boundary_values = _arr([c.value for c in bc.constraints])
    rap_arrays = tuple(jnp.asarray(fd.from_int(v)) for v in rap_challenges)

    h1_coeffs, h2_coeffs, h1_lde, h2_lde, comp_levels = kern.round2(
        lde_evals, boundary_ab, transition_ab, boundary_values, rap_arrays
    )
    composition_tree = fetch_tree(comp_levels)
    transcript.append(composition_tree.root)
    timings["round2"] = time.perf_counter() - t2
    _mem("round2: composition committed")

    # ======================= Round 3: OOD evaluations =====================
    t3 = time.perf_counter()
    z = _sample_z_ood(domain, transcript)
    z2 = z * z % P

    # All round-3 evaluations dispatch asynchronously; the host syncs ONCE
    # on a stacked readback — per-value readbacks cost a tunnel round trip
    # each.
    pw_z2 = nttc.offset_powers(z2, h1_coeffs.shape[-1])
    h1_dev = kern.eval_at_powers(h1_coeffs, pw_z2)
    h2_dev = kern.eval_at_powers(h2_coeffs, pw_z2)
    ood_dev = []
    for k in offsets:
        point = z * pow(g, k, P) % P
        pw = nttc.offset_powers(point, n)
        ood_dev.append(kern.eval_at_powers(trace_polys, pw))  # (16, total_cols)
    # ONE readback for all round-3 values: H1(z^2), H2(z^2) and the whole
    # OOD trace frame (each fetch is a synchronous tunnel round trip)
    r3_flat = fd.to_ints(
        fetch_np(jnp.concatenate(
            [jnp.stack([h1_dev, h2_dev], axis=1).reshape(N_LIMBS, 2)]
            + [o.reshape(N_LIMBS, -1) for o in ood_dev], axis=1,
        )), mont=False,
    )
    h1_z2, h2_z2 = r3_flat[0], r3_flat[1]
    ood_flat = r3_flat[2:]
    trace_ood_rows = [
        ood_flat[i * total_cols:(i + 1) * total_cols]
        for i in range(len(offsets))
    ]

    transcript.append(fh.to_bytes_be(h1_z2))
    transcript.append(fh.to_bytes_be(h2_z2))
    for row in trace_ood_rows:
        for el in row:
            transcript.append(fh.to_bytes_be(el))
    timings["round3"] = time.perf_counter() - t3

    # ======================= Round 4: DEEP + FRI ==========================
    t4 = time.perf_counter()
    gamma_even = transcript_to_field(transcript)
    gamma_odd = transcript_to_field(transcript)
    trace_gammas = batch_sample_challenges(len(offsets) * total_cols, transcript)

    points = [z * pow(g, k, P) % P for k in offsets] + [z2]
    point_arrs = jnp.stack([jnp.asarray(fd.from_int(p_)) for p_ in points])
    gamma_arr = _arr(trace_gammas)
    gammas_hh = jnp.stack(
        [jnp.asarray(fd.from_int(gamma_even)), jnp.asarray(fd.from_int(gamma_odd))]
    )
    ood_tuple = tuple(_arr(row) for row in trace_ood_rows) + (
        _arr([h1_z2, h2_z2]),
    )

    deep_coeffs = kern.deep_poly(
        lde_evals, h1_lde, h2_lde, point_arrs, gamma_arr, gammas_hh, ood_tuple
    )
    timings["round4_deep"] = time.perf_counter() - t4
    _mem("round4: deep poly")

    # FRI commit phase (reference fri/mod.rs:20-72)
    t4b = time.perf_counter()
    number_layers = domain.root_order
    fri_layers = []  # (evaluations, tree, domain_size)

    coeffs = deep_coeffs
    offset_int = h
    domain_size = N
    start_layer = 1

    # device-layer plan: folds whose (halved) domain stays above the
    # host-tail threshold — static, so the whole device part can run as one
    # jitted chain with zetas computed on device (kern.fri_commit_chain).
    # Small domains (every fold layer <= 2^_FULL_CHAIN_MAX_LOG) run ALL
    # layers + the final fold on device: fri_last_value rides the roots
    # readback and the host tail (its own coeffs readback) disappears.
    full_chain = N <= (1 << _FULL_CHAIN_MAX_LOG)
    chain_plan = []
    off_p, ds_p = h, N
    for _ in range(1, number_layers):
        off_p = off_p * off_p % P
        ds_p //= 2
        if not full_chain and ds_p <= _HOST_FRI_THRESHOLD:
            break
        chain_plan.append((off_p, ds_p))
    buf = getattr(transcript, "_buf", None)
    # exact-type check: a DefaultTranscript SUBCLASS may override the
    # append/challenge rule, which the device chain hard-codes; the chain's
    # on-device field draw also bakes the 252-bit field's 251-bit mask, so
    # toy fields (LCP_FIELD) take the per-layer path
    from ..field.params import FIELD_BIT_SIZE

    use_chain = (type(transcript) is DefaultTranscript and chain_plan
                 and buf is not None and len(buf) == 32
                 and FIELD_BIT_SIZE == 252
                 and getattr(kern, "supports_fri_chain", False))
    full_chain = full_chain and use_chain and len(chain_plan) == number_layers - 1
    if use_chain:
        from ..hash.keccak_device import digest_to_bytes

        state0 = jnp.asarray(np.frombuffer(bytes(buf), dtype="<u4"))
        roots_dev, evals_t, levels_t, coeffs = kern.fri_commit_chain(
            deep_coeffs, state0, tuple(chain_plan), final_fold=full_chain
        )
        roots_np = fetch_np(roots_dev)  # ONE readback for all layer roots
        ds = N
        for i, (evals, levels) in enumerate(zip(evals_t, levels_t)):
            if i > 0:
                # zeta_i was derived on device from the same chain; advance
                # the host transcript identically
                transcript_to_field(transcript)
                ds //= 2
            tree = fetch_tree(levels)
            tree._root_bytes = digest_to_bytes(roots_np[i])
            fri_layers.append((evals, tree, ds))
            transcript.append(tree.root)
        start_layer = len(chain_plan) + 1
        offset_int, domain_size = chain_plan[-1]
        if full_chain:
            # the device already performed the final fold; replay the last
            # zeta draw and read the constant off the roots array
            transcript_to_field(transcript)
            fri_last_value = fd.to_ints(
                roots_np[-2:].reshape(16, 1).astype(np.uint32), mont=False
            )[0]
            transcript.append(fh.to_bytes_be(fri_last_value))
            timings["round4_fri_commit"] = time.perf_counter() - t4b
            host_coeffs = None
    else:
        evals0, levels0 = kern.fri_first_layer(deep_coeffs)
        tree0 = fetch_tree(levels0)
        fri_layers.append((evals0, tree0, N))
        transcript.append(tree0.root)

    if not full_chain:
        host_coeffs = None  # once small enough, fold/hash layers on host
        for _ in range(start_layer, number_layers):
            zeta = transcript_to_field(transcript)
            offset_int = offset_int * offset_int % P
            domain_size //= 2
            if host_coeffs is None and domain_size <= _HOST_FRI_THRESHOLD:
                host_coeffs = fd.to_ints(fetch_np(coeffs))
            if host_coeffs is not None:
                host_coeffs = _host_fold(host_coeffs, zeta)
                evals = _host_evaluate_offset_fft(host_coeffs, domain_size,
                                                  offset_int)
                tree = _HostMerkle(keccak256_batch(
                    [fh.to_bytes_be(v) for v in evals]))
                fri_layers.append((evals, tree, domain_size))
            else:
                coeffs, evals, levels = kern.fri_fold_layer(
                    coeffs, jnp.asarray(fd.from_int(zeta)), offset_int,
                    domain_size
                )
                tree = fetch_tree(levels)
                fri_layers.append((evals, tree, domain_size))
            transcript.append(tree.root)

        zeta = transcript_to_field(transcript)
        # final fold on host: the remaining polynomial is tiny
        last_coeffs = (host_coeffs if host_coeffs is not None
                       else fd.to_ints(fetch_np(coeffs)))
        folded_host = [
            (last_coeffs[2 * i] + zeta * last_coeffs[2 * i + 1]) % P
            for i in range(len(last_coeffs) // 2)
        ]
        fri_last_value = folded_host[0] if folded_host else 0
        transcript.append(fh.to_bytes_be(fri_last_value))

        timings["round4_fri_commit"] = time.perf_counter() - t4b

    _mem("round4: fri committed")
    # grinding (reference prover.rs:380-385)
    t4c = time.perf_counter()
    transcript_challenge = transcript.challenge()
    nonce = generate_nonce_with_grinding(
        transcript_challenge, proof_options.grinding_factor
    )
    transcript.append(nonce.to_bytes(8, "big"))
    timings["round4_grinding"] = time.perf_counter() - t4c

    # FRI query phase (reference fri/mod.rs:74-127)
    t4d = time.perf_counter()
    iotas = [
        transcript_to_usize(transcript) % N
        for _ in range(proof_options.fri_number_of_queries)
    ]
    query_list = [FriDecommitment([], [], [], []) for _ in iotas]
    nq = len(iotas)
    open_idxs = [iota % N for iota in iotas]

    # ---- single-dispatch query gather ------------------------------------
    # Every device-side opening (layer evaluations at iota/iota_sym, H1/H2
    # and trace-row values, and ALL Merkle sibling digests of every device
    # tree) concatenates into one jitted program: one dispatch, one (16, M)
    # limb fetch and one (K, 8) digest fetch — instead of ~2 synchronous
    # round trips per tree (reference opens per query per layer,
    # fri/mod.rs:74-127 + prover.rs:484-529).
    from ..hash.keccak_device import digest_to_bytes as _d2b

    limb_srcs, limb_idx, limb_off = [], [], [0]
    dig_srcs, dig_idx, dig_meta, dig_off = [], [], [], [0]

    def queue_limbs(src, idxs):
        limb_srcs.append(src)
        limb_idx.append(jnp.asarray(idxs))
        limb_off.append(limb_off[-1]
                        + len(idxs) * int(np.prod(src.shape[1:-1], dtype=int)))
        return len(limb_srcs) - 1

    def queue_tree(tree, idxs):
        if not isinstance(tree, MerkleTree):
            return None  # host-tail tree: paths computed host-side
        levels = tree.levels[:-1]
        sib, cur = [], list(idxs)
        for _ in levels:
            sib.append([i ^ 1 for i in cur])
            cur = [i >> 1 for i in cur]
        dig_srcs.append(tuple(levels))
        dig_idx.append(tuple(jnp.asarray(s) for s in sib))
        dig_meta.append((len(levels), len(idxs)))
        dig_off.append(dig_off[-1] + len(levels) * len(idxs))
        return len(dig_srcs) - 1

    layer_plans = []
    for evals, tree, ds in fri_layers:
        both_idx = ([iota % ds for iota in iotas]
                    + [(iota + ds // 2) % ds for iota in iotas])
        if isinstance(evals, list):  # host-tail layer
            layer_plans.append(("host", [evals[i] for i in both_idx],
                                tree.get_proofs(both_idx)))
        else:
            layer_plans.append(("dev", queue_limbs(evals, both_idx),
                                queue_tree(tree, both_idx)))
    h12_pos = queue_limbs(jnp.stack([h1_lde, h2_lde], axis=1), open_idxs)
    # the resident LDE may be packed — the kernels gather + unpack the
    # queried columns into a small (16, cols, nq) array first
    lde_q = kern.gather_columns(lde_evals, open_idxs)
    rows_pos = queue_limbs(lde_q, list(range(len(open_idxs))))
    comp_pos = queue_tree(composition_tree, open_idxs)
    trace_pos = [queue_tree(t, open_idxs) for t in lde_trace_merkle_trees]

    limbs_all, digs_all = _query_gather(
        tuple(limb_srcs), tuple(limb_idx), tuple(dig_srcs), tuple(dig_idx)
    )
    all_ints = fd.to_ints(fetch_np(limbs_all))
    digs_np = fetch_np(digs_all)

    def tree_paths(tpos, k):
        base, n_levels = dig_off[tpos], dig_meta[tpos][0]
        return [
            [_d2b(digs_np[base + li * k + q]) for li in range(n_levels)]
            for q in range(k)
        ]

    for plan, (evals, tree, ds) in zip(layer_plans, fri_layers):
        if plan[0] == "host":
            _, vals_both, paths_both = plan
        else:
            _, lpos, tpos = plan
            vals_both = all_ints[limb_off[lpos]: limb_off[lpos + 1]]
            paths_both = tree_paths(tpos, 2 * nq)
        vals, vals_sym = vals_both[:nq], vals_both[nq:]
        paths, paths_sym = paths_both[:nq], paths_both[nq:]
        for q in range(nq):
            query_list[q].layers_evaluations.append(vals[q])
            query_list[q].layers_evaluations_sym.append(vals_sym[q])
            query_list[q].layers_auth_paths.append(paths[q])
            query_list[q].layers_auth_paths_sym.append(paths_sym[q])

    # DEEP openings (reference prover.rs:484-529)
    h12_open = all_ints[limb_off[h12_pos]: limb_off[h12_pos + 1]]
    h1_open, h2_open = h12_open[:nq], h12_open[nq:]
    trace_rows_ints = all_ints[limb_off[rows_pos]: limb_off[rows_pos + 1]]
    comp_paths = tree_paths(comp_pos, nq)
    trace_paths_per_tree = [tree_paths(tp, nq) for tp in trace_pos]
    deep_poly_openings = []
    for q, idx in enumerate(open_idxs):
        row = [trace_rows_ints[j * nq + q] for j in range(total_cols)]
        deep_poly_openings.append(
            DeepPolynomialOpenings(
                lde_composition_poly_proof=comp_paths[q],
                lde_composition_poly_even_evaluation=h1_open[q],
                lde_composition_poly_odd_evaluation=h2_open[q],
                lde_trace_merkle_proofs=[tp[q] for tp in trace_paths_per_tree],
                lde_trace_evaluations=row,
            )
        )
    timings["round4_queries"] = time.perf_counter() - t4d
    timings["round4"] = time.perf_counter() - t4

    if instrument:
        total = sum(v for k, v in timings.items() if k != "round0")
        fractions = " ".join(
            f"{timings[k] / total:.4f}"
            for k in ["round0", "round1", "round2", "round3", "round4"]
        )
        print(f"Fraction of proving time per round: {fractions}")

    proof = StarkProof(
        lde_trace_merkle_roots=lde_trace_merkle_roots,
        trace_ood_frame_evaluations=trace_ood_rows,
        composition_poly_root=composition_tree.root,
        composition_poly_even_ood_evaluation=h1_z2,
        composition_poly_odd_ood_evaluation=h2_z2,
        fri_layers_merkle_roots=[layer[1].root for layer in fri_layers],
        fri_last_value=fri_last_value,
        query_list=query_list,
        deep_poly_openings=deep_poly_openings,
        nonce=nonce,
        trace_length=n,
    )
    proof._timings = timings
    if profile_dir:
        jax.profiler.stop_trace()
    return proof
