"""The STARK prover (reference src/starks/prover.rs:532-766).

Host python orchestrates the protocol rounds and the Fiat-Shamir transcript;
all bulk math (NTT interpolation/LDE, Merkle hashing, whole-domain constraint
evaluation, DEEP combination, FRI layers, grinding search) runs on device as
limb-tensor programs.  The transcript interaction order is normative and
matches the reference exactly (see SURVEY §3.2)."""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..air.frame import HostFrame
from ..air.trace import TraceTable
from ..field import device as fd
from ..field import host as fh
from ..field.params import N_LIMBS, P
from ..hash.merkle import MerkleTree
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
from .evaluator import evaluate_constraints
from .grinding import generate_nonce_with_grinding


class ProvingError(Exception):
    pass


def _const(c: int) -> jnp.ndarray:
    return jnp.asarray(fd.from_int(c % P))


def _interpolate_and_commit(trace: TraceTable, domain: Domain, transcript):
    """Returns (trace_polys, lde_evals, merkle_tree); appends root."""
    trace_polys = trace.compute_trace_polys()  # (16, m, n)
    lde_evals = nttc.evaluate_on_lde_domain(
        trace_polys, domain.blowup_factor, domain.interpolation_domain_size,
        domain.coset_offset,
    )  # (16, m, N)
    rows = fd.from_mont(jnp.moveaxis(lde_evals, 1, 2))  # (16, N, m) canonical
    tree = MerkleTree.build_batch(rows, rows.shape[2])
    transcript.append(tree.root)
    return trace_polys, lde_evals, tree


def _fold_poly(coeffs: jnp.ndarray, zeta: int) -> jnp.ndarray:
    even = coeffs[:, 0::2]
    odd = coeffs[:, 1::2]
    return fd.add(even, fd.mul(odd, _const(zeta)))


@dataclass
class _FriLayer:
    evaluations: jnp.ndarray  # (16, domain_size)
    tree: MerkleTree
    domain_size: int


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
) -> StarkProof:
    timings = {}
    t0 = time.perf_counter()

    air = air_class(main_trace.n_rows, pub_inputs, proof_options)
    domain = Domain(air)
    transcript = DefaultTranscript()
    n = air.trace_length()
    N = domain.lde_size
    h = domain.coset_offset
    g = domain.trace_primitive_root

    timings["round0"] = time.perf_counter() - t0

    # ======================= Round 1: RAP =================================
    t1 = time.perf_counter()
    trace_polys, lde_evals, main_tree = _interpolate_and_commit(
        main_trace, domain, transcript
    )
    lde_trace_merkle_roots = [main_tree.root]
    lde_trace_merkle_trees = [main_tree]

    rap_challenges = air.build_rap_challenges(transcript)
    aux_trace = air.build_auxiliary_trace(main_trace, rap_challenges)
    if not aux_trace.is_empty():
        aux_polys, aux_lde, aux_tree = _interpolate_and_commit(
            aux_trace, domain, transcript
        )
        trace_polys = jnp.concatenate([trace_polys, aux_polys], axis=1)
        lde_evals = jnp.concatenate([lde_evals, aux_lde], axis=1)
        lde_trace_merkle_roots.append(aux_tree.root)
        lde_trace_merkle_trees.append(aux_tree)
    total_cols = trace_polys.shape[1]
    timings["round1"] = time.perf_counter() - t1

    # ======================= Round 2: composition poly ====================
    t2 = time.perf_counter()
    n_boundary = len(air.boundary_constraints(rap_challenges).constraints)
    boundary_alphas = batch_sample_challenges(n_boundary, transcript)
    boundary_betas = batch_sample_challenges(n_boundary, transcript)
    transition_alphas = batch_sample_challenges(
        air.context.num_transition_constraints, transcript
    )
    transition_betas = batch_sample_challenges(
        air.context.num_transition_constraints, transcript
    )
    boundary_coeffs = list(zip(boundary_alphas, boundary_betas))
    transition_coeffs = list(zip(transition_alphas, transition_betas))

    constraint_evals = evaluate_constraints(
        air, domain, lde_evals, transition_coeffs, boundary_coeffs, rap_challenges
    )
    # NOTE: deg(H) may exceed composition_poly_degree_bound (the bound only
    # sets the degree-adjustment exponents); keep the full interpolation and
    # split even/odd like the reference (prover.rs:251-252).
    h_coeffs = nttc.interpolate_offset_fft(constraint_evals, h)
    h1_coeffs = h_coeffs[:, 0::2]
    h2_coeffs = h_coeffs[:, 1::2]
    h1_lde = nttc.evaluate_on_lde_domain(h1_coeffs, domain.blowup_factor, n, h)
    h2_lde = nttc.evaluate_on_lde_domain(h2_coeffs, domain.blowup_factor, n, h)
    comp_rows = fd.from_mont(jnp.stack([h1_lde, h2_lde], axis=2))  # (16, N, 2)
    composition_tree = MerkleTree.build_batch(comp_rows, 2)
    transcript.append(composition_tree.root)
    timings["round2"] = time.perf_counter() - t2

    # ======================= Round 3: OOD evaluations =====================
    t3 = time.perf_counter()
    z = _sample_z_ood(domain, transcript)
    z2 = z * z % P

    h1_z2 = fd.to_int(nttc.poly_eval_at(h1_coeffs, z2).reshape(N_LIMBS, 1))
    h2_z2 = fd.to_int(nttc.poly_eval_at(h2_coeffs, z2).reshape(N_LIMBS, 1))

    offsets = air.context.transition_offsets
    trace_ood_rows = []
    for k in offsets:
        point = z * pow(g, k, P) % P
        evals_k = nttc.poly_eval_at(trace_polys, point)  # (16, total_cols)
        trace_ood_rows.append(fd.to_ints(evals_k))

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

    # DEEP composition polynomial, built in evaluation form over the LDE coset
    # (replaces the reference's Ruffini divisions, prover.rs:410-482; same
    # polynomial, computed as whole-array ops + one interpolation).
    lde_values = domain.lde_values()
    inv_terms = []
    for k in offsets:
        zgk = z * pow(g, k, P) % P
        inv_terms.append(fd.sub(lde_values, _const(zgk)))
    inv_terms.append(fd.sub(lde_values, _const(z2)))
    inv_all = fd.batch_inverse(jnp.concatenate(inv_terms, axis=1))
    inv_zgk = [inv_all[:, i * N : (i + 1) * N] for i in range(len(offsets))]
    inv_z2 = inv_all[:, len(offsets) * N :]

    deep_evals = fd.zeros((N,))
    for j in range(total_cols):
        col_lde = lde_evals[:, j, :]
        for ki, k in enumerate(offsets):
            gamma_jk = trace_gammas[j * len(offsets) + ki]
            num = fd.sub(col_lde, _const(trace_ood_rows[ki][j]))
            deep_evals = fd.add(
                deep_evals, fd.mul(fd.mul(num, inv_zgk[ki]), _const(gamma_jk))
            )
    deep_evals = fd.add(
        deep_evals,
        fd.mul(fd.mul(fd.sub(h1_lde, _const(h1_z2)), inv_z2), _const(gamma_even)),
    )
    deep_evals = fd.add(
        deep_evals,
        fd.mul(fd.mul(fd.sub(h2_lde, _const(h2_z2)), inv_z2), _const(gamma_odd)),
    )
    deep_coeffs = nttc.interpolate_offset_fft(deep_evals, h)[:, :n]

    # FRI commit phase (reference fri/mod.rs:20-72)
    number_layers = domain.root_order
    fri_layers = []
    coeffs = deep_coeffs
    offset = h
    domain_size = N

    def make_layer(cs, off, ds):
        evals = nttc.evaluate_offset_fft(cs, 1, ds, off)
        step = evals.shape[1] // ds
        if step > 1:
            evals = evals[:, ::step]
        tree = MerkleTree.build_single(fd.from_mont(evals))
        return _FriLayer(evals, tree, ds)

    layer = make_layer(coeffs, offset, domain_size)
    fri_layers.append(layer)
    transcript.append(layer.tree.root)
    for _ in range(1, number_layers):
        zeta = transcript_to_field(transcript)
        offset = offset * offset % P
        domain_size //= 2
        coeffs = _fold_poly(coeffs, zeta)
        layer = make_layer(coeffs, offset, domain_size)
        fri_layers.append(layer)
        transcript.append(layer.tree.root)
    zeta = transcript_to_field(transcript)
    last_poly = _fold_poly(coeffs, zeta)
    fri_last_value = (
        fd.to_int(last_poly[:, :1]) if last_poly.shape[1] else 0
    )
    transcript.append(fh.to_bytes_be(fri_last_value))

    # grinding (reference prover.rs:380-385)
    grinding_factor = proof_options.grinding_factor
    transcript_challenge = transcript.challenge()
    nonce = generate_nonce_with_grinding(transcript_challenge, grinding_factor)
    transcript.append(nonce.to_bytes(8, "big"))

    # FRI query phase (reference fri/mod.rs:74-127)
    iotas = [
        transcript_to_usize(transcript) % N
        for _ in range(proof_options.fri_number_of_queries)
    ]
    # gather all openings per layer in batched device ops
    query_list = [
        FriDecommitment([], [], [], []) for _ in iotas
    ]
    for layer in fri_layers:
        ds = layer.domain_size
        idxs = [iota % ds for iota in iotas]
        idxs_sym = [(iota + ds // 2) % ds for iota in iotas]
        vals = fd.to_ints(jnp.take(layer.evaluations, jnp.asarray(idxs), axis=1))
        vals_sym = fd.to_ints(
            jnp.take(layer.evaluations, jnp.asarray(idxs_sym), axis=1)
        )
        paths = layer.tree.get_proofs(idxs)
        paths_sym = layer.tree.get_proofs(idxs_sym)
        for q in range(len(iotas)):
            query_list[q].layers_evaluations.append(vals[q])
            query_list[q].layers_evaluations_sym.append(vals_sym[q])
            query_list[q].layers_auth_paths.append(paths[q])
            query_list[q].layers_auth_paths_sym.append(paths_sym[q])

    # DEEP openings (reference prover.rs:484-529)
    open_idxs = [iota % N for iota in iotas]
    h1_open = fd.to_ints(jnp.take(h1_lde, jnp.asarray(open_idxs), axis=1))
    h2_open = fd.to_ints(jnp.take(h2_lde, jnp.asarray(open_idxs), axis=1))
    comp_paths = composition_tree.get_proofs(open_idxs)
    trace_paths_per_tree = [t.get_proofs(open_idxs) for t in lde_trace_merkle_trees]
    trace_rows_open = jnp.take(lde_evals, jnp.asarray(open_idxs), axis=2)
    # (16, total_cols, Q) -> per query list of ints
    trace_rows_ints = fd.to_ints(trace_rows_open.reshape(N_LIMBS, -1))
    deep_poly_openings = []
    for q, idx in enumerate(open_idxs):
        row = [trace_rows_ints[j * len(open_idxs) + q] for j in range(total_cols)]
        deep_poly_openings.append(
            DeepPolynomialOpenings(
                lde_composition_poly_proof=comp_paths[q],
                lde_composition_poly_even_evaluation=h1_open[q],
                lde_composition_poly_odd_evaluation=h2_open[q],
                lde_trace_merkle_proofs=[tp[q] for tp in trace_paths_per_tree],
                lde_trace_evaluations=row,
            )
        )
    timings["round4"] = time.perf_counter() - t4

    if instrument:
        total = sum(v for k, v in timings.items() if k != "round0")
        fractions = " ".join(
            f"{timings[k] / total:.4f}" for k in ["round0", "round1", "round2", "round3", "round4"]
        )
        print(f"Fraction of proving time per round: {fractions}")

    proof = StarkProof(
        lde_trace_merkle_roots=lde_trace_merkle_roots,
        trace_ood_frame_evaluations=trace_ood_rows,
        composition_poly_root=composition_tree.root,
        composition_poly_even_ood_evaluation=h1_z2,
        composition_poly_odd_ood_evaluation=h2_z2,
        fri_layers_merkle_roots=[l.tree.root for l in fri_layers],
        fri_last_value=fri_last_value,
        query_list=query_list,
        deep_poly_openings=deep_poly_openings,
        nonce=nonce,
        trace_length=n,
    )
    proof._timings = timings
    return proof
