"""Whole-domain constraint evaluation (reference
src/starks/constraints/evaluator.rs:38-260, re-designed TPU-first).

The reference's hottest loop reads a frame and calls `compute_transition`
per LDE point; here every constraint is evaluated over the ENTIRE domain at
once as limb-tensor ops:

  acc(x) = sum_b  (t_col(x) - v_b) * (alpha_b * x^dB + beta_b) / (x - g^sb)
         + sum_t  C_t(frame(x)) * (alpha_t * x^dt + beta_t) * E_t(x) / (x^n - 1)

with the boundary zerofier inverses batched per *distinct step*, the cyclic
transition zerofier computed from its ``blowup`` distinct values, and the
exemption polynomials evaluated as short products over the domain."""

from __future__ import annotations

import jax.numpy as jnp

from ..field import device as fd
from ..field.params import P
from ..air.frame import DeviceFrame
from .domain import Domain


def evaluate_constraints(
    air,
    domain: Domain,
    lde_trace_data: jnp.ndarray,  # (16, n_cols_total, N)
    transition_coeffs: list[tuple[int, int]],
    boundary_coeffs: list[tuple[int, int]],
    rap_challenges,
) -> jnp.ndarray:
    """Returns the accumulated constraint evaluations (16, N)."""
    n = air.trace_length()
    N = domain.lde_size
    bound = air.composition_poly_degree_bound()
    ctx_const = lambda c: jnp.asarray(fd.from_int(c % P))  # (16,1) broadcasts

    bc = air.boundary_constraints(rap_challenges)
    lde_values = domain.lde_values()

    # ---- boundary terms ---------------------------------------------------
    distinct_steps = bc.distinct_steps()
    inv_by_step = {}
    if distinct_steps:
        diffs = [
            fd.sub(lde_values, ctx_const(domain.trace_root_pow(s)))
            for s in distinct_steps
        ]
        big = jnp.concatenate(diffs, axis=1)
        inv_big = fd.batch_inverse(big)
        for i, s in enumerate(distinct_steps):
            inv_by_step[s] = inv_big[:, i * N : (i + 1) * N]

    d_adj = domain.lde_pow(bound - n)  # boundary degree adjustment x^(D-n)
    acc = fd.zeros((N,))
    for constraint, (alpha, beta) in zip(bc.constraints, boundary_coeffs):
        num = fd.sub(lde_trace_data[:, constraint.col, :], ctx_const(constraint.value))
        coeff = fd.add(fd.mul(d_adj, ctx_const(alpha)), ctx_const(beta))
        term = fd.mul(fd.mul(num, coeff), inv_by_step[constraint.step])
        acc = fd.add(acc, term)

    # ---- transition terms -------------------------------------------------
    ctx = air.context
    blowup = domain.blowup_factor

    # cyclic zerofier 1/(x^n - 1): only `blowup` distinct values
    hn = pow(domain.coset_offset, n, P)
    wb = pow(domain.lde_primitive_root, n, P)  # order `blowup`
    zf_ints = [(hn * pow(wb, j, P) - 1) % P for j in range(blowup)]
    zf_inv_ints = [pow(v, P - 2, P) for v in zf_ints]
    zf_inv = jnp.asarray(fd.from_ints(zf_inv_ints))  # (16, blowup)
    zerofier_inv = jnp.tile(zf_inv, (1, N // blowup))

    # degree adjustments x^(D - n(deg-1)) per distinct degree
    adj_by_degree = {}
    for d in set(ctx.transition_degrees):
        adj_by_degree[d] = domain.lde_pow(bound - n * (d - 1))

    # exemption evaluations per distinct positive count
    exemption_evals = {}
    for count in air.transition_exemption_counts():
        prod = None
        for r in air.exemption_roots(count):
            f = fd.sub(lde_values, ctx_const(r))
            prod = f if prod is None else fd.mul(prod, f)
        exemption_evals[count] = prod

    frame = DeviceFrame(lde_trace_data, ctx.transition_offsets, blowup)
    rap_fv = air.wrap_rap_challenges(frame.ctx, rap_challenges)
    evals = air.compute_transition(frame, rap_fv)
    assert len(evals) == ctx.num_transition_constraints

    for ev, exemption, degree, (alpha, beta) in zip(
        evals, ctx.transition_exemptions, ctx.transition_degrees, transition_coeffs
    ):
        coeff = fd.add(fd.mul(adj_by_degree[degree], ctx_const(alpha)), ctx_const(beta))
        term = fd.mul(fd.mul(ev.v, coeff), zerofier_inv)
        if exemption > 0:
            term = fd.mul(term, exemption_evals[exemption])
        acc = fd.add(acc, term)

    return acc
