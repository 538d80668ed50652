"""TPU fib100: prove, then per-layer FRI diagnosis."""
import time

import jax

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:6.1f}] {m}", flush=True)


log(f"devices: {jax.devices()}")
from lambdaworks_cairo_prover_tpu.cairo.air import CairoAIR, generate_cairo_proof
from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.field import host as fh
from lambdaworks_cairo_prover_tpu.field.params import P
from lambdaworks_cairo_prover_tpu.hash.keccak_host import keccak256
from lambdaworks_cairo_prover_tpu.hash.merkle import verify_proof
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.domain import Domain
from lambdaworks_cairo_prover_tpu.transcript import DefaultTranscript
from lambdaworks_cairo_prover_tpu.verifier import verify as V

trace, pub = generate_prover_args(fibonacci_program(100))
options = ProofOptions.default_test_options()
proof = generate_cairo_proof(trace, pub, options)
log("proved")

air = CairoAIR(proof.trace_length, pub, options)
domain = Domain(air)
ch = V._step_1_replay_rounds(air, proof, domain, DefaultTranscript())

two_inv = fh.finv(2)
for qi, (q, iota) in enumerate(zip(proof.query_list, ch.iotas)):
    ep_inv = fh.finv(domain.lde_point(iota))
    v = q.layers_evaluations[0]
    L = len(proof.fri_layers_merkle_roots)
    for k in range(L):
        root = proof.fri_layers_merkle_roots[k]
        dl = 1 << (domain.lde_root_order - k)
        idx = iota % dl
        idx_sym = (iota + dl // 2) % dl
        ev = q.layers_evaluations[k]
        ev_sym = q.layers_evaluations_sym[k]
        mk = verify_proof(root, idx, keccak256(fh.to_bytes_be(ev)),
                          q.layers_auth_paths[k])
        mk_sym = verify_proof(root, idx_sym, keccak256(fh.to_bytes_be(ev_sym)),
                              q.layers_auth_paths_sym[k])
        zeta = ch.zetas[k]
        v = ((v + ev_sym) * two_inv + zeta * ((v - ev_sym) % P) % P
             * two_inv % P * ep_inv) % P
        if k < L - 1:
            colin = v == q.layers_evaluations[k + 1]
        else:
            colin = v == proof.fri_last_value
        if not (mk and mk_sym and colin):
            log(f"q{qi} layer {k}: merkle={mk} merkle_sym={mk_sym} colinear={colin}")
        ep_inv = ep_inv * ep_inv % P
log("layer scan done")
