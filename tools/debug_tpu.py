"""TPU smoke run: Cairo fibonacci prove/verify with kernel timings."""
import time

import jax

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:6.1f}] {m}", flush=True)


log(f"devices: {jax.devices()}")
from lambdaworks_cairo_prover_tpu.cairo.air import (
    generate_cairo_proof,
    verify_cairo_proof,
)
from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions

trace, pub = generate_prover_args(fibonacci_program(5))
log(f"trace {trace.n_rows}x{trace.n_cols}; proving")
proof = generate_cairo_proof(trace, pub, ProofOptions.default_test_options())
log(f"proved; verify={verify_cairo_proof(proof, pub, ProofOptions.default_test_options())}")
t1 = time.time()
generate_cairo_proof(trace, pub, ProofOptions.default_test_options())
log(f"second prove: {time.time()-t1:.2f}s")
