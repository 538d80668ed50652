"""Memory-instrumented fib(70000) prove repro (verdict ask #2 debugging)."""
import os, sys, time
os.environ.setdefault("LCP_DEBUG_MEM", "1")
os.environ.setdefault("LCP_DEBUG_KERNELS", "1")
sys.path.insert(0, "/root/repo")

import bench as B
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.cairo.air import generate_cairo_proof, verify_cairo_proof

n = int(os.environ.get("REPRO_FIB", "70000"))
t0 = time.perf_counter()
trace, pub, tag = B._fib_workload(n)
print(f"trace {tag} rows={trace.n_rows} gen={time.perf_counter()-t0:.1f}s", flush=True)
opts = ProofOptions(blowup_factor=4, fri_number_of_queries=80, coset_offset=3, grinding_factor=20)
t0 = time.perf_counter()
proof = generate_cairo_proof(trace, pub, opts)
print(f"prove(warm compile) {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
proof = generate_cairo_proof(trace, pub, opts)
print(f"prove(hot) {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
ok = verify_cairo_proof(proof, pub, opts)
print(f"verify {ok} {time.perf_counter()-t0:.1f}s", flush=True)
