"""Fast-tier smoke tests: a prover that cannot run at all must go RED here.

Round-3 shipped a NameError inside ProverKernels._build_ntt_tables that made
every single-device prove crash while the whole fast tier stayed green
(every e2e prove module is slow-marked).  These two tests close that hole:

  * test_tiny_prove_through_kernels — a full 8-row simple-Fibonacci
    prove+verify through the REAL get_kernels()/ProverKernels path
    (mirrors reference tests/integration_tests.rs:36-53); seconds on CPU.
  * test_bench_script_runs — `python bench.py` as a subprocess with a tiny
    config must exit 0 and print valid JSON, so the bench driver can never
    again be committed unrunnable.
"""

import json
import os
import subprocess
import sys


def test_tiny_prove_through_kernels():
    from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
        FibonacciAIR,
        FibonacciPublicInputs,
        fibonacci_trace,
    )
    from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
    from lambdaworks_cairo_prover_tpu.prover import kernels as pk
    from lambdaworks_cairo_prover_tpu.prover.prove import prove
    from lambdaworks_cairo_prover_tpu.verifier.verify import verify

    trace = fibonacci_trace([1, 1], 8)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof = prove(trace, pub, options, FibonacciAIR)
    assert verify(proof, pub, options, FibonacciAIR)
    # the prove above must have gone through the kernel cache (i.e. the
    # real ProverKernels construction, where round-3's NameError lived)
    assert any(k[0] == "FibonacciAIR" for k in pk._KERNEL_CACHE)


def test_bench_script_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_WORKLOAD="fib",
        # fib(5) pads to a 64-row trace: the smoke value is "bench.py runs
        # end-to-end and prints valid JSON", not "fib500 benches" — the
        # round-4 review flagged the fib500 variant (2 full compiles,
        # 1500 s budget) as the reason the fast tier took an hour
        BENCH_FIB_MAIN="5",
        BENCH_QUERIES="3",
        BENCH_GRINDING="1",
        BENCH_SKIP_NTT="1",
        BENCH_SKIP_SECONDARY="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert out.returncode == 0, f"bench.py failed:\n{out.stdout}\n{out.stderr}"
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] > 0 and rec["unit"] == "s", rec
    assert rec["trace_rows"] == 64, rec
