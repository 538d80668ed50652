"""Benchmark driver: proves a Cairo fibonacci trace end-to-end on the
available accelerator and prints one JSON line.

Metric: prover wall time for the fib(N) Cairo0 workload (the reference's
criterion_prover benchmark shape, benches/criterion_prover.rs).  The
reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against the recorded target of 1.0 until a measured Rust baseline exists.

Env knobs: BENCH_FIB (default 500), BENCH_QUERIES, BENCH_BLOWUP,
BENCH_GRINDING.
"""

import json
import os
import sys
import time


def main():
    fib_n = int(os.environ.get("BENCH_FIB", "500"))

    from lambdaworks_cairo_prover_tpu.cairo.air import (
        generate_cairo_proof,
        verify_cairo_proof,
    )
    from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
    from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
    from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions

    options = ProofOptions(
        blowup_factor=int(os.environ.get("BENCH_BLOWUP", "4")),
        fri_number_of_queries=int(os.environ.get("BENCH_QUERIES", "3")),
        coset_offset=3,
        grinding_factor=int(os.environ.get("BENCH_GRINDING", "1")),
    )

    main_trace, pub_inputs = generate_prover_args(fibonacci_program(fib_n))

    # warmup (compiles)
    proof = generate_cairo_proof(main_trace, pub_inputs, options)
    ok = verify_cairo_proof(proof, pub_inputs, options)
    if not ok:
        print(json.dumps({"metric": "prover_fib_wall_time", "value": -1,
                          "unit": "s", "vs_baseline": 0.0}))
        sys.exit(1)

    t0 = time.perf_counter()
    proof2 = generate_cairo_proof(main_trace, pub_inputs, options)
    elapsed = time.perf_counter() - t0
    if os.environ.get("LCP_DEBUG_KERNELS") == "1":
        timings = getattr(proof2, "_timings", {})
        print({k: round(v, 3) for k, v in timings.items()}, file=sys.stderr)

    print(json.dumps({
        "metric": f"prover_cairo_fib{fib_n}_wall_time",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
