"""Benchmark driver: proves a Cairo fibonacci trace end-to-end on the
available accelerator and prints ONE JSON line.

Default config matches the reference's criterion_prover benchmark exactly
(benches/criterion_prover.rs + options.rs:55-60): `Provable80Bits` =
blowup 4, 80 FRI queries, grinding factor 20, coset offset 3.  The
reference publishes no numbers (BASELINE.md), so vs_baseline stays 1.0
until a measured Rust baseline exists.

The single JSON line carries the three BASELINE.json metrics:
  value            prover wall time (s) for the fib(N) Cairo0 workload
  verifier_s       verifier wall time (s) on the produced proof
  ntt_points_per_sec_chip   forward-NTT throughput microbenchmark
  proof_size_bytes serialized proof size

Env knobs: BENCH_WORKLOAD (fib | rc | cairo1, default fib), BENCH_FIB
(default 500), BENCH_RC_LOG2 (default 16 — BASELINE config 3: range-check
builtin trace padded to 2^16 rows), BENCH_QUERIES (80), BENCH_BLOWUP (4),
BENCH_GRINDING (20), BENCH_NTT_LOG2 (20), BENCH_SKIP_NTT=1.
"""

import json
import os
import sys
import time


def _ntt_points_per_sec(log2n: int) -> float:
    """Forward-NTT throughput on a (16, n) limb tensor (BASELINE.md metric:
    NTT points/sec/chip)."""
    import jax.numpy as jnp
    import numpy as np

    from lambdaworks_cairo_prover_tpu.field import device as fd
    from lambdaworks_cairo_prover_tpu.field.params import P
    from lambdaworks_cairo_prover_tpu.ntt import core as nttc

    n = 1 << log2n
    x = jnp.asarray(fd.from_ints([pow(3, i, P) for i in range(256)]))
    x = jnp.tile(x, (1, n // 256))
    np.asarray(nttc.ntt(x)[:, :1])  # compile + warm
    # NOTE: block_until_ready does NOT wait for completion on the tunneled
    # axon platform; a tiny readback per rep forces real completion (device
    # programs execute in launch order).
    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(nttc.ntt(x)[:, :1])
        times.append(time.perf_counter() - t0)
    return n / min(times)


def _scaling_efficiency(log2n: int):
    """Multi-chip NTT scaling efficiency (BASELINE.md metric: >80% at N>=2).

    Runs the four-step distributed NTT over a mesh of ALL visible devices
    and compares against the single-device transform:
    efficiency = T_1 / (D * T_D).  Returns None on single-device hosts
    (this environment tunnels exactly one TPU chip; the sharded path is
    still exercised for correctness on the virtual CPU mesh in tests/).
    """
    import jax
    import numpy as np

    devs = jax.devices()
    if len(devs) < 2:
        return None
    import jax.numpy as jnp

    from lambdaworks_cairo_prover_tpu.field import device as fd
    from lambdaworks_cairo_prover_tpu.field.params import P
    from lambdaworks_cairo_prover_tpu.ntt import core as nttc
    from lambdaworks_cairo_prover_tpu.parallel.four_step import ShardedNTT
    from lambdaworks_cairo_prover_tpu.parallel.sharding import make_mesh

    n = 1 << log2n
    x = jnp.asarray(fd.from_ints([pow(3, i, P) for i in range(256)]))
    x = jnp.tile(x, (1, n // 256))

    def timed(fn):
        np.asarray(fn()[:, :1])  # compile + warm (forced readback)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn()[:, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(lambda: nttc.ntt(x))
    mesh = make_mesh(len(devs))
    sntt = ShardedNTT(mesh)
    xs = sntt.shard(x)
    td = timed(lambda: sntt.transform(xs, inverse=False))
    return {
        "n_devices": len(devs),
        "t_single_s": round(t1, 5),
        "t_sharded_s": round(td, 5),
        "efficiency": round(t1 / (len(devs) * td), 4),
    }


def _rc_workload(log2_rows: int):
    """BASELINE config 3: a range-check-builtin Cairo0 program whose padded
    main trace has 2**log2_rows rows.  Calibrates the value count against
    the VM's measured rows-per-value (each value costs a fixed instruction
    block, see cairo/programs.py::rc_program) and aims for 95% of the
    target so pow-2 padding lands exactly on it."""
    from lambdaworks_cairo_prover_tpu.cairo import native as native_vm
    from lambdaworks_cairo_prover_tpu.cairo.programs import rc_program
    from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
    from lambdaworks_cairo_prover_tpu.cairo.vm import run_program

    runner = (native_vm.run_program_native if native_vm.available()
              else run_program)

    def prepad_rows(k):
        """VM steps + public-memory dummy rows ((program_size >> 2) + 1,
        execution_trace.py::add_pub_memory_dummy_accesses) — the pre-pad
        row count up to a handful of memory-hole fill rows."""
        prog = rc_program(tuple((i * 7919 + 1) % (1 << 100)
                                for i in range(k)))
        regs, _, program_size, _ = runner(prog)
        return len(regs.rows) + (program_size >> 2) + 1, prog

    t16, _ = prepad_rows(16)
    t64, _ = prepad_rows(64)
    slope = (t64 - t16) / 48.0
    base = t16 - slope * 16
    target = 1 << log2_rows
    k = max(1, int((0.95 * target - base) / slope))
    for _ in range(4):
        prog = rc_program(tuple((i * 7919 + 1) % (1 << 100)
                                for i in range(k)))
        trace, pub = generate_prover_args(prog)
        if trace.n_rows == target:
            break
        # padding missed the power-of-two target: nudge k and rebuild
        factor = 0.7 if trace.n_rows > target else 1.4
        k = max(1, int(k * factor))
    # tag reports the ACTUAL padded size so a calibration miss can never
    # mislabel the recorded metric
    return trace, pub, f"rc_2^{trace.n_rows.bit_length() - 1}"


def _cairo1_workload():
    """BASELINE config 4: a compiled Cairo1 contract (hint-bearing,
    range-check gas accounting).  BENCH_CASM overrides the fixture path."""
    from lambdaworks_cairo_prover_tpu.cairo.runner import (
        CairoVersion,
        generate_prover_args,
    )

    fixture = os.environ.get(
        "BENCH_CASM",
        "/root/reference/cairo_programs/cairo1/fibonacci_cairo1.casm")
    with open(fixture, "rb") as f:
        casm_bytes = f.read()
    trace, pub = generate_prover_args(casm_bytes,
                                      cairo_version=CairoVersion.V1)
    return trace, pub, "cairo1_fib"


def main():
    fib_n = int(os.environ.get("BENCH_FIB", "500"))
    workload = os.environ.get("BENCH_WORKLOAD", "fib")

    from lambdaworks_cairo_prover_tpu.cairo.air import (
        generate_cairo_proof,
        verify_cairo_proof,
    )
    from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
    from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
    from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
    from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof

    # reference bench config: Provable80Bits (options.rs:55-60)
    options = ProofOptions(
        blowup_factor=int(os.environ.get("BENCH_BLOWUP", "4")),
        fri_number_of_queries=int(os.environ.get("BENCH_QUERIES", "80")),
        coset_offset=3,
        grinding_factor=int(os.environ.get("BENCH_GRINDING", "20")),
    )

    if workload == "rc":
        main_trace, pub_inputs, tag = _rc_workload(
            int(os.environ.get("BENCH_RC_LOG2", "16")))
    elif workload == "cairo1":
        main_trace, pub_inputs, tag = _cairo1_workload()
    else:
        main_trace, pub_inputs = generate_prover_args(
            fibonacci_program(fib_n))
        tag = f"fib{fib_n}"

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

    t0 = time.perf_counter()
    verify_cairo_proof(proof2, pub_inputs, options)
    verifier_elapsed = time.perf_counter() - t0

    result = {
        "metric": (f"prover_cairo_{tag}_wall_time_"
                   f"{options.fri_number_of_queries}q_"
                   f"g{options.grinding_factor}"),
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": 1.0,
        "verifier_s": round(verifier_elapsed, 4),
        "proof_size_bytes": len(serialize_proof(proof2)),
        "trace_rows": main_trace.n_rows,
        "queries": options.fri_number_of_queries,
        "grinding_factor": options.grinding_factor,
    }
    if os.environ.get("BENCH_SKIP_NTT") != "1":
        log2n = int(os.environ.get("BENCH_NTT_LOG2", "20"))
        result["ntt_points_per_sec_chip"] = round(_ntt_points_per_sec(log2n))
        result["ntt_log2_size"] = log2n
        scaling = _scaling_efficiency(log2n)
        if scaling is not None:
            result["ntt_scaling"] = scaling

    print(json.dumps(result))


if __name__ == "__main__":
    main()
