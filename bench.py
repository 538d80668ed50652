"""Benchmark driver: proves the BASELINE.json workloads end-to-end on the
available accelerator and prints ONE JSON line.

Headline metric = the north-star workload: Cairo0 fibonacci(70000), whose
padded main trace is 2^19 rows — the exact trace_length (524288) carried by
the reference's own golden proof benches/proofs/fibonacci_70000.proof and
the criterion_prover_70k.rs:16-58 workload.  Config matches the reference's
criterion benches (`Provable80Bits`, options.rs:55-60): blowup 4, 80 FRI
queries, grinding 20, coset offset 3.  The reference publishes no numbers
(BASELINE.md), so vs_baseline stays 1.0 until a measured Rust baseline
exists.

The single JSON line carries every BASELINE.json metric.  Timing protocol
(round-5 hygiene): `value` = WARM prover wall (second prove, compile
excluded — the reference's criterion scoping, criterion_prover_70k.rs:49-56);
`first_prove_s` = COLD (compile + first prove); `trace_gen_s` = warm trace
build, `trace_gen_cold_s` = first build including ingest-kernel compiles.
  value                     warm prover wall time (s), fib(70000) @ 2^19 rows
  verifier_s                verifier wall time (s) on that proof
  round_fractions           per-round time fractions (prover.rs:718-729 parity)
  workloads                 secondary configs: fib500 (config 1), rc 2^16
                            (config 3), cairo1 contract (config 4)
  ntt_points_per_sec_chip   forward-NTT throughput microbenchmark
  ntt_scaling               multi-device efficiency (None on 1-chip hosts)

Env knobs: BENCH_WORKLOAD (all | fib | rc | cairo1, default all; `fib`
restricts to the two fib configs), BENCH_FIB (secondary fib size, default
500), BENCH_FIB_MAIN (headline fib size, default 70000), BENCH_RC_LOG2
(default 16), BENCH_QUERIES (80), BENCH_BLOWUP (4), BENCH_GRINDING (20),
BENCH_NTT_LOG2 (20), BENCH_SKIP_NTT=1, BENCH_SKIP_SECONDARY=1.
"""

import json
import os
import sys
import time


def _ntt_points_per_sec(log2n: int) -> float:
    """Forward-NTT throughput on a (16, n) limb tensor (BASELINE.md metric:
    NTT points/sec/chip).

    The tunneled axon backend costs ~25 ms per dispatch+readback round
    trip, which would swamp the kernel; K data-dependent transforms are
    chained inside ONE jitted program and the zero-iteration latency is
    subtracted.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lambdaworks_cairo_prover_tpu.ntt import core as nttc

    n = 1 << log2n
    # non-periodic input: random 16-bit limbs, top limb masked so every
    # value is a valid felt (a tiled/periodic input can understate memory
    # behavior — advisor finding, round 3/4)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint16)
    raw = raw.astype(np.uint32)
    raw[15] &= 0x3FF
    x = jnp.asarray(raw)

    def make(k):
        @jax.jit
        def f(a):
            for _ in range(k):
                a = nttc.ntt(a)
            return a[:, :1]
        return lambda: f(x)

    def timed(fn, reps=5):
        np.asarray(fn())  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    k = 4
    t0 = timed(make(0))
    tk = timed(make(k))
    return n / max((tk - t0) / k, 1e-9)


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


def _keccak_selfcheck() -> bool:
    """Device keccak vs host keccak on one odd sub-tile batch — re-runs the
    TPU-only corruption-workaround check (hash/keccak_device.py small-batch
    pad) every bench round instead of only behind LCP_TPU_TESTS."""
    import jax.numpy as jnp
    import numpy as np

    from lambdaworks_cairo_prover_tpu.field import device as fd
    from lambdaworks_cairo_prover_tpu.field.params import P
    from lambdaworks_cairo_prover_tpu.hash import keccak_device as kd
    from lambdaworks_cairo_prover_tpu.hash.keccak_host import keccak256

    vals = [pow(7, i + 1, P) for i in range(7)]  # odd small batch
    limbs = jnp.asarray(fd.from_ints(vals, mont=False))
    got = np.asarray(kd.hash_felt_leaves(limbs))
    want = [keccak256(v.to_bytes(32, "big")) for v in vals]
    return all(kd.digest_to_bytes(g) == w for g, w in zip(got, want))


def _fib_workload(n: int):
    from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program
    from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args

    trace, pub = generate_prover_args(fibonacci_program(n))
    return trace, pub, f"fib{n}"


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


def _prove_workload(build, options):
    """Build the trace, prove (compile+warm), verify, then time a second
    prove and a verify.  Returns a per-workload result dict."""
    from lambdaworks_cairo_prover_tpu.cairo.air import (
        generate_cairo_proof,
        verify_cairo_proof,
    )
    from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof

    t0 = time.perf_counter()
    main_trace, pub_inputs, tag = build()
    trace_gen_cold_s = time.perf_counter() - t0

    # warm trace build: same protocol as the prover below (the cold number
    # includes one-time jit compiles of the ingest kernels; both recorded)
    t0 = time.perf_counter()
    main_trace, pub_inputs, _ = build()
    trace_gen_s = time.perf_counter() - t0

    # first prove compiles; recorded as first_prove_s (cold)
    t0 = time.perf_counter()
    proof = generate_cairo_proof(main_trace, pub_inputs, options)
    first_prove_s = time.perf_counter() - t0
    if not verify_cairo_proof(proof, pub_inputs, options):
        return {"tag": tag, "error": "verification failed"}

    t0 = time.perf_counter()
    proof2 = generate_cairo_proof(main_trace, pub_inputs, options)
    prove_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    verify_cairo_proof(proof2, pub_inputs, options)
    verify_s = time.perf_counter() - t0

    timings = getattr(proof2, "_timings", {})
    total = sum(v for k, v in timings.items() if k.startswith("round")
                and k[5:6].isdigit() and len(k) == 6) or None
    fractions = None
    if total:
        fractions = {k: round(timings[k] / total, 4)
                     for k in ("round0", "round1", "round2", "round3",
                               "round4") if k in timings}
    return {
        "tag": tag,
        "value": round(prove_s, 4),              # warm prove (compile excl.)
        "first_prove_s": round(first_prove_s, 4),  # cold: compile + prove
        "verifier_s": round(verify_s, 4),
        "proof_size_bytes": len(serialize_proof(proof2)),
        "trace_rows": main_trace.n_rows,
        "trace_gen_s": round(trace_gen_s, 4),    # warm trace build
        "trace_gen_cold_s": round(trace_gen_cold_s, 4),
        "round_fractions": fractions,
    }


def main():
    workload = os.environ.get("BENCH_WORKLOAD", "all")
    fib_main = int(os.environ.get("BENCH_FIB_MAIN", "70000"))
    fib_small = int(os.environ.get("BENCH_FIB", "500"))

    from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions

    # reference bench config: Provable80Bits (options.rs:55-60)
    options = ProofOptions(
        blowup_factor=int(os.environ.get("BENCH_BLOWUP", "4")),
        fri_number_of_queries=int(os.environ.get("BENCH_QUERIES", "80")),
        coset_offset=3,
        grinding_factor=int(os.environ.get("BENCH_GRINDING", "20")),
    )

    # headline first so a later workload failure can't lose it; secondary
    # configs are optional extras recorded under "workloads"
    if workload in ("all", "fib"):
        headline = lambda: _fib_workload(fib_main)  # noqa: E731
        secondary = [lambda: _fib_workload(fib_small)]
        if workload == "all":
            secondary += [
                lambda: _rc_workload(int(os.environ.get("BENCH_RC_LOG2",
                                                        "16"))),
                _cairo1_workload,
            ]
    elif workload == "rc":
        headline = lambda: _rc_workload(  # noqa: E731
            int(os.environ.get("BENCH_RC_LOG2", "16")))
        secondary = []
    elif workload == "cairo1":
        headline = _cairo1_workload
        secondary = []
    else:
        print(json.dumps({"metric": "error", "value": -1, "unit": "s",
                          "vs_baseline": 0.0,
                          "error": f"unknown BENCH_WORKLOAD {workload}"}))
        sys.exit(2)

    if not _keccak_selfcheck():
        print(json.dumps({"metric": "keccak_device_selfcheck", "value": -1,
                          "unit": "s", "vs_baseline": 0.0,
                          "error": "device keccak != host keccak"}))
        sys.exit(1)

    main_res = _prove_workload(headline, options)
    if "error" in main_res:
        print(json.dumps({"metric": f"prover_cairo_{main_res['tag']}",
                          "value": -1, "unit": "s", "vs_baseline": 0.0,
                          "error": main_res["error"]}))
        sys.exit(1)

    result = {
        "metric": (f"prover_cairo_{main_res['tag']}_wall_time_"
                   f"{options.fri_number_of_queries}q_"
                   f"g{options.grinding_factor}"),
        "value": main_res["value"],
        "unit": "s",
        "vs_baseline": 1.0,
        "first_prove_s": main_res["first_prove_s"],
        "verifier_s": main_res["verifier_s"],
        "proof_size_bytes": main_res["proof_size_bytes"],
        "trace_rows": main_res["trace_rows"],
        "trace_gen_s": main_res["trace_gen_s"],
        "trace_gen_cold_s": main_res["trace_gen_cold_s"],
        "round_fractions": main_res["round_fractions"],
        "queries": options.fri_number_of_queries,
        "grinding_factor": options.grinding_factor,
    }

    if os.environ.get("BENCH_SKIP_SECONDARY") != "1":
        extras = {}
        for build in secondary:
            try:
                res = _prove_workload(build, options)
                extras[res.pop("tag")] = res
            except Exception as e:  # record, never lose the headline
                extras[f"failed_{len(extras)}"] = {
                    "error": f"{type(e).__name__}: {e}"}
        if extras:
            result["workloads"] = extras

    if os.environ.get("BENCH_SKIP_NTT") != "1":
        log2n = int(os.environ.get("BENCH_NTT_LOG2", "20"))
        try:
            result["ntt_points_per_sec_chip"] = round(
                _ntt_points_per_sec(log2n))
            result["ntt_log2_size"] = log2n
            scaling = _scaling_efficiency(log2n)
            if scaling is not None:
                result["ntt_scaling"] = scaling
        except Exception as e:
            result["ntt_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(result))


if __name__ == "__main__":
    main()
