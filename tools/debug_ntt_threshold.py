"""Measure flat vs four-step NTT wall time on the real TPU per size to
pick FOUR_STEP_MIN_LOG (ntt/core.py).  Run: python tools/debug_ntt_threshold.py
[min_log max_log].  Flat at 2^20+ may HBM-OOM — sizes run in increasing
order, flat first, each in a try/except."""

import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from lambdaworks_cairo_prover_tpu.field import device as fd  # noqa: E402
from lambdaworks_cairo_prover_tpu.field.params import P  # noqa: E402
from lambdaworks_cairo_prover_tpu.ntt import core as nttc  # noqa: E402


def timed(fn, *args, reps=3):
    np.asarray(fn(*args)[:, :1])  # compile + warm (forced readback)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[:, :1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    base = jnp.asarray(fd.from_ints([pow(3, i, P) for i in range(256)]))
    for log_n in range(lo, hi + 1):
        n = 1 << log_n
        x = jnp.tile(base, (1, n // 256))
        row = [f"2^{log_n}"]
        for name in ("flat", "four"):
            try:
                if name == "flat":
                    t = timed(nttc._ntt_impl, x,
                              nttc._stage_twiddles(log_n, False), log_n)
                else:
                    logr, logc = nttc.four_factors(log_n)
                    t = timed(
                        nttc._ntt_four_impl, x,
                        nttc._stage_twiddles(logr, False),
                        nttc._stage_twiddles(logc, False),
                        nttc._four_table(log_n, False), log_n,
                    )
                row.append(f"{name}={t*1e3:.1f}ms ({n/t/1e6:.0f}Mpts/s)")
            except Exception as e:  # noqa: BLE001
                row.append(f"{name}=FAIL({type(e).__name__})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
