"""Head-to-head: fused-stage Pallas NTT vs current dispatch on the real chip.

    python tools/bench_fused.py [log_n ...]
"""
import os
import sys
import time

# pin the "current" baseline to the four-step/stage-loop dispatch even when
# the fused path is opted in via env — otherwise the head-to-head would
# measure fused vs fused and the match check would be vacuous
os.environ["LCP_FUSED_NTT"] = "0"

import jax
import jax.numpy as jnp
import numpy as np

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field.params import P
from lambdaworks_cairo_prover_tpu.ntt import core as nttc
from lambdaworks_cairo_prover_tpu.ntt import fused


def timed(fn, reps=5):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def timed_iter(make_fn, k=4, reps=5):
    t0 = timed(make_fn(0), reps)
    tk = timed(make_fn(k), reps)
    return max(tk - t0, 1e-9) / k


def main():
    logs = [int(a) for a in sys.argv[1:]] or [20]
    for log_n in logs:
        n = 1 << log_n
        # non-periodic input: a periodic (tiled) input has zero spectrum at
        # 255/256 of positions, leaving most twiddle/index-map logic
        # untested by the match check below
        x = fd.powers(3, n)

        def make_cur(k):
            @jax.jit
            def f(a):
                for _ in range(k):
                    a = nttc.ntt(a)
                return a[:, :1]
            return lambda: f(x)

        def make_fused(k):
            @jax.jit
            def f(a):
                for _ in range(k):
                    a = fused.ntt_fused(a, log_n, False)
                return a[:, :1]
            return lambda: f(x)

        # correctness first: one transform, compare against current path
        got = np.asarray(jax.jit(
            lambda a: fused.ntt_fused(a, log_n, False))(x))
        want = np.asarray(jax.jit(lambda a: nttc.ntt(a))(x))
        ok = bool((got == want).all())
        t_cur = timed_iter(make_cur)
        t_fused = timed_iter(make_fused)
        print(f"2^{log_n}: match={ok}  current {n/t_cur/1e6:8.2f} Mpts/s"
              f"  fused {n/t_fused/1e6:8.2f} Mpts/s"
              f"  speedup {t_cur/t_fused:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
