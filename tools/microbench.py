"""Microbenchmarks for the TPU primitives that bound NTT throughput.

Run on the real chip to ground kernel design decisions:
  python tools/microbench.py [names...]

Measures (all warm, min-of-5, forced completion via tiny readback):
  pallas_mul      fused Montgomery modmul (field/pallas_mul.py)
  u32_mul         raw XLA u32 elementwise multiply
  u16_mul         raw XLA u32 multiply of <2^16 values
  bf16_matmul     MXU bf16 x bf16 -> f32
  int8_matmul     MXU int8 x int8 -> int32
  f32_matmul      MXU f32 (default precision)
  ntt_2_20        current NTT end-to-end at 2^20
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


# The axon tunnel costs ~25 ms per dispatch+readback round trip; measuring
# any single kernel directly is hopeless.  Each benchmark therefore chains
# K data-dependent iterations of the op inside ONE jitted program and
# reports (t_K - t_0) / K, where t_0 is the same program with zero
# iterations (pure latency).

def timed(fn, reps=5):
    np.asarray(fn())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def timed_iter(make_fn, k=16, reps=5):
    """make_fn(k) -> jitted callable running k chained iterations.
    Returns seconds per iteration with tunnel latency subtracted."""
    t_base = timed(make_fn(0), reps)
    t_k = timed(make_fn(k), reps)
    return max(t_k - t_base, 1e-9) / k


def _fold(x):
    """In-graph XOR/sum fold to one element so XLA cannot dead-code the
    computation (a sliced output would let it compute 1 element)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return jax.lax.reduce(x, x.dtype.type(0), jax.lax.bitwise_xor,
                              tuple(range(x.ndim)))
    return jnp.sum(x)


def bench_pallas_mul():
    from lambdaworks_cairo_prover_tpu.field import device as fd
    from lambdaworks_cairo_prover_tpu.field import pallas_mul
    from lambdaworks_cairo_prover_tpu.field.params import P

    n = 1 << 20
    x = jnp.asarray(fd.from_ints([pow(3, i, P) for i in range(256)]))
    x = jnp.tile(x, (1, n // 256))
    def make(k):
        @jax.jit
        def f(a):
            for _ in range(k):
                a = pallas_mul.mul(a, a)
            return _fold(a)
        return lambda: f(x)

    t = timed_iter(make, k=16)
    print(f"pallas_mul: {n/t/1e6:.1f} M modmul/s  ({t*1e3:.3f} ms @ 2^20)")


def bench_u32_mul():
    n = 1 << 24
    x = jnp.arange(n, dtype=jnp.uint32).reshape(16, -1)

    def make(k):
        @jax.jit
        def f(a):
            for _ in range(k):
                a = a * a + jnp.uint32(1)
            return _fold(a)
        return lambda: f(x)

    t = timed_iter(make, k=64)
    print(f"u32_mul: {n/t/1e9:.2f} G mul/s  ({t*1e3:.3f} ms @ 2^24)")


def bench_u16_mul():
    n = 1 << 24
    x = jnp.arange(n, dtype=jnp.uint32).reshape(16, -1) & 0xFFFF

    def make(k):
        @jax.jit
        def f(a):
            for _ in range(k):
                a = (a * a + jnp.uint32(1)) & 0xFFFF
            return _fold(a)
        return lambda: f(x)

    t = timed_iter(make, k=64)
    print(f"u16_in_u32_mul: {n/t/1e9:.2f} G mul/s  ({t*1e3:.3f} ms @ 2^24)")


def _matmul_bench(dtype, acc, label, m=4096, k=4096, n=4096):
    a0 = jnp.ones((m, k), dtype=dtype)
    b = jnp.ones((k, n), dtype=dtype)

    def make(iters):
        @jax.jit
        def f(a, b):
            for _ in range(iters):
                c = jnp.dot(a, b, preferred_element_type=acc)
                # feed result back (cast keeps shapes/dtypes stable; the
                # clip keeps int8 in range / floats finite)
                a = jnp.clip(c, 0, 1).astype(dtype)
            return _fold(a)
        return lambda: f(a0, b)

    t = timed_iter(make, k=8)
    macs = m * k * n
    print(f"{label}: {macs/t/1e12:.1f} T MAC/s  ({t*1e3:.3f} ms {m}x{k}x{n})")


def bench_bf16_matmul():
    _matmul_bench(jnp.bfloat16, jnp.float32, "bf16_matmul")


def bench_int8_matmul():
    _matmul_bench(jnp.int8, jnp.int32, "int8_matmul")


def bench_f32_matmul():
    _matmul_bench(jnp.float32, jnp.float32, "f32_matmul")


def bench_ntt_2_20():
    from lambdaworks_cairo_prover_tpu.field import device as fd
    from lambdaworks_cairo_prover_tpu.field.params import P
    from lambdaworks_cairo_prover_tpu.ntt import core as nttc

    n = 1 << 20
    x = jnp.asarray(fd.from_ints([pow(3, i, P) for i in range(256)]))
    x = jnp.tile(x, (1, n // 256))
    def make(k):
        @jax.jit
        def f(a):
            for _ in range(k):
                a = nttc.ntt(a)
            return a[:, :1]
        return lambda: f(x)

    t = timed_iter(make, k=4)
    print(f"ntt_2_20: {n/t/1e6:.1f} M pts/s  ({t*1e3:.3f} ms)")


def bench_stack_reshape():
    n = 1 << 20
    x = jnp.zeros((16, n), dtype=jnp.uint32)

    def make(k):
        @jax.jit
        def f(x):
            for i in range(k):
                xv = x.reshape(16, -1, 2, 512)
                x = jnp.stack([xv[:, :, 0] + jnp.uint32(i), xv[:, :, 1]],
                              axis=2).reshape(16, n)
            return _fold(x)
        return lambda: f(x)

    t = timed_iter(make, k=32)
    gb = 16 * n * 4 * 2 / 1e9
    print(f"stack_reshape: {gb/t:.0f} GB/s  ({t*1e3:.3f} ms)")


ALL = {
    "pallas_mul": bench_pallas_mul,
    "u32_mul": bench_u32_mul,
    "u16_mul": bench_u16_mul,
    "bf16_matmul": bench_bf16_matmul,
    "int8_matmul": bench_int8_matmul,
    "f32_matmul": bench_f32_matmul,
    "ntt_2_20": bench_ntt_2_20,
    "stack_reshape": bench_stack_reshape,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for name in names:
        try:
            ALL[name]()
        except Exception as e:  # keep going; report what failed
            print(f"{name}: FAILED {type(e).__name__}: {e}")
