"""TPU numerical check: field/NTT/keccak primitives vs host ints at various shapes."""
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:6.1f}] {m}", flush=True)


log(f"devices: {jax.devices()}")

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field.params import P, get_primitive_root_of_unity
from lambdaworks_cairo_prover_tpu.ntt import core as nttc
from lambdaworks_cairo_prover_tpu.hash import keccak_device as kd
from lambdaworks_cairo_prover_tpu.hash.keccak_host import keccak256

rng = random.Random(5)

for n in [64, 256, 1024, 4096]:
    vals_a = [rng.randrange(P) for _ in range(n)]
    vals_b = [rng.randrange(P) for _ in range(n)]
    a = jnp.asarray(fd.from_ints(vals_a))
    b = jnp.asarray(fd.from_ints(vals_b))
    got = fd.to_ints(jax.jit(fd.mul)(a, b))
    ok = all(g == x * y % P for g, x, y in zip(got, vals_a, vals_b))
    log(f"mul n={n}: {ok}")
    got_add = fd.to_ints(jax.jit(fd.add)(a, b))
    ok = all(g == (x + y) % P for g, x, y in zip(got_add, vals_a, vals_b))
    log(f"add n={n}: {ok}")

for logn in [6, 10, 12]:
    n = 1 << logn
    vals = [rng.randrange(P) for _ in range(n)]
    arr = jnp.asarray(fd.from_ints(vals))
    coeffs = nttc.intt(arr)
    back = nttc.ntt(coeffs)
    ok = fd.to_ints(back) == vals
    log(f"ntt roundtrip n={n}: {ok}")
    # spot check one evaluation vs host
    cints = fd.to_ints(coeffs)
    w = get_primitive_root_of_unity(logn)
    x = pow(w, 7, P)
    expect = 0
    for c in reversed(cints):
        expect = (expect * x + c) % P
    log(f"ntt value check n={n}: {fd.to_ints(back)[7] == expect}")

for n in [64, 4096]:
    vals = [rng.randrange(P) for _ in range(2 * n)]
    arr = jnp.asarray(fd.from_ints(vals, mont=False)).reshape(16, n, 2)
    digests = np.asarray(kd.hash_felt_rows(arr, 2))
    ok = True
    for i in [0, 1, n - 1, n // 2]:
        expect = keccak256(
            vals[i * 2].to_bytes(32, "big") + vals[i * 2 + 1].to_bytes(32, "big")
        )
        if kd.digest_to_bytes(digests[i]) != expect:
            ok = False
    log(f"keccak rows n={n}: {ok}")

# batch inverse at size like deep kernel uses
n = 4096 * 3
vals = [rng.randrange(1, P) for _ in range(n)]
arr = jnp.asarray(fd.from_ints(vals))
got = fd.to_ints(jax.jit(fd.batch_inverse)(arr))
ok = all(g == pow(v, P - 2, P) for g, v in zip(got[:100], vals[:100]))
log(f"batch_inverse n={n}: {ok}")
