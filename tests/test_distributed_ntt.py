"""Four-step domain-sharded NTT (parallel/four_step.py::ShardedNTT) vs the
single-device transform on the virtual 8-device CPU mesh (the all-to-all
transpose plan of SURVEY §5)."""

import random

import jax
import jax.numpy as jnp
import pytest

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field.params import P
from lambdaworks_cairo_prover_tpu.ntt import core as nttc
from lambdaworks_cairo_prover_tpu.parallel.four_step import ShardedNTT
from lambdaworks_cairo_prover_tpu.parallel.sharding import make_mesh

rng = random.Random(21)


def _cpu_devices():
    try:
        return jax.devices("cpu")
    except RuntimeError:
        return []


@pytest.mark.parametrize("log_n", [10, 12])
@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_matches_single_device(log_n, inverse):
    if len(_cpu_devices()) < 8:
        pytest.skip("needs the 8-device test mesh")
    n = 1 << log_n
    vals = [rng.randrange(P) for _ in range(n)]
    x = jnp.asarray(fd.from_ints(vals)).reshape(16, 1, n)
    mesh = make_mesh(8, devices=_cpu_devices())
    sntt = ShardedNTT(mesh)
    got = sntt.transform(sntt.shard(x), inverse=inverse)
    want = nttc.ntt(x) if not inverse else nttc._ntt_dispatch(
        x, log_n, inverse=True)
    assert fd.to_ints(got.reshape(16, n)) == fd.to_ints(want.reshape(16, n))
