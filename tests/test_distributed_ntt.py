"""Four-step domain-sharded NTT vs the single-device transform on the
virtual 8-device CPU mesh (the all-to-all transpose plan of SURVEY §5)."""

import random

import jax
import jax.numpy as jnp
import pytest

from lambdaworks_cairo_prover_tpu.field import device as fd
from lambdaworks_cairo_prover_tpu.field.params import P
from lambdaworks_cairo_prover_tpu.ntt import core as nttc
from lambdaworks_cairo_prover_tpu.parallel.distributed_ntt import (
    distributed_ntt,
)
from lambdaworks_cairo_prover_tpu.parallel.sharding import make_mesh

rng = random.Random(21)


def _cpu_devices():
    try:
        return jax.devices("cpu")
    except RuntimeError:
        return []


@pytest.mark.parametrize("log_n", [10, 12])
def test_distributed_matches_single_device(log_n):
    if len(_cpu_devices()) < 8:
        pytest.skip("needs the 8-device test mesh")
    n = 1 << log_n
    vals = [rng.randrange(P) for _ in range(n)]
    x = jnp.asarray(fd.from_ints(vals))
    mesh = make_mesh(8, devices=_cpu_devices())
    got = distributed_ntt(mesh, x)
    want = nttc.ntt(x)
    assert fd.to_ints(got) == fd.to_ints(want)
