"""Worker for tests/test_multiprocess.py: one process of a 2-process
`jax.distributed` CPU cluster (4 virtual devices each), proving over the
global 8-device mesh with the domain-sharded prover.

Usage: python mp_prove_worker.py <process_id> <coordinator_port> <out_file>
Process 0 writes the serialized proof bytes to <out_file>.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (  # noqa: E402
    FibonacciAIR,
    FibonacciPublicInputs,
    fibonacci_trace,
)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions  # noqa: E402
from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof  # noqa: E402
from lambdaworks_cairo_prover_tpu.prover.prove import prove  # noqa: E402
from lambdaworks_cairo_prover_tpu.verifier.verify import verify  # noqa: E402

cpus = jax.devices("cpu")
assert len(cpus) == 8, f"expected 8 global cpu devices, got {len(cpus)}"
mesh = Mesh(np.array(cpus), ("dom",))

trace = fibonacci_trace([1, 1], 256)
pub = FibonacciPublicInputs(a0=1, a1=1)
options = ProofOptions.default_test_options()
proof = prove(trace, pub, options, FibonacciAIR, mesh=mesh,
              shard_axis="domain")
assert verify(proof, pub, options, FibonacciAIR)
data = serialize_proof(proof)
if pid == 0:
    with open(out, "wb") as f:
        f.write(data)
print(f"[{pid}] proof bytes: {len(data)}", flush=True)
