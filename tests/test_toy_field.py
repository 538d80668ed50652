"""Engine genericity over a toy field (reference analog: the generic
STARK engine is tested over a 17-element field,
tests/integration_tests.rs:56-77).

GF(257) has q - 1 = 2^8, so the whole NTT/LDE/FRI pipeline works with every
intermediate value small enough to check by hand.  The field is selected by
``LCP_FIELD`` at import time (limb tables and twiddle caches are
process-wide), so the e2e prove runs in a subprocess."""

import os
import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["LCP_FIELD"] = "f257"
os.environ["JAX_PLATFORMS"] = "cpu"

from lambdaworks_cairo_prover_tpu.field.params import P, TWO_ADICITY
assert P == 257 and TWO_ADICITY == 8

# value-level sanity of the generic Montgomery path
from lambdaworks_cairo_prover_tpu.field import device as fd
import jax.numpy as jnp
a = jnp.asarray(fd.from_ints([5, 100, 256, 0]))
b = jnp.asarray(fd.from_ints([7, 200, 256, 123]))
got = fd.to_ints(fd.mul(a, b))
assert got == [35, 100 * 200 % 257, 256 * 256 % 257, 0], got

# NTT roundtrip at the full 2-adicity
from lambdaworks_cairo_prover_tpu.ntt import core as nttc
vals = list(range(1, 17))
x = jnp.asarray(fd.from_ints(vals))
back = fd.to_ints(nttc.intt(nttc.ntt(x)))
assert back == vals, back

# end-to-end prove + verify on the simple-Fibonacci AIR
from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
    FibonacciAIR, FibonacciPublicInputs, fibonacci_trace)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.prove import prove
from lambdaworks_cairo_prover_tpu.verifier.verify import verify

trace = fibonacci_trace([1, 1], 8)
pub = FibonacciPublicInputs(a0=1, a1=1)
options = ProofOptions.default_test_options()  # blowup 4 -> LDE 32 <= 256
proof = prove(trace, pub, options, FibonacciAIR)
assert verify(proof, pub, options, FibonacciAIR)

# soundness: wrong public inputs must fail over the toy field too
assert not verify(proof, FibonacciPublicInputs(a0=2, a1=1), options,
                  FibonacciAIR)
print("TOY_FIELD_OK")
"""


def test_f257_end_to_end():
    env = dict(os.environ)
    env.pop("LCP_FIELD", None)
    out = subprocess.run([sys.executable, "-c", _SCRIPT],
                         capture_output=True, text=True, timeout=900,
                         env=env)
    assert out.returncode == 0, f"{out.stdout}\n{out.stderr}"
    assert "TOY_FIELD_OK" in out.stdout
