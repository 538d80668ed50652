"""Debug: fibonacci prove + step-by-step verify diagnostics."""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_default_device', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
import time

t0 = time.time()
def log(msg):
    print(f'[{time.time()-t0:6.1f}] {msg}', flush=True)

from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
    FibonacciAIR, FibonacciPublicInputs, fibonacci_trace)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.prove import prove
from lambdaworks_cairo_prover_tpu.prover.domain import Domain
from lambdaworks_cairo_prover_tpu.transcript import DefaultTranscript
from lambdaworks_cairo_prover_tpu.verifier import verify as V

trace = fibonacci_trace([1, 1], 8)
pub = FibonacciPublicInputs(1, 1)
opts = ProofOptions.default_test_options()
air = FibonacciAIR(8, pub, opts)

log('proving...')
proof = prove(trace, pub, opts, FibonacciAIR)
log(f'timings: { {k: round(v,1) for k,v in proof._timings.items()} }')

domain = Domain(air)
transcript = DefaultTranscript()
ch = V._step_1_replay_rounds(air, proof, domain, transcript)
log(f'grinding ok: {ch.leading_zeros_count >= opts.grinding_factor}')
log(f'step2 (composition): {V._step_2_verify_composition_poly(air, proof, domain, ch)}')
log(f'step3 (fri): {V._step_3_verify_fri(proof, domain, ch)}')
log(f'step4 (deep): {V._step_4_verify_deep_composition(air, proof, domain, ch)}')
