"""Multi-process `jax.distributed` prover test (SURVEY §4 "missing tier";
VERDICT r1 item 6): two processes x 4 virtual CPU devices each form a
global 8-device mesh; the domain-sharded prover's collectives cross the
process boundary through the Gloo backend (the CPU stand-in for the
DCN/ICI path), and the proof bytes must equal the single-process,
single-device proof."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(
    not os.environ.get("LCP_MULTIPROC", "1") == "1",
    reason="disabled via LCP_MULTIPROC=0",
)
def test_two_process_prove_matches_single(tmp_path):
    from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
        FibonacciAIR,
        FibonacciPublicInputs,
        fibonacci_trace,
    )
    from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
    from lambdaworks_cairo_prover_tpu.proof.serde import serialize_proof
    from lambdaworks_cairo_prover_tpu.prover.prove import prove

    # single-process reference bytes (in-process, current backend)
    pub = FibonacciPublicInputs(a0=1, a1=1)
    options = ProofOptions.default_test_options()
    proof_single = prove(fibonacci_trace([1, 1], 256), pub, options,
                         FibonacciAIR)
    single_bytes = serialize_proof(proof_single)

    worker = os.path.join(os.path.dirname(__file__), "mp_prove_worker.py")
    out = tmp_path / "mp_proof.bin"
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            outputs.append(p.communicate(timeout=900)[0])
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process prove timed out:\n"
                    + "\n".join(o or "" for o in outputs))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"process {i} failed:\n{outputs[i][-4000:]}"
        )
    assert out.read_bytes() == single_bytes
