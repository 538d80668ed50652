"""Cairo1 CASM entrypoint execution + prove/verify (reference
run.rs:102-191 V1 arm; integration_tests.rs:148-151).

Uses the reference's compiled contract fixture read-only from
/root/reference (we cannot compile Cairo1 in this environment); skipped if
unavailable."""

import os

import pytest

from lambdaworks_cairo_prover_tpu.cairo.air import (
    generate_cairo_proof,
    verify_cairo_proof,
)
from lambdaworks_cairo_prover_tpu.cairo.casm import (
    CasmContractClass,
    run_casm_entrypoint,
)
from lambdaworks_cairo_prover_tpu.cairo.runner import (
    CairoVersion,
    generate_prover_args,
)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions

FIXTURE = "/root/reference/cairo_programs/cairo1/fibonacci_cairo1.casm"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference CASM fixture not mounted"
)


@pytest.fixture(scope="module")
def casm_bytes():
    with open(FIXTURE, "rb") as f:
        return f.read()


def test_casm_runs_and_uses_hints(casm_bytes):
    casm = CasmContractClass.from_json(casm_bytes)
    assert casm.entrypoints[0]["builtins"] == ["range_check"]
    assert casm.hints  # fixture relies on AllocSegment/TestLessThanOrEqual
    regs, memory, program_size, builtin_ranges = run_casm_entrypoint(casm)
    assert program_size == len(casm.bytecode)
    assert len(regs.rows) > 0
    # gas accounting writes range-check cells
    rng = builtin_ranges["range_check"]
    assert rng.stop > rng.start
    for addr in range(rng.start, rng.stop):
        v = memory.get(addr)
        assert v is not None and v < 2**128


def test_cairo1_prove_verify(casm_bytes):
    trace, pub = generate_prover_args(casm_bytes,
                                      cairo_version=CairoVersion.V1)
    options = ProofOptions.default_test_options()
    proof = generate_cairo_proof(trace, pub, options)
    assert verify_cairo_proof(proof, pub, options)
