"""Prove directly from cairo-vm binary trace/memory files (reference fixture
tests/data/mul_{trace,mem}.out) — the real cross-implementation input path
(register_states.rs:51-78 / cairo_mem.rs:35-61 formats)."""

from lambdaworks_cairo_prover_tpu.cairo.air import (
    generate_cairo_proof,
    verify_cairo_proof,
)
from lambdaworks_cairo_prover_tpu.cairo.runner import (
    generate_prover_args_from_trace_files,
)
from lambdaworks_cairo_prover_tpu.cairo.register_states import RegisterStates
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions

REF_DATA = "/root/reference/tests/data"


def test_prove_from_cairo_vm_fixture():
    # infer program size from the initial ap: exec segment starts right after
    # the program; initial ap = program_size + 1 (exec base) + 2 (stack)
    regs = RegisterStates.from_file(f"{REF_DATA}/mul_trace.out")
    program_size = regs.rows[0].ap - 3

    main_trace, pub_inputs = generate_prover_args_from_trace_files(
        f"{REF_DATA}/mul_trace.out", f"{REF_DATA}/mul_mem.out", program_size
    )
    assert pub_inputs.pc_init == 1
    options = ProofOptions.default_test_options()
    proof = generate_cairo_proof(main_trace, pub_inputs, options)
    assert verify_cairo_proof(proof, pub_inputs, options)
