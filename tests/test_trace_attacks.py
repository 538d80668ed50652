"""Trace-tampering soundness tests (reference integration_tests.rs:243-338).

Unlike the proof-byte / public-input mutations in test_soundness.py, these
attacks mutate the *execution* itself — a changed range-check value, an
injected >2^128 range-check value, a changed output cell — prove the
malicious trace, and assert the verifier rejects.  This is the only test
class that exercises constraint soundness end-to-end.
"""

from lambdaworks_cairo_prover_tpu.air.trace import TraceTable
from lambdaworks_cairo_prover_tpu.cairo.air import (
    PublicInputs,
    generate_cairo_proof,
    verify_cairo_proof,
)
from lambdaworks_cairo_prover_tpu.cairo.execution_trace import (
    FRAME_DST,
    build_main_trace,
)
from lambdaworks_cairo_prover_tpu.cairo.programs import (
    output_program,
    rc_program,
)
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.cairo.vm import run_program
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions


def test_verifier_rejects_changed_range_check_value():
    """Change a range-checked value in the trace: the constraint asserting
    that the rc limb decomposition sums to the value no longer holds
    (integration_tests.rs:243-266)."""
    main_trace, pub_inputs = generate_prover_args(rc_program((250, 77, 1 << 100)))
    options = ProofOptions.default_test_options()

    cols = main_trace.to_int_columns()
    # last column = RC_VALUE (the range-checked felt); overwrite row 0
    cols[-1][0] = 35
    malicious_trace = TraceTable.from_int_columns(cols)

    proof = generate_cairo_proof(malicious_trace, pub_inputs, options)
    assert not verify_cairo_proof(proof, pub_inputs, options)


def test_verifier_rejects_overflowing_range_check_value():
    """Inject a value > 2^128 into the range-check builtin segment before
    trace building (integration_tests.rs:268-302): the 8x16-bit limb
    decomposition cannot represent it, so the decomposition constraint
    fails and the proof must not verify."""
    overflowing_rc_value = 0x100000000000000000000000000000001
    program = rc_program((250, 77))
    register_states, memory, program_size, builtin_ranges = run_program(program)

    rc_range = builtin_ranges["range_check"]
    # overwrite the first range-checked cell with the malicious value
    memory.data[rc_range.start] = overflowing_rc_value

    options = ProofOptions.default_test_options()
    memory_segments = {"range_check": range(rc_range.start, rc_range.stop)}
    pub_inputs = PublicInputs.from_regs_and_mem(
        register_states, memory, program_size, memory_segments
    )
    malicious_trace = build_main_trace(register_states, memory, pub_inputs)

    proof = generate_cairo_proof(malicious_trace, pub_inputs, options)
    assert not verify_cairo_proof(proof, pub_inputs, options)


def test_verifier_rejects_changed_output():
    """Change the output cell's value in the trace while the public inputs
    keep the real output (integration_tests.rs:304-338): the public-memory
    permutation argument must catch the mismatch."""
    main_trace, pub_inputs = generate_prover_args(output_program((42, 123)))
    options = ProofOptions.default_test_options()

    cols = main_trace.to_int_columns()
    # find the write of output value 42 (it appears as an instruction dst)
    rows_with_42 = [r for r, v in enumerate(cols[FRAME_DST]) if v == 42]
    assert rows_with_42, "output value not found in dst column"
    cols[FRAME_DST][rows_with_42[0]] = 100
    malicious_trace = TraceTable.from_int_columns(cols)

    proof = generate_cairo_proof(malicious_trace, pub_inputs, options)
    assert not verify_cairo_proof(proof, pub_inputs, options)
