"""End-to-end Cairo prove + verify (reference integration_tests.rs:114-172)."""

import pytest

from lambdaworks_cairo_prover_tpu.cairo.air import (
    generate_cairo_proof,
    verify_cairo_proof,
)
from lambdaworks_cairo_prover_tpu.cairo.programs import fibonacci_program, rc_program
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.proof.serde import (
    deserialize_proof,
    serialize_proof,
)


def test_prove_verify_fibonacci_cairo():
    main_trace, pub_inputs = generate_prover_args(fibonacci_program(5))
    options = ProofOptions.default_test_options()
    proof = generate_cairo_proof(main_trace, pub_inputs, options)
    assert verify_cairo_proof(proof, pub_inputs, options)

    # wire-format roundtrip
    data = serialize_proof(proof)
    proof2 = deserialize_proof(data)
    assert serialize_proof(proof2) == data
    assert verify_cairo_proof(proof2, pub_inputs, options)

    # malicious: wrong public inputs must fail
    pub_inputs.pc_final += 1
    assert not verify_cairo_proof(proof, pub_inputs, options)


def test_prove_verify_rc_program():
    main_trace, pub_inputs = generate_prover_args(rc_program((250, 77, 1 << 100)))
    options = ProofOptions.default_test_options()
    proof = generate_cairo_proof(main_trace, pub_inputs, options)
    assert verify_cairo_proof(proof, pub_inputs, options)


def test_layout_validation():
    """CairoLayout carries real builtin-set semantics (reference
    cairo_layout.rs + cairo-vm layout validation; run.rs:247-250 default)."""
    import pytest

    from lambdaworks_cairo_prover_tpu.cairo.runner import (
        CairoLayout,
        validate_layout,
    )
    from lambdaworks_cairo_prover_tpu.cairo.vm import CairoVMError

    prog = rc_program((3,))
    # default V0 layout (Small) admits range_check
    validate_layout(prog, CairoLayout.Small)
    # Plain has no builtins at all
    with pytest.raises(CairoVMError):
        validate_layout(prog, CairoLayout.Plain)
    # out-of-layout-order builtins are rejected
    prog2 = rc_program((3,))
    prog2.builtins = ["range_check", "output"]
    with pytest.raises(CairoVMError):
        validate_layout(prog2, CairoLayout.Small)
    # prove path still works under the default layout
    main_trace, pub = generate_prover_args(rc_program((3, 5)))
    assert main_trace.n_rows > 0
