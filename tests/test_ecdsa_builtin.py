"""ECDSA signature builtin: curve-level verify, VM validation rules, the
stdlib verify_ecdsa_signature hint, and an end-to-end Small-layout prove
(reference proves ecdsa programs through cairo-vm's
SignatureBuiltinRunner: src/cairo/runner/run.rs:76-101, default V0 layout
Small = output/pedersen/range_check/ecdsa, cairo_layout.rs:4)."""

import pytest

from lambdaworks_cairo_prover_tpu.cairo.builtins import (
    ALPHA,
    BETA,
    EC_GEN,
    EC_ORDER,
    P,
    _ec_mul,
    ecdsa_sign,
    recover_y,
    sqrt_mod_p,
    verify_ecdsa,
)
from lambdaworks_cairo_prover_tpu.cairo.programs import ecdsa_program
from lambdaworks_cairo_prover_tpu.cairo.vm import CairoVM, CairoVMError

PRIV = 0x12345678ABCDEF
MSG = 0xDEADBEEFCAFE
K = 0x6789ABCDEF012345


def _fixture_sig():
    pub_x = _ec_mul(PRIV, EC_GEN)[0]
    r, s = ecdsa_sign(PRIV, MSG, K)
    return pub_x, MSG, r, s


def test_gen_on_curve_and_order():
    x, y = EC_GEN
    assert (y * y - (x ** 3 + ALPHA * x + BETA)) % P == 0
    assert _ec_mul(EC_ORDER, EC_GEN) is None  # GEN has order EC_ORDER


def test_sqrt_mod_p_roundtrip():
    for v in (4, 9, 12345678901234567890):
        root = sqrt_mod_p(v * v % P)
        assert root is not None and root * root % P == v * v % P
    # recover_y consistent with the curve equation
    x = EC_GEN[0]
    y = recover_y(x)
    assert y in (EC_GEN[1], P - EC_GEN[1])


def test_sign_verify_roundtrip():
    pub_x, msg, r, s = _fixture_sig()
    assert verify_ecdsa(pub_x, msg, r, s)
    assert not verify_ecdsa(pub_x, msg + 1, r, s)       # wrong message
    assert not verify_ecdsa(pub_x, msg, r, s + 1)       # corrupted s
    assert not verify_ecdsa((pub_x + 1) % P, msg, r, s)  # wrong key


def test_vm_validates_instance():
    sig = _fixture_sig()
    vm = CairoVM(ecdsa_program([sig]))
    vm.run()
    seg = vm.builtin_bases["ecdsa"].segment
    assert vm.segments[seg][0] == sig[0]  # pub_key
    assert vm.segments[seg][1] == sig[1]  # message


def test_vm_rejects_bad_signature():
    pub_x, msg, r, s = _fixture_sig()
    vm = CairoVM(ecdsa_program([(pub_x, msg, r, (s + 1) % EC_ORDER)]))
    with pytest.raises(CairoVMError, match="invalid ECDSA signature"):
        vm.run()


def test_vm_rejects_missing_signature():
    pub_x, msg, r, s = _fixture_sig()
    prog = ecdsa_program([(pub_x, msg, r, s)])
    prog.hints.clear()  # drop the add_signature hint
    with pytest.raises(CairoVMError, match="signature hint is missing"):
        CairoVM(prog).run()


def test_stdlib_hint_source_registers_signature():
    """The exact cairo-lang hint string routes to add_signature through the
    reference-manager ids path (pointer-typed ecdsa_ptr)."""
    from lambdaworks_cairo_prover_tpu.cairo import hints as H
    from lambdaworks_cairo_prover_tpu.cairo.hints_stdlib import (
        VERIFY_ECDSA_SIGNATURE,
    )
    from lambdaworks_cairo_prover_tpu.cairo.vm import Program, Relocatable

    pub_x, msg, r, s = _fixture_sig()
    vm = CairoVM(Program(data=[0], main_pc=0, builtins=["ecdsa"]))
    ecdsa_base = vm.add_segment()          # segment 0
    vm._signature_segments.add(ecdsa_base.segment)
    exec_seg = vm.add_segment()            # segment 1: fp frame
    fp = Relocatable(exec_seg.segment, 10)
    vm.mem_set(fp - 3, ecdsa_base)         # ecdsa_ptr cell
    vm.mem_set(fp - 2, r)
    vm.mem_set(fp - 1, s)
    refs = [
        H.Reference(
            value="[cast(fp + (-3), starkware.cairo.common.cairo_builtins"
                  ".SignatureBuiltin**)]",
            ap_tracking=H.ApTracking()),
        H.Reference(value="[cast(fp + (-2), felt)]",
                    ap_tracking=H.ApTracking()),
        H.Reference(value="[cast(fp + (-1), felt)]",
                    ap_tracking=H.ApTracking()),
    ]
    hint = H.Hint(code=VERIFY_ECDSA_SIGNATURE,
                  reference_ids={"ecdsa_ptr": 0, "signature_r": 1,
                                 "signature_s": 2})
    H.execute_hint(vm, hint, refs, Relocatable(1, 0), fp)
    assert vm.signatures[(ecdsa_base.segment, 0)] == (r, s)


def test_ecdsa_prove_verify_small_layout():
    """End-to-end: an ecdsa-builtin program proves and verifies on the
    Small layout; the instance cells flow through the memory argument."""
    from lambdaworks_cairo_prover_tpu.cairo.air import (
        generate_cairo_proof,
        verify_cairo_proof,
    )
    from lambdaworks_cairo_prover_tpu.cairo.runner import (
        CairoLayout,
        generate_prover_args,
    )
    from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions

    sig = _fixture_sig()
    trace, pub = generate_prover_args(ecdsa_program([sig]),
                                      layout=CairoLayout.Small)
    options = ProofOptions.default_test_options()
    proof = generate_cairo_proof(trace, pub, options)
    assert verify_cairo_proof(proof, pub, options)
