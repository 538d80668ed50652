"""Cairo0 hint processor tests (VERDICT r1 item 3; reference
integration_tests.rs:120-147 proves lt_comparison / compare_lesser_array /
signed_div_rem through cairo-vm's builtin hint processor)."""

import json

import pytest

from lambdaworks_cairo_prover_tpu.cairo import hints as H
from lambdaworks_cairo_prover_tpu.cairo.air import (
    generate_cairo_proof,
    verify_cairo_proof,
)
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.cairo.stdlib import (
    compare_lesser_array_program,
    lt_comparison_program,
    signed_div_rem_program,
)
from lambdaworks_cairo_prover_tpu.cairo.vm import CairoVM, Program, run_program
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions


# ---------------------------------------------------------------------------
# reference-expression parser
# ---------------------------------------------------------------------------


def test_parse_reference_values():
    assert H.parse_reference_value("cast(fp + (-3), felt*)") == (
        "add", ("reg", "fp"), ("mul", ("const", H.P - 1), ("const", 3))
    )
    assert H.parse_reference_value("[cast(ap + 2, felt*)]") == (
        "deref", ("add", ("reg", "ap"), ("const", 2))
    )
    # nested deref with offset: the signed_div_rem biased_q shape
    ast = H.parse_reference_value("[cast([fp + (-6)] + 1, felt*)]")
    assert ast == (
        "deref",
        ("add",
         ("deref", ("add", ("reg", "fp"),
                    ("mul", ("const", H.P - 1), ("const", 6)))),
         ("const", 1)),
    )
    # double pointer type is swallowed
    assert H.parse_reference_value("cast(ap, felt**)") == ("reg", "ap")


def test_unknown_hint_raises():
    prog = Program(
        data=[0x208b7fff7fff7ffe],  # just a ret
        main_pc=0,
        hints={0: [H.Hint(code="print('nope')")]},
        references=[],
    )
    vm = CairoVM(prog)
    with pytest.raises(H.UnknownHintError):
        vm.run()


# ---------------------------------------------------------------------------
# compiled-JSON parse path
# ---------------------------------------------------------------------------


def test_hints_parse_from_compiled_json():
    from lambdaworks_cairo_prover_tpu.cairo.stdlib import Asm

    obj = lt_comparison_program()  # built via Program.from_json internally
    assert obj.hints, "lt_comparison must carry hints"
    codes = {h.code for hl in obj.hints.values() for h in hl}
    assert H.IS_NN in codes and H.IS_NN_OUT_OF_RANGE in codes
    # ids resolve through the reference manager
    a = Asm()
    a.label("main")
    a.hint(H.IS_NN, {"a": "[cast(fp + (-3), felt*)]"})
    a.push_imm(7)
    a.ret()
    built = a.finish("main", [])
    built["identifiers"] = {"__main__.main": {"pc": 0}}
    prog = Program.from_json(json.dumps(built))
    (hint,) = prog.hints[0]
    assert hint.reference_ids == {"a": 0}
    assert prog.references[0].ast[0] == "deref"


# ---------------------------------------------------------------------------
# VM execution of the three hinted workloads
# ---------------------------------------------------------------------------


def test_lt_comparison_runs():
    regs, mem, _, branges = run_program(lt_comparison_program())
    rng = branges["range_check"]
    # is_le(2, 6) range-checks b - a = 4
    assert [mem.data[a] for a in range(rng.start, rng.stop)] == [4]


def test_compare_lesser_array_runs():
    regs, mem, _, branges = run_program(compare_lesser_array_program())
    rng = branges["range_check"]
    # is_le(a[i], b[i]) checks (7+3i) - (5+2i) = 2 + i for i in 0..9
    assert [mem.data[a] for a in range(rng.start, rng.stop)] == [
        2 + i for i in range(10)
    ]


def test_signed_div_rem_runs():
    regs, mem, _, branges = run_program(signed_div_rem_program())
    out = branges["output"]
    q, r = (-4) % H.P, 2  # divmod(-10, 3)
    assert [mem.data[a] for a in range(out.start, out.stop)] == [q, q, r, r]


# ---------------------------------------------------------------------------
# end-to-end prove + verify (reference integration_tests.rs:120-147)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("make", [
    lt_comparison_program,
    compare_lesser_array_program,
    signed_div_rem_program,
], ids=["lt_comparison", "compare_lesser_array", "signed_div_rem"])
def test_hinted_program_proves(make):
    trace, pub = generate_prover_args(make())
    options = ProofOptions.default_test_options()
    proof = generate_cairo_proof(trace, pub, options)
    assert verify_cairo_proof(proof, pub, options)


def test_struct_typed_references_load_lazily():
    """Real cairo-compile JSONs carry struct-typed references (e.g.
    HashBuiltin*) the expression grammar cannot evaluate; loading must
    succeed and only a hint actually READING such a ref may fail."""
    from lambdaworks_cairo_prover_tpu.cairo.stdlib import Asm

    a = Asm()
    a.label("main")
    a.hint(H.IS_NN, {"a": "[cast(fp + (-3), felt*)]"})
    a.push_imm(7)
    a.ret()
    built = a.finish("main", [])
    built["identifiers"] = {"__main__.main": {"pc": 0}}
    # struct-typed and expression-bearing entries, unused by any hint
    built["reference_manager"]["references"].extend([
        {"value": "cast(ap + (-1), "
                  "starkware.cairo.common.cairo_builtins.HashBuiltin*)",
         "ap_tracking_data": {"group": 0, "offset": 0}},
        {"value": "cast([fp + (-4)] + 2, my.pkg.Struct*)",
         "ap_tracking_data": {"group": 0, "offset": 0}},
    ])
    prog = Program.from_json(json.dumps(built))  # must not raise
    # dotted type names parse (the type is swallowed), so even direct use
    # works for address-shaped values
    ref = prog.references[-2]
    assert ref.ast[0] == "add"  # ap + (-1), HashBuiltin* type swallowed
