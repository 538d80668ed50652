"""Unit tests for the expanded Cairo1 hint interpreter (casm.py), mirroring
cairo-vm's Cairo1HintProcessor semantics (reference src/cairo/runner/
run.rs:102-191 executes CASM contracts through that processor)."""

import pytest

from lambdaworks_cairo_prover_tpu.cairo import casm as C
from lambdaworks_cairo_prover_tpu.cairo.vm import (
    CairoVM, CairoVMError, Program, Relocatable)
from lambdaworks_cairo_prover_tpu.field.params import P


def make_vm():
    vm = CairoVM(Program(data=[], main_pc=0))
    vm.add_segment()  # 0: program stand-in
    vm.add_segment()  # 1: execution
    return vm, Relocatable(1, 100), Relocatable(1, 50)  # vm, ap, fp


def cell(reg, off):
    return {"register": reg, "offset": off}


def deref(reg, off):
    return {"Deref": cell(reg, off)}


def imm(v):
    return {"Immediate": hex(v)}


def run(vm, kind, body, ap, fp):
    C._compile_hint({kind: body})(vm, ap, fp)


def test_core_wrapper_unwraps():
    vm, ap, fp = make_vm()
    C._compile_hint({"Core": {"AllocSegment": {"dst": cell("AP", 0)}}})(
        vm, ap, fp)
    assert isinstance(vm.mem_get(ap), Relocatable)


def test_wide_mul_128():
    vm, ap, fp = make_vm()
    a, b = (1 << 127) + 3, (1 << 100) + 7
    vm.mem_set(fp + 0, a)
    vm.mem_set(fp + 1, b)
    run(vm, "WideMul128",
        {"lhs": deref("FP", 0), "rhs": deref("FP", 1),
         "high": cell("AP", 0), "low": cell("AP", 1)}, ap, fp)
    v = a * b
    assert vm.mem_get(ap + 0) == v >> 128
    assert vm.mem_get(ap + 1) == v & ((1 << 128) - 1)


def test_divmod():
    vm, ap, fp = make_vm()
    run(vm, "DivMod",
        {"lhs": imm(1000), "rhs": imm(7),
         "quotient": cell("AP", 0), "remainder": cell("AP", 1)}, ap, fp)
    assert (vm.mem_get(ap), vm.mem_get(ap + 1)) == divmod(1000, 7)


def test_uint256_divmod():
    vm, ap, fp = make_vm()
    dividend = (1 << 200) + 999
    divisor = (1 << 130) + 17
    run(vm, "Uint256DivMod",
        {"dividend0": imm(dividend & ((1 << 128) - 1)),
         "dividend1": imm(dividend >> 128),
         "divisor0": imm(divisor & ((1 << 128) - 1)),
         "divisor1": imm(divisor >> 128),
         "quotient0": cell("AP", 0), "quotient1": cell("AP", 1),
         "remainder0": cell("AP", 2), "remainder1": cell("AP", 3)}, ap, fp)
    q = vm.mem_get(ap) + (vm.mem_get(ap + 1) << 128)
    r = vm.mem_get(ap + 2) + (vm.mem_get(ap + 3) << 128)
    assert (q, r) == divmod(dividend, divisor)


def test_square_roots():
    vm, ap, fp = make_vm()
    run(vm, "SquareRoot", {"value": imm(10**12 + 5), "dst": cell("AP", 0)},
        ap, fp)
    root = vm.mem_get(ap)
    assert root * root <= 10**12 + 5 < (root + 1) ** 2

    n = (1 << 180) + 12345
    run(vm, "Uint256SquareRoot",
        {"value_low": imm(n & ((1 << 128) - 1)), "value_high": imm(n >> 128),
         "sqrt0": cell("AP", 1), "sqrt1": cell("AP", 2),
         "remainder_low": cell("AP", 3), "remainder_high": cell("AP", 4),
         "sqrt_mul_2_minus_remainder_ge_u128": cell("AP", 5)}, ap, fp)
    s = vm.mem_get(ap + 1) + (vm.mem_get(ap + 2) << 64)
    rem = vm.mem_get(ap + 3) + (vm.mem_get(ap + 4) << 128)
    assert s * s + rem == n and s * s <= n < (s + 1) ** 2


def test_linear_split():
    vm, ap, fp = make_vm()
    run(vm, "LinearSplit",
        {"value": imm(1000), "scalar": imm(300), "max_x": imm(2),
         "x": cell("AP", 0), "y": cell("AP", 1)}, ap, fp)
    x, y = vm.mem_get(ap), vm.mem_get(ap + 1)
    assert x == 2 and y == 400 and 300 * x + y == 1000


def test_assert_le_arcs():
    vm, ap, fp = make_vm()
    rc = vm.add_segment()
    vm.mem_set(fp + 0, rc)
    run(vm, "AssertLeFindSmallArcs",
        {"range_check_ptr": deref("FP", 0), "a": imm(100), "b": imm(200)},
        ap, fp)
    assert vm.exec_scopes[0]["__casm_excluded_arc__"] == 2
    assert (vm.mem_get(rc + 1) * C._PRIME_OVER_3_HIGH
            + vm.mem_get(rc + 0)) == 100
    run(vm, "AssertLeIsFirstArcExcluded",
        {"skip_exclude_a_flag": cell("AP", 0)}, ap, fp)
    assert vm.mem_get(ap) == 1  # arc 0 not excluded -> skip its branch
    run(vm, "AssertLeIsSecondArcExcluded",
        {"skip_exclude_b_flag": cell("AP", 1)}, ap, fp)
    assert vm.mem_get(ap + 1) == 1


def test_felt252_dict_and_arena():
    vm, ap, fp = make_vm()
    # segment arena header: [infos_start, n_segments, n_finalized]
    arena_seg = vm.add_segment()
    infos = vm.add_segment()
    vm.mem_set(arena_seg + 0, infos)
    vm.mem_set(arena_seg + 1, 0)
    vm.mem_set(arena_seg + 2, 0)
    arena_ptr = arena_seg + 3
    vm.mem_set(fp + 0, arena_ptr)
    run(vm, "AllocFelt252Dict", {"segment_arena_ptr": deref("FP", 0)}, ap, fp)
    dict_base = vm.mem_get(infos + 0)
    assert isinstance(dict_base, Relocatable)

    # first entry: key 7, default value 0
    vm.mem_set(dict_base + 0, 7)
    vm.mem_set(fp + 1, dict_base)
    run(vm, "Felt252DictEntryInit",
        {"dict_ptr": deref("FP", 1), "key": imm(7)}, ap, fp)
    assert vm.mem_get(dict_base + 1) == 0  # prev = default

    # update writes the new value into the tracker
    entry_end = dict_base + 3
    vm.mem_set(fp + 2, entry_end)
    run(vm, "Felt252DictEntryUpdate",
        {"dict_ptr": deref("FP", 2), "value": imm(55)}, ap, fp)

    # second access of key 7 sees 55
    vm.mem_set(entry_end + 0, 7)
    run(vm, "Felt252DictEntryInit",
        {"dict_ptr": deref("FP", 2), "key": imm(7)}, ap, fp)
    assert vm.mem_get(entry_end + 1) == 55

    # arena index of this dict's segment is 0
    vm.mem_set(fp + 3, entry_end + 3)
    run(vm, "GetSegmentArenaIndex",
        {"dict_end_ptr": deref("FP", 3), "dict_index": cell("AP", 0)},
        ap, fp)
    assert vm.mem_get(ap) == 0


def test_squash_loop_family():
    vm, ap, fp = make_vm()
    accesses = vm.add_segment()
    rc = vm.add_segment()
    log = [(5, 0, 1), (3, 0, 2), (5, 1, 9), (3, 2, 4)]
    for i, (k, pv, nv) in enumerate(log):
        base = accesses + 3 * i
        vm.mem_set(base + 0, k)
        vm.mem_set(base + 1, pv)
        vm.mem_set(base + 2, nv)
    vm.mem_set(fp + 0, accesses)
    run(vm, "InitSquashData",
        {"dict_accesses": deref("FP", 0), "ptr_diff": imm(12),
         "n_accesses": imm(4), "big_keys": cell("AP", 0),
         "first_key": cell("AP", 1)}, ap, fp)
    assert vm.mem_get(ap + 0) == 0
    assert vm.mem_get(ap + 1) == 3  # ascending key order

    vm.mem_set(fp + 1, rc)
    run(vm, "GetCurrentAccessIndex", {"range_check_ptr": deref("FP", 1)},
        ap, fp)
    assert vm.mem_get(rc) == 1  # key 3 first accessed at log index 1
    run(vm, "ShouldSkipSquashLoop", {"should_skip_loop": cell("AP", 2)},
        ap, fp)
    assert vm.mem_get(ap + 2) == 0  # a second access exists
    run(vm, "GetCurrentAccessDelta", {"index_delta_minus1": cell("AP", 3)},
        ap, fp)
    assert vm.mem_get(ap + 3) == 3 - 1 - 1
    run(vm, "ShouldContinueSquashLoop", {"should_continue": cell("AP", 4)},
        ap, fp)
    assert vm.mem_get(ap + 4) == 0  # key 3 exhausted
    run(vm, "GetNextDictKey", {"next_key": cell("AP", 5)}, ap, fp)
    assert vm.mem_get(ap + 5) == 5


def test_alloc_constant_size_and_unknown():
    vm, ap, fp = make_vm()
    run(vm, "AllocConstantSize", {"size": imm(4), "dst": cell("AP", 0)},
        ap, fp)
    assert isinstance(vm.mem_get(ap), Relocatable)
    with pytest.raises(CairoVMError):
        C._compile_hint({"RandomEcPoint": {}})
