"""Unit tests for the starkware-stdlib hint families (hints_stdlib.py).

Each test builds a minimal VM + hint-reference setup and executes the hint
through the same `execute_hint` dispatch the VM's run loop uses, asserting
the memory/scope effects cairo-vm's BuiltinHintProcessor produces for the
same hint (reference src/cairo/runner/run.rs:76-101 relies on that
processor for every hinted Cairo0 program)."""

import pytest

from lambdaworks_cairo_prover_tpu.cairo import hints as H
from lambdaworks_cairo_prover_tpu.cairo import hints_stdlib as S
from lambdaworks_cairo_prover_tpu.cairo.vm import CairoVM, Program, Relocatable

P = H.P


def make_vm():
    vm = CairoVM(Program(data=[], main_pc=0))
    vm.add_segment()  # segment 0: stand-in program
    vm.add_segment()  # segment 1: execution
    return vm


def ref_deref(reg: str, off: int) -> str:
    sign = f"+ ({off})" if off >= 0 else f"+ ({off})"
    return f"[cast({reg} {sign}, felt*)]"


def make_hint(code: str, names_to_offsets: dict[str, int]):
    """Hint whose ids.<name> map to [fp + off] cells."""
    refs = [H.Reference(value=ref_deref("fp", off), ap_tracking=H.ApTracking())
            for off in names_to_offsets.values()]
    hint = H.Hint(
        code=code,
        reference_ids={name: i for i, name in enumerate(names_to_offsets)},
    )
    return hint, refs


def run_hint(vm, code, ids_map, cells=None, ap_off=32):
    """Place `cells` at [fp+off], run the hint, return (ap, fp)."""
    fp = Relocatable(1, 64)
    ap = fp + ap_off
    hint, refs = make_hint(code, ids_map)
    for off, val in (cells or {}).items():
        vm.mem_set(fp + off, val)
    H.execute_hint(vm, hint, refs, ap, fp)
    return ap, fp


# ---------------------------------------------------------------------------
# math.cairo
# ---------------------------------------------------------------------------


def test_split_felt():
    vm = make_vm()
    value = (123 << 128) + 456
    ap, fp = run_hint(vm, S.SPLIT_FELT,
                      {"value": 0, "low": 1, "high": 2}, {0: value})
    assert vm.mem_get(fp + 1) == 456
    assert vm.mem_get(fp + 2) == 123


def test_sqrt():
    vm = make_vm()
    ap, fp = run_hint(vm, S.SQRT, {"value": 0, "root": 1}, {0: 10**20 + 37})
    root = vm.mem_get(fp + 1)
    assert root * root <= 10**20 + 37 < (root + 1) ** 2


def test_assert_250_bits():
    vm = make_vm()
    value = (7 << 128) + 11
    ap, fp = run_hint(vm, S.ASSERT_250_BITS,
                      {"value": 0, "low": 1, "high": 2}, {0: value})
    assert vm.mem_get(fp + 1) == 11
    assert vm.mem_get(fp + 2) == 7
    with pytest.raises(H.HintError):
        run_hint(make_vm(), S.ASSERT_250_BITS,
                 {"value": 0, "low": 1, "high": 2}, {0: 1 << 251})


def test_assert_not_zero_and_not_equal():
    with pytest.raises(H.HintError):
        run_hint(make_vm(), S.ASSERT_NOT_ZERO, {"value": 0}, {0: 0})
    run_hint(make_vm(), S.ASSERT_NOT_ZERO, {"value": 0}, {0: 5})
    with pytest.raises(H.HintError):
        run_hint(make_vm(), S.ASSERT_NOT_EQUAL, {"a": 0, "b": 1},
                 {0: 9, 1: 9})
    run_hint(make_vm(), S.ASSERT_NOT_EQUAL, {"a": 0, "b": 1}, {0: 9, 1: 10})


def test_assert_le_felt_and_exclusions():
    vm = make_vm()
    rc = vm.add_segment()
    fp = Relocatable(1, 64)
    cells = {0: 100, 1: 200, 2: rc}
    hint, refs = make_hint(
        S.ASSERT_LE_FELT, {"a": 0, "b": 1, "range_check_ptr": 2})
    for off, val in cells.items():
        vm.mem_set(fp + off, val)
    H.execute_hint(vm, hint, refs, fp + 32, fp)
    # arcs: a=100 (idx 0), b-a=100 (idx 1), P-1-b (idx 2, the largest)
    assert vm.scope_get("excluded") == 2
    q0, r0 = vm.mem_get(rc + 1), vm.mem_get(rc + 0)
    assert q0 * S.PRIME_OVER_3_HIGH + r0 == 100
    # exclusion follow-ups write flags at ap
    ap = Relocatable(1, 200)
    h0, r0_ = make_hint(S.ASSERT_LE_FELT_EXCLUDED_0, {})
    H.execute_hint(vm, h0, r0_, ap, fp)
    assert vm.mem_get(ap) == 1  # excluded(2) != 0
    h2, r2_ = make_hint(S.ASSERT_LE_FELT_EXCLUDED_2, {})
    H.execute_hint(vm, h2, r2_, ap, fp)  # excluded == 2: ok
    # violated precondition raises
    with pytest.raises(H.HintError):
        run_hint(make_vm(), S.ASSERT_LE_FELT,
                 {"a": 0, "b": 1, "range_check_ptr": 2},
                 {0: 200, 1: 100, 2: rc})


def test_assert_lt_felt():
    run_hint(make_vm(), S.ASSERT_LT_FELT, {"a": 0, "b": 1}, {0: 3, 1: 4})
    with pytest.raises(H.HintError):
        run_hint(make_vm(), S.ASSERT_LT_FELT, {"a": 0, "b": 1}, {0: 4, 1: 4})


def test_split_int():
    vm = make_vm()
    out = vm.add_segment()
    ap, fp = run_hint(vm, S.SPLIT_INT,
                      {"output": 0, "value": 1, "base": 2, "bound": 3},
                      {0: out, 1: 7 + 5 * 256, 2: 256, 3: 128})
    assert vm.mem_get(out) == 7
    run_hint(make_vm(), S.SPLIT_INT_ASSERT_RANGE, {"value": 0}, {0: 0})
    with pytest.raises(H.HintError):
        run_hint(make_vm(), S.SPLIT_INT_ASSERT_RANGE, {"value": 0}, {0: 3})


def test_abs_value_sign():
    vm = make_vm()
    ap, fp = run_hint(vm, S.ABS_VALUE, {"value": 0, "is_positive": 1},
                      {0: P - 5})
    assert vm.mem_get(fp + 1) == 0
    vm2 = make_vm()
    ap, fp = run_hint(vm2, S.ABS_VALUE, {"value": 0, "is_positive": 1},
                      {0: 5})
    assert vm2.mem_get(fp + 1) == 1


# ---------------------------------------------------------------------------
# memcpy / memset scope loops
# ---------------------------------------------------------------------------


def test_memcpy_scope_loop():
    vm = make_vm()
    fp = Relocatable(1, 64)
    vm.mem_set(fp + 0, 3)  # ids.len
    hint, refs = make_hint(S.MEMCPY_ENTER_SCOPE, {"len": 0})
    H.execute_hint(vm, hint, refs, fp + 32, fp)
    assert vm.exec_scopes[-1]["n"] == 3
    # each loop iteration writes its flag into a fresh frame cell, as the
    # unrolled memcpy body does (the VM memory is write-once)
    flags = []
    for i in range(3):
        frame = fp + 100 * (i + 1)
        cont, crefs = make_hint(S.MEMCPY_CONTINUE_COPYING,
                                {"continue_copying": 1})
        H.execute_hint(vm, cont, crefs, frame + 32, frame)
        flags.append(vm.mem_get(frame + 1))
    assert flags == [1, 1, 0]
    exit_h, erefs = make_hint(S.VM_EXIT_SCOPE, {})
    H.execute_hint(vm, exit_h, erefs, fp + 32, fp)
    assert len(vm.exec_scopes) == 1
    with pytest.raises(H.HintError):
        H.execute_hint(vm, exit_h, erefs, fp + 32, fp)


# ---------------------------------------------------------------------------
# find_element / search_sorted_lower / set_add
# ---------------------------------------------------------------------------


def test_find_element():
    vm = make_vm()
    arr = vm.add_segment()
    for i, v in enumerate([10, 11, 20, 21, 30, 31]):  # 3 elements of size 2
        vm.mem_set(arr + i, v)
    ap, fp = run_hint(
        vm, S.FIND_ELEMENT,
        {"array_ptr": 0, "elm_size": 1, "n_elms": 2, "key": 3, "index": 4},
        {0: arr, 1: 2, 2: 3, 3: 20})
    assert vm.mem_get(fp + 4) == 1
    with pytest.raises(H.HintError):
        run_hint(
            make_vm(), S.FIND_ELEMENT,
            {"array_ptr": 0, "elm_size": 1, "n_elms": 2, "key": 3,
             "index": 4},
            {0: arr, 1: 2, 2: 0, 3: 20})


def test_search_sorted_lower():
    vm = make_vm()
    arr = vm.add_segment()
    for i, v in enumerate([5, 10, 20]):
        vm.mem_set(arr + i, v)
    ids = {"array_ptr": 0, "elm_size": 1, "n_elms": 2, "key": 3, "index": 4}
    ap, fp = run_hint(vm, S.SEARCH_SORTED_LOWER, ids,
                      {0: arr, 1: 1, 2: 3, 3: 10})
    assert vm.mem_get(fp + 4) == 1
    vm2 = make_vm()
    arr2 = vm2.add_segment()
    for i, v in enumerate([5, 10, 20]):
        vm2.mem_set(arr2 + i, v)
    ap, fp = run_hint(vm2, S.SEARCH_SORTED_LOWER, ids,
                      {0: arr2, 1: 1, 2: 3, 3: 100})
    assert vm2.mem_get(fp + 4) == 3  # not found -> n_elms


def test_set_add():
    vm = make_vm()
    st = vm.add_segment()
    for i, v in enumerate([1, 2, 3, 4]):  # two elements of size 2
        vm.mem_set(st + i, v)
    elm = vm.add_segment()
    vm.mem_set(elm + 0, 3)
    vm.mem_set(elm + 1, 4)
    ids = {"elm_size": 0, "elm_ptr": 1, "set_ptr": 2, "set_end_ptr": 3,
           "index": 4, "is_elm_in_set": 5}
    ap, fp = run_hint(vm, S.SET_ADD, ids,
                      {0: 2, 1: elm, 2: st, 3: st + 4})
    assert vm.mem_get(fp + 5) == 1
    assert vm.mem_get(fp + 4) == 1


# ---------------------------------------------------------------------------
# dict family
# ---------------------------------------------------------------------------


def test_dict_write_read_update():
    vm = make_vm()
    fp = Relocatable(1, 64)
    ap = Relocatable(1, 128)
    # default_dict_new writes the new dict pointer at ap
    vm.mem_set(fp + 0, 99)  # default_value
    hint, refs = make_hint(S.DEFAULT_DICT_NEW, {"default_value": 0})
    H.execute_hint(vm, hint, refs, ap, fp)
    dict_ptr = vm.mem_get(ap)
    assert isinstance(dict_ptr, Relocatable)

    # dict_read of an unseen key returns the default
    vm.mem_set(fp + 1, dict_ptr)
    vm.mem_set(fp + 2, 7)      # key
    rh, rrefs = make_hint(S.DICT_READ, {"dict_ptr": 1, "key": 2, "value": 3})
    H.execute_hint(vm, rh, rrefs, ap, fp)
    assert vm.mem_get(fp + 3) == 99

    # dict_write records prev_value at dict_ptr+1 and advances the tracker
    ptr2 = dict_ptr + S.DICT_ACCESS_SIZE
    vm.mem_set(fp + 4, ptr2)
    vm.mem_set(fp + 5, 123)    # new_value
    wh, wrefs = make_hint(
        S.DICT_WRITE, {"dict_ptr": 4, "key": 2, "new_value": 5})
    H.execute_hint(vm, wh, wrefs, ap, fp)
    assert vm.mem_get(ptr2 + 1) == 99  # prev_value

    # dict_update checks prev and installs new
    ptr3 = ptr2 + S.DICT_ACCESS_SIZE
    vm.mem_set(fp + 6, ptr3)
    vm.mem_set(fp + 7, 123)    # prev_value
    vm.mem_set(fp + 8, 456)    # new_value
    uh, urefs = make_hint(
        S.DICT_UPDATE,
        {"dict_ptr": 6, "key": 2, "prev_value": 7, "new_value": 8})
    H.execute_hint(vm, uh, urefs, ap, fp)
    mgr = vm.scope_get("__dict_manager")
    assert mgr.trackers[dict_ptr.segment].data[7] == 456

    # wrong prev raises (fresh frame cells; VM memory is write-once)
    ptr4 = ptr3 + S.DICT_ACCESS_SIZE
    vm.mem_set(fp + 12, ptr4)
    vm.mem_set(fp + 13, 1)  # wrong prev
    vm.mem_set(fp + 14, 0)
    uh2, urefs2 = make_hint(
        S.DICT_UPDATE,
        {"dict_ptr": 12, "key": 2, "prev_value": 13, "new_value": 14})
    with pytest.raises(H.HintError):
        H.execute_hint(vm, uh2, urefs2, ap, fp)


def test_squash_dict_inner_flow():
    """Drive the squash_dict prologue + inner hints over a two-key access
    log and check the loop-control writes at each step."""
    vm = make_vm()
    fp = Relocatable(1, 64)
    ap = Relocatable(1, 128)
    accesses = vm.add_segment()
    rc = vm.add_segment()
    # access log: (key, prev, new) x 4 entries, keys 5 and 3
    log = [(5, 0, 1), (3, 0, 2), (5, 1, 9), (3, 2, 4)]
    for i, (k, pv, nv) in enumerate(log):
        base = accesses + 3 * i
        vm.mem_set(base + 0, k)
        vm.mem_set(base + 1, pv)
        vm.mem_set(base + 2, nv)

    cells = {0: accesses, 1: 12, 2: 4}
    hint, refs = make_hint(
        S.SQUASH_DICT,
        {"dict_accesses": 0, "ptr_diff": 1, "n_accesses": 2, "big_keys": 3,
         "first_key": 4})
    for off, val in cells.items():
        vm.mem_set(fp + off, val)
    H.execute_hint(vm, hint, refs, ap, fp)
    assert vm.mem_get(fp + 3) == 0           # keys < 2^128
    assert vm.mem_get(fp + 4) == 3           # smallest key first
    assert vm.scope_get("keys") == [5]

    # first iteration: key 3 accessed at indices 1, 3
    vm.mem_set(fp + 5, rc)
    fi, firefs = make_hint(
        S.SQUASH_DICT_INNER_FIRST_ITERATION, {"range_check_ptr": 5})
    H.execute_hint(vm, fi, firefs, ap, fp)
    assert vm.mem_get(rc) == 1               # lowest access index
    sk, skrefs = make_hint(
        S.SQUASH_DICT_INNER_SKIP_LOOP, {"should_skip_loop": 6})
    H.execute_hint(vm, sk, skrefs, ap, fp)
    assert vm.mem_get(fp + 6) == 0           # one more access pending

    # loop_temps struct at [fp+7..fp+10], referenced through the POINTER
    # form real cairo-compile emits (`let loop_temps = cast(ap, LoopTemps*)`
    # — not an addressable cell; _member_addr must branch on the T* cast)
    lt_hint, lt_refs = make_hint(
        S.SQUASH_DICT_INNER_CHECK_ACCESS_INDEX, {"loop_temps": 7})
    lt_refs[0] = H.Reference(
        value="cast(fp + 7, starkware.cairo.common.squash_dict.LoopTemps*)",
        ap_tracking=H.ApTracking())
    H.execute_hint(vm, lt_hint, lt_refs, ap, fp)
    assert vm.mem_get(fp + 7 + 0) == 3 - 1 - 1  # index_delta_minus1
    cl, clrefs = make_hint(
        S.SQUASH_DICT_INNER_CONTINUE_LOOP, {"loop_temps": 7})
    clrefs[0] = lt_refs[0]
    H.execute_hint(vm, cl, clrefs, ap, fp)
    assert vm.mem_get(fp + 7 + 3) == 0       # no accesses left for key 3

    la, larefs = make_hint(S.SQUASH_DICT_INNER_LEN_ASSERT, {})
    H.execute_hint(vm, la, larefs, ap, fp)
    ua, uarefs = make_hint(
        S.SQUASH_DICT_INNER_USED_ACCESSES_ASSERT, {"n_used_accesses": 8})
    vm.mem_set(fp + 8, 2)
    H.execute_hint(vm, ua, uarefs, ap, fp)

    # next key = 5
    nk, nkrefs = make_hint(S.SQUASH_DICT_INNER_NEXT_KEY, {"next_key": 9})
    H.execute_hint(vm, nk, nkrefs, ap, fp)
    assert vm.mem_get(fp + 9) == 5
    alk, alkrefs = make_hint(S.SQUASH_DICT_INNER_ASSERT_LEN_KEYS, {})
    H.execute_hint(vm, alk, alkrefs, ap, fp)  # keys now empty


# ---------------------------------------------------------------------------
# uint256
# ---------------------------------------------------------------------------


def u256_cells(vm, fp, base_off, value):
    vm.mem_set(fp + base_off, value & ((1 << 128) - 1))
    vm.mem_set(fp + base_off + 1, value >> 128)


def test_uint256_add_carries():
    vm = make_vm()
    fp = Relocatable(1, 64)
    a = (1 << 128) - 1
    b = 1
    u256_cells(vm, fp, 0, a)
    u256_cells(vm, fp, 2, b)
    hint, refs = make_hint(
        S.UINT256_ADD, {"a": 0, "b": 2, "carry_low": 4, "carry_high": 5})
    H.execute_hint(vm, hint, refs, fp + 32, fp)
    assert vm.mem_get(fp + 4) == 1
    assert vm.mem_get(fp + 5) == 0


def test_split_64():
    vm = make_vm()
    a = (77 << 64) + 13
    ap, fp = run_hint(vm, S.SPLIT_64, {"a": 0, "low": 1, "high": 2}, {0: a})
    assert vm.mem_get(fp + 1) == 13
    assert vm.mem_get(fp + 2) == 77


def test_uint256_sqrt_and_signed_nn():
    vm = make_vm()
    fp = Relocatable(1, 64)
    n = (1 << 200) + 12345
    u256_cells(vm, fp, 0, n)
    hint, refs = make_hint(S.UINT256_SQRT, {"n": 0, "root": 2})
    H.execute_hint(vm, hint, refs, fp + 32, fp)
    root = vm.mem_get(fp + 2)
    assert root * root <= n < (root + 1) ** 2
    assert vm.mem_get(fp + 3) == 0

    ap = Relocatable(1, 150)
    u256_cells(vm, fp, 4, 5)  # high = 0 -> nonneg
    nn, nnrefs = make_hint(S.UINT256_SIGNED_NN, {"a": 4})
    H.execute_hint(vm, nn, nnrefs, ap, fp)
    assert vm.mem_get(ap) == 1


def test_uint256_div_mod():
    vm = make_vm()
    fp = Relocatable(1, 64)
    a = (1 << 200) + 999
    div = (1 << 66) + 3
    u256_cells(vm, fp, 0, a)
    u256_cells(vm, fp, 2, div)
    hint, refs = make_hint(
        S.UINT256_UNSIGNED_DIV_REM,
        {"a": 0, "div": 2, "quotient": 4, "remainder": 6})
    H.execute_hint(vm, hint, refs, fp + 32, fp)
    q = vm.mem_get(fp + 4) + (vm.mem_get(fp + 5) << 128)
    r = vm.mem_get(fp + 6) + (vm.mem_get(fp + 7) << 128)
    assert (q, r) == divmod(a, div)


def test_uint256_mul_div_mod():
    vm = make_vm()
    fp = Relocatable(1, 64)
    a, b, div = (1 << 130) + 7, (1 << 140) + 11, (1 << 100) + 17
    u256_cells(vm, fp, 0, a)
    u256_cells(vm, fp, 2, b)
    u256_cells(vm, fp, 4, div)
    hint, refs = make_hint(
        S.UINT256_MUL_DIV_MOD,
        {"a": 0, "b": 2, "div": 4, "quotient_low": 6, "quotient_high": 8,
         "remainder": 10})
    H.execute_hint(vm, hint, refs, fp + 32, fp)
    q = (vm.mem_get(fp + 6) + (vm.mem_get(fp + 7) << 128)
         + (vm.mem_get(fp + 8) << 256) + (vm.mem_get(fp + 9) << 384))
    r = vm.mem_get(fp + 10) + (vm.mem_get(fp + 11) << 128)
    assert (q, r) == divmod(a * b, div)


def test_unknown_hint_still_raises():
    vm = make_vm()
    hint, refs = make_hint("import os; os.system('rm -rf /')", {})
    with pytest.raises(H.UnknownHintError):
        H.execute_hint(vm, hint, refs, Relocatable(1, 128),
                       Relocatable(1, 64))
