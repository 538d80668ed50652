"""Round-5 hint tranche: blake2s / sha256 / cairo_keccak / usort Cairo0
hints and the Uint512DivModByUint256 / FieldSqrt / RandomEcPoint /
U256InvModN Cairo1 kinds (reference reaches these through cairo-vm's
BuiltinHintProcessor and Cairo1HintProcessor, run.rs:8-18 and 76-101).

The blake2s/sha256 compression functions are pinned against Python's
hashlib — real canonical vectors, not self-consistency."""

import hashlib

import pytest

from lambdaworks_cairo_prover_tpu.cairo import casm as C
from lambdaworks_cairo_prover_tpu.cairo import hints as H
from lambdaworks_cairo_prover_tpu.cairo import hints_stdlib as S
from lambdaworks_cairo_prover_tpu.cairo.vm import (
    CairoVM,
    CairoVMError,
    Program,
    Relocatable,
)

P = H.P


def make_vm():
    vm = CairoVM(Program(data=[], main_pc=0))
    vm.add_segment()
    vm.add_segment()
    return vm


def make_hint(code, names_to_offsets):
    refs = [H.Reference(value=f"[cast(fp + ({off}), felt*)]",
                        ap_tracking=H.ApTracking())
            for off in names_to_offsets.values()]
    return H.Hint(
        code=code,
        reference_ids={name: i for i, name in enumerate(names_to_offsets)},
    ), refs


def run_hint(vm, code, ids_map, cells=None, fp_off=64, ap=None):
    fp = Relocatable(1, fp_off)
    ap = ap or fp + 32
    hint, refs = make_hint(code, ids_map)
    for off, val in (cells or {}).items():
        vm.mem_set(fp + off, val)
    H.execute_hint(vm, hint, refs, ap, fp)
    return ap, fp


# ---------------------------------------------------------------------------
# compression functions vs hashlib (canonical vectors)
# ---------------------------------------------------------------------------


def _blake2s_via_compress(data: bytes) -> bytes:
    assert len(data) <= 64
    h = [S.BLAKE2S_IV[0] ^ 0x01010020] + list(S.BLAKE2S_IV[1:])
    block = data + b"\x00" * (64 - len(data))
    msg = [int.from_bytes(block[4 * i: 4 * i + 4], "little")
           for i in range(16)]
    out = S.blake2s_compress(msg, h, len(data), 0, 0xFFFFFFFF, 0)
    return b"".join(w.to_bytes(4, "little") for w in out)


@pytest.mark.parametrize("data", [b"", b"abc", b"a" * 64])
def test_blake2s_compress_matches_hashlib(data):
    assert _blake2s_via_compress(data) == hashlib.blake2s(data).digest()


def _sha256_via_compress(data: bytes) -> bytes:
    assert len(data) <= 55
    block = data + b"\x80" + b"\x00" * (55 - len(data))
    block += (8 * len(data)).to_bytes(8, "big")
    msg = [int.from_bytes(block[4 * i: 4 * i + 4], "big") for i in range(16)]
    out = S.sha2_compress_function(
        list(S.SHA256_IV), S.compute_message_schedule(msg))
    return b"".join(w.to_bytes(4, "big") for w in out)


@pytest.mark.parametrize("data", [b"", b"abc", b"x" * 55])
def test_sha256_compress_matches_hashlib(data):
    assert _sha256_via_compress(data) == hashlib.sha256(data).digest()


# ---------------------------------------------------------------------------
# blake2s hints
# ---------------------------------------------------------------------------


def test_blake2s_compute_hint():
    vm = make_vm()
    buf = vm.add_segment()  # segment 2
    h = [S.BLAKE2S_IV[0] ^ 0x01010020] + list(S.BLAKE2S_IV[1:])
    msg = list(range(16))
    for i, v in enumerate(h):
        vm.mem_set(buf + i, v)
    for i, v in enumerate(msg):
        vm.mem_set(buf + 8 + i, v)
    vm.mem_set(buf + 24, 64)           # t
    vm.mem_set(buf + 25, 0xFFFFFFFF)   # f
    out = buf + 26
    run_hint(vm, S.BLAKE2S_COMPUTE, {"output": -3}, {-3: out})
    want = S.blake2s_compress(msg, h, 64, 0, 0xFFFFFFFF, 0)
    assert vm.get_range(out, 8) == want


def test_blake2s_add_uint256_both_endians():
    vm = make_vm()
    data = vm.add_segment()
    low, high = 0x0102030405060708090A0B0C0D0E0F10, 0x1112131415161718191A1B1C1D1E1F20
    run_hint(vm, S.BLAKE2S_ADD_UINT256,
             {"data": -3, "low": -2, "high": -1},
             {-3: data, -2: low, -1: high})
    got = vm.get_range(data, 8)
    assert got[:4] == [(low >> (32 * i)) & 0xFFFFFFFF for i in range(4)]
    assert got[4:] == [(high >> (32 * i)) & 0xFFFFFFFF for i in range(4)]

    vm2 = make_vm()
    data2 = vm2.add_segment()
    run_hint(vm2, S.BLAKE2S_ADD_UINT256_BIGEND,
             {"data": -3, "low": -2, "high": -1},
             {-3: data2, -2: low, -1: high})
    got2 = vm2.get_range(data2, 8)
    assert got2[:4] == [(high >> (32 * (3 - i))) & 0xFFFFFFFF
                        for i in range(4)]
    assert got2[4:] == [(low >> (32 * (3 - i))) & 0xFFFFFFFF
                        for i in range(4)]


def test_blake2s_finalize_padding():
    vm = make_vm()
    end = vm.add_segment()
    run_hint(vm, S.BLAKE2S_FINALIZE, {"blake2s_ptr_end": -3}, {-3: end})
    # 6 dummy instances of 34 cells each (N_PACKED_INSTANCES=7 default)
    row = vm.get_range(end, 34 * 6)
    assert None not in row
    modified_iv = [S.BLAKE2S_IV[0] ^ 0x01010020] + list(S.BLAKE2S_IV[1:])
    assert row[16:24] == modified_iv  # h follows the 16-word zero message


# ---------------------------------------------------------------------------
# sha256 hints
# ---------------------------------------------------------------------------


def test_sha256_main_constant_hint():
    vm = make_vm()
    seg = vm.add_segment()
    data = b"abc" + b"\x80" + b"\x00" * 52 + (24).to_bytes(8, "big")
    words = [int.from_bytes(data[4 * i: 4 * i + 4], "big") for i in range(16)]
    for i, w in enumerate(words):
        vm.mem_set(seg + i, w)
    out = seg + 100
    run_hint(vm, S.SHA256_MAIN_CONSTANT_INPUT_LENGTH,
             {"sha256_start": -3, "output": -2}, {-3: seg, -2: out})
    digest = b"".join(w.to_bytes(4, "big") for w in vm.get_range(out, 8))
    assert digest == hashlib.sha256(b"abc").digest()


def test_sha256_finalize_padding():
    vm = make_vm()
    end = vm.add_segment()
    run_hint(vm, S.SHA256_FINALIZE, {"sha256_ptr_end": -3}, {-3: end})
    row = vm.get_range(end, 32 * 6)  # (16 msg + 8 IV + 8 out) * (7-1)
    assert None not in row
    assert row[16:24] == list(S.SHA256_IV)


# ---------------------------------------------------------------------------
# cairo_keccak hints
# ---------------------------------------------------------------------------


def test_keccak_write_args_and_permutation():
    from lambdaworks_cairo_prover_tpu.hash.keccak_host import keccak_f

    vm = make_vm()
    seg = vm.add_segment()
    low, high = (1 << 100) + 7, (1 << 90) + 9
    run_hint(vm, S.KECCAK_WRITE_ARGS,
             {"inputs": -3, "low": -2, "high": -1},
             {-3: seg, -2: low, -1: high})
    assert vm.get_range(seg, 4) == [low % 2 ** 64, low // 2 ** 64,
                                    high % 2 ** 64, high // 2 ** 64]

    vm2 = make_vm()
    st = vm2.add_segment()
    state = [(11 * i + 3) % (1 << 64) for i in range(25)]
    for i, v in enumerate(state):
        vm2.mem_set(st + i, v)
    run_hint(vm2, S.BLOCK_PERMUTATION, {"keccak_ptr": -3}, {-3: st + 25})
    assert vm2.get_range(st + 25, 25) == keccak_f(state)


def test_keccak_nondet_compares():
    vm = make_vm()
    ap = Relocatable(1, 200)
    run_hint(vm, S.COMPARE_BYTES_IN_WORD_NONDET, {"n_bytes": -3},
             {-3: 5}, ap=ap)
    assert vm.mem_get(ap) == 1  # 5 < 8
    vm2 = make_vm()
    ap2 = Relocatable(1, 201)
    run_hint(vm2, S.COMPARE_KECCAK_FULL_RATE_IN_BYTES_NONDET,
             {"n_bytes": -3}, {-3: 200}, ap=ap2)
    assert vm2.mem_get(ap2) == 1  # 200 >= 136


# ---------------------------------------------------------------------------
# usort hints
# ---------------------------------------------------------------------------


def test_usort_family():
    vm = make_vm()
    inp = vm.add_segment()
    outp = vm.add_segment()
    values = [5, 3, 5, 1]
    for i, v in enumerate(values):
        vm.mem_set(inp + i, v)
    run_hint(vm, S.USORT_ENTER_SCOPE, {})
    run_hint(vm, S.USORT_BODY,
             {"input": -6, "input_len": -5, "output": -4, "output_len": -3},
             {-6: inp, -5: len(values), -4: outp})
    assert vm.get_range(outp, 3) == [1, 3, 5]
    fp = Relocatable(1, 64)
    assert vm.mem_get(fp - 3) == 3  # output_len

    # verify multiplicity walk for value 5 (positions 0 and 2)
    run_hint(vm, S.USORT_VERIFY, {"value": -10}, {-10: 5}, fp_off=128)
    run_hint(vm, S.USORT_VERIFY_MULTIPLICITY_BODY, {"next_item_index": -11},
             fp_off=128)
    assert vm.mem_get(Relocatable(1, 128 - 11)) == 0  # first pos 0
    run_hint(vm, S.USORT_VERIFY_MULTIPLICITY_BODY, {"next_item_index": -12},
             fp_off=128)
    assert vm.mem_get(Relocatable(1, 128 - 12)) == 1  # pos 2, last_pos 1
    run_hint(vm, S.USORT_VERIFY_MULTIPLICITY_ASSERT, {}, fp_off=128)


# ---------------------------------------------------------------------------
# Cairo1 hint kinds
# ---------------------------------------------------------------------------


def _cell(reg, off):
    return {"register": reg, "offset": off}


def _deref(reg, off):
    return {"Deref": _cell(reg, off)}


def test_u512_divmod_by_u256():
    vm = CairoVM(Program(data=[], main_pc=0))
    vm.add_segment()
    vm.add_segment()
    ap, fp = Relocatable(1, 100), Relocatable(1, 50)
    dividend = (123 << 384) | (456 << 256) | (789 << 128) | 17
    divisor = (99 << 128) | 12345
    for i in range(4):
        vm.mem_set(fp + i, (dividend >> (128 * i)) & ((1 << 128) - 1))
    vm.mem_set(fp + 4, divisor & ((1 << 128) - 1))
    vm.mem_set(fp + 5, divisor >> 128)
    body = {f"dividend{i}": _deref("FP", i) for i in range(4)}
    body |= {f"divisor{i}": _deref("FP", 4 + i) for i in range(2)}
    body |= {f"quotient{i}": _cell("AP", i) for i in range(4)}
    body |= {f"remainder{i}": _cell("AP", 4 + i) for i in range(2)}
    C._compile_hint({"Uint512DivModByUint256": body})(vm, ap, fp)
    q = sum(vm.mem_get(ap + i) << (128 * i) for i in range(4))
    r = sum(vm.mem_get(ap + 4 + i) << (128 * i) for i in range(2))
    assert (q, r) == divmod(dividend, divisor)


def test_field_sqrt():
    from lambdaworks_cairo_prover_tpu.cairo.builtins import P as SP

    vm = CairoVM(Program(data=[], main_pc=0))
    vm.add_segment()
    vm.add_segment()
    ap, fp = Relocatable(1, 100), Relocatable(1, 50)
    vm.mem_set(fp, 49)
    C._compile_hint({"FieldSqrt": {"val": _deref("FP", 0),
                                   "sqrt": _cell("AP", 0)}})(vm, ap, fp)
    root = vm.mem_get(ap)
    assert root * root % SP == 49
    assert root == min(root, SP - root)


def test_random_ec_point_on_curve():
    from lambdaworks_cairo_prover_tpu.cairo.builtins import ALPHA, BETA
    from lambdaworks_cairo_prover_tpu.cairo.builtins import P as SP

    vm = CairoVM(Program(data=[], main_pc=0))
    vm.add_segment()
    vm.add_segment()
    ap, fp = Relocatable(1, 100), Relocatable(1, 50)
    C._compile_hint({"RandomEcPoint": {"x": _cell("AP", 0),
                                       "y": _cell("AP", 1)}})(vm, ap, fp)
    x, y = vm.mem_get(ap), vm.mem_get(ap + 1)
    assert (y * y - (x ** 3 + ALPHA * x + BETA)) % SP == 0


def test_u256_inv_mod_n():
    vm = CairoVM(Program(data=[], main_pc=0))
    vm.add_segment()
    vm.add_segment()
    ap, fp = Relocatable(1, 100), Relocatable(1, 50)
    b, n = 17, (1 << 130) + 1
    vm.mem_set(fp + 0, b & ((1 << 128) - 1))
    vm.mem_set(fp + 1, b >> 128)
    vm.mem_set(fp + 2, n & ((1 << 128) - 1))
    vm.mem_set(fp + 3, n >> 128)
    body = {"b0": _deref("FP", 0), "b1": _deref("FP", 1),
            "n0": _deref("FP", 2), "n1": _deref("FP", 3),
            "g0_or_no_inv": _cell("AP", 0), "g1_option": _cell("AP", 1),
            "s_or_r0": _cell("AP", 2), "s_or_r1": _cell("AP", 3),
            "t_or_k0": _cell("AP", 4), "t_or_k1": _cell("AP", 5)}
    C._compile_hint({"U256InvModN": body})(vm, ap, fp)
    assert vm.mem_get(ap) == 0  # inverse exists
    inv = vm.mem_get(ap + 2) | (vm.mem_get(ap + 3) << 128)
    k = vm.mem_get(ap + 4) | (vm.mem_get(ap + 5) << 128)
    assert inv * b % n == 1
    assert inv * b - 1 == k * n  # Bezout witness the corelib checks
