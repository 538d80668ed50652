"""Cairo VM, decoder, and trace builder tests.

Oracle: the cairo-vm-generated binary fixtures in /root/reference/tests/data
(mul program) and decode vectors from reference unit tests
(instruction_offsets.rs:62-93, register_states.rs tests)."""

import pytest

from lambdaworks_cairo_prover_tpu.cairo.decode import (
    InstructionFlags,
    InstructionOffsets,
)
from lambdaworks_cairo_prover_tpu.cairo.cairo_mem import CairoMemory
from lambdaworks_cairo_prover_tpu.cairo.register_states import RegisterStates
from lambdaworks_cairo_prover_tpu.cairo.programs import (
    fibonacci_program,
    mul_program,
    rc_program,
    simple_program,
)
from lambdaworks_cairo_prover_tpu.cairo.vm import run_program

REF_DATA = "/root/reference/tests/data"


def test_decode_offsets_reference_vectors():
    # instruction_offsets.rs:62-93
    o = InstructionOffsets.decode(0x480680017FFF8000)
    assert (o.off_dst, o.off_op0, o.off_op1) == (0, -1, 1)
    o = InstructionOffsets.decode(0x208B7FFF7FFF7FFE)
    assert (o.off_dst, o.off_op0, o.off_op1) == (-2, -1, -1)
    o = InstructionOffsets.decode(0x48327FFC7FFA8000)
    assert (o.off_dst, o.off_op0, o.off_op1) == (0, -6, -4)


def test_decode_flags_known_instructions():
    # 0x480680017fff8000 = [ap] = imm; ap++  (assert_eq)
    f = InstructionFlags.decode(0x480680017FFF8000)
    assert f.opcode == 4 and f.ap_update == 2 and f.op1_src == 1
    assert f.dst_reg == 0 and f.op0_reg == 1
    # ret
    f = InstructionFlags.decode(0x208B7FFF7FFF7FFE)
    assert f.opcode == 2 and f.pc_update == 1 and f.dst_reg == 1

    bits = f.to_trace_representation()
    assert len(bits) == 16 and bits[15] == 0
    flags_word = 0x208B7FFF7FFF7FFE >> 48
    for j in range(15):
        assert bits[j] == (flags_word >> j) & 1


def test_binary_fixture_roundtrip():
    regs = RegisterStates.from_file(f"{REF_DATA}/mul_trace.out")
    mem = CairoMemory.from_file(f"{REF_DATA}/mul_mem.out")
    assert regs.steps > 0 and len(mem) > 0
    # first instruction is at pc of first row
    assert mem.get(regs.rows[0].pc) is not None
    # round trip the encoders
    assert RegisterStates.from_bytes_le(regs.to_bytes_le()).rows == regs.rows
    assert CairoMemory.from_bytes_le(mem.to_bytes_le()).data == mem.data


def test_vm_runs_simple_and_mul():
    regs, mem, size, builtins = run_program(simple_program())
    assert regs.steps == 4  # 3 asserts + ret
    # 1 + 2 = 3 stored at the third ap cell
    regs2, mem2, _, _ = run_program(mul_program())
    assert regs2.steps == 4


def test_vm_fibonacci():
    regs, mem, size, _ = run_program(fibonacci_program(5))
    # fib(1,1,5): first=1,second=1 -> after 5 iters second = fib = 13
    # The final `ret` leaves the result at [ap-1]
    final_ap = regs.rows[-1].ap
    assert mem.get(final_ap - 1) == 13
    regs10, mem10, _, _ = run_program(fibonacci_program(10))
    assert mem10.get(regs10.rows[-1].ap - 1) == 144


def test_vm_rc_builtin():
    regs, mem, size, builtins = run_program(rc_program((250, 77, 1 << 100)))
    assert "range_check" in builtins
    rng = builtins["range_check"]
    assert [mem.get(a) for a in rng] == [250, 77, 1 << 100]
