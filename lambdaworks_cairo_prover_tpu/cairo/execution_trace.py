"""Cairo main-trace builder (reference src/cairo/execution_trace.rs).

Builds the 33/34-column main trace from register states + memory: decoded
flag bits, computed operands (dst/op0/op1/res), derived columns (t0/t1/mul),
range-check hole filling, memory hole filling, public-memory dummy rows and
power-of-two padding.  Column layout (reference execution_trace.rs:39-51):

  0-15  flags, 16 res, 17 ap, 18 fp, 19 pc, 20 dst_addr, 21 op0_addr,
  22 op1_addr, 23 inst, 24 dst, 25 op0, 26 op1, 27-29 offsets, 30 t0,
  31 t1, 32 mul, 33 selector [, 34-41 rc_0..rc_7, 42 rc_value]
"""

from __future__ import annotations

from ..air.trace import TraceTable
from ..field import host as fh
from ..field.params import P
from .cairo_mem import CairoMemory
from .decode import (
    InstructionFlags, InstructionOffsets, OP1_SRC_AP, OP1_SRC_FP, OP1_SRC_IMM,
    OP1_SRC_OP0, OPCODE_ASSERT_EQ, OPCODE_CALL, PC_JNZ, RES_ADD, RES_MUL,
    RES_OP1,
)
from .register_states import RegisterStates

# column indices (mirror reference air.rs:93-121)
FRAME_RES = 16
FRAME_AP = 17
FRAME_FP = 18
FRAME_PC = 19
FRAME_DST_ADDR = 20
FRAME_OP0_ADDR = 21
FRAME_OP1_ADDR = 22
FRAME_INST = 23
FRAME_DST = 24
FRAME_OP0 = 25
FRAME_OP1 = 26
OFF_DST = 27
OFF_OP0 = 28
OFF_OP1 = 29
FRAME_T0 = 30
FRAME_T1 = 31
FRAME_MUL = 32
FRAME_SELECTOR = 33

ADDR_COLUMNS = [FRAME_PC, FRAME_DST_ADDR, FRAME_OP0_ADDR, FRAME_OP1_ADDR]
MEMORY_COLUMNS = [
    FRAME_PC, FRAME_DST_ADDR, FRAME_OP0_ADDR, FRAME_OP1_ADDR,
    FRAME_INST, FRAME_DST, FRAME_OP0, FRAME_OP1,
]


def build_cairo_execution_trace(
    raw_trace: RegisterStates, memory: CairoMemory, public_inputs
) -> list[list[int]]:
    """Returns trace as a list of int columns (33/34 cols x n_steps)."""
    n = raw_trace.steps
    rows = raw_trace.rows

    flags = []
    offsets = []
    for r in rows:
        inst = memory.get(r.pc)
        if inst is None:
            raise ValueError(f"no instruction at pc {r.pc}")
        flags.append(InstructionFlags.decode(inst))
        offsets.append(InstructionOffsets.decode(inst))

    dst_addrs, dsts = _compute_dst(flags, offsets, rows, memory)
    op0_addrs, op0s = _compute_op0(flags, offsets, rows, memory)
    op1_addrs, op1s = _compute_op1(flags, offsets, rows, memory, op0s)
    res = _compute_res(flags, op0s, op1s, dsts)

    # update op0/dst/res for call and assert_eq (execution_trace.rs:570-592)
    for i, f in enumerate(flags):
        if f.opcode == OPCODE_CALL:
            instruction_size = 2 if f.op1_src == OP1_SRC_IMM else 1
            op0s[i] = (rows[i].pc + instruction_size) % P
            dsts[i] = rows[i].fp % P
        elif f.opcode == OPCODE_ASSERT_EQ:
            res[i] = dsts[i]

    flag_cols = [[f.to_trace_representation()[j] for f in flags] for j in range(16)]
    offset_reprs = [o.to_trace_representation() for o in offsets]
    off_cols = [[o[j] for o in offset_reprs] for j in range(3)]

    aps = [r.ap % P for r in rows]
    fps = [r.fp % P for r in rows]
    pcs = [r.pc % P for r in rows]
    instructions = [memory.get(r.pc) for r in rows]

    t0 = [flag_cols[9][i] * dsts[i] % P for i in range(n)]
    t1 = [t0[i] * res[i] % P for i in range(n)]
    mul = [op0s[i] * op1s[i] % P for i in range(n)]
    selector = [1] * (n - 1) + [0]

    trace_cols = (
        flag_cols
        + [res, aps, fps, pcs, dst_addrs, op0_addrs, op1_addrs, instructions,
           dsts, op0s, op1s]
        + off_cols
        + [t0, t1, mul, selector]
    )

    rc_range = public_inputs.memory_segments.get("range_check")
    if rc_range is not None:
        _add_rc_builtin_columns(trace_cols, rc_range, memory)

    return trace_cols


def _compute_dst(flags, offsets, rows, memory):
    addrs, vals = [], []
    for f, o, r in zip(flags, offsets, rows):
        base = r.fp if f.dst_reg else r.ap
        addr = base + o.off_dst
        addrs.append(addr % P)
        vals.append(memory.get(addr))
    return addrs, vals


def _compute_op0(flags, offsets, rows, memory):
    addrs, vals = [], []
    for f, o, r in zip(flags, offsets, rows):
        base = r.fp if f.op0_reg else r.ap
        addr = base + o.off_op0
        addrs.append(addr % P)
        vals.append(memory.get(addr))
    return addrs, vals


def _compute_op1(flags, offsets, rows, memory, op0s):
    addrs, vals = [], []
    for f, o, r, op0 in zip(flags, offsets, rows, op0s):
        if f.op1_src == OP1_SRC_OP0:
            base = op0
        elif f.op1_src == OP1_SRC_IMM:
            base = r.pc
        elif f.op1_src == OP1_SRC_AP:
            base = r.ap
        elif f.op1_src == OP1_SRC_FP:
            base = r.fp
        else:
            raise ValueError("invalid op1_src")
        addr = base + o.off_op1
        addrs.append(addr % P)
        vals.append(memory.get(addr))
    return addrs, vals


def _compute_res(flags, op0s, op1s, dsts):
    res = []
    for f, op0, op1, dst in zip(flags, op0s, op1s, dsts):
        if f.pc_update == PC_JNZ:
            # res slot holds dst^-1 (whitepaper section 9.5)
            res.append(0 if dst == 0 else pow(dst, P - 2, P))
        elif f.res_logic == RES_OP1:
            res.append(op1)
        elif f.res_logic == RES_ADD:
            res.append((op0 + op1) % P)
        elif f.res_logic == RES_MUL:
            res.append(op0 * op1 % P)
        else:
            raise ValueError("invalid res_logic")
    return res


def _add_rc_builtin_columns(trace_cols, rc_range, memory):
    """rc_0..rc_7 16-bit limb decomposition + rc_value columns
    (execution_trace.rs:358-379, 604-624)."""
    n = len(trace_cols[0])
    values = [memory.get(addr) for addr in rc_range]
    for limb in range(8):
        col = [(v >> (16 * limb)) & 0xFFFF for v in values]
        col += [0] * (n - len(col))
        trace_cols.append(col)
    vals_col = list(values) + [0] * (n - len(values))
    trace_cols.append(vals_col)


def get_rc_holes(trace_cols) -> tuple[list[int], int, int]:
    """Missing offset values to make the range contiguous
    (execution_trace.rs:136-173); returns (holes padded to x3, min, max)."""
    offset_vals = sorted(
        trace_cols[OFF_DST] + trace_cols[OFF_OP0] + trace_cols[OFF_OP1]
    )
    holes = []
    for a, b in zip(offset_vals, offset_vals[1:]):
        if b != a:
            holes.extend(range(a + 1, b))
    pad = ((len(holes) + 2) // 3) * 3 - len(holes)
    holes.extend([offset_vals[-1]] * pad)
    return holes, offset_vals[0], offset_vals[-1]


def fill_rc_holes(trace_cols, holes) -> None:
    """Appends rows with holes in the offset columns, zeros elsewhere."""
    n_new = len(holes) // 3
    for c, col in enumerate(trace_cols):
        if c == OFF_DST:
            col.extend(holes[0::3])
        elif c == OFF_OP0:
            col.extend(holes[1::3])
        elif c == OFF_OP1:
            col.extend(holes[2::3])
        else:
            col.extend([0] * n_new)


def get_memory_holes(sorted_addrs: list[int], codelen: int) -> list[int]:
    """Unaccessed addresses inside the touched range, excluding the program
    segment (execution_trace.rs:195-222)."""
    holes = []
    prev = sorted_addrs[0]
    for addr in sorted_addrs:
        diff = addr - prev
        if diff not in (0, 1) and addr > codelen:
            for hole in range(prev + 1, addr):
                if hole > codelen:
                    holes.append(hole)
        prev = addr
    return holes


def fill_memory_holes(trace_cols, memory_holes: list[int]) -> None:
    """Pads with the last row, placing hole addresses into address columns."""
    n_addr = len(ADDR_COLUMNS)
    padding_size = -(-len(memory_holes) // n_addr)
    it = iter(memory_holes)
    last_row = [col[-1] for col in trace_cols]
    for _ in range(padding_size):
        row = list(last_row)
        for a_col in ADDR_COLUMNS:
            hole = next(it, None)
            if hole is not None:
                row[a_col] = hole
        for c, col in enumerate(trace_cols):
            col.append(row[c])


def add_pub_memory_dummy_accesses(trace_cols, pub_memory_len: int) -> None:
    """(0,0) dummy accesses for public memory (whitepaper 9.8);
    (pub_memory_len >> 2) + 1 rows padded with last row, memory cols zero."""
    n_rows = (pub_memory_len >> 2) + 1
    last_row = [col[-1] for col in trace_cols]
    for c in MEMORY_COLUMNS:
        last_row[c] = 0
    for _ in range(n_rows):
        for c, col in enumerate(trace_cols):
            col.append(last_row[c])


def pad_with_last_row(trace_cols, number_rows: int) -> None:
    last_row = [col[-1] for col in trace_cols]
    for _ in range(number_rows):
        for c, col in enumerate(trace_cols):
            col.append(last_row[c])


def build_main_trace(
    raw_trace: RegisterStates, memory: CairoMemory, public_inputs
) -> TraceTable:
    """Reference build_main_trace (execution_trace.rs:57-87)."""
    trace_cols = build_cairo_execution_trace(raw_trace, memory, public_inputs)

    address_cols = sorted(
        trace_cols[FRAME_PC] + trace_cols[FRAME_DST_ADDR]
        + trace_cols[FRAME_OP0_ADDR] + trace_cols[FRAME_OP1_ADDR]
    )

    holes, rc_min, rc_max = get_rc_holes(trace_cols)
    public_inputs.range_check_min = rc_min
    public_inputs.range_check_max = rc_max
    fill_rc_holes(trace_cols, holes)

    memory_holes = get_memory_holes(address_cols, len(public_inputs.public_memory))
    if memory_holes:
        fill_memory_holes(trace_cols, memory_holes)

    add_pub_memory_dummy_accesses(trace_cols, len(public_inputs.public_memory))

    n_rows = len(trace_cols[0])
    target = 1 if n_rows <= 1 else 1 << (n_rows - 1).bit_length()
    pad_with_last_row(trace_cols, target - n_rows)

    return TraceTable.from_int_columns(trace_cols)
