"""Cairo1 CASM contract-class loading and entrypoint execution (reference
src/cairo/runner/run.rs:102-191, `CairoVersion::V1` arm).

A `CasmContractClass` JSON (`cairo-lang-starknet` compiled contract) carries
felt bytecode for the same CPU instruction set as Cairo0, plus per-pc hint
lists and entrypoint descriptors.  `run_casm_entrypoint` mirrors the
reference's function-runner setup behavior:

- program / execution segments, then one segment per entrypoint builtin
  (range_check for the standard external entrypoint);
- implicit args ``[*builtin_ptrs, initial_gas, syscall_ptr]`` with
  ``initial_gas = usize::MAX`` (run.rs:133-137);
- a builtin-costs segment of five zeros, pointed to by two extra words
  ``[ret_opcode, builtin_costs_ptr]`` appended after the bytecode
  (run.rs:141-152);
- an (empty) calldata segment, passed as ``[calldata_start, calldata_end]``
  (run.rs:154-167);
- a function call frame: args, return fp and a fresh end segment on the
  stack, ``fp = ap = execution_base + len(stack)``, ``pc = entrypoint``
  (cairo-vm `run_from_entrypoint` / `initialize_function_entrypoint`).

Only the deterministic core-library hints the Cairo1 compiler emits for
control flow are interpreted (`AllocSegment`, `TestLessThan`,
`TestLessThanOrEqual` — cairo-vm's `Cairo1HintProcessor` subset); anything
else raises, as the reference's prover pipeline has no syscall handler
either."""

from __future__ import annotations

import json

from ..field.params import P
from .vm import CairoVM, CairoVMError, Program, Relocatable

USIZE_MAX = (1 << 64) - 1
RET_OPCODE = 0x208B7FFF7FFF7FFE


class CasmContractClass:
    """Parsed `cairo-lang-starknet` CASM contract class."""

    def __init__(self, bytecode, hints, entrypoints):
        self.bytecode = bytecode          # list[int] felts
        self.hints = hints                # dict[pc_offset] -> list[hint dict]
        self.entrypoints = entrypoints    # list of {"offset": int, "builtins": [...]}

    @classmethod
    def from_json(cls, content: bytes | str) -> "CasmContractClass":
        obj = json.loads(content)
        bytecode = [int(x, 16) for x in obj["bytecode"]]
        hints = {int(pc): hs for pc, hs in obj.get("hints", [])}
        eps = [
            {"offset": ep["offset"], "builtins": ep.get("builtins", [])}
            for ep in obj.get("entry_points_by_type", {}).get("EXTERNAL", [])
        ]
        return cls(bytecode, hints, eps)


def _cell_addr(ref, ap, fp):
    base = ap if ref["register"].upper() == "AP" else fp
    return base + ref["offset"]


def _res_value(vm, operand, ap, fp):
    """Resolve a hint ResOperand to a felt/relocatable."""
    if "Immediate" in operand:
        return int(operand["Immediate"], 16) % P
    if "Deref" in operand:
        v = vm.mem_get(_cell_addr(operand["Deref"], ap, fp))
        if v is None:
            raise CairoVMError("hint deref of unknown cell")
        return v
    if "DoubleDeref" in operand:
        inner, off = operand["DoubleDeref"]
        ptr = vm.mem_get(_cell_addr(inner, ap, fp))
        if not isinstance(ptr, Relocatable):
            raise CairoVMError("hint double-deref through non-pointer")
        return vm.mem_get(ptr + off)
    if "BinOp" in operand:
        b = operand["BinOp"]
        a = _res_value(vm, {"Deref": b["a"]}, ap, fp)
        rhs = _res_value(vm, b["b"], ap, fp)
        if b["op"] == "Add":
            return CairoVM._add(a, rhs)
        if b["op"] == "Mul":
            return CairoVM._mul(a, rhs)
        raise CairoVMError(f"unsupported hint binop {b['op']}")
    raise CairoVMError(f"unsupported hint operand {list(operand)}")


def _as_int(v) -> int:
    if isinstance(v, Relocatable):
        raise CairoVMError("hint comparison on a relocatable")
    return v


def _compile_hint(hint: dict):
    """One core-library hint dict -> callable(vm, ap, fp)."""
    (kind, body), = hint.items()

    if kind == "AllocSegment":
        dst = body["dst"]

        def run_alloc(vm, ap, fp):
            vm.mem_set(_cell_addr(dst, ap, fp), vm.add_segment())

        return run_alloc

    if kind in ("TestLessThan", "TestLessThanOrEqual"):
        lhs, rhs, dst = body["lhs"], body["rhs"], body["dst"]
        strict = kind == "TestLessThan"

        def run_cmp(vm, ap, fp):
            a = _as_int(_res_value(vm, lhs, ap, fp))
            b = _as_int(_res_value(vm, rhs, ap, fp))
            ok = a < b if strict else a <= b
            vm.mem_set(_cell_addr(dst, ap, fp), 1 if ok else 0)

        return run_cmp

    raise CairoVMError(f"unsupported Cairo1 hint {kind!r}")


def _compile_hints(hint_lists: dict[int, list]):
    out = {}
    for pc, hints in hint_lists.items():
        compiled = [_compile_hint(h) for h in hints]

        def run_all(vm, ap, fp, _c=compiled):
            for h in _c:
                h(vm, ap, fp)

        out[pc] = run_all
    return out


def run_casm_entrypoint(casm: CasmContractClass, entrypoint_idx: int = 0,
                        max_steps: int = 1 << 24):
    """Execute an EXTERNAL entrypoint; returns the same 4-tuple as
    `vm.run_program` (register states, memory, data_len, builtin ranges)."""
    if not casm.entrypoints:
        raise CairoVMError("contract has no EXTERNAL entrypoints")
    ep = casm.entrypoints[entrypoint_idx]

    program = Program(data=list(casm.bytecode), main_pc=ep["offset"],
                      builtins=list(ep["builtins"]))
    vm = CairoVM(program)
    vm.hints = _compile_hints(casm.hints)

    program_base = vm.add_segment()
    execution_base = vm.add_segment()
    for i, word in enumerate(program.data):
        vm.mem_set(program_base + i, word)

    builtin_ptrs = []
    for name in ep["builtins"]:
        base = vm.add_segment()
        vm.builtin_bases[name] = base
        builtin_ptrs.append(base)

    syscall_ptr = vm.add_segment()

    builtin_costs_ptr = vm.add_segment()
    for i in range(5):
        vm.mem_set(builtin_costs_ptr + i, 0)

    # extra words after the bytecode: a `ret` and the builtin-costs pointer
    vm.mem_set(program_base + len(program.data), RET_OPCODE)
    vm.mem_set(program_base + len(program.data) + 1, builtin_costs_ptr)

    calldata_start = vm.add_segment()
    calldata_end = calldata_start  # no calldata

    stack = [*builtin_ptrs, USIZE_MAX, syscall_ptr, calldata_start,
             calldata_end]
    return_fp = vm.add_segment()
    end = vm.add_segment()
    stack.extend([return_fp, end])
    for i, v in enumerate(stack):
        vm.mem_set(execution_base + i, v)

    ap = fp = execution_base + len(stack)
    pc = program_base + ep["offset"]
    vm.run_until(pc, ap, fp, end, max_steps)

    register_states, memory, _, builtin_ranges = vm.relocate()
    # data_len excludes the two extra words (run.rs:213 uses the program's
    # own data length for the public-memory code segment)
    return register_states, memory, len(casm.bytecode), builtin_ranges
