"""Cairo program runner glue (reference src/cairo/runner/run.rs:242-263).

`generate_prover_args` runs a program on the built-in VM, builds public
inputs and the main trace.  Programs can come from compiled Cairo0 JSON
(`Program.from_json`) or from the hand-assembled generators in programs.py.
Raw VM output (binary `.trace`/`.memory` files produced by cairo-vm) can be
ingested with `generate_prover_args_from_trace_files`."""

from __future__ import annotations

from enum import Enum

from .air import PublicInputs
from .cairo_mem import CairoMemory
from .execution_trace import build_main_trace
from .register_states import RegisterStates
from .vm import Program, run_program


class CairoVersion(Enum):
    V0 = 0
    V1 = 1


class CairoLayout(Enum):
    """Cairo builtin layouts (reference src/cairo/cairo_layout.rs, with the
    builtin sets cairo-vm associates to each layout name).  A program's
    declared builtins must be a subset of the layout's, in layout order —
    the same validation cairo-vm performs when instantiating a runner."""

    Plain = "plain"
    Small = "small"
    Dex = "dex"
    Recursive = "recursive"
    Starknet = "starknet"
    StarknetWithKeccak = "starknet_with_keccak"
    RecursiveLargeOutput = "recursive_large_output"
    AllCairo = "all_cairo"
    AllSolidity = "all_solidity"
    Dynamic = "dynamic"

    @property
    def builtins(self) -> list[str]:
        return _LAYOUT_BUILTINS[self]


# cairo-lang's instance definitions (builtin order is part of the layout)
_LAYOUT_BUILTINS = {
    CairoLayout.Plain: [],
    CairoLayout.Small: ["output", "pedersen", "range_check", "ecdsa"],
    CairoLayout.Dex: ["output", "pedersen", "range_check", "ecdsa"],
    CairoLayout.Recursive: ["output", "pedersen", "range_check", "bitwise"],
    CairoLayout.Starknet: ["output", "pedersen", "range_check", "ecdsa",
                           "bitwise", "ec_op", "poseidon"],
    CairoLayout.StarknetWithKeccak: ["output", "pedersen", "range_check",
                                     "ecdsa", "bitwise", "ec_op", "keccak",
                                     "poseidon"],
    CairoLayout.RecursiveLargeOutput: ["output", "pedersen", "range_check",
                                       "bitwise"],
    CairoLayout.AllCairo: ["output", "pedersen", "range_check", "ecdsa",
                           "bitwise", "ec_op", "keccak", "poseidon",
                           "range_check96", "add_mod", "mul_mod"],
    CairoLayout.AllSolidity: ["output", "pedersen", "range_check", "ecdsa",
                              "bitwise", "ec_op"],
    CairoLayout.Dynamic: ["output", "pedersen", "range_check", "ecdsa",
                          "bitwise", "ec_op", "keccak", "poseidon"],
}


def validate_layout(program: Program, layout: CairoLayout) -> None:
    """Check the program's builtins against the layout (order + subset),
    as cairo-vm does when building a runner for that layout string."""
    from .vm import CairoVMError

    allowed = layout.builtins
    try:
        positions = [allowed.index(b) for b in program.builtins]
    except ValueError:
        bad = [b for b in program.builtins if b not in allowed]
        raise CairoVMError(
            f"builtins {bad} not present in layout '{layout.value}'"
        )
    if positions != sorted(positions):
        raise CairoVMError(
            f"program builtins {program.builtins} out of layout order for "
            f"'{layout.value}' (expected order {allowed})"
        )


def generate_prover_args(program: Program | bytes | str, output_range=None,
                         cairo_version: CairoVersion = CairoVersion.V0,
                         layout: CairoLayout | None = None):
    """Returns (main_trace: TraceTable, pub_inputs: PublicInputs).

    ``cairo_version=CairoVersion.V1`` treats `program` as a compiled CASM
    contract class and runs its first EXTERNAL entrypoint (reference
    run.rs:242-263 with the V1 arm of run_program).

    ``layout`` defaults per version as the reference does (run.rs:247-250:
    V0 -> Small, V1 -> Plain).  For V0 it is validated against the
    program's declared builtins; the V1 entrypoint path ignores it —
    contract builtins come from the entrypoint record, not the layout,
    mirroring cairo-vm's run_from_entrypoint."""
    if cairo_version is CairoVersion.V1:
        from .casm import CasmContractClass, run_casm_entrypoint

        casm = (program if isinstance(program, CasmContractClass)
                else CasmContractClass.from_json(program))
        register_states, memory, program_size, builtin_ranges = (
            run_casm_entrypoint(casm))
    else:
        if not isinstance(program, Program):
            program = Program.from_json(program)
        if layout is None:
            layout = CairoLayout.Small  # reference run.rs:247-250
        validate_layout(program, layout)
        from . import native as native_vm

        # the C++ VM (bit-identical outputs, tests/test_native_vm.py) does
        # the per-step interpretation ~50x faster; it handles the output and
        # range-check builtin segments, while deduction builtins (bitwise,
        # pedersen, ec_op) and hinted programs use the python VM (deduction
        # rules + hint processor live there)
        if (native_vm.available()
                and set(program.builtins) <= {"output", "range_check"}
                and not program.hints):
            register_states, memory, program_size, builtin_ranges = (
                native_vm.run_program_native(program))
        else:
            register_states, memory, program_size, builtin_ranges = (
                run_program(program))

    memory_segments = {}
    if "range_check" in builtin_ranges:
        rng = builtin_ranges["range_check"]
        memory_segments["range_check"] = range(rng.start, rng.stop)
    if output_range is not None:
        memory_segments["output"] = output_range
    elif "output" in builtin_ranges:
        memory_segments["output"] = builtin_ranges["output"]

    pub_inputs = PublicInputs.from_regs_and_mem(
        register_states, memory, program_size, memory_segments
    )
    main_trace = build_main_trace(register_states, memory, pub_inputs)
    return main_trace, pub_inputs


def generate_prover_args_from_trace_files(
    trace_path: str, memory_path: str, program_size: int, memory_segments=None
):
    """Ingest cairo-vm binary trace/memory files (register_states.rs:51-78,
    cairo_mem.rs:35-61 formats)."""
    register_states = RegisterStates.from_file(trace_path)
    memory = CairoMemory.from_file(memory_path)
    pub_inputs = PublicInputs.from_regs_and_mem(
        register_states, memory, program_size, memory_segments or {}
    )
    main_trace = build_main_trace(register_states, memory, pub_inputs)
    return main_trace, pub_inputs
