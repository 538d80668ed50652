"""Output-builtin programs: segment handling, public memory, prove+verify."""

from lambdaworks_cairo_prover_tpu.cairo.air import (
    CairoAIR,
    CairoRAPChallenges,
    generate_cairo_proof,
    verify_cairo_proof,
)
from lambdaworks_cairo_prover_tpu.cairo.programs import output_program
from lambdaworks_cairo_prover_tpu.cairo.runner import generate_prover_args
from lambdaworks_cairo_prover_tpu.cairo.vm import run_program
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.debug import validate_trace


def test_output_program_runs_and_validates():
    program = output_program((42, 123))
    regs, mem, size, builtins = run_program(program)
    rng = builtins["output"]
    assert [mem.get(a) for a in rng] == [42, 123]

    main_trace, pub = generate_prover_args(program)
    # output cells join the public memory
    out_addrs = list(pub.memory_segments["output"])
    assert all(a in pub.public_memory for a in out_addrs)
    assert [pub.public_memory[a] for a in out_addrs] == [42, 123]

    options = ProofOptions.default_test_options()
    air = CairoAIR(main_trace.n_rows, pub, options)
    assert not air.has_rc_builtin
    ch = CairoRAPChallenges(111, 222, 333)
    aux = air.build_auxiliary_trace(main_trace, ch)
    assert validate_trace(air, main_trace, aux, ch)


def test_output_program_prove_verify():
    main_trace, pub = generate_prover_args(output_program((42, 123)))
    options = ProofOptions.default_test_options()
    proof = generate_cairo_proof(main_trace, pub, options)
    assert verify_cairo_proof(proof, pub, options)

    # tampering with the claimed output must break the proof
    import copy

    bad = copy.deepcopy(pub)
    out_addr = next(iter(bad.memory_segments["output"]))
    bad.public_memory[out_addr] = 999
    assert not verify_cairo_proof(proof, bad, options)
