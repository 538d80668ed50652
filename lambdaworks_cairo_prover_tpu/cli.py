"""Command-line driver (reference src/main.rs).

  python -m lambdaworks_cairo_prover_tpu.cli prove <program.json> <out.proof>
  python -m lambdaworks_cairo_prover_tpu.cli verify <proof_file>
  python -m lambdaworks_cairo_prover_tpu.cli prove_and_verify <program.json>

Proof files use the reference wire format: len(8B BE) ‖ proof ‖ pub_inputs.
"""

from __future__ import annotations

import sys
import time


def _prove(input_path: str):
    from .cairo.air import generate_cairo_proof
    from .cairo.runner import CairoVersion, generate_prover_args
    from .proof.options import ProofOptions

    with open(input_path, "rb") as f:
        content = f.read()
    # `.casm` files are Cairo1 contract classes (reference main.rs:16-18)
    version = CairoVersion.V1 if ".casm" in input_path else CairoVersion.V0
    if version is CairoVersion.V1:
        print("Running casm on CairoVM and generating trace ...")
    options = ProofOptions.default_test_options()
    t0 = time.perf_counter()
    main_trace, pub_inputs = generate_prover_args(content,
                                                  cairo_version=version)
    proof = generate_cairo_proof(main_trace, pub_inputs, options)
    print(f"Time spent in proving: {time.perf_counter() - t0:.2f}s")
    return proof, pub_inputs, options


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("Usage: cli <prove|verify|prove_and_verify> [arguments]")
        return 1

    from .cairo.air import PublicInputs, verify_cairo_proof
    from .proof.options import ProofOptions
    from .proof.serde import read_proof_file, write_proof_file

    command = argv[0]
    if command == "prove":
        if len(argv) < 3:
            print("Usage: cli prove <input_path> <output_path>")
            return 1
        proof, pub_inputs, _ = _prove(argv[1])
        with open(argv[2], "wb") as f:
            f.write(write_proof_file(proof, pub_inputs.serialize()))
        print(f"Proof written to {argv[2]}")
        return 0

    if command == "verify":
        if len(argv) < 2:
            print("Usage: cli verify <input_path>")
            return 1
        with open(argv[1], "rb") as f:
            data = f.read()
        proof, rest = read_proof_file(data)
        pub_inputs = PublicInputs.deserialize(rest)
        options = ProofOptions.default_test_options()
        t0 = time.perf_counter()
        ok = verify_cairo_proof(proof, pub_inputs, options)
        print(f"Time spent in verifying: {time.perf_counter() - t0:.2f}s")
        print("Verification succeded" if ok else "Verification failed")
        return 0 if ok else 1

    if command == "prove_and_verify":
        if len(argv) < 2:
            print("Usage: cli prove_and_verify <input_path>")
            return 1
        proof, pub_inputs, options = _prove(argv[1])
        ok = verify_cairo_proof(proof, pub_inputs, options)
        print("Verification succeded" if ok else "Verification failed")
        return 0 if ok else 1

    print(f"Unknown command: {command}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
