"""Debug oracles (reference src/starks/debug.rs): pointwise trace
validation and boundary-poly divisibility."""

from lambdaworks_cairo_prover_tpu.air.examples.simple_fibonacci import (
    FibonacciAIR,
    FibonacciPublicInputs,
    fibonacci_trace,
)
from lambdaworks_cairo_prover_tpu.proof.options import ProofOptions
from lambdaworks_cairo_prover_tpu.prover.debug import (
    check_boundary_polys_divisibility,
    validate_trace,
)


class _ProbeT:
    def challenge(self):
        return b"\x01" * 32

    def append(self, data):
        pass


def _setup(values):
    trace = fibonacci_trace(values, 8)
    air = FibonacciAIR(8, FibonacciPublicInputs(a0=1, a1=1),
                       ProofOptions.default_test_options())
    rc = air.build_rap_challenges(_ProbeT())
    aux = air.build_auxiliary_trace(trace, rc)
    return air, trace, aux, rc


def test_valid_trace_passes_both_oracles():
    air, trace, aux, rc = _setup([1, 1])
    assert validate_trace(air, trace, aux, rc)
    assert check_boundary_polys_divisibility(air, trace, aux, rc)


def test_corrupted_trace_fails_divisibility(capsys):
    air, _, aux, rc = _setup([1, 1])
    bad = fibonacci_trace([1, 3], 8)  # wrong a1 vs the boundary values
    assert not check_boundary_polys_divisibility(air, bad, aux, rc)
    assert "not divisible" in capsys.readouterr().out
