"""Native C++ Cairo VM vs python VM: identical traces, memory, and ranges."""

import pytest

from lambdaworks_cairo_prover_tpu.cairo import native
from lambdaworks_cairo_prover_tpu.cairo.programs import (
    fibonacci_program,
    mul_program,
    rc_program,
    simple_program,
)
from lambdaworks_cairo_prover_tpu.cairo.vm import run_program

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


@pytest.mark.parametrize(
    "program",
    [simple_program(), mul_program(), fibonacci_program(5),
     fibonacci_program(50), rc_program((250, 77, 1 << 100))],
    ids=["simple", "mul", "fib5", "fib50", "rc"],
)
def test_native_matches_python(program):
    regs_py, mem_py, size_py, builtins_py = run_program(program)
    regs_nat, mem_nat, size_nat, builtins_nat = native.run_program_native(program)
    assert size_py == size_nat
    assert regs_py.rows == regs_nat.rows
    assert mem_py.data == mem_nat.data
    rc_py = builtins_py.get("range_check")
    rc_nat = builtins_nat.get("range_check")
    assert (rc_py is None) == (rc_nat is None)
    if rc_py is not None:
        assert (rc_py.start, rc_py.stop) == (rc_nat.start, rc_nat.stop)
