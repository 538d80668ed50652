"""Host polynomial helpers, incl. the reference FRI fold test vector
(fri_functions.rs:38-63, ported from the 293-field to direct checks)."""

import random

from lambdaworks_cairo_prover_tpu.field.params import P
from lambdaworks_cairo_prover_tpu.ntt import poly_host as ph

rng = random.Random(11)


def test_ruffini_and_long_division_agree():
    coeffs = [rng.randrange(P) for _ in range(9)]
    a = rng.randrange(P)
    # make divisible: q = coeffs - eval at a
    rem = ph.evaluate(coeffs, a)
    exact = list(coeffs)
    exact[0] = (exact[0] - rem) % P
    q1 = ph.ruffini_division(exact, a)
    q2, r2 = ph.long_division(exact, [(-a) % P, 1])
    assert q1 == q2 and r2 == []
    # q * (X - a) == exact
    assert ph.mul(q1, [(-a) % P, 1]) == ph.trim(exact)


def test_fold_polynomial_reference_vector():
    # reference fri_functions.rs test, lifted to Stark252: fold of
    # p0 = 3 + x + 2x^2 + 7x^3 + 3x^4 + 5x^5 with beta=4
    p0 = [3, 1, 2, 7, 3, 5]
    p1 = ph.fold_polynomial(p0, 4)
    assert p1 == [3 + 4 * 1, 2 + 4 * 7, 3 + 4 * 5]
    p2 = ph.fold_polynomial(p1, 3)
    assert p2 == [(3 + 4) + 3 * (2 + 28), 23]
    p3 = ph.fold_polynomial(p2, 2)
    assert ph.degree(p3) == 0


def test_even_odd_decomposition():
    coeffs = [rng.randrange(P) for _ in range(10)]
    h1, h2 = ph.even_odd_decomposition(coeffs)
    z = rng.randrange(P)
    lhs = ph.evaluate(coeffs, z)
    rhs = (ph.evaluate(h1, z * z % P) + z * ph.evaluate(h2, z * z % P)) % P
    assert lhs == rhs
