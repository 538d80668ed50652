"""Stark252 prime field parameters.

The field is GF(p) with p = 2^251 + 17*2^192 + 1 (the StarkWare/Cairo field).
Mirrors the capability surface of `lambdaworks-math`'s `Stark252PrimeField`
(reference usage: /root/reference/src/lib.rs:12-13, runner/run.rs:300-305).

Device representation: 16 little-endian limbs of 16 bits each, held in uint32
lanes, in Montgomery form with R = 2^256.  The prime is extremely sparse in
this basis — limbs [1, 0,...,0, 17, 0, 0, 2048] — and p = 1 (mod 2^16), so
Montgomery reduction needs no multiplications by p' ( -p^-1 mod 2^16 = 0xffff,
hence m_i = (-T_i) mod 2^16 ).
"""

# The STARK prime.
P = (1 << 251) + 17 * (1 << 192) + 1

N_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

# Montgomery constants, R = 2^256.
R = (1 << 256) % P
R2 = (R * R) % P
R_INV = pow(R, P - 2, P)

# Limbs of p (little-endian 16-bit).
P_LIMBS = [(P >> (LIMB_BITS * i)) & LIMB_MASK for i in range(N_LIMBS)]
assert P_LIMBS == [1] + [0] * 11 + [17, 0, 0, 2048]

# -p^-1 mod 2^256 (for single-shot Montgomery reduction m = T_lo * PINV).
P_INV_NEG = (-pow(P, -1, 1 << 256)) % (1 << 256)
P_INV_NEG_LIMBS = [(P_INV_NEG >> (LIMB_BITS * i)) & LIMB_MASK
                   for i in range(N_LIMBS)]

# Two-adicity: p - 1 = 2^192 * (2^59 + 17).
TWO_ADICITY = 192
# Canonical 2^192-th primitive root of unity used by lambdaworks-math
# (`Stark252PrimeField::TWO_ADIC_PRIMITVE_ROOT_OF_UNITY`).  It equals
# 3^((p-1)/2^192) mod p with generator 3; value verified below.
TWO_ADIC_ROOT = pow(3, (P - 1) >> TWO_ADICITY, P)
assert pow(TWO_ADIC_ROOT, 1 << TWO_ADICITY, P) == 1
assert pow(TWO_ADIC_ROOT, 1 << (TWO_ADICITY - 1), P) != 1

# Field metadata mirroring lambdaworks' `field_bit_size()` for Stark252 = 252.
FIELD_BIT_SIZE = P.bit_length()  # 252


def get_primitive_root_of_unity(order: int) -> int:
    """2^order-th primitive root of unity (lambdaworks `get_primitive_root_of_unity`)."""
    if order > TWO_ADICITY:
        raise ValueError(f"no 2^{order}-th root of unity")
    return pow(TWO_ADIC_ROOT, 1 << (TWO_ADICITY - order), P)
