"""TPU-native STARK prover/verifier framework for Cairo programs.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
`lambdaclass/lambdaworks_cairo_prover` (the Starknet Stack Prover): a generic
AIR-parameterized STARK engine over the Stark252 field, a Cairo frontend, and
TPU-first bulk math (limb-vectorized field ops, NTT-based polynomial ops,
batched Keccak Merkle commitments), with host-side Fiat-Shamir and verifier.
"""

__version__ = "0.1.0"
