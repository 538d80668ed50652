"""Evaluation domains (reference src/starks/domain.rs).

Host-side scalars (roots, orders) plus lazily-built device arrays for the
LDE coset values and their powers."""

from __future__ import annotations

import jax.numpy as jnp

from ..field import device as fd
from ..field.params import P, get_primitive_root_of_unity
from ..ntt import core as nttc


class Domain:
    def __init__(self, air):
        options = air.options()
        self.blowup_factor = int(options.blowup_factor)
        self.coset_offset = int(options.coset_offset) % P
        self.interpolation_domain_size = air.trace_length()
        n = air.trace_length()
        self.root_order = n.bit_length() - 1
        assert 1 << self.root_order == n, "trace length must be a power of two"
        self.trace_primitive_root = get_primitive_root_of_unity(self.root_order)
        self.lde_root_order = (n * self.blowup_factor).bit_length() - 1
        self.lde_size = n * self.blowup_factor
        self.lde_primitive_root = get_primitive_root_of_unity(self.lde_root_order)
        self._cache: dict = {}

    # -- device arrays ------------------------------------------------------

    def lde_values(self) -> jnp.ndarray:
        """(16, N) Montgomery limbs of h * w^i over the LDE coset."""
        if "lde_values" not in self._cache:
            pw = nttc.offset_powers(self.lde_primitive_root, self.lde_size)
            off = jnp.asarray(fd.from_int(self.coset_offset))
            self._cache["lde_values"] = fd.mul(pw, off)
        return self._cache["lde_values"]

    def lde_pow(self, exponent: int) -> jnp.ndarray:
        """(16, N) array of d_i^exponent for d_i in the LDE coset.

        d_i^e = h^e * (w^e)^i: one cached powers table + scalar scale."""
        key = ("lde_pow", exponent)
        if key not in self._cache:
            we = pow(self.lde_primitive_root, exponent, P)
            he = pow(self.coset_offset, exponent, P)
            pw = fd.powers(we, self.lde_size)
            self._cache[key] = fd.mul(pw, jnp.asarray(fd.from_int(he)))
        return self._cache[key]

    # -- host scalars -------------------------------------------------------

    def trace_root_pow(self, step: int) -> int:
        return pow(self.trace_primitive_root, step, P)

    def lde_point(self, index: int) -> int:
        return (
            self.coset_offset * pow(self.lde_primitive_root, index, P)
        ) % P

    def contains_in_lde_coset(self, z: int) -> bool:
        h_inv = pow(self.coset_offset, P - 2, P)
        return pow(z * h_inv % P, self.lde_size, P) == 1

    def contains_in_trace_roots(self, z: int) -> bool:
        return pow(z, self.interpolation_domain_size, P) == 1
