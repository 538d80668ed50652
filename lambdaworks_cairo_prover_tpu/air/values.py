"""Field-value wrapper so AIR constraints are written once and evaluated both
on device (whole-LDE-domain limb tensors) and on host (out-of-domain scalars).

The reference evaluates `compute_transition` per frame point
(evaluator.rs:189-255); here the same constraint code runs as whole-array JAX
ops over the domain axis (device ctx) or as python-int arithmetic (host ctx,
used by the verifier on the OOD frame)."""

from __future__ import annotations

import jax.numpy as jnp

from ..field import device as fd
from ..field.params import P


class FV:
    """A field value bound to an evaluation context."""

    __slots__ = ("ctx", "v")

    def __init__(self, ctx, v):
        self.ctx = ctx
        self.v = v

    def _coerce(self, other):
        if isinstance(other, FV):
            return other
        if isinstance(other, int):
            return self.ctx.const(other)
        raise TypeError(f"cannot coerce {type(other)}")

    def __add__(self, other):
        o = self._coerce(other)
        return FV(self.ctx, self.ctx.add(self.v, o.v))

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        return FV(self.ctx, self.ctx.sub(self.v, o.v))

    def __rsub__(self, other):
        o = self._coerce(other)
        return FV(self.ctx, self.ctx.sub(o.v, self.v))

    def __mul__(self, other):
        o = self._coerce(other)
        return FV(self.ctx, self.ctx.mul(self.v, o.v))

    __rmul__ = __mul__

    def __neg__(self):
        return FV(self.ctx, self.ctx.sub(self.ctx.const(0).v, self.v))

    def inv(self):
        return FV(self.ctx, self.ctx.inv(self.v))


class DeviceCtx:
    """Values are (16, ...) uint32 Montgomery limb tensors."""

    def __init__(self, batch_shape=()):
        self.batch_shape = tuple(batch_shape)
        self._const_cache: dict[int, jnp.ndarray] = {}

    def const(self, c: int) -> FV:
        c = c % P
        if c not in self._const_cache:
            arr = jnp.asarray(fd.from_int(c)).reshape(
                (16,) + (1,) * len(self.batch_shape)
            )
            self._const_cache[c] = arr
        return FV(self, self._const_cache[c])

    def wrap(self, arr) -> FV:
        return FV(self, arr)

    def lift(self, v) -> FV:
        """int -> baked constant; array -> runtime value."""
        if isinstance(v, int):
            return self.const(v)
        return FV(self, v.reshape((16,) + (1,) * len(self.batch_shape)))

    add = staticmethod(fd.add)
    sub = staticmethod(fd.sub)
    mul = staticmethod(fd.mul)
    inv = staticmethod(fd.inv)


class HostCtx:
    """Values are python ints mod P."""

    def const(self, c: int) -> FV:
        return FV(self, c % P)

    def wrap(self, v: int) -> FV:
        return FV(self, v % P)

    def lift(self, v) -> FV:
        return FV(self, v % P)

    @staticmethod
    def add(a, b):
        return (a + b) % P

    @staticmethod
    def sub(a, b):
        return (a - b) % P

    @staticmethod
    def mul(a, b):
        return (a * b) % P

    @staticmethod
    def inv(a):
        return pow(a, P - 2, P)
