"""Execution-trace table resident on device.

Column-major limb tensor of shape (16, n_cols, n_rows) in Montgomery form —
the TPU-native counterpart of the reference's row-major `TraceTable`
(src/starks/trace.rs:9-13).  Column-major keeps per-column NTTs contiguous
along the transform axis; Merkle row leaves transpose on the fly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import device as fd
from ..field.params import N_LIMBS
from ..ntt import core as nttc


class TraceTable:
    def __init__(self, data: jnp.ndarray):
        # data: (16, n_cols, n_rows), Montgomery limbs
        assert data.ndim == 3 and data.shape[0] == N_LIMBS
        self.data = data

    # -- constructors -------------------------------------------------------

    @classmethod
    def empty(cls) -> "TraceTable":
        return cls(jnp.zeros((N_LIMBS, 0, 0), dtype=jnp.uint32))

    @classmethod
    def from_int_columns(cls, cols: list[list[int]]) -> "TraceTable":
        n_rows = len(cols[0])
        flat = [v for col in cols for v in col]
        arr = fd.from_ints(flat)  # (16, n_cols*n_rows)
        return cls(jnp.asarray(arr.reshape(N_LIMBS, len(cols), n_rows)))

    @classmethod
    def from_columns(cls, cols: list[jnp.ndarray]) -> "TraceTable":
        """cols: list of (16, n_rows) Montgomery limb arrays."""
        return cls(jnp.stack(cols, axis=1))

    # -- accessors ----------------------------------------------------------

    @property
    def n_cols(self) -> int:
        return self.data.shape[1]

    @property
    def n_rows(self) -> int:
        return self.data.shape[2]

    def is_empty(self) -> bool:
        return self.n_cols == 0

    def col(self, idx: int) -> jnp.ndarray:
        return self.data[:, idx, :]

    def get_row_ints(self, row_idx: int) -> list[int]:
        return fd.to_ints(self.data[:, :, row_idx])

    def to_int_columns(self) -> list[list[int]]:
        flat = fd.to_ints(self.data.reshape(N_LIMBS, -1))
        out = []
        for c in range(self.n_cols):
            out.append(flat[c * self.n_rows : (c + 1) * self.n_rows])
        return out

    def concatenate(self, other: "TraceTable") -> "TraceTable":
        return TraceTable(jnp.concatenate([self.data, other.data], axis=1))

    # -- polynomial ops -----------------------------------------------------

    def compute_trace_polys(self) -> jnp.ndarray:
        """Per-column interpolation: (16, n_cols, n_rows) coefficient tensor."""
        return nttc.interpolate_fft(self.data)
