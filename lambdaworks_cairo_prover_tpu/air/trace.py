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
        """Vectorized ingest: most trace columns (registers, addresses,
        offsets, flags, instructions) fit u64 and limb-split in numpy;
        arbitrary-felt columns take the bytes path; the Montgomery
        conversion runs as ONE device multiply by R^2 instead of a
        per-value host bigint mulmod (which dominated trace generation —
        27 s of a 33 s fib(10000) build)."""
        import jax

        n_rows = len(cols[0])
        n_cols = len(cols)
        raw = np.zeros((N_LIMBS, n_cols, n_rows), dtype=np.uint32)
        for c, col in enumerate(cols):
            try:
                a = np.asarray(col, dtype=np.uint64)
            except (OverflowError, TypeError):
                a = None
            if a is not None:
                for k in range(4):
                    raw[k, c] = (a >> np.uint64(16 * k)) & np.uint64(0xFFFF)
            else:
                buf = b"".join(v.to_bytes(32, "little") for v in col)
                limbs = np.frombuffer(buf, dtype="<u2").reshape(n_rows,
                                                                N_LIMBS)
                raw[:, c, :] = limbs.T
        return cls(jax.jit(fd.to_mont)(jnp.asarray(raw)))

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
