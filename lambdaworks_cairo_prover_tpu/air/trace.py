"""Execution-trace table resident on device.

Column-major limb tensor of shape (16, n_cols, n_rows) in Montgomery form —
the TPU-native counterpart of the reference's row-major `TraceTable`
(src/starks/trace.rs:9-13).  Column-major keeps per-column NTTs contiguous
along the transform axis; Merkle row leaves transpose on the fly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import functools

import jax

from ..field import device as fd
from ..field.params import N_LIMBS
from ..ntt import core as nttc


@functools.partial(jax.jit, static_argnames=("small_idx", "felt_idx"))
def _assemble_columns(small, felt, small_idx, felt_idx):
    """(n_small, n_rows, 2) u32 + (n_felt, n_rows, 8) u32 LE words ->
    Montgomery (16, n_cols, n_rows) u32 limbs, columns restored to
    original order.  (u32 word pairs, not u64: jax runs with x64 off.)"""

    def words_to_limbs(x, n_limbs):
        return jnp.stack(
            [(x[..., L // 2] >> (16 * (L % 2))) & 0xFFFF
             for L in range(n_limbs)])

    parts = []
    if small.shape[0]:
        lo = words_to_limbs(small, 4)                 # (4, n_small, n_rows)
        pad = jnp.zeros((N_LIMBS - 4,) + lo.shape[1:], jnp.uint32)
        parts.append(jnp.concatenate([lo, pad], axis=0))
    if felt.shape[0]:
        parts.append(words_to_limbs(felt, N_LIMBS))   # (16, n_felt, n_rows)
    raw = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    order = list(small_idx) + list(felt_idx)
    perm = np.argsort(np.asarray(order))
    raw = jnp.take(raw, jnp.asarray(perm), axis=1)
    # resident traces are PACKED (8, cols, n) — at 2^20 rows the Cairo main
    # trace is 2.28 GB unpacked, 1.14 GB packed; consumers shape-detect
    return fd.pack(fd.to_mont(raw))


class TraceTable:
    def __init__(self, data: jnp.ndarray):
        # data: (16, n_cols, n_rows) Montgomery limbs, or the packed
        # (8, n_cols, n_rows) u32 layout (fd.pack) from_int_columns emits
        assert data.ndim == 3 and data.shape[0] in (N_LIMBS, N_LIMBS // 2)
        self.data = data

    def unpacked(self) -> jnp.ndarray:
        """(16, n_cols, n_rows) view regardless of the resident layout."""
        return fd.unpack(self.data) if self.data.shape[0] == 8 else self.data

    # -- constructors -------------------------------------------------------

    @classmethod
    def empty(cls) -> "TraceTable":
        return cls(jnp.zeros((N_LIMBS, 0, 0), dtype=jnp.uint32))

    @classmethod
    def from_int_columns(cls, cols: list[list[int]]) -> "TraceTable":
        """Vectorized ingest, transfer-minimal: columns that fit u64
        (registers, addresses, offsets, flags, instructions) ship as ONE
        u64 word per value and full-width felt columns as four u64 words
        (32 B/felt) — the 16-limb u32 expansion (64 B/felt) and the
        Montgomery conversion happen ON DEVICE.  Cuts host->device bytes
        ~5x vs shipping the unpacked limb tensor (the device_put of the
        1.4 GB raw array was 13.6 s of fib(70000)'s 23 s trace build over
        the tunneled link)."""
        n_rows = len(cols[0])
        small_idx: list[int] = []
        small_arrs: list[np.ndarray] = []
        felt_idx: list[int] = []
        felt_arrs: list[np.ndarray] = []
        for c, col in enumerate(cols):
            try:
                a = np.asarray(col, dtype=np.uint64)
            except (OverflowError, TypeError):
                buf = b"".join(v.to_bytes(32, "little") for v in col)
                w = np.frombuffer(buf, dtype="<u4").reshape(n_rows, 8)
                felt_idx.append(c)
                felt_arrs.append(w)
                continue
            small_idx.append(c)
            small_arrs.append(
                np.ascontiguousarray(a).view(np.uint32).reshape(n_rows, 2))
        small = (np.stack(small_arrs) if small_arrs
                 else np.zeros((0, n_rows, 2), np.uint32))
        felt = (np.stack(felt_arrs) if felt_arrs
                else np.zeros((0, n_rows, 8), np.uint32))
        data = _assemble_columns(
            jnp.asarray(small), jnp.asarray(felt),
            tuple(small_idx), tuple(felt_idx))
        return cls(data)

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
        d = self.data[:, idx, :]
        return fd.unpack(d) if d.shape[0] == 8 else d

    def get_row_ints(self, row_idx: int) -> list[int]:
        d = self.data[:, :, row_idx]
        return fd.to_ints(fd.unpack(d) if d.shape[0] == 8 else d)

    def to_int_columns(self) -> list[list[int]]:
        # fetch the RESIDENT layout (packed = half the transfer) and unpack
        # host-side — an on-device whole-trace unpack would spike HBM by
        # the full 16-limb copy exactly when memory is tightest
        raw = np.asarray(self.data)
        if raw.shape[0] == N_LIMBS // 2:
            un = np.empty((N_LIMBS,) + raw.shape[1:], np.uint32)
            un[0::2] = raw & 0xFFFF
            un[1::2] = raw >> 16
            raw = un
        flat = fd.to_ints(raw.reshape(N_LIMBS, -1))
        out = []
        for c in range(self.n_cols):
            out.append(flat[c * self.n_rows : (c + 1) * self.n_rows])
        return out

    def concatenate(self, other: "TraceTable") -> "TraceTable":
        return TraceTable(jnp.concatenate([self.data, other.data], axis=1))

    # -- polynomial ops -----------------------------------------------------

    def compute_trace_polys(self) -> jnp.ndarray:
        """Per-column interpolation: (16, n_cols, n_rows) coefficient tensor."""
        return nttc.interpolate_fft(self.unpacked())
