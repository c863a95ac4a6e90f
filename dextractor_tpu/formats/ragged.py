"""Ragged <-> padded-rectangle conversions (host side, vectorized NumPy).

TPU kernels want rectangular (N, Lpad) layouts with a length vector; file
containers want tightly packed variable-length byte runs.  These helpers are
the bridge and are used by every codec.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class Ragged:
    """A batch of variable-length u8 rows stored flat."""

    flat: np.ndarray      # (total,) u8
    lengths: np.ndarray   # (N,) int64

    @property
    def offsets(self) -> np.ndarray:
        off = np.zeros(len(self.lengths) + 1, np.int64)
        np.cumsum(self.lengths, out=off[1:])
        return off

    def padded(self, align: int = 512, pad_value: int = 0) -> np.ndarray:
        return pad_rows(self.flat, self.lengths, align=align, pad_value=pad_value)


def next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def bucket_len(x: int, floor: int = 512) -> int:
    """Round up to quarter-power-of-two granularity (512, 640, ..., 1024,
    1280, 1536, 1792, 2048, 2560, ...).

    Pow2 bucketing wastes up to 2x serial decode work (the chains run
    group-steps for the whole padded length); quarter steps cap the waste
    at 25% while keeping at most 4 compiled shapes per doubling."""
    x = max(int(x), floor)
    gran = max(floor // 8, next_pow2(x) // 8)
    return (x + gran - 1) // gran * gran


def pad_rows(flat: np.ndarray, lengths: np.ndarray, align: int = 512,
             pad_value: int = 0, bucket: bool = False) -> np.ndarray:
    """Scatter flat ragged rows into an (N, Lpad) rectangle.

    With ``bucket``, Lpad is rounded to quarter-octave granularity (kept
    a multiple of ``align``) so jitted device programs see few distinct
    shapes while the kernels process at most ~12.5% dead lanes — pow2
    bucketing made the fused emit kernels run up to 2x past every row's
    end.
    """
    n = len(lengths)
    lpad = max(int(lengths.max(initial=0)), 1)
    lpad = _round_up(lpad, align)
    if bucket:
        lpad = _round_up(lpad, max(align, next_pow2(lpad) // 8))
    out = np.full((n, lpad), pad_value, dtype=flat.dtype)
    total = int(lengths.sum())
    if total:
        starts = np.zeros(n, np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        col = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
        out[row, col] = flat[:total]
    return out


def rows_to_flat(rows: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Gather the first lengths[i] items of each row into one flat array."""
    n, lpad = rows.shape
    total = int(lengths.sum())
    if not total:
        return np.empty(0, rows.dtype)
    starts = np.zeros(n, np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    row = np.repeat(np.arange(n, dtype=np.int64), lengths)
    col = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    return rows[row, col]


def flat_gather_lens(flat: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Gather ragged runs flat[starts[i] : starts[i]+lengths[i]] concatenated."""
    total = int(lengths.sum())
    if not total:
        return np.empty(0, flat.dtype)
    starts = np.asarray(starts, np.int64)
    lengths = np.asarray(lengths, np.int64)
    # the native memcpy path cannot bounds-check; malformed runs (e.g. a
    # corrupt container yielding negative lengths) must take the NumPy
    # path below, which raises instead of corrupting the heap
    valid = bool(len(starts) == len(lengths)
                 and (lengths >= 0).all() and (starts >= 0).all()
                 and (starts + lengths <= len(flat)).all())
    if flat.dtype.itemsize == 1 and valid:
        try:          # one memcpy per run; the fancy-index gather below
            from ..native import qv_encode_shim   # costs ~16 index bytes/byte
            import ctypes

            lib = qv_encode_shim()
            out = np.empty(total, flat.dtype)
            ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
            lib.dxt_gather_copy(
                ptr(out), ptr(np.ascontiguousarray(flat)),
                ptr(np.ascontiguousarray(starts, np.int64)),
                ptr(np.ascontiguousarray(lengths, np.int64)), len(lengths))
            return out
        except OSError:
            pass
    run_starts = np.zeros(len(lengths), np.int64)
    np.cumsum(lengths[:-1], out=run_starts[1:])
    idx = np.arange(total, dtype=np.int64) - np.repeat(run_starts, lengths) + np.repeat(starts, lengths)
    return flat[idx]
