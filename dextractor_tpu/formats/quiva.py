"""Vectorized .quiva text parsing/writing.

A .quiva entry is a '@' header line followed by exactly five equal-length
lines: delQV, delTag, insQV, mergeQV, subQV (reference Read_Lines QV.c:751-798,
QVcoding_Scan QV.c:922-1023).  Header grammar matches .fasta's
(``@prefix/well/beg_end RQ=0.qv`` — all four fields required, QV.c:964).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..utils.errors import FormatError
from .fasta import _NUM, _split_lines
from .ragged import Ragged

_QUIVA_HDR = re.compile(
    rb"(" + _NUM + rb")/(" + _NUM + rb")_(" + _NUM + rb")\s*RQ=0\.\s*(" + _NUM + rb")"
)


@dataclass
class QuivaFile:
    prefix: bytes              # first header up to first '/', including '@'
    wells: np.ndarray
    begs: np.ndarray
    ends: np.ndarray
    qvs: np.ndarray
    lengths: np.ndarray        # (N,) per-entry stream length
    streams: np.ndarray        # (5, total) u8: del, tag, ins, mrg, sub

    @property
    def n_entries(self) -> int:
        return len(self.lengths)

    def entry_stream(self, which: int, i: int) -> np.ndarray:
        off = np.zeros(len(self.lengths) + 1, np.int64)
        np.cumsum(self.lengths, out=off[1:])
        return self.streams[which, off[i]: off[i + 1]]


def parse_quiva(data: bytes) -> QuivaFile:
    buf, starts, ends = _split_lines(data)
    n_lines = len(starts)
    if n_lines % 6 != 0:
        raise FormatError("incomplete last entry of .quiv file")
    n = n_lines // 6
    hdr_starts = starts[0::6]
    if (buf[hdr_starts] != ord("@")).any():
        raise FormatError("header in quiva file is missing")

    line_lens = ends - starts
    lens6 = line_lens.reshape(n, 6)
    lengths = lens6[:, 1].astype(np.int64)
    if not (lens6[:, 1:] == lengths[:, None]).all():
        raise FormatError("lines for an entry are not the same length")

    total = int(lengths.sum())
    streams = np.empty((5, total), np.uint8)
    starts6 = starts.reshape(n, 6)
    if total:
        copied = False
        try:                          # one memcpy per line via the shim;
            from ..native import qv_encode_shim   # fallback: index gather

            import ctypes

            lib = qv_encode_shim()
            ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
            lens_c = np.ascontiguousarray(lengths)
            for s in range(5):
                src = np.ascontiguousarray(starts6[:, s + 1].astype(np.int64))
                lib.dxt_gather_copy(ptr(streams[s]), ptr(buf), ptr(src),
                                    ptr(lens_c), n)
            copied = True
        except OSError:
            pass
        if not copied:
            run_starts = np.zeros(n, np.int64)
            np.cumsum(lengths[:-1], out=run_starts[1:])
            rel = np.arange(total, dtype=np.int64) - np.repeat(run_starts,
                                                               lengths)
            for s in range(5):
                streams[s] = buf[np.repeat(starts6[:, s + 1], lengths) + rel]

    wells = np.zeros(n, np.int32)
    begs = np.zeros(n, np.int32)
    endf = np.zeros(n, np.int32)
    qvs = np.zeros(n, np.int32)
    prefix = b""
    mv = memoryview(data)
    for i, (hs, he) in enumerate(zip(hdr_starts, ends[0::6])):
        line = bytes(mv[hs:he])
        slash = line.find(b"/", 1)
        if slash < 0:
            raise FormatError("header line incorrectly formatted ?")
        if i == 0:
            prefix = line[:slash]
        m = _QUIVA_HDR.match(line, slash + 1)
        if m is None:
            raise FormatError("header line incorrectly formatted ?")
        wells[i] = int(m.group(1))
        begs[i] = int(m.group(2))
        endf[i] = int(m.group(3))
        qvs[i] = int(m.group(4))

    return QuivaFile(prefix, wells, begs, endf, qvs, lengths, streams)


_TEXT_BUF = None


def write_quiva(prefix: bytes, wells, begs, ends, qvs, lengths: np.ndarray,
                streams: np.ndarray) -> bytes:
    """Assemble a .quiva image from decoded streams (undexqv.c:182-207)."""
    n = len(wells)
    lengths = np.ascontiguousarray(lengths, np.int64)
    headers = [
        prefix + f"/{w}/{b}_{e} RQ=0.{q}".encode()
        for w, b, e, q in zip(np.asarray(wells).tolist(),
                              np.asarray(begs).tolist(),
                              np.asarray(ends).tolist(),
                              np.asarray(qvs).tolist())
    ]
    hdr_lens = np.array([len(h) for h in headers], np.int64)
    total_out = int(hdr_lens.sum()) + n + 5 * int(lengths.sum()) + 5 * n

    # fast path: the native memcpy assembler over the walker's stream-major
    # layout — the numpy scatter below moves 16 bytes of index per output
    # byte and fresh 20MB+ allocations fault slowly on this host
    if n and streams.ndim == 2 and streams.strides[1] == 1:
        try:
            from ..native import qv_decode_shim
            lib = qv_decode_shim()
        except OSError:
            lib = None
        if lib is not None:
            import ctypes

            global _TEXT_BUF
            if _TEXT_BUF is None or _TEXT_BUF.size < total_out:
                _TEXT_BUF = np.empty(max(total_out, 1 << 20), np.uint8)
            hdrs = np.frombuffer(b"".join(headers), np.uint8)

            def ptr(a):
                return a.ctypes.data_as(ctypes.c_void_p)

            nw = lib.dxt_quiva_text(
                streams.ctypes.data_as(ctypes.c_void_p),
                streams.strides[0], n, ptr(lengths),
                ptr(hdrs), ptr(hdr_lens), ptr(_TEXT_BUF))
            return _TEXT_BUF[:nw].tobytes()

    blk_lens = hdr_lens + 1 + 5 * (lengths + 1)
    blk_off = np.zeros(n + 1, np.int64)
    np.cumsum(blk_lens, out=blk_off[1:])
    out = np.full(int(blk_off[-1]), ord("\n"), np.uint8)

    total_h = int(hdr_lens.sum())
    if total_h:
        h_starts = np.zeros(n, np.int64)
        np.cumsum(hdr_lens[:-1], out=h_starts[1:])
        pos = (np.arange(total_h, dtype=np.int64) - np.repeat(h_starts, hdr_lens)
               + np.repeat(blk_off[:-1], hdr_lens))
        out[pos] = np.frombuffer(b"".join(headers), np.uint8)

    total = int(lengths.sum())
    if total:
        run_starts = np.zeros(n, np.int64)
        np.cumsum(lengths[:-1], out=run_starts[1:])
        rel = np.arange(total, dtype=np.int64) - np.repeat(run_starts, lengths)
        base = blk_off[:-1] + hdr_lens + 1
        for s in range(5):
            line_base = np.repeat(base + s * (lengths + 1), lengths)
            out[line_base + rel] = streams[s]
    return out.tobytes()
