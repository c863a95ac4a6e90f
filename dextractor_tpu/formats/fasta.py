"""Vectorized .fasta / .arrow text parsing and writing (host control plane).

The reference streams these files line-by-line with fgets/sscanf
(dexta.c:102-205, dexar.c:101-211, undexta.c:175-271, undexar.c:158-229).
Here whole files are parsed with NumPy newline scans and assembled with
ragged scatters, so the host side keeps up with the TPU codec kernels.

Header grammar (after the first '/'): ``well/beg_end RQ=0.qv`` for fasta
(qv optional, defaults 0 — dexta.c:151-157) and ``well/beg_end SN=a,b,c,d``
for arrow (all fields required — dexar.c:152-157).  The stored prefix is the
first header up to (not including) the first '/', and *includes* the leading
'>' (dexta.c:118-129).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..utils.errors import FormatError
from .ragged import Ragged

_NUM = rb"[-+]?\d+"
_FLT = rb"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"

_FASTA_HDR = re.compile(
    rb"(" + _NUM + rb")/(" + _NUM + rb")_(" + _NUM + rb")"
    rb"(?:\s*RQ=0\.\s*(" + _NUM + rb"))?"
)
_ARROW_HDR = re.compile(
    rb"(" + _NUM + rb")/(" + _NUM + rb")_(" + _NUM + rb")"
    rb"\s*SN=\s*(" + _FLT + rb"),\s*(" + _FLT + rb"),\s*(" + _FLT + rb"),\s*(" + _FLT + rb")"
)


@dataclass
class SeqFile:
    """A parsed .fasta or .arrow file."""

    prefix: bytes             # first header up to first '/', including '>'
    wells: np.ndarray         # (N,) int32
    begs: np.ndarray          # (N,) int32
    ends: np.ndarray          # (N,) int32
    qvs: np.ndarray | None    # (N,) int32 (fasta) or None (arrow)
    snrs: np.ndarray | None   # (N, 4) float32 (arrow) or None (fasta)
    seqs: Ragged              # ascii symbol bytes, newline-free


def _split_lines(data: bytes):
    buf = np.frombuffer(data, np.uint8)
    if buf.size == 0:
        raise FormatError("empty sequence file")
    if buf[-1] != 10:
        raise FormatError("last line does not end with a newline")
    ends = np.flatnonzero(buf == 10)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    return buf, starts, ends


def parse_seq_file(data: bytes, arrow: bool = False) -> SeqFile:
    """Parse a .fasta (arrow=False) or .arrow (arrow=True) file."""
    buf, starts, ends = _split_lines(data)
    is_hdr = buf[starts] == ord(">")
    if not is_hdr[0]:
        raise FormatError("first header in file is missing")
    hdr_idx = np.flatnonzero(is_hdr)
    n = len(hdr_idx)

    # record id for every line, then per-sequence-byte
    rec_of_line = np.cumsum(is_hdr) - 1
    line_lens = ends - starts                       # without newline
    seq_mask = ~is_hdr
    seq_line_lens = np.where(seq_mask, line_lens, 0)
    lengths = np.bincount(rec_of_line, weights=seq_line_lens, minlength=n).astype(np.int64)

    # gather all sequence bytes (drop header lines and newlines): one
    # memcpy per sequence line via the native shim; the NumPy fallback
    # builds a whole-file keep mask (two 8-byte-per-input-byte passes)
    seq_idx = np.flatnonzero(seq_mask)
    s_starts = np.ascontiguousarray(starts[seq_idx].astype(np.int64))
    s_lens = np.ascontiguousarray(line_lens[seq_idx].astype(np.int64))
    total = int(s_lens.sum())
    flat = None
    try:
        from ..native import qv_encode_shim
        import ctypes

        lib = qv_encode_shim()
        flat = np.empty(max(total, 1), np.uint8)[:total]
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        lib.dxt_gather_copy(ptr(flat), ptr(buf), ptr(s_starts),
                            ptr(s_lens), len(seq_idx))
    except OSError:
        pass
    if flat is None:
        keep = np.ones(len(buf), bool)
        keep[ends] = False                          # newlines
        if n:
            hdr_starts = starts[hdr_idx]
            hdr_ends = ends[hdr_idx]
            delta = np.zeros(len(buf) + 1, np.int64)
            delta[hdr_starts] += 1
            delta[hdr_ends] -= 1
            keep &= np.cumsum(delta[:-1]) == 0
        flat = buf[keep]

    # parse headers
    wells = np.zeros(n, np.int32)
    begs = np.zeros(n, np.int32)
    ends_f = np.zeros(n, np.int32)
    qvs = np.zeros(n, np.int32) if not arrow else None
    snrs = np.zeros((n, 4), np.float32) if arrow else None
    pattern = _ARROW_HDR if arrow else _FASTA_HDR
    prefix = b""
    data_mv = memoryview(data)
    for i, (hs, he) in enumerate(zip(starts[hdr_idx], ends[hdr_idx])):
        line = bytes(data_mv[hs:he])
        slash = line.find(b"/")
        if slash < 0:
            raise FormatError("header line incorrectly formatted ?")
        if i == 0:
            prefix = line[:slash]
        m = pattern.match(line, slash + 1)
        if m is None:
            raise FormatError("header line incorrectly formatted ?")
        wells[i] = int(m.group(1))
        begs[i] = int(m.group(2))
        ends_f[i] = int(m.group(3))
        if arrow:
            snrs[i] = [np.float32(m.group(k)) for k in (4, 5, 6, 7)]
        elif m.group(4) is not None:
            qvs[i] = int(m.group(4))

    return SeqFile(prefix=prefix, wells=wells, begs=begs, ends=ends_f,
                   qvs=qvs, snrs=snrs, seqs=Ragged(flat, lengths))


def format_headers(prefix: bytes, wells, begs, ends, qvs=None, snrs=None) -> list[bytes]:
    """Per-read header lines (no trailing newline).

    fasta: ``prefix/well/beg_end RQ=0.qv`` (undexta.c:242);
    arrow: ``prefix/well/beg_end SN=%.2f,%.2f,%.2f,%.2f`` (undexar.c:202).
    """
    out = []
    if snrs is None:
        for w, b, e, q in zip(wells.tolist(), begs.tolist(), ends.tolist(), qvs.tolist()):
            out.append(prefix + f"/{w}/{b}_{e} RQ=0.{q}".encode())
    else:
        for w, b, e, s in zip(wells.tolist(), begs.tolist(), ends.tolist(), snrs.tolist()):
            out.append(
                prefix + f"/{w}/{b}_{e} SN={s[0]:.2f},{s[1]:.2f},{s[2]:.2f},{s[3]:.2f}".encode()
            )
    return out


def write_seq_file(headers: list[bytes], symbols: np.ndarray, lengths: np.ndarray,
                   width: int = 80) -> bytes:
    """Assemble a .fasta/.arrow text image with ``width``-wrapped lines.

    ``symbols`` is the (N, Lpad) ascii rectangle.  The whole image is built
    with one ragged scatter; newline positions are simply the bytes never
    written (the buffer is pre-filled with '\\n').
    """
    n = len(headers)
    lengths = lengths.astype(np.int64)
    if width <= 0:
        width = 1 << 62                     # no wrap within a read
    nlines = np.maximum((lengths + width - 1) // width, 0)
    hdr_lens = np.array([len(h) for h in headers], np.int64)
    blk_lens = hdr_lens + 1 + lengths + nlines   # header + \n + seq + newlines
    blk_off = np.zeros(n + 1, np.int64)
    np.cumsum(blk_lens, out=blk_off[1:])

    out = np.full(int(blk_off[-1]), ord("\n"), np.uint8)

    # headers
    hdr_flat = np.frombuffer(b"".join(headers), np.uint8)
    total_h = int(hdr_lens.sum())
    if total_h:
        h_starts = np.zeros(n, np.int64)
        np.cumsum(hdr_lens[:-1], out=h_starts[1:])
        pos = (np.arange(total_h, dtype=np.int64)
               - np.repeat(h_starts, hdr_lens)
               + np.repeat(blk_off[:-1], hdr_lens))
        out[pos] = hdr_flat

    # sequence symbols: dst = blk_off + hdr_len + 1 + j + j//width
    total_s = int(lengths.sum())
    if total_s:
        s_starts = np.zeros(n, np.int64)
        np.cumsum(lengths[:-1], out=s_starts[1:])
        j = np.arange(total_s, dtype=np.int64) - np.repeat(s_starts, lengths)
        base = np.repeat(blk_off[:-1] + hdr_lens + 1, lengths)
        row = np.repeat(np.arange(n, dtype=np.int64), lengths)
        col = j
        out[base + j + j // width] = symbols[row, col]

    return out.tobytes()
