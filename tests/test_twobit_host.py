"""Native 2-bit host helpers vs their NumPy formulations.

dxt_pack_seq / dxt_unpack_text carry the CPU-only deployments; pin them
to the rectangle-based NumPy paths on edge shapes (empty reads, len%4,
width larger than the read, width=1).
"""

import numpy as np
import pytest

from dextractor_tpu.formats import fasta as fa
from dextractor_tpu.ops import twobit as tb


def _native():
    try:
        from dextractor_tpu.native import twobit_host_shim

        return twobit_host_shim()
    except OSError:
        pytest.skip("native shim unavailable")


def test_pack_seq_matches_numpy():
    lib = _native()
    import ctypes

    ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    rng = np.random.default_rng(5)
    lengths = np.array([0, 1, 2, 3, 4, 5, 17, 80, 81, 0, 123], np.int64)
    total = int(lengths.sum())
    sym = np.frombuffer(b"acgt", np.uint8)[rng.integers(0, 4, total)].copy()
    offs = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=offs[1:])
    clens = (lengths + 3) >> 2
    out = np.empty(int(clens.sum()), np.uint8)
    out_lens = np.zeros(len(lengths), np.int64)
    r = lib.dxt_pack_seq(ptr(sym), ptr(offs), len(lengths),
                         ptr(np.ascontiguousarray(tb.NUMBER_BASE_LUT)),
                         ptr(out), len(out), ptr(out_lens))
    assert r == int(clens.sum())
    assert (out_lens == clens).all()
    # NumPy reference: per-read rectangle pack
    from dextractor_tpu.formats.ragged import pad_rows, rows_to_flat

    rows = pad_rows(sym, lengths, align=4, bucket=False)
    exp = rows_to_flat(tb.pack_2bit_np(tb.NUMBER_BASE_LUT[rows], lengths),
                       clens)
    assert (out[:r] == exp).all()


@pytest.mark.parametrize("width", [1, 7, 80, 10_000])
def test_unpack_text_matches_write_seq_file(width):
    lib = _native()
    import ctypes

    ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    rng = np.random.default_rng(9)
    rlens = np.array([0, 1, 4, 5, 79, 80, 81, 200, 0], np.int64)
    clens = (rlens + 3) >> 2
    pay = rng.integers(0, 256, int(clens.sum())).astype(np.uint8)
    pay_offs = np.zeros(len(rlens) + 1, np.int64)
    np.cumsum(clens, out=pay_offs[1:])
    headers = [b">h/%d/0_%d RQ=0.800" % (i, r)
               for i, r in enumerate(rlens)]

    # NumPy reference through the rectangle path
    from dextractor_tpu.formats.ragged import pad_rows

    rows = pad_rows(pay, clens, align=1, bucket=False)
    sym = tb.LOWER_LUT[tb.unpack_2bit_np(rows)]
    exp = fa.write_seq_file(headers, sym, rlens, width=width)

    # native assembly
    nlines = (rlens + width - 1) // width
    hdr_lens = np.array([len(h) for h in headers], np.int64)
    blk = hdr_lens + 1 + rlens + nlines
    blk_off = np.zeros(len(rlens) + 1, np.int64)
    np.cumsum(blk, out=blk_off[1:])
    out = np.full(int(blk_off[-1]), ord("\n"), np.uint8)
    from dextractor_tpu.native import qv_encode_shim

    qe = qv_encode_shim()
    hdr_flat = np.frombuffer(b"".join(headers), np.uint8)
    qe.dxt_ragged_copy(ptr(out), ptr(np.ascontiguousarray(blk_off[:-1])),
                       ptr(hdr_flat), ptr(hdr_lens), len(rlens))
    seq_offs = np.ascontiguousarray(blk_off[:-1] + hdr_lens + 1)
    lib.dxt_unpack_text(ptr(pay), ptr(pay_offs),
                        ptr(np.ascontiguousarray(rlens)), len(rlens),
                        width, ptr(np.ascontiguousarray(tb.LOWER_LUT)),
                        ptr(out), ptr(seq_offs))
    assert out.tobytes() == exp
