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


def _numpy_parse(data: bytes, arrow: bool):
    """parse_seq_file with the native fast path disabled."""
    from unittest import mock

    with mock.patch.object(fa, "_parse_seq_file_native", lambda d, a: None):
        return fa.parse_seq_file(data, arrow=arrow)


@pytest.mark.parametrize("arrow", [False, True])
def test_native_seq_scan_matches_numpy_parse(arrow):
    _native()
    rng = np.random.default_rng(11)
    lines = []
    lengths = [0, 1, 3, 79, 80, 81, 200, 0, 45]
    sym = "1234" if arrow else "acgt"
    for i, ln in enumerate(lengths):
        if arrow:
            lines.append(f">mov/{i * 3}/5_{5 + ln} SN=1.25,0.50,10.00,3.75")
        else:
            # every other read omits the optional RQ field
            tail = "" if i % 2 else f" RQ=0.{700 + i}"
            lines.append(f">mov/{i * 3}/5_{5 + ln}{tail}")
        s = "".join(sym[k] for k in rng.integers(0, 4, ln))
        for j in range(0, ln, 80):
            lines.append(s[j:j + 80])
    data = ("\n".join(lines) + "\n").encode()

    got = fa.parse_seq_file(data, arrow=arrow)
    exp = _numpy_parse(data, arrow)
    assert got.prefix == exp.prefix
    np.testing.assert_array_equal(got.wells, exp.wells)
    np.testing.assert_array_equal(got.begs, exp.begs)
    np.testing.assert_array_equal(got.ends, exp.ends)
    if arrow:
        np.testing.assert_array_equal(got.snrs, exp.snrs)
    else:
        np.testing.assert_array_equal(got.qvs, exp.qvs)
    np.testing.assert_array_equal(got.seqs.lengths, exp.seqs.lengths)
    np.testing.assert_array_equal(got.seqs.flat, exp.seqs.flat)


def test_native_seq_scan_error_paths():
    _native()
    from dextractor_tpu.utils.errors import FormatError

    for bad in (b"", b">h/1/0_4 RQ=0.1\nacgt", b"acgt\n"):
        with pytest.raises(FormatError):
            fa.parse_seq_file(bad)
    with pytest.raises(FormatError):
        _numpy_parse(b"acgt\n>h/1/0_4\nacgt\n", False)


def test_threaded_pack_matches_single_thread(monkeypatch):
    """The >=8MB chunk-threaded dxt_pack_seq path must stay byte-identical
    to the single-call path, including skewed lengths and empty chunks."""
    _native()
    from dextractor_tpu.codecs import twobit_codec as tc

    rng = np.random.default_rng(21)
    # one long read among many short ones exercises byte-balanced bounds
    lengths = np.concatenate([[40000], rng.integers(0, 50, 300),
                              [0, 1, 2, 3], rng.integers(0, 50, 300)]).astype(np.int64)
    flat = np.frombuffer(b"acgt" * ((int(lengths.sum()) + 3) // 4), np.uint8)
    flat = flat[: int(lengths.sum())].copy()
    lut = np.zeros(256, np.uint8)
    lut[ord("a")], lut[ord("c")], lut[ord("g")], lut[ord("t")] = 0, 1, 2, 3

    single, cl1 = tc._pack_batch(flat, lengths, lut, device=False)
    monkeypatch.setattr(tc, "_PACK_THREAD_MIN_BYTES", 1)
    threaded, cl2 = tc._pack_batch(flat, lengths, lut, device=False)
    np.testing.assert_array_equal(cl1, cl2)
    np.testing.assert_array_equal(single, threaded)


def test_flat_gather_lens_rejects_malformed_runs():
    """Negative lengths / out-of-range starts must raise (NumPy semantics),
    never reach the native memcpy."""
    from dextractor_tpu.formats.ragged import flat_gather_lens

    flat = np.arange(100, dtype=np.uint8)
    with pytest.raises(ValueError):
        flat_gather_lens(flat, np.array([0, 50, 60]), np.array([10, -2, 5]))
    with pytest.raises(IndexError):
        flat_gather_lens(flat, np.array([0, 98]), np.array([10, 10]))
