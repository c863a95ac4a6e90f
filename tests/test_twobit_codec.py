"""Golden tests for the .dexta / .dexar codecs against the reference C tools."""

import numpy as np
import pytest

from conftest import make_fasta, make_arrow, run_ref

from dextractor_tpu.codecs import (
    encode_fasta_to_dexta,
    decode_dexta_to_fasta,
    encode_arrow_to_dexar,
    decode_dexar_to_arrow,
)
from dextractor_tpu.ops import twobit as tb


# ---------------------------------------------------------------------------
# kernel-level
# ---------------------------------------------------------------------------

def test_pack_unpack_np_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(7, 512), dtype=np.uint8)
    lengths = rng.integers(0, 513, size=7)
    packed = tb.pack_2bit_np(codes, lengths)
    unpacked = tb.unpack_2bit_np(packed)
    for i, l in enumerate(lengths):
        np.testing.assert_array_equal(unpacked[i, :l], codes[i, :l])


def test_pack_matches_jax():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(5, 256), dtype=np.uint8)
    lengths = rng.integers(0, 257, size=5)
    np.testing.assert_array_equal(
        tb.pack_2bit_np(codes, lengths),
        np.asarray(tb.pack_2bit(jnp.asarray(codes), jnp.asarray(lengths))))
    packed = tb.pack_2bit_np(codes, lengths)
    np.testing.assert_array_equal(
        tb.unpack_2bit_np(packed),
        np.asarray(tb.unpack_2bit(jnp.asarray(packed))))


@pytest.mark.parametrize("alphabet,lut", [
    ("base", tb.NUMBER_BASE_LUT), ("arrow", tb.NUMBER_ARROW_LUT)])
def test_pack_translate_all_bytes(alphabet, lut):
    """The arithmetic letter map must equal the reference LUT for EVERY
    byte value (reference DB.c:367-441), padded tails packing as zero."""
    import jax.numpy as jnp
    # rows covering all 256 byte values, plus a random soup
    rng = np.random.default_rng(3)
    rows = np.vstack([
        np.arange(256, dtype=np.uint8).reshape(2, 128),
        rng.integers(0, 256, size=(6, 128), dtype=np.uint8),
    ])
    lengths = np.array([128, 128, 0, 1, 63, 64, 127, 128], np.int64)
    got = np.asarray(tb.pack_translate(
        jnp.asarray(rows), jnp.asarray(lengths), alphabet=alphabet))
    want = tb.pack_2bit_np(lut[rows], lengths)
    np.testing.assert_array_equal(got, want)


def test_pack_translate_roundtrip_unpack():
    """pack_translate o unpack_translate is the identity on packed bytes."""
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    packed = rng.integers(0, 256, size=(9, 256), dtype=np.uint8)
    letters = np.asarray(tb.unpack_translate(
        jnp.asarray(packed), jnp.asarray(tb.LOWER_LUT)))
    lengths = np.full(9, 4 * 256, np.int64)
    again = np.asarray(tb.pack_translate(
        jnp.asarray(letters), jnp.asarray(lengths), alphabet="base"))
    np.testing.assert_array_equal(again, packed)


# ---------------------------------------------------------------------------
# golden byte-identity vs the C tools
# ---------------------------------------------------------------------------

CASES = [
    dict(n_reads=20, min_len=0, max_len=700),                  # odd lengths + empties
    dict(n_reads=40, min_len=1, max_len=9, well_jumps=True),    # tiny reads, 0xff escapes
    dict(n_reads=3, min_len=1000, max_len=5000),               # long reads
    dict(n_reads=10, min_len=0, max_len=100, with_rq=False),    # qv defaults to 0
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_dexta_golden(case, ref_tools, tmp_path):
    rng = np.random.default_rng(100 + case)
    fasta = make_fasta(rng, **CASES[case])
    (tmp_path / "g.fasta").write_bytes(fasta)
    run_ref(ref_tools, "dexta", ["-k", "g.fasta"], tmp_path)
    ref_dexta = (tmp_path / "g.dexta").read_bytes()

    ours = encode_fasta_to_dexta(fasta)
    assert ours == ref_dexta, "encoded .dexta differs from reference"

    # C decode of our encode reproduces the original
    (tmp_path / "h.dexta").write_bytes(ours)
    run_ref(ref_tools, "undexta", ["-k", "h.dexta"], tmp_path)
    ref_decoded = (tmp_path / "h.fasta").read_bytes()

    # our decode of the reference encode
    ours_decoded = decode_dexta_to_fasta(ref_dexta)
    assert ours_decoded == ref_decoded


def test_dexta_upper_and_width(ref_tools, tmp_path):
    rng = np.random.default_rng(7)
    fasta = make_fasta(rng, n_reads=8, max_len=333)
    (tmp_path / "g.fasta").write_bytes(fasta)
    run_ref(ref_tools, "dexta", ["-k", "g.fasta"], tmp_path)
    ref_dexta = (tmp_path / "g.dexta").read_bytes()
    run_ref(ref_tools, "undexta", ["-k", "-U", "-w60", "g.dexta"], tmp_path)
    ref_fasta = (tmp_path / "g.fasta").read_bytes()
    assert decode_dexta_to_fasta(ref_dexta, width=60, upper=True) == ref_fasta


def test_dexta_roundtrip_no_oracle():
    rng = np.random.default_rng(11)
    fasta = make_fasta(rng, n_reads=25, max_len=300)
    assert decode_dexta_to_fasta(encode_fasta_to_dexta(fasta)) == fasta


@pytest.mark.parametrize("seed", [0, 1])
def test_dexar_golden(seed, ref_tools, tmp_path):
    rng = np.random.default_rng(200 + seed)
    arrow = make_arrow(rng, n_reads=15, max_len=500)
    (tmp_path / "g.arrow").write_bytes(arrow)
    run_ref(ref_tools, "dexar", ["-k", "g.arrow"], tmp_path)
    ref_dexar = (tmp_path / "g.dexar").read_bytes()

    ours = encode_arrow_to_dexar(arrow)
    assert ours == ref_dexar, "encoded .dexar differs from reference"

    run_ref(ref_tools, "undexar", ["-k", "g.dexar"], tmp_path)
    ref_arrow = (tmp_path / "g.arrow").read_bytes()
    assert decode_dexar_to_arrow(ref_dexar) == ref_arrow


def test_legacy_dexta_decode(ref_tools, tmp_path):
    """Legacy 0x33cc containers carry uint16 beg/end/qv (undexta.c:140-159).
    Our encoder never writes them; our decoder and the C tool must agree."""
    import struct
    from dextractor_tpu.ops import twobit as tb2

    rng = np.random.default_rng(5)
    reads = []
    well = 0
    out = bytearray()
    prefix = b">legacy_movie"
    out += struct.pack("<H", 0x33CC)
    out += struct.pack("<i", len(prefix))
    out += prefix
    lwell = 0
    for i in range(6):
        well += int(rng.integers(0, 3))
        rlen = int(rng.integers(1, 200))
        beg = int(rng.integers(0, 50))
        seq = rng.integers(0, 4, rlen).astype(np.uint8)
        reads.append((well, beg, beg + rlen, seq))
        d = well - lwell
        while d >= 255:
            out.append(0xFF)
            d -= 255
        out.append(d)
        lwell = well
        out += struct.pack("<HHH", beg, beg + rlen, 7)
        padded = np.zeros((rlen + 3) & ~3, np.uint8)
        padded[:rlen] = seq
        out += tb2.pack_2bit_np(padded[None, :])[0].tobytes()

    (tmp_path / "g.dexta").write_bytes(bytes(out))
    run_ref(ref_tools, "undexta", ["-k", "g.dexta"], tmp_path)
    ref_fasta = (tmp_path / "g.fasta").read_bytes()
    assert decode_dexta_to_fasta(bytes(out)) == ref_fasta


def test_trim_db_with_cutoff(tmp_path):
    import os
    from conftest import make_bam
    from dextractor_tpu.cli.dex2DB import main as dex2db_main
    from dextractor_tpu.db import open_db, DB_BEST
    from dextractor_tpu.db.build import split_db

    rng = np.random.default_rng(33)
    bam, recs = make_bam(rng, n_reads=14, min_len=100, max_len=900)
    (tmp_path / "m.subreads.bam").write_bytes(bam)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert dex2db_main(["-eln>=0", "T2", "m.subreads.bam"]) == 0
        split_db("T2.db", bsize=10**9, cutoff=500, keep_all=False)
        db = open_db("T2.db")
    finally:
        os.chdir(cwd)
    n_untrimmed = db.nreads
    db.trim()
    keep = [e for e in recs if e["ln"] >= 500]
    # trimmed keeps only DB_BEST reads >= cutoff
    assert db.nreads <= n_untrimmed
    assert (db.reads["rlen"] >= 500).all()
    assert ((db.reads["flags"] & DB_BEST) != 0).all()
