"""bax.h5 ingestion through the native HDF5 shim (skips if libhdf5 absent)."""

import os

import numpy as np
import pytest

pytest.importorskip("ctypes")


def _shim_or_skip():
    from dextractor_tpu.native import hdf5_shim
    try:
        return hdf5_shim()
    except OSError as e:
        pytest.skip(f"libhdf5 unavailable: {e}")


def make_bax_file(path, rng, n_zmw=6, first_hole=100, quiv=True, arrow=True):
    """Synthetic bax.h5: per-ZMW one HQ region + 1-2 insert regions."""
    from dextractor_tpu.ingest.bax import write_bax

    read_len = rng.integers(400, 900, n_zmw).astype(np.int32)
    hole_type = np.zeros(n_zmw, np.uint8)
    hole_type[n_zmw // 2] = 1                       # one bad hole
    num_bp = int(read_len.sum())
    base_call = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=num_bp)
    pulse_w = rng.integers(1, 7, num_bp).astype(np.uint16)
    snr = rng.uniform(3, 12, (n_zmw, 4)).astype(np.float32)

    dq = rng.integers(0, 60, num_bp).astype(np.uint8)
    dt = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=num_bp)
    dt[dq == 17] = ord("N")
    iq = rng.integers(0, 60, num_bp).astype(np.uint8)
    mq = rng.integers(0, 60, num_bp).astype(np.uint8)
    sq = rng.integers(0, 60, num_bp).astype(np.uint8)

    rows = []
    expected = []
    roff = 0
    for w in range(n_zmw):
        h = first_hole + w
        ln = int(read_len[w])
        hbeg, hend = 50, ln - 20
        score = int(rng.integers(700, 950))
        rows.append([h, 2, hbeg, hend, score])       # HQ region
        ins = [(0, ln // 2), (ln // 2 + 30, ln)]
        for ib, ie in ins:
            rows.append([h, 1, ib, ie, 0])
            cb, ce = max(ib, hbeg), min(ie, hend)
            if ce - cb > 0 and hole_type[w] == 0:
                expected.append(dict(well=h, beg=cb, end=ce, qv=score,
                                     roff=roff))
        roff += ln
    regions = np.array(rows, np.int32)
    write_bax(path, b"m_bax_movie", base_call, read_len, hole_type, regions,
              pulse_w=pulse_w if arrow else None,
              snr=snr if arrow else None,
              qv_streams=[dq, dt, iq, mq, sq] if quiv else None)
    return dict(base=base_call, read_len=read_len, expected=expected,
                dq=dq, dt=dt, pulse_w=pulse_w, snr=snr)


def test_bax_roundtrip(tmp_path):
    _shim_or_skip()
    from dextractor_tpu.ingest.bax import read_bax

    rng = np.random.default_rng(0)
    p = str(tmp_path / "m.bax.h5")
    info = make_bax_file(p, rng)
    b = read_bax(p, quivqv=True, arrow=True)
    assert b.movie_name == b"m_bax_movie"
    np.testing.assert_array_equal(b.base_call, info["base"])
    np.testing.assert_array_equal(b.read_len, info["read_len"])
    assert b.del_limit == 17

    subs = list(b.subreads())
    assert len(subs) == len(info["expected"])
    for s, e in zip(subs, info["expected"]):
        assert (s.well, s.fpulse, s.lpulse, s.qv, s.data_off) == \
            (e["well"], e["beg"], e["end"], e["qv"], e["roff"])


def test_dextract_bax(tmp_path):
    _shim_or_skip()
    rng = np.random.default_rng(1)
    make_bax_file(str(tmp_path / "m.bax.h5"), rng)

    from dextractor_tpu.cli.dextract import main as dextract_main
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = dextract_main(["-f", "-a", "-q", "-eln>=0", "m.bax.h5"])
    finally:
        os.chdir(cwd)
    assert rc == 0
    fasta = (tmp_path / "m.fasta").read_bytes()
    quiva = (tmp_path / "m.quiva").read_bytes()
    arrow = (tmp_path / "m.arrow").read_bytes()
    assert fasta.startswith(b">m_bax_movie/100/")
    assert quiva.startswith(b"@m_bax_movie/100/")
    assert b"SN=" in arrow

    # the produced quiva must roundtrip through the codec
    from dextractor_tpu.codecs.qv_codec import encode_quiva_to_dexqv, decode_dexqv_to_quiva
    assert decode_dexqv_to_quiva(encode_quiva_to_dexqv(quiva)) == quiva


def test_dex2db_bax(tmp_path):
    _shim_or_skip()
    rng = np.random.default_rng(2)
    info = make_bax_file(str(tmp_path / "m.bax.h5"), rng)

    from dextractor_tpu.cli.dex2DB import main as dex2db_main
    from dextractor_tpu.db import open_db
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = dex2db_main(["-q", "-eln>=0", "BAXDB", "m.bax.h5"])
        assert rc == 0
        db = open_db("BAXDB.db")
    finally:
        os.chdir(cwd)
    assert db.nreads == len(info["expected"])
    db.open_qvs()
    entry = db.load_qventry(0, ascii_mode=1)
    e0 = info["expected"][0]
    raw = info["dq"][e0["roff"] + e0["beg"]: e0["roff"] + e0["end"]]
    expect = np.where(raw > 93, 126, raw + 33).astype(np.uint8)
    np.testing.assert_array_equal(entry[0], expect)
