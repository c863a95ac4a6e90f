"""dextract: BAM/SAM ingestion, filter application, output formats."""

import numpy as np
import pytest

from conftest import make_bam

from dextractor_tpu.ingest.sam import SamReader, HASQV, HASPW
from dextractor_tpu.cli.dextract import main as dextract_main


def test_bam_reader_fields(tmp_path):
    rng = np.random.default_rng(0)
    bam, recs = make_bam(rng, n_reads=5)
    p = tmp_path / "m.subreads.bam"
    p.write_bytes(bam)
    reader = SamReader(str(p))
    assert reader.is_bam
    assert reader.header_status() == (HASQV | HASPW)
    got = list(reader)
    assert len(got) == 5
    for r, e in zip(got, recs):
        assert r.well == e["well"] and r.beg == e["beg"] and r.end == e["end"]
        assert r.seq == e["seq"]
        assert abs(r.qual - e["rq"]) < 1e-6
        np.testing.assert_allclose(r.snr, e["snr"], rtol=1e-6)
        # pulse widths clamp at '4'
        expect = (np.minimum(e["pw"].astype(np.int64), 4) + ord("0")).astype(np.uint8)
        assert r.arr == expect.tobytes()
        assert [bytes(q) for q in r.qv] == e["qvs"]


def test_dextract_bam_outputs(tmp_path):
    rng = np.random.default_rng(1)
    bam, recs = make_bam(rng, n_reads=6, min_len=600, max_len=900)
    (tmp_path / "m.subreads.bam").write_bytes(bam)
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = dextract_main(["-f", "-a", "-q", "-e" + "ln>=0", "m.subreads.bam"])
    finally:
        os.chdir(cwd)
    assert rc == 0
    fasta = (tmp_path / "m.fasta").read_bytes()
    arrow = (tmp_path / "m.arrow").read_bytes()
    quiva = (tmp_path / "m.quiva").read_bytes()

    e = recs[0]
    hdr = b">%s/%d/%d_%d RQ=0.%d\n" % (
        e["qname"].split(b"/")[0], e["well"], e["beg"], e["end"],
        int(e["rq"] * 1000.0))
    assert fasta.startswith(hdr)
    assert fasta.count(b">") == 6
    assert arrow.count(b"SN=") == 6
    assert quiva.count(b"@") >= 6

    # the quiva output parses and roundtrips through our codec
    from dextractor_tpu.codecs.qv_codec import encode_quiva_to_dexqv, decode_dexqv_to_quiva
    assert decode_dexqv_to_quiva(encode_quiva_to_dexqv(quiva)) == quiva


def test_dextract_default_filter_drops_short(tmp_path):
    rng = np.random.default_rng(2)
    bam, recs = make_bam(rng, n_reads=8, min_len=100, max_len=900)
    (tmp_path / "m.subreads.bam").write_bytes(bam)
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = dextract_main(["m.subreads.bam"])     # default ln>=500 && rq>=750
    finally:
        os.chdir(cwd)
    assert rc == 0
    fasta = (tmp_path / "m.fasta").read_bytes()
    expect = sum(1 for e in recs
                 if e["ln"] >= 500 and int(1000 * e["rq"]) >= 750)
    assert fasta.count(b">") == expect


def test_dextract_arrow_requires_pw(tmp_path):
    rng = np.random.default_rng(3)
    bam, _ = make_bam(rng, n_reads=3, with_pw=False)
    (tmp_path / "m.subreads.bam").write_bytes(bam)
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = dextract_main(["-a", "m.subreads.bam"])
    finally:
        os.chdir(cwd)
    assert rc == 1


def _bam_to_sam_text(recs, movie=b"m54238_180903_1"):
    """Render the synthetic records as SAM text (tab-separated, typed tags)."""
    lines = [b"@HD\tVN:1.5\tSO:unknown"]
    for e in recs:
        tags = [
            b"qs:i:%d" % e["beg"], b"qe:i:%d" % e["end"],
            b"rq:f:%g" % e["rq"], b"np:i:3",
            b"sn:B:f," + b",".join(b"%g" % x for x in e["snr"]),
            b"pw:B:C," + b",".join(b"%d" % x for x in e["pw"]),
            b"dq:Z:" + e["qvs"][0], b"dt:Z:" + e["qvs"][1],
            b"iq:Z:" + e["qvs"][2], b"mq:Z:" + e["qvs"][3],
            b"sq:Z:" + e["qvs"][4],
        ]
        lines.append(b"\t".join([
            e["qname"], b"4", b"*", b"0", b"255", b"*", b"*", b"0", b"0",
            e["seq"], b"*"] + tags))
    return b"\n".join(lines) + b"\n"


def test_sam_text_reader(tmp_path):
    rng = np.random.default_rng(11)
    _, recs = make_bam(rng, n_reads=4, min_len=100, max_len=300)
    sam = _bam_to_sam_text(recs)
    p = tmp_path / "m.subreads.sam"
    p.write_bytes(sam)
    reader = SamReader(str(p))
    assert not reader.is_bam
    assert reader.header_status() == (HASQV | HASPW)
    got = list(reader)
    assert len(got) == 4
    for r, e in zip(got, recs):
        assert r.seq == e["seq"]
        assert r.well == e["well"]
        assert abs(r.qual - e["rq"]) < 1e-4
        assert [bytes(q) for q in r.qv] == e["qvs"]
        expect_pw = (np.minimum(np.maximum(e["pw"].astype(np.int64), 1), 4)
                     + ord("0")).astype(np.uint8)
        assert r.arr == expect_pw.tobytes()


def test_dextract_sam_matches_bam(tmp_path):
    rng = np.random.default_rng(12)
    bam, recs = make_bam(rng, n_reads=5, min_len=600, max_len=800)
    (tmp_path / "a.subreads.bam").write_bytes(bam)
    (tmp_path / "b.subreads.sam").write_bytes(_bam_to_sam_text(recs))
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert dextract_main(["-f", "-q", "-eln>=0", "a.subreads.bam"]) == 0
        assert dextract_main(["-f", "-q", "-eln>=0", "b.subreads.sam"]) == 0
    finally:
        os.chdir(cwd)
    assert (tmp_path / "a.fasta").read_bytes() == (tmp_path / "b.fasta").read_bytes()
    assert (tmp_path / "a.quiva").read_bytes() == (tmp_path / "b.quiva").read_bytes()


def test_header_status_from_rg_ds_tag(tmp_path):
    """@RG DS: description drives HASQV/HASPW without record probing
    (the parse sam.c:318-355 promised; record probe stays the fallback)."""
    ds_full = (b"READTYPE=SUBREAD;DeletionQV=dq;DeletionTag=dt;"
               b"InsertionQV=iq;MergeQV=mq;SubstitutionQV=sq;"
               b"Ipd:CodecV1=ip;PulseWidth:CodecV1=pw;BINDINGKIT=x")
    ds_noqv = b"READTYPE=SUBREAD;Ipd:CodecV1=ip;PulseWidth:CodecV1=pw"
    ds_nopw = (b"READTYPE=SUBREAD;DeletionQV=dq;DeletionTag=dt;"
               b"InsertionQV=iq;MergeQV=mq;SubstitutionQV=sq")
    for ds, want in ((ds_full, HASQV | HASPW), (ds_noqv, HASPW),
                     (ds_nopw, HASQV)):
        sam = (b"@HD\tVN:1.5\tSO:unknown\n"
               b"@RG\tID:abc\tPL:PACBIO\tDS:" + ds + b"\n"
               b"m1/0/0_4\t4\t*\t0\t255\t*\t*\t0\t0\tACGT\t*\t"
               b"qs:i:0\tqe:i:4\tzm:i:0\trq:f:0.9\tsn:B:f,5,5,5,5\n")
        p = tmp_path / "t.subreads.sam"
        p.write_bytes(sam)
        assert SamReader(str(p)).header_status() == want
