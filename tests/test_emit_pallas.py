"""Fused emissions+pack Pallas kernels vs the XLA reference formulation.

The XLA path (ops/bitstream_jax) is golden-tested byte-for-byte against the
C encoder; these tests pin the in-VMEM kernels to it in interpret mode.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dextractor_tpu.ops import bitstream_jax as bj
from dextractor_tpu.ops import emit_pallas as ep
from dextractor_tpu.ops.huffman import make_scheme


def _scheme_from_hist(hist, run=False):
    return make_scheme(np.asarray(hist, np.int64))


def _mk_scheme(rng, concentrated=False, run=False):
    if concentrated:
        # heavy skew => long codes => type-2 escapes
        hist = np.ones(256, np.int64)
        hist[:8] = rng.integers(10_000, 100_000, 8)
        hist[8:64] = rng.integers(1, 4, 56)
    else:
        hist = rng.integers(1, 100, 256).astype(np.int64)
    return _scheme_from_hist(hist, run=run)


def _xla_plain(data, lengths, scheme):
    luts = jnp.asarray(bj.scheme_luts(scheme))
    v, n, t, lg = bj.plain_emissions(jnp.asarray(data),
                                     jnp.asarray(lengths), luts)
    words = bj.pack_words(v, n)
    return np.asarray(words), np.asarray(t), np.asarray(lg)


def _xla_run(data, lengths, rchar, scheme, run_scheme):
    sl = jnp.asarray(bj.scheme_luts(scheme))
    rl = jnp.asarray(bj.scheme_luts(run_scheme, run=True))
    v, n, t, lg = bj.run_emissions(jnp.asarray(data), jnp.asarray(lengths),
                                   jnp.int32(rchar), sl, rl)
    words = bj.pack_words(v, n)
    return np.asarray(words), np.asarray(t), np.asarray(lg)



def _densify(wp, pst, t):
    """Kernel word rows -> dense stream rows regardless of pack format
    (region-format when DXT_PACK_LOCAL marks stats lane 126)."""
    wp = np.asarray(wp)
    pst = np.asarray(pst)
    if pst[..., 126].any():
        from dextractor_tpu.ops.bitstream_jax import merge_region_rows
        assert not pst[..., 127].any(), "unexpected region overflow"
        c = wp.shape[-1] // 128
        dense = merge_region_rows(wp.view(np.int32), pst[:, 2:2 + c],
                                  np.asarray(t, np.int64))
        out = np.zeros_like(wp, dtype=np.uint32)
        w = min(out.shape[1], dense.shape[1])
        out[:, :w] = dense.view(np.uint32)[:, :w]
        return out
    return wp


def _compare_words(wp, wx, raws):
    """Word rectangles may differ in padded width; compare per-row raw
    words and require zeros beyond."""
    for i in range(wp.shape[0]):
        r = int(raws[i])
        assert (wp[i, :r] == wx[i, :r]).all(), f"row {i} words differ"
        assert (wp[i, r:] == 0).all()
        assert (wx[i, r:] == 0).all()


@pytest.mark.parametrize("concentrated", [False, True])
def test_plain_kernel_matches_xla(concentrated):
    rng = np.random.default_rng(3 + concentrated)
    n_reads, l = 16, 256
    scheme = _mk_scheme(rng, concentrated)
    if concentrated:
        # skewed symbols so escapes actually fire
        data = rng.integers(0, 256, (n_reads, l)).astype(np.uint8)
    else:
        data = rng.integers(0, 64, (n_reads, l)).astype(np.uint8)
    lengths = rng.integers(0, l + 1, n_reads).astype(np.int32)
    lengths[0] = 0
    lengths[1] = l

    wx, tx, lgx = _xla_plain(data, lengths, scheme)
    luts = jnp.asarray(bj.scheme_luts(scheme)[None])
    wp, tp, lgp, pst = ep.encode_plain_pallas(
        jnp.asarray(data[None]), jnp.asarray(lengths), luts, interpret=True)
    wp, tp, lgp = np.asarray(wp[0]), np.asarray(tp[0]), np.asarray(lgp[0])
    wp = _densify(wp, np.asarray(pst[0]), tp)

    assert (tp == tx).all()
    assert (lgp == lgx).all()
    raws = (tx + 31) >> 5
    _compare_words(wp, wx, raws)


@pytest.mark.parametrize("tokens", [None, "exact"])
@pytest.mark.parametrize("concentrated", [False, True])
def test_run_kernel_matches_xla(concentrated, tokens):
    rng = np.random.default_rng(11 + concentrated)
    n_reads, l = 16, 256
    scheme = _mk_scheme(rng, concentrated)
    run_hist = np.ones(256, np.int64)
    run_hist[:4] = 50_000
    run_scheme = _scheme_from_hist(run_hist)
    rchar = 7
    # mostly runs of rchar with sparse literals; rows of pure run, empty
    data = np.full((n_reads, l), rchar, np.uint8)
    lit_mask = rng.random((n_reads, l)) < 0.15
    data[lit_mask] = rng.integers(0, 256, lit_mask.sum()).astype(np.uint8)
    data[2] = rchar                      # all-run row (trailing run only)
    data[3] = rchar
    data[3, :100] = rng.integers(0, 256, 100)  # literal-dense row
    data[4] = rchar
    data[4, :128] = 9        # exactly one 128-lane token bound (boundary)
    lengths = rng.integers(0, l + 1, n_reads).astype(np.int32)
    lengths[0] = 0
    lengths[1] = l
    lengths[3] = lengths[4] = l

    mt = (bj.run_token_bound(data, lengths, rchar)
          if tokens == "exact" else None)
    wx, tx, lgx = _xla_run(data, lengths, rchar, scheme, run_scheme)
    sl = jnp.asarray(bj.scheme_luts(scheme)[None])
    rl = jnp.asarray(bj.scheme_luts(run_scheme, run=True)[None])
    wp, tp, lgp, pst = ep.encode_run_pallas(
        jnp.asarray(data[None]), jnp.asarray(lengths), sl, rl,
        jnp.asarray([rchar], np.int32), interpret=True, max_tokens=mt)
    if tokens == "exact":      # the compacted rect is genuinely narrower
        assert wp.shape[2] < 2 * l
    wp, tp, lgp = np.asarray(wp[0]), np.asarray(tp[0]), np.asarray(lgp[0])
    wp = _densify(wp, np.asarray(pst[0]), tp)

    assert (tp == tx).all()
    assert (lgp == lgx).all()
    raws = (tx + 31) >> 5
    _compare_words(wp, wx, raws)


def test_run_kernel_long_runs_escape():
    """Runs >= 255 emit symbol 255's code + a 16-bit literal length."""
    rng = np.random.default_rng(5)
    n_reads, l = 8, 512
    scheme = _mk_scheme(rng)
    run_hist = np.ones(256, np.int64)
    run_scheme = _scheme_from_hist(run_hist)
    rchar = 3
    data = np.full((n_reads, l), rchar, np.uint8)
    data[:, 0] = 9            # literal, then a 510-run to the end
    data[1, 500] = 9          # run of 499 then literal then trail 11
    lengths = np.full(n_reads, l, np.int32)

    wx, tx, lgx = _xla_run(data, lengths, rchar, scheme, run_scheme)
    sl = jnp.asarray(bj.scheme_luts(scheme)[None])
    rl = jnp.asarray(bj.scheme_luts(run_scheme, run=True)[None])
    wp, tp, lgp, pst = ep.encode_run_pallas(
        jnp.asarray(data[None]), jnp.asarray(lengths), sl, rl,
        jnp.asarray([rchar], np.int32), interpret=True)
    assert (np.asarray(tp[0]) == tx).all()
    assert (np.asarray(lgp[0]) == lgx).all()
    _compare_words(_densify(np.asarray(wp[0]), np.asarray(pst[0]),
                            np.asarray(tp[0])), wx, (tx + 31) >> 5)


def test_multi_channel_grid():
    """Two channels with different LUTs through one launch."""
    rng = np.random.default_rng(17)
    n_reads, l = 16, 128
    s1, s2 = _mk_scheme(rng), _mk_scheme(rng)
    data = rng.integers(0, 256, (2, n_reads, l)).astype(np.uint8)
    lengths = rng.integers(1, l + 1, n_reads).astype(np.int32)
    luts = jnp.asarray(np.stack([bj.scheme_luts(s1), bj.scheme_luts(s2)]))
    wp, tp, lgp, pst = ep.encode_plain_pallas(
        jnp.asarray(data), jnp.asarray(lengths), luts, interpret=True)
    for c, s in ((0, s1), (1, s2)):
        wx, tx, lgx = _xla_plain(data[c], lengths, s)
        assert (np.asarray(tp[c]) == tx).all()
        assert (np.asarray(lgp[c]) == lgx).all()
        _compare_words(_densify(np.asarray(wp[c]), np.asarray(pst[c]),
                                np.asarray(tp[c])), wx, (tx + 31) >> 5)


def test_pack_tags_kernel_matches_xla():
    from dextractor_tpu.parallel.pipeline import _pack_tags
    from dextractor_tpu.ops.twobit import NUMBER_BASE_LUT

    rng = np.random.default_rng(23)
    n_reads, l = 16, 512
    tag = rng.choice(np.frombuffer(b"acgtn", np.uint8), (n_reads, l))
    dl = rng.integers(0, 4, (n_reads, l)).astype(np.uint8) + 100
    lengths = rng.integers(0, l + 1, n_reads).astype(np.int32)
    lengths[0] = 0
    lengths[1] = l
    for del_char in (-1, 102):
        px, cx = _pack_tags(jnp.asarray(tag), jnp.asarray(dl),
                            jnp.asarray(lengths), jnp.int32(del_char),
                            jnp.asarray(NUMBER_BASE_LUT))
        pp, cp = ep.pack_tags_pallas(
            jnp.asarray(tag), jnp.asarray(dl), jnp.asarray(lengths),
            jnp.int32(del_char), jnp.asarray(NUMBER_BASE_LUT),
            interpret=True)
        px, cx, pp, cp = (np.asarray(x) for x in (px, cx, pp, cp))
        assert (cp == cx).all()
        for i in range(n_reads):
            nb = (int(cx[i]) + 3) >> 2
            assert (pp[i, :nb] == px[i, :nb]).all(), (del_char, i)


def test_pack2bit_kernel_matches_xla():
    from dextractor_tpu.ops import twobit as tb
    from dextractor_tpu.ops.twobit import NUMBER_BASE_LUT

    rng = np.random.default_rng(29)
    n_reads, l = 16, 512
    rows = rng.choice(np.frombuffer(b"acgtACGT", np.uint8), (n_reads, l))
    lengths = rng.integers(0, l + 1, n_reads).astype(np.int32)
    lengths[0] = 0
    lengths[1] = l
    lengths[2] = 5                      # odd tail
    want = np.asarray(tb.pack_2bit(
        jnp.asarray(NUMBER_BASE_LUT)[jnp.asarray(rows)],
        jnp.asarray(lengths)))
    got = np.asarray(ep.pack2bit_pallas(
        jnp.asarray(rows), jnp.asarray(lengths),
        jnp.asarray(NUMBER_BASE_LUT), interpret=True))
    assert (got == want).all()


@pytest.mark.parametrize("tile_b", [16, 32])
def test_plain_kernel_taller_tiles(tile_b, monkeypatch):
    """DXT_EMIT_B=16/32 (chip ILP experiment) must not change output —
    B is pure tiling."""
    monkeypatch.setattr(ep, "B", tile_b)
    rng = np.random.default_rng(41)
    n_reads, l = 40, 256                 # non-multiple of B: pad path
    scheme = _mk_scheme(rng, True)
    data = rng.integers(0, 256, (n_reads, l)).astype(np.uint8)
    lengths = rng.integers(0, l + 1, n_reads).astype(np.int32)
    wx, tx, lgx = _xla_plain(data, lengths, scheme)
    luts = jnp.asarray(bj.scheme_luts(scheme)[None])
    wp, tp, lgp, pst = ep.encode_plain_pallas(
        jnp.asarray(data[None]), jnp.asarray(lengths), luts, interpret=True)
    wp, tp, lgp = np.asarray(wp[0]), np.asarray(tp[0]), np.asarray(lgp[0])
    wp = _densify(wp, np.asarray(pst[0]), tp)
    assert (tp == tx).all()
    assert (lgp == lgx).all()
    _compare_words(wp, wx, (tx + 31) >> 5)
