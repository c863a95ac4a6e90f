"""Conveyor decode kernels vs the XLA decode2 chains (interpret mode).

Streams are produced by the host bitstream encoder (byte-identical to the
C encoder by the golden tests), so chain-level equality here pins the
kernels to the real on-disk format.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dextractor_tpu.ops import bitstream as bs
from dextractor_tpu.ops import decode2 as d2
from dextractor_tpu.ops import decode_conveyor as dc
from dextractor_tpu.ops.huffman import make_scheme


def _mk_scheme(rng, skewed=False):
    # realistic QV alphabets (~44 live symbols): a uniform 256-symbol
    # histogram yields ~13-bit codes with dozens of L2 subtables, which
    # the conveyor kernel's static f2 mux is (deliberately) not built for
    hist = np.zeros(256, np.int64)
    if skewed:
        hist[:6] = rng.integers(50_000, 200_000, 6)
        hist[6:44] = rng.integers(1, 3, 38)
    else:
        hist[:44] = rng.integers(1, 100, 44)
    return make_scheme(hist)


def _plain_spec(scheme, f1, f2, subw, lmax):
    """Channel-0 speculation set (a plain channel of this scheme)."""
    sids = np.zeros(6, np.int32)
    types = np.array([scheme.type], np.int32)
    return d2.spec_table(sids, f1[:1], f2, types, subw, lmax,
                         force=True)[0]


def _run_spec(run_scheme, f1run, f2, subw, lmax):
    """Run-channel speculation set (slot 1 semantics: escapes +16)."""
    sids = np.full(6, 0, np.int32)
    sids[1] = 0
    types = np.array([run_scheme.type], np.int32)
    return d2.spec_table(sids, f1run[None, :], f2, types, subw,
                         lmax, force=True)[1]


def _rect_from_streams(streams):
    """Pack per-row byte streams into a word-aligned (N, K) u32 rect."""
    k = max(4, 1 << (max((len(s) + 3) // 4 for s in streams) + 12 - 1)
            .bit_length())
    rect = np.zeros((len(streams), 4 * k), np.uint8)
    for i, s in enumerate(streams):
        rect[i, : len(s)] = np.frombuffer(bytes(s), np.uint8)
    return rect.view(np.uint32)


@pytest.mark.parametrize("pair", [False, True])
@pytest.mark.parametrize("skewed", [False, True])
def test_plain_conveyor_matches_xla(skewed, pair):
    rng = np.random.default_rng(31 + skewed)
    scheme = _mk_scheme(rng, skewed)
    n, max_len = 6, 32                  # interpret mode: ~10 s per group
    rlens = rng.integers(0, max_len + 1, n).astype(np.int32)
    rlens[0] = 0
    rlens[1] = max_len
    datas = [rng.integers(0, 44, r).astype(np.uint8) for r in rlens]
    streams = [bs.encode_stream(scheme, d).tobytes() for d in datas]
    rect = _rect_from_streams(streams)

    f1, f2, subw, lmax = d2.scheme_tables2([scheme])
    signal = 255 if scheme.type == 2 else 256
    spec = _plain_spec(scheme, f1, f2, subw, lmax) if pair else None
    xla = np.asarray(d2.plain_chain(
        jnp.asarray(rect), jnp.asarray(rlens), jnp.asarray(f1[0]),
        jnp.asarray(f2), jnp.int32(signal), max_len=max_len, subw=subw,
        lmax=lmax))
    got, bits, lastg = dc.plain_chain_conveyor(
        jnp.asarray(rect), jnp.asarray(rlens), jnp.asarray(f1[0]),
        jnp.asarray(f2), jnp.int32(signal), max_len=max_len, subw=subw,
        lmax=lmax, interpret=True, spec=spec)
    got = np.asarray(got)
    for i in range(n):
        r = int(rlens[i])
        assert (got[i, :r] == datas[i]).all(), f"row {i} vs input"
        assert (got[i, :r] == xla[i, :r]).all(), f"row {i} vs xla"
    # consumed-bits stats must reproduce the on-disk stream word counts
    from dextractor_tpu.ops.decode_jax import stream_word_counts
    words = stream_word_counts(np.asarray(bits).astype(np.int64),
                               np.asarray(lastg).astype(np.int64))
    for i in range(n):
        assert 4 * int(words[i]) == len(streams[i]), f"row {i} stats"


@pytest.mark.parametrize("n", [1200, 2080])
def test_plain_conveyor_multi_block(n):
    """n > CHAINS exercises the interleaved multi-group layout and the
    _unrows/_unplane reassembly — previously chip-only.  n=1200 runs 2
    chain sets per grid step (npad 2048); n=2080 runs 4 (npad 4096)."""
    rng = np.random.default_rng(93)
    scheme = _mk_scheme(rng, skewed=True)
    max_len = 16
    rlens = rng.integers(0, max_len + 1, n).astype(np.int32)
    datas = [rng.integers(0, 44, r).astype(np.uint8) for r in rlens]
    streams = [bs.encode_stream(scheme, d).tobytes() for d in datas]
    rect = _rect_from_streams(streams)

    f1, f2, subw, lmax = d2.scheme_tables2([scheme])
    signal = 255 if scheme.type == 2 else 256
    got, bits, lastg = dc.plain_chain_conveyor(
        jnp.asarray(rect), jnp.asarray(rlens), jnp.asarray(f1[0]),
        jnp.asarray(f2), jnp.int32(signal), max_len=max_len, subw=subw,
        lmax=lmax, interpret=True)
    got = np.asarray(got)
    # spot-check rows spread across both sublane groups and column blocks
    for i in list(range(0, n, 97)) + [n - 1]:
        r = int(rlens[i])
        assert (got[i, :r] == datas[i]).all(), f"row {i}"
    from dextractor_tpu.ops.decode_jax import stream_word_counts
    words = stream_word_counts(np.asarray(bits).astype(np.int64),
                               np.asarray(lastg).astype(np.int64))
    for i in list(range(0, n, 97)) + [n - 1]:
        assert 4 * int(words[i]) == len(streams[i]), f"row {i} stats"


@pytest.mark.parametrize("pair", [False, True])
def test_plain_chains_conveyor_multi_channel(pair):
    """One merged launch decoding three channels with distinct schemes
    (per-slot table planes) must equal three per-channel XLA chains."""
    rng = np.random.default_rng(71)
    schemes = [_mk_scheme(rng, skewed=s % 2 == 0) for s in range(3)]
    n, max_len = 140, 32            # >128 so slots split mid-channel
    rlens = rng.integers(0, max_len + 1, n).astype(np.int32)
    rlens[0] = 0
    rlens[1] = max_len
    datas, rects = [], []
    for sc in schemes:
        d = [rng.integers(0, 44, r).astype(np.uint8) for r in rlens]
        datas.append(d)
        rects.append(_rect_from_streams(
            [bs.encode_stream(sc, x).tobytes() for x in d]))
    f1, f2, subw, lmax = d2.scheme_tables2(schemes)
    sigs = [255 if sc.type == 2 else 256 for sc in schemes]
    spec = None
    if pair:      # merged launches speculate over the union of schemes
        spec = tuple(sorted(set().union(*(
            _plain_spec(sc, f1[c:c + 1], f2, subw, lmax)
            for c, sc in enumerate(schemes)))))
    res = dc.plain_chains_conveyor(
        [jnp.asarray(r) for r in rects], jnp.asarray(rlens),
        [jnp.asarray(f1[c]) for c in range(3)], jnp.asarray(f2),
        [jnp.int32(s) for s in sigs], max_len=max_len, subw=subw,
        lmax=lmax, interpret=True, spec=spec)
    for c in range(3):
        xla = np.asarray(d2.plain_chain(
            jnp.asarray(rects[c]), jnp.asarray(rlens), jnp.asarray(f1[c]),
            jnp.asarray(f2), jnp.int32(sigs[c]), max_len=max_len,
            subw=subw, lmax=lmax))
        got = np.asarray(res[c][0])
        for i in list(range(0, n, 13)) + [n - 1]:
            r = int(rlens[i])
            assert (got[i, :r] == datas[c][i]).all(), f"ch {c} row {i}"
            assert (got[i, :r] == xla[i, :r]).all(), f"ch {c} row {i} xla"
        from dextractor_tpu.ops.decode_jax import stream_word_counts
        words = stream_word_counts(np.asarray(res[c][1]).astype(np.int64),
                                   np.asarray(res[c][2]).astype(np.int64))
        for i in range(0, n, 13):
            slen = 4 * int(words[i])
            assert slen >= int(rlens[i]) // 8   # sanity: bits consumed


@pytest.mark.parametrize("pair", [False, True])
@pytest.mark.parametrize("long_runs", [False, True])
def test_run_conveyor_matches_xla(long_runs, pair):
    rng = np.random.default_rng(47 + long_runs)
    scheme = _mk_scheme(rng)
    run_hist = np.ones(256, np.int64)
    if not long_runs:
        run_hist[:6] = 40_000
    run_scheme = make_scheme(run_hist)
    rchar = 9
    n, max_len = 6, 40
    rlens = rng.integers(0, max_len + 1, n).astype(np.int32)
    rlens[0] = 0
    rlens[1] = max_len
    datas = []
    for r in rlens:
        d = np.full(r, rchar, np.uint8)
        lit = rng.random(r) < 0.2
        d[lit] = rng.integers(0, 44, lit.sum()).astype(np.uint8)
        d[d == rchar] = rchar
        datas.append(d)
    if long_runs and rlens[1] > 0:
        datas[1][:] = rchar
        datas[1][0] = 3                  # literal then a >=-255 run
    streams = [bs.encode_run_stream(scheme, run_scheme, d, rchar).tobytes()
               for d in datas]
    rect = _rect_from_streams(streams)

    f1, f2, subw, lmax = d2.scheme_tables2([scheme, run_scheme])
    nsignal = 255 if scheme.type == 2 else 256
    max_tokens = max_len + 2
    spec = _run_spec(run_scheme, f1[1], f2, subw, lmax) if pair else None
    xr, xl = (np.asarray(x) for x in d2.run_chain(
        jnp.asarray(rect), jnp.asarray(rlens), jnp.asarray(f1[1]),
        jnp.asarray(f1[0]), jnp.asarray(f2), jnp.int32(nsignal),
        max_tokens=max_tokens, subw=subw, lmax=lmax))
    gr, gl, gbits, glast = (np.asarray(x) for x in dc.run_chain_conveyor(
        jnp.asarray(rect), jnp.asarray(rlens), jnp.asarray(f1[1]),
        jnp.asarray(f1[0]), jnp.asarray(f2), jnp.int32(nsignal),
        max_tokens=max_tokens, subw=subw, lmax=lmax, interpret=True,
        spec=spec))
    t = min(xr.shape[1], gr.shape[1])
    assert (gr[:, :t] == xr[:, :t]).all()
    assert (gl[:, :t] == xl[:, :t]).all()
    assert (gr[:, t:] == 0).all() and (xr[:, t:] == 0).all()
    # reconstruct rows through the shared expander and compare to inputs
    rows = np.asarray(d2.expand_runs2(
        jnp.asarray(gr), jnp.asarray(gl), jnp.uint8(rchar),
        max_len=max_len))
    for i in range(n):
        r = int(rlens[i])
        assert (rows[i, :r] == datas[i]).all(), f"row {i} roundtrip"


def _pad_rect(rect, k_words):
    return np.concatenate(
        [rect, np.zeros((rect.shape[0], k_words - rect.shape[1]),
                        rect.dtype)], axis=1)


@pytest.mark.parametrize("pair", [False, True])
@pytest.mark.parametrize("k_words", [4096, 8192, 16384])
def test_plain_conveyor_long_stream_geometry(k_words, pair):
    """K > 2048 words drops sublane groups (G = 4/2/1) instead of falling
    back to the XLA chain (round-2 long-read cliff).  Wide rects force
    the geometry; escape-heavy streams (24 bits/symbol) force multi-word
    conveyor advances through the G-granular roll network."""
    rng = np.random.default_rng(57)
    # type-2 scheme where most symbols escape: hist concentrated on few
    # symbols plus a tail that gets folded into the escape class
    hist = np.zeros(256, np.int64)
    hist[:4] = rng.integers(50_000, 200_000, 4)
    hist[4:200] = 1
    scheme = make_scheme(hist)
    n, max_len = 5, 64
    rlens = rng.integers(0, max_len + 1, n).astype(np.int32)
    rlens[0] = max_len
    rlens[1] = 0
    datas = [rng.integers(0, 200, r).astype(np.uint8) for r in rlens]
    streams = [bs.encode_stream(scheme, d).tobytes() for d in datas]
    rect = _pad_rect(_rect_from_streams(streams), k_words)
    assert dc._geometry(k_words) == 1
    assert dc._pick_sets(5, k_words) == \
        (1, {4096: 4, 8192: 2, 16384: 1}[k_words])

    f1, f2, subw, lmax = d2.scheme_tables2([scheme])
    signal = 255 if scheme.type == 2 else 256
    spec = _plain_spec(scheme, f1, f2, subw, lmax) if pair else None
    got, bits, lastg = dc.plain_chain_conveyor(
        jnp.asarray(rect), jnp.asarray(rlens), jnp.asarray(f1[0]),
        jnp.asarray(f2), jnp.int32(signal), max_len=max_len, subw=subw,
        lmax=lmax, interpret=True, spec=spec)
    got = np.asarray(got)
    for i in range(n):
        r = int(rlens[i])
        assert (got[i, :r] == datas[i]).all(), f"row {i}"
    from dextractor_tpu.ops.decode_jax import stream_word_counts
    words = stream_word_counts(np.asarray(bits).astype(np.int64),
                               np.asarray(lastg).astype(np.int64))
    for i in range(n):
        assert 4 * int(words[i]) == len(streams[i]), f"row {i} stats"


def test_run_conveyor_long_stream_geometry():
    """Run-token kernel at G=2 (K=8192): escape-heavy literals, runs
    crossing word boundaries."""
    rng = np.random.default_rng(61)
    hist = np.zeros(256, np.int64)
    hist[:4] = 100_000
    hist[4:200] = 1
    scheme = make_scheme(hist)
    run_scheme = make_scheme(np.ones(256, np.int64))
    rchar = 2
    n, max_len = 4, 48
    rlens = rng.integers(1, max_len + 1, n).astype(np.int32)
    rlens[0] = max_len
    datas = []
    for r in rlens:
        d = np.full(r, rchar, np.uint8)
        lit = rng.random(r) < 0.4
        d[lit] = rng.integers(0, 200, lit.sum()).astype(np.uint8)
        datas.append(d)
    streams = [bs.encode_run_stream(scheme, run_scheme, d, rchar).tobytes()
               for d in datas]
    rect = _pad_rect(_rect_from_streams(streams), 8192)

    f1, f2, subw, lmax = d2.scheme_tables2([scheme, run_scheme])
    nsignal = 255 if scheme.type == 2 else 256
    max_tokens = max_len + 2
    gr, gl, gbits, glast = (np.asarray(x) for x in dc.run_chain_conveyor(
        jnp.asarray(rect), jnp.asarray(rlens), jnp.asarray(f1[1]),
        jnp.asarray(f1[0]), jnp.asarray(f2), jnp.int32(nsignal),
        max_tokens=max_tokens, subw=subw, lmax=lmax, interpret=True))
    rows = np.asarray(d2.expand_runs2(
        jnp.asarray(gr), jnp.asarray(gl), jnp.uint8(rchar),
        max_len=max_len))
    for i in range(n):
        r = int(rlens[i])
        assert (rows[i, :r] == datas[i]).all(), f"row {i} roundtrip"
    from dextractor_tpu.ops.decode_jax import stream_word_counts
    words = stream_word_counts(gbits.astype(np.int64),
                               glast.astype(np.int64))
    for i in range(n):
        assert 4 * int(words[i]) == len(streams[i]), f"row {i} stats"
