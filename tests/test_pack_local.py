"""Chunk-local pack (ops/pack_local) host-merge path and its guards.

The interpret-mode emit tests compare region-format kernel output via the
NumPy merge (merge_region_rows); these cover the NATIVE dxt_region_merge
and the capacity limits found on hardware (PACK_r04.json): the region
format carries at most 124 chunk bases (stats lanes 2..125), so wider
tiles must keep the global pack, and the native merge must never write
past a row's raw words even on corrupt bases.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dextractor_tpu.ops import bitstream_jax as bj
from dextractor_tpu.ops import emit_pallas as ep
from dextractor_tpu.ops.pack_local import pack_slots_local


def _emissions(rng, r, m):
    """Random valid slot emissions: n in 0..16 bits, v < 2^n."""
    n = rng.integers(0, 17, (r, m)).astype(np.int32)
    n[rng.random((r, m)) < 0.3] = 0
    n[0] = 0                                   # empty row
    v = (rng.integers(0, 1 << 30, (r, m)) & ((1 << n) - 1)).astype(np.int32)
    v[n == 0] = 0
    return v, n


def _dispatch_interpret(v, n, inc=None):
    """Run _pack_dispatch / pack_slots_local inside an interpret-mode
    kernel (the lane rolls are Mosaic primitives with no eval rule
    outside pallas)."""
    from jax.experimental import pallas as pl

    r, m = v.shape
    if inc is None:
        def kern(v_ref, n_ref, w_ref, s_ref):
            w, s = ep._pack_dispatch(v_ref[...], n_ref[...])
            w_ref[...] = w
            s_ref[...] = (jnp.full((r, 128), -1, jnp.int32)
                          if s is None else s)
        args = (jnp.asarray(v), jnp.asarray(n))
    else:
        def kern(v_ref, n_ref, i_ref, w_ref, s_ref):
            w, s = pack_slots_local(v_ref[...], n_ref[...], i_ref[...])
            w_ref[...] = w
            s_ref[...] = s
        args = (jnp.asarray(v), jnp.asarray(n), jnp.asarray(inc))
    w, s = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((r, m), jnp.int32),
                   jax.ShapeDtypeStruct((r, 128), jnp.int32)],
        interpret=True)(*args)
    return np.asarray(w), np.asarray(s)


def test_pack_dispatch_wide_tiles_fall_back_to_global(monkeypatch):
    """>124 chunks (15872 slots) cannot carry region bases — the local
    gate must keep the global pack for such tiles."""
    monkeypatch.setattr(ep, "_PACK_LOCAL", True)
    rng = np.random.default_rng(0)
    v, n = _emissions(rng, 2, 16384)
    _, pstats = _dispatch_interpret(v, n)
    assert (pstats == -1).all()                # sentinel: global format
    v, n = _emissions(rng, 2, 1024)
    _, pstats = _dispatch_interpret(v, n)
    assert bool(pstats[:, 126].any())          # region format


def test_native_region_merge_matches_global_pack():
    """finalize_rows_local (native dxt_region_merge) must produce the
    exact stream finalize_rows builds from the global pack."""
    rng = np.random.default_rng(1)
    r, m = 16, 512                              # 4 chunks/row
    v, n = _emissions(rng, r, m)
    t = n.sum(axis=1).astype(np.int64)
    inc = np.cumsum(n, axis=1, dtype=np.int64).astype(np.int32)

    words_g = np.asarray(bj.pack_words(jnp.asarray(v), jnp.asarray(n)))
    lg = np.where(t > 0, 8, 0)                  # any consistent tail gran
    raw, out, dup, zext = (np.asarray(x) for x in
                           bj.word_counts(jnp.asarray(t), jnp.asarray(lg)))
    want_flat, want_w = bj.finalize_rows(words_g, raw, out, dup, zext)

    words_l, pst = _dispatch_interpret(v, n, inc)
    assert not pst[:, 127].any()
    c = m // 128
    got_flat, got_w = bj.finalize_rows_local(
        words_l, pst[:, 2:2 + c], t, out, dup, zext)
    assert (got_w == want_w).all()
    assert (got_flat.view(np.uint32) == want_flat.view(np.uint32)).all()


def test_finalize_rows_local_rejects_chunk_base_mismatch():
    words = np.zeros((2, 512), np.int32)
    bases = np.zeros((2, 3), np.int32)          # 4 chunks but 3 bases
    t = np.array([64, 64], np.int64)
    out = np.array([2, 2], np.int64)
    z = np.zeros(2, bool)
    with pytest.raises(ValueError, match="region merge"):
        bj.finalize_rows_local(words, bases, t, out, z, z)


def test_native_region_merge_clamps_corrupt_bases():
    """Bases pointing past the row's total bits must not write out of
    bounds (the crash mode PACK_r04.json recorded)."""
    r, m = 4, 512
    words = np.full((r, m), -1, np.int32)
    c = m // 128
    # monotone but far beyond t: every region claims a huge span
    bases = (np.arange(c, dtype=np.int32) * 100_000 + 50)[None].repeat(r, 0)
    t = np.full(r, 64, np.int64)                # 2 raw words per row
    out = np.array([2, 2, 2, 2], np.int64)
    z = np.zeros(r, bool)
    flat, w = bj.finalize_rows_local(words, bases, t, out, z, z)
    assert flat.shape[0] == 8                   # defined, in-bounds output
