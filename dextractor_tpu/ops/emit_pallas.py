"""Pallas TPU kernels: fully fused Huffman emission + word packing.

Round-1/2 chip ablations showed the encode step was bound by the emissions
phase (~49 ms of a 64 ms step at 16 MB payload): every XLA sub-stage
(LUT expansion, run scan, interleave, cumsums) round-trips (N, 2L+1) i32
planes through HBM, a 50-100x traffic amplification over the u8 payload.

These kernels run the *entire* per-channel encode — symbol/run LUTs,
run-length recovery (in-VMEM cummax), run/literal slot interleave, bit
cumsums and word-boundary compaction — on a (B, L) row tile inside VMEM.
HBM sees one read of the u8 symbols and one write of the u32 word
rectangle + a tiny per-row stats plane.  This is the speed-of-light
formulation for this codec on TPU: traffic ~= payload + output.

Semantics are identical to ops/bitstream_jax.{plain,run}_emissions +
pack_words + word_counts inputs (golden-tested against the C encoder,
/root/reference/QV.c:386-506); tests cover kernel-vs-XLA equality.

Grid layout: (channel, row-tile) — each channel carries its own packed
LUTs (bits<<6 | len<<1 | esc, see bitstream_jax.scheme_luts) and params
row, so one launch encodes a whole channel group.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vmem_lanes import cumsum_lanes as _cumsum_lanes
from .vmem_lanes import cummax_lanes
from .vmem_lanes import shl_fill as _shl_fill
from .vmem_lanes import shr_fill as _shr_fill

# rows per grid step.  Chip ablation (tools/encode_ablate.py, 16 MB
# five-channel step): B=8 8.05 ms, B=16 6.95 ms, B=32 6.46 ms — the
# shift networks are partly round-latency bound, so taller tiles add
# ILP the same way more conveyor chains did for decode.  _tile_rows
# picks the tallest tile whose planes stay within a VMEM budget (wide
# dexta rows keep B=8); DXT_EMIT_B forces a value for A/B experiments.
B = int(os.environ.get("DXT_EMIT_B", "0"))


def _tile_rows(width: int) -> int:
    if B:
        return B
    return int(max(8, min(32, (1 << 18) // max(width, 1) // 8 * 8)))

# The r3 DXT_EMIT_ABLATE wrong-output stubs were REMOVED: PACK_r04
# proved the compiler collapses more than the phase under test around a
# wrong-output stub (the false "80% packing" attribution), so the only
# sanctioned attribution instrument is tools/encode_split.py, which
# times the three REAL launches.

# DXT_PACK_MXU=1 (default) routes the pack phase's lane cumsums through
# MXU triangular matmuls (ops/scan_mxu: exact limb-split local scans +
# narrow chunk combine) instead of the log-depth roll networks.  Chip
# probe (tools/mxu_probe.py, v5e): u32 cumsum 42.8 us vs 59.0 roll-net,
# small-plane 26.7 vs 83.8 per 4.2M lanes; all limb plans byte-exact on
# hardware.  =0 keeps the pure roll networks (the proven fallback).
_PACK_MXU = os.environ.get("DXT_PACK_MXU", "1") == "1"

# DXT_PACK_LOCAL packs each 128-slot chunk into its own 128-word
# output region (ops/pack_local): the global boundary compaction
# (11 rounds, three planes) becomes a 7-round chunk-local network and
# the hi/lo/rank scans become single MXU dots with no cross-chunk
# combine.  The host merges regions with a ragged OR-copy
# (bitstream_jax.finalize_rows_local).  Stats lane 126 marks the format;
# lanes 2..2+C-1 carry chunk start bit offsets, lane 127 the (never in
# practice) overflow flag.  Chip verdict (tools/pack_probe.py, r4):
# byte-exact on hardware but a WASH on step time (5.539 vs 5.543 ms at
# the 16 MB bench shape) — the encode step is NOT scan/compaction bound
# (the r3 noscan/nocompact ablation knobs mismeasured: wrong-output
# stubs let the compiler collapse more than the phase under test), so
# this stays opt-in.  DXT_PACK_LOCAL=1 enables.
_PACK_LOCAL = os.environ.get("DXT_PACK_LOCAL", "0") == "1"


def _pack_dispatch(vp, np_):
    """(words, extra-stats) for the configured pack formulation.

    The region format stores chunk start offsets at stats lanes
    2..2+C-1 (<= lane 126, which is the format marker), so it carries at
    most 124 chunks = 15872 slots per row; wider tiles (an 8192-wide run
    channel already has 16384 slots) keep the global pack — a static,
    per-width trace decision.  (Found the hard way: the saturating
    lane-126 write OR'd overflow chunks into the marker and the host
    merge then read garbage bases — PACK_r04.json's long-read SIGSEGV.)
    """
    if _PACK_LOCAL and vp.shape[1] <= 124 * 128:
        from .pack_local import pack_slots_local

        inc = _pack_cumsum(np_, 6)
        words, pstats = pack_slots_local(vp, np_, inc, mxu=_PACK_MXU)
        scol = jax.lax.broadcasted_iota(jnp.int32, pstats.shape, 1)
        # format marker AND the channel's own chunk count: a mixed batch
        # stacks channels at the widest channel's padded width, so the
        # assembler must not derive chunk counts from words.shape (a
        # region-format plain channel stacked beside a global-format
        # 8192-wide run channel would read 128 phantom chunks)
        pstats = jnp.where(scol == 126, vp.shape[1] // 128, pstats)
        return words, pstats
    return _pack_slots(vp, np_), None


def _pack_cumsum(x, nbits):
    if _PACK_MXU and x.shape[1] % 128 == 0 and x.shape[1] >= 256:
        from .scan_mxu import cumsum_lanes_mxu

        return cumsum_lanes_mxu(x, nbits=nbits, mode="bf16",
                                via_reshape=True)
    return _cumsum_lanes(x)


def fused_ok(width: int, any_backend: bool = False) -> bool:
    """Can the fused emit kernels take rows of this width?

    The in-kernel lane chunking assumes 512-lane multiples (pad_rows
    aligns to 512 for exactly this).  By default also requires an
    accelerator backend - the XLA formulations are faster on CPU;
    ``any_backend=True`` skips that check for callers that pick the
    backend themselves (the shard_map pipeline).
    """
    import jax

    if width % 512 != 0:
        return False
    if width > 8192:
        # the kernels' VMEM live set scales with row width: a 65536-wide
        # run batch demanded 48 MB of scoped vmem on chip (16 MB limit).
        # Monster rows take the XLA emissions, which stage their planes
        # in HBM; at 8192 the run kernel's live planes stay ~6 MB
        return False
    from ..utils.dispatch import pallas_ok

    return any_backend or pallas_ok()

_NEG = np.int32(-(1 << 30))


# ---------------------------------------------------------------------------
# VMEM-resident lane primitives: shared definitions in vmem_lanes
# ---------------------------------------------------------------------------


def _cummax_lanes(x):
    return cummax_lanes(x, int(_NEG))


LUT_IMPL = "lane"           # "select" (VPU reduce) | "lane" (dynamic gather)
# chip probe (v5e): lane-gather 0.10 ms vs select 3.44 ms per 4.2M-element
# tile — the hardware dynamic gather is the only formulation that keeps
# the LUTs off the critical path


def _lut256_chunk_select(d, lut2):
    """(r, <=128) chunk via select + reduce over two broadcast 128 axes;
    each output sums exactly one non-zero f32 term (values < 2^24 exact)."""
    r, l = d.shape
    lo = lut2[0].astype(jnp.float32)                      # (128,)
    hi = lut2[1].astype(jnp.float32)
    sym = jax.lax.broadcasted_iota(jnp.int32, (r, l, 128), 2)
    s_lo = jnp.where(d[:, :, None] == sym, lo[None, None, :], 0.0)
    s_hi = jnp.where((d - 128)[:, :, None] == sym, hi[None, None, :], 0.0)
    return (jnp.sum(s_lo, axis=2) + jnp.sum(s_hi, axis=2)).astype(jnp.int32)


def _lut256_chunk_lane(d, lut2):
    """(r, <=128) chunk via two 128-lane dynamic gathers + a select.

    The Mosaic gather lowering requires index shape == table shape, so
    narrow chunks are broadcast up to the 128-lane width and sliced back;
    the table arrives pre-split as (2, 128) rows (Mosaic also rejects
    broadcasting a lane-offset slice of a (1, 256) plane)."""
    r, l = d.shape
    if l < 128:
        d = jnp.broadcast_to(d[:, 0:1], (r, 128)) if l == 1 else jnp.pad(
            d, ((0, 0), (0, 128 - l)))
    lob = jnp.broadcast_to(lut2[0:1, :], (r, 128))
    hib = jnp.broadcast_to(lut2[1:2, :], (r, 128))
    idx = d & 127
    glo = jnp.take_along_axis(lob, idx, axis=1)
    ghi = jnp.take_along_axis(hib, idx, axis=1)
    out = jnp.where(d < 128, glo, ghi)
    return out[:, :l]


def _lut256(d, lut2):
    """256-entry LUT lookup for an i32 tile ``d`` (values 0..255).

    lut2: (2, 128) i32 in VMEM (table split into lane-aligned halves).
    Processed in 128-lane chunks so the gather/select stays one VREG wide.
    """
    r, l = d.shape
    chunk = _lut256_chunk_lane if LUT_IMPL == "lane" else _lut256_chunk_select
    if l <= 128:
        return chunk(d, lut2)
    outs = [chunk(d[:, j * 128:(j + 1) * 128], lut2)
            for j in range(l // 128)]
    return jnp.concatenate(outs, axis=1)


def _spread2(x):
    """Lane dilation: element at lane i moves to lane 2i, zero elsewhere.

    Superseded by the lane-gather _interleave (8x fewer VREG ops) but
    kept as the known-good roll-network fallback for the technique.

    (R, L) -> (R, 2L).  Mosaic rejects the shape-cast/strided interleave
    formulations ("unsupported shape cast"), so this is a pure roll+select
    shift network: element i's displacement is i (monotone non-decreasing),
    and processing displacement bits MSB-first guarantees every landing
    lane is either empty or vacated in the same round (elements to the
    right always carry >= displacement, so they move at least as early).
    """
    r, m = x.shape
    y = jnp.pad(x, ((0, 0), (0, m)))
    col = jax.lax.broadcasted_iota(jnp.int32, (r, 2 * m), 1)
    d = jnp.where(col < m, col, -1)
    for b in reversed(range(max(m - 1, 1).bit_length())):
        step = 1 << b
        src = (d >= 0) & (((d >> b) & 1) == 1)
        take = _shr_fill(src.astype(jnp.int32), step) == 1
        y = jnp.where(take, _shr_fill(y, step), y)
        d = jnp.where(take, _shr_fill(d, step) - step, d)
        # a vacated source keeps a stale copy: kill it so it cannot move
        # again in a later round (unless an arrival just replaced it)
        d = jnp.where(src & ~take, -1, d)
    return jnp.where(d == 0, y, 0)


def _interleave(a, b):
    """[a0, b0, a1, b1, ...]: (R, L) x2 -> (R, 2L), lanes interleaved.

    A fixed dilation is a STATIC permutation, so it rides the hardware
    dynamic lane-gather per 128-lane output chunk (source lanes for
    chunk q live entirely inside source chunk q//2): two gathers + one
    parity select per chunk, ~8x fewer VREG ops than the _spread2 roll
    networks this replaces (the interleave was a visible slice of the
    emission phase in the tools/encode_ablate.py attribution).
    """
    r, m = a.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    half = col >> 1
    parity = col & 1
    outs = []
    for q in range(2 * m // 128):
        sl = slice((q // 2) * 128, (q // 2 + 1) * 128)
        idx = half + (64 if q % 2 else 0)
        ga = jnp.take_along_axis(a[:, sl], idx, axis=1)
        gb = jnp.take_along_axis(b[:, sl], idx, axis=1)
        outs.append(jnp.where(parity == 0, ga, gb))
    return jnp.concatenate(outs, axis=1)


def _sym_emit(d, lut_row):
    """Symbol emission (v, n, gran) from the packed LUT (escape fused)."""
    packed = _lut256(d, lut_row)
    bits = packed >> 6
    lens = (packed >> 1) & 31
    esc = (packed & 1) == 1
    v = jnp.where(esc, (bits << 8) | d, bits)
    n = jnp.where(esc, lens + 8, lens)
    gran = jnp.where(esc, 8, lens)
    return v, n, gran


def _run_emit(runlen, lut_row):
    """Run-length emission (16-bit literal escape, QV.c:478-487)."""
    x = jnp.minimum(runlen, 255)
    packed = _lut256(x, lut_row)
    bits = packed >> 6
    lens = (packed >> 1) & 31
    esc = (packed & 1) == 1
    v = jnp.where(esc, (bits << 16) | (runlen & 0xFFFF), bits)
    n = jnp.where(esc, lens + 16, lens)
    gran = jnp.where(esc, 16, lens)
    return v, n, gran


def _pack_slots(v, n):
    """Slot emissions (R, M) -> word rectangle (R, M) u32-as-i32.

    Identical algorithm to pack_pallas._pack_kernel (cumss + boundary
    compaction); kept here so the whole channel encode is one kernel.
    """
    r, m = v.shape
    inc = _pack_cumsum(n, 6)            # emissions are <= 32 bits
    off = inc - n
    w = off >> 5
    p = off & 31
    pn = p + n
    fits = pn <= 32
    vu = v.astype(jnp.uint32)
    hi = jnp.where(fits, vu << jnp.clip(32 - pn, 0, 31).astype(jnp.uint32),
                   vu >> jnp.clip(pn - 32, 0, 31).astype(jnp.uint32))
    lo = jnp.where(fits, jnp.uint32(0),
                   vu << jnp.clip(64 - pn, 0, 31).astype(jnp.uint32))
    hi = jnp.where(n > 0, hi, jnp.uint32(0)).astype(jnp.int32)
    lo = lo.astype(jnp.int32)

    cs_hi = _pack_cumsum(hi, 32)
    cs_lo = _pack_cumsum(lo, 32)

    nxt = _shl_fill(w, 1, fill=-1)
    last = w != nxt
    ranks = _pack_cumsum(last.astype(jnp.int32), 1) - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (r, m), 1)
    d = jnp.where(last, col - ranks, 0)
    # compact (cs_hi, cs_lo) to their ranks
    a, b_ = cs_hi, cs_lo
    for bb in range(max(m - 1, 1).bit_length()):
        step = 1 << bb
        move = _shl_fill((d >> bb) & 1, step) == 1
        a = jnp.where(move, _shl_fill(a, step), a)
        b_ = jnp.where(move, _shl_fill(b_, step), b_)
        d = jnp.where(move, _shl_fill(d, step) - step, d)

    key_max = jnp.max(jnp.where(n > 0, w, -1), axis=1, keepdims=True)
    hi_vals = jnp.where(col <= key_max, a - _shr_fill(a, 1), 0)
    lo_vals = jnp.where((col >= 1) & (col <= key_max + 1),
                        _shr_fill(b_, 1) - _shr_fill(b_, 2), 0)
    return hi_vals + lo_vals


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _plain_kernel(data_ref, len_ref, lut_ref, words_ref, stats_ref):
    d = data_ref[0].astype(jnp.int32)                    # (B, L)
    lengths = len_ref[:, 0:1]                            # (B, 1)
    lut = lut_ref[0]                                     # (2, 128)
    r, l = d.shape
    mp = words_ref.shape[2]

    col = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    valid = col < lengths
    v, n, gran = _sym_emit(d, lut)
    v = jnp.where(valid, v, 0)
    n = jnp.where(valid, n, 0)

    t = jnp.sum(n, axis=1, keepdims=True)                # (B, 1)
    lg = jnp.sum(jnp.where(col == lengths - 1, gran, 0), axis=1,
                 keepdims=True)

    pad = mp - l
    vp = jnp.pad(v, ((0, 0), (0, pad)))
    np_ = jnp.pad(n, ((0, 0), (0, pad)))
    words_ref[0], pstats = _pack_dispatch(vp, np_)

    scol = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    stats = jnp.where(scol == 0, t, jnp.where(scol == 1, lg, 0))
    stats_ref[0] = stats if pstats is None else stats | pstats


def _run_kernel_body(data_ref, len_ref, slut_ref, rlut_ref, prm_ref,
                     words_ref, stats_ref, half: int | None):
    """RLE-channel encode body.

    ``half`` None: the classic 2L-slot layout (every column owns a
    run/literal slot pair, dead pairs emit 0 bits).  ``half`` set
    (static): TOKEN-COMPACTED — the reference emits one (run code,
    literal) pair per non-rchar symbol (QV.c:448-506), so the emissions
    are first compacted to literal ranks and only 2*half slots enter the
    pack machinery; the per-slot pack cost (the run launch's 2x bill in
    tools/encode_split.py) then scales with the channel's real token
    count instead of 2x its length."""
    d = data_ref[0].astype(jnp.int32)                    # (B, L)
    lengths = len_ref[:, 0:1]                            # (B, 1)
    slut = slut_ref[0]                                   # (2, 128)
    rlut = rlut_ref[0]
    rchar = prm_ref[0, 0:1, 0:1]                         # (1, 1) i32
    r, l = d.shape
    mp = words_ref.shape[2]

    col = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    valid = col < lengths
    is_lit = valid & (d != rchar)

    lit_pos = jnp.where(is_lit, col, -1)
    run_max = _cummax_lanes(lit_pos)
    prev_lit = _shr_fill(run_max, 1, fill=-1)
    runlen = col - prev_lit - 1

    rv, rn, _ = _run_emit(runlen, rlut)
    rv = jnp.where(is_lit, rv, 0)
    rn = jnp.where(is_lit, rn, 0)
    sv, sn, sgran = _sym_emit(d, slut)
    sv = jnp.where(is_lit, sv, 0)
    sn = jnp.where(is_lit, sn, 0)

    # trailing run after the last literal
    last_lit = jnp.max(lit_pos, axis=1, keepdims=True)   # (B, 1)
    trail = jnp.maximum(lengths - last_lit - 1, 0)
    has_trail = trail > 0
    tv1, tn1, tg1 = _run_emit(trail, rlut)               # (B, 1)
    tv = jnp.where(has_trail, tv1, 0)
    tn = jnp.where(has_trail, tn1, 0)

    if half is None:
        # interleave pairs into (B, 2L) then place the trailing emission
        # at the last padded slot (slots after the valid region have
        # n == 0, so any later slot keeps the bit offsets exact)
        v2 = _interleave(rv, sv)
        n2 = _interleave(rn, sn)
        pad = mp - 2 * l
        vp = jnp.pad(v2, ((0, 0), (0, pad)))
        np_ = jnp.pad(n2, ((0, 0), (0, pad)))
    else:
        # compact the literal pairs to ranks (lengths ride one plane),
        # then interleave only the first ``half`` ranks
        nn = (rn << 8) | sn
        rvc, svc, nnc = _compact_lanes((rv, sv, nn), is_lit)
        ranks = jnp.minimum(jnp.sum(is_lit, axis=1, keepdims=True), half)
        tcol = jax.lax.broadcasted_iota(jnp.int32, (r, half), 1)
        live = tcol < ranks
        vp = _interleave(jnp.where(live, rvc[:, :half], 0),
                         jnp.where(live, svc[:, :half], 0))
        np_ = _interleave(jnp.where(live, nnc[:, :half] >> 8, 0),
                          jnp.where(live, nnc[:, :half] & 0xFF, 0))
        vp = jnp.pad(vp, ((0, 0), (0, mp - 2 * half)))
        np_ = jnp.pad(np_, ((0, 0), (0, mp - 2 * half)))
    pcol = jax.lax.broadcasted_iota(jnp.int32, (r, mp), 1)
    vp = jnp.where(pcol == mp - 1, tv, vp)
    np_ = jnp.where(pcol == mp - 1, tn, np_)

    t = jnp.sum(np_, axis=1, keepdims=True)
    lg_lit = jnp.sum(jnp.where(col == last_lit, sgran, 0), axis=1,
                     keepdims=True)
    lg = jnp.where(has_trail, tg1, jnp.where(last_lit >= 0, lg_lit, 0))

    words_ref[0], pstats = _pack_dispatch(vp, np_)
    scol = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    stats = jnp.where(scol == 0, t, jnp.where(scol == 1, lg, 0))
    stats_ref[0] = stats if pstats is None else stats | pstats


def _run_kernel(data_ref, len_ref, slut_ref, rlut_ref, prm_ref,
                words_ref, stats_ref):
    _run_kernel_body(data_ref, len_ref, slut_ref, rlut_ref, prm_ref,
                     words_ref, stats_ref, None)


def _compact_lanes(vals, keep):
    """Stable left-compaction of ``keep``-flagged lanes (VMEM shift net).

    Destinations are the kept lanes' ranks, so displacements are monotone
    non-decreasing and the LSB-to-MSB shift rounds never collide (same
    argument as bitstream_jax.compact_monotone)."""
    r, m = keep.shape
    ranks = _cumsum_lanes(keep.astype(jnp.int32)) - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (r, m), 1)
    d = jnp.where(keep, col - ranks, 0)
    for bb in range(max(m - 1, 1).bit_length()):
        step = 1 << bb
        move = _shl_fill((d >> bb) & 1, step) == 1
        vals = tuple(jnp.where(move, _shl_fill(v, step), v) for v in vals)
        d = jnp.where(move, _shl_fill(d, step) - step, d)
    return vals


def _tag_kernel(tag_ref, del_ref, len_ref, lut_ref, prm_ref,
                out_ref, stats_ref):
    tag = tag_ref[:].astype(jnp.int32)                   # (B, L)
    dl = del_ref[:].astype(jnp.int32)
    lengths = len_ref[:, 0:1]
    nlut = lut_ref[:]                                    # (2, 128)
    del_char = prm_ref[0:1, 0:1]                         # (1, 1)
    r, l = tag.shape

    col = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    valid = col < lengths
    # boolean algebra, not a select over bools (Mosaic rejects i1 select_n
    # with a broadcast scalar condition: "unsupported bitwidth truncation")
    keep = valid & ((dl != del_char) | (del_char < 0))

    codes = _lut256(tag, nlut)
    (sv,) = _compact_lanes((codes,), keep)
    clens = jnp.sum(keep.astype(jnp.int32), axis=1, keepdims=True)
    c = jnp.where(col < clens, sv, 0)

    # 2-bit pack, first code in bits 7-6 (DB.c:334): byte j combines
    # codes 4j..4j+3; build at every lane then keep lanes 4j
    comb = ((c << 6) | (_shl_fill(c, 1) << 4)
            | (_shl_fill(c, 2) << 2) | _shl_fill(c, 3))
    (packed,) = _compact_lanes((comb,), col % 4 == 0)
    out_ref[:] = packed[:, : l // 4]

    scol = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
    stats_ref[:] = jnp.where(scol == 0, clens, 0)


def _pack2bit_kernel(data_ref, len_ref, lut_ref, out_ref):
    """Number_Read + Compress_Read fused (the dexta/dexar hot loop,
    DB.c:319-338): LUT the ASCII symbols, zero the tail, 2-bit pack."""
    d = data_ref[:].astype(jnp.int32)
    lengths = len_ref[:, 0:1]
    nlut = lut_ref[:]                                    # (2, 128)
    r, l = d.shape

    col = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    c = jnp.where(col < lengths, _lut256(d, nlut), 0)
    comb = ((c << 6) | (_shl_fill(c, 1) << 4)
            | (_shl_fill(c, 2) << 2) | _shl_fill(c, 3))
    (packed,) = _compact_lanes((comb,), col % 4 == 0)
    out_ref[:] = packed[:, : l // 4]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack2bit_pallas(rows, lengths, number_lut, interpret: bool = False):
    """Fused alphabet translation + 2-bit pack.

    rows (N, L) u8 ASCII, lengths (N,), number_lut (256,) ->
    packed (N, L//4) u8 (tail bytes zero-padded, DB.c:329-337 semantics).
    """
    n, l = rows.shape
    assert l % 512 == 0, "rows must be 512-aligned (byte lanes x4)"
    tb = _tile_rows(l)
    rpad = (-n) % tb
    if rpad:
        rows = jnp.pad(rows, ((0, rpad), (0, 0)))
        lengths = jnp.pad(lengths, (0, rpad))
    lens2 = jnp.broadcast_to(lengths[:, None].astype(jnp.int32),
                             (n + rpad, 128))
    packed = pl.pallas_call(
        _pack2bit_kernel,
        grid=((n + rpad) // tb,),
        in_specs=[
            pl.BlockSpec((tb, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, l // 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + rpad, l // 4), jnp.int32),
        interpret=interpret,
    )(rows, lens2, number_lut.astype(jnp.int32).reshape(2, 128))
    return packed[:n].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_tags_pallas(tag_rows, del_rows, lengths, del_char, number_lut,
                     interpret: bool = False):
    """Fused Pack_Tag + Number_Read + Compress_Read (QV.c:810-819).

    tag_rows/del_rows (N, L) u8, lengths (N,), del_char i32 scalar,
    number_lut (256,) -> (packed (N, L//4) u8, clens (N,) i32).
    """
    n, l = tag_rows.shape
    assert l % 512 == 0, "tag rows must be 512-aligned (byte lanes x4)"
    tb = _tile_rows(l)
    rpad = (-n) % tb
    if rpad:
        tag_rows = jnp.pad(tag_rows, ((0, rpad), (0, 0)))
        del_rows = jnp.pad(del_rows, ((0, rpad), (0, 0)))
        lengths = jnp.pad(lengths, (0, rpad))
    lens2 = jnp.broadcast_to(lengths[:, None].astype(jnp.int32),
                             (n + rpad, 128))
    prm = jnp.broadcast_to(del_char.astype(jnp.int32).reshape(1, 1),
                           (1, 128))
    packed, stats = pl.pallas_call(
        _tag_kernel,
        grid=((n + rpad) // tb,),
        in_specs=[
            pl.BlockSpec((tb, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, l // 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + rpad, l // 4), jnp.int32),
            jax.ShapeDtypeStruct((n + rpad, 128), jnp.int32),
        ],
        interpret=interpret,
    )(tag_rows, del_rows, lens2,
      number_lut.astype(jnp.int32).reshape(2, 128), prm)
    return packed[:n].astype(jnp.uint8), stats[:n, 0]


# ---------------------------------------------------------------------------
# host-callable wrappers
# ---------------------------------------------------------------------------

def _round_up(x, mult):
    return (x + mult - 1) // mult * mult


def _prep(data, lengths, tile_b):
    """Pad rows to a tile multiple; lengths to an (N, 128) plane."""
    c, n, l = data.shape
    assert l % 128 == 0, "row width must be lane-aligned"
    rpad = (-n) % tile_b
    if rpad:
        data = jnp.pad(data, ((0, 0), (0, rpad), (0, 0)))
        lengths = jnp.pad(lengths, (0, rpad))
    lens2 = jnp.broadcast_to(lengths[:, None].astype(jnp.int32),
                             (n + rpad, 128))
    return data, lens2, n, rpad


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_plain_pallas(data, lengths, sym_luts, interpret: bool = False):
    """Fused plain-channel encode.

    data (C, N, L) u8, lengths (N,) i32, sym_luts (C, 256) packed i32
    -> (words (C, N, Mp) u32, t (C, N) i32, last_gran (C, N) i32).
    """
    c, _, l = data.shape
    mp = _round_up(l + 2, 128)
    tb = _tile_rows(mp)
    data, lens2, n, rpad = _prep(data, lengths, tb)
    grid = (c, (n + rpad) // tb)
    words, stats = pl.pallas_call(
        _plain_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, l), lambda ch, i: (ch, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), lambda ch, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda ch, i: (ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, mp), lambda ch, i: (ch, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, 128), lambda ch, i: (ch, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, n + rpad, mp), jnp.int32),
            jax.ShapeDtypeStruct((c, n + rpad, 128), jnp.int32),
        ],
        interpret=interpret,
    )(data, lens2, sym_luts.reshape(c, 2, 128))
    return (words[:, :n].astype(jnp.uint32), stats[:, :n, 0],
            stats[:, :n, 1], stats[:, :n])


@functools.partial(jax.jit, static_argnames=("interpret", "max_tokens"))
def encode_run_pallas(data, lengths, sym_luts, run_luts, rchars,
                      interpret: bool = False,
                      max_tokens: int | None = None):
    """Fused RLE-channel encode.

    data (C, N, L) u8, lengths (N,), sym_luts/run_luts (C, 256),
    rchars (C,) i32 -> (words (C, N, Mp) u32, t (C, N), last_gran (C, N)).

    ``max_tokens`` (static): upper bound on literals per row across ALL
    stacked channels (host-counted, e.g. np.count_nonzero(d != rchar)).
    When it is meaningfully below L the kernel compacts emissions to
    token ranks and packs a 2*max_tokens-slot rectangle instead of 2L
    (QV.c:448-506 emits per literal, not per symbol) — the pack phase
    is the run launch's dominant cost (tools/encode_split.py).
    """
    c, _, l = data.shape
    half = None
    if max_tokens is not None:
        h = _round_up(min(max_tokens, l), 128)
        if h < l:                        # else compaction buys nothing
            half = h
    mp = _round_up(2 * l + 2, 128) if half is None else 2 * half + 128
    tb = _tile_rows(mp)
    data, lens2, n, rpad = _prep(data, lengths, tb)
    prm = jnp.broadcast_to(rchars.astype(jnp.int32)[:, None, None],
                           (c, 1, 128))
    grid = (c, (n + rpad) // tb)

    def kern(*refs):
        _run_kernel_body(*refs, half)

    words, stats = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, l), lambda ch, i: (ch, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 128), lambda ch, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda ch, i: (ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda ch, i: (ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda ch, i: (ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, mp), lambda ch, i: (ch, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, 128), lambda ch, i: (ch, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, n + rpad, mp), jnp.int32),
            jax.ShapeDtypeStruct((c, n + rpad, 128), jnp.int32),
        ],
        interpret=interpret,
    )(data, lens2, sym_luts.reshape(c, 2, 128),
      run_luts.reshape(c, 2, 128), prm)
    return (words[:, :n].astype(jnp.uint32), stats[:, :n, 0],
            stats[:, :n, 1], stats[:, :n])
