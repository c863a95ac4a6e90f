"""Pallas TPU kernels: conveyor-belt batched Huffman decode.

128 decode chains ride the VPU lanes and 8 more chain groups ride the
sublanes — 1024 chains per column group, and up to 4 such groups
(chain "sets", `_pick_sets`) run per grid step so the VLIW scheduler
interleaves their independent serial dependency chains.  Each chain's
compressed words live in VMEM as an interleaved "conveyor" tile of
shape (K*8, 128) per column group: row ``k*8 + s`` holds word ``k`` of
sublane-group ``s``'s chains, so

  * one (8, 128) slice ``conv[c*8:(c+1)*8]`` is word ``c`` of *all* 1024
    chains — the 64-bit stream window is a W-way select over those
    slices, no gathers and no cross-sublane reduction;
  * the conveyor advances by each chain's consumed words via
    log2(max-advance) rounds of conditional sublane rolls (roll by
    8*step rows; the (8,128) condition lines up with every slice);
  * code table lookups ride the hardware dynamic lane-gather (idx shape
    == table shape, tables broadcast (2,128) -> (8,128) from refs).

Why 8 distinct groups instead of 8 replicated sublanes: chip ablations
showed the chains are *latency*-bound — deleting the advance, window or
collapse machinery did not move the 7.1 ms/channel time at all, so the
serial per-symbol dependency chain (pos -> window -> peek -> table ->
pos) dominates and the only lever is more chains per serial step.  The
interleaved layout runs 8x more chains through the same dependency
chain.

Decode semantics are identical to ops/decode2.plain_chain/run_chain
(QV.c:510-691 contract, golden-tested against the C oracle); only the
execution strategy changes.  Besides symbols, the kernels emit each
chain's consumed bit count and final emission width — the inputs of the
encoder's stream word-count formula — so downstream channel offsets
chain arithmetically (DB decode, QV.c:1381-1426 stream butting).

The symbol-group loop is the SECOND grid dimension, not a fori_loop: a
fori_loop would need the whole (max_len*8, 128) output resident in VMEM
(8.4 MB at max_len=2048 — over the 16 MB scoped limit together with the
conveyor), while grid steps stream (G*8, 128) output tiles to HBM as
they finish.  The conveyor and chain state persist across group steps in
VMEM scratch (re-initialised at group 0 of each chain block).

Mosaic lowering rules learned the hard way (see also emit_pallas):
  * gathers need full 8-sublane tiles; computed (1,128) values cannot be
    sublane-broadcast ("invalid relayout") but ref-loaded ones can;
  * zeros() loop carries are born sublane-replicated while loop bodies
    produce concrete layouts — chain state therefore lives in VMEM
    scratch refs;
  * u32 cannot be reduced; masked i32 sums of disjoint terms are exact.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode2 import _extract, _peek16

# symbols per group: a plain symbol consumes <= 24 bits (16-bit code +
# 8-bit escape literal), so G_PLAIN * 24 bits bound the per-group conveyor
# advance; run tokens consume <= 56 bits (32-bit run + 24-bit literal).
# Group size amortizes the ADVANCE NETWORK, the kernel's dominant op bill
# once the 1024-chain interleave made it throughput-bound (r5 ablation:
# per-launch times scale with op count, and the pair-step's halved serial
# depth LOST 10% to its extra ops): each advance round selects every one
# of the K word slices, so advance ops/symbol ~= rounds * K / G while the
# growing window costs only ~0.75 * G extra selects/symbol — the optimum
# sits near G = sqrt(rounds * K / 0.75) ~= 48-64 for bench-sized rects.
G_PLAIN = 64
W_PLAIN = 50                # window words: ceil(64*24/32) + 2
ADV_BITS_PLAIN = 6          # per-group advance <= 49 words
G_RUN = 24
W_RUN = 45                  # ceil(24*56/32) + 3
ADV_BITS_RUN = 6            # per-group advance <= 43 words
ADV_PAD = 32                # g=1 shifted-load pad rows: 1 << (bits - 1)
CHAINS = 1024               # 8 sublane groups x 128 lanes per grid step
MAX_CONV_WORDS = 16384      # 1-group geometry ceiling (8 MB scratch)


def _geometry(k: int) -> int:
    """Sublane groups per chain set for stream width k words.

    The conveyor scratch is (k*G, 128*sets) i32 under an 8 MB ceiling,
    so longer streams trade chains-per-step for stream capacity: G=8
    (1024 chains/set) to 2048 words, then G=1 with wide lanes (sets =
    4/2/1 for 4096/8192/16384 words) — the long-read tail of a PacBio
    length distribution decodes at a proportional fraction of full
    speed instead of falling off the ~8.6x XLA-chain cliff (round-2
    verdict).  G=1 rather than 4/2 sublane groups because the advance
    select must otherwise condition every word slice separately (O(K)
    traced ops — compile-time poison); at G=1 the per-chain delta is a
    pure lane value, sublane-broadcast from a scratch ref in O(1) ops
    per round (tools/mosaic_probe.py p5/p6).  Chip-probed: rolls,
    slices and select-sums lower at (1, L); lane-gathers run two-high
    (_taka)."""
    if k <= 2048:
        return 8
    if k <= MAX_CONV_WORDS:
        return 1
    raise ValueError(f"stream width {k} words exceeds the conveyor "
                     f"ceiling {MAX_CONV_WORDS}")


def _taka(tbl, idx):
    """take_along_axis that tolerates single-sublane shapes: Mosaic's
    dynamic lane-gather rejects (1, 128) operands (tools/mosaic_probe.py
    p1_gather_1), so those run two-high and keep row 0."""
    if idx.shape[0] == 1:
        t2 = jnp.concatenate([tbl, tbl], axis=0)
        i2 = jnp.concatenate([idx, idx], axis=0)
        return jnp.take_along_axis(t2, i2, axis=1)[0:1]
    return jnp.take_along_axis(tbl, idx, axis=1)


def _gather128(row, idx):
    """row (1, 128) ref-loaded table; idx (G, L) -> gathered (G, L).

    The hardware dynamic lane-gather works per 128-lane VREG with
    lane-local indices, so wider planes gather slice-by-slice (the
    slices are VREG-aligned; concat is a layout no-op)."""
    g = idx.shape[0]
    tbl = jnp.broadcast_to(row, (g, 128))
    lanes = idx.shape[1]
    if lanes == 128:
        return _taka(tbl, idx)
    outs = [_taka(tbl, idx[:, q * 128:(q + 1) * 128])
            for q in range(lanes // 128)]
    return jnp.concatenate(outs, axis=1)


def _lut2_gather(lut2, idx):
    """256-entry lookup from a (2, 128) split table; idx (8, 128)."""
    lo = _gather128(lut2[0:1, :], idx & 127)
    hi = _gather128(lut2[1:2, :], idx & 127)
    return jnp.where(idx < 128, lo, hi)


def _lut2_gather_slots(f1lo, f1hi, idx):
    """256-entry lookup with per-slot tables: f1lo/f1hi (8, L) hold each
    128-lane slice's own channel table (rows = sublane groups), so one
    launch decodes chains of *different* schemes.  Same op count as the
    broadcast variant — the lane-gather was already slice-by-slice."""
    lanes = idx.shape[1]
    outs = []
    for q in range(lanes // 128):
        sl = slice(q * 128, (q + 1) * 128)
        i = idx[:, sl]
        lo = _taka(f1lo[:, sl], i & 127)
        hi = _taka(f1hi[:, sl], i & 127)
        outs.append(jnp.where(i < 128, lo, hi))
    return jnp.concatenate(outs, axis=1)


def _f2_lookup(f2_ref, idx, f2r: int):
    """f2[idx] for idx (8, 128) in [0, f2r*128); static row mux."""
    lane = idx & 127
    row = idx >> 7
    out = jnp.zeros_like(idx)
    for r2 in range(f2r):
        v = _gather128(f2_ref[r2:r2 + 1, :], lane)
        out = jnp.where(row == r2, v, out)
    return out


def _l2_resolve(e1, cw, f2_ref, subw: int, lmax: int, f2r: int):
    """Second-level escape-table resolution of an L1 entry (the tail of
    decode2._entry_lookup, split out so the pair step can run it AFTER
    muxing speculated L1 entries)."""
    if subw and f2r:
        is2 = ((e1 >> 20) & 1) == 1
        idx2 = (e1 & 0xFFFF) * subw + ((cw >> (16 - lmax)) & (subw - 1))
        e2 = _f2_lookup(f2_ref, jnp.where(is2, idx2, 0), f2r)
        return jnp.where(is2, e2, e1)
    return e1


def _entry_lookup(cw, f1, f2_ref, subw: int, lmax: int, f2r: int):
    """(len << 9 | sym) for 16-bit window cw — decode2._entry_lookup."""
    e1 = _lut2_gather(f1, cw >> 8)
    return _l2_resolve(e1, cw, f2_ref, subw, lmax, f2r)


def _entry_lookup_slots(cw, f1lo, f1hi, f2_ref, subw: int, lmax: int,
                        f2r: int):
    """_entry_lookup with per-slot L1 tables (multi-channel launches)."""
    e1 = _lut2_gather_slots(f1lo, f1hi, cw >> 8)
    return _l2_resolve(e1, cw, f2_ref, subw, lmax, f2r)


def _advance(conv, delta, max_bits: int, g: int = 8):
    """Roll each chain's conveyor up by delta words.

    conv (K*G, lanes) interleaved; delta (G, lanes) per chain group —
    the (G, lanes) condition selects per word slice (O(K) traced
    selects — fine at K <= 2048; the g=1 long-read geometry uses the
    in-place ref advance instead, see _advance_ref_g1)."""
    kg = conv.shape[0]
    for b in range(max_bits):
        step = 1 << b
        cond = ((delta >> b) & 1) == 1
        rolled = pltpu.roll(conv, kg - g * step, axis=0)
        outs = [jnp.where(cond, rolled[c * g:(c + 1) * g],
                          conv[c * g:(c + 1) * g])
                for c in range(kg // g)]
        conv = jnp.concatenate(outs, axis=0)
    return conv


def _advance_ref_g1(conv_ref, k: int, delta, bc_ref, max_bits: int = 6,
                    ch: int = 1024):
    """In-place g=1 conveyor advance on the scratch ref.

    The value-level advance materializes ~3 conveyor-sized temporaries
    (conv + rolled + broadcast mask) on the VMEM stack — an 18 MB scoped
    allocation at K=4096/384 lanes that the compiler rejects (16 MB
    limit).  This variant rewrites the ref chunk by chunk: chunk [a,
    a+ch) reads its shifted source [a+step, a+step+ch) before storing
    (ascending order never reads a row written earlier in the same
    round), so peak extra VMEM is ~3 chunk-sized values.  The conveyor
    scratch carries ADV_PAD pad rows past k so shifted loads never wrap —
    the wrapped rows of the old rotate held consumed-word garbage the
    windows never read anyway.  delta is a pure lane value at g=1: it
    round-trips through ``bc_ref`` (ref-loaded (1, L) values sublane-
    broadcast; computed ones cannot — tools/mosaic_probe.py p5/p6)."""
    lanes = bc_ref.shape[1]
    ch = min(ch, k)
    assert k % ch == 0, "conveyor width must be a chunk multiple"
    bc_ref[:] = delta
    for b in range(max_bits):
        step = 1 << b
        for a in range(0, k, ch):
            src = conv_ref[a + step: a + step + ch]
            cur = conv_ref[a: a + ch]
            m = jnp.broadcast_to(bc_ref[:], (ch, lanes))
            conv_ref[a: a + ch] = jnp.where(((m >> b) & 1) == 1, src, cur)


def _tree_sum(terms):
    """Balanced-tree sum: log2(n) dependency depth instead of a serial
    accumulate chain (the window select-reduce sits on the per-symbol
    critical path of a latency-bound kernel)."""
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) & 1:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _window(conv, wpos, w_words: int, g: int = 8):
    """64-bit window (a, b) at word offset wpos[chain] of the conveyor.

    wpos (G, 128); returns (G, 128) u32 words per chain.  Each candidate
    slice is one select — exactly one contributes per chain, so i32 sums
    are exact (Mosaic cannot reduce u32)."""
    w_words = min(w_words, conv.shape[0] // g)
    ta, tb = [], []
    for c in range(w_words):
        sl = conv[c * g:(c + 1) * g]
        ta.append(jnp.where(wpos == c, sl, 0))
        tb.append(jnp.where(wpos + 1 == c, sl, 0))
    return (_tree_sum(ta).astype(jnp.uint32),
            _tree_sum(tb).astype(jnp.uint32))


def _window_ref_g1(conv_ref, wpos, w_words: int):
    """_window reading (1, lanes) slices straight from the scratch ref —
    at g=1 the conveyor stays in the ref (in-place advance), so no
    conveyor-sized value is ever live."""
    ta, tb = [], []
    for c in range(w_words):
        sl = conv_ref[c:c + 1]
        ta.append(jnp.where(wpos == c, sl, 0))
        tb.append(jnp.where(wpos + 1 == c, sl, 0))
    return (_tree_sum(ta).astype(jnp.uint32),
            _tree_sum(tb).astype(jnp.uint32))


def _window3(conv, wpos, w_words: int, g: int = 8):
    """96-bit window (a, b, c) — the pair step peeks up to 79 bits past
    the window base (speculated symbol-2 peek at p + adv1 <= 55 bits,
    its escape literal at <= 79), beyond the 64-bit window's reach."""
    w_words = min(w_words, conv.shape[0] // g)
    ta, tb, tc = [], [], []
    for c in range(w_words):
        sl = conv[c * g:(c + 1) * g]
        ta.append(jnp.where(wpos == c, sl, 0))
        tb.append(jnp.where(wpos + 1 == c, sl, 0))
        tc.append(jnp.where(wpos + 2 == c, sl, 0))
    return (_tree_sum(ta).astype(jnp.uint32),
            _tree_sum(tb).astype(jnp.uint32),
            _tree_sum(tc).astype(jnp.uint32))


def _window3_ref_g1(conv_ref, wpos, w_words: int):
    ta, tb, tc = [], [], []
    for c in range(w_words):
        sl = conv_ref[c:c + 1]
        ta.append(jnp.where(wpos == c, sl, 0))
        tb.append(jnp.where(wpos + 1 == c, sl, 0))
        tc.append(jnp.where(wpos + 2 == c, sl, 0))
    return (_tree_sum(ta).astype(jnp.uint32),
            _tree_sum(tb).astype(jnp.uint32),
            _tree_sum(tc).astype(jnp.uint32))


def _extract3(wa, wb, wc, off, nbits: int):
    """bits [off, off+nbits) of the 96-bit window wa:wb:wc.

    Requires off + nbits <= 96 and, when off >= 64, (off & 31) + nbits
    <= 32 (no fourth word) — both hold for every pair-step use site
    (peeks at off <= 55, escape literals of 8 bits at off <= 79)."""
    off = off.astype(jnp.uint32)
    b = off & jnp.uint32(31)
    ls = (jnp.uint32(32) - b) & jnp.uint32(31)
    p0 = jnp.where(b == 0, wa, (wa << b) | (wb >> ls))
    p1 = jnp.where(b == 0, wb, (wb << b) | (wc >> ls))
    p2 = wc << b
    w = off >> 5
    hi = jnp.where(w == 0, p0, jnp.where(w == 1, p1, p2))
    return (hi >> jnp.uint32(32 - nbits)).astype(jnp.int32)


def _plain_pair_rounds(window3, lookup_full, lookup_l1, f2_ref, signal,
                       rlen, g, pos, base, last, spec, subw: int,
                       lmax: int, f2r: int):
    """Decode G_PLAIN symbols as G_PLAIN/2 length-speculated PAIRS.

    The chains are latency-bound (module docstring): the serial
    dependency per symbol is pos -> window -> peek -> L1 gather ->
    [L2 gather] -> len -> pos.  Symbol 2's L1 lookup is *speculated* in
    parallel over ``spec`` — the static set of possible bit advances of
    symbol 1 (its scheme's distinct code lengths; escape codes advance
    len+8, QV.c:510-599) — and muxed by symbol 1's resolved advance, so
    a pair's critical path carries ONE window+peek+L1 segment instead of
    two.  Speculation is complete (adv1 is in ``spec`` whenever the lane
    is active), so there is no slow fallback path to re-serialize the
    lockstep round; speculated peeks may read up to 32 bits past the
    64-bit window the C contract pads for (QV.c:436-442), which stays in
    the zero-filled conveyor pad and is discarded by the mux.
    """
    syms = []
    for s2 in range(G_PLAIN // 2):
        a1 = (g * G_PLAIN + 2 * s2) < rlen
        a2 = (g * G_PLAIN + 2 * s2 + 1) < rlen
        # growing window: the group starts word-aligned and pair s2 has
        # consumed <= 24 * 2*s2 bits since; +3 words for the 96-bit reach
        wpos = (pos >> 5) - base
        wa, wb, wc = window3(wpos, min((48 * s2) // 32 + 3, W_PLAIN + 1))
        p = (pos & 31).astype(jnp.uint32)
        # symbol 1: the normal serial path
        e1 = lookup_full(_peek16(wa, wb, p))
        sym1 = e1 & 511
        n1 = (e1 >> 9) & 31
        esc1 = a1 & (sym1 == signal)
        lit1 = _extract(wa, wb, p + n1.astype(jnp.uint32), 8)
        sym1 = jnp.where(esc1, lit1, sym1)
        adv1 = jnp.where(esc1, n1 + 8, n1)
        # symbol 2: L1 lookups at every candidate advance start in
        # parallel with symbol 1's gather; adv1 selects one
        pks = [_extract3(wa, wb, wc, p + jnp.uint32(d), 16) for d in spec]
        eds = [lookup_l1(pk >> 8) for pk in pks]
        e2 = _tree_sum([jnp.where(adv1 == d, e, 0)
                        for d, e in zip(spec, eds)])
        pk2 = _tree_sum([jnp.where(adv1 == d, q, 0)
                         for d, q in zip(spec, pks)])
        e2 = _l2_resolve(e2, pk2, f2_ref, subw, lmax, f2r)
        sym2 = e2 & 511
        n2 = (e2 >> 9) & 31
        esc2 = a2 & (sym2 == signal)
        lit2 = _extract3(wa, wb, wc,
                         p + (adv1 + n2).astype(jnp.uint32), 8)
        sym2 = jnp.where(esc2, lit2, sym2)
        adv2 = jnp.where(esc2, n2 + 8, n2)
        pos = pos + jnp.where(a1, adv1, 0) + jnp.where(a2, adv2, 0)
        last = jnp.where(a2, jnp.where(esc2, 8, n2),
                         jnp.where(a1, jnp.where(esc1, 8, n1), last))
        syms.append(jnp.where(a1, sym1, 0))
        syms.append(jnp.where(a2, sym2, 0))
    return syms, pos, last


def _spec_usable(spec) -> bool:
    """Pair-step a launch only when the speculation set is real and does
    not explode the op count (each candidate costs a peek + L1 gather)."""
    return spec is not None and 0 < len(spec) <= 24


def _plain_kernel_factory(k: int, n_groups: int, subw: int, lmax: int,
                          f2r: int, lanes: int, interpret: bool = False,
                          gg: int = 8, spec=None):
    def kernel(rectT_ref, rlen_ref, p0_ref, f1_ref, f2_ref, prm_ref,
               out_ref, stats_ref, *scr):
        if gg == 1:
            conv_ref, pos_ref, base_ref, last_ref, bc_ref, dma_sem = scr
        else:
            conv_ref, pos_ref, base_ref, last_ref, dma_sem = scr
            bc_ref = None
        j = pl.program_id(0)
        g = pl.program_id(1)
        rlen = rlen_ref[:]                           # (gg, lanes) per chain

        @pl.when(g == 0)
        def _init():
            # the conveyor is consumed in-place (rolled), so it lives in
            # scratch filled by one explicit DMA instead of a
            # double-buffered VMEM input block — halves the VMEM high
            # water, which is what bounds chain sets per grid step
            if interpret:                 # no DMA engine in interpret
                conv_ref[0:k * gg] = rectT_ref[:, pl.ds(j * lanes, lanes)]
            else:
                cp = pltpu.make_async_copy(
                    rectT_ref.at[:, pl.ds(j * lanes, lanes)],
                    conv_ref.at[0:k * gg], dma_sem)
                cp.start()
                cp.wait()
            if gg == 1:                   # zero the shifted-load pad rows
                conv_ref[k * gg:] = jnp.zeros((ADV_PAD, lanes), jnp.int32)
            pos_ref[:] = p0_ref[:]        # segment chains resume mid-bit
            base_ref[:] = rlen * 0
            last_ref[:] = rlen * 0

        f1 = f1_ref[:]
        signal = jnp.concatenate([prm_ref[:]] * (lanes // 128), axis=1)
        pos = pos_ref[:]
        base = base_ref[:]
        last = last_ref[:]
        delta = (pos >> 5) - base
        if gg == 1:
            _advance_ref_g1(conv_ref, k, delta, bc_ref)
            conv = None
        else:
            conv = _advance(conv_ref[:], delta, max_bits=ADV_BITS_PLAIN, g=gg)
            conv_ref[:] = conv
        base = base + delta

        def window(wpos, w):
            if gg == 1:
                return _window_ref_g1(conv_ref, wpos, w)
            return _window(conv, wpos, w, gg)

        if _spec_usable(spec):
            def window3(wpos, w):
                if gg == 1:
                    return _window3_ref_g1(conv_ref, wpos, w)
                return _window3(conv, wpos, w, gg)

            syms, pos, last = _plain_pair_rounds(
                window3,
                lambda cw: _entry_lookup(cw, f1, f2_ref, subw, lmax, f2r),
                lambda idx: _lut2_gather(f1, idx),
                f2_ref, signal, rlen, g, pos, base, last, spec, subw,
                lmax, f2r)
        else:
          syms = []
          for s in range(G_PLAIN):
            active = (g * G_PLAIN + s) < rlen
            wpos = (pos >> 5) - base
            # growing window: the group starts word-aligned (wpos == 0)
            # and symbol s has consumed <= 24*s bits since, so only the
            # first (24*s)//32 + 2 words can hold its window
            sw_a, sw_b = window(wpos, min((24 * s) // 32 + 2, W_PLAIN))
            p = (pos & 31).astype(jnp.uint32)
            cw = _entry_lookup(_peek16(sw_a, sw_b, p), f1, f2_ref,
                               subw, lmax, f2r)
            sym = cw & 511
            nbits = (cw >> 9) & 31
            esc = active & (sym == signal)
            lit = _extract(sw_a, sw_b, p + nbits.astype(jnp.uint32), 8)
            sym = jnp.where(esc, lit, sym)
            pos = pos + jnp.where(active,
                                  jnp.where(esc, nbits + 8, nbits), 0)
            last = jnp.where(active, jnp.where(esc, 8, nbits), last)
            syms.append(jnp.where(active, sym, 0))
        out_ref[:] = jnp.concatenate(syms, axis=0)
        pos_ref[:] = pos
        base_ref[:] = base
        last_ref[:] = last

        @pl.when(g == n_groups - 1)
        def _fin():
            stats_ref[0:gg, :] = pos
            stats_ref[gg:2 * gg, :] = last

    return kernel


def _plain_slots_kernel_factory(k: int, n_groups: int, subw: int, lmax: int,
                                f2r: int, lanes: int,
                                interpret: bool = False, gg: int = 8,
                                spec=None):
    """Plain-chain kernel with per-slot L1 tables and signals: one launch
    decodes chains of several channels (schemes) at once — the serial
    per-symbol dependency chain is walked ONCE for all of them instead of
    once per channel (the chains are latency-bound; see module docstring).
    f1 arrives as (2*gg, lanes): rows [0, gg) the lo half, [gg, 2gg) the
    hi half of each slot's 256-entry table; prm as (gg, lanes) per-slot
    signals."""
    def kernel(rectT_ref, rlen_ref, p0_ref, f1_ref, f2_ref, prm_ref,
               out_ref, stats_ref, *scr):
        if gg == 1:
            conv_ref, pos_ref, base_ref, last_ref, bc_ref, dma_sem = scr
        else:
            conv_ref, pos_ref, base_ref, last_ref, dma_sem = scr
            bc_ref = None
        j = pl.program_id(0)
        g = pl.program_id(1)
        rlen = rlen_ref[:]

        @pl.when(g == 0)
        def _init():
            if interpret:
                conv_ref[0:k * gg] = rectT_ref[:, pl.ds(j * lanes, lanes)]
            else:
                cp = pltpu.make_async_copy(
                    rectT_ref.at[:, pl.ds(j * lanes, lanes)],
                    conv_ref.at[0:k * gg], dma_sem)
                cp.start()
                cp.wait()
            if gg == 1:                   # zero the shifted-load pad rows
                conv_ref[k * gg:] = jnp.zeros((ADV_PAD, lanes), jnp.int32)
            pos_ref[:] = p0_ref[:]        # segment chains resume mid-bit
            base_ref[:] = rlen * 0
            last_ref[:] = rlen * 0

        f1lo = f1_ref[0:gg, :]
        f1hi = f1_ref[gg:2 * gg, :]
        signal = prm_ref[:]
        pos = pos_ref[:]
        base = base_ref[:]
        last = last_ref[:]
        delta = (pos >> 5) - base
        if gg == 1:
            _advance_ref_g1(conv_ref, k, delta, bc_ref)
            conv = None
        else:
            conv = _advance(conv_ref[:], delta, max_bits=ADV_BITS_PLAIN, g=gg)
            conv_ref[:] = conv
        base = base + delta

        def window(wpos, w):
            if gg == 1:
                return _window_ref_g1(conv_ref, wpos, w)
            return _window(conv, wpos, w, gg)

        if _spec_usable(spec):
            def window3(wpos, w):
                if gg == 1:
                    return _window3_ref_g1(conv_ref, wpos, w)
                return _window3(conv, wpos, w, gg)

            syms, pos, last = _plain_pair_rounds(
                window3,
                lambda cw: _entry_lookup_slots(cw, f1lo, f1hi, f2_ref,
                                               subw, lmax, f2r),
                lambda idx: _lut2_gather_slots(f1lo, f1hi, idx),
                f2_ref, signal, rlen, g, pos, base, last, spec, subw,
                lmax, f2r)
        else:
          syms = []
          for s in range(G_PLAIN):
            active = (g * G_PLAIN + s) < rlen
            wpos = (pos >> 5) - base
            sw_a, sw_b = window(wpos, min((24 * s) // 32 + 2, W_PLAIN))
            p = (pos & 31).astype(jnp.uint32)
            cw = _entry_lookup_slots(_peek16(sw_a, sw_b, p), f1lo, f1hi,
                                     f2_ref, subw, lmax, f2r)
            sym = cw & 511
            nbits = (cw >> 9) & 31
            esc = active & (sym == signal)
            lit = _extract(sw_a, sw_b, p + nbits.astype(jnp.uint32), 8)
            sym = jnp.where(esc, lit, sym)
            pos = pos + jnp.where(active,
                                  jnp.where(esc, nbits + 8, nbits), 0)
            last = jnp.where(active, jnp.where(esc, 8, nbits), last)
            syms.append(jnp.where(active, sym, 0))
        out_ref[:] = jnp.concatenate(syms, axis=0)
        pos_ref[:] = pos
        base_ref[:] = base
        last_ref[:] = last

        @pl.when(g == n_groups - 1)
        def _fin():
            stats_ref[0:gg, :] = pos
            stats_ref[gg:2 * gg, :] = last

    return kernel


def _pick_sets_multi(r: int, k: int):
    """(g, sets, npad) minimizing (grid steps, padded chains) under the
    conveyor scratch ceiling.  Unlike _pick_sets, sets need not be a
    power of two — a merged multi-channel batch is rarely pow2-sized."""
    g = _geometry(k)
    best = None
    for sets in range(1, 9):
        if k * g * 128 * sets * 4 > (8 << 20) and sets > 1:
            break
        block = g * 128 * sets
        npad = _round_up(max(r, block), block)
        score = (npad, npad // block, sets)
        if best is None or score < best:
            best = score
    steps, npad, sets = best
    return g, sets, npad


def plain_chains_conveyor(rects, rlens, f1cs, f2, signals, *,
                          max_len: int, subw: int, lmax: int,
                          interpret: bool = False, pos0=None, spec=None):
    """Decode C plain channels' chains in ONE conveyor launch.

    rects: C arrays (N, K_c) u32 (same reads, different channels);
    f1cs: C (256,) i32 L1 tables; signals: C escape codes.  Channel c's
    chains occupy their own 128-chain slots, and the per-slot table
    planes route each slice's lookups to its own scheme — so the
    latency-bound serial symbol walk runs once for all channels instead
    of once per channel.  Returns a list of (syms (N, max_len) u8,
    bits (N,) i32, last (N,) i32) per channel."""
    C = len(rects)
    n = rects[0].shape[0]
    k = max(int(r.shape[1]) for r in rects)
    npc = _round_up(max(n, 128), 128)         # per-channel slot span
    rect = jnp.concatenate(
        [jnp.pad(r, ((0, npc - n), (0, k - r.shape[1]))) for r in rects])
    rl = jnp.pad(rlens.astype(jnp.int32), (0, npc - n))
    rlall = jnp.concatenate([rl] * C)
    if pos0 is None:
        p0all = jnp.zeros_like(rlall)
    else:
        p0all = jnp.concatenate(
            [jnp.pad(jnp.zeros(n, jnp.int32) if p is None
                     else p.astype(jnp.int32), (0, npc - n))
             for p in pos0])
    r_tot = C * npc
    gg, sets, npad = _pick_sets_multi(r_tot, k)
    lanes = 128 * sets
    if npad != r_tot:
        rect = jnp.pad(rect, ((0, npad - r_tot), (0, 0)))
        rlall = jnp.pad(rlall, (0, npad - r_tot))
        p0all = jnp.pad(p0all, (0, npad - r_tot))
    rectT = jax.lax.bitcast_convert_type(
        _interleave_rect(rect, npad, gg), jnp.int32)
    rlen8 = _chain_plane(rlall, npad, gg)
    p0p = _chain_plane(p0all, npad, gg)
    ncols = npad // gg

    # per-slot table/signal planes: slot g*8+s sits at [s, g*128:(g+1)*128]
    slot_channel = np.minimum(
        np.arange(npad // 128) * 128 // npc, C - 1)
    sel = jnp.asarray(slot_channel)
    f1_stack = jnp.stack(list(f1cs))          # (C, 256)
    sig_stack = jnp.stack([jnp.asarray(s, jnp.int32).reshape(())
                           for s in signals])

    def plane(x):                             # (nslots, 128) -> (gg, ncols)
        ng = ncols // 128
        return x.reshape(ng, gg, 128).transpose(1, 0, 2).reshape(gg, ncols)

    f1p = jnp.concatenate([plane(f1_stack[sel, :128]),
                           plane(f1_stack[sel, 128:])])
    prm = plane(jnp.broadcast_to(sig_stack[sel][:, None],
                                 (npad // 128, 128)))

    f2r = _round_up(max(f2.shape[0], 128), 128) // 128
    f2p = jnp.pad(f2, (0, f2r * 128 - f2.shape[0])).reshape(f2r, 128)
    f2r_used = f2r if subw else 0
    groups = (max_len + G_PLAIN - 1) // G_PLAIN
    lp = groups * G_PLAIN
    kern = _plain_slots_kernel_factory(k, groups, subw, lmax, f2r_used,
                                       lanes, interpret, gg, spec)
    outT, stats = pl.pallas_call(
        kern,
        grid=(ncols // lanes, groups),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2p.shape[0], 128), lambda j, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G_PLAIN * gg, lanes), lambda j, g: (g, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lp * gg, ncols), jnp.int32),
            jax.ShapeDtypeStruct((2 * gg, ncols), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((k * gg + (ADV_PAD if gg == 1 else 0),
                                    lanes), jnp.int32)]
        + [pltpu.VMEM((gg, lanes), jnp.int32)] * 3
        + ([pltpu.VMEM((1, lanes), jnp.int32)] if gg == 1 else [])
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(rectT, rlen8, p0p, f1p, f2p, prm)
    syms_all = _unrows(outT, lp, npad, max_len, gg).astype(jnp.uint8)
    bits_all = _unplane(stats[0:gg], npad)
    last_all = _unplane(stats[gg:2 * gg], npad)
    return [(syms_all[c * npc:c * npc + n],
             bits_all[c * npc:c * npc + n],
             last_all[c * npc:c * npc + n]) for c in range(C)]


def _run_pair_rounds(window3, lookup_r, lookup_s_l1, f2_ref, nsignal,
                     rlen, g, cr_ref, pos, base, emitted, last, spec,
                     subw: int, lmax: int, f2r: int):
    """G_RUN (run, literal) token pairs with the literal lookup
    length-speculated over the run code's possible advances.

    ``spec`` is the run scheme's distinct code lengths (escape buckets
    advance len+16, QV.c:604-691) plus 0 — the advance of a checkpoint
    resume that starts AT a literal (decode2.run_chain carry semantics)
    and the selector value of inactive lanes (whose muxed garbage the
    need_sym mask discards)."""
    rcols, lcols = [], []
    for s in range(G_RUN):
        active = emitted < rlen
        wpos = (pos >> 5) - base
        wa, wb, wc = window3(wpos, min((56 * s) // 32 + 3, W_RUN + 1))
        p = (pos & 31).astype(jnp.uint32)
        e = lookup_r(_peek16(wa, wb, p))
        c = e & 511
        nb = (e >> 9) & 31
        resc = active & (c == 255)
        runlit = _extract(wa, wb, p + nb.astype(jnp.uint32), 16)
        runlen = jnp.where(resc, runlit, c)
        if s == 0:
            cr = cr_ref[:]
            first = 1 - jnp.minimum(g, 1)              # i32 scalar
            ph = (cr >= 0).astype(jnp.int32) * first
            phase = ph == 1
            runlen = jnp.where(phase, cr, runlen)
            resc = resc & ~phase
            live = active & ~phase
        else:
            live = active
        d_eff = jnp.where(live, nb + jnp.where(resc, 16, 0), 0)
        pos = pos + d_eff
        last = jnp.where(active, jnp.where(resc, 16, nb), last)
        emitted1 = jnp.minimum(emitted + runlen, rlen)
        need_sym = active & (emitted1 < rlen)

        pks = [_extract3(wa, wb, wc, p + jnp.uint32(d), 16) for d in spec]
        eds = [lookup_s_l1(pk >> 8) for pk in pks]
        e2 = _tree_sum([jnp.where(d_eff == d, ev, 0)
                        for d, ev in zip(spec, eds)])
        pk2 = _tree_sum([jnp.where(d_eff == d, q, 0)
                         for d, q in zip(spec, pks)])
        e2 = _l2_resolve(e2, pk2, f2_ref, subw, lmax, f2r)
        sym = e2 & 511
        snb = (e2 >> 9) & 31
        sesc = need_sym & (sym == nsignal)
        slit = _extract3(wa, wb, wc,
                         p + (d_eff + snb).astype(jnp.uint32), 8)
        sym = jnp.where(sesc, slit, sym)
        pos = pos + jnp.where(need_sym,
                              snb + jnp.where(sesc, 8, 0), 0)
        last = jnp.where(need_sym, jnp.where(sesc, 8, snb), last)

        rcols.append(jnp.where(active, runlen, 0))
        lcols.append(jnp.where(need_sym, sym, -1))
        emitted = jnp.where(active,
                            emitted1 + need_sym.astype(jnp.int32),
                            emitted)
    return rcols, lcols, pos, emitted, last


def _run_kernel_factory(k: int, n_groups: int, subw: int, lmax: int,
                        f2r: int, lanes: int, interpret: bool = False,
                        gg: int = 8, spec=None):
    def kernel(rectT_ref, rlen_ref, p0_ref, cr_ref, f1r_ref, f1s_ref,
               f2_ref, prm_ref, runs_ref, lits_ref, stats_ref, *scr):
        if gg == 1:
            (conv_ref, pos_ref, base_ref, em_ref, last_ref, bc_ref,
             dma_sem) = scr
        else:
            conv_ref, pos_ref, base_ref, em_ref, last_ref, dma_sem = scr
            bc_ref = None
        j = pl.program_id(0)
        g = pl.program_id(1)
        rlen = rlen_ref[:]

        @pl.when(g == 0)
        def _init():
            if interpret:
                conv_ref[0:k * gg] = rectT_ref[:, pl.ds(j * lanes, lanes)]
            else:
                cp = pltpu.make_async_copy(
                    rectT_ref.at[:, pl.ds(j * lanes, lanes)],
                    conv_ref.at[0:k * gg], dma_sem)
                cp.start()
                cp.wait()
            if gg == 1:                   # zero the shifted-load pad rows
                conv_ref[k * gg:] = jnp.zeros((ADV_PAD, lanes), jnp.int32)
            pos_ref[:] = p0_ref[:]        # segment chains resume mid-bit
            base_ref[:] = rlen * 0
            em_ref[:] = rlen * 0
            last_ref[:] = rlen * 0

        f1r = f1r_ref[:]
        f1s = f1s_ref[:]
        nsignal = jnp.concatenate([prm_ref[:]] * (lanes // 128), axis=1)
        pos = pos_ref[:]
        base = base_ref[:]
        emitted = em_ref[:]
        last = last_ref[:]
        delta = (pos >> 5) - base
        if gg == 1:
            _advance_ref_g1(conv_ref, k, delta, bc_ref)
            conv = None
        else:
            conv = _advance(conv_ref[:], delta, max_bits=ADV_BITS_RUN, g=gg)
            conv_ref[:] = conv
        base = base + delta

        def window(wpos, w):
            if gg == 1:
                return _window_ref_g1(conv_ref, wpos, w)
            return _window(conv, wpos, w, gg)

        if _spec_usable(spec):
            def window3(wpos, w):
                if gg == 1:
                    return _window3_ref_g1(conv_ref, wpos, w)
                return _window3(conv, wpos, w, gg)

            rcols, lcols, pos, emitted, last = _run_pair_rounds(
                window3,
                lambda cw: _entry_lookup(cw, f1r, f2_ref, subw, lmax, f2r),
                lambda idx: _lut2_gather(f1s, idx),
                f2_ref, nsignal, rlen, g, cr_ref, pos, base, emitted,
                last, spec, subw, lmax, f2r)
            runs_ref[:] = jnp.concatenate(rcols, axis=0)
            lits_ref[:] = jnp.concatenate(lcols, axis=0)
            pos_ref[:] = pos
            base_ref[:] = base
            em_ref[:] = emitted
            last_ref[:] = last

            @pl.when(g == n_groups - 1)
            def _fin_spec():
                stats_ref[0:gg, :] = pos
                stats_ref[gg:2 * gg, :] = last
            return

        rcols, lcols = [], []
        for s in range(G_RUN):
            active = emitted < rlen
            wpos = (pos >> 5) - base
            # growing window: token s has consumed <= 56*s bits since the
            # group's word-aligned start
            sw_a, sw_b = window(wpos, min((56 * s) // 32 + 2, W_RUN))
            p = (pos & 31).astype(jnp.uint32)
            e = _entry_lookup(_peek16(sw_a, sw_b, p), f1r, f2_ref,
                              subw, lmax, f2r)
            c = e & 511
            nb = (e >> 9) & 31
            resc = active & (c == 255)
            runlit = _extract(sw_a, sw_b, p + nb.astype(jnp.uint32), 16)
            runlen = jnp.where(resc, runlit, c)
            if s == 0:
                # segment phase: a checkpoint that fell inside a run
                # resumes as the virtual (carry, literal) pair — no run
                # code is read, the stream sits at the literal.  The
                # grid scalar enters via integer blending (Mosaic
                # rejects broadcast-scalar i1 selects).
                cr = cr_ref[:]
                first = 1 - jnp.minimum(g, 1)          # i32 scalar
                ph = (cr >= 0).astype(jnp.int32) * first
                phase = ph == 1
                runlen = jnp.where(phase, cr, runlen)
                resc = resc & ~phase
                pos = pos + jnp.where(active & ~phase,
                                      nb + jnp.where(resc, 16, 0), 0)
            else:
                pos = pos + jnp.where(active,
                                      nb + jnp.where(resc, 16, 0), 0)
            last = jnp.where(active, jnp.where(resc, 16, nb), last)
            emitted1 = jnp.minimum(emitted + runlen, rlen)

            need_sym = active & (emitted1 < rlen)
            wpos = (pos >> 5) - base
            sw_a, sw_b = window(wpos, min((56 * s + 48) // 32 + 2, W_RUN))
            p = (pos & 31).astype(jnp.uint32)
            e2 = _entry_lookup(_peek16(sw_a, sw_b, p), f1s, f2_ref,
                               subw, lmax, f2r)
            sym = e2 & 511
            snb = (e2 >> 9) & 31
            sesc = need_sym & (sym == nsignal)
            slit = _extract(sw_a, sw_b, p + snb.astype(jnp.uint32), 8)
            sym = jnp.where(sesc, slit, sym)
            pos = pos + jnp.where(need_sym,
                                  snb + jnp.where(sesc, 8, 0), 0)
            last = jnp.where(need_sym, jnp.where(sesc, 8, snb), last)

            rcols.append(jnp.where(active, runlen, 0))
            lcols.append(jnp.where(need_sym, sym, -1))
            emitted = jnp.where(active,
                                emitted1 + need_sym.astype(jnp.int32),
                                emitted)
        runs_ref[:] = jnp.concatenate(rcols, axis=0)
        lits_ref[:] = jnp.concatenate(lcols, axis=0)
        pos_ref[:] = pos
        base_ref[:] = base
        em_ref[:] = emitted
        last_ref[:] = last

        @pl.when(g == n_groups - 1)
        def _fin():
            stats_ref[0:gg, :] = pos
            stats_ref[gg:2 * gg, :] = last

    return kernel


def _round_up(x, mult):
    return (x + mult - 1) // mult * mult


def _pick_sets(n: int, k: int) -> tuple:
    """(g, sets) per grid step: more sets hide more of the serial
    per-symbol latency, but the conveyor scratch is (k*G, 128*sets) i32
    (8 MB ceiling) and the batch is padded to G*128*sets chains (at g=8
    cap the padding waste at ~33%; at g=1 dead padded chains cost no
    grid time, so sets is set by the scratch ceiling alone)."""
    g = _geometry(k)
    if g == 1:
        for sets in (4, 2):
            if k * 128 * sets * 4 <= (8 << 20):
                return 1, sets
        return 1, 1
    for sets in (4, 2):
        vmem = k * g * 128 * sets * 4
        waste_ok = n > g * 128 * sets // 2
        if vmem <= (8 << 20) and waste_ok:
            return g, sets
    return g, 1


def _interleave_rect(rect, npad, g: int = 8):
    """rect (Np, K) u32 -> (K*G, Ng*128) conveyor planes.

    Chain c = q*(G*128) + s*128 + l lives at [k*G + s, q*128 + l]."""
    ng = npad // (g * 128)
    k = rect.shape[1]
    r = rect.reshape(ng, g, 128, k)
    return r.transpose(3, 1, 0, 2).reshape(k * g, ng * 128)


def _chain_plane(vec, npad, g: int = 8):
    """(Np,) per-chain values -> (G, Ng*128) sublane-group planes."""
    ng = npad // (g * 128)
    return (vec.reshape(ng, g, 128).transpose(1, 0, 2)
            .reshape(g, ng * 128))


def _unplane(plane, n):
    """(G, Ng*128) -> (Np,) -> first n."""
    g = plane.shape[0]
    ng = plane.shape[1] // 128
    return plane.reshape(g, ng, 128).transpose(1, 0, 2).reshape(-1)[:n]


def _unrows(outT, lp, n, width, g: int = 8):
    """(Lp*G, Ng*128) -> (Np, Lp) -> (n, width)."""
    ng = outT.shape[1] // 128
    r = outT.reshape(lp, g, ng, 128)
    return r.transpose(2, 1, 3, 0).reshape(ng * g * 128, lp)[:n, :width]


@functools.partial(jax.jit, static_argnames=("max_len", "subw", "lmax",
                                             "interpret", "spec"))
def plain_chain_conveyor(rect, rlens, f1c, f2, signal, *, max_len: int,
                         subw: int, lmax: int, interpret: bool = False,
                         pos0=None, spec=None):
    """Drop-in for decode2.plain_chain, plus per-chain stream stats.

    rect (N, K) u32, f1c (256,) i32, f2 flat i32, signal scalar ->
    (syms (N, max_len) u8, bits (N,) i32, last_gran (N,) i32).
    """
    n, k = rect.shape
    gg, sets = _pick_sets(n, k)
    lanes = 128 * sets
    block = gg * 128 * sets
    npad = _round_up(max(n, block), block)
    if pos0 is None:
        pos0 = jnp.zeros(n, jnp.int32)
    if npad != n:
        rect = jnp.pad(rect, ((0, npad - n), (0, 0)))
        rlens = jnp.pad(rlens, (0, npad - n))
        pos0 = jnp.pad(pos0, (0, npad - n))
    rectT = jax.lax.bitcast_convert_type(
        _interleave_rect(rect, npad, gg), jnp.int32)
    rlen8 = _chain_plane(rlens.astype(jnp.int32), npad, gg)
    p0p = _chain_plane(pos0.astype(jnp.int32), npad, gg)
    f1t = f1c.reshape(2, 128)
    f2r = _round_up(max(f2.shape[0], 128), 128) // 128
    f2p = jnp.pad(f2, (0, f2r * 128 - f2.shape[0])).reshape(f2r, 128)
    f2r_used = f2r if subw else 0
    prm = jnp.broadcast_to(
        jnp.asarray(signal, jnp.int32).reshape(1, 1), (gg, 128))
    groups = (max_len + G_PLAIN - 1) // G_PLAIN
    lp = groups * G_PLAIN
    kern = _plain_kernel_factory(k, groups, subw, lmax, f2r_used, lanes,
                                 interpret, gg, spec)
    ncols = npad // gg
    outT, stats = pl.pallas_call(
        kern,
        grid=(ncols // lanes, groups),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda j, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2p.shape[0], 128), lambda j, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gg, 128), lambda j, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G_PLAIN * gg, lanes), lambda j, g: (g, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lp * gg, ncols), jnp.int32),
            jax.ShapeDtypeStruct((2 * gg, ncols), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((k * gg + (ADV_PAD if gg == 1 else 0),
                                    lanes), jnp.int32)]
        + [pltpu.VMEM((gg, lanes), jnp.int32)] * 3
        + ([pltpu.VMEM((1, lanes), jnp.int32)] if gg == 1 else [])
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(rectT, rlen8, p0p, f1t, f2p, prm)
    syms = _unrows(outT, lp, n, max_len, gg).astype(jnp.uint8)
    return syms, _unplane(stats[0:gg], n), _unplane(stats[gg:2 * gg], n)


@functools.partial(jax.jit, static_argnames=("max_tokens", "subw", "lmax",
                                             "interpret", "spec"))
def run_chain_conveyor(rect, rlens, f1r, f1s, f2, nsignal, *,
                       max_tokens: int, subw: int, lmax: int,
                       interpret: bool = False, pos0=None, carry=None,
                       spec=None):
    """Drop-in for decode2.run_chain, plus per-chain stream stats.

    Returns (runs (N, Tp) i32, lits (N, Tp) i32, bits (N,) i32,
    last_gran (N,) i32)."""
    n, k = rect.shape
    gg, sets = _pick_sets(n, k)
    lanes = 128 * sets
    block = gg * 128 * sets
    npad = _round_up(max(n, block), block)
    if pos0 is None:
        pos0 = jnp.zeros(n, jnp.int32)
    if carry is None:
        carry = jnp.full(n, -1, jnp.int32)
    if npad != n:
        rect = jnp.pad(rect, ((0, npad - n), (0, 0)))
        rlens = jnp.pad(rlens, (0, npad - n))
        pos0 = jnp.pad(pos0, (0, npad - n))
        carry = jnp.pad(carry, (0, npad - n), constant_values=-1)
    rectT = jax.lax.bitcast_convert_type(
        _interleave_rect(rect, npad, gg), jnp.int32)
    rlen8 = _chain_plane(rlens.astype(jnp.int32), npad, gg)
    p0p = _chain_plane(pos0.astype(jnp.int32), npad, gg)
    crp = _chain_plane(carry.astype(jnp.int32), npad, gg)
    f1rt = f1r.reshape(2, 128)
    f1st = f1s.reshape(2, 128)
    f2r = _round_up(max(f2.shape[0], 128), 128) // 128
    f2p = jnp.pad(f2, (0, f2r * 128 - f2.shape[0])).reshape(f2r, 128)
    f2r_used = f2r if subw else 0
    prm = jnp.broadcast_to(
        jnp.asarray(nsignal, jnp.int32).reshape(1, 1), (gg, 128))
    groups = (max_tokens + G_RUN - 1) // G_RUN
    tp = groups * G_RUN
    kern = _run_kernel_factory(k, groups, subw, lmax, f2r_used, lanes,
                               interpret, gg,
                               spec if spec is None else
                               tuple(sorted(set(spec) | {0})))
    ncols = npad // gg
    runsT, litsT, stats = pl.pallas_call(
        kern,
        grid=(ncols // lanes, groups),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda j, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda j, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2p.shape[0], 128), lambda j, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gg, 128), lambda j, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G_RUN * gg, lanes), lambda j, g: (g, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G_RUN * gg, lanes), lambda j, g: (g, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * gg, lanes), lambda j, g: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp * gg, ncols), jnp.int32),
            jax.ShapeDtypeStruct((tp * gg, ncols), jnp.int32),
            jax.ShapeDtypeStruct((2 * gg, ncols), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((k * gg + (ADV_PAD if gg == 1 else 0),
                                    lanes), jnp.int32)]
        + [pltpu.VMEM((gg, lanes), jnp.int32)] * 4
        + ([pltpu.VMEM((1, lanes), jnp.int32)] if gg == 1 else [])
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(rectT, rlen8, p0p, crp, f1rt, f1st, f2p, prm)
    runs = _unrows(runsT, tp, n, tp, gg)
    lits = _unrows(litsT, tp, n, tp, gg)
    return runs, lits, _unplane(stats[0:gg], n), _unplane(stats[gg:2 * gg], n)
