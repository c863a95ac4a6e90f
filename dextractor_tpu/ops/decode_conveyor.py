"""Pallas TPU kernels: conveyor-belt batched Huffman decode.

The XLA batch decoder (ops/decode2.py) already avoids per-element gathers,
but each window refresh and table lookup round-trips (N, ·) planes through
XLA ops sized by the whole rectangle.  These kernels put 128 decode chains
on the VPU lanes and keep each chain's entire compressed stream resident
in VMEM as a (K, 128) "conveyor" tile — words on sublanes, chains on
lanes:

  * per symbol group the conveyor rolls forward per-lane by the words each
    chain consumed (log2(max-advance) rounds of conditional sublane
    rolls), so every chain's next words always sit in the first few
    sublane rows;
  * the 64-bit stream window is then two masked reduces over those first
    W rows — no gathers, no full-K scans;
  * code table lookups ride the hardware dynamic lane-gather (the same
    trick as the encoder's LUTs: idx shape == table shape, 128-lane rows);
  * the L2 escape tables (codes > 8 bits) are a static F2R-row gather mux,
    compiled only when the scheme actually has long codes.

Decode semantics are identical to ops/decode2.plain_chain/run_chain
(QV.c:510-691 contract, golden-tested against the C oracle); only the
execution strategy changes.

Measured motivation (v5e): a masked reduce over a K=512 rectangle costs
~K/8 VREG ops per fetched word; the conveyor roll amortizes alignment to
~20 VREG ops per symbol group, an order of magnitude less.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# symbols per group: a plain symbol consumes <= 24 bits (16-bit code +
# 8-bit escape literal), so G_PLAIN * 24 bits bound the per-group conveyor
# advance; run tokens consume <= 56 bits (32-bit run + 24-bit literal)
G_PLAIN = 16
W_PLAIN = 16                # window rows: ceil(16*24/32) + 2, 8-aligned
G_RUN = 8                   # sublane stores need 8-row alignment
W_RUN = 24                  # ceil(8*56/32) + 3, 8-aligned


def _gather128(row, idx):
    """row (1, 128) ref-loaded table; idx (8, 128) -> gathered (8, 128).

    Mosaic's dynamic-gather lowering wants full 8-sublane tiles, and only
    ref-loaded values may be sublane-broadcast (computed (1,128) planes
    hit "invalid relayout"), so all chain state in these kernels is kept
    (8, 128) sublane-replicated from birth — a VREG is (8, 128) anyway,
    so the replication is free."""
    tbl = jnp.broadcast_to(row, (8, 128))
    return jnp.take_along_axis(tbl, idx, axis=1)


def _lut2_gather(lut2, idx):
    """256-entry lookup from a (2, 128) split table; idx (r, 128)."""
    lo = _gather128(lut2[0:1, :], idx & 127)
    hi = _gather128(lut2[1:2, :], idx & 127)
    return jnp.where(idx < 128, lo, hi)


def _f2_lookup(f2_ref, idx, f2r: int):
    """f2[idx] for idx (8, 128) in [0, f2r*128); static row mux."""
    lane = idx & 127
    row = idx >> 7
    out = jnp.zeros_like(idx)
    for r2 in range(f2r):
        v = _gather128(f2_ref[r2:r2 + 1, :], lane)
        out = jnp.where(row == r2, v, out)
    return out


def _entry_lookup(cw, f1, f2_ref, subw: int, lmax: int, f2r: int):
    """(len << 9 | sym) for 16-bit window cw — decode2._entry_lookup."""
    e1 = _lut2_gather(f1, cw >> 8)
    if subw and f2r:
        is2 = ((e1 >> 20) & 1) == 1
        idx2 = (e1 & 0xFFFF) * subw + ((cw >> (16 - lmax)) & (subw - 1))
        e2 = _f2_lookup(f2_ref, jnp.where(is2, idx2, 0), f2r)
        return jnp.where(is2, e2, e1)
    return e1


def _peek16(sw_a, sw_b, p):
    hi = jnp.where(p == 0, sw_a,
                   (sw_a << p) | (sw_b >> ((jnp.uint32(32) - p)
                                           & jnp.uint32(31))))
    return (hi >> jnp.uint32(16)).astype(jnp.int32)


def _extract(sw_a, sw_b, off, nbits: int):
    off = off.astype(jnp.uint32)
    lt = (sw_a << (off & 31)) | (sw_b >> ((jnp.uint32(32) - off)
                                          & jnp.uint32(31)))
    ge = sw_b << ((off - 32) & 31)
    hi = jnp.where(off == 0, sw_a, jnp.where(off < 32, lt, ge))
    return (hi >> jnp.uint32(32 - nbits)).astype(jnp.int32)


def _where_rows(cond8, a, b):
    """where(cond8, a, b) with cond8 (8,128) replicated, a/b (K,128).

    (8,128) does not broadcast against (K,128); chunk over sublane tiles
    (each chunked where is exactly one VREG select anyway)."""
    k = a.shape[0]
    outs = [jnp.where(cond8, a[c * 8:(c + 1) * 8], b[c * 8:(c + 1) * 8])
            for c in range(k // 8)]
    return jnp.concatenate(outs, axis=0)


def _advance(conv, delta, max_bits: int):
    """Roll each lane's conveyor up by delta[lane] words (sublane rolls).

    delta is (8, 128) sublane-replicated."""
    k = conv.shape[0]
    for b in range(max_bits):
        step = 1 << b
        cond = ((delta >> b) & 1) == 1
        rolled = pltpu.roll(conv, k - step, axis=0)
        conv = _where_rows(cond, rolled, conv)
    return conv


def _collapse8(x):
    """Sum the 8 sublanes of x (8,128) into every sublane (replicated).

    A rotate-add tree: the output is replicated by construction, avoiding
    the illegal computed-value sublane broadcast."""
    for b in (1, 2, 4):
        x = x + pltpu.roll(x, b, axis=0)
    return x


def _window(conv, wpos, w_rows: int):
    """64-bit window (a, b) at word offset wpos[lane] of the conveyor.

    wpos (8,128) replicated; returns (8,128)-replicated u32 words.
    Exactly one (chunk, sublane) contributes per lane, so i32 sums are
    exact (Mosaic cannot reduce u32)."""
    w_rows = min(w_rows, conv.shape[0])
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    acc_a = jnp.zeros((8, 128), jnp.int32)
    acc_b = jnp.zeros((8, 128), jnp.int32)
    for c in range(w_rows // 8):
        rows_c = conv[c * 8:(c + 1) * 8]
        acc_a = acc_a + jnp.where(iota8 + 8 * c == wpos, rows_c, 0)
        acc_b = acc_b + jnp.where(iota8 + 8 * c == wpos + 1, rows_c, 0)
    return (_collapse8(acc_a).astype(jnp.uint32),
            _collapse8(acc_b).astype(jnp.uint32))


def _plain_kernel_factory(k: int, n_groups: int, subw: int, lmax: int,
                          f2r: int):
    def kernel(rectT_ref, rlen_ref, f1_ref, f2_ref, prm_ref, out_ref,
               stats_ref, pos_ref, base_ref, last_ref):
        f1 = f1_ref[:]
        rlen = rlen_ref[:]                           # (8,128) replicated
        signal = prm_ref[:]
        # chain state lives in VMEM scratch, not loop carries: a zeros()
        # carry is born sublane-replicated while the body produces
        # concrete layouts, and Mosaic rejects the relayout; loads from a
        # ref always carry concrete layouts
        pos_ref[:] = rlen * 0
        base_ref[:] = rlen * 0
        last_ref[:] = rlen * 0

        def group(g, conv):
            pos = pos_ref[:]
            base = base_ref[:]
            last = last_ref[:]
            delta = (pos >> 5) - base
            conv = _advance(conv, delta, max_bits=4)
            base = base + delta
            syms = []
            for s in range(G_PLAIN):
                active = (g * G_PLAIN + s) < rlen
                wpos = (pos >> 5) - base
                sw_a, sw_b = _window(conv, wpos, W_PLAIN)
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
                syms.append(jnp.where(active, sym, 0)[0:1, :])
            out_ref[pl.ds(g * G_PLAIN, G_PLAIN), :] = jnp.concatenate(
                syms, axis=0)
            pos_ref[:] = pos
            base_ref[:] = base
            last_ref[:] = last
            return conv

        conv0 = rectT_ref[:].astype(jnp.int32)
        jax.lax.fori_loop(0, n_groups, group, conv0)
        stats_ref[0:1, :] = pos_ref[0:1, :]
        stats_ref[1:2, :] = last_ref[0:1, :]

    return kernel


def _run_kernel_factory(k: int, n_groups: int, subw: int, lmax: int,
                        f2r: int):
    def kernel(rectT_ref, rlen_ref, f1r_ref, f1s_ref, f2_ref, prm_ref,
               runs_ref, lits_ref, stats_ref, pos_ref, base_ref, em_ref,
               last_ref):
        f1r = f1r_ref[:]
        f1s = f1s_ref[:]
        rlen = rlen_ref[:]                           # (8,128) replicated
        nsignal = prm_ref[:]
        pos_ref[:] = rlen * 0
        base_ref[:] = rlen * 0
        em_ref[:] = rlen * 0
        last_ref[:] = rlen * 0

        def group(g, conv):
            pos = pos_ref[:]
            base = base_ref[:]
            emitted = em_ref[:]
            last = last_ref[:]
            delta = (pos >> 5) - base
            conv = _advance(conv, delta, max_bits=4)
            base = base + delta
            rcols, lcols = [], []
            for s in range(G_RUN):
                active = emitted < rlen
                wpos = (pos >> 5) - base
                sw_a, sw_b = _window(conv, wpos, W_RUN)
                p = (pos & 31).astype(jnp.uint32)
                e = _entry_lookup(_peek16(sw_a, sw_b, p), f1r, f2_ref,
                                  subw, lmax, f2r)
                c = e & 511
                nb = (e >> 9) & 31
                resc = active & (c == 255)
                runlit = _extract(sw_a, sw_b, p + nb.astype(jnp.uint32), 16)
                runlen = jnp.where(resc, runlit, c)
                pos = pos + jnp.where(active,
                                      nb + jnp.where(resc, 16, 0), 0)
                last = jnp.where(active, jnp.where(resc, 16, nb), last)
                emitted1 = jnp.minimum(emitted + runlen, rlen)

                need_sym = active & (emitted1 < rlen)
                wpos = (pos >> 5) - base
                sw_a, sw_b = _window(conv, wpos, W_RUN)
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

                rcols.append(jnp.where(active, runlen, 0)[0:1, :])
                lcols.append(jnp.where(need_sym, sym, -1)[0:1, :])
                emitted = jnp.where(active,
                                    emitted1 + need_sym.astype(jnp.int32),
                                    emitted)
            runs_ref[pl.ds(g * G_RUN, G_RUN), :] = jnp.concatenate(
                rcols, axis=0)
            lits_ref[pl.ds(g * G_RUN, G_RUN), :] = jnp.concatenate(
                lcols, axis=0)
            pos_ref[:] = pos
            base_ref[:] = base
            em_ref[:] = emitted
            last_ref[:] = last
            return conv

        conv0 = rectT_ref[:].astype(jnp.int32)
        jax.lax.fori_loop(0, n_groups, group, conv0)
        stats_ref[0:1, :] = pos_ref[0:1, :]
        stats_ref[1:2, :] = last_ref[0:1, :]

    return kernel


def _round_up(x, mult):
    return (x + mult - 1) // mult * mult


def _prep_tables(f1c, f2):
    f1t = f1c.reshape(2, 128)
    f2r = _round_up(max(f2.shape[0], 128), 128) // 128
    f2p = jnp.pad(f2, (0, f2r * 128 - f2.shape[0])).reshape(f2r, 128)
    return f1t, f2p, f2r


@functools.partial(jax.jit, static_argnames=("max_len", "subw", "lmax",
                                             "interpret"))
def plain_chain_conveyor(rect, rlens, f1c, f2, signal, *, max_len: int,
                         subw: int, lmax: int, interpret: bool = False):
    """Drop-in for decode2.plain_chain: (N, K) u32 rect -> (N, max_len) u8.

    f1c (256,) i32 for this scheme; f2 flat i32; signal scalar (255 for
    type-2 schemes else 256).
    """
    n, k = rect.shape
    npad = _round_up(max(n, 128), 128)
    if npad != n:
        rect = jnp.pad(rect, ((0, npad - n), (0, 0)))
        rlens = jnp.pad(rlens, (0, npad - n))
    rectT = rect.T                                       # (K, Np)
    rlen8 = jnp.broadcast_to(rlens[None, :].astype(jnp.int32), (8, npad))
    f1t, f2p, f2r = _prep_tables(f1c, f2)
    f2r_used = f2r if subw else 0
    prm = jnp.broadcast_to(
        jnp.asarray(signal, jnp.int32).reshape(1, 1), (8, 128))
    groups = (max_len + G_PLAIN - 1) // G_PLAIN
    lp = groups * G_PLAIN
    kern = _plain_kernel_factory(k, groups, subw, lmax, f2r_used)
    outT, stats = pl.pallas_call(
        kern,
        grid=(npad // 128,),
        in_specs=[
            pl.BlockSpec((k, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2p.shape[0], 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lp, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lp, npad), jnp.int32),
            jax.ShapeDtypeStruct((8, npad), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)] * 3,
        interpret=interpret,
    )(rectT, rlen8, f1t, f2p, prm)
    return (outT.T[:n, :max_len].astype(jnp.uint8), stats[0, :n],
            stats[1, :n])


@functools.partial(jax.jit, static_argnames=("max_tokens", "subw", "lmax",
                                             "interpret"))
def run_chain_conveyor(rect, rlens, f1r, f1s, f2, nsignal, *,
                       max_tokens: int, subw: int, lmax: int,
                       interpret: bool = False):
    """Drop-in for decode2.run_chain: (N, K) u32 -> (runs, lits) (N, Tp)."""
    n, k = rect.shape
    npad = _round_up(max(n, 128), 128)
    if npad != n:
        rect = jnp.pad(rect, ((0, npad - n), (0, 0)))
        rlens = jnp.pad(rlens, (0, npad - n))
    rectT = rect.T
    rlen8 = jnp.broadcast_to(rlens[None, :].astype(jnp.int32), (8, npad))
    f1rt = f1r.reshape(2, 128)
    f1st = f1s.reshape(2, 128)
    f2r = _round_up(max(f2.shape[0], 128), 128) // 128
    f2p = jnp.pad(f2, (0, f2r * 128 - f2.shape[0])).reshape(f2r, 128)
    f2r_used = f2r if subw else 0
    prm = jnp.broadcast_to(
        jnp.asarray(nsignal, jnp.int32).reshape(1, 1), (8, 128))
    groups = (max_tokens + G_RUN - 1) // G_RUN
    tp = groups * G_RUN
    kern = _run_kernel_factory(k, groups, subw, lmax, f2r_used)
    runsT, litsT, stats = pl.pallas_call(
        kern,
        grid=(npad // 128,),
        in_specs=[
            pl.BlockSpec((k, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2p.shape[0], 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tp, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, npad), jnp.int32),
            jax.ShapeDtypeStruct((tp, npad), jnp.int32),
            jax.ShapeDtypeStruct((8, npad), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)] * 4,
        interpret=interpret,
    )(rectT, rlen8, f1rt, f1st, f2p, prm)
    return runsT.T[:n], litsT.T[:n], stats[0, :n], stats[1, :n]
