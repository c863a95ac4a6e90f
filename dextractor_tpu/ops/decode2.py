"""Gather-free batched Huffman decode on TPU (v2 of ops/decode_jax.py).

The v1 decoder (decode_jax.py) peeks the container image with per-symbol
byte gathers — on this TPU every gathered *element* costs ~16 cycles
serialized, so a 16 MB batch took ~6.4 s/step.  v2 removes essentially all
gathers from the per-symbol path:

  * entries are decoded from a dense per-entry rectangle of little-endian
    u32 words (N, K) — built once, host-side, at memcpy speed — so every
    lane owns row-local state only;
  * each fori iteration decodes a *group* (8 plain symbols / 3 run tokens)
    out of a 12-word register window; the window is refreshed once per
    group by a masked select+sum over the lane's own row (vector ops, zero
    gathers), amortizing the only data-dependent access;
  * the 64K peek table is replaced by a two-level lookup evaluated as
    one-hot contractions: L1 over the top 8 window bits (256-wide), L2
    over small subtables for codes longer than 8 bits — the same
    MXU/VPU one-hot trick the encoder uses (ops/bitstream_jax._lut_gather);
  * run expansion routes (runlen, literal) tokens to their columns through
    a time-reversed shift-compaction network (``expand_monotone``) instead
    of a per-element scatter;
  * every channel decodes from its own word-aligned rectangle — the native
    lens walk reports per-entry channel boundaries, so the host slices the
    del/ins/mrg/sub words and the packed delTag bytes directly, fetch
    traffic is per-channel, and run chains are bounded by exact token
    counts rather than rlen.

Semantics are identical to v1 (QV.c:510-691 decode contract, exercised by
the golden C-oracle tests); only the execution strategy changes.  On CPU
the one-hot contraction and masked-reduce degenerate to plain gathers
(cheap there); set DEXTRACTOR_DECODE2_OH=1 to force the TPU-style path in
tests.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.dispatch import pallas_ok

_FORCE_OH = os.environ.get("DEXTRACTOR_DECODE2_OH", "") == "1"


def _use_gather() -> bool:
    return (not _FORCE_OH) and jax.default_backend() == "cpu"


def conveyor_mode() -> str | None:
    """May the VMEM conveyor kernels dispatch, and how?

    "tpu" -> real Mosaic kernels; "interpret" -> pallas interpret mode
    (env DXT_CONVEYOR_INTERPRET=1 — CPU tests exercising the conveyor
    code path, incl. under shard_map); None -> XLA chains."""
    if pallas_ok():
        return "tpu"
    if os.environ.get("DXT_CONVEYOR_INTERPRET") == "1":
        return "interpret"
    return None


# ---------------------------------------------------------------------------
# host-side table + rectangle preparation
# ---------------------------------------------------------------------------

def scheme_tables2(schemes, lmax_bucket: int | None = None):
    """Two-level decode tables for a list of HSchemes.

    L1 (S, 256) i32 over the top 8 window bits: terminal entries pack
    ``len << 9 | sym``; prefixes whose code runs past 8 bits carry
    ``1 << 20 | subid``.  L2 is one flat (n_sub * subw,) i32 of
    ``len << 9 | sym`` rows, each ``subw = 2^(lmax-8)`` wide over window
    bits [8, lmax).  Returns (F1, F2flat, subw, lmax).
    """
    lmax = 1
    for s in schemes:
        s.with_lookup()
        lmax = max(lmax, int(s.codelens.max(initial=1)))
    if lmax_bucket is not None:
        lmax = max(lmax, lmax_bucket)
    lmax = 8 if lmax <= 8 else (12 if lmax <= 12 else 16)
    subw = 0 if lmax == 8 else 1 << (lmax - 8)

    f1 = np.zeros((len(schemes), 256), np.int32)
    f2_rows: list[np.ndarray] = []
    hi = np.arange(256) << 8
    for i, s in enumerate(schemes):
        look = s.lookup
        lens = s.codelens.astype(np.int32)
        sym0 = look[hi]
        l0 = lens[sym0]
        term = l0 <= 8
        f1[i] = np.where(term, (l0 << 9) | sym0, 0)
        for h in np.flatnonzero(~term):
            row = look[(h << 8) + (np.arange(subw) << (16 - lmax))]
            f2_rows.append((lens[row] << 9) | row)
            f1[i, h] = (1 << 20) | len(f2_rows) - 1
    if f2_rows:
        f2 = np.concatenate(f2_rows).astype(np.int32)
    else:
        f2 = np.zeros(max(subw, 1), np.int32)
    return f1, f2, subw, lmax


def spec_table(sids, f1, f2, types, subw: int, lmax: int,
               force: bool = False):
    """Static per-channel speculation sets for the conveyor pair step.

    Channel k's tuple is the set of possible BIT ADVANCES of one decoded
    symbol of that channel's scheme: every distinct code length in its
    L1/L2 tables, with escape entries (sym 255 of a type-2 scheme)
    advancing len+8 for plain channels and len+16 for the run channels
    (QV.c:510-599 plain, QV.c:604-691 run 16-bit length literal).
    Host-side numpy over decode_tables_v2 outputs; returns a 6-tuple of
    sorted int tuples in (del, drun, ins, mrg, sub, srun) order, passed
    static into decode_entry_batch2/_seg.

    DEFAULT OFF (DXT_PAIR=1 enables): the r5 chip A/B measured the pair
    step a ~10% per-launch LOSS (run 0.325 -> 0.367 ms, plain 0.448 ->
    0.477 ms; CHIP_r05 pair_step_speedup 1.007 on the full step) — the
    1024-chain interleave already made the conveyor THROUGHPUT-bound,
    so halving the serial depth buys nothing and the speculation's
    extra peeks/gathers bill ~10%.  The machinery stays for narrower
    batches (fewer chains = latency-bound again) and as the record of
    the experiment the round-4 verdict asked for.
    """
    if not force and os.environ.get("DXT_PAIR", "0") != "1":
        return None
    f1 = np.asarray(f1)
    f2 = np.asarray(f2)
    out = []
    for k in range(6):
        s = int(np.asarray(sids)[k])
        row = f1[s]
        esc = int(np.asarray(types)[s]) == 2
        extra = 16 if k in (1, 5) else 8
        is2 = ((row >> 20) & 1) == 1
        entries = [np.unique(row[~is2 & (row != 0)])]
        if subw:
            for sub_id in np.unique(row[is2] & 0xFFFF):
                entries.append(np.unique(
                    f2[sub_id * subw:(sub_id + 1) * subw]))
        lens: set = set()
        for e in np.concatenate(entries) if entries else []:
            ln, sym = (int(e) >> 9) & 31, int(e) & 511
            if ln:
                lens.add(ln + extra if (esc and sym == 255) else ln)
        out.append(tuple(sorted(lens)))
    return tuple(out)


def build_entry_rect(buf: np.ndarray, starts: np.ndarray, k_words: int):
    """Dense (N, K) little-endian u32 rectangle of per-entry bytes.

    Row r holds bytes buf[starts[r] : starts[r] + 4K] (clamped at the
    image end; the tail garbage is never consumed by a well-formed
    stream).  Host-side numpy — one fancy-index at memcpy-ish speed."""
    buf = np.asarray(buf, np.uint8)
    idx = np.asarray(starts, np.int64)[:, None] + np.arange(4 * k_words)
    b = buf[np.minimum(idx, max(len(buf) - 1, 0))]
    return np.ascontiguousarray(b).view(np.uint32)


def rect_k_words(starts: np.ndarray, buf_len: int, pad_words: int = 16) -> int:
    """Static K bucket: pow2 ≥ the longest entry (in u32 words) + slack."""
    starts = np.asarray(starts, np.int64)
    if len(starts) == 0:
        return 64
    ends = np.concatenate([starts[1:], np.array([buf_len], np.int64)])
    k = int(np.max((ends - starts + 3) // 4)) + pad_words
    return 1 << max(k - 1, 63).bit_length()


# ---------------------------------------------------------------------------
# gather-free device primitives
# ---------------------------------------------------------------------------

def _fetch12(rect, b0):
    """Fetch rect words [4*b0, 4*b0+12) of each row as an (N, 12) u32 window.

    TPU path: three masked select+sum passes over the row (zero gathers —
    per-element gathers cost ~16 serialized cycles on this TPU)."""
    n, k = rect.shape
    rect4 = rect.reshape(n, k // 4, 4)
    biota = jax.lax.broadcasted_iota(jnp.int32, (n, k // 4), 1)
    blocks = []
    for blk in range(3):
        m = biota == (b0 + blk)[:, None]
        blocks.append(jnp.where(m[:, :, None], rect4, jnp.uint32(0)).sum(
            axis=1, dtype=jnp.uint32))
    return jnp.concatenate(blocks, axis=1)               # (N, 12)


def _sel12(regs, idx):
    """regs[lane, idx[lane]] as one masked reduce (0 for out-of-range).

    A chain of 12 selects compiles pathologically on XLA (superlinear in
    chain depth); the single (N, 12) reduce is equivalent and cheap."""
    lane = jax.lax.broadcasted_iota(jnp.int32, regs.shape, 1)
    return jnp.where(lane == idx[:, None], regs, jnp.uint32(0)).sum(
        axis=1, dtype=jnp.uint32)


def _window_reader(rect):
    """(refresh, read) pair for a word-aligned per-channel rectangle.

    Every chain starts at word 0 of its own rectangle (the host slices
    each channel's bytes via the native lens walk), so a stream-window
    read is two plain word selects — no byte realignment.  TPU:
    ``refresh(pos)`` loads a 12-word register window once per group
    (masked reduce, zero gathers); CPU: ``read`` gathers directly."""
    use_g = _use_gather()
    k = rect.shape[1]

    def refresh(pos):
        if use_g:
            return None
        b0 = pos >> 7                       # 4-word block of word pos>>5
        return _fetch12(rect, b0), b0 << 2

    def read(state, pos):
        widx = pos >> 5
        if use_g:
            idx = jnp.clip(jnp.stack([widx, widx + 1], axis=1), 0, k - 1)
            w = jnp.take_along_axis(rect, idx, axis=1)
            return w[:, 0], w[:, 1]
        regs, base = state
        idx = widx - base
        return _sel12(regs, idx), _sel12(regs, idx + 1)

    return refresh, read


def _peek16(sw_a, sw_b, p):
    """Top 16 bits of the stream window at bit offset p (= pos & 31)."""
    hi = jnp.where(p == 0, sw_a,
                   (sw_a << p) | (sw_b >> ((jnp.uint32(32) - p)
                                           & jnp.uint32(31))))
    return (hi >> jnp.uint32(16)).astype(jnp.int32)


def _extract(sw_a, sw_b, off, nbits: int):
    """bits [off, off+nbits) of the 64-bit window sw_a:sw_b (off+nbits<=64)."""
    off = off.astype(jnp.uint32)
    lt = (sw_a << (off & 31)) | (sw_b >> ((jnp.uint32(32) - off)
                                          & jnp.uint32(31)))
    ge = sw_b << ((off - 32) & 31)
    hi = jnp.where(off == 0, sw_a, jnp.where(off < 32, lt, ge))
    return (hi >> jnp.uint32(32 - nbits)).astype(jnp.int32)


def _oh_lookup(tbl, idx):
    """tbl[idx] with OOB -> 0; one-hot contraction on TPU, gather on CPU."""
    d = tbl.shape[0]
    valid = (idx >= 0) & (idx < d)
    if _use_gather():
        return jnp.where(valid, tbl[jnp.clip(idx, 0, d - 1)], 0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], d), 1)
    return jnp.where(iota == idx[:, None], tbl[None, :], 0).sum(axis=1)


def _entry_lookup(cw, f1c, f2, subw: int, lmax: int):
    """(len << 9 | sym) for the 16-bit window cw via the two-level tables."""
    e1 = _oh_lookup(f1c, cw >> 8)
    if subw:
        is2 = (e1 >> 20) & 1
        idx2 = ((e1 & 0xFFFF) * subw
                + ((cw >> (16 - lmax)) & (subw - 1)))
        e2 = _oh_lookup(f2, jnp.where(is2 == 1, idx2, -1))
        return jnp.where(is2 == 1, e2, e1)
    return e1


def roll_rows(x, shift):
    """x[r, c] = x_in[r, (c + shift[r]) % width] — per-row roll, log rounds."""
    width = x.shape[1]
    for b in range(max(width - 1, 1).bit_length()):
        step = 1 << b
        x = jnp.where((((shift >> b) & 1) == 1)[:, None],
                      jnp.roll(x, -step, axis=1), x)
    return x


_EXP_LIVE = jnp.int32(1 << 30)     # packed-state live bit (below the sign)


def expand_monotone(vals: tuple, disp, width: int, live0=None, *,
                    value_bits: int = 8):
    """Route element at column r to column r + disp[r] (time-reversed
    shift compaction).

    Among live elements disp must be >= 0 and non-decreasing along each
    row, with r + disp[r] < width.  ``live0`` (N, t) masks which source
    elements participate (default all); dead elements never move and
    never count as occupancy, so callers can park exhausted-token tails
    by deadening them instead of routing them past the payload (which
    would double the required width).

    This is ``compact_monotone`` run backwards: the stage-b movers are
    the elements whose displacement has bit b set, processed MSB -> LSB
    with right-rolls, which time-reverses the proven LSB -> MSB
    left-roll compaction of the expanded layout back to ranks.  MSB ->
    LSB right-routing is collision-free for live elements: a mover
    landing on a live stationary slot would force the two displacements'
    above-b parts to differ by >= 2^(b+1) while their positions differ
    by exactly 2^b — impossible when disp is non-decreasing.

    Returns the routed arrays plus a routed-occupancy mask (N, width) —
    unrouted slots hold garbage.

    Execution notes: value (``value_bits``, default 8), displacement
    (30 - value_bits bits) and liveness (1 bit, bit 30) are packed into
    ONE i32 plane so each round is a single roll + selects, and every
    round ends in an ``optimization_barrier`` — XLA:TPU miscompiles the
    fused multi-round network at large widths (observed: width 8192,
    ~8% of rows wrong while CPU and the round-snapshotted program are
    exact), and pinning round boundaries restores correctness.
    """
    n, t = disp.shape
    width = int(width)
    pad = width - t
    if pad < 0:
        raise ValueError("expand_monotone: width must be >= token count")
    vb = int(value_bits)
    if width > (1 << (30 - vb)):
        raise ValueError("expand_monotone: width exceeds the packed "
                         "displacement field; use multi-value planes")
    vmask = (1 << vb) - 1
    multi = len(vals) > 1
    if live0 is None:
        live = jnp.ones((n, t), jnp.bool_)
    else:
        live = live0
    lv = jnp.pad(live, ((0, 0), (0, pad)))
    d = jnp.pad(jnp.where(live, disp, 0), ((0, 0), (0, pad)))
    if multi:
        # multi-value fallback: separate planes per value (monster widths
        # whose displacement no longer fits the packed field)
        arrs = [jnp.pad(v, ((0, 0), (0, pad))) for v in vals]
        state = [lv, d] + arrs
    else:
        v = jnp.pad(vals[0] & vmask, ((0, 0), (0, pad)))
        s = v | (d << vb) | jnp.where(lv, _EXP_LIVE, 0)
        state = [s]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    for b in reversed(range(max(width - 1, 1).bit_length())):
        step = 1 << b
        if multi:
            lv, d = state[0], state[1]
            movers = lv & (((d >> b) & 1) == 1)
            dst = jnp.roll(movers, step, axis=1) & (col >= step)
            state[2:] = [jnp.where(dst, jnp.roll(a, step, axis=1), a)
                         for a in state[2:]]
            state[1] = jnp.where(dst, jnp.roll(d, step, axis=1) - step, d)
            state[0] = (lv & ~movers) | dst
        else:
            s = state[0]
            movers = (((s >> 30) & (s >> (vb + b))) & 1) == 1
            # live bit (30) AND displacement bit b (vb+b)
            rolled = jnp.roll(s, step, axis=1)
            dst = ((((rolled >> 30) & (rolled >> (vb + b))) & 1) == 1) \
                & (col >= step)
            s = jnp.where(dst, rolled - (step << vb),
                          jnp.where(movers, s & ~_EXP_LIVE, s))
            state[0] = s
        state = list(jax.lax.optimization_barrier(tuple(state)))
    if multi:
        return tuple(state[2:]), state[0]
    s = state[0]
    return (s & vmask,), ((s >> 30) & 1) == 1


# ---------------------------------------------------------------------------
# chain decoders
# ---------------------------------------------------------------------------

def plain_chain(rect, rlens, f1c, f2, signal, *, max_len: int,
                subw: int, lmax: int, max_sym: int | None = None,
                pos0=None, spec=None):
    """Decode N plain streams, one per word-aligned rectangle row.

    Returns symbols (N, max_len) u8.  On accelerator backends the chains
    run in the VMEM conveyor kernel (ops/decode_conveyor); the XLA
    formulation below serves CPU and as the semantics reference.  Eight
    symbols per window refresh: 8 * 24 bits worst case fits the 12-word
    register window from any starting alignment.

    ``pos0`` (N,) i32 in [0, 32): each chain's starting bit offset within
    its rectangle — segment chains resume mid-stream from the native
    walker's checkpoints (rows are sliced at the checkpoint's word)."""
    f2_rows = (f2.shape[0] + 127) // 128
    # ``max_sym`` (static, the batch's bucketed longest read) caps the
    # serial group-steps below the padded row width — pow2 row bucketing
    # alone would run up to 2x dead steps past every chain's end
    ml = max_len if max_sym is None else min(max_len, max_sym)
    # the conveyor keeps each chain's whole stream resident in VMEM —
    # beyond 2048 words it drops sublane groups (G = 4/2/1, proportional
    # chains-per-step) up to 16384 words (~60-130 kb reads); only past
    # that does the windowed XLA chain below take over
    cmode = conveyor_mode()
    if (cmode and rect.shape[1] <= 16384
            and (not subw or f2_rows <= 16)):
        from .decode_conveyor import plain_chain_conveyor

        out = plain_chain_conveyor(rect, rlens, f1c, f2, signal,
                                   max_len=ml, subw=subw, lmax=lmax,
                                   interpret=cmode == "interpret",
                                   pos0=pos0, spec=spec)[0]
        if ml < max_len:
            out = jnp.pad(out, ((0, 0), (0, max_len - ml)))
        return out
    n = rlens.shape[0]
    group_sz = 8
    groups = (ml + group_sz - 1) // group_sz
    refresh, read = _window_reader(rect)

    def group(g, carry):
        pos, last, out = carry
        state = refresh(pos)
        syms = []
        jbase = g * group_sz
        for s in range(group_sz):
            active = (jbase + s) < rlens
            sw_a, sw_b = read(state, pos)
            p = (pos & 31).astype(jnp.uint32)
            cw = _peek16(sw_a, sw_b, p)
            entry = _entry_lookup(cw, f1c, f2, subw, lmax)
            sym = entry & 511
            nbits = (entry >> 9) & 31
            esc = active & (sym == signal)
            lit = _extract(sw_a, sw_b, p + nbits.astype(jnp.uint32), 8)
            sym = jnp.where(esc, lit, sym)
            width = jnp.where(esc, 8, nbits)
            pos = jnp.where(active, pos + jnp.where(esc, nbits + 8, nbits),
                            pos)
            last = jnp.where(active, width, last)
            syms.append(jnp.where(active, sym, 0).astype(jnp.uint8))
        out = jax.lax.dynamic_update_slice(
            out, jnp.stack(syms, axis=1), (0, jbase))
        return pos, last, out

    z = rlens * 0
    out0 = jnp.broadcast_to(z.astype(jnp.uint8)[:, None],
                            (n, groups * group_sz))
    p0 = z if pos0 is None else pos0.astype(z.dtype)
    pos, last, out = jax.lax.fori_loop(0, groups, group, (p0, z, out0))
    out = out[:, :ml]
    if ml < max_len:
        out = jnp.pad(out, ((0, 0), (0, max_len - ml)))
    return out


def plain_chains(specs, rlens, f2, *, max_len: int, lmax: int,
                 max_sym: int | None = None, pos0=None):
    """Decode several plain channels, merging conveyor-eligible ones
    that share an L2 need into ONE multi-channel launch (the chains are
    latency-bound, so C channels in one serial walk cost far less than C
    walks).  ``specs`` is a list of (key, rect, f1c, signal, subw,
    spec_lens); ``pos0`` an optional {key: (N,) i32} of per-chain
    starting bit offsets (segment decode); returns {key: (N, max_len)
    u8 rows}.
    """
    out = {}
    ml = max_len if max_sym is None else min(max_len, max_sym)
    f2_rows = (f2.shape[0] + 127) // 128
    singles = []
    cmode = conveyor_mode()
    if cmode:
        from .decode_conveyor import plain_chains_conveyor

        by_sw: dict = {}
        for key, rect, f1c, sg, sw_k, sp_k in specs:
            if rect.shape[1] <= 16384 and (not sw_k or f2_rows <= 16):
                by_sw.setdefault(sw_k, []).append((key, rect, f1c, sg,
                                                   sp_k))
            else:
                singles.append((key, rect, f1c, sg, sw_k, sp_k))
        for sw_k, grp in by_sw.items():
            if len(grp) == 1:      # reuse the single-channel program
                g0 = grp[0]
                singles.append(g0[:4] + (sw_k, g0[4]))
                continue
            # the merged launch speculates over the UNION of the group's
            # advance sets (each slot's lookup already routes per-slot)
            sps = [g[4] for g in grp]
            sp_u = (None if any(s is None for s in sps)
                    else tuple(sorted(set().union(*map(set, sps)))))
            res = plain_chains_conveyor(
                [g[1] for g in grp], rlens, [g[2] for g in grp], f2,
                [g[3] for g in grp], max_len=ml, subw=sw_k, lmax=lmax,
                interpret=cmode == "interpret", spec=sp_u,
                pos0=None if pos0 is None else [pos0.get(g[0])
                                                for g in grp])
            for (key, *_), (syms, _, _) in zip(grp, res):
                if ml < max_len:
                    syms = jnp.pad(syms, ((0, 0), (0, max_len - ml)))
                out[key] = syms
    else:
        singles = [s for s in specs]
    for key, rect, f1c, sg, sw_k, sp_k in singles:
        out[key] = plain_chain(rect, rlens, f1c, f2, sg, max_len=max_len,
                               subw=sw_k, lmax=lmax, max_sym=max_sym,
                               spec=sp_k,
                               pos0=None if pos0 is None
                               else pos0.get(key))
    return out


def run_chain(rect, rlens, f1r, f1s, f2, nsignal, *,
              max_tokens: int, subw: int, lmax: int, pos0=None,
              carry=None, spec=None):
    """Decode N RLE streams into (runlen, literal) token pairs.

    Three tokens per window refresh (3 * 56 bits worst case fits the
    12-word window).  ``max_tokens`` comes from the native lens walk's
    exact per-entry token counts, so the chain length is tight rather
    than bounded by rlen.  Token semantics match
    decode_jax.decode_run_batch.  On accelerator backends the chains run
    in the VMEM conveyor kernel (ops/decode_conveyor).

    Segment chains (``pos0``/``carry`` from the walker's checkpoints):
    the chain starts at bit ``pos0`` and, when ``carry >= 0``, its first
    token is the virtual pair (carry, literal-at-pos0) — a checkpoint
    inside a run resumes with the leftover rchars prepended and the
    stream positioned AT the run's literal code; carry < 0 starts at a
    run code normally."""
    f2_rows = (f2.shape[0] + 127) // 128
    cmode = conveyor_mode()
    if (cmode and rect.shape[1] <= 16384
            and (not subw or f2_rows <= 16)):
        from .decode_conveyor import run_chain_conveyor

        return run_chain_conveyor(rect, rlens, f1r, f1s, f2, nsignal,
                                  max_tokens=max_tokens, subw=subw,
                                  lmax=lmax,
                                  interpret=cmode == "interpret",
                                  pos0=pos0, carry=carry, spec=spec)[:2]
    n = rlens.shape[0]
    group_sz = 3
    groups = (max_tokens + group_sz - 1) // group_sz
    t_pad = groups * group_sz
    refresh, read = _window_reader(rect)

    def group(g, st):
        pos, emitted, last, runs, lits = st
        state = refresh(pos)
        rcols, lcols = [], []
        for s in range(group_sz):
            active = emitted < rlens
            sw_a, sw_b = read(state, pos)
            p = (pos & 31).astype(jnp.uint32)
            cw = _peek16(sw_a, sw_b, p)
            entry = _entry_lookup(cw, f1r, f2, subw, lmax)
            c = entry & 511
            nb = (entry >> 9) & 31
            resc = active & (c == 255)
            runlit = _extract(sw_a, sw_b, p + nb.astype(jnp.uint32), 16)
            runlen = jnp.where(resc, runlit, c)
            width = jnp.where(resc, 16, nb)
            if carry is not None and s == 0:
                # segment phase: the first token of the chain is the
                # checkpoint's virtual (carry, literal) pair — no run
                # code is read and the stream sits at the literal
                phase = (g == 0) & (carry >= 0)
                runlen = jnp.where(phase, carry, runlen)
                resc = resc & ~phase
                pos = pos + jnp.where(
                    active & ~phase, nb + jnp.where(resc, 16, 0), 0)
            else:
                pos = pos + jnp.where(active,
                                      nb + jnp.where(resc, 16, 0), 0)
            emitted1 = jnp.minimum(emitted + runlen, rlens)

            need_sym = active & (emitted1 < rlens)
            sw_a, sw_b = read(state, pos)
            p = (pos & 31).astype(jnp.uint32)
            cw2 = _peek16(sw_a, sw_b, p)
            entry2 = _entry_lookup(cw2, f1s, f2, subw, lmax)
            sym = entry2 & 511
            snb = (entry2 >> 9) & 31
            sesc = need_sym & (sym == nsignal)
            slit = _extract(sw_a, sw_b, p + snb.astype(jnp.uint32), 8)
            sym = jnp.where(sesc, slit, sym)
            pos = pos + jnp.where(need_sym,
                                  snb + jnp.where(sesc, 8, 0), 0)
            width = jnp.where(need_sym, jnp.where(sesc, 8, snb), width)

            rcols.append(jnp.where(active, runlen, 0))
            lcols.append(jnp.where(need_sym, sym, -1))
            last = jnp.where(active, width, last)
            emitted = jnp.where(active,
                                emitted1 + need_sym.astype(jnp.int32),
                                emitted)
        jbase = g * group_sz
        runs = jax.lax.dynamic_update_slice(
            runs, jnp.stack(rcols, axis=1), (0, jbase))
        lits = jax.lax.dynamic_update_slice(
            lits, jnp.stack(lcols, axis=1), (0, jbase))
        return pos, emitted, last, runs, lits

    z = rlens * 0
    runs0 = jnp.broadcast_to(z[:, None], (n, t_pad))
    lits0 = runs0 - 1
    p0 = z if pos0 is None else pos0.astype(z.dtype)
    pos, emitted, last, runs, lits = jax.lax.fori_loop(
        0, groups, group, (p0, z, z, runs0, lits0))
    return runs, lits


def _expand_dispatch(runs, lits, rchar, *, max_len: int):
    """Route run expansion to the VMEM Pallas network on accelerators
    (no per-round HBM barriers); the XLA formulation stays the CPU path
    and the fallback.  Chip-validated byte-exact and a 1.045x step win
    under the merged-chain decode (tools/chip_probe.py A/B), so ON by
    default on TPU (the Mosaic kernel is TPU-only — a GPU backend takes
    the XLA network); env DXT_EXPAND_PALLAS=0 forces the XLA network."""
    import os

    if (jax.default_backend() == "tpu"
            and max(max_len, runs.shape[1]) <= 16384
            and os.environ.get("DXT_EXPAND_PALLAS", "1") == "1"):
        # width cap: the VMEM kernel holds (B, width) i32 planes and its
        # roll network is chip-validated to bench widths; long-read
        # buckets (wider planes, few rows) take the XLA network
        from .expand_pallas import expand_runs_pallas

        return expand_runs_pallas(runs, lits, rchar, max_len=max_len)
    return expand_runs2(runs, lits, rchar, max_len=max_len)


def _unpack_tag_codes(tag_bytes, width: int):
    """Positional 2-bit delTag unpack: code k of each row lands at column
    k (Unpack_Tag order, first symbol in bits 7-6 — QV.c:824-847,
    DB.c:334).  (N, TB) u8 -> (N, width) i32.  No gathers: the code
    index IS the column index."""
    n, tb = tag_bytes.shape
    shifts = jnp.array([6, 4, 2, 0], jnp.uint8)
    codes = ((tag_bytes[:, :, None] >> shifts[None, None, :]) & 3)
    codes = codes.reshape(n, 4 * tb).astype(jnp.int32)
    if codes.shape[1] < width:
        codes = jnp.pad(codes, ((0, 0), (0, width - codes.shape[1])))
    return codes[:, :width]


def _tag_letters(codes):
    """2-bit code -> ascii 'a/c/g/t' (undexqv.c tag alphabet)."""
    return jnp.where(
        codes == 0, 97, jnp.where(codes == 1, 99,
                                  jnp.where(codes == 2, 103, 116)))


def expand_del_tag(runs, lits, codes_t, rchar, *, max_len: int):
    """Expand delQV run tokens and route the delTag in the same network.

    Literal k is by construction the k-th non-delChar symbol of the read
    (tokenize_runs / QV.c:448-506 emit one token per non-rchar symbol),
    so kept-rank == token index and packed tag code k (unpacked
    positionally, no gather) rides the same displacement as literal k —
    the separate keep-cumsum + rank-gather tag route (QV.c:824-847
    semantics) collapses into this one pass.

    Returns (del_rows (N, max_len) u8, tag_rows (N, max_len) i32 with
    -1 at in-read holes to be replaced by 'n' and masked by the caller).
    """
    n, t = runs.shape
    d = jnp.cumsum(runs, axis=1)
    valid = lits >= 0
    width = max(max_len, t)
    if width <= (1 << 20):
        val = (lits & 0xFF) | (codes_t << 8)
        (routed,), occ = expand_monotone((val,), d, width, live0=valid,
                                         value_bits=10)
        rlit, rtag = routed & 0xFF, routed >> 8
    else:
        (rlit, rtag), occ = expand_monotone((lits & 0xFF, codes_t), d,
                                            width, live0=valid)
    del_rows = jnp.where(occ, rlit,
                         jnp.asarray(rchar, jnp.int32))[:, :max_len]
    tag_rows = jnp.where(occ, _tag_letters(rtag), -1)[:, :max_len]
    return del_rows.astype(jnp.uint8), tag_rows


def expand_runs2(runs, lits, rchar, *, max_len: int):
    """Expand (runlen, literal) token pairs into symbol rows, gather-free.

    Literal k of lane i lands at column cumsum(runs)[i, k] + k, i.e. a
    displacement of cumsum(runs)[i, k] from its token column — monotone,
    so the shift-expansion network routes it; exhausted-token tails are
    parked past max_len and sliced away."""
    n, t = runs.shape
    d = jnp.cumsum(runs, axis=1)
    valid = lits >= 0
    (routed,), occ = expand_monotone(
        (lits,), d, max(max_len, t), live0=valid)
    rows = jnp.where(occ, routed, jnp.asarray(rchar, jnp.int32))
    return rows[:, :max_len].astype(jnp.uint8)


# ---------------------------------------------------------------------------
# fused five-channel entry decode
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("max_len", "max_tokens", "del_mode",
                              "sub_mode", "subw", "lmax", "chan_l2",
                              "max_sym", "spec"))
def decode_entry_batch2(rect_del, tag_bytes, rect_ins, rect_mrg, rect_sub,
                        rlens, sids, f1, f2, types, del_char, sub_char, *,
                        max_len: int, max_tokens: int, del_mode: str,
                        sub_mode: str, subw: int, lmax: int,
                        chan_l2: tuple | None = None,
                        max_sym: int | None = None,
                        spec: tuple | None = None):
    """Fully fused five-channel .dexqv entry decode, gather-free.

    Each channel decodes from its own word-aligned rectangle (the native
    lens walk supplies per-entry channel boundaries, so the host slices
    them at memcpy speed): every chain starts at word 0, fetch traffic is
    proportional to the channel being decoded rather than the whole entry,
    and the packed delTag bytes arrive pre-sliced (no on-device byte
    realignment).

    rect_del/ins/mrg/sub: (N, K_c) u32 channel words; tag_bytes (N, TB) u8
    with 4*TB >= max_len; rlens (N,) i32; sids (6,) i32 scheme ids
    (del, drun, ins, mrg, sub, srun); f1 (S, 256) i32 L1 tables; f2 flat
    i32 L2; types (S,) i32.

    Semantics identical to the sequential decoder (QV.c:1428-1477 raw
    container case): returns (5, N, max_len) u8 rows."""
    n = rlens.shape[0]
    f1c = [jnp.take(f1, sids[k], axis=0) for k in range(6)]
    sig = [jnp.where(types[sids[k]] == 2, 255, 256) for k in range(6)]
    # per-channel L2 need (host-computed static): channels whose scheme is
    # fully L1-terminal skip the escape-table mux entirely
    sw = [subw if (chan_l2 is None or chan_l2[k]) else 0 for k in range(6)]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, max_len), 1)
    in_read = col < rlens[:, None]

    # -- delQV + delTag -------------------------------------------------
    # Run mode: kept-rank == token index (literals are exactly the
    # non-delChar symbols), so the positionally-unpacked tag codes ride
    # the run-expansion network alongside the literals — no keep-cumsum,
    # no rank gather, no separate tag kernel.  Plain mode: every in-read
    # position is kept, so the tag is a direct positional unpack.
    # the plain channels (ins, mrg, and del/sub when not run-coded) merge
    # into one multi-channel conveyor launch — one serial symbol walk for
    # all of them (plain_chains groups by L2 need)
    sp = spec if spec is not None else (None,) * 6
    specs = [("ins", rect_ins, f1c[2], sig[2], sw[2], sp[2]),
             ("mrg", rect_mrg, f1c[3], sig[3], sw[3], sp[3])]
    if del_mode != "run":
        specs.append(("del", rect_del, f1c[0], sig[0], sw[0], sp[0]))
    if sub_mode != "run":
        specs.append(("sub", rect_sub, f1c[4], sig[4], sw[4], sp[4]))
    prows = plain_chains(specs, rlens, f2, max_len=max_len, lmax=lmax,
                         max_sym=max_sym)
    ins_rows = prows["ins"]
    mrg_rows = prows["mrg"]

    if del_mode == "run":
        runs, lits = run_chain(
            rect_del, rlens, f1c[1], f1c[0], f2, sig[0],
            max_tokens=max_tokens, subw=max(sw[0], sw[1]), lmax=lmax,
            spec=sp[1])
        codes_t = _unpack_tag_codes(tag_bytes, runs.shape[1])
        del_rows, tag_r = expand_del_tag(runs, lits, codes_t, del_char,
                                         max_len=max_len)
        tag_rows = jnp.where(
            tag_r >= 0, tag_r,
            jnp.where(in_read, np.int32(ord("n")), 0)).astype(jnp.uint8)
        tag_rows = jnp.where(in_read, tag_rows, jnp.uint8(0))
    else:
        del_rows = prows["del"]
        codes = _unpack_tag_codes(tag_bytes, max_len)
        tag_rows = jnp.where(in_read, _tag_letters(codes),
                             0).astype(jnp.uint8)

    if sub_mode == "run":
        sruns, slits = run_chain(
            rect_sub, rlens, f1c[5], f1c[4], f2, sig[4],
            max_tokens=max_tokens, subw=max(sw[4], sw[5]), lmax=lmax,
            spec=sp[5])
        sub_rows = _expand_dispatch(sruns, slits, sub_char, max_len=max_len)
    else:
        sub_rows = prows["sub"]

    z = jnp.uint8(0)
    mask = lambda r: jnp.where(in_read, r, z)
    return jnp.stack([mask(del_rows), tag_rows, mask(ins_rows),
                      mask(mrg_rows), mask(sub_rows)])

# ---------------------------------------------------------------------------
# segmented five-channel entry decode (long reads)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("seg", "s_per", "max_len", "max_tokens",
                              "del_mode", "sub_mode", "subw", "lmax",
                              "chan_l2", "spec"))
def decode_entry_batch_seg(rect_del, tag_in, rect_ins, rect_mrg, rect_sub,
                           rlens, seg_rlens, pos0, carr, sids, f1, f2,
                           types, del_char, sub_char, *, seg: int,
                           s_per: int, max_len: int, max_tokens: int,
                           del_mode: str, sub_mode: str, subw: int,
                           lmax: int, chan_l2: tuple | None = None,
                           spec: tuple | None = None):
    """Segmented fused five-channel .dexqv decode.

    Long reads decode as ``s_per`` independent SHORT chains per read from
    the native walker's checkpoints (qv_codec._index_checkpoints) instead
    of one long one — the conveyor's per-group costs scale with stream
    residency (K), so reads of any length run at the proven short-chain
    geometry (the reference's envelope: per-read cost independent of
    length, QV.c:510-691 + realloc growth).  Chain rows are segment-major
    (read r, segment k) -> row r * s_per + k; every read owns exactly
    ``s_per`` segment rows (dead ones have seg_rlens 0 and cost no serial
    steps), so the (NS, seg) symbol rows reshape EXACTLY to
    (N, s_per * seg) and slice to max_len.

    rect_*: (NS, K_c) u32 segment rectangles (sliced at each checkpoint's
    word); tag_in: (N, TB) u8 packed tag bytes (plain-del mode) or
    (NS, Tt) i32 per-segment tag codes (run-del mode, codes t0..t0+Tt of
    the read's global kept-rank sequence); rlens (N,); seg_rlens (NS,);
    pos0 (4, NS) per-channel starting bit offsets in [0, 32); carr
    (2, NS) del/sub run carries (-1 = start at a run code; >= 0 = the
    checkpoint fell inside a run: prepend that many rchars and read the
    literal first).  Returns (5, N, max_len) u8 rows."""
    n = rlens.shape[0]
    ns = seg_rlens.shape[0]
    f1c = [jnp.take(f1, sids[k], axis=0) for k in range(6)]
    sig = [jnp.where(types[sids[k]] == 2, 255, 256) for k in range(6)]
    sw = [subw if (chan_l2 is None or chan_l2[k]) else 0 for k in range(6)]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, max_len), 1)
    in_read = col < rlens[:, None]

    def widen(rows_seg):
        """(NS, seg) segment rows -> (N, max_len) read rows."""
        r = rows_seg.reshape(n, s_per * seg)
        if s_per * seg < max_len:      # short-read bucket under the
            r = jnp.pad(r, ((0, 0), (0, max_len - s_per * seg)))
        return r[:, :max_len]          # 512-floor of the width bucket

    sp = spec if spec is not None else (None,) * 6
    specs = [("ins", rect_ins, f1c[2], sig[2], sw[2], sp[2]),
             ("mrg", rect_mrg, f1c[3], sig[3], sw[3], sp[3])]
    p0s = {"ins": pos0[1], "mrg": pos0[2]}
    if del_mode != "run":
        specs.append(("del", rect_del, f1c[0], sig[0], sw[0], sp[0]))
        p0s["del"] = pos0[0]
    if sub_mode != "run":
        specs.append(("sub", rect_sub, f1c[4], sig[4], sw[4], sp[4]))
        p0s["sub"] = pos0[3]
    prows = plain_chains(specs, seg_rlens, f2, max_len=seg, lmax=lmax,
                         pos0=p0s)
    ins_rows = widen(prows["ins"])
    mrg_rows = widen(prows["mrg"])

    if del_mode == "run":
        runs, lits = run_chain(
            rect_del, seg_rlens, f1c[1], f1c[0], f2, sig[0],
            max_tokens=max_tokens, subw=max(sw[0], sw[1]), lmax=lmax,
            pos0=pos0[0], carry=carr[0], spec=sp[1])
        tp = runs.shape[1]
        codes_t = tag_in[:, :tp]
        if codes_t.shape[1] < tp:
            codes_t = jnp.pad(codes_t,
                              ((0, 0), (0, tp - codes_t.shape[1])))
        del_rows_s, tag_r_s = expand_del_tag(runs, lits, codes_t, del_char,
                                             max_len=seg)
        del_rows = widen(del_rows_s)
        tag_r = widen(tag_r_s)
        tag_rows = jnp.where(
            tag_r >= 0, tag_r,
            jnp.where(in_read, np.int32(ord("n")), 0)).astype(jnp.uint8)
        tag_rows = jnp.where(in_read, tag_rows, jnp.uint8(0))
    else:
        del_rows = widen(prows["del"])
        codes = _unpack_tag_codes(tag_in, max_len)
        tag_rows = jnp.where(in_read, _tag_letters(codes),
                             0).astype(jnp.uint8)

    if sub_mode == "run":
        sruns, slits = run_chain(
            rect_sub, seg_rlens, f1c[5], f1c[4], f2, sig[4],
            max_tokens=max_tokens, subw=max(sw[4], sw[5]), lmax=lmax,
            pos0=pos0[3], carry=carr[1], spec=sp[5])
        sub_rows = widen(_expand_dispatch(sruns, slits, sub_char,
                                          max_len=seg))
    else:
        sub_rows = widen(prows["sub"])

    z = jnp.uint8(0)
    mask = lambda r: jnp.where(in_read, r, z)
    return jnp.stack([mask(del_rows), tag_rows, mask(ins_rows),
                      mask(mrg_rows), mask(sub_rows)])
