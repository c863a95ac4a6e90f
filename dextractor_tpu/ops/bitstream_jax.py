"""Batched Huffman bitstream encoding on TPU.

The reference encodes one symbol at a time through a 32-bit shift register
(OCODE, QV.c:404-422).  The TPU formulation turns the whole file into one
data-parallel program over an (N, Lpad) rectangle of streams:

  1. per-symbol emission values/widths via 256-entry LUT gathers
     (escapes fused: code||literal as one <=32-bit emission);
  2. run tokenization via a row-wise exclusive running maximum of literal
     positions (no sequential scan over symbols);
  3. bit offsets via row-wise exclusive cumulative sums;
  4. word assembly via running sums over slots plus one scatter-set per
     word (see ``pack_words`` — word indices are monotone and never skip);
  5. the reference's exact tail-padding (duplicate/zero word) applied as a
     cheap host-side gather using per-row totals.

Every step is elementwise, cumsum, or scatter — shapes are static, so XLA
fuses 1-3 and the TPU stays HBM-bound.  uint64 is avoided throughout (TPU
has no native 64-bit lanes): hi/lo word contributions use clamped 32-bit
shifts.

Scheme tables enter as packed (256,) int32 LUTs (bits<<6 | len<<1 | esc)
so each symbol costs one gather (see ``scheme_luts``).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .huffman import HScheme
from ..utils.dispatch import pallas_ok


def scheme_luts(scheme: HScheme, run: bool = False) -> np.ndarray:
    """Pack a scheme into a (256,) int32 LUT: ``bits << 6 | len << 1 | esc``.

    One gather per symbol recovers all three fields (final schemes have
    codes <= 16 bits and lengths <= 16, so the packing is exact).

    Symbol schemes escape only when type == 2 (Encode, QV.c:397-402); run
    schemes test code-equals-255's-code *unconditionally* (Encode_Run,
    QV.c:468-469), so their flag is set for every bucket sharing 255's code.
    """
    esc = np.zeros(256, np.int64)
    if run or scheme.type == 2:
        esc = ((scheme.codebits == scheme.codebits[255])
               & (scheme.codelens == scheme.codelens[255])).astype(np.int64)
    packed = ((scheme.codebits.astype(np.int64) << 6)
              | (scheme.codelens.astype(np.int64) << 1) | esc)
    return packed.astype(np.int32)


def _excl_cumsum(x, axis):
    c = jnp.cumsum(x, axis=axis)
    return c - x


USE_MXU_GATHER = True


def _lut_gather(data, lut_i32):
    """256-entry LUT lookup for every element of ``data`` (u8 -> i32).

    TPU one-element gathers cost ~16 cycles each, so by default the lookup
    rides the MXU instead: a one-hot matmul against the LUT split into
    three bf16-exact byte planes (each < 256, so every product and the
    single-term sums are exact).  data (N, L) -> (N, L) i32.
    """
    if not USE_MXU_GATHER or jax.default_backend() == "cpu":
        return lut_i32[data.astype(jnp.int32)]
    from .lut_pallas import lut_gather_lane

    return lut_gather_lane(data, lut_i32)


def _sym_emissions(data, luts):
    """Fused emission (value u32, width, granular-last-width) per symbol.

    One packed-LUT gather per symbol: bits<<6 | len<<1 | esc."""
    packed = _lut_gather(data, luts).astype(jnp.uint32)
    bits = packed >> jnp.uint32(6)
    lens = ((packed >> jnp.uint32(1)) & 31).astype(jnp.int32)
    esc = (packed & 1).astype(jnp.bool_)
    v = jnp.where(esc, (bits << 8) | data.astype(jnp.uint32), bits)
    n = jnp.where(esc, lens + 8, lens)
    gran = jnp.where(esc, 8, lens)
    return v, n, gran


def plain_emissions(data, lengths, luts):
    """Emissions for a non-RLE stream rectangle (N, L).

    Returns (v, n) of shape (N, L) plus (T, last_gran) of shape (N,).
    """
    n_rows, l = data.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (n_rows, l), 1)
    valid = col < lengths[:, None]
    v, n, gran = _sym_emissions(data, luts)
    v = jnp.where(valid, v, 0)
    n = jnp.where(valid, n, 0)
    t = n.sum(axis=1)
    idx = jnp.maximum(lengths - 1, 0)
    last_gran = jnp.where(lengths > 0, jnp.take_along_axis(gran, idx[:, None], 1)[:, 0], 0)
    return v, n, t, last_gran


def run_emissions(data, lengths, rchar, sym_luts, run_luts):
    """Emissions for an RLE stream rectangle (N, L).

    Token layout per row: slots [2i, 2i+1] hold the run emission and the
    literal emission for position i (nonzero only where data[i] != rchar),
    slot 2L holds the trailing run emission.  Run lengths are recovered
    without a sequential walk: an inclusive row max of literal positions,
    shifted, gives the previous literal index at every position.
    """
    n_rows, l = data.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (n_rows, l), 1)
    valid = col < lengths[:, None]
    is_lit = valid & (data != rchar)

    lit_pos = jnp.where(is_lit, col, -1)
    run_max = jax.lax.associative_scan(jnp.maximum, lit_pos, axis=1)
    prev_lit = jnp.concatenate(
        [jnp.full((n_rows, 1), -1, jnp.int32), run_max[:, :-1]], axis=1)
    runlen = col - prev_lit - 1

    # run emission before each literal (escape flag from the LUT: any
    # bucket sharing 255's code escapes, not just 255)
    x = jnp.minimum(runlen, 255)
    rpacked = _lut_gather(x, run_luts).astype(jnp.uint32)
    rb = rpacked >> jnp.uint32(6)
    rl = ((rpacked >> jnp.uint32(1)) & 31).astype(jnp.int32)
    resc = (rpacked & 1).astype(jnp.bool_)
    rv = jnp.where(resc, (rb << 16) | (runlen.astype(jnp.uint32) & 0xFFFF), rb)
    rn = jnp.where(resc, rl + 16, rl)
    rgran = jnp.where(resc, 16, rl)
    rv = jnp.where(is_lit, rv, 0)
    rn = jnp.where(is_lit, rn, 0)

    sv, sn, sgran = _sym_emissions(data, sym_luts)
    sv = jnp.where(is_lit, sv, 0)
    sn = jnp.where(is_lit, sn, 0)

    # trailing run after the last literal (only when > 0 symbols remain)
    last_lit = run_max[:, -1] if l > 0 else jnp.full((n_rows,), -1, jnp.int32)
    trail = jnp.maximum(lengths - last_lit - 1, 0)
    has_trail = trail > 0
    tx = jnp.minimum(trail, 255)
    tpacked = run_luts[tx].astype(jnp.uint32)
    tb = tpacked >> jnp.uint32(6)
    tl = ((tpacked >> jnp.uint32(1)) & 31).astype(jnp.int32)
    tesc = (tpacked & 1).astype(jnp.bool_)
    tv = jnp.where(tesc, (tb << 16) | (trail.astype(jnp.uint32) & 0xFFFF), tb)
    tn = jnp.where(tesc, tl + 16, tl)
    tgran = jnp.where(tesc, 16, tl)
    tv = jnp.where(has_trail, tv, 0)
    tn = jnp.where(has_trail, tn, 0)

    # interleave: (N, 2L+1)
    v = jnp.concatenate(
        [jnp.stack([rv, sv], axis=2).reshape(n_rows, 2 * l), tv[:, None]], axis=1)
    n = jnp.concatenate(
        [jnp.stack([rn, sn], axis=2).reshape(n_rows, 2 * l), tn[:, None]], axis=1)
    t = n.sum(axis=1)

    # granular width of the final emission (for the tail-padding rule)
    lit_gran = jnp.where(is_lit, sgran, 0)
    idx = jnp.maximum(last_lit, 0)
    last_lit_gran = jnp.take_along_axis(lit_gran, idx[:, None], 1)[:, 0]
    last_gran = jnp.where(has_trail, tgran,
                          jnp.where(last_lit >= 0, last_lit_gran, 0))
    return v, n, t, last_gran


def compact_monotone(vals: tuple, keep):
    """Stable left-compaction of flagged elements via log2(M) shifts.

    Destinations are the ranks of the kept elements, so the displacement
    ``d = position - rank`` is monotone non-decreasing along the row; moving
    every element whose remaining displacement has bit b set by 2^b, LSB to
    MSB, routes all kept elements without collisions (overwrites only hit
    dropped slots).  ~10x cheaper than a sort on TPU.
    """
    n_rows, m = keep.shape
    ranks = jnp.cumsum(keep, axis=1) - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (n_rows, m), 1)
    d = jnp.where(keep, col - ranks, 0)
    bits = max(m - 1, 1).bit_length()
    for b in range(bits):
        step = 1 << b
        move_src = jnp.roll((d >> b) & 1, -step, axis=1) == 1
        zero_tail = jax.lax.broadcasted_iota(jnp.int32, (n_rows, m), 1) < m - step
        move_src = move_src & zero_tail
        vals = tuple(jnp.where(move_src, jnp.roll(x, -step, axis=1), x)
                     for x in vals)
        d = jnp.where(move_src, jnp.roll(d, -step, axis=1) - step, d)
    return vals


def pack_words(v, n):
    """Assemble emissions (N, M) into per-row u32 word rectangles (N, M+1).

    Bit offsets are row-local; each emission lands in at most two words
    (hi/lo 32-bit contributions, bit-disjoint so sum == or).  A naive
    per-emission scatter-add serializes on TPU, so instead:

    - per-slot word indices ``w = off >> 5`` are monotone and never skip
      (every emission is <= 32 bits), so contributions to one word are a
      contiguous slot range;
    - running sums over slots (u32, wraparound-safe) turn each word's value
      into a difference of two cumsum samples at word boundaries;
    - the boundary samples move to their word indexes by shift-network
      compaction (their destinations are their ranks); the lo contributions
      of word j+1 end at the same boundary slot, so one compaction carries
      both cumsum planes.
    """
    n_rows, m = v.shape
    off = _excl_cumsum(n, axis=1)
    w = off >> 5
    p = off & 31

    pn = p + n
    fits = pn <= 32
    hi = jnp.where(fits, v << jnp.clip(32 - pn, 0, 31).astype(jnp.uint32),
                   v >> jnp.clip(pn - 32, 0, 31).astype(jnp.uint32))
    lo = jnp.where(fits, jnp.uint32(0),
                   v << jnp.clip(64 - pn, 0, 31).astype(jnp.uint32))
    hi = jnp.where(n > 0, hi, 0)

    cs_hi = jnp.cumsum(hi.astype(jnp.uint32), axis=1)
    cs_lo = jnp.cumsum(lo.astype(jnp.uint32), axis=1)
    nxt = jnp.concatenate(
        [w[:, 1:], jnp.full((n_rows, 1), -1, w.dtype)], axis=1)
    last = w != nxt
    s_hi, s_lo = compact_monotone((cs_hi, cs_lo), last)

    key_max = jnp.max(jnp.where(n > 0, w, -1), axis=1, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_rows, m + 1), 1)
    z1 = jnp.zeros((n_rows, 1), jnp.uint32)

    # hi: word j = s_hi[j] - s_hi[j-1], valid for 0 <= j <= key_max
    # (pad one column: there are m slots but m+1 output words; the pad is
    # always masked since key_max <= m - 1 + ... bounded by real words)
    s_hi = jnp.concatenate([s_hi, z1], axis=1)
    hi_cum = s_hi[:, : m + 1]
    hi_prev = jnp.concatenate([z1, hi_cum[:, : m]], axis=1)
    hi_vals = jnp.where(idx <= key_max, hi_cum - hi_prev, 0)

    # lo: word j+1 = s_lo[j] - s_lo[j-1], valid for 1 <= j+1 <= key_max+1
    lo_cum = jnp.concatenate([z1, s_lo[:, : m]], axis=1)
    lo_prev = jnp.concatenate([z1, lo_cum[:, : m]], axis=1)
    lo_vals = jnp.where((idx >= 1) & (idx <= key_max + 1), lo_cum - lo_prev, 0)

    return hi_vals + lo_vals


def pack_words_any(v, n):
    """pack_words via the in-VMEM Pallas kernel on TPU (HBM sees one read
    of (v, n) and one write of words; the log-shift rounds stay in VMEM),
    falling back to the XLA formulation on CPU — and for monster slot
    widths, whose kernel tiles exceed the 16 MB scoped-vmem limit
    ((16, 57472) i32 = 16.14M on chip)."""
    if not pallas_ok() or v.shape[1] > 32768:
        return pack_words(v, n)
    from .pack_pallas import pack_words_pallas

    return pack_words_pallas(v.astype(jnp.int32), n)


def word_counts(t, last_gran):
    """(raw_words, out_words, dup, zero_ext) per row from totals.

    raw: ceil(T/32) — what pack_words fills;
    out: what the reference encoder writes (tail-padding rule).
    """
    olen = t & 31
    llen = (t - last_gran) & 31
    raw = (t + 31) >> 5
    dup = (olen > 0) & (llen > 16) & (olen > llen)
    zext = (olen == 0) & (llen > 16) & (t > 0)
    out = raw + dup.astype(t.dtype) + zext.astype(t.dtype)
    return raw, out, dup, zext


# ---------------------------------------------------------------------------
# host-side finishing: expand rows into the exact byte streams
# ---------------------------------------------------------------------------

def finalize_rows(words: np.ndarray, raw: np.ndarray, out: np.ndarray,
                  dup: np.ndarray, zext: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Gather each row's raw words into the padded output stream.

    Returns (flat u32 array of all rows concatenated, per-row word counts).
    A duplicated partial word repeats the final raw word; a zero-extension
    appends a zero word (gather index -1 -> 0 via a guard row).
    """
    n_rows, m1 = words.shape
    out = out.astype(np.int64)
    raw = raw.astype(np.int64)
    total = int(out.sum())
    if total == 0:
        return np.empty(0, np.uint32), out
    starts = np.zeros(n_rows, np.int64)
    np.cumsum(out[:-1], out=starts[1:])
    rel = np.arange(total, dtype=np.int64) - np.repeat(starts, out)
    row = np.repeat(np.arange(n_rows, dtype=np.int64), out)
    # within-row source index: rel, except the dup/zext extra word
    src = np.minimum(rel, np.repeat(raw, out) - 1)
    is_extra = rel >= np.repeat(raw, out)
    use_zero = np.repeat(zext, out) & is_extra
    flat = words[row, src]
    flat[use_zero] = 0
    return flat, out


def merge_region_rows(words: np.ndarray, base: np.ndarray,
                      t_bits: np.ndarray) -> np.ndarray:
    """Merge chunk-local word regions (ops/pack_local) into dense rows.

    words (N, M) i32: region q of each row in lanes [128q, 128q+128);
    base (N, C) i64/i32: each chunk's start bit offset; t_bits (N,) the
    row's total bits.  Region q covers stream words
    [base_q>>5, ceil(end_q/32)) with end_q the next chunk's base (the
    row total for the last live chunk); adjacent regions overlap by at
    most one straddle word with disjoint bit ranges, so the merge is
    OR.  NumPy fallback — the native path is dxt_region_merge."""
    n, m = words.shape
    c = m // 128
    t = np.asarray(t_bits, np.int64)
    base = np.asarray(base, np.int64)
    ends = np.concatenate([base[:, 1:], t[:, None]], axis=1)
    ends = np.maximum(ends, base)
    mw = int(((t + 31) >> 5).max(initial=0)) + 1
    merged = np.zeros((n, mw), np.int32)
    wu = words.astype(np.int32)
    for q in range(c):
        b0, b1 = base[:, q], ends[:, q]
        live = b1 > b0
        if not live.any():
            continue
        w0 = b0 >> 5
        nw = ((b1 + 31) >> 5) - w0
        mx = int(nw.max(initial=0))
        for j in range(mx):
            sel = live & (nw > j)
            merged[sel, w0[sel] + j] |= wu[sel, q * 128 + j]
    return merged


def finalize_rows_local(words: np.ndarray, bases: np.ndarray,
                        t_bits: np.ndarray, out: np.ndarray,
                        dup: np.ndarray, zext: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
    """finalize_rows for region-format word rows (ops/pack_local).

    Merges each row's chunk regions straight into its slot of the flat
    output (native dxt_region_merge; NumPy fallback), then applies the
    dup/zext tail rule."""
    n, m = words.shape
    t = np.asarray(t_bits, np.int64)
    raw = (t + 31) >> 5
    out = np.asarray(out, np.int64)
    if m // 128 != bases.shape[1]:
        # the region format carries at most 124 chunk bases (stats
        # lanes 2..125); emit_pallas routes wider tiles to the global
        # pack, so a mismatch here means corrupt inputs — refuse rather
        # than let the native merge index past the base array
        raise ValueError(
            f"region merge: {m // 128} chunks but {bases.shape[1]} bases")
    # the native merge zero-fills raw=(t+31)>>5 words into a dst slot
    # sized by out[i]: a corrupt device t (the miscompile threat class
    # the device-length validation defends against) must be refused
    # BEFORE the native call, not discovered as a heap overflow
    if bool((raw > out).any()) or bool((raw > m).any()):
        raise ValueError("region merge: raw word count exceeds the "
                         "row's output slot or region capacity")
    total = int(out.sum())
    if total == 0:
        return np.empty(0, np.uint32), out
    starts = np.zeros(n, np.int64)
    np.cumsum(out[:-1], out=starts[1:])
    flat = np.zeros(total, np.uint32)
    try:
        from ..native import qv_encode_shim
        import ctypes

        lib = qv_encode_shim()
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        wc = np.ascontiguousarray(words, np.int32)
        bc = np.ascontiguousarray(bases, np.int32)
        tc = np.ascontiguousarray(t)
        sc = np.ascontiguousarray(starts)
        lib.dxt_region_merge(ptr(wc), ptr(bc), ptr(tc), n, m,
                             ptr(flat), ptr(sc))
    except OSError:
        merged = merge_region_rows(words, bases, t)
        return finalize_rows(merged.view(np.uint32), raw, out, dup, zext)
    d = np.flatnonzero(np.asarray(dup) & (raw > 0))
    flat[starts[d] + raw[d]] = flat[starts[d] + raw[d] - 1]
    return flat, out


# ---------------------------------------------------------------------------
# fused device programs
# ---------------------------------------------------------------------------

def _lane_pad(data):
    l = data.shape[1]
    lp = (l + 127) // 128 * 128
    if lp != l:
        data = jnp.pad(data, ((0, 0), (0, lp - l)))
    return data


@jax.jit
def encode_plain_rows(data, lengths, luts):
    # width cap mirrors emit_pallas.fused_ok: the kernels' VMEM live set
    # scales with row width (a 65536-wide run batch demanded 48 MB of
    # scoped vmem on chip, 3x the 16 MB limit); monster rows take the
    # XLA emissions, which stage their planes in HBM
    if pallas_ok() and data.shape[1] <= 8192:
        from .emit_pallas import encode_plain_pallas

        words, t, lg, pst = encode_plain_pallas(
            _lane_pad(data)[None], lengths.astype(jnp.int32), luts[None])
        raw, out, dup, zext = word_counts(t[0], lg[0])
        return words[0], raw, out, dup, zext, pst[0], t[0]
    v, n, t, lg = plain_emissions(data, lengths, luts)
    words = pack_words_any(v, n)
    raw, out, dup, zext = word_counts(t, lg)
    return words, raw, out, dup, zext


@functools.partial(jax.jit, static_argnames=("max_tokens",))
def encode_run_rows(data, lengths, rchar, sym_luts, run_luts,
                    max_tokens: int | None = None):
    if pallas_ok() and data.shape[1] <= 8192:   # see encode_plain_rows
        from .emit_pallas import encode_run_pallas

        words, t, lg, pst = encode_run_pallas(
            _lane_pad(data)[None], lengths.astype(jnp.int32),
            sym_luts[None], run_luts[None], rchar.reshape(1),
            max_tokens=max_tokens)
        raw, out, dup, zext = word_counts(t[0], lg[0])
        return words[0], raw, out, dup, zext, pst[0], t[0]
    v, n, t, lg = run_emissions(data, lengths, rchar, sym_luts, run_luts)
    words = pack_words_any(v, n)
    raw, out, dup, zext = word_counts(t, lg)
    return words, raw, out, dup, zext


def run_token_bound(data, lengths, rchar: int) -> int:
    """Host-side static literal-count bound for the token-compacted run
    kernel: the max over rows of #(symbol != rchar) within the row's
    length, bucketed to 128 lanes (one program shape per bucket)."""
    d = np.asarray(data)
    ln = np.asarray(lengths).reshape(-1, 1)
    col = np.arange(d.shape[1])[None, :]
    cnt = int(((d != rchar) & (col < ln)).sum(axis=1).max(initial=0))
    return max(128, -(-cnt // 128) * 128)


def encode_rows_np(data, lengths, scheme: HScheme,
                   run_scheme: HScheme | None = None, rchar: int = -1,
                   device: bool = True):
    """Encode a rectangle of streams; returns (flat u32, words-per-row)."""
    luts = jnp.asarray(scheme_luts(scheme))
    d = jnp.asarray(data)
    ln = jnp.asarray(lengths.astype(np.int32))
    if run_scheme is None:
        parts = encode_plain_rows(d, ln, luts)
    else:
        rluts = jnp.asarray(scheme_luts(run_scheme, run=True))
        mt = (run_token_bound(data, lengths, int(rchar))
              if os.environ.get("DXT_RUN_TOKENS", "1") == "1" else None)
        parts = encode_run_rows(d, ln, jnp.int32(rchar), luts, rluts,
                                max_tokens=mt)
    if len(parts) == 7:
        words, raw, out, dup, zext, pst, t = (np.asarray(x) for x in parts)
        if pst[:, 126].any():               # region format (DXT_PACK_LOCAL)
            if pst[:, 127].any():
                # chunk overflow (needs a ~32-bit/slot average — not
                # reachable by real schemes): XLA global-pack fallback
                if run_scheme is None:
                    v, n, t2, lg2 = plain_emissions(d, ln, luts)
                else:
                    v, n, t2, lg2 = run_emissions(d, ln, jnp.int32(rchar),
                                                  luts, rluts)
                w2 = pack_words_any(v, n)
                raw, out, dup, zext = (np.asarray(x) for x in
                                       word_counts(t2, lg2))
                return finalize_rows(np.asarray(w2), raw, out, dup, zext)
            c = words.shape[1] // 128
            return finalize_rows_local(words.view(np.int32),
                                       pst[:, 2:2 + c], t, out, dup, zext)
        return finalize_rows(words, raw, out, dup, zext)
    words, raw, out, dup, zext = (np.asarray(x) for x in parts)
    return finalize_rows(words, raw, out, dup, zext)
