"""Chunk-local word packing: the encode pack phase without the global
boundary compaction.

The global pack (emit_pallas._pack_slots) compacts word-boundary slots
to their global ranks — an 11-round shift network moving three planes,
plus four M-lane scans.  This formulation packs each 128-slot chunk into
its OWN 128-word output region at the chunk's global intra-word
alignment:

  * the only global scan is the bit-offset cumsum (inc);
  * hi/lo word-image sums, boundary ranks and the compaction are all
    CHUNK-LOCAL: the scans are single MXU dots with no cross-chunk
    combine, and the compaction displacement is < 128, so the network
    is 7 rounds entirely inside (R*C, 128) rows — no cross-chunk masks;
  * region q of a row holds the stream words [base_q>>5 ..] — adjacent
    regions overlap by at most one straddle word whose bit ranges are
    disjoint, so the host merge is a ragged OR-copy
    (bitstream_jax.finalize_rows_local / native dxt_region_merge).

Capacity: a region holds 128 words = 4096 bits; a chunk needs
p0 + sum(n) <= 4096 with p0 < 32 and every dexqv emission <= 32 bits,
so overflow needs a ~32-bit average over 128 consecutive slots — not
reachable by real schemes (codes <= 16 bits, escapes <= 32).  The kernel
still computes a per-row overflow flag (stats lane 127); the caller
falls back to the global pack for the batch if any row sets it.

Semantics target: identical final byte streams to _pack_slots +
finalize_rows (golden vs /root/reference/QV.c:386-443).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vmem_lanes import shl_fill as _shl_fill
from .vmem_lanes import shr_fill as _shr_fill
from .scan_mxu import _local_scan_dot


def _local_cumsum_u32(x, mode="bf16"):
    """Chunk-local inclusive cumsum of u32-as-i32 rows (R, 128), exact
    mod 2^32 (limb-split MXU dots, no cross-chunk combine)."""
    lb = 16 if mode == "f32" else 8
    nl = 32 // lb
    loc = None
    mask = (1 << lb) - 1
    for i in range(nl):
        limb = (x >> (i * lb)) & mask
        part = _local_scan_dot(limb, mode)
        part = (part << (i * lb)) if i else part
        loc = part if loc is None else loc + part
    return loc


def pack_slots_local(v, n, inc, *, mxu: bool = True):
    """Pack slot emissions into per-chunk word regions.

    v/n: (R, M) slot emission values/bit counts; inc: (R, M) GLOBAL
    inclusive bit-offset cumsum of n (the caller already computes it).
    Returns (words (R, M) i32 — region q of each row in lanes
    [128q, 128q+128) — and stats (R, 128) i32: lanes 2..2+C-1 hold each
    chunk's start bit offset, lane 127 the overflow flag)."""
    r, m = v.shape
    c = m // 128
    rc = r * c

    off = inc - n
    offr = off.reshape(rc, 128)
    nr = n.reshape(rc, 128)
    vr = v.reshape(rc, 128)

    base = offr[:, 0:1]                       # chunk start bit offset
    w = (offr >> 5) - (base >> 5)             # local word index
    p = offr & 31
    pn = p + nr
    fits = pn <= 32
    vu = vr.astype(jnp.uint32)
    hi = jnp.where(fits, vu << jnp.clip(32 - pn, 0, 31).astype(jnp.uint32),
                   vu >> jnp.clip(pn - 32, 0, 31).astype(jnp.uint32))
    lo = jnp.where(fits, jnp.uint32(0),
                   vu << jnp.clip(64 - pn, 0, 31).astype(jnp.uint32))
    hi = jnp.where(nr > 0, hi, jnp.uint32(0)).astype(jnp.int32)
    lo = lo.astype(jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (rc, 128), 1)
    if mxu:
        cs_hi = _local_cumsum_u32(hi)
        cs_lo = _local_cumsum_u32(lo)
        ranks = _local_scan_dot(jnp.where(w != _shl_fill(w, 1, fill=-1),
                                          1, 0), "bf16") - 1
    else:
        cs_hi, cs_lo = hi, lo
        for b in range(7):
            cs_hi = cs_hi + _shr_fill(cs_hi, 1 << b)
            cs_lo = cs_lo + _shr_fill(cs_lo, 1 << b)
        lastn = jnp.where(w != _shl_fill(w, 1, fill=-1), 1, 0)
        for b in range(7):
            lastn = lastn + _shr_fill(lastn, 1 << b)
        ranks = lastn - 1
    last = w != _shl_fill(w, 1, fill=-1)

    d = jnp.where(last, col - ranks, 0)
    a, b_ = cs_hi, cs_lo
    for bb in range(7):                       # displacement < 128
        step = 1 << bb
        move = _shl_fill((d >> bb) & 1, step) == 1
        a = jnp.where(move, _shl_fill(a, step), a)
        b_ = jnp.where(move, _shl_fill(b_, step), b_)
        d = jnp.where(move, _shl_fill(d, step) - step, d)

    key_max = jnp.max(jnp.where(nr > 0, w, -1), axis=1, keepdims=True)
    hi_vals = jnp.where(col <= key_max, a - _shr_fill(a, 1), 0)
    lo_vals = jnp.where((col >= 1) & (col <= key_max + 1),
                        _shr_fill(b_, 1) - _shr_fill(b_, 2), 0)
    words = (hi_vals + lo_vals).reshape(r, m)

    # stats: chunk start bit offsets at lanes 2..2+c-1; overflow at 127.
    # ovf: the chunk's bits must fit its region (p0 + totbits <= 4096).
    endb = offr[:, 127:128] + nr[:, 127:128]  # chunk end bit
    ovf = (endb - (base & ~jnp.int32(31))) > 4096
    row = jax.lax.broadcasted_iota(jnp.int32, (rc, 128), 0)
    qrow = row % c
    z = jnp.where(col == jnp.minimum(2 + qrow, 126),
                  jnp.broadcast_to(base, (rc, 128)), 0)
    z = jnp.where((col == 127) & ovf, 1, z)
    zr = z.reshape(r, m)
    stats = zr[:, 0:128]
    for q in range(1, c):
        stats = stats | zr[:, q * 128:(q + 1) * 128]
    return words, stats
