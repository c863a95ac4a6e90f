"""Pallas TPU kernel: in-VMEM bitstream word assembly (pack phase).

``bitstream_jax.pack_words`` expresses word assembly as cumsums plus a
boundary shift-compaction.  As XLA ops those log2(M) rounds each
round-trip the full (N, M) slot rectangle through HBM — ~50-100x traffic
amplification over the payload, which is why the pack phase dominated the
round-1 encode step (14.6 ms/channel of a 64 ms step).

This kernel runs the identical algorithm on a (B, M) row tile entirely in
VMEM: HBM sees one read of the emission planes (v, n) and one write of the
word rectangle; the ~36 log-shift rounds (3 cumsums + 1 compaction) touch
only VMEM.  Semantics match pack_words exactly (same tests cover both).

Reference semantics: the OCODE 32-bit shift-register emitter,
/root/reference/QV.c:404-422 — re-derived as data-parallel cumsums, not a
translation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vmem_lanes import cumsum_lanes as _cumsum_lanes
from .vmem_lanes import shl_fill as _shl_fill0
from .vmem_lanes import shr_fill as _shr_fill0

B = 8                      # rows per grid step


def _compact2(a, b_, d, keep):
    """Stable left-compaction of two planes by ``keep`` flags.

    Same shift network as bitstream_jax.compact_monotone, VMEM-resident.
    d = precomputed displacement (col - rank, 0 where dropped)."""
    m = a.shape[1]
    for bb in range(max(m - 1, 1).bit_length()):
        step = 1 << bb
        move = _shl_fill0((d >> bb) & 1, step) == 1
        a = jnp.where(move, _shl_fill0(a, step), a)
        b_ = jnp.where(move, _shl_fill0(b_, step), b_)
        d = jnp.where(move, _shl_fill0(d, step) - step, d)
    return a, b_


def _pack_kernel(v_ref, n_ref, out_ref):
    v = v_ref[:]                                   # (B, M) i32 bit patterns
    n = n_ref[:]                                   # (B, M) i32 widths 0..32
    m = v.shape[1]

    inc = _cumsum_lanes(n)
    off = inc - n                                  # exclusive cumsum
    w = off >> 5
    p = off & 31
    pn = p + n
    fits = pn <= 32
    sh_hi = jnp.clip(32 - pn, 0, 31).astype(jnp.uint32)
    sh_hi2 = jnp.clip(pn - 32, 0, 31).astype(jnp.uint32)
    sh_lo = jnp.clip(64 - pn, 0, 31).astype(jnp.uint32)
    vu = v.astype(jnp.uint32)
    hi = jnp.where(fits, vu << sh_hi, vu >> sh_hi2)
    lo = jnp.where(fits, jnp.uint32(0), vu << sh_lo)
    hi = jnp.where(n > 0, hi, jnp.uint32(0)).astype(jnp.int32)
    lo = lo.astype(jnp.int32)

    cs_hi = _cumsum_lanes(hi)
    cs_lo = _cumsum_lanes(lo)

    nxt = _shl_fill0(w, 1, fill=-1)
    last = w != nxt                                # word-boundary slots
    ranks = _cumsum_lanes(last.astype(jnp.int32)) - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], m), 1)
    d = jnp.where(last, col - ranks, 0)
    s_hi, s_lo = _compact2(cs_hi, cs_lo, d, last)

    key_max = jnp.max(jnp.where(n > 0, w, -1), axis=1, keepdims=True)

    # word j (0 <= j <= key_max):   s_hi[j] - s_hi[j-1]
    # word j (1 <= j <= key_max+1): s_lo[j-1] - s_lo[j-2]
    hi_prev = _shr_fill0(s_hi, 1)
    hi_vals = jnp.where(col <= key_max, s_hi - hi_prev, 0)
    lo_cum = _shr_fill0(s_lo, 1)
    lo_prev = _shr_fill0(s_lo, 2)
    lo_vals = jnp.where((col >= 1) & (col <= key_max + 1),
                        lo_cum - lo_prev, 0)
    out_ref[:] = hi_vals + lo_vals


def _round_up(x, mult):
    return (x + mult - 1) // mult * mult


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_words_pallas(v, n, interpret: bool = False):
    """Drop-in for bitstream_jax.pack_words: (N, M) emissions -> (N, M+1)
    u32 words.  M is padded to a lane multiple inside (zero-width emissions
    are inert), and the extra pad columns of the output are always zero."""
    n_rows, m = v.shape
    mp = _round_up(m + 1, 128)
    pad = mp - m
    v = jnp.pad(v.astype(jnp.uint32), ((0, 0), (0, pad))).astype(jnp.int32)
    n = jnp.pad(n, ((0, 0), (0, pad)))
    rpad = (-n_rows) % B
    if rpad:
        v = jnp.pad(v, ((0, rpad), (0, 0)))
        n = jnp.pad(n, ((0, rpad), (0, 0)))

    out = pl.pallas_call(
        _pack_kernel,
        grid=((n_rows + rpad) // B,),
        in_specs=[
            pl.BlockSpec((B, mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows + rpad, mp), jnp.int32),
        interpret=interpret,
    )(v, n)
    return out[:n_rows, : m + 1].astype(jnp.uint32)
