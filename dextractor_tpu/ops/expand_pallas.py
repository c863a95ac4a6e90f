"""VMEM-resident run expansion: (runlen, literal) token pairs -> symbol rows.

Drop-in Pallas replacement for ``decode2.expand_runs2``'s XLA network
(reference semantics: Decode_Run's expansion loop, QV.c:604-691, done
batched).  The XLA formulation needs an ``optimization_barrier`` after
every roll round to dodge an XLA:TPU fusion miscompile (see
decode2.expand_monotone), which pins each round's (N, W) i32 plane to
HBM — ~2xW bytes of traffic per row per round.  Inside a Pallas kernel
the whole log-W shift network runs on an (8, W) VMEM tile: HBM sees the
token planes once and the symbol rows once.

The routing is the proven monotone MSB-first right-roll network (element
k at column k moves by disp[k] = cumsum(runs)[k]; see
expand_monotone's collision-freedom argument).  State packs value (8b) |
displacement (21b) | live (1b) into one i32 plane, so each round is one
roll + two selects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vmem_lanes import cumsum_lanes, shr_fill

B = 8                       # rows per grid step
_LIVE = 1 << 29


def _expand_kernel(runs_ref, lits_ref, out_ref, occ_ref, *, width: int):
    runs = runs_ref[...]
    lits = lits_ref[...]
    live = lits >= 0
    disp = cumsum_lanes(runs)                # matches expand_runs2 exactly
    disp = jnp.where(live, disp, 0)
    s = (lits & 0xFF) | (disp << 8) | jnp.where(live, _LIVE, 0)
    for b in reversed(range(max(width - 1, 1).bit_length())):
        step = 1 << b
        movers = (((s >> 29) & (s >> (8 + b))) & 1) == 1
        rolled = shr_fill(s, step)
        dst = (((rolled >> 29) & (rolled >> (8 + b))) & 1) == 1
        s = jnp.where(dst, rolled - (step << 8),
                      jnp.where(movers, s & ~jnp.int32(_LIVE), s))
    out_ref[...] = (s & 0xFF).astype(jnp.uint8)
    occ_ref[...] = ((s >> 29) & 1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def expand_runs_pallas(runs, lits, rchar, *, max_len: int,
                       interpret: bool = False):
    """expand_runs2 semantics: route literal k of each row to column
    cumsum(runs)[k] + k, fill ``rchar`` elsewhere, slice to max_len.
    Token rows are (N, T) i32 with lits < 0 marking exhausted tokens."""
    n, t = runs.shape
    width = max(int(max_len), t)
    width = ((width + 127) // 128) * 128
    rpad = (-n) % B
    if rpad:
        zr = jnp.zeros((rpad, t), runs.dtype)
        runs = jnp.concatenate([runs, zr])
        lits = jnp.concatenate([lits, jnp.full((rpad, t), -1, lits.dtype)])
    wpad = width - t
    if wpad:
        zw = jnp.zeros((runs.shape[0], wpad), runs.dtype)
        runs = jnp.concatenate([runs, zw], axis=1)
        lits = jnp.concatenate(
            [lits, jnp.full((lits.shape[0], wpad), -1, lits.dtype)], axis=1)
    grid = ((n + rpad) // B,)
    routed, occ = pl.pallas_call(
        functools.partial(_expand_kernel, width=width),
        grid=grid,
        in_specs=[pl.BlockSpec((B, width), lambda i: (i, 0)),
                  pl.BlockSpec((B, width), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((B, width), lambda i: (i, 0)),
                   pl.BlockSpec((B, width), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((n + rpad, width), jnp.uint8),
                   jax.ShapeDtypeStruct((n + rpad, width), jnp.uint8)],
        interpret=interpret,
    )(runs.astype(jnp.int32), lits.astype(jnp.int32))
    rows = jnp.where(occ == 1, routed,
                     jnp.asarray(rchar, jnp.int32).astype(jnp.uint8))
    return rows[:n, :max_len]
