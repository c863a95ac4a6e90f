"""Pallas TPU kernel: delTag unpack + route by kept-rank.

The decode tag reconstruction (Unpack_Tag, QV.c:824-847) places the r-th
packed 2-bit tag symbol at the r-th kept position (delQV != delChar) and
'n' elsewhere.  The XLA formulation routes symbols through two monotone
shift networks (compact + expand, ~24 rolled (N, max_len) planes with
per-round fusion barriers — 4.5 ms of a 9 ms 16 MB decode step).  This
kernel inverts the data flow into a *gather*: for each output position,
fetch packed word ``rank >> 4`` from the entry's own tag words with the
hardware dynamic lane-gather (row-local indices, 8 rows per VREG) and
shift the 2-bit code out — one pass, no routing.

Inputs are pre-fused host/XLA-side into one i32 plane per position:
``state = rank << 2 | kept << 1 | in_read`` (rank = kept-rank cumsum,
valid where kept).  21-bit rank supports reads up to 2M symbols.

Cited behavior: QV.c:810-847 (Pack_Tag/Unpack_Tag), undexqv.c:142-159
(tag channel of the five-stream entry decode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 64                    # entries per grid step (8 sublane chunks)


def _kernel_factory(tbw: int, n_cols: int):
    """tbw: tag words per entry (u32); n_cols: max_len // 128."""
    n_slices = (tbw + 127) // 128

    def kernel(words_ref, state_ref, out_ref):
        for q in range(ROWS // 8):
            rows = slice(q * 8, q * 8 + 8)
            w = words_ref[rows, :]
            cols = []
            for c in range(n_cols):
                st = state_ref[rows, c * 128:(c + 1) * 128]
                rank = st >> 2
                widx = rank >> 4                  # 16 symbols per u32 word
                g = jnp.zeros((8, 128), jnp.int32)
                for s in range(n_slices):
                    sl = w[:, s * 128:(s + 1) * 128].astype(jnp.int32)
                    v = jnp.take_along_axis(sl, widx & 127, axis=1)
                    g = jnp.where((widx >> 7) == s, v, g)
                # byte within word (little-endian), then 2-bit code
                # (first symbol in bits 7-6, DB.c:334)
                byte = (g >> ((rank >> 2) & 3) * 8) & 0xFF
                code = (byte >> (6 - 2 * (rank & 3))) & 3
                letter = jnp.where(
                    code == 0, 97, jnp.where(code == 1, 99,
                                             jnp.where(code == 2, 103, 116)))
                out = jnp.where((st & 2) == 2, letter,
                                jnp.where((st & 1) == 1, 110, 0))
                cols.append(out)
            out_ref[rows, :] = jnp.concatenate(cols, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def tag_route_rows(tag_words, state, *, max_len: int,
                   interpret: bool = False):
    """(N, TBW) u32 tag words + (N, max_len) i32 state -> (N, max_len) u8.

    state = rank << 2 | kept << 1 | in_read; output is 'a/c/g/t' at kept
    positions, 'n' at in-read holes, 0 beyond the read.
    """
    n, tbw = tag_words.shape
    npad = (n + ROWS - 1) // ROWS * ROWS
    if npad != n:
        tag_words = jnp.pad(tag_words, ((0, npad - n), (0, 0)))
        state = jnp.pad(state, ((0, npad - n), (0, 0)))
    tbw_p = (tbw + 127) // 128 * 128
    if tbw_p != tbw:
        tag_words = jnp.pad(tag_words, ((0, 0), (0, tbw_p - tbw)))
    kern = _kernel_factory(tbw_p, max_len // 128)
    out = pl.pallas_call(
        kern,
        grid=(npad // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, tbw_p), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, max_len), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, max_len), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, max_len), jnp.int32),
        interpret=interpret,
    )(tag_words, state)
    return out[:n].astype(jnp.uint8)
