"""Pallas TPU kernel: 256-entry LUT lookup as an in-VMEM weighted reduce.

The XLA formulations either gather per element (~16 cycles each) or
materialize one-hot matrices in HBM (256x traffic).  This kernel keeps the
expansion entirely in VMEM: for a (R, 128) tile of symbols it evaluates

    out[r, l] = sum_s  (d[r, l] == s) ? lut[s] : 0

as a lane-resident select + reduction over a broadcast 256-wide axis.
Exactness: LUT values < 2^24 are exact in f32 and each output sums exactly
one non-zero term.  HBM sees only the input bytes and the i32 outputs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16                      # rows per sub-tile; VMEM temp (R, 128, 256) f32 = 2 MB
SUB = 8                     # sub-tiles per grid step (amortizes grid overhead)
LANES = 128

RG = 128                    # rows per grid step for the lane-gather kernel


def _lane_kernel(data_ref, lut_ref, out_ref):
    """Hardware dynamic-gather formulation: the 256-entry table is split
    into two 128-lane rows; each element gathers its lane (idx & 127) from
    the broadcast table and a select on bit 7 picks the half.  Measured
    ~34x faster than the select+reduce kernel on v5e (0.10 ms vs 3.44 ms
    for a 4.2M-element tile)."""
    d = data_ref[:]
    lob = jnp.broadcast_to(lut_ref[0:1, :], (RG, 128))
    hib = jnp.broadcast_to(lut_ref[1:2, :], (RG, 128))
    idx = d & 127
    glo = jnp.take_along_axis(lob, idx, axis=1)
    ghi = jnp.take_along_axis(hib, idx, axis=1)
    out_ref[:] = jnp.where(d < 128, glo, ghi)


def _kernel(data_ref, lut_ref, out_ref):
    lut = lut_ref[:].astype(jnp.float32)                    # (1, 256)
    sym = jax.lax.broadcasted_iota(jnp.int32, (R, LANES, 256), 2)
    for t in range(SUB):
        d = data_ref[t * R:(t + 1) * R, :].astype(jnp.int32)
        sel = jnp.where(d[:, :, None] == sym, lut[0][None, None, :], 0.0)
        out_ref[t * R:(t + 1) * R, :] = jnp.sum(sel, axis=2).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lut_gather_lane(data, lut_i32, interpret: bool = False):
    """data (any shape, u8/i32) -> i32 LUT values via dynamic lane gather."""
    shape = data.shape
    total = int(np.prod(shape))
    tile = RG * LANES
    pad = (-total) % tile
    flat = data.reshape(-1).astype(jnp.int32)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    rows = flat.reshape(-1, LANES)
    out = pl.pallas_call(
        _lane_kernel,
        grid=(rows.shape[0] // RG,),
        in_specs=[
            pl.BlockSpec((RG, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RG, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(rows.shape, jnp.int32),
        interpret=interpret,
    )(rows, lut_i32.reshape(2, 128))
    v = out.reshape(-1)
    if pad:
        v = v[:total]
    return v.reshape(shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lut_gather_pallas(data, lut_i32, interpret: bool = False):
    """data (any shape, u8/i32) -> i32 LUT values (values < 2^24)."""
    shape = data.shape
    total = int(np.prod(shape))
    tile = R * SUB * LANES
    pad = (-total) % tile
    flat = data.reshape(-1).astype(jnp.int32)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    rows = flat.reshape(-1, LANES)
    lut2 = lut_i32.reshape(1, 256)

    n_blocks = rows.shape[0] // (R * SUB)
    out = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R * SUB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R * SUB, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(rows.shape, jnp.int32),
        interpret=interpret,
    )(rows, lut2)

    v = out.reshape(-1)
    if pad:
        v = v[:total]
    return v.reshape(shape)
