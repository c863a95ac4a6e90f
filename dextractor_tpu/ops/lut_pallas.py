"""Pallas TPU kernel: 256-entry LUT lookup as an in-VMEM one-hot matmul.

The XLA formulation of the MXU gather (ops/bitstream_jax._lut_gather)
materializes each chunk's one-hot matrix in HBM — a 256x traffic
amplification that dominates the encode step.  This kernel builds the
one-hot inside VMEM and contracts it on the MXU, so HBM sees only the
input bytes and the output words.

Exactness: the LUT (int32, < 2^24) is split into three byte planes, each
in [0, 255] and hence exact in bf16; every product is 0 or a plane value
and each output row sums exactly one product, accumulated in f32.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; one-hot scratch is (BLOCK, 256) bf16 = 256 KB VMEM
BLOCK = 512


def _kernel(data_ref, planes_ref, out_ref):
    d = data_ref[:].astype(jnp.int32)                      # (BLOCK, 1)
    sym = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 256), 1)
    oh = (d == sym).astype(jnp.bfloat16)                   # in VMEM only
    prod = jnp.dot(oh, planes_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = prod


@functools.partial(jax.jit, static_argnames=("interpret",))
def lut_gather_pallas(data, lut_i32, interpret: bool = False):
    """data (any shape, u8/i32) -> i32 LUT values, via the MXU in VMEM."""
    shape = data.shape
    total = int(np.prod(shape))
    pad = (-total) % BLOCK
    flat = data.reshape(-1).astype(jnp.int32)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    flat = flat.reshape(-1, 1)

    planes = jnp.stack([lut_i32 & 0xFF, (lut_i32 >> 8) & 0xFF,
                        (lut_i32 >> 16) & 0xFF], axis=1)
    planes = jnp.pad(planes, ((0, 0), (0, 125))).astype(jnp.bfloat16)

    n_blocks = flat.shape[0] // BLOCK
    out = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK, 128), jnp.float32),
        interpret=interpret,
    )(flat, planes)

    v = (out[:, 0].astype(jnp.int32)
         + (out[:, 1].astype(jnp.int32) << 8)
         + (out[:, 2].astype(jnp.int32) << 16))
    if pad:
        v = v[:total]
    return v.reshape(shape)
