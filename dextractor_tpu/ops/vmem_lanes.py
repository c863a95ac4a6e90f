"""Shared VMEM-resident lane primitives for the Pallas kernels.

These are ordinary traced functions (no pallas_call of their own): lane
shifts built on ``pltpu.roll`` (which only accepts non-negative shifts —
a left shift by ``step`` is the circular roll by ``m - step``) and the
log-round scan networks built on them.  One definition keeps the
bit-exactness-critical shift semantics identical across the encode pack
(pack_pallas), the fused emit (emit_pallas) and any future kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def shr_fill(x, step, fill=0):
    """x shifted right by ``step`` along axis 1 (toward higher lanes)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= step, pltpu.roll(x, step, axis=1), fill)


def shl_fill(x, step, fill=0):
    """x shifted left by ``step`` along axis 1 (toward lower lanes)."""
    m = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < m - step, pltpu.roll(x, m - step, axis=1), fill)


def cumsum_lanes(x):
    """Inclusive cumsum along lanes; int32 wraparound semantics (exactly
    what the packers' mod-2^32 hi/lo word contributions need)."""
    for b in range(max(x.shape[1] - 1, 1).bit_length()):
        x = x + shr_fill(x, 1 << b)
    return x


def cummax_lanes(x, neg):
    """Inclusive cumulative max along lanes (``neg`` = identity)."""
    for b in range(max(x.shape[1] - 1, 1).bit_length()):
        x = jnp.maximum(x, shr_fill(x, 1 << b, fill=neg))
    return x
