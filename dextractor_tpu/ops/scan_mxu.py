"""MXU-backed lane cumsums for the encode pack phase.

The pack phase (ops/emit_pallas._pack_slots) is ~80% of the encode step
and is dominated by log-depth roll-network cumsums over the slot planes
(11 rounds of roll+select+add per plane at 2048 lanes).  A cumsum is a
triangular matmul, so the local 128-lane scans can ride the MXU instead:

  y[:, q*128 + l] = (x_chunk_q @ U)[:, l] + sum of chunk totals < q

with U the (128, 128) upper-triangular ones matrix.  Exactness is the
contract (the pack's hi/lo word-image sums need exact mod-2^32): the
local scans run on small limbs whose 128-term chunk sums are exact in
the accumulator, and all cross-chunk combining is i32 adds (natural
wraparound).  Limb widths per MXU mode:

  f32  : 16-bit limbs (chunk sums <= 128*65535 < 2^24, f32-exact;
         needs precision=HIGHEST or the TPU truncates inputs to bf16)
  bf16 : 8-bit limbs (0..255 exact in bf16; f32 accumulate)
  int8 : 8-bit limbs biased by -128 into int8 range, integer MACs,
         bias removed with a static iota correction

These run *inside* Pallas kernels (plain traced functions, like
vmem_lanes).  Two data layouts, selected by ``via_reshape``: a single
(R*C, 128) dot after an in-kernel reshape (best MXU utilisation, needs
Mosaic to lower the (R, C*128)<->(R*C, 128) retile), or a per-chunk loop
of (R, 128) dots with sequential chunk-offset accumulation (no reshape).
tools/mxu_probe.py validates both on hardware and times them against
vmem_lanes.cumsum_lanes.

Semantics target: ops/vmem_lanes.cumsum_lanes (inclusive, i32
wraparound), itself golden-tested against the C encoder's bit packing
(/root/reference/QV.c:386-443).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _tri_u(dtype):
    """(128, 128) upper-triangular ones (inclusive-scan matrix)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (r <= c).astype(dtype)


def _local_scan_dot(xr, mode):
    """Chunk-local inclusive scan of non-negative limb rows (R, 128).

    Exact provided limb values fit the mode's width (16b f32 / 8b
    bf16,int8); returns i32.
    """
    if mode == "f32":
        u = _tri_u(jnp.float32)
        y = jax.lax.dot_general(
            xr.astype(jnp.float32), u, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return y.astype(jnp.int32)
    if mode == "bf16":
        u = _tri_u(jnp.bfloat16)
        y = jax.lax.dot_general(
            xr.astype(jnp.bfloat16), u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.int32)
    if mode == "int8":
        u = _tri_u(jnp.int8)
        xb = (xr - 128).astype(jnp.int8)
        y = jax.lax.dot_general(
            xb, u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        return y + 128 * (col + 1)
    raise ValueError(f"unknown MXU scan mode {mode!r}")


def _limb_plan(nbits, mode):
    lb = 16 if mode == "f32" else 8
    nl = max(1, -(-nbits // lb))
    return lb, nl


def cumsum_lanes_mxu(x, nbits=32, mode="bf16", via_reshape=True):
    """Inclusive lane cumsum of i32 ``x``, exact mod 2^32, via MXU.

    nbits: how many low bits of x may be non-zero (32 = full u32 bit
    pattern carried in i32).  Width must be a multiple of 128.
    """
    r, m = x.shape
    assert m % 128 == 0, "width must be lane-aligned"
    c = m // 128
    lb, nl = _limb_plan(nbits, mode)
    mask = (1 << lb) - 1

    if via_reshape:
        xr = x.reshape(r * c, 128)
        loc = None
        for i in range(nl):
            limb = (xr >> (i * lb)) & mask if (i or nl > 1) else xr
            part = _local_scan_dot(limb, mode)
            part = (part << (i * lb)) if i else part
            loc = part if loc is None else loc + part
        if c > 1:
            # chunk-exclusive offsets: scan chunk totals across the c
            # consecutive rows of each row-group (sublane rolls)
            tot = jnp.broadcast_to(loc[:, 127:128], (r * c, 128))
            row = jax.lax.broadcasted_iota(jnp.int32, (r * c, 128), 0)
            qrow = row % c
            s = tot
            for b in range(max(c - 1, 1).bit_length()):
                step = 1 << b
                s = s + jnp.where(qrow >= step,
                                  pltpu.roll(s, step, axis=0), 0)
            loc = loc + (s - tot)
        return loc.reshape(r, m)

    # no-reshape fallback: per-chunk dots + sequential offset accumulation
    outs = []
    off = None
    for q in range(c):
        ch = x[:, q * 128:(q + 1) * 128]
        loc = None
        for i in range(nl):
            limb = (ch >> (i * lb)) & mask if (i or nl > 1) else ch
            part = _local_scan_dot(limb, mode)
            part = (part << (i * lb)) if i else part
            loc = part if loc is None else loc + part
        if off is not None:
            loc = loc + off
        outs.append(loc)
        off = loc[:, 127:128]
    return jnp.concatenate(outs, axis=1)
