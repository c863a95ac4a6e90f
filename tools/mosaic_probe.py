"""Mosaic capability probe for the G-generalized conveyor (long reads).

The 1024-chain conveyor keeps each chain's whole stream in VMEM, which
caps streams at 2048 words (8 MB scratch).  Longer streams need fewer
chains per grid step: G in {4, 2, 1} sublane groups instead of 8.  That
shrinks the hot tiles from (8, 128) to (G, 128) — and this probe checks,
on the real chip, which of the ops the kernel needs still lower at those
shapes:

  p1_gather_G:   dynamic lane-gather (take_along_axis) on (G, 128)
  p2_roll_G:     pltpu.roll on (K*G, 128) by non-multiple-of-8 rows
  p3_slice_G:    unaligned sublane slice of a VMEM scratch ref
  p4_selsum_G:   masked select+tree-sum window extraction on (G, 128)

Each probe compares against numpy on tiny shapes.  One JSON line to
stdout (prefix MOSAIC:).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np

T0 = time.perf_counter()


def log(msg):
    print(f"[mosaic +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    log(f"platform={jax.devices()[0].platform}")
    results = {}
    rng = np.random.default_rng(0)

    def try_probe(name, fn):
        try:
            ok = bool(fn())
            results[name] = ok
            log(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
        except Exception as e:
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            log(f"{name}: FAIL {str(e)[:200]}")

    # ---- p1: lane gather at (G, 128) -----------------------------------
    def gather_probe(g):
        tbl = rng.integers(0, 1000, (1, 128)).astype(np.int32)
        idx = rng.integers(0, 128, (g, 128)).astype(np.int32)

        def kern(tbl_ref, idx_ref, out_ref):
            t = jnp.broadcast_to(tbl_ref[:], (g, 128))
            out_ref[:] = jnp.take_along_axis(t, idx_ref[:], axis=1)

        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 128), jnp.int32),
        )(jnp.asarray(tbl), jnp.asarray(idx))
        return np.array_equal(np.asarray(out),
                              np.broadcast_to(tbl, (g, 128))[
                                  np.arange(g)[:, None], idx])

    # ---- p2: roll by G rows on (K*G, 128) ------------------------------
    def roll_probe(g):
        k = 16
        x = rng.integers(0, 1 << 20, (k * g, 128)).astype(np.int32)
        shift = k * g - g            # advance by one word: roll up by G

        def kern(x_ref, out_ref):
            out_ref[:] = pltpu.roll(x_ref[:], shift, axis=0)

        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k * g, 128), jnp.int32),
        )(jnp.asarray(x))
        return np.array_equal(np.asarray(out), np.roll(x, shift, axis=0))

    # ---- p3: unaligned sublane slice of computed value ------------------
    def slice_probe(g):
        k = 8
        x = rng.integers(0, 1 << 20, (k * g, 128)).astype(np.int32)

        def kern(x_ref, out_ref):
            v = x_ref[:] + 1                     # computed value
            acc = jnp.zeros((g, 128), jnp.int32)
            for c in range(k):
                acc = acc + v[c * g:(c + 1) * g] * (c + 1)
            out_ref[:] = acc

        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 128), jnp.int32),
        )(jnp.asarray(x))
        exp = sum((x + 1)[c * g:(c + 1) * g] * (c + 1) for c in range(k))
        return np.array_equal(np.asarray(out), exp)

    # ---- p4: select + tree-sum window on (G, 128) -----------------------
    def selsum_probe(g):
        k = 12
        x = rng.integers(0, 1 << 20, (k * g, 128)).astype(np.int32)
        wpos = rng.integers(0, k, (g, 128)).astype(np.int32)

        def kern(x_ref, w_ref, out_ref):
            v = x_ref[:]
            w = w_ref[:]
            terms = [jnp.where(w == c, v[c * g:(c + 1) * g], 0)
                     for c in range(k)]
            while len(terms) > 1:
                nxt = [terms[i] + terms[i + 1]
                       for i in range(0, len(terms) - 1, 2)]
                if len(terms) & 1:
                    nxt.append(terms[-1])
                terms = nxt
            out_ref[:] = terms[0]

        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 128), jnp.int32),
        )(jnp.asarray(x), jnp.asarray(wpos))
        exp = np.zeros((g, 128), np.int32)
        for c in range(k):
            exp = np.where(wpos == c, x[c * g:(c + 1) * g], exp)
        return np.array_equal(np.asarray(out), exp)

    # warm the tunnel with a trivial transfer first
    import jax.numpy as jnp
    np.asarray(jnp.zeros((8, 128)))
    log("tunnel warm")

    for g in (1, 2, 4):
        try_probe(f"p1_gather_{g}", functools.partial(gather_probe, g))
    for g in (1, 2, 4):
        try_probe(f"p2_roll_{g}", functools.partial(roll_probe, g))
    for g in (1, 2, 4):
        try_probe(f"p3_slice_{g}", functools.partial(slice_probe, g))
    for g in (1, 2, 4):
        try_probe(f"p4_selsum_{g}", functools.partial(selsum_probe, g))

    print("MOSAIC: " + json.dumps(results), flush=True)


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def extra_probes():
    """p5/p6: the g=1 wide-lane advance building blocks — ref-loaded
    (1, L) sublane-broadcast and the O(1)-trace conditional roll."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    rng = np.random.default_rng(1)
    results = {}

    def try_probe(name, fn):
        try:
            ok = bool(fn())
            results[name] = ok
            log(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
        except Exception as e:
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            log(f"{name}: FAIL {str(e)[:200]}")

    def bcast_probe(lanes):
        x = rng.integers(0, 1000, (1, lanes)).astype(np.int32)
        k = 64

        def kern(x_ref, out_ref, scr_ref):
            scr_ref[:] = x_ref[:] * 3 + 1          # computed, stored
            out_ref[:] = jnp.broadcast_to(scr_ref[:], (k, lanes))

        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, lanes), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, lanes), jnp.int32)],
        )(jnp.asarray(x))
        return np.array_equal(np.asarray(out),
                              np.broadcast_to(x * 3 + 1, (k, lanes)))

    def advance_probe(lanes):
        k = 128
        conv = rng.integers(0, 1 << 20, (k, lanes)).astype(np.int32)
        delta = rng.integers(0, 16, (1, lanes)).astype(np.int32)

        def kern(c_ref, d_ref, out_ref, scr_ref):
            scr_ref[:] = d_ref[:] + 0
            d = jnp.broadcast_to(scr_ref[:], (k, lanes))
            conv = c_ref[:]
            for b in range(4):
                step = 1 << b
                rolled = pltpu.roll(conv, k - step, axis=0)
                conv = jnp.where(((d >> b) & 1) == 1, rolled, conv)
            out_ref[:] = conv

        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, lanes), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, lanes), jnp.int32)],
        )(jnp.asarray(conv), jnp.asarray(delta))
        exp = conv.copy()
        for l in range(lanes):
            exp[:, l] = np.roll(conv[:, l], -int(delta[0, l]))
        return np.array_equal(np.asarray(out), exp)

    for lanes in (128, 256):
        try_probe(f"p5_bcast_{lanes}", lambda L=lanes: bcast_probe(L))
    for lanes in (128, 256):
        try_probe(f"p6_advance_{lanes}", lambda L=lanes: advance_probe(L))
    print("MOSAIC2: " + json.dumps(results), flush=True)


if __name__ == "__main__" and "--extra" in sys.argv:
    extra_probes()
