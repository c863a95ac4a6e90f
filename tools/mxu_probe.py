"""MXU pack-scan probe: can the encode pack's cumsums ride the MXU?

Round-3 attribution left the 5.1 ms encode step ~80% word packing, which
is 4-5 roll-network lane cumsums + the boundary compaction per channel.
This probe answers, on the real chip:

  s1_dot_<mode>      in-kernel (32,128)x(128,128) dot lowers + is exact
                     for the limb ranges scan_mxu uses (f32/bf16/int8)
  s2_reshape         in-kernel (R, C*128) <-> (R*C, 128) retile lowers
  s3_cumsum_<mode>   full two-level u32 cumsum == numpy mod-2^32 cumsum
                     (both layouts)
  t_<variant>        per-iteration cost of each cumsum formulation vs
                     the vmem_lanes roll network, measured as the
                     difference of two in-kernel fori_loop depths (the
                     loop body re-masks through a data dependence so XLA
                     cannot hoist iterations)

One JSON line to stdout (prefix MXU:); --out FILE also writes a file.
Run on the chip: python tools/mxu_probe.py
CPU check: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/mxu_probe.py --interpret
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
    print(f"[mxu +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


R, M = 32, 2048          # the emit kernels' pack-plane tile shape


def main():
    interpret = "--interpret" in sys.argv
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from dextractor_tpu.ops import scan_mxu
    from dextractor_tpu.ops.vmem_lanes import cumsum_lanes

    log(f"platform={jax.devices()[0].platform} interpret={interpret}")
    results = {}
    rng = np.random.default_rng(7)

    def run_kernel(body, *arrays, out_shape):
        def kern(*refs):
            ins, out = refs[:-1], refs[-1]
            out[:] = body(*[r[:] for r in ins])
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrays),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(*[jnp.asarray(a) for a in arrays])

    def try_probe(name, fn):
        t = time.perf_counter()
        for attempt in range(3):
            try:
                ok = fn()
                results[name] = bool(ok) if isinstance(ok, (bool, np.bool_)) \
                    else ok
                log(f"{name}: {results[name]} "
                    f"({time.perf_counter() - t:.1f}s)")
                return
            except Exception as e:  # noqa: BLE001
                msg = f"{type(e).__name__}: {str(e)[:200]}"
                if attempt < 2 and ("500" in msg or "INTERNAL" in msg
                                    or "UNAVAILABLE" in msg):
                    log(f"{name}: transient {msg}; retry in 20s")
                    time.sleep(20)
                    continue
                results[name] = f"FAIL: {msg}"
                log(f"{name}: FAIL {msg}")
                return

    # ---- s1: in-kernel dot exactness per mode ---------------------------
    def dot_probe(mode):
        lb = 16 if mode == "f32" else 8
        x = rng.integers(0, 1 << lb, (R, 128)).astype(np.int32)

        def body(xr):
            return scan_mxu._local_scan_dot(xr, mode)

        out = run_kernel(body, x,
                         out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32))
        return np.array_equal(np.asarray(out), np.cumsum(x, axis=1))

    for mode in ("f32", "bf16", "int8"):
        try_probe(f"s1_dot_{mode}", functools.partial(dot_probe, mode))

    # ---- s2: in-kernel retile ------------------------------------------
    def reshape_probe():
        x = rng.integers(-(1 << 30), 1 << 30, (R, M)).astype(np.int32)

        def body(xr):
            y = xr.reshape(R * (M // 128), 128)
            y = y + jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
            return y.reshape(R, M)

        out = run_kernel(body, x,
                         out_shape=jax.ShapeDtypeStruct((R, M), jnp.int32))
        y = x.reshape(R * (M // 128), 128) + np.arange(
            R * (M // 128), dtype=np.int32)[:, None]
        return np.array_equal(np.asarray(out), y.reshape(R, M))

    try_probe("s2_reshape", reshape_probe)

    # ---- s3: full two-level u32 cumsum exactness ------------------------
    def cumsum_probe(mode, via_reshape):
        x = rng.integers(0, 1 << 32, (R, M)).astype(np.uint32)
        exp = np.cumsum(x.astype(np.uint64), axis=1).astype(np.uint32)

        def body(xr):
            return scan_mxu.cumsum_lanes_mxu(
                xr, nbits=32, mode=mode, via_reshape=via_reshape)

        out = run_kernel(body, x.view(np.int32),
                         out_shape=jax.ShapeDtypeStruct((R, M), jnp.int32))
        return np.array_equal(np.asarray(out).view(np.uint32), exp)

    for mode in ("f32", "bf16", "int8"):
        for vr in (True, False):
            try_probe(f"s3_cumsum_{mode}_{'rs' if vr else 'chunk'}",
                      functools.partial(cumsum_probe, mode, vr))

    # ---- t: per-iteration cost -----------------------------------------
    # In-kernel fori_loop chains K iterations; the body's output feeds the
    # next input through a mask (data dependence).  Cost per iteration =
    # (t(K2) - t(K1)) / (K2 - K1) over `grid` tiles.
    N_TILES = 2 if interpret else 64
    K1, K2 = (1, 3) if interpret else (4, 36)

    def timed_variant(fn, nbits):
        def make(k):
            def kern(x_ref, out_ref):
                def step(_, v):
                    y = fn(v)
                    return (y >> 2) & ((1 << nbits) - 1)
                out_ref[:] = jax.lax.fori_loop(0, k, step, x_ref[:])
            return pl.pallas_call(
                kern,
                grid=(N_TILES,),
                in_specs=[pl.BlockSpec((R, M), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((R, M), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N_TILES * R, M), jnp.int32),
                interpret=interpret,
            )
        x = jnp.asarray(rng.integers(
            0, 1 << nbits, (N_TILES * R, M)).astype(np.int32))

        def chain(prog, reps):
            v = x
            for _ in range(reps):
                v = prog(v)
            return float(jnp.sum(v[0, :1]))

        f1, f2 = jax.jit(make(K1)), jax.jit(make(K2))
        chain(f1, 1), chain(f2, 1)                      # compile+warm
        reps = 2 if interpret else 6
        t = time.perf_counter(); chain(f1, reps); t1 = time.perf_counter() - t
        t = time.perf_counter(); chain(f2, reps); t2 = time.perf_counter() - t
        per_iter = (t2 - t1) / reps / (K2 - K1)
        return round(per_iter * 1e6, 1)                 # us per iteration

    variants = {
        "t_rollnet_u32": (lambda v: cumsum_lanes(v), 30),
        "t_mxu_bf16_rs_u32": (lambda v: scan_mxu.cumsum_lanes_mxu(
            v, nbits=30, mode="bf16", via_reshape=True), 30),
        "t_mxu_int8_rs_u32": (lambda v: scan_mxu.cumsum_lanes_mxu(
            v, nbits=30, mode="int8", via_reshape=True), 30),
        "t_mxu_f32_rs_u32": (lambda v: scan_mxu.cumsum_lanes_mxu(
            v, nbits=30, mode="f32", via_reshape=True), 30),
        "t_mxu_bf16_chunk_u32": (lambda v: scan_mxu.cumsum_lanes_mxu(
            v, nbits=30, mode="bf16", via_reshape=False), 30),
        "t_mxu_bf16_rs_small": (lambda v: scan_mxu.cumsum_lanes_mxu(
            v, nbits=6, mode="bf16", via_reshape=True), 6),
        "t_rollnet_small": (lambda v: cumsum_lanes(v), 6),
    }
    for name, (fn, nbits) in variants.items():
        # skip timing variants whose exactness probe failed
        mode = name.split("_")[2] if name.startswith("t_mxu") else None
        if mode and results.get(f"s1_dot_{mode}") is not True:
            results[name] = "skipped (s1 failed)"
            continue
        try_probe(name, functools.partial(timed_variant, fn, nbits))

    line = json.dumps({"probe": "mxu", "interpret": interpret,
                       "results": results})
    print("MXU: " + line, flush=True)
    if out_path:
        Path(out_path).write_text(line + "\n")
    bad = [k for k, v in results.items()
           if isinstance(v, str) and v.startswith("FAIL")]
    log(f"done; failures: {bad or 'none'}")


if __name__ == "__main__":
    main()
