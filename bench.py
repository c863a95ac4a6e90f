"""Benchmark driver: one JSON line on stdout.

Measures the flagship .dexqv encode end-to-end (quiva bytes -> container
bytes) on the available accelerator, against the reference C encoder on the
same data on this host (vs_baseline = our GB/s / C GB/s).  The reference
publishes no throughput numbers (BASELINE.md), so the compiled C tool *is*
the baseline.

Usage: python bench.py [--mb N] [--metric dexqv|dexta]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def build_ref_tools() -> Path | None:
    ref = Path("/root/reference")
    if not ref.is_dir():
        return None
    build = Path("/tmp/dxt_bench_ref")
    build.mkdir(exist_ok=True)
    for src in ref.glob("*.[ch]"):
        (build / src.name).write_bytes(src.read_bytes())
    for tool in ("dexta", "dexqv"):
        exe = build / tool
        if not exe.exists():
            r = subprocess.run(
                ["gcc", "-O3", "-fno-strict-aliasing", "-o", str(exe),
                 f"{tool}.c", "DB.c", "QV.c", "-lm"],
                cwd=build, capture_output=True)
            if r.returncode != 0:
                return None
    return build


def time_c_tool(build: Path, tool: str, path: Path) -> float:
    # the C tools delete their input without -k; use -k and remove output
    t0 = time.perf_counter()
    r = subprocess.run([str(build / tool), "-k", str(path)],
                       capture_output=True)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        return float("nan")
    return dt


def main() -> None:
    mb = 48
    metric = "dexqv"
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--mb":
            mb = int(args[i + 1])
        if a == "--metric":
            metric = args[i + 1]

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    platform = jax.devices()[0].platform

    from conftest import make_quiva, make_fasta

    rng = np.random.default_rng(0)
    workdir = Path("/tmp/dxt_bench")
    workdir.mkdir(exist_ok=True)

    if metric == "dexqv":
        # ~mb MB of stream chars: 5 streams x n x len
        read_len = 2000
        n_reads = max(8, (mb * 1_000_000) // (5 * read_len))
        data = make_quiva(rng, n_reads=n_reads, min_len=read_len - 50,
                          max_len=read_len + 50)
        src = workdir / "g.quiva"
        src.write_bytes(data)

        from dextractor_tpu.codecs.qv_codec import encode_quiva_to_dexqv

        # warmup: compiles + first device->host transfer
        print(f"[bench] platform={platform} warming up ...", file=sys.stderr, flush=True)
        tw = time.perf_counter()
        warm = make_quiva(np.random.default_rng(1), n_reads=n_reads,
                          min_len=read_len - 50, max_len=read_len + 50)
        encode_quiva_to_dexqv(warm)
        print(f"[bench] warmup {time.perf_counter()-tw:.1f}s", file=sys.stderr, flush=True)

        t0 = time.perf_counter()
        out = encode_quiva_to_dexqv(data)
        dt = time.perf_counter() - t0
        nbytes = len(data)

        build = build_ref_tools()
        base_dt = time_c_tool(build, "dexqv", src) if build else float("nan")
        name = "dexqv_encode_throughput"
    else:
        n_reads = max(8, (mb * 1_000_000) // 2000)
        data = make_fasta(rng, n_reads=n_reads, min_len=1900, max_len=2100)
        src = workdir / "g.fasta"
        src.write_bytes(data)

        from dextractor_tpu.codecs import encode_fasta_to_dexta

        warm = make_fasta(np.random.default_rng(1), n_reads=n_reads,
                          min_len=1900, max_len=2100)
        encode_fasta_to_dexta(warm)

        t0 = time.perf_counter()
        out = encode_fasta_to_dexta(data)
        dt = time.perf_counter() - t0
        nbytes = len(data)

        build = build_ref_tools()
        base_dt = time_c_tool(build, "dexta", src) if build else float("nan")
        name = "dexta_encode_throughput"

    gbps = nbytes / dt / 1e9
    base_gbps = nbytes / base_dt / 1e9 if base_dt == base_dt else None
    vs = (gbps / base_gbps) if base_gbps else None
    print(json.dumps({
        "metric": name,
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "detail": {
            "platform": platform,
            "input_MB": round(nbytes / 1e6, 1),
            "ours_s": round(dt, 3),
            "c_ref_s": round(base_dt, 3) if base_dt == base_dt else None,
            "c_ref_GBps": round(base_gbps, 4) if base_gbps else None,
            "compressed_ratio": round(nbytes / len(out), 3),
        },
    }))


if __name__ == "__main__":
    main()
