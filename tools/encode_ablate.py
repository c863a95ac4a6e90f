"""Encode-step chip ablation: attribute the fused emit kernels' time.

Round-2 verdict weak #4: the 8 ms five-channel encode step is ~1% of its
own traffic roofline and has never been profiled.  This tool measures the
bench-identical qv-encode chained step under kernel knobs, one fresh
subprocess per config (the knobs are read at module import):

  B=8  full    - the shipping configuration (baseline)
  B=16 full    - taller row tiles: if the shift networks are ROUND-
  B=32 full      LATENCY bound (like the decode chains were), more rows
                 per round adds ILP at no extra pass count
  B=8  nopack  - word packing replaced by an elementwise combine: the
                 remainder is the emission phase (LUTs + run scan +
                 interleave), so pack cost = full - nopack

Run: python tools/encode_ablate.py [--mb 16]   (on the TPU host)
One JSON line to stdout (prefix ABLATE:).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

CONFIGS = [
    # shipping configuration (width-adaptive tiles, MXU pack cumsums)
    ("auto_mxu", {}),
    # round-3 shipping: pure roll-network scans (cached program)
    ("auto_rollnet", {"DXT_PACK_MXU": "0"}),
    # emission phase alone (pack replaced by an elementwise combine)
    ("auto_nopack", {"DXT_PACK_MXU": "0", "DXT_EMIT_ABLATE": "nopack"}),
    # pack with fake O(1) scans (wrong output): true in-kernel scan cost
    ("auto_noscan", {"DXT_PACK_MXU": "0", "DXT_EMIT_ABLATE": "noscan"}),
    # pack without the boundary-compaction network (wrong output)
    ("auto_nocompact", {"DXT_PACK_MXU": "0",
                        "DXT_EMIT_ABLATE": "nocompact"}),
    # both MXU scans and no compaction: the residual floor
    ("auto_mxu_nocompact", {"DXT_EMIT_ABLATE": "nocompact"}),
    # chunk-local pack + host region merge (ops/pack_local)
    ("auto_local", {"DXT_PACK_LOCAL": "1"}),
    ("auto_local_novpu", {"DXT_PACK_LOCAL": "1", "DXT_PACK_MXU": "0"}),
]


def main():
    mb = 16
    child = "--child" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--mb":
            mb = int(sys.argv[i + 1])

    if child:
        from bench import _metric_qv_encode
        paths = {"quiva": Path("/tmp/dxt_bench/g.quiva")}
        dt = _metric_qv_encode(paths)
        print("CHILD: " + json.dumps({"dt": dt}), flush=True)
        return

    env0 = dict(os.environ)          # before any CPU-forcing import
    from bench import prep_data
    prep_data(mb)

    results = {}
    for name, knobs in CONFIGS:
        env = dict(env0)
        env.update(knobs)
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--mb", str(mb)],
            env=env, capture_output=True, text=True, timeout=3600)
        line = [l for l in r.stdout.splitlines() if l.startswith("CHILD:")]
        if r.returncode == 0 and line:
            dt = json.loads(line[0][7:])["dt"]
            results[name] = round(dt * 1e3, 3)
            print(f"[ablate] {name}: {dt*1e3:.2f} ms/step "
                  f"(wall {time.perf_counter()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
        else:
            results[name] = f"FAIL rc={r.returncode}: {r.stderr[-300:]}"
            print(f"[ablate] {name}: FAILED", file=sys.stderr, flush=True)
    print("ABLATE: " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
