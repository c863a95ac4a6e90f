"""Encode-step A/B timings over REAL configurations only.

DEPRECATED as an attribution instrument — use tools/encode_split.py.

The r3 version of this tool drove DXT_EMIT_ABLATE wrong-output stubs
(nopack/noscan/nocompact) to attribute the fused encode step's phases.
PACK_r04 proved that methodology unsound: around a wrong-output stub the
compiler collapses more than the phase under test (that is how the false
"80% word packing" attribution happened), so those knobs were removed
from ops/emit_pallas.  What remains here is an honest A/B harness over
configurations that all produce CORRECT bytes (MXU vs roll-net scans,
global vs chunk-local pack) — differences between them are real; no
phase-attribution claims can be made from any of it.  For attribution,
tools/encode_split.py times the three real launches (run/plain/tags).

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

BANNER = (
    "=" * 72 + "\n"
    "DEPRECATED for phase attribution (see PACK_r04 / CLAUDE.md): this\n"
    "tool only A/B-times byte-correct configurations.  Phase attribution\n"
    "lives in tools/encode_split.py (real launches).\n" + "=" * 72
)

# every configuration below produces byte-correct output; the knobs pick
# between proven formulations, never wrong-output stubs
CONFIGS = [
    # shipping configuration (width-adaptive tiles, MXU pack cumsums)
    ("auto_mxu", {}),
    # round-3 shipping: pure roll-network scans (cached program)
    ("auto_rollnet", {"DXT_PACK_MXU": "0"}),
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

    print(BANNER, file=sys.stderr, flush=True)
    env0 = dict(os.environ)          # before any CPU-forcing import
    from bench import prep_data
    prep_data(mb)

    results = {"_note": "A/B of byte-correct configs only; NOT phase "
                        "attribution (use tools/encode_split.py)"}
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
