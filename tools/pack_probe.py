"""Chip validation + timing for the chunk-local pack (DXT_PACK_LOCAL).

ops/pack_local packs each 128-slot chunk into its own 128-word region —
the global boundary compaction disappears and the pack scans become
chunk-local MXU dots.  It ships gated off until proven on hardware; this
probe runs, per config in a FRESH child process (the knobs are read at
module import):

  * byte-exactness of the full device encode vs the host encoder (the
    host path is golden-tested vs /root/reference/QV.c) on the bench's
    2 kb batch AND the log-normal long-read batch (seed 2) — the region
    merge (bitstream_jax.finalize_rows_local / native dxt_region_merge)
    is covered end-to-end because comparison is on final container bytes;
  * the bench-identical chained encode-step time (bench._metric_qv_encode)
    so whichever config wins is already in .jax_cache for bench.py.

Run: python tools/pack_probe.py [--mb 16] [--configs local,mxu] [--out F]
One JSON line to stdout (prefix PACKPROBE:).
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

CONFIGS = {
    "mxu": {},                                      # shipping default
    "local": {"DXT_PACK_LOCAL": "1"},               # candidate
    "local_novpu": {"DXT_PACK_LOCAL": "1", "DXT_PACK_MXU": "0"},
}


def log(msg):
    print(f"[packprobe] {msg}", file=sys.stderr, flush=True)


def _retry(fn, what, attempts=4, backoff=20):
    """Remote-compile 500s are intermittent and completed compiles
    persist in .jax_cache, so retries ratchet forward."""
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:
            log(f"{what} attempt {a + 1} failed ({str(e)[:120]})")
            if a == attempts - 1:
                raise
            time.sleep(backoff)


def child(mb, phase):
    """One phase per child process: this environment's jax build can
    SIGSEGV a compile under accumulated in-process state (fresh
    processes always pass — same lesson as chip_probe's section order
    and bench.py's worker design), so verify-2kb / verify-long / timing
    each get their own process."""
    import numpy as np
    # initialize the jax backend BEFORE conftest: its import pins
    # JAX_PLATFORMS=cpu (test harness), which must not capture us
    import jax
    platform = jax.devices()[0].platform
    log(f"platform={platform}")
    env_keep = {k: os.environ.get(k)
                for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS",
                          "XLA_FLAGS")}
    from conftest import make_quiva
    for k, v in env_keep.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    from bench import lognormal_lengths, _metric_qv_encode
    from dextractor_tpu.codecs.qv_codec import encode_quiva_to_dexqv

    out = {"platform": platform}
    if phase == "verify2kb":
        read_len = 2000
        n_reads = max(8, (mb * 1_000_000) // (5 * read_len))
        rng = np.random.default_rng(0)
        data = make_quiva(rng, n_reads=n_reads, min_len=read_len - 50,
                          max_len=read_len + 50)
        enc_host = encode_quiva_to_dexqv(data, device=False)
        log(f"host 2kb encode done ({len(data)/1e6:.1f} MB)")
        enc_dev = _retry(lambda: encode_quiva_to_dexqv(data, device=True),
                         "2kb device encode")
        out["enc_2kb_ok"] = enc_dev == enc_host
        log(f"2kb device encode ok={out['enc_2kb_ok']}")
    elif phase == "verifylong":
        data_l = make_quiva(np.random.default_rng(2),
                            lengths=lognormal_lengths(mb))
        enc_l_host = encode_quiva_to_dexqv(data_l, device=False)
        log(f"host long encode done ({len(data_l)/1e6:.1f} MB)")
        enc_l_dev = _retry(
            lambda: encode_quiva_to_dexqv(data_l, device=True),
            "long device encode")
        out["enc_long_ok"] = enc_l_dev == enc_l_host
        log(f"long device encode ok={out['enc_long_ok']}")
    elif phase == "time":
        dt = _metric_qv_encode({"quiva": Path("/tmp/dxt_bench/g.quiva")})
        out["step_ms"] = round(dt * 1e3, 3)
    print("CHILD: " + json.dumps(out), flush=True)


def main():
    mb = 16
    names = ["local", "mxu"]
    out_path = None
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--mb":
            mb = int(args[i + 1])
        if a == "--configs":
            names = args[i + 1].split(",")
        if a == "--out":
            out_path = args[i + 1]
    if "--child" in args:
        for i, a in enumerate(args):
            if a == "--phase":
                child(mb, args[i + 1])
                return
        raise SystemExit("--child requires --phase")

    env0 = dict(os.environ)
    from bench import prep_data
    prep_data(mb)

    results = {}
    for name in names:
        env = dict(env0)
        env.update(CONFIGS[name])
        results[name] = {}
        for phase in ("verify2kb", "verifylong", "time"):
            t0 = time.perf_counter()
            for attempt in range(3):     # worker/compile crashes are
                r = subprocess.run(      # transient in fresh processes
                    [sys.executable, os.path.abspath(__file__), "--child",
                     "--mb", str(mb), "--phase", phase],
                    env=env, capture_output=True, text=True, timeout=7200)
                if r.returncode == 0:
                    break
                log(f"{name}/{phase} attempt {attempt + 1} rc="
                    f"{r.returncode}; retrying in 45s")
                time.sleep(45)
            for l in r.stderr.splitlines():
                log(f"{name}/{phase}| {l}")
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("CHILD:")]
            if r.returncode == 0 and line:
                results[name].update(json.loads(line[0][7:]))
            else:
                results[name][f"{phase}_error"] = \
                    f"rc={r.returncode}: {r.stderr[-400:]}"
            results[name][f"{phase}_wall_s"] = \
                round(time.perf_counter() - t0)
            log(f"{name}/{phase}: {json.dumps(results[name])[:200]}")
    if out_path:
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()
        rec = {"when": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
               "git_head": head, "mb": mb, **results}
        Path(out_path).write_text(json.dumps(rec, indent=1) + "\n")
    print("PACKPROBE: " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
