"""Honest encode-step attribution: time each REAL sub-launch.

The r3 noscan/nocompact ablation knobs produced wrong-output stubs and
let the compiler collapse more than the phase under test (PACK_r04: the
'attributed' 4.5 ms of scans+compaction bought nothing when actually
removed).  This tool instead times the step's three real Pallas
launches separately, each with its true outputs consumed:

  run    — encode_run_pallas over (2, N, 2L+1) slots (del, sub)
  plain  — encode_plain_pallas over (2, N, L) slots (ins, mrg)
  tags   — pack_tags_pallas
  step   — the full qv_encode_step (glue = step - run - plain - tags)

Same data construction as bench.py (seed 0, --mb) so programs share the
persistent cache.  One child process per measurement (fresh-process
rule).  Run on the TPU host: python tools/encode_split.py [--mb 16]
One JSON line (prefix SPLIT:).
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

PARTS = ("run", "plain", "tags", "step")


def log(msg):
    print(f"[split] {msg}", file=sys.stderr, flush=True)


def child(mb, part):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _metric_qv_encode, measure_chained, prep_data

    if part == "step":
        dt = _metric_qv_encode({"quiva": Path("/tmp/dxt_bench/g.quiva")})
        print("CHILD: " + json.dumps({"dt_ms": round(dt * 1e3, 3)}),
              flush=True)
        return

    # bench-identical batch setup (mirrors _metric_qv_encode)
    from dextractor_tpu.formats.quiva import parse_quiva
    from dextractor_tpu.formats.ragged import pad_rows, bucket_rows
    from dextractor_tpu.codecs.qv_codec import scan_quiva, create_qvcoding
    from dextractor_tpu.ops import bitstream_jax as bj
    from dextractor_tpu.ops.twobit import NUMBER_BASE_LUT
    from dextractor_tpu.parallel import null_run_luts
    from dextractor_tpu.ops import emit_pallas as ep

    q = parse_quiva(Path("/tmp/dxt_bench/g.quiva").read_bytes())
    lengths = q.lengths.astype(np.int64)
    stats = scan_quiva(q)
    coding = create_qvcoding(stats, q.prefix, False)
    rects = [pad_rows(q.streams[s], lengths, align=512, bucket=True)
             for s in range(5)]
    streams = np.stack(rects)
    n = q.n_entries
    n_pad = bucket_rows(n)
    if n_pad != n:
        streams = np.concatenate(
            [streams, np.zeros((5, n_pad - n, streams.shape[2]), np.uint8)],
            1)
        lengths = np.concatenate([lengths, np.zeros(n_pad - n, np.int64)])
    sym = np.stack([
        bj.scheme_luts(coding.del_scheme),
        bj.scheme_luts(coding.ins_scheme),
        bj.scheme_luts(coding.mrg_scheme),
        bj.scheme_luts(coding.sub_scheme),
    ])
    run = np.stack([
        bj.scheme_luts(coding.drun_scheme, run=True)
        if coding.drun_scheme else null_run_luts(),
        null_run_luts(), null_run_luts(),
        bj.scheme_luts(coding.srun_scheme, run=True)
        if coding.srun_scheme else null_run_luts(),
    ])
    rchars = np.array([coding.del_char, -1, -1, coding.sub_char], np.int32)

    dargs = (jnp.asarray(streams), jnp.asarray(lengths.astype(np.int32)),
             jnp.asarray(sym), jnp.asarray(run), jnp.asarray(rchars),
             jnp.asarray(NUMBER_BASE_LUT))
    jax.block_until_ready(dargs)

    if part == "run":
        @jax.jit
        def chained(streams_, lengths_, sym_, run_, rchars_, nlut_, k):
            ridx = jnp.array([0, 3])

            def body(_, acc):
                d = jnp.stack([streams_[0], streams_[4]]) \
                    ^ (acc & 0xFF).astype(jnp.uint8)
                w, t, lg, pst = ep.encode_run_pallas(
                    d, lengths_, sym_[ridx], run_[ridx], rchars_[ridx])
                return acc + t.sum().astype(jnp.int32) \
                    + w[:, :, 7].sum().astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    elif part == "plain":
        @jax.jit
        def chained(streams_, lengths_, sym_, run_, rchars_, nlut_, k):
            pidx = jnp.array([1, 2])

            def body(_, acc):
                d = jnp.stack([streams_[2], streams_[3]]) \
                    ^ (acc & 0xFF).astype(jnp.uint8)
                w, t, lg, pst = ep.encode_plain_pallas(
                    d, lengths_, sym_[pidx])
                return acc + t.sum().astype(jnp.int32) \
                    + w[:, :, 7].sum().astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    elif part == "tags":
        @jax.jit
        def chained(streams_, lengths_, sym_, run_, rchars_, nlut_, k):
            def body(_, acc):
                d = streams_[1] ^ (acc & 0xFF).astype(jnp.uint8)
                packed, clens = ep.pack_tags_pallas(
                    d, streams_[0], lengths_, rchars_[0], nlut_)
                return acc + clens.sum().astype(jnp.int32) \
                    + packed[:, 7].sum().astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    dt = measure_chained(chained, dargs, f"enc-{part}")
    print("CHILD: " + json.dumps({"dt_ms": round(dt * 1e3, 3)}), flush=True)


def main():
    mb = 16
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--mb":
            mb = int(args[i + 1])
    if "--child" in args:
        for i, a in enumerate(args):
            if a == "--part":
                child(mb, args[i + 1])
                return
        raise SystemExit("--child requires --part")

    env0 = dict(os.environ)
    from bench import prep_data
    prep_data(mb)

    results = {}
    for part in PARTS:
        t0 = time.perf_counter()
        for attempt in range(3):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--mb", str(mb), "--part", part],
                env=env0, capture_output=True, text=True, timeout=7200)
            if r.returncode == 0:
                break
            log(f"{part} attempt {attempt + 1} rc={r.returncode}; 45s")
            time.sleep(45)
        line = [l for l in r.stdout.splitlines() if l.startswith("CHILD:")]
        if r.returncode == 0 and line:
            results[part] = json.loads(line[0][7:])["dt_ms"]
        else:
            results[part] = f"FAIL rc={r.returncode}: {r.stderr[-300:]}"
        log(f"{part}: {results[part]} (wall {time.perf_counter()-t0:.0f}s)")
    if all(isinstance(results.get(p), float) for p in PARTS):
        results["glue"] = round(results["step"] - results["run"]
                                - results["plain"] - results["tags"], 3)
    print("SPLIT: " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
