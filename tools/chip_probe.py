"""Chip validation probe — the round's machine-readable proof of which
kernels were byte-exact on hardware and when (committed as CHIP_rNN.json).

Validates, on the real accelerator, byte-exactness of:
  1. the fused .dexqv device decode (merged plain chains, collapsed
     delTag, quarter-octave widths) against the host encoder,
  2. the fused .dexqv device encode (quarter-octave row buckets),
  3. the 2-bit dexta device encode/decode,
  4. the VMEM Pallas run expansion — BOTH gates (DXT_EXPAND_PALLAS=0/1)
     every run, with a chained-step timing A/B so the default stays
     data-driven (the XLA network is the miscompile workaround path and
     must not rot),
  5. long-read decode: the log-normal ~10kb/60kb batch bench.py uses,
     decoded per compressed-length bucket through the g=1 wide-lane
     conveyor geometries, byte-exact + per-bucket step timings,
  6. the conveyor under shard_map on the chip (1-device mesh).

Uses the exact data construction bench.py uses (seed 0, --mb sized) so
compiled programs land in the shared .jax_cache and bench.py reuses them.

Run: python tools/chip_probe.py [--mb 16] [--skip-ab] [--out FILE]
Writes a JSON summary to stdout (one line, prefixed PROBE:) and, with
--out, to FILE with a timestamp and the current git head.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np


def log(msg):
    print(f"[probe +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main():
    mb = 16
    skip_ab = False
    out_path = None
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--mb":
            mb = int(args[i + 1])
        if a == "--skip-ab":
            skip_ab = True
        if a == "--out":
            out_path = args[i + 1]

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    log(f"platform={jax.devices()[0].platform}")

    from conftest import make_quiva, make_fasta
    from dextractor_tpu.codecs.qv_codec import (
        encode_quiva_to_dexqv, decode_dexqv_to_quiva)
    from dextractor_tpu.codecs.twobit_codec import (
        encode_fasta_to_dexta, decode_dexta_to_fasta)

    read_len = 2000
    n_reads = max(8, (mb * 1_000_000) // (5 * read_len))
    rng = np.random.default_rng(0)
    data = make_quiva(rng, n_reads=n_reads, min_len=read_len - 50,
                      max_len=read_len + 50)
    fasta = make_fasta(rng, n_reads=n_reads, min_len=read_len - 50,
                       max_len=read_len + 50, width=80)
    log(f"generated quiva {len(data)/1e6:.1f} MB, fasta {len(fasta)/1e6:.1f} MB")

    results = {}

    from contextlib import contextmanager

    def _flush():
        if out_path:
            import subprocess as sp
            head = sp.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
            rec = {"when": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime()),
                   "git_head": head, "mb": mb, **results}
            Path(out_path).write_text(json.dumps(rec, indent=1) + "\n")

    @contextmanager
    def section(name):
        """Crash tolerance: a TPU worker death mid-section records the
        failure and still flushes the partial artifact (the round-2
        bench lesson: never lose the whole record to one crash)."""
        try:
            yield
        except Exception as e:
            results[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"section {name} FAILED: {str(e)[:300]}")
        _flush()

    # host ground truth (CPU paths are golden-tested vs the C oracles)
    enc_host = encode_quiva_to_dexqv(data, device=False)
    denc_host = encode_fasta_to_dexta(fasta, device=False)
    log("host encodes done")

    # 0. long-read decode FIRST: bench-identical log-normal batch,
    # bucketed.  Runs before any other device work — the remote compile
    # helper reproducibly 500s on these programs when the process has
    # already run the 2 kb sections (fresh-process runs always pass),
    # so order is load-bearing; a one-shot retry covers transient 500s.
    with section("longreads"):
        from bench import (lognormal_lengths, measure_chained,
                           qv_dec_long_parts)
        from dextractor_tpu.codecs.qv_codec import _index_native
        from dextractor_tpu.formats import dexqv as dqf2

        rng_l = np.random.default_rng(2)
        data_long = make_quiva(rng_l, lengths=lognormal_lengths(mb))
        enc_long = encode_quiva_to_dexqv(data_long, device=False)
        log(f"long batch: {len(data_long)/1e6:.1f} MB quiva, "
            f"{len(enc_long)/1e6:.1f} MB dexqv")

        # the fused emit kernels at long rows (round-2 verdict: unproven
        # past ~2 kb).  FIRST device work of the process: the remote
        # compile helper dies under accumulated session state (fresh
        # processes always compile these), so order is load-bearing.
        t = time.perf_counter()
        for attempt in range(4):
            try:
                enc_long_dev = encode_quiva_to_dexqv(data_long,
                                                     device=True)
                break
            except Exception as e:
                log(f"long encode attempt {attempt + 1} failed "
                    f"({str(e)[:120]}); retrying in 20s")
                if attempt == 3:
                    raise
                time.sleep(20)
        results["dexqv_encode_longreads_ok"] = enc_long_dev == enc_long
        log(f"long-read device encode: "
            f"ok={results['dexqv_encode_longreads_ok']} "
            f"({time.perf_counter()-t:.1f}s incl compile)")

        t = time.perf_counter()
        # the remote compile helper 500s intermittently on these program
        # sizes; every completed compile lands in the persistent cache,
        # so retries RATCHET forward through the bucket programs
        for attempt in range(8):
            try:
                dec_long = decode_dexqv_to_quiva(enc_long, device=True)
                break
            except Exception as e:
                log(f"long decode attempt {attempt + 1} failed "
                    f"({str(e)[:120]}); retrying in 20s")
                if attempt == 7:
                    raise
                time.sleep(20)
        results["dexqv_decode_longreads_ok"] = dec_long == data_long
        log(f"long-read device decode: "
            f"ok={results['dexqv_decode_longreads_ok']} "
            f"({time.perf_counter()-t:.1f}s incl compile)")

        coding_l, coff_l = dqf2.parse_qvcoding(memoryview(enc_long), 2)
        idx_l = _index_native(enc_long, coding_l, coff_l, True)
        payload_long = int(idx_l[7].sum()) * 5
        total_dt = 0.0
        bucket_ms = {}
        for fn, dec_args, label in qv_dec_long_parts(enc_long):
            dt = measure_chained(fn, dec_args, label)
            bucket_ms[label.split("qv-decode-long ")[1]] = round(dt * 1e3, 3)
            total_dt += dt
        results["longreads_bucket_step_ms"] = bucket_ms
        results["longreads_step_ms_total"] = round(total_dt * 1e3, 3)
        results["longreads_GBps"] = round(payload_long / total_dt / 1e9, 3)
        log(f"long-read buckets: {bucket_ms} total "
            f"{total_dt*1e3:.2f} ms = {results['longreads_GBps']} GB/s")


    # 1. device .dexqv decode (XLA expand path, gate off)
    with section("dexqv_decode"):
        os.environ["DXT_EXPAND_PALLAS"] = "0"
        t = time.perf_counter()
        dec = decode_dexqv_to_quiva(enc_host, device=True)
        results["dexqv_decode_device_ok"] = dec == data
        log(f"dexqv device decode (xla expand): "
            f"ok={results['dexqv_decode_device_ok']} "
            f"({time.perf_counter()-t:.1f}s incl compile)")

    # 2. device .dexqv encode (quarter-octave buckets)
    with section("dexqv_encode"):
        t = time.perf_counter()
        enc_dev = encode_quiva_to_dexqv(data, device=True)
        results["dexqv_encode_device_ok"] = enc_dev == enc_host
        log(f"dexqv device encode: ok={results['dexqv_encode_device_ok']} "
            f"({time.perf_counter()-t:.1f}s incl compile)")

    # 3. dexta device round trip
    with section("dexta"):
        t = time.perf_counter()
        denc_dev = encode_fasta_to_dexta(fasta, device=True)
        results["dexta_encode_device_ok"] = denc_dev == denc_host
        log(f"dexta device encode: ok={results['dexta_encode_device_ok']} "
            f"({time.perf_counter()-t:.1f}s incl compile)")
        t = time.perf_counter()
        fdec = decode_dexta_to_fasta(denc_host, device=True, width=80)
        results["dexta_decode_device_ok"] = fdec == fasta
        log(f"dexta device decode: ok={results['dexta_decode_device_ok']} "
            f"({time.perf_counter()-t:.1f}s incl compile)")

    # 4. Pallas run expansion A/B: correctness + chained timing
    if not skip_ab:
      with section("expand_ab"):
            os.environ["DXT_EXPAND_PALLAS"] = "1"
            t = time.perf_counter()
            dec_p = decode_dexqv_to_quiva(enc_host, device=True)
            results["dexqv_decode_pallas_expand_ok"] = dec_p == data
            log(f"dexqv device decode (pallas expand): "
                f"ok={results['dexqv_decode_pallas_expand_ok']} "
                f"({time.perf_counter()-t:.1f}s incl compile)")

            # chained decode-step timing under both gates (bench-identical
            # program shapes so bench.py reuses whichever wins from the cache)
            from dextractor_tpu.codecs.qv_codec import _index_native
            from dextractor_tpu.codecs.qv_batch import (
                decode_tables_v2, channel_rects)
            from dextractor_tpu.formats import dexqv as dqf
            from dextractor_tpu.formats.ragged import (bucket_len,
                                                       bucket_rows,
                                                       next_pow2)
            from dextractor_tpu.ops import decode2 as d2

            coding, coff = dqf.parse_qvcoding(memoryview(enc_host), 2)
            indexed = _index_native(enc_host, coding, coff, True)
            (_, _, _, _, _, _, eoffs, elens, coffs_t, ntoks_t) = indexed
            n_dec = len(eoffs)
            n_decp = bucket_rows(n_dec)
            dbuf = np.frombuffer(enc_host, np.uint8)
            drlens = np.pad(elens.astype(np.int32), (0, n_decp - n_dec))
            dec_max_len = bucket_len(int(drlens.max(initial=0)), 512)
            dec_max_sym = bucket_len(int(drlens.max(initial=0)))
            dec_max_tokens = bucket_len(int(ntoks_t.max(initial=0)), 16)
            rects = channel_rects(dbuf, eoffs, coffs_t, dec_max_len)
            rects = tuple(
                np.concatenate([r, np.zeros((n_decp - n_dec, r.shape[1]), r.dtype)])
                for r in rects)
            sids, f1_t, f2_t, types_t, del_mode, sub_mode, subw, lmax = \
                decode_tables_v2(coding)
            chan_l2 = tuple(bool(((f1_t[sids[k]] >> 20) & 1).any())
                            for k in range(6))
            spec_t = d2.spec_table(sids, f1_t, f2_t, types_t, subw, lmax)
            dec_args = (*(jnp.asarray(r) for r in rects), jnp.asarray(drlens),
                        jnp.asarray(sids), jnp.asarray(f1_t), jnp.asarray(f2_t),
                        jnp.asarray(types_t), jnp.int32(coding.del_char & 0xFF),
                        jnp.int32(coding.sub_char & 0xFF))
            jax.block_until_ready(dec_args)
            payload_bytes = int(elens.sum()) * 5

            def make_chained(spec):
                @jax.jit
                def dec_chained(rd_, tg_, ri_, rm_, rs_, rlens_, sids_, f1_, f2_,
                                ty_, dc_, sc_, k):
                    def body(_, acc):
                        r = rd_ ^ acc.astype(jnp.uint32)
                        rows = d2.decode_entry_batch2(
                            r, tg_, ri_, rm_, rs_, rlens_, sids_, f1_, f2_, ty_,
                            dc_, sc_, max_len=dec_max_len,
                            max_tokens=dec_max_tokens, del_mode=del_mode,
                            sub_mode=sub_mode, subw=subw, lmax=lmax,
                            chan_l2=chan_l2, max_sym=dec_max_sym, spec=spec)
                        return acc + rows.astype(jnp.int32).sum()
                    return jax.lax.fori_loop(0, k, body, jnp.int32(0))
                return dec_chained

            def measure(label, spec=None):
                fn = make_chained(spec)

                def run_k(k):
                    t = time.perf_counter()
                    v = fn(*dec_args, jnp.int32(k))
                    _ = int(v)
                    return time.perf_counter() - t

                t0 = time.perf_counter()
                run_k(1)
                log(f"{label}: compile+warm {time.perf_counter()-t0:.1f}s")
                t2 = min(run_k(2) for _ in range(3))
                t22 = min(run_k(22) for _ in range(2))
                dt = (t22 - t2) / 20
                log(f"{label}: k=2 {t2:.3f}s k=22 {t22:.3f}s -> "
                    f"{dt*1e3:.2f} ms/step = {payload_bytes/dt/1e9:.2f} GB/s")
                return dt

            os.environ["DXT_EXPAND_PALLAS"] = "0"
            dt_xla = measure("decode-xla-expand", spec_t)
            os.environ["DXT_EXPAND_PALLAS"] = "1"
            dt_pal = measure("decode-pallas-expand", spec_t)
            # pair-step A/B: same program minus the length speculation
            dt_nopair = measure("decode-nopair", None)
            results["decode_step_ms_xla_expand"] = round(dt_xla * 1e3, 3)
            results["decode_step_ms_pallas_expand"] = round(dt_pal * 1e3, 3)
            results["pallas_expand_speedup"] = round(dt_xla / dt_pal, 3)
            results["decode_step_ms_nopair"] = round(dt_nopair * 1e3, 3)
            results["pair_step_speedup"] = round(dt_nopair / dt_pal, 3)

    # 6. conveyor under shard_map on the chip (1-device mesh)
    with section("shardmap"):
        from dextractor_tpu.parallel import make_mesh

        t = time.perf_counter()
        dec_sm = decode_dexqv_to_quiva(enc_host, device=True,
                                       mesh=make_mesh(1))
        results["dexqv_decode_shardmap_ok"] = dec_sm == data
        log(f"shard_map device decode: "
            f"ok={results['dexqv_decode_shardmap_ok']} "
            f"({time.perf_counter()-t:.1f}s incl compile)")

    ok = all(v for k, v in results.items() if k.endswith("_ok")) \
        and not any(k.endswith("_error") for k in results)
    results["all_ok"] = ok
    print("PROBE: " + json.dumps(results), flush=True)
    _flush()


if __name__ == "__main__":
    main()
