"""Benchmark driver: one JSON line on stdout.

Measures the flagship .dexqv five-channel Huffman encode step on the
accelerator with device-resident data (steady state), against the reference
C encoder running on this host over the same logical data.

Device-resident is the honest kernel metric here: this environment reaches
its TPU through a TCP relay whose host<->device link runs at ~10-40 MB/s —
three orders of magnitude below a production host's DMA — so end-to-end
wall time through the tunnel measures the tunnel, not the codec.  The C
baseline *is* end-to-end (read file, encode, write file) on local tmpfs,
which is the reference's native operating point.

The reference publishes no throughput numbers (BASELINE.md), so the
compiled C tool is the baseline; vs_baseline = our GB/s / C GB/s.

Usage: python bench.py [--mb N]
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

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np


def build_ref_tools() -> Path | None:
    ref = Path("/root/reference")
    if not ref.is_dir():
        return None
    build = Path("/tmp/dxt_bench_ref")
    build.mkdir(exist_ok=True)
    for src in ref.glob("*.[ch]"):
        (build / src.name).write_bytes(src.read_bytes())
    for tool in ("dexqv", "undexqv", "dexta", "undexta"):
        exe = build / tool
        if not exe.exists():
            r = subprocess.run(
                ["gcc", "-O3", "-fno-strict-aliasing", "-o", str(exe),
                 f"{tool}.c", "DB.c", "QV.c", "-lm"],
                cwd=build, capture_output=True)
            if r.returncode != 0:
                return None
    return build


def time_tool(build: Path, tool: str, args: list[str]) -> float | None:
    """min-of-3 wall time of a reference tool run, or None."""
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = subprocess.run([str(build / tool)] + args, capture_output=True)
        if r.returncode == 0:
            times.append(time.perf_counter() - t0)
    return min(times) if times else None


def main() -> None:
    mb = 16
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--mb":
            mb = int(args[i + 1])

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    platform = jax.devices()[0].platform

    from conftest import make_quiva
    from dextractor_tpu.formats.quiva import parse_quiva
    from dextractor_tpu.formats.ragged import pad_rows
    from dextractor_tpu.codecs.qv_codec import scan_quiva, create_qvcoding
    from dextractor_tpu.ops import bitstream_jax as bj
    from dextractor_tpu.ops.twobit import NUMBER_BASE_LUT
    from dextractor_tpu.parallel import qv_encode_step, null_run_luts

    # ---- build a realistic batch --------------------------------------
    read_len = 2000
    n_reads = max(8, (mb * 1_000_000) // (5 * read_len))
    print(f"[bench] platform={platform} generating {n_reads} reads ...",
          file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    data = make_quiva(rng, n_reads=n_reads, min_len=read_len - 50,
                      max_len=read_len + 50)
    workdir = Path("/tmp/dxt_bench")
    workdir.mkdir(exist_ok=True)
    src = workdir / "g.quiva"
    src.write_bytes(data)

    q = parse_quiva(data)
    lengths = q.lengths.astype(np.int64)
    stats = scan_quiva(q)
    coding = create_qvcoding(stats, q.prefix, False)
    rects = [pad_rows(q.streams[s], lengths, align=512, bucket=True)
             for s in range(5)]
    streams = np.stack(rects)
    n = q.n_entries
    n_pad = max(8, 1 << max(n - 1, 0).bit_length())
    if n_pad != n:
        streams = np.concatenate(
            [streams, np.zeros((5, n_pad - n, streams.shape[2]), np.uint8)], 1)
        lengths = np.concatenate([lengths, np.zeros(n_pad - n, np.int64)])

    sym = np.stack([
        bj.scheme_luts(coding.del_scheme),
        bj.scheme_luts(coding.ins_scheme),
        bj.scheme_luts(coding.mrg_scheme),
        bj.scheme_luts(coding.sub_scheme),
    ])
    run = np.stack([
        bj.scheme_luts(coding.drun_scheme, run=True) if coding.drun_scheme else null_run_luts(),
        null_run_luts(),
        null_run_luts(),
        bj.scheme_luts(coding.srun_scheme, run=True) if coding.srun_scheme else null_run_luts(),
    ])
    rchars = np.array([coding.del_char, -1, -1, coding.sub_char], np.int32)

    # ---- device-resident timing ---------------------------------------
    # The tunnel runtime acks dispatches asynchronously, so per-call
    # block_until_ready under-measures.  Instead run K chained steps inside
    # one jitted fori_loop (each iteration data-depends on the last via a
    # carried checksum) and time the difference between two K values so the
    # fixed dispatch/fetch overhead cancels.
    def measure_chained(chained, dargs, label):
        def run_k(k):
            t = time.perf_counter()
            v = chained(*dargs, jnp.int32(k))
            _ = int(v)                   # force full execution via fetch
            return time.perf_counter() - t

        t0 = time.perf_counter()
        run_k(1)                         # compile + warm
        print(f"[bench] {label}: compile+warm {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        # steps are milliseconds while a result fetch costs ~0.2s through
        # the relay: widen K until the difference clears the noise floor.
        # Budget: very long chained device programs trip the TPU worker
        # watchdog (which kills the worker for every later measurement),
        # so estimate the per-step cost first and cap total device time.
        k_lo = 2
        t_lo = min(run_k(k_lo) for _ in range(3))
        est = max(t_lo / k_lo, 1e-4)     # upper bound incl. fetch overhead
        budget_s = 22.0
        dt = None
        last = None                      # (k_hi, t_hi) of the last rung
        for k_hi in (12, 52, 202):
            if est * k_hi > budget_s:
                break
            t_hi = min(run_k(k_hi) for _ in range(2))
            last = (k_hi, t_hi)
            print(f"[bench] {label}: k={k_hi}: {t_hi:.3f}s "
                  f"(k={k_lo}: {t_lo:.3f}s)", file=sys.stderr, flush=True)
            if t_hi - t_lo > 0.4 or t_hi > 30:
                dt = (t_hi - t_lo) / (k_hi - k_lo)
                break
            est = max(t_hi / k_hi, est)
        if dt is None:
            # slow step: k_lo alone is far above the noise floor, so
            # difference two small K values instead of escalating
            if est * 3 > budget_s:
                t1 = min(run_k(1) for _ in range(2))
                dt = max(t_lo - t1, 1e-9)
            else:
                k_hi = max(3, min(202, int(budget_s / est)))
                if last is not None and last[0] == k_hi:
                    t_hi = last[1]       # the escalation already ran this k
                else:
                    t_hi = min(run_k(k_hi) for _ in range(2))
                    print(f"[bench] {label}: k={k_hi}: {t_hi:.3f}s (capped)",
                          file=sys.stderr, flush=True)
                dt = max(t_hi - t_lo, 1e-9) / (k_hi - k_lo)
        return dt

    print("[bench] uploading + compiling encode ...", file=sys.stderr,
          flush=True)
    dargs = (jnp.asarray(streams), jnp.asarray(lengths.astype(np.int32)),
             jnp.asarray(sym), jnp.asarray(run), jnp.asarray(rchars),
             jnp.asarray(NUMBER_BASE_LUT))
    jax.block_until_ready(dargs)

    @jax.jit
    def enc_chained(streams_, lengths_, sym_, run_, rchars_, nlut_, k):
        # every iteration XORs the carried checksum into the symbol data so
        # the loop body cannot be hoisted as loop-invariant; the encode cost
        # profile is identical for arbitrary u8 symbols
        def body(_, acc):
            d = streams_ ^ (acc & 0xFF).astype(jnp.uint8)
            out = qv_encode_step(d, lengths_, sym_, run_, rchars_, nlut_)
            return acc + out[2].sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    dt = measure_chained(enc_chained, dargs, "qv-encode")
    payload_bytes = int(q.lengths.sum()) * 5        # the five QV streams
    gbps = payload_bytes / dt / 1e9

    # ---- device dexqv decode (gather-free fused five-channel step) -----
    from dextractor_tpu.codecs.qv_codec import (
        encode_quiva_to_dexqv, decode_dexqv_to_quiva, _index_native)
    from dextractor_tpu.codecs.qv_batch import decode_tables_v2
    from dextractor_tpu.formats import dexqv as dqf
    from dextractor_tpu.formats.ragged import bucket_len, next_pow2
    from dextractor_tpu.ops import decode2 as d2

    from dextractor_tpu.codecs.qv_batch import channel_rects

    enc = encode_quiva_to_dexqv(data, device=False)
    (workdir / "g.dexqv").write_bytes(enc)
    coding, coff = dqf.parse_qvcoding(memoryview(enc), 2)
    indexed = _index_native(enc, coding, coff, True)
    dec_gbps = None
    if indexed is None:                  # native shim unavailable: skip the
        pass                             # decode metric, keep the JSON line
    else:
        (_, _, _, _, _, _, eoffs, elens, coffs_t, ntoks_t) = indexed
        n_dec = len(eoffs)
        n_decp = max(8, 1 << max(n_dec - 1, 0).bit_length())
        dbuf = np.frombuffer(enc, np.uint8)
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
        dec_args = (*(jnp.asarray(r) for r in rects), jnp.asarray(drlens),
                    jnp.asarray(sids), jnp.asarray(f1_t), jnp.asarray(f2_t),
                    jnp.asarray(types_t), jnp.int32(coding.del_char & 0xFF),
                    jnp.int32(coding.sub_char & 0xFF))
        jax.block_until_ready(dec_args)

        @jax.jit
        def dec_chained(rd_, tg_, ri_, rm_, rs_, rlens_, sids_, f1_, f2_, ty_,
                        dc_, sc_, k):
            # decode cost is shape-determined (fixed fori chains), so XORing
            # the del rectangle keeps cost identical while defeating hoisting
            def body(_, acc):
                r = rd_ ^ acc.astype(jnp.uint32)
                rows = d2.decode_entry_batch2(
                    r, tg_, ri_, rm_, rs_, rlens_, sids_, f1_, f2_, ty_, dc_,
                    sc_, max_len=dec_max_len, max_tokens=dec_max_tokens,
                    del_mode=del_mode, sub_mode=sub_mode, subw=subw, lmax=lmax,
                    chan_l2=chan_l2, max_sym=dec_max_sym)
                return acc + rows.astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        try:
            ddt = measure_chained(dec_chained, dec_args, "qv-decode")
            dec_gbps = payload_bytes / ddt / 1e9
        except Exception as e:                        # keep the JSON line coming
            print(f"[bench] qv-decode failed: {e}", file=sys.stderr, flush=True)
            dec_gbps = None

    # ---- device dexta encode/decode (2-bit codec) ----------------------
    from conftest import make_fasta
    from dextractor_tpu.codecs.twobit_codec import (
        encode_fasta_to_dexta, _encode_rows, _decode_rows)
    from dextractor_tpu.formats.dexta import read_dexta
    from dextractor_tpu.formats.ragged import pad_rows as _padr
    from dextractor_tpu.ops.twobit import NUMBER_BASE_LUT as NLUT, LOWER_LUT

    fasta = make_fasta(rng, n_reads=n_reads, min_len=read_len - 50,
                       max_len=read_len + 50, width=80)
    fsrc = workdir / "g.fasta"
    fsrc.write_bytes(fasta)
    denc = encode_fasta_to_dexta(fasta, device=False)
    (workdir / "g.dexta").write_bytes(denc)
    df = read_dexta(denc)
    frlens = (df.ends - df.begs).astype(np.int64)
    fclens = df.payload.lengths
    prow = _padr(df.payload.flat, fclens, align=128, bucket=True)
    npad = max(8, 1 << max(len(frlens) - 1, 0).bit_length())
    prow = np.concatenate(
        [prow, np.zeros((npad - prow.shape[0], prow.shape[1]), np.uint8)])
    total_bases = int(frlens.sum())

    # decode: payload rows -> ascii rows
    dx_args = (jnp.asarray(prow), jnp.asarray(LOWER_LUT))
    jax.block_until_ready(dx_args)

    @jax.jit
    def dexta_dec_chained(rows_, lut_, k):
        def body(_, acc):
            r = rows_ ^ (acc & 0xFF).astype(jnp.uint8)
            sym = _decode_rows(r, lut_)
            return acc + sym.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    try:
        xddt = measure_chained(dexta_dec_chained, dx_args, "dexta-decode")
        dexta_dec_gbps = total_bases / xddt / 1e9
    except Exception as e:
        print(f"[bench] dexta-decode failed: {e}", file=sys.stderr, flush=True)
        dexta_dec_gbps = None

    # encode: ascii rows -> packed payload
    seq_rows = np.asarray(_decode_rows(jnp.asarray(prow),
                                       jnp.asarray(LOWER_LUT)))
    flens = np.pad(frlens, (0, npad - len(frlens))).astype(np.int32)
    ex_args = (jnp.asarray(seq_rows), jnp.asarray(flens), jnp.asarray(NLUT))
    jax.block_until_ready(ex_args)

    @jax.jit
    def dexta_enc_chained(rows_, lens_, lut_, k):
        def body(_, acc):
            # flip case bit only: stays in the LUT's alphabet, defeats hoist
            r = rows_ ^ ((acc & 0x1) << 5).astype(jnp.uint8)
            packed = _encode_rows(r, lens_, lut_)
            return acc + packed.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    try:
        xedt = measure_chained(dexta_enc_chained, ex_args, "dexta-encode")
        dexta_enc_gbps = total_bases / xedt / 1e9
    except Exception as e:
        print(f"[bench] dexta-encode failed: {e}", file=sys.stderr, flush=True)
        dexta_enc_gbps = None

    # ---- C baselines ---------------------------------------------------
    build = build_ref_tools()
    base_dt = c_undexqv = c_dexta = c_undexta = None
    if build is not None:
        base_dt = time_tool(build, "dexqv", ["-k", str(src)])
        c_undexqv = time_tool(build, "undexqv",
                              ["-k", str(workdir / "g.dexqv")])
        c_dexta = time_tool(build, "dexta", ["-k", str(fsrc)])
        c_undexta = time_tool(build, "undexta",
                              ["-k", str(workdir / "g.dexta")])
    base_gbps = payload_bytes / base_dt / 1e9 if base_dt else None
    vs = (gbps / base_gbps) if base_gbps else None
    c_undexqv_gbps = payload_bytes / c_undexqv / 1e9 if c_undexqv else None
    c_dexta_gbps = total_bases / c_dexta / 1e9 if c_dexta else None
    c_undexta_gbps = total_bases / c_undexta / 1e9 if c_undexta else None

    # decode throughput via the native entry-chain walker (host side)
    decode_dexqv_to_quiva(enc)               # warm page/arena reuse
    t0 = time.perf_counter()
    dec = decode_dexqv_to_quiva(enc)
    dec_dt = time.perf_counter() - t0
    dec_ok = dec == data
    dec_mbps = len(data) / dec_dt / 1e6

    def rnd(x, p=4):
        return round(x, p) if x is not None else None

    print(json.dumps({
        "metric": "dexqv_encode_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "detail": {
            "platform": platform,
            "payload_MB": round(payload_bytes / 1e6, 1),
            "step_s": round(dt, 4),
            "c_ref_s": rnd(base_dt, 3),
            "c_ref_GBps": rnd(base_gbps),
            "dexqv_decode_throughput": {
                "value": rnd(dec_gbps), "unit": "GB/s",
                "vs_baseline": rnd(dec_gbps / c_undexqv_gbps, 3)
                if (c_undexqv_gbps and dec_gbps) else None,
                "c_undexqv_GBps": rnd(c_undexqv_gbps)},
            "dexta_decode_throughput": {
                "value": rnd(dexta_dec_gbps), "unit": "GB/s",
                "vs_baseline": rnd(dexta_dec_gbps / c_undexta_gbps, 3)
                if (c_undexta_gbps and dexta_dec_gbps) else None,
                "c_undexta_GBps": rnd(c_undexta_gbps)},
            "dexta_encode_throughput": {
                "value": rnd(dexta_enc_gbps), "unit": "GB/s",
                "vs_baseline": rnd(dexta_enc_gbps / c_dexta_gbps, 3)
                if (c_dexta_gbps and dexta_enc_gbps) else None,
                "c_dexta_GBps": rnd(c_dexta_gbps)},
            "decode_native_MBps": round(dec_mbps, 1),
            "decode_roundtrip_ok": bool(dec_ok),
            "note": "device-resident steady-state steps; host link here is "
                    "a ~10-40MB/s TCP relay, not production DMA",
        },
    }))


if __name__ == "__main__":
    main()
