"""Decode-step phase split on the accelerator, at bench-identical shapes.

Times each phase of decode2.decode_entry_batch2 as its own chained
program (XOR data dependency, difference of two K values — the honest
timing recipe for this async runtime):

  full        the fused five-channel step (cache-shared with bench.py)
  run_del     run_chain_conveyor on the delQV rectangle
  plain_ins   plain_chain_conveyor on the insQV rectangle
  expand      expand_runs2 (XLA shift-expansion network)
  tag         delTag prep (cumsum/state/word fuse) + tag_route_rows

Each phase is one fresh program compile; run when the phase mix is in
question (CLAUDE.md: budget one compile per measurement).

Run: python tools/decode_ablate.py [--mb 16]
Prints one ABLATE: JSON line.
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
    print(f"[ablate +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main():
    mb = 16
    phases = None
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--mb":
            mb = int(args[i + 1])
        if a == "--phases":          # e.g. --phases full,expand
            phases = set(args[i + 1].split(","))

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    log(f"platform={jax.devices()[0].platform}")

    from conftest import make_quiva
    from dextractor_tpu.codecs.qv_codec import (
        encode_quiva_to_dexqv, _index_native)
    from dextractor_tpu.codecs.qv_batch import decode_tables_v2, channel_rects
    from dextractor_tpu.formats import dexqv as dqf
    from dextractor_tpu.formats.ragged import (bucket_len, bucket_rows,
                                               next_pow2)
    from dextractor_tpu.ops import decode2 as d2
    from dextractor_tpu.ops.decode_conveyor import (
        plain_chain_conveyor, run_chain_conveyor)
    from dextractor_tpu.ops.tag_pallas import tag_route_rows

    read_len = 2000
    n_reads = max(8, (mb * 1_000_000) // (5 * read_len))
    rng = np.random.default_rng(0)
    data = make_quiva(rng, n_reads=n_reads, min_len=read_len - 50,
                      max_len=read_len + 50)
    enc_host = encode_quiva_to_dexqv(data, device=False)
    log(f"host encode done ({len(enc_host)/1e6:.1f} MB container)")

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
    sp = spec_t if spec_t is not None else (None,) * 6
    log(f"n={n_dec} (pad {n_decp}) max_len={dec_max_len} "
        f"max_sym={dec_max_sym} max_tokens={dec_max_tokens} "
        f"del_mode={del_mode} sub_mode={sub_mode} subw={subw} lmax={lmax} "
        f"rect_k={[r.shape[1] for r in rects]}")

    f1j = jnp.asarray(f1_t)
    f2j = jnp.asarray(f2_t)
    rects_j = [jnp.asarray(r) for r in rects]
    rlens_j = jnp.asarray(drlens)
    sids_j = jnp.asarray(sids)
    types_j = jnp.asarray(types_t)
    jax.block_until_ready([f1j, f2j, rlens_j] + rects_j)
    payload_bytes = int(elens.sum()) * 5
    results = {"payload_MB": payload_bytes / 1e6, "del_mode": del_mode,
               "sub_mode": sub_mode}

    def measure(label, fn, *xargs):
        """fn(k, *xargs) -> scalar; chained program already inside fn."""
        if phases is not None and label not in phases:
            return None

        def run_k(k):
            t = time.perf_counter()
            _ = int(fn(jnp.int32(k), *xargs))
            return time.perf_counter() - t

        t0 = time.perf_counter()
        run_k(1)
        log(f"{label}: compile+warm {time.perf_counter() - t0:.1f}s")
        t2 = min(run_k(2) for _ in range(3))
        t22 = min(run_k(22) for _ in range(2))
        dt = (t22 - t2) / 20
        log(f"{label}: {dt*1e3:.3f} ms/step")
        results[label + "_ms"] = round(dt * 1e3, 3)
        return dt

    # --- full fused step (bench/probe-identical program) ----------------
    dec_args = (*rects_j, rlens_j, sids_j, f1j, f2j, types_j,
                jnp.int32(coding.del_char & 0xFF),
                jnp.int32(coding.sub_char & 0xFF))

    @jax.jit
    def full_chained(k, rd_, tg_, ri_, rm_, rs_, rlens_, sids_, f1_, f2_,
                     ty_, dc_, sc_):
        def body(_, acc):
            r = rd_ ^ acc.astype(jnp.uint32)
            rows = d2.decode_entry_batch2(
                r, tg_, ri_, rm_, rs_, rlens_, sids_, f1_, f2_, ty_,
                dc_, sc_, max_len=dec_max_len, max_tokens=dec_max_tokens,
                del_mode=del_mode, sub_mode=sub_mode, subw=subw, lmax=lmax,
                chan_l2=chan_l2, max_sym=dec_max_sym, spec=spec_t)
            return acc + rows.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    measure("full", full_chained, *dec_args)

    # --- per-channel chains ---------------------------------------------
    f1c = [jnp.take(f1j, sids_j[k], axis=0) for k in range(6)]
    sig = [jnp.where(types_j[sids_j[k]] == 2, 255, 256) for k in range(6)]
    sw = [subw if chan_l2[k] else 0 for k in range(6)]

    if del_mode == "run":
        @jax.jit
        def del_chained(k, rect, rlens_, f1r_, f1s_, f2_, sg_):
            def body(_, acc):
                r = rect ^ acc.astype(jnp.uint32)
                runs, lits, _, _ = run_chain_conveyor(
                    r, rlens_, f1r_, f1s_, f2_, sg_,
                    max_tokens=dec_max_tokens,
                    subw=max(sw[0], sw[1]), lmax=lmax, spec=sp[1])
                return acc + runs.sum() + lits.sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        measure("run_del", del_chained, rects_j[0], rlens_j,
                f1c[1], f1c[0], f2j, sig[0])

    @jax.jit
    def ins_chained(k, rect, rlens_, f1_, f2_, sg_):
        def body(_, acc):
            r = rect ^ acc.astype(jnp.uint32)
            syms, _, _ = plain_chain_conveyor(
                r, rlens_, f1_, f2_, sg_, max_len=dec_max_sym,
                subw=sw[2], lmax=lmax, spec=sp[2])
            return acc + syms.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    measure("plain_ins", ins_chained, rects_j[2], rlens_j,
            f1c[2], f2j, sig[2])

    # --- run expansion (XLA network) -------------------------------------
    if del_mode == "run" or sub_mode == "run":
        tpad = dec_max_tokens
        rng2 = np.random.default_rng(1)
        runs_np = np.zeros((n_decp, tpad), np.int32)
        lits_np = np.full((n_decp, tpad), -1, np.int32)
        for r in range(n_dec):
            tk = int(np.max(ntoks_t[r])) if len(ntoks_t) else tpad // 2
            tk = max(1, min(tk, tpad))
            rl = rng2.integers(0, 4, tk)
            runs_np[r, :tk] = rl
            lits_np[r, :tk] = rng2.integers(0, 51, tk)
        runs_j = jnp.asarray(runs_np)
        lits_j = jnp.asarray(lits_np)
        jax.block_until_ready([runs_j, lits_j])

        @jax.jit
        def exp_chained(k, runs_, lits_):
            def body(_, acc):
                r = runs_ + (acc & 0)
                rows = d2.expand_runs2(r, lits_, jnp.int32(110),
                                       max_len=dec_max_len)
                return acc + rows.astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        measure("expand", exp_chained, runs_j, lits_j)

    # --- tag route (prep + kernel) ---------------------------------------
    rng3 = np.random.default_rng(2)
    del_rows_np = rng3.integers(0, 40, (n_decp, dec_max_len)).astype(np.uint8)
    del_rows_j = jnp.asarray(del_rows_np)
    tag_bytes_j = jnp.asarray(rects[1])     # (N, max_len//4) u8
    dchar = jnp.uint8(coding.del_char & 0xFF)
    jax.block_until_ready([del_rows_j, tag_bytes_j])

    @jax.jit
    def tag_chained(k, dr_, tg_, rlens_):
        col = jax.lax.broadcasted_iota(jnp.int32, (n_decp, dec_max_len), 1)
        in_read = col < rlens_[:, None]

        def body(_, acc):
            dr = dr_ ^ acc.astype(jnp.uint8)
            keep = in_read & (dr != dchar)
            rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
            state = ((jnp.maximum(rank, 0) << 2)
                     | (keep.astype(jnp.int32) << 1)
                     | in_read.astype(jnp.int32))
            tb4 = tg_.shape[1] // 4
            b = tg_[:, :4 * tb4].reshape(n_decp, tb4, 4).astype(jnp.uint32)
            tw = (b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16)
                  | (b[:, :, 3] << 24))
            rows = tag_route_rows(tw, state, max_len=dec_max_len)
            return acc + rows.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    measure("tag", tag_chained, del_rows_j, tag_bytes_j, rlens_j)

    print("ABLATE: " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
