"""Chip byte-verification of the bench encode step (qv_encode_step +
assemble_from_step) against the host encoder, at bench shapes with the
real run_on routing flags.  The bench metric times this exact program;
this proves its bytes (chip_probe validates the file path, which buckets
differently).

Run on the TPU host: python tools/step_verify.py [--mb 16]
One JSON line (prefix STEPV:).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))


def main():
    mb = 16
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--mb":
            mb = int(args[i + 1])

    import jax
    import jax.numpy as jnp
    import numpy as np
    platform = jax.devices()[0].platform
    env_keep = {k: os.environ.get(k)
                for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS",
                          "XLA_FLAGS")}
    from conftest import make_quiva
    for k, v in env_keep.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v

    from dextractor_tpu.formats.quiva import parse_quiva
    from dextractor_tpu.formats.ragged import pad_rows, bucket_rows
    from dextractor_tpu.codecs.qv_codec import (
        scan_quiva, create_qvcoding, assemble_from_step,
        encode_quiva_to_dexqv)
    from dextractor_tpu.ops import bitstream_jax as bj
    from dextractor_tpu.ops.twobit import NUMBER_BASE_LUT
    from dextractor_tpu.parallel import qv_encode_step, null_run_luts

    read_len = 2000
    n_reads = max(8, (mb * 1_000_000) // (5 * read_len))
    rng = np.random.default_rng(0)
    data = make_quiva(rng, n_reads=n_reads, min_len=read_len - 50,
                      max_len=read_len + 50)
    enc_host = encode_quiva_to_dexqv(data, device=False)

    q = parse_quiva(data)
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
    sym = np.stack([bj.scheme_luts(coding.del_scheme),
                    bj.scheme_luts(coding.ins_scheme),
                    bj.scheme_luts(coding.mrg_scheme),
                    bj.scheme_luts(coding.sub_scheme)])
    run = np.stack([
        bj.scheme_luts(coding.drun_scheme, run=True)
        if coding.drun_scheme else null_run_luts(),
        null_run_luts(), null_run_luts(),
        bj.scheme_luts(coding.srun_scheme, run=True)
        if coding.srun_scheme else null_run_luts()])
    rchars = np.array([coding.del_char, -1, -1, coding.sub_char], np.int32)
    run_on = (coding.drun_scheme is not None, coding.srun_scheme is not None)
    from bench import _run_tokens_of
    run_tokens = _run_tokens_of(streams, lengths, coding, run_on)

    out = qv_encode_step(
        jnp.asarray(streams), jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(sym), jnp.asarray(run), jnp.asarray(rchars),
        jnp.asarray(NUMBER_BASE_LUT), run_on=run_on, run_tokens=run_tokens)
    ours = assemble_from_step(out, coding, q.wells, q.begs, q.ends, q.qvs,
                              q.n_entries)
    res = {"platform": platform, "mb": mb, "run_on": list(run_on),
           "run_tokens": run_tokens, "step_bytes_ok": ours == enc_host}
    print("STEPV: " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
