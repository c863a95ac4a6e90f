"""Tag-route Pallas kernel vs the XLA routing-network formulation.

Both reconstruct the delTag channel (Unpack_Tag, QV.c:824-847): the r-th
packed 2-bit symbol lands at the r-th kept position, 'n' at in-read
holes, 0 beyond the read.
"""

import numpy as np
import jax.numpy as jnp

from dextractor_tpu.ops.tag_pallas import tag_route_rows


def _xla_reference(tag_bytes, keep, in_read, max_len):
    """NumPy model of the decode2 CPU tag section."""
    n = keep.shape[0]
    out = np.zeros((n, max_len), np.uint8)
    letters = np.frombuffer(b"acgt", np.uint8)
    for i in range(n):
        codes = ((tag_bytes[i][:, None] >> np.array([6, 4, 2, 0])) & 3
                 ).reshape(-1)
        r = 0
        for c in range(max_len):
            if not in_read[i, c]:
                continue
            if keep[i, c]:
                out[i, c] = letters[codes[r]]
                r += 1
            else:
                out[i, c] = ord("n")
    return out


def test_tag_route_matches_reference():
    rng = np.random.default_rng(17)
    n, max_len = 70, 256                  # > ROWS to cover row padding
    rlens = rng.integers(0, max_len + 1, n)
    rlens[0] = 0
    rlens[1] = max_len
    col = np.arange(max_len)[None, :]
    in_read = col < rlens[:, None]
    keep = in_read & (rng.random((n, max_len)) < 0.8)
    keep[2, : rlens[2]] = True            # all kept
    keep[3] = False                       # none kept
    tb = max_len // 4
    tag_bytes = rng.integers(0, 256, (n, tb)).astype(np.uint8)

    exp = _xla_reference(tag_bytes, keep, in_read, max_len)

    rank = np.cumsum(keep, axis=1) - 1
    state = ((np.maximum(rank, 0).astype(np.int32) << 2)
             | (keep.astype(np.int32) << 1) | in_read.astype(np.int32))
    b = tag_bytes.reshape(n, tb // 4, 4).astype(np.uint32)
    tag_words = (b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16)
                 | (b[:, :, 3] << 24))
    got = np.asarray(tag_route_rows(
        jnp.asarray(tag_words), jnp.asarray(state), max_len=max_len,
        interpret=True))
    assert (got == exp).all()
