"""In-VMEM Pallas pack kernel == the XLA pack_words reference."""

import numpy as np
import jax
import jax.numpy as jnp

from dextractor_tpu.ops import bitstream_jax as bj
from dextractor_tpu.ops.pack_pallas import pack_words_pallas


def _rand_emissions(rng, n_rows, m):
    """Random (v, n) planes with realistic width mix incl. zero slots."""
    n = rng.integers(0, 33, (n_rows, m)).astype(np.int32)
    n[rng.random((n_rows, m)) < 0.4] = 0
    # values must fit their widths (encoder invariants)
    v = rng.integers(0, 1 << 31, (n_rows, m), dtype=np.int64)
    v = (v & ((1 << np.minimum(n, 31)) - 1)).astype(np.uint32)
    v = np.where(n == 32, rng.integers(0, 1 << 32, (n_rows, m),
                                       dtype=np.uint64).astype(np.uint32), v)
    v = np.where(n == 0, 0, v)
    return v, n


def test_pack_pallas_matches_pack_words():
    rng = np.random.default_rng(5)
    for m in (17, 128, 513):
        v, n = _rand_emissions(rng, 11, m)
        ref = np.asarray(bj.pack_words(jnp.asarray(v), jnp.asarray(n)))
        got = np.asarray(pack_words_pallas(
            jnp.asarray(v.view(np.int32)), jnp.asarray(n), interpret=True))
        assert got.shape == ref.shape
        assert (got == ref).all(), f"mismatch at m={m}"


def test_pack_pallas_empty_rows():
    v = np.zeros((9, 64), np.int32)
    n = np.zeros((9, 64), np.int32)
    got = np.asarray(pack_words_pallas(jnp.asarray(v), jnp.asarray(n),
                                       interpret=True))
    assert (got == 0).all()


def test_pack_pallas_under_vmap():
    rng = np.random.default_rng(9)
    v0, n0 = _rand_emissions(rng, 6, 100)
    v1, n1 = _rand_emissions(rng, 6, 100)
    v = jnp.asarray(np.stack([v0, v1]).view(np.int32))
    n = jnp.asarray(np.stack([n0, n1]))
    got = jax.vmap(lambda a, b: pack_words_pallas(a, b, interpret=True))(v, n)
    ref = jax.vmap(bj.pack_words)(v.astype(jnp.uint32), n)
    assert (np.asarray(got) == np.asarray(ref)).all()
