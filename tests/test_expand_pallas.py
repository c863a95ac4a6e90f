"""expand_runs_pallas vs the XLA expand_runs2 network (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from dextractor_tpu.ops.decode2 import expand_runs2
from dextractor_tpu.ops.expand_pallas import expand_runs_pallas


def _tokens(rng, n, t, max_len, rchar):
    """Random (runs, lits) rows whose expansion fits max_len, with
    exhausted tails marked lits=-1 (the chain decoders' convention)."""
    runs = np.zeros((n, t), np.int32)
    lits = np.full((n, t), -1, np.int32)
    for i in range(n):
        pos = 0
        for k in range(t):
            r = int(rng.integers(0, 5))
            if pos + r + 1 > max_len:
                break
            runs[i, k] = r
            lits[i, k] = int(rng.integers(0, 256))
            while lits[i, k] == rchar:
                lits[i, k] = int(rng.integers(0, 256))
            pos += r + 1
    return runs, lits


@pytest.mark.parametrize("n,t,max_len", [(8, 16, 64), (10, 40, 128),
                                         (8, 100, 384)])
def test_expand_pallas_matches_xla(n, t, max_len):
    rng = np.random.default_rng(n * 1000 + t)
    rchar = 77
    runs, lits = _tokens(rng, n, t, max_len, rchar)
    exp = np.asarray(expand_runs2(jnp.asarray(runs), jnp.asarray(lits),
                                  rchar, max_len=max_len))
    got = np.asarray(expand_runs_pallas(jnp.asarray(runs), jnp.asarray(lits),
                                        rchar, max_len=max_len,
                                        interpret=True))
    np.testing.assert_array_equal(got, exp)


def test_expand_pallas_edges():
    rchar = 3
    # all-dead rows, single literal, run filling the whole row
    runs = np.array([[0, 0], [0, 0], [5, 0]], np.int32)
    lits = np.array([[-1, -1], [9, -1], [4, -1]], np.int32)
    exp = np.asarray(expand_runs2(jnp.asarray(runs), jnp.asarray(lits),
                                  rchar, max_len=8))
    got = np.asarray(expand_runs_pallas(jnp.asarray(runs), jnp.asarray(lits),
                                        rchar, max_len=8, interpret=True))
    np.testing.assert_array_equal(got, exp)
