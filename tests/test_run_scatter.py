"""scatter_runs / run_transpose: the Pallas run-granular scatter primitive
(mt_lsb_sort.rs:40-133's private-range write; measured near-bandwidth in
scripts/probe12.py P2). CPU tests run the interpret-equivalent path."""
import numpy as np

import jax.numpy as jnp

from rdst_tpu.ops.run_scatter import run_transpose, scatter_runs


def test_run_transpose_roundtrip(rng):
    n, tile, run = 1 << 15, 1 << 12, 512
    x = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64)
                    .astype(np.uint32))
    got = np.asarray(run_transpose(x, tile_elems=tile, run_elems=run))
    want = (np.asarray(x).reshape(n // tile, tile // run, run)
            .transpose(1, 0, 2).reshape(-1))
    np.testing.assert_array_equal(got, want)


def test_scatter_runs_arbitrary_offsets(rng):
    n, tile, run = 1 << 14, 1 << 11, 256
    x = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.int64)
                    .astype(np.uint32))
    n_runs = n // run
    perm = rng.permutation(n_runs)
    row_off = (perm * (run // 128)).astype(np.int32)
    got = np.asarray(scatter_runs(
        x, jnp.asarray(row_off), tile_elems=tile, run_elems=run
    ))
    want = np.zeros(n, np.uint32)
    xs = np.asarray(x).reshape(n_runs, run)
    for i in range(n_runs):
        want[perm[i] * run : (perm[i] + 1) * run] = xs[i]
    np.testing.assert_array_equal(got, want)


def test_scatter_runs_validates_geometry():
    import pytest

    x = jnp.zeros(1024, jnp.uint32)
    with pytest.raises(ValueError):
        scatter_runs(x, jnp.zeros(8, jnp.int32), tile_elems=512,
                     run_elems=96)
