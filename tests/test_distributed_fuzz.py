"""Randomized property check of the distributed shuffle.

Sweeps random (distribution, plane count, payload, stability, mesh)
combinations and asserts the full contract every time: counts sum to n,
no silent loss (overflow raises), dense output bitwise equal to the
numpy lexsort oracle, stable payload order when requested.  Distinct
plane-count/mesh/stable combos are bounded so jit compiles stay cheap.
"""
import numpy as np
import pytest

from rdst_tpu.parallel import (
    distributed_sort_auto,
    gather_valid,
    make_mesh,
    make_mesh_2d,
)

N = 1 << 11
D = 8


def _gen_plane(rng, kind):
    if kind == 0:  # uniform
        return rng.integers(0, 2**32, N).astype(np.uint32)
    if kind == 1:  # constant
        return np.full(N, rng.integers(0, 2**32), dtype=np.uint32)
    if kind == 2:  # low entropy
        return rng.integers(0, 16, N).astype(np.uint32)
    if kind == 3:  # zipf-ish
        return np.minimum(rng.zipf(1.3, N), 1 << 20).astype(np.uint32)
    # blocks: sorted runs of a few values
    v = rng.integers(0, 2**32, 8).astype(np.uint32)
    return np.repeat(v, N // 8)


@pytest.mark.parametrize("case", range(10))
def test_distributed_sort_random(case):
    rng = np.random.default_rng(1000 + case)
    n_words = int(rng.integers(1, 4))
    words = [_gen_plane(rng, int(rng.integers(0, 5))) for _ in
             range(n_words)]
    stable = bool(rng.integers(0, 2))
    with_pay = bool(rng.integers(0, 2)) or stable
    pay = [np.arange(N, dtype=np.uint32)] if with_pay else []
    mesh_kind = case % 3
    if mesh_kind == 0:
        mesh, axis = make_mesh(D), "shard"
    elif mesh_kind == 1:
        m = make_mesh_2d(2, 4)
        mesh, axis = m, m.axis_names
    else:
        m = make_mesh_2d(4, 2)
        mesh, axis = m, m.axis_names

    out_w, out_p, counts = distributed_sort_auto(
        words, pay, mesh=mesh, axis=axis, stable=stable,
        capacity_factor=1.5,
    )
    assert int(np.asarray(counts).sum()) == N
    dense = gather_valid(list(out_w) + list(out_p), counts)
    keys = [np.asarray(w) for w in words]
    if stable and with_pay:
        # unique payload tiebreak == the stable permutation
        order = np.lexsort(tuple([pay[0]] + keys[::-1]))
        for got, src in zip(dense, keys + pay):
            np.testing.assert_array_equal(got, src[order])
    elif with_pay:
        # unstable: keys exact; (key, payload) pairing preserved as a
        # multiset (equal keys may permute their payloads)
        order = np.lexsort(tuple(keys[::-1]))
        for got, src in zip(dense[:n_words], keys):
            np.testing.assert_array_equal(got, src[order])
        got_rows = np.lexsort(tuple([dense[-1]] + dense[:n_words][::-1]))
        src_rows = np.lexsort(tuple([pay[0]] + keys[::-1]))
        for got, src in zip(dense, keys + pay):
            np.testing.assert_array_equal(got[got_rows], src[src_rows])
    else:
        order = np.lexsort(tuple(keys[::-1]))
        for got, src in zip(dense, keys):
            np.testing.assert_array_equal(got, src[order])
