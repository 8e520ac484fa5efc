"""Distributed table pipeline on the 8-device CPU mesh (BASELINE config 5:
shuffle sort + hash aggregate + filter over partitioned tables)."""
import numpy as np
import pytest

import jax

from rdst_tpu.parallel import make_mesh
from rdst_tpu.parallel.dtable import (
    distributed_filter,
    distributed_group_aggregate,
    distributed_join,
    distributed_sort_table,
)
from rdst_tpu.table import Table


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture()
def sales(rng):
    n = 1 << 14
    return Table(
        {
            "key": rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32),
            "grp": rng.integers(0, 64, n).astype(np.uint32),
            "qty": rng.integers(1, 50, n).astype(np.uint32),
            "id": np.arange(n, dtype=np.uint32),
        }
    ), n


def test_distributed_sort_table(mesh, sales):
    t, n = sales
    out, counts = distributed_sort_table(t, "key", mesh=mesh)
    cnts = np.asarray(counts)
    assert cnts.sum() == n
    D = cnts.shape[0]
    k = np.asarray(out["key"]).reshape(D, -1)
    ids = np.asarray(out["id"]).reshape(D, -1)
    dense_k = np.concatenate([k[d, : cnts[d]] for d in range(D)])
    dense_i = np.concatenate([ids[d, : cnts[d]] for d in range(D)])
    order = np.argsort(np.asarray(t["key"]), kind="stable")
    np.testing.assert_array_equal(dense_k, np.asarray(t["key"])[order])
    np.testing.assert_array_equal(dense_i, np.asarray(t["id"])[order])


def test_distributed_filter(mesh, sales):
    t, n = sales
    mask = np.asarray(t["qty"]) > 25
    out, counts = distributed_filter(t, mask, mesh=mesh)
    cnts = np.asarray(counts)
    assert cnts.sum() == mask.sum()
    # per-shard packing: kept rows of each shard appear first, in order
    D = cnts.shape[0]
    ids = np.asarray(out["id"]).reshape(D, -1)
    shard = n // D
    mask2 = mask.reshape(D, shard)
    src_ids = np.asarray(t["id"]).reshape(D, shard)
    for d in range(D):
        np.testing.assert_array_equal(
            ids[d, : cnts[d]], src_ids[d][mask2[d]]
        )


def test_distributed_group_aggregate(mesh, sales):
    t, n = sales
    out, n_groups = distributed_group_aggregate(
        t, "grp", {"total": ("qty", "sum"), "cnt": ("qty", "count")},
        mesh=mesh,
    )
    g = int(n_groups)
    grp0 = np.asarray(t["grp"])
    qty0 = np.asarray(t["qty"]).astype(np.float64)
    keys = np.unique(grp0)
    assert g == len(keys)
    np.testing.assert_array_equal(np.asarray(out["grp"])[:g], keys)
    for i, kk in enumerate(keys):
        sel = qty0[grp0 == kk]
        assert abs(float(np.asarray(out["total"])[i]) - sel.sum()) < 1.0
        assert int(np.asarray(out["cnt"])[i]) == len(sel)


def _pandasless_join_oracle(lk, lv, rk, rv):
    """Expected inner pk-fk join (left order preserved): rows of left whose
    key exists in right, with the right value attached."""
    lut = dict(zip(rk.tolist(), rv.tolist()))
    keep = np.array([k in lut for k in lk.tolist()])
    gathered = np.array([lut.get(k, 0) for k in lk.tolist()],
                        dtype=rv.dtype)
    return keep, gathered


def test_distributed_join_inner(mesh, rng):
    n, m = 1 << 13, 1 << 10
    lk = rng.integers(0, 2 * m, n).astype(np.uint32)
    # non-contiguous pk set: every device sees a MIX of matched and
    # unmatched left rows (catches per-piece packing bugs)
    rk = rng.choice(2 * m, size=m, replace=False).astype(np.uint32)
    left = Table({"key": lk, "lid": np.arange(n, dtype=np.uint32)})
    right = Table({"key": rk, "dim": (rk * 7 + 1).astype(np.uint32)})
    out, cnt = distributed_join(
        left, right, "key", mesh=mesh, right_capacity_factor=6.0
    )
    keep, gathered = _pandasless_join_oracle(
        lk, None, rk, np.asarray(right["dim"])
    )
    assert int(cnt) == int(keep.sum())
    assert out.n_rows == int(cnt)  # inner output is densely packed
    got = {
        (int(k), int(i), int(d))
        for k, i, d in zip(
            np.asarray(out["key"]),
            np.asarray(out["lid"]),
            np.asarray(out["dim"]),
        )
    }
    want = {
        (int(lk[i]), i, int(gathered[i]))
        for i in range(n)
        if keep[i]
    }
    assert got == want


def test_distributed_join_left(mesh, rng):
    n, m = 1 << 12, 1 << 9
    lk = rng.integers(0, 4 * m, n).astype(np.uint32)
    rk = rng.permutation(m).astype(np.uint32)
    left = Table({"key": lk, "lid": np.arange(n, dtype=np.uint32)})
    right = Table({"key": rk, "dim": (rk + 100).astype(np.uint32)})
    out, cnt = distributed_join(
        left, right, "key", mesh=mesh, how="left",
        right_capacity_factor=10.0,
    )
    keep, gathered = _pandasless_join_oracle(
        lk, None, rk, np.asarray(right["dim"])
    )
    assert int(cnt) == int(keep.sum())
    assert out.n_rows == n  # every left row appears exactly once
    got_by_lid = {}
    for k, i, d, mt in zip(
        np.asarray(out["key"]), np.asarray(out["lid"]),
        np.asarray(out["dim"]), np.asarray(out["_matched"]),
    ):
        got_by_lid[int(i)] = (int(k), int(d), bool(mt))
    for i in range(n):
        k, d, mt = got_by_lid[i]
        assert k == int(lk[i])
        assert mt == bool(keep[i])
        if keep[i]:
            assert d == int(gathered[i])


def test_distributed_join_hot_fk(mesh, rng):
    """Zipf-style fact table: 70% of fact rows reference ONE dimension
    key. Co-partitioning must still produce the exact join (atomic
    buckets keep the hot key's rows and its dimension row together)."""
    n, m = 1 << 13, 256
    hot = np.full(int(n * 0.7), 42, dtype=np.uint32)
    rest = rng.integers(0, m, n - len(hot)).astype(np.uint32)
    lk = np.concatenate([hot, rest])
    rng.shuffle(lk)
    rk = np.arange(m, dtype=np.uint32)
    left = Table({"key": lk, "lid": np.arange(n, dtype=np.uint32)})
    right = Table({"key": rk, "dim": (rk * 3).astype(np.uint32)})
    # the hot key stays atomic on one device (join-safe), so that device
    # holds ~70% of the fact rows — capacity must absorb it
    out, cnt = distributed_join(
        left, right, "key", mesh=mesh, capacity_factor=8.0,
        right_capacity_factor=8.0,
    )
    assert int(cnt) == n  # every key 0..m-1 exists in right
    np.testing.assert_array_equal(
        np.sort(np.asarray(out["lid"])), np.arange(n, dtype=np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(out["dim"]), np.asarray(out["key"]) * 3
    )


def test_distributed_sort_skew_16bit_split(mesh, rng):
    """Half the keys share a top BYTE: 16-bit bucketing must split them
    across devices (the SURVEY §7 skew-splitting requirement)."""
    n = 1 << 14
    hot = (np.uint32(0xAB) << np.uint32(24)) | rng.integers(
        0, 2**24, n // 2
    ).astype(np.uint32)
    rest = rng.integers(0, 2**32, size=n // 2, dtype=np.int64).astype(np.uint32)
    x = np.concatenate([hot, rest])
    rng.shuffle(x)
    t = Table({"key": x, "id": np.arange(n, dtype=np.uint32)})
    # capacity_factor 2.0 suffices BECAUSE the hot byte splits at 16 bits
    out, counts = distributed_sort_table(t, "key", mesh=mesh,
                                         capacity_factor=2.0)
    cnts = np.asarray(counts)
    assert cnts.sum() == n
    assert cnts.max() <= 2 * (n // 8)
    D = cnts.shape[0]
    k = np.asarray(out["key"]).reshape(D, -1)
    dense = np.concatenate([k[d, : cnts[d]] for d in range(D)])
    np.testing.assert_array_equal(dense, np.sort(x))


def test_distributed_aggregate_all_ops(mesh, rng):
    """Every agg op, checked against a numpy oracle."""
    n = 1 << 13
    t = Table(
        {
            "grp": rng.integers(0, 37, n).astype(np.uint32),
            "v": rng.standard_normal(n).astype(np.float32),
            "q": rng.integers(0, 100, n).astype(np.int32),
        }
    )
    out, n_groups = distributed_group_aggregate(
        t,
        "grp",
        {
            "s": ("q", "sum"),
            "c": ("q", "count"),
            "m": ("v", "mean"),
            "lo": ("v", "min"),
            "hi": ("v", "max"),
            "f": ("q", "first"),
            "l": ("q", "last"),
        },
        mesh=mesh,
    )
    g = int(n_groups)
    grp = np.asarray(t["grp"])
    keys = np.unique(grp)
    assert g == len(keys)
    np.testing.assert_array_equal(np.asarray(out["grp"])[:g], keys)
    q = np.asarray(t["q"]).astype(np.int64)
    v = np.asarray(t["v"]).astype(np.float64)
    for i, k in enumerate(keys):
        sel = grp == k
        assert int(np.asarray(out["s"])[i]) == q[sel].sum()
        assert int(np.asarray(out["c"])[i]) == sel.sum()
        assert abs(float(np.asarray(out["m"])[i]) - v[sel].mean()) < 1e-4
        assert float(np.asarray(out["lo"])[i]) == v[sel].min()
        assert float(np.asarray(out["hi"])[i]) == v[sel].max()
        assert int(np.asarray(out["f"])[i]) == q[sel][0]
        assert int(np.asarray(out["l"])[i]) == q[sel][-1]


def test_distributed_aggregate_boundary_spanning_groups(mesh, rng):
    """A single hot key dominates -> the shuffle rank-splits its bucket
    across devices and the boundary combine must reassemble one group
    row (the all_gather carry logic in _agg_body)."""
    n = 1 << 13
    grp = np.full(n, 7, dtype=np.uint32)
    grp[: n // 8] = rng.integers(0, 5, n // 8).astype(np.uint32)
    grp[-n // 8 :] = rng.integers(900, 905, n // 8).astype(np.uint32)
    rng.shuffle(grp)
    q = rng.integers(0, 1000, n).astype(np.uint32)
    t = Table({"grp": grp, "q": q})
    out, n_groups = distributed_group_aggregate(
        t,
        "grp",
        {"s": ("q", "sum"), "c": ("q", "count"), "mx": ("q", "max"),
         "lst": ("q", "last")},
        mesh=mesh,
        capacity_factor=2.5,
    )
    g = int(n_groups)
    keys = np.unique(grp)
    assert g == len(keys)
    np.testing.assert_array_equal(np.asarray(out["grp"])[:g], keys)
    # order rows by (grp, original position) to model 'last' on the
    # stable global sort
    for i, k in enumerate(keys):
        sel = grp == k
        assert int(np.asarray(out["s"])[i]) == int(q[sel].astype(np.int64).sum())
        assert int(np.asarray(out["c"])[i]) == int(sel.sum())
        assert int(np.asarray(out["mx"])[i]) == int(q[sel].max())
        assert int(np.asarray(out["lst"])[i]) == int(q[sel][-1])


def test_distributed_aggregate_all_equal_keys(mesh, rng):
    """Degenerate input: ONE group spanning every device."""
    n = 1 << 12
    t = Table(
        {
            "grp": np.full(n, 42, dtype=np.uint32),
            "q": rng.integers(0, 9, n).astype(np.uint32),
        }
    )
    out, n_groups = distributed_group_aggregate(
        t, "grp", {"s": ("q", "sum"), "c": ("q", "count")}, mesh=mesh,
        capacity_factor=2.5,
    )
    assert int(n_groups) == 1
    assert int(np.asarray(out["s"])[0]) == int(
        np.asarray(t["q"]).astype(np.int64).sum()
    )
    assert int(np.asarray(out["c"])[0]) == n


def test_distributed_join_duplicate_right_keys(mesh, rng):
    """Duplicate right keys expand in-mesh (join_capacity_factor sizes the
    per-device output buffer)."""
    n, m = 1 << 12, 1 << 9
    lk = rng.integers(0, 64, n).astype(np.uint32)
    rk = rng.integers(0, 64, m).astype(np.uint32)  # heavy duplicates
    left = Table({"key": lk, "lid": np.arange(n, dtype=np.uint32)})
    right = Table({"key": rk, "rid": np.arange(m, dtype=np.uint32)})
    out, cnt = distributed_join(
        left, right, "key", mesh=mesh,
        capacity_factor=6.0, right_capacity_factor=10.0,
        join_capacity_factor=40.0,
    )
    import collections
    lut = collections.defaultdict(list)
    for j, k in enumerate(rk):
        lut[int(k)].append(j)
    want = {(int(k), i, j) for i, k in enumerate(lk) for j in lut[int(k)]}
    got = {
        (int(k), int(i), int(j))
        for k, i, j in zip(np.asarray(out["key"]), np.asarray(out["lid"]),
                           np.asarray(out["rid"]))
    }
    assert int(cnt) == len(want) == out.n_rows
    assert got == want


def test_distributed_join_output_overflow_detected(mesh, rng):
    n, m = 1 << 12, 1 << 9
    lk = rng.integers(0, 8, n).astype(np.uint32)
    rk = rng.integers(0, 8, m).astype(np.uint32)  # ~64 matches per left row
    left = Table({"key": lk, "lid": np.arange(n, dtype=np.uint32)})
    right = Table({"key": rk, "rid": np.arange(m, dtype=np.uint32)})
    import pytest as _pytest
    with _pytest.raises(OverflowError, match="join_capacity_factor"):
        distributed_join(
            left, right, "key", mesh=mesh,
            capacity_factor=8.0, right_capacity_factor=10.0,
            join_capacity_factor=1.0,
        )


def test_hash_partitioned_aggregate(rng):
    """partition="hash" (BASELINE config 5's hash-partitioned tables):
    same aggregate results as range partitioning, group keys spread by
    hash rather than range."""
    from rdst_tpu.parallel import distributed_group_aggregate, make_mesh

    mesh = make_mesh(8)
    n = 1 << 12
    t = Table(
        {
            "grp": rng.integers(0, 37, n).astype(np.uint32),
            "qty": rng.integers(1, 9, n).astype(np.uint32),
        }
    )
    want, _ = distributed_group_aggregate(
        t, "grp", {"total": ("qty", "sum")}, mesh=mesh
    )
    got, n_groups = distributed_group_aggregate(
        t, "grp", {"total": ("qty", "sum")}, mesh=mesh, partition="hash"
    )
    assert int(n_groups) == len(np.unique(np.asarray(t["grp"])))
    wmap = dict(zip(np.asarray(want["grp"]).tolist(),
                    np.asarray(want["total"]).tolist()))
    gmap = dict(zip(np.asarray(got["grp"]).tolist(),
                    np.asarray(got["total"]).tolist()))
    assert wmap == gmap


def test_hash_partitioned_join_clustered_keys(rng):
    """Clustered distinct join keys concentrate in one range bucket
    (atomic co-partitioning); hash partitioning spreads them so the
    same join fits a modest capacity_factor."""
    from rdst_tpu.parallel import distributed_join, make_mesh

    mesh = make_mesh(8)
    n = 1 << 12
    # 64 distinct keys inside one narrow range window, against a huge
    # outlier spread that forces the adaptive window wide open
    keys = (np.uint32(1 << 30) + rng.integers(0, 64, n)).astype(np.uint32)
    keys[:8] = rng.integers(0, 1 << 30, 8).astype(np.uint32)  # outliers
    fact = Table(
        {"k": keys, "v": np.arange(n, dtype=np.uint32)}
    )
    dim = Table(
        {
            "k": (np.uint32(1 << 30) + np.arange(64)).astype(np.uint32),
            "w": (np.arange(64, dtype=np.uint32) * 5),
        }
    )
    # range partitioning concentrates the cluster -> needs big capacity
    with pytest.raises(OverflowError):
        distributed_join(
            fact, dim, "k", mesh=mesh, capacity_factor=1.2, how="inner"
        )
    joined, n_matched = distributed_join(
        fact, dim, "k", mesh=mesh, capacity_factor=1.2, how="inner",
        partition="hash",
    )
    assert int(n_matched) == n - 8 + int(
        np.isin(keys[:8], np.asarray(dim["k"])).sum()
    )
    np.testing.assert_array_equal(
        np.asarray(joined["w"]),
        (np.asarray(joined["k"]) - (1 << 30)) * 5,
    )
