"""Columnar table engine tests: sort_by / filter / group_aggregate / join.

Covers BASELINE configs 3 (composite struct keys) and the operator set of
config 5 (aggregate + filter pipeline), single-host.
"""
import numpy as np
import pytest

from rdst_tpu.table import Table


@pytest.fixture()
def people(rng):
    n = 20_000
    return (
        Table(
            {
                "grp": rng.integers(0, 100, n).astype(np.uint16),
                "score": rng.standard_normal(n).astype(np.float32),
                "weight": rng.integers(0, 1000, n).astype(np.uint32),
                "id": np.arange(n, dtype=np.uint32),
            }
        ),
        n,
    )


def test_sort_by_single(people):
    t, n = people
    s = t.sort_by("grp")
    g = np.asarray(s["grp"])
    assert np.all(g[1:] >= g[:-1])
    # stable: ids within equal grp keep original order
    grp0 = np.asarray(t["grp"])
    order = np.argsort(grp0, kind="stable")
    np.testing.assert_array_equal(np.asarray(s["id"]), np.asarray(t["id"])[order])


def test_sort_by_composite_struct_key(people):
    """struct_sort-equivalent: (grp u16, score f32) composite key
    (reference: benches/struct_sort.rs — 16-byte struct, f32 key)."""
    t, n = people
    s = t.sort_by(["grp", "score"])
    g = np.asarray(s["grp"])
    sc = np.asarray(s["score"])
    grp0, sc0 = np.asarray(t["grp"]), np.asarray(t["score"])
    from rdst_tpu import keys as rk

    sckey = np.asarray(rk.normalize(sc0).words[0])
    order = np.lexsort((np.arange(n), sckey, grp0))
    np.testing.assert_array_equal(g, grp0[order])
    np.testing.assert_array_equal(
        sc.view(np.uint32), sc0[order].view(np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(s["id"]), np.asarray(t["id"])[order]
    )


def test_filter(people):
    t, n = people
    mask = np.asarray(t["weight"]) > 500
    ft, count = t.filter(mask)
    c = int(count)
    assert c == mask.sum()
    kept_ids = np.asarray(ft["id"])[:c]
    np.testing.assert_array_equal(
        kept_ids, np.asarray(t["id"])[mask]
    )  # stable packing


def test_group_aggregate(people):
    t, n = people
    out, count = t.group_aggregate(
        "grp",
        {
            "total": ("weight", "sum"),
            "cnt": ("weight", "count"),
            "avg": ("weight", "mean"),
            "wmin": ("weight", "min"),
            "wmax": ("weight", "max"),
        },
    )
    g = int(count)
    grp0 = np.asarray(t["grp"])
    w0 = np.asarray(t["weight"]).astype(np.float64)
    keys = np.unique(grp0)
    assert g == len(keys)
    got_g = np.asarray(out["grp"])[:g]
    np.testing.assert_array_equal(got_g, keys)
    for i, k in enumerate(keys):
        sel = w0[grp0 == k]
        assert abs(float(np.asarray(out["total"])[i]) - sel.sum()) < 1.0
        assert int(np.asarray(out["cnt"])[i]) == len(sel)
        assert abs(float(np.asarray(out["avg"])[i]) - sel.mean()) < 1e-2
        assert float(np.asarray(out["wmin"])[i]) == sel.min()
        assert float(np.asarray(out["wmax"])[i]) == sel.max()


def test_join_inner(rng):
    nl, nr = 10_000, 500
    right = Table(
        {
            "k": rng.permutation(2_000)[:nr].astype(np.uint32),
            "label": rng.integers(0, 1000, nr).astype(np.uint32),
        }
    )
    left = Table(
        {
            "k": rng.integers(0, 2_000, nl).astype(np.uint32),
            "x": np.arange(nl, dtype=np.uint32),
        }
    )
    joined, count = left.join(right, on="k")
    c = int(count)
    rk = np.asarray(right["k"])
    rl = np.asarray(right["label"])
    lk = np.asarray(left["k"])
    lut = dict(zip(rk.tolist(), rl.tolist()))
    want_rows = [(k, x, lut[k]) for k, x in zip(lk, np.asarray(left["x"])) if k in lut]
    assert c == len(want_rows)
    gk = np.asarray(joined["k"])[:c]
    gx = np.asarray(joined["x"])[:c]
    gl = np.asarray(joined["label"])[:c]
    got_rows = list(zip(gk.tolist(), gx.tolist(), gl.tolist()))
    # stable order: left order preserved among matches
    assert got_rows == want_rows


def test_group_aggregate_single_group(rng):
    t = Table({"g": np.zeros(1000, np.uint8),
               "v": np.arange(1000, dtype=np.uint32)})
    out, count = t.group_aggregate("g", {"s": ("v", "sum")})
    assert int(count) == 1
    assert float(np.asarray(out["s"])[0]) == 1000 * 999 / 2


def test_join_inner_duplicate_right_keys(rng):
    """Duplicate right keys EXPAND: one output row per match pair."""
    right = Table(
        {
            "k": np.array([1, 1, 2, 5, 5, 5], np.uint32),
            "label": np.array([10, 11, 20, 50, 51, 52], np.uint32),
        }
    )
    left = Table(
        {
            "k": np.array([5, 1, 3, 2, 5], np.uint32),
            "x": np.arange(5, dtype=np.uint32),
        }
    )
    joined, count = left.join(right, on="k")
    c = int(count)
    assert c == 3 + 2 + 1 + 3  # 5->3 matches, 1->2, 2->1, 5->3
    got = list(zip(np.asarray(joined["k"]).tolist(),
                   np.asarray(joined["x"]).tolist(),
                   np.asarray(joined["label"]).tolist()))
    want = [(5, 0, 50), (5, 0, 51), (5, 0, 52),
            (1, 1, 10), (1, 1, 11),
            (2, 3, 20),
            (5, 4, 50), (5, 4, 51), (5, 4, 52)]
    assert got == want


def test_join_left_duplicate_right_first_match(rng):
    right = Table({"k": np.array([7, 7], np.uint32),
                   "v": np.array([1, 2], np.uint32)})
    left = Table({"k": np.array([7, 8], np.uint32),
                  "x": np.array([0, 1], np.uint32)})
    joined, count = left.join(right, on="k", how="left")
    assert int(count) == 1
    assert np.asarray(joined["v"]).tolist()[0] == 1  # first match
    assert np.asarray(joined["_matched"]).tolist() == [True, False]


def test_join_wide_composite_key(rng):
    """Composite key wider than 64 bits (u64 + u32 = 96 bits)."""
    n = 2000
    hi = rng.integers(0, 2**63, n).astype(np.uint64)
    lo2 = rng.integers(0, 2**32, n, dtype=np.int64).astype(np.uint32)
    right = Table({"a": hi[:500], "b": lo2[:500],
                   "lab": np.arange(500, dtype=np.uint32)})
    left = Table({"a": hi, "b": lo2, "x": np.arange(n, dtype=np.uint32)})
    joined, count = left.join(right, on=["a", "b"])
    c = int(count)
    assert c == 500  # keys unique, first 500 rows match themselves
    assert sorted(np.asarray(joined["lab"]).tolist()) == list(range(500))
    # matched left rows are exactly x < 500
    assert sorted(np.asarray(joined["x"]).tolist()) == list(range(500))


def test_join_inner_no_matches():
    right = Table({"k": np.array([100], np.uint32),
                   "v": np.array([1], np.uint32)})
    left = Table({"k": np.array([1, 2, 3], np.uint32),
                  "x": np.array([0, 1, 2], np.uint32)})
    joined, count = left.join(right, on="k")
    assert int(count) == 0 and joined.n_rows == 0
