"""Presorted-input advantage (sorter._presorted_merge).

Reference analog: lsb_sort.rs:62-83 re-counts per pass and skips
newly-sorted levels; benches/struct_sort.rs:43-127 benches 90%-presorted
inputs.  Here the histogram pass reports the longest sorted prefix and
the sorter sorts only the suffix, then bitonic-merges the halves.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import rdst_tpu as rt
from rdst_tpu import config
from rdst_tpu.ops.histogram import multi_level_histogram
from rdst_tpu.ops.merge import merge_sorted


@pytest.fixture(autouse=True)
def _engage(monkeypatch):
    # engage the path at test-friendly sizes, through the device flow
    monkeypatch.setattr(config, "presorted_merge_min", 4096)
    monkeypatch.setattr(config, "host_sort_max", 0)


def _presorted(rng, n, frac, dtype=np.uint32):
    """frac-presorted in the struct_sort.rs sense: sorted prefix + random
    tail."""
    hi = np.iinfo(dtype).max if np.issubdtype(dtype, np.integer) else None
    if hi is not None:
        x = rng.integers(0, hi, size=n, dtype=np.uint64).astype(dtype)
    else:
        x = rng.standard_normal(n).astype(dtype)
    cut = int(n * frac)
    x[:cut] = np.sort(x[:cut])
    return x


def test_sorted_prefix_reported(rng):
    x = _presorted(rng, 50_000, 0.9)
    hist = multi_level_histogram([jnp.asarray(x)], 4)
    want = 45_000
    # the prefix ends within a few elements of the cut (the first tail
    # element may happen to extend it)
    assert want <= hist.sorted_prefix <= want + 64
    y = np.sort(x)
    hist2 = multi_level_histogram([jnp.asarray(y)], 4)
    assert hist2.sorted_prefix == 50_000


@pytest.mark.parametrize("frac", [0.9, 0.6])
@pytest.mark.parametrize("n", [40_000, 32_768])
def test_presorted_unstable(rng, frac, n):
    x = _presorted(rng, n, frac)
    with config.work_profiles(True):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got = rt.radix_sort_unstable(x)
    assert "PresortedMerge" in buf.getvalue()
    np.testing.assert_array_equal(got, np.sort(x))


def test_presorted_stable_with_payload(rng):
    n = 30_000
    k = _presorted(rng, n, 0.9, np.uint32) % 997  # heavy ties
    k[: int(n * 0.9)] = np.sort(k[: int(n * 0.9)])
    v = np.arange(n, dtype=np.uint32)
    ks, vs = rt.sort_key_value(k, v, stable=True)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(ks, k[order])
    np.testing.assert_array_equal(vs, v[order])


def test_presorted_f64(rng):
    x = _presorted(rng, 20_000, 0.8, np.float64)
    got = rt.radix_sort_unstable(x)
    np.testing.assert_array_equal(
        got.view(np.uint64), np.sort(x).view(np.uint64)
    )


def test_presorted_u64_multiword(rng):
    x = rng.integers(0, 2**63, size=24_576, dtype=np.uint64)
    x[:20_000] = np.sort(x[:20_000])
    got = rt.radix_sort_unstable(x)
    np.testing.assert_array_equal(got, np.sort(x))


def test_not_engaged_below_half(rng):
    """A 30% prefix must take the normal plan (and still sort right)."""
    x = _presorted(rng, 32_768, 0.3)
    with config.work_profiles(True):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got = rt.radix_sort_unstable(x)
    assert "PresortedMerge" not in buf.getvalue()
    np.testing.assert_array_equal(got, np.sort(x))


def test_descending_input_not_engaged(rng):
    x = np.sort(
        rng.integers(0, 2**32, size=16_384, dtype=np.int64).astype(
            np.uint32
        )
    )[::-1].copy()
    got = rt.radix_sort_unstable(x)
    np.testing.assert_array_equal(got, np.sort(x))


# ---- unequal-length merge_sorted ----

@pytest.mark.parametrize("la,lb", [(3 * 1024, 1024), (7 * 512, 512),
                                   (1024, 3 * 1024)])
def test_merge_sorted_unequal(rng, la, lb):
    a = np.sort(rng.integers(0, 2**32, size=la, dtype=np.int64)
                .astype(np.uint32))
    b = np.sort(rng.integers(0, 2**32, size=lb, dtype=np.int64)
                .astype(np.uint32))
    out = merge_sorted([jnp.asarray(a)], [jnp.asarray(b)], 1)
    np.testing.assert_array_equal(
        np.asarray(out[0]), np.sort(np.concatenate([a, b]))
    )


def test_merge_sorted_unequal_stable_ties(rng):
    la, lb = 3 * 1024, 1024
    a = np.sort(rng.integers(0, 8, size=la, dtype=np.int64)
                .astype(np.uint32))
    b = np.sort(rng.integers(0, 8, size=lb, dtype=np.int64)
                .astype(np.uint32))
    pa = np.arange(la, dtype=np.uint32)
    pb = np.arange(lb, dtype=np.uint32) + la
    out = merge_sorted(
        [jnp.asarray(a), jnp.asarray(pa)],
        [jnp.asarray(b), jnp.asarray(pb)],
        1,
        stable=True,
    )
    keys = np.concatenate([a, b])
    pays = np.concatenate([pa, pb])
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out[0]), keys[order])
    np.testing.assert_array_equal(np.asarray(out[1]), pays[order])
