"""Native host runtime tests (C++ librdst_host.so via ctypes)."""
import numpy as np
import pytest

from rdst_tpu.native import host


def test_native_builds():
    assert host.available(), "native library failed to build"


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_host_radix_sort(dtype, rng):
    x = rng.integers(0, np.iinfo(dtype).max, size=1_000_000,
                     endpoint=True, dtype=dtype)
    want = np.sort(x)
    got, _ = host.host_radix_sort(x.copy())
    np.testing.assert_array_equal(got, want)


def test_host_radix_sort_stable_pairs(rng):
    k = rng.integers(0, 16, size=200_000, dtype=np.uint32)
    v = np.arange(200_000, dtype=np.uint32)
    order = np.argsort(k, kind="stable")
    gk, gv = host.host_radix_sort(k.copy(), v.copy())
    np.testing.assert_array_equal(gk, k[order])
    np.testing.assert_array_equal(gv, v[order])


def test_host_radix_sort_presorted(rng):
    x = np.sort(rng.integers(0, 2**64, size=100_000, dtype=np.uint64))
    got, _ = host.host_radix_sort(x.copy())
    np.testing.assert_array_equal(got, x)


def test_host_histogram(rng):
    x = rng.integers(0, 2**32, size=100_000, dtype=np.uint32)
    for lvl in range(4):
        want = np.bincount((x >> np.uint32(lvl * 8)) & 0xFF, minlength=256)
        got = host.host_histogram(x, lvl)
        np.testing.assert_array_equal(got, want)
