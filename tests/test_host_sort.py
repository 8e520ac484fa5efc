"""Host-native fast path: small numpy sorts on the C++ runtime
(builder._try_host_sort -> native/rdst_host.cpp), semantics identical to
the device plans across dtypes, payload shapes, and stability."""
import numpy as np
import pytest

import rdst_tpu as rt
from rdst_tpu import config
from rdst_tpu import keys as rkeys


@pytest.fixture(autouse=True)
def _host_threshold(monkeypatch):
    monkeypatch.setattr(config, "host_sort_max", 1 << 20)


def _oracle_order(x):
    nk = rkeys.normalize(np.ascontiguousarray(x))
    w = [np.asarray(ww).astype(np.uint64) for ww in nk.words]
    key = w[0] if len(w) == 1 else (w[0] << np.uint64(32)) | w[1]
    return np.argsort(key, kind="stable")


@pytest.mark.parametrize("dtype", [
    "uint8", "uint16", "uint32", "uint64",
    "int8", "int16", "int32", "int64",
    "float16", "float32", "float64",
])
def test_host_sort_dtypes(dtype, rng):
    dt = np.dtype(dtype)
    n = 30_000
    if dt.kind == "u":
        x = rng.integers(0, np.iinfo(dt).max, n, dtype=np.uint64).astype(dt)
    elif dt.kind == "i":
        x = rng.integers(np.iinfo(dt).min, np.iinfo(dt).max, n,
                         dtype=np.int64).astype(dt)
    else:
        x = rng.standard_normal(n).astype(dt)
        x[::97] = np.nan
        x[1::97] = -np.float64(np.nan)
        x[2::97] = -0.0
        x[3::97] = np.inf
    got = rt.radix_sort_unstable(x)
    assert isinstance(got, np.ndarray) and got.dtype == dt
    want = x[_oracle_order(x)]
    u = f"u{dt.itemsize}"
    np.testing.assert_array_equal(got.view(u), want.view(u))
    # input must not be mutated (the host sort works on a copy)
    assert not np.array_equal(np.sort(x.view(u)), x.view(u)) or n < 3


def test_host_sort_payload_variants(rng):
    n = 20_000
    k = rng.integers(0, 50, n).astype(np.uint32)
    order = np.argsort(k, kind="stable")
    v32 = rng.standard_normal(n).astype(np.float32)
    ks, (a,) = rt.radix_sort_builder(k, [v32]).with_stable(True).sort()
    np.testing.assert_array_equal(a, v32[order])
    v16 = rng.integers(0, 2**16, n).astype(np.uint16)
    ks, (a, b) = rt.radix_sort_builder(k, [v32, v16]).with_stable(True).sort()
    np.testing.assert_array_equal(a, v32[order])
    np.testing.assert_array_equal(b, v16[order])


def test_host_path_not_taken_when_forced(rng, monkeypatch):
    """Forcing an Algorithm must run the device plan (host path skipped)."""
    calls = []
    from rdst_tpu.native import host as h

    orig = h.host_radix_sort
    monkeypatch.setattr(h, "host_radix_sort",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    x = rng.integers(0, 2**32, 10_000, dtype=np.int64).astype(np.uint32)
    got = rt.radix_sort_builder(x).with_algorithm(
        rt.Algorithm.COMPARATIVE).sort()
    np.testing.assert_array_equal(got, np.sort(x))
    assert not calls
    # default tuner at the same size takes the host path
    got2 = rt.radix_sort_unstable(x)
    np.testing.assert_array_equal(got2, np.sort(x))
    assert calls


def test_stable_argsort_host_path(rng, monkeypatch):
    """Stable argsort of a small numpy single-key input rides the host
    fast path (advisor r4 item 2): the host LSD radix is stable, so
    key + iota payload IS the stable permutation — verified by making
    the device path unreachable."""
    import rdst_tpu.builder as b

    def boom(*a, **k):
        raise AssertionError("device path taken for small numpy argsort")

    monkeypatch.setattr(b.Sorter, "run", boom)
    for dtype in (np.uint32, np.int64, np.float64):
        x = rng.integers(0, 50, 4096).astype(dtype)
        got = rt.argsort(x, stable=True)
        np.testing.assert_array_equal(got, np.argsort(x, kind="stable"))
