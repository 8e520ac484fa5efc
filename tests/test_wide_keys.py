"""128-bit and half-precision keys (reference: u128/i128 impls,
radix_key_impl.rs:39-46, 123-130 — 16 byte levels)."""
import numpy as np
import pytest

import rdst_tpu as rt
from rdst_tpu import keys as rkeys


def test_u128_composite_sort(rng):
    """u128 = composite (hi u64, lo u64): 16 levels, lexicographic."""
    n = 5_000
    hi = rng.integers(0, 2**64, n, dtype=np.uint64)
    lo = rng.integers(0, 2**64, n, dtype=np.uint64)
    nk = rkeys.normalize((hi, lo))
    assert nk.n_bytes == 16
    assert nk.n_words == 4
    (shi, slo) = rt.radix_sort_unstable((hi, lo))
    big = [(int(h) << 64) | int(l) for h, l in zip(hi, lo)]
    order = np.argsort(np.array(big, dtype=object), kind="stable")
    np.testing.assert_array_equal(shi, hi[order])
    np.testing.assert_array_equal(slo, lo[order])


def test_i128_composite_sort(rng):
    """i128 = composite (hi i64, lo u64): sign bias on the high half only
    (radix_key_impl.rs:123-130)."""
    n = 3_000
    hi = rng.integers(-2**63, 2**63 - 1, n, dtype=np.int64)
    lo = rng.integers(0, 2**64, n, dtype=np.uint64)
    (shi, slo) = rt.radix_sort_unstable((hi, lo))
    big = [(int(h) << 64) | int(l) for h, l in zip(hi, lo)]
    order = np.argsort(np.array(big, dtype=object), kind="stable")
    np.testing.assert_array_equal(shi, hi[order])
    np.testing.assert_array_equal(slo, lo[order])


@pytest.mark.parametrize("dtype", ["float16"])
def test_half_precision(dtype, rng):
    x = rng.standard_normal(2_000).astype(dtype)
    x[:4] = [np.nan, -np.inf, np.inf, -0.0]
    got = rt.radix_sort_unstable(x)
    nk = rkeys.normalize(x)
    order = np.argsort(np.asarray(nk.words[0]), kind="stable")
    want = x[order]
    np.testing.assert_array_equal(
        got.view(np.uint16), want.view(np.uint16)
    )


def test_byte_array_16_wide(rng):
    """[u8; 16] keys — the reference's widest fixed array pattern."""
    x = rng.integers(0, 256, size=(1_000, 16), dtype=np.uint8)
    got = rt.radix_sort_unstable(x)
    rows = sorted(map(tuple, x.tolist()))
    assert list(map(tuple, got.tolist())) == rows
