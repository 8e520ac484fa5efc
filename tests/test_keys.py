"""Golden tests for key normalization vs the reference's RadixKey semantics.

Oracle: numpy reimplementation of radix_key_impl.rs transforms; ordering
checks assert that ascending unsigned word order equals the reference's sort
order (signed order for ints, IEEE total order for floats incl. NaN/-0.0 —
reference: src/radix_sort.rs:97-144 float tests).
"""
import numpy as np
import pytest

from rdst_tpu import keys


def np_total_order_key_f32(x: np.ndarray) -> np.ndarray:
    s = x.view(np.int32)
    s = s ^ np.array((s >> 31), dtype=np.uint32).view(np.int32) // 2  # not exact; below
    return s


def ref_float_key(x: np.ndarray) -> np.ndarray:
    """Exact port of radix_key_impl.rs:162-185 for the oracle."""
    if x.dtype == np.float32:
        s = x.view(np.int32)
        folded = s ^ ((s >> 31).view(np.uint32) >> np.uint32(1)).view(np.int32)
        return (folded ^ np.int32(-(2**31))).view(np.uint32)
    s = x.view(np.int64)
    folded = s ^ ((s >> 63).view(np.uint64) >> np.uint64(1)).view(np.int64)
    return (folded ^ np.int64(-(2**63))).view(np.uint64)


def words_to_int(nk) -> np.ndarray:
    """Combine uint32 words into arbitrary-precision ints for order checks."""
    acc = np.zeros(nk.shape, dtype=object)
    for w in nk.words:
        acc = acc * (1 << 32) + np.asarray(w).astype(object)
    return acc


@pytest.mark.parametrize(
    "dtype", ["uint8", "uint16", "uint32", "uint64", "int8", "int16", "int32", "int64"]
)
def test_int_order_and_roundtrip(dtype, rng):
    info = np.iinfo(dtype)
    x = rng.integers(info.min, info.max, size=1000, endpoint=True, dtype=dtype)
    x = np.concatenate([x, [info.min, info.max, 0]]).astype(dtype)
    nk = keys.normalize(x)
    assert nk.n_bytes == np.dtype(dtype).itemsize
    combined = words_to_int(nk)
    order = np.argsort(combined, kind="stable")
    assert np.array_equal(np.sort(x), x[order])
    back = np.asarray(keys.denormalize(nk))
    assert back.dtype == np.dtype(dtype)
    assert np.array_equal(back, x)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_float_total_order_matches_reference(dtype, rng):
    x = rng.standard_normal(500).astype(dtype)
    specials = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, -np.nan, np.finfo(dtype).tiny,
         -np.finfo(dtype).tiny, np.finfo(dtype).max, np.finfo(dtype).min],
        dtype=dtype,
    )
    x = np.concatenate([x, specials])
    nk = keys.normalize(x)
    # Exact word-level parity with the reference transform
    ref = ref_float_key(x)
    if dtype == "float32":
        assert np.array_equal(np.asarray(nk.words[0]), ref)
    else:
        hi = (ref >> np.uint64(32)).astype(np.uint32)
        lo = (ref & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        assert np.array_equal(np.asarray(nk.words[0]), hi)
        assert np.array_equal(np.asarray(nk.words[1]), lo)
    # Round trip preserves bit patterns exactly (incl. NaN payloads, -0.0)
    back = np.asarray(keys.denormalize(nk))
    assert np.array_equal(back.view(ref.dtype), x.view(ref.dtype))


def test_float_order_is_ieee_total_order(rng):
    x = np.array([np.nan, 1.5, -np.nan, -0.0, 0.0, -np.inf, np.inf, -2.5],
                 dtype=np.float32)
    nk = keys.normalize(x)
    order = np.argsort(np.asarray(nk.words[0]), kind="stable")
    got = x[order].view(np.uint32)
    # IEEE-754 totalOrder: -NaN < -Inf < -2.5 < -0.0 < +0.0 < 1.5 < +Inf < +NaN
    want = np.array([-np.nan, -np.inf, -2.5, -0.0, 0.0, 1.5, np.inf, np.nan],
                    dtype=np.float32).view(np.uint32)
    assert np.array_equal(got, want)


def test_byte_array_lexicographic(rng):
    x = rng.integers(0, 256, size=(300, 3), dtype=np.uint8)
    nk = keys.normalize(x)
    assert nk.n_bytes == 3
    combined = words_to_int(nk)
    order = np.argsort(combined, kind="stable")
    rows = [tuple(r) for r in np.asarray(x)]
    expect = sorted(range(len(rows)), key=lambda i: rows[i])
    got_rows = [tuple(r) for r in np.asarray(x)[order]]
    want_rows = [rows[i] for i in expect]
    assert got_rows == want_rows
    back = np.asarray(keys.denormalize(nk))
    assert np.array_equal(back, x)


def test_digit_plane_matches_get_level(rng):
    """digit(l) == reference get_level(l): l-th least significant byte."""
    x = rng.integers(0, 2**64 - 1, size=200, dtype=np.uint64)
    nk = keys.normalize(x)
    for lvl in range(8):
        want = ((x >> np.uint64(lvl * 8)) & np.uint64(0xFF)).astype(np.uint32)
        got = np.asarray(nk.digit(lvl))
        assert np.array_equal(got, want), lvl


def test_composite_key_order(rng):
    a = rng.integers(0, 2**16, size=400).astype(np.uint16)
    b = rng.standard_normal(400).astype(np.float32)
    nk = keys.normalize((a, b))
    assert nk.n_bytes == 6
    combined = words_to_int(nk)
    order = np.argsort(combined, kind="stable")
    # Expected: lexicographic (a asc, then b by total order)
    bkey = ref_float_key(b)
    expect = np.lexsort((bkey, a))
    assert np.array_equal(order, expect)
    back_a, back_b = keys.denormalize(nk)
    assert np.array_equal(np.asarray(back_a), a)
    assert np.array_equal(np.asarray(back_b).view(np.uint32), b.view(np.uint32))
