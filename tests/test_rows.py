"""Row-batched sort / top_k (rdst_tpu.ops.rows).

Oracle: per-row numpy sort. Key-order semantics must match the flat sorts
(normalization is shared), so floats use the total-order comparison
(reference: radix_key_impl.rs:162-185).
"""
import numpy as np
import pytest

import rdst_tpu as rt


def _total_order_sorted(x, descending=False):
    # np.sort on floats matches IEEE total order only without NaN; build
    # rows NaN-free for float dtypes and rely on test_keys for NaN parity.
    out = np.sort(x, axis=-1)
    return out[..., ::-1] if descending else out


@pytest.mark.parametrize(
    "dtype", [np.uint32, np.int64, np.float32, np.float64, np.uint8]
)
def test_batched_sort_matches_rowwise_numpy(rng, dtype):
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        x = rng.standard_normal((33, 257)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        x = rng.integers(
            info.min, info.max, size=(33, 257), endpoint=True, dtype=dtype
        )
    got, _ = rt.batched_sort(x)
    assert np.array_equal(np.asarray(got), _total_order_sorted(x))
    got_d, _ = rt.batched_sort(x, descending=True)
    assert np.array_equal(
        np.asarray(got_d), _total_order_sorted(x, descending=True)
    )


def test_batched_sort_payload_and_stability(rng):
    x = rng.integers(0, 8, size=(16, 512), dtype=np.uint32)  # many ties
    payload = np.broadcast_to(
        np.arange(512, dtype=np.uint32), (16, 512)
    ).copy()
    got, (p,) = rt.batched_sort(x, [payload], stable=True)
    order = np.argsort(x, axis=-1, kind="stable")
    assert np.array_equal(np.asarray(got), np.take_along_axis(x, order, -1))
    assert np.array_equal(
        np.asarray(p), np.take_along_axis(payload, order, -1)
    )


def test_batched_sort_composite_key(rng):
    a = rng.integers(0, 4, size=(7, 128), dtype=np.uint16)
    b = rng.standard_normal((7, 128)).astype(np.float32)
    (sa, sb), _ = rt.batched_sort((a, b))
    sa, sb = np.asarray(sa), np.asarray(sb)
    packed = np.rec.fromarrays([a, b])
    want = np.sort(packed, axis=-1)
    assert np.array_equal(sa, want.f0)
    assert np.array_equal(sb, want.f1)


@pytest.mark.parametrize("largest", [True, False])
@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32])
def test_batched_top_k_single_word(rng, dtype, largest):
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        x = rng.standard_normal((9, 300)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        x = rng.integers(
            info.min, info.max, size=(9, 300), endpoint=True, dtype=dtype
        )
    payload = rng.integers(0, 2**32, size=(9, 300)).astype(np.uint32)
    k = 17
    got, (p,) = rt.batched_top_k(x, k, [payload], largest=largest)
    srt = np.sort(x, axis=-1)
    want = srt[..., ::-1][..., :k] if largest else srt[..., :k]
    assert np.array_equal(np.asarray(got), want)
    # payload rows must pair with their keys (ties: any consistent pairing)
    for r in range(x.shape[0]):
        pairs = set(zip(x[r].tolist(), payload[r].tolist()))
        got_pairs = set(
            zip(np.asarray(got)[r].tolist(), np.asarray(p)[r].tolist())
        )
        assert got_pairs <= pairs, f"row {r}: payload mispaired"


@pytest.mark.parametrize("largest", [True, False])
def test_batched_top_k_wide_key_fallback(rng, largest):
    x = rng.integers(0, 2**64, size=(5, 200), dtype=np.uint64)
    k = 9
    got, _ = rt.batched_top_k(x, k, largest=largest)
    srt = np.sort(x, axis=-1)
    want = srt[..., ::-1][..., :k] if largest else srt[..., :k]
    assert np.array_equal(np.asarray(got), want)


def test_batched_top_k_k_bounds(rng):
    x = rng.integers(0, 100, size=(3, 32), dtype=np.uint32)
    with pytest.raises(ValueError):
        rt.batched_top_k(x, 0)
    with pytest.raises(ValueError):
        rt.batched_top_k(x, 33)
    got, _ = rt.batched_top_k(x, 32)
    assert np.asarray(got).shape == (3, 32)


def test_batched_sort_jittable(rng):
    import jax

    x = rng.integers(0, 2**32, size=(8, 256), dtype=np.uint32)

    @jax.jit
    def f(x):
        ks, _ = rt.batched_sort(x)
        return ks

    assert np.array_equal(np.asarray(f(x)), np.sort(x, axis=-1))
