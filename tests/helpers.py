"""Shared test utilities mirroring the reference's test_utils.rs.

* ``gen_bimodal``       — the reference's input generator: random pool,
                          half shifted right, half shifted left
                          (test_utils.rs:63-95).
* ``size_ladder``       — the 0..N comparison-suite sizes
                          (test_utils.rs:136-146, scaled down for CI).
* ``sort_comparison_suite`` — run a sort fn over the ladder and validate
                          against the numpy oracle (test_utils.rs:97-134).
* ``u32_patterns``      — adversarial bit patterns (test_utils.rs:148-262).
"""
import numpy as np

import rdst_tpu as rt


def gen_bimodal(rng, n, dtype, shift):
    info = np.iinfo(dtype)
    x = rng.integers(info.min, info.max, size=n, endpoint=True, dtype=dtype)
    half = n // 2
    if shift:
        # emulate reference: half >>s, half <<s (on unsigned views)
        u = x.view(f"uint{np.dtype(dtype).itemsize * 8}")
        s = np.dtype(u.dtype).type(shift)
        u[:half] >>= s
        u[half:] <<= s
    return x


def size_ladder(maxn=60_000):
    ladder = [0, 1, 2, 3, 5, 8, 128, 129, 256, 1000, 5_000, 30_000, maxn]
    return [s for s in ladder if s <= maxn]


def np_oracle(x):
    return np.sort(x, kind="stable")


def sort_comparison_suite(dtype, sort_fn, rng, shift=0, maxn=60_000):
    pool = gen_bimodal(rng, maxn, np.dtype(dtype), shift)
    for size in size_ladder(maxn):
        x = pool[:size].copy()
        got = sort_fn(x)
        want = np_oracle(x)
        assert np.array_equal(got, want), (
            f"{dtype} size={size} shift={shift}: mismatch"
        )


def u32_patterns(rng):
    """Adversarial u32 patterns (test_utils.rs:148-262)."""
    pats = [
        np.full(1000, 0xFFFFFFFF, dtype=np.uint32),
        rng.integers(0, 2**32, size=4, dtype=np.uint32),
        rng.integers(0, 2**32, size=5_000, dtype=np.uint32),
    ]
    masks = [
        0xFFFFFF00, 0xFFFF00FF, 0xFF00FFFF, 0x00FFFFFF,
        0xFF000000, 0x00FF0000, 0x0000FF00, 0x000000FF,
        0x10101010, 0x01010101, 0xAAAAAAAA, 0x55555555,
    ]
    base = rng.integers(0, 2**32, size=5_000, dtype=np.uint32)
    for m in masks:
        pats.append(base & np.uint32(m))
    # skew pattern designed to trip the skew branch (5 outliers)
    skew = np.full(5_000, 0x0000_0100, dtype=np.uint32)
    skew[:5] = [0xFFFFFFFF, 1, 2, 3, 0x80000000]
    pats.append(skew)
    return pats


def run_single_algorithm(algorithm, x, stable=False):
    b = rt.radix_sort_builder(x).with_algorithm(algorithm)
    if stable:
        b = b.with_stable(True)
    return b.sort()
