"""External-consumer smoke: import rdst_tpu as a user would and run one
sort per major code path (reference analog: fixtures/*/src/main.rs — a
bare external crate that links the library and sorts).

Run from either fixture env:  python fixtures/consumer.py
"""
import numpy as np

import rdst_tpu as rt
from rdst_tpu import config


def main() -> None:
    rng = np.random.default_rng(42)

    x = rng.integers(0, 2**32, size=100_000, dtype=np.int64).astype(
        np.uint32
    )
    assert np.array_equal(rt.radix_sort_unstable(x), np.sort(x))

    # device dispatcher (histogram -> tuner -> plan), no host fast path
    config.host_sort_max = 0
    f = rng.standard_normal(50_000)
    got = rt.radix_sort_builder(f).sort()
    assert np.array_equal(
        np.asarray(got).view(np.uint64), np.sort(f).view(np.uint64)
    )

    k = rng.integers(0, 100, size=30_000, dtype=np.uint16)
    v = np.arange(30_000, dtype=np.uint32)
    ks, vs = rt.sort_key_value(k, v, stable=True)
    o = np.argsort(k, kind="stable")
    assert np.array_equal(ks, k[o]) and np.array_equal(vs, v[o])

    print("consumer smoke: OK")


if __name__ == "__main__":
    main()
