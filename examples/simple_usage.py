"""Basic sorting (reference: examples/simple_usage.rs)."""
import numpy as np

import rdst_tpu as rt

x = np.random.default_rng(0).integers(0, 2**32, size=100_000, dtype=np.uint32)
sorted_x = rt.radix_sort_unstable(x)
print("sorted:", sorted_x[:5], "...", sorted_x[-5:])
assert np.array_equal(sorted_x, np.sort(x))
