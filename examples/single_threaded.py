"""Single-program mode (reference: examples/single_threaded.rs)."""
import numpy as np

import rdst_tpu as rt

x = np.random.default_rng(0).standard_normal(50_000).astype(np.float32)
sorted_x = (
    rt.radix_sort_builder(x)
    .with_parallel(False)
    .with_single_threaded_tuner()
    .sort()
)
assert np.array_equal(sorted_x, np.sort(x))
print("single-program sort ok")
