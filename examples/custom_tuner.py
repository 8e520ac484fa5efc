"""Plugging a custom tuner (reference: examples/custom_tuner.rs)."""
import numpy as np

import rdst_tpu as rt


class MyTuner:
    """Prefer the low-memory chunked plan for big inputs."""

    def pick_algorithm(self, p: rt.TuningParams, counts):
        if p.input_len <= 128:
            return rt.Algorithm.COMPARATIVE
        if p.input_len >= 500_000:
            return rt.Algorithm.REGIONS
        return rt.Algorithm.LSB


x = np.random.default_rng(0).integers(0, 2**64, size=600_000, dtype=np.uint64)
sorted_x = rt.radix_sort_builder(x).with_tuner(MyTuner()).sort()
assert np.array_equal(sorted_x, np.sort(x))
print("custom tuner sort ok")
