from rdst_tpu.ops.histogram import (
    multi_level_histogram,
    level_histogram,
    HistogramResult,
)
from rdst_tpu.ops.prefix import exclusive_prefix_sum, end_offsets

__all__ = [
    "multi_level_histogram",
    "level_histogram",
    "HistogramResult",
    "exclusive_prefix_sum",
    "end_offsets",
]
