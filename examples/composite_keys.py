"""Multi-field composite keys (reference: examples/impl_radix_key.rs —
multi-key orderings over struct fields) and table sorting."""
import numpy as np

import rdst_tpu as rt
from rdst_tpu.table import Table

rng = np.random.default_rng(0)
n = 100_000

# sort by (category, score) — a two-field RadixKey
cat = rng.integers(0, 500, n).astype(np.uint16)
score = rng.standard_normal(n).astype(np.float32)
(s_cat, s_score) = rt.radix_sort_unstable((cat, score))
print("composite-sorted:", s_cat[:3], s_score[:3])

# same through the columnar table engine, with extra payload columns
t = Table({"cat": cat, "score": score, "id": np.arange(n, dtype=np.uint32)})
s = t.sort_by(["cat", "score"])
print(s)

agg, n_groups = t.group_aggregate(
    "cat", {"total": ("score", "sum"), "cnt": ("score", "count")}
)
print("groups:", int(n_groups))
