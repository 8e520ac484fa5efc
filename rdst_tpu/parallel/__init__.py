from rdst_tpu.parallel.shuffle import (
    distributed_sort,
    gather_valid,
    make_mesh,
)
from rdst_tpu.parallel.dtable import (
    distributed_sort_table,
    distributed_filter,
    distributed_group_aggregate,
)

__all__ = [
    "distributed_sort",
    "gather_valid",
    "make_mesh",
    "distributed_sort_table",
    "distributed_filter",
    "distributed_group_aggregate",
]
