from rdst_tpu.parallel.shuffle import (
    distributed_sort,
    partition_exchange,
    gather_valid,
    make_mesh,
)
from rdst_tpu.parallel.dtable import (
    distributed_sort_table,
    distributed_filter,
    distributed_group_aggregate,
    distributed_join,
)

__all__ = [
    "distributed_sort",
    "partition_exchange",
    "gather_valid",
    "make_mesh",
    "distributed_sort_table",
    "distributed_filter",
    "distributed_group_aggregate",
    "distributed_join",
]
