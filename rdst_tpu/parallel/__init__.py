from rdst_tpu.parallel.shuffle import (
    distributed_sort,
    distributed_sort_auto,
    partition_exchange,
    gather_valid,
    make_mesh,
    make_mesh_2d,
    init_distributed,
)
from rdst_tpu.parallel.dtable import (
    distributed_sort_table,
    distributed_filter,
    distributed_group_aggregate,
    distributed_join,
)

__all__ = [
    "distributed_sort",
    "distributed_sort_auto",
    "partition_exchange",
    "gather_valid",
    "make_mesh",
    "make_mesh_2d",
    "init_distributed",
    "distributed_sort_table",
    "distributed_filter",
    "distributed_group_aggregate",
    "distributed_join",
]
