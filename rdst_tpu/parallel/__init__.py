from rdst_tpu.parallel.shuffle import (
    distributed_sort,
    gather_valid,
    make_mesh,
)

__all__ = ["distributed_sort", "gather_valid", "make_mesh"]
