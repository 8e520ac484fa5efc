from rdst_tpu.table.table import Table
from rdst_tpu.table import ops

__all__ = ["Table", "ops"]
