"""Columnar Table: named columns over device arrays.

The generalization target of the sort engine (BASELINE.json north star):
sort-based hash aggregate, filter, and joins over columnar tables, all
reusing the radix/sort primitives. The reference sorts arrays of structs
with derived keys (benches/struct_sort.rs, examples/impl_radix_key.rs);
a Table is the columnar equivalent — any subset of columns forms a
composite RadixKey.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np

__all__ = ["Table"]


class Table:
    """Immutable columnar table. Columns are 1-D arrays of equal length."""

    def __init__(self, columns: Mapping[str, jax.Array]):
        cols = dict(columns)
        if not cols:
            raise ValueError("table needs at least one column")
        n = None
        for name, c in cols.items():
            if getattr(c, "ndim", 1) != 1:
                raise ValueError(f"column {name!r} must be 1-D")
            if n is None:
                n = int(c.shape[0])
            elif int(c.shape[0]) != n:
                raise ValueError("column length mismatch")
        self._columns = cols
        self._n = n

    # -- basic accessors ---------------------------------------------------

    @property
    def column_names(self) -> list[str]:
        return list(self._columns)

    @property
    def n_rows(self) -> int:
        return self._n

    def column(self, name: str):
        return self._columns[name]

    def __getitem__(self, name: str):
        return self._columns[name]

    def with_column(self, name: str, values) -> "Table":
        cols = dict(self._columns)
        cols[name] = values
        return Table(cols)

    def select(self, names: Sequence[str]) -> "Table":
        return Table({n: self._columns[n] for n in names})

    def head(self, k: int = 10) -> dict:
        return {n: np.asarray(c[:k]) for n, c in self._columns.items()}

    def to_numpy(self) -> dict:
        return {n: np.asarray(c) for n, c in self._columns.items()}

    def __repr__(self) -> str:
        cols = ", ".join(
            f"{n}:{np.dtype(c.dtype).name}" for n, c in self._columns.items()
        )
        return f"Table[{self._n} rows; {cols}]"

    # -- relational ops (implemented in rdst_tpu.table.ops) ----------------

    def sort_by(self, by, **kw) -> "Table":
        from rdst_tpu.table import ops

        return ops.sort_by(self, by, **kw)

    def filter(self, mask, **kw):
        from rdst_tpu.table import ops

        return ops.filter(self, mask, **kw)

    def group_aggregate(self, by, aggs, **kw):
        from rdst_tpu.table import ops

        return ops.group_aggregate(self, by, aggs, **kw)

    def join(self, other: "Table", on, **kw):
        from rdst_tpu.table import ops

        return ops.join(self, other, on, **kw)
