"""Row-reshaping operators: explode (SQL UNNEST) over list columns.

``explode_list`` is a stateless vectorized flat-map: each block expands
independently (no shuffle, no state), so it streams at any scale — the
only cost is the output being larger than the input. Positions are
computed from the flattened parent indices with one run-length pass, so
sliced/chunked Arrow list arrays are handled without touching raw
offsets.

SQL parity (DuckDB ``unnest``): a NULL list and an empty list both
produce no rows; positions are 1-based like ``generate_subscripts``.

Reference parity: feature-fabrica's Split produces list columns
(transform/string.py:59-67) but has no row-expanding operator; explode
completes that family for token-level corpus work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["explode_list"]


def explode_list(ds, list_col: str, pos_col: str = "pos",
                 val_col: str = "val", base: int = 1):
    """One output row per list element of ``list_col``; all other
    columns are repeated per element, ``pos_col`` is the (``base``-based)
    position within the list and ``val_col`` the element value. NULL and
    empty lists emit no rows (SQL UNNEST parity). Returns a Dataset."""

    def fn(batch: pa.Table) -> pa.Table:
        lst = batch.column(list_col)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        parent = pc.list_parent_indices(lst)
        flat = pc.list_flatten(lst)
        p = parent.to_numpy(zero_copy_only=False)
        n = p.size
        if n:
            idx = np.arange(n, dtype=np.int64)
            run_start = np.where(
                np.concatenate(([True], p[1:] != p[:-1])), idx, 0)
            pos = idx - np.maximum.accumulate(run_start) + base
        else:
            pos = np.zeros(0, np.int64)
        rest = batch.drop_columns([list_col]).take(parent)
        return rest.append_column(pos_col, pa.array(pos, pa.int64())) \
                   .append_column(val_col, flat)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
