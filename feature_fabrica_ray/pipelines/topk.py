"""Top-k per group without a global sort.

Each block computes its own per-group top-k (vectorized lexsort slice);
the tiny partials merge on the driver. At 100 TB this is the standard
combiner shape: the exchange carries at most ``k x groups-per-block``
rows instead of the full table. Deterministic under ties via explicit
tie-break columns (ascending) — required for cross-engine comparison.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

__all__ = ["topk_per_group"]


def topk_per_group(ds, group_cols: list[str], value_col: str, k: int,
                   tiebreak_cols: list[str] | None = None,
                   descending: bool = True) -> pd.DataFrame:
    """Global top-k rows per group by ``value_col``. Returns a pandas
    DataFrame with a ``rank`` column (1-based)."""
    tiebreak_cols = tiebreak_cols or []
    cols = list(dict.fromkeys([*group_cols, value_col, *tiebreak_cols]))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([c for c in cols if c in batch.column_names]).to_pandas()
        df = df.sort_values([*group_cols, value_col, *tiebreak_cols],
                            ascending=[True] * len(group_cols)
                            + [not descending] + [True] * len(tiebreak_cols),
                            kind="mergesort")
        top = df.groupby(group_cols, as_index=False).head(k)
        return pa.Table.from_pandas(top, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    merged = parts.sort_values([*group_cols, value_col, *tiebreak_cols],
                               ascending=[True] * len(group_cols)
                               + [not descending] + [True] * len(tiebreak_cols),
                               kind="mergesort")
    out = merged.groupby(group_cols, as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby(group_cols).cumcount() + 1
    return out
