"""Grouped exact aggregates built from per-block combiners.

``COUNT(DISTINCT v)`` per key is the canonical combine-then-exchange
aggregate: each block first collapses to its distinct (key, value)
pairs — with per-pair row counts riding along so ``COUNT(*)`` needs no
second pass over the input — and only those block-local distinct pairs
enter the shuffle. At web scale that is orders of magnitude fewer rows
than the input whenever values repeat within blocks. The deduped pairs
hash-partition by key and each reduce partition emits exactly one row
per key; the raw table never moves and only the |keys|-row result
reaches the driver.

Reference parity: feature-fabrica exposes distinct-style grouped
reductions only through GroupByReduce (transform/aggregate.py:67-111);
this module is the dedicated count-distinct form the validation engine
uses for per-group cardinality checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..tuning import shuffle_partitions

__all__ = ["distinct_count_per_group"]


def distinct_count_per_group(ds, key_col: str, val_col: str) -> pd.DataFrame:
    """Exact ``COUNT(DISTINCT val)`` + ``COUNT(*)`` per key.

    Null values count toward ``n_rows`` but not ``n_distinct`` (SQL
    semantics); null keys form their own group. Returns a pandas
    DataFrame (key, n_distinct, n_rows) sorted by key — the result is
    one row per key, small by construction.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col, val_col]) \
            .group_by([key_col, val_col]).aggregate([([], "count_all")])
        return pa.table({key_col: g.column(key_col),
                         val_col: g.column(val_col),
                         "cnt": g.column("count_all").cast(pa.int64())})

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[val_col]
        return pd.DataFrame({
            key_col: [df[key_col].iloc[0]],
            "n_distinct": np.array([vals[vals.notna()].nunique()], np.int64),
            "n_rows": np.array([int(df["cnt"].sum())], np.int64)})

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby(key_col, num_partitions=shuffle_partitions())
           .map_groups(per_key, batch_format="pandas")
           .to_pandas())
    return out.sort_values(key_col).reset_index(drop=True)
