"""Broadcast (map-side) hash join — the scale-correct join for
fact-table x dimension-table enrichment.

The small side is collected once, pruned to the needed columns, shipped
to the object store with ``ray.put``, and every block joins against it
with pyarrow's vectorized hash join — zero shuffle of the big side
(SURVEY.md §2.4: broadcast small sides instead of a co-group exchange).
For two large sides, co-group via ``groupby(key).map_groups`` instead;
this module deliberately only implements the broadcast form and asserts
the small side stays small."""

from __future__ import annotations

import pyarrow as pa

__all__ = ["broadcast_join"]

_MAX_BROADCAST_ROWS = 5_000_000  # guard: a "small side" must actually be small


def _collect_small(right, columns: list[str] | None) -> pa.Table:
    if hasattr(right, "to_arrow_refs"):          # ray Dataset
        if columns:
            right = right.select_columns(columns)
        out = pa.Table.from_pandas(right.to_pandas(limit=_MAX_BROADCAST_ROWS + 1),
                                   preserve_index=False)
    elif isinstance(right, pa.Table):
        out = right.select(columns) if columns else right
    else:                                        # pandas
        out = pa.Table.from_pandas(right[columns] if columns else right,
                                   preserve_index=False)
    if out.num_rows > _MAX_BROADCAST_ROWS:
        raise ValueError(
            f"broadcast_join small side has {out.num_rows} rows — too large to "
            f"broadcast; use a co-group join (groupby(key).map_groups) instead")
    return out.replace_schema_metadata(None)  # keep joined schemas canonical


def broadcast_join(ds, right, *, left_on: str | list[str],
                   right_on: str | list[str] | None = None,
                   right_columns: list[str] | None = None,
                   how: str = "inner"):
    """Join every block of ``ds`` against the broadcast ``right`` side.

    how: 'inner' | 'left outer' | 'left semi' | 'left anti' (pyarrow
    join types; right-side rows never survive alone — this is map-side)."""
    import ray

    left_keys = [left_on] if isinstance(left_on, str) else list(left_on)
    right_keys = left_keys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    small = _collect_small(right, right_columns)
    ref = ray.put(small)   # broadcast once; tasks read from the object store

    def fn(batch: pa.Table) -> pa.Table:
        rt = ray.get(ref)
        return batch.join(rt, keys=left_keys, right_keys=right_keys,
                          join_type=how)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
