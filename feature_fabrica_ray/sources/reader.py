"""Clean parquet reads: identical to ``ray.data.read_parquet`` but with
schema-level metadata stripped from every block.

Parquet files written by pandas embed a ``pandas`` metadata blob in the
Arrow schema; so does every ``pa.Table.from_pandas`` round trip. Schemas
that differ only in that metadata defeat Ray Data's schema deduplication
(``unify_schemas`` hashes schemas; the pandas blob is dict-valued and
unhashable), flooding worker logs with ``Failed to hash the schemas``
warnings and forcing full unifications. Stripping at the source keeps
every downstream block's schema canonical — zero-copy, fuses with the
read."""

from __future__ import annotations

import pyarrow as pa

__all__ = ["strip_pandas_meta", "read_parquet_clean",
           "read_csv_clean", "read_json_clean"]


def strip_pandas_meta(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (pandas round-trip baggage). Zero-copy."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(path, **kwargs):
    """``ray.data.read_parquet`` with canonical (metadata-free) schemas.

    Passes an explicit stripped schema (pruned to ``columns`` when given)
    so the read op itself emits clean blocks — stripping downstream would
    leave the read's own schema-unify warnings in place."""
    import ray.data

    if "schema" not in kwargs and isinstance(path, str):
        try:
            import pyarrow.parquet as pq

            sch = pq.read_schema(path).remove_metadata()
            cols = kwargs.get("columns")
            if cols:
                sch = pa.schema([sch.field(c) for c in cols])
            kwargs["schema"] = sch
        except Exception:
            # non-local paths / schema quirks: fall back to a strip stage
            return ray.data.read_parquet(path, **kwargs).map_batches(
                strip_pandas_meta, batch_format="pyarrow", batch_size=None)
    return ray.data.read_parquet(path, **kwargs)


def read_csv_clean(path, *, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_csv`` with canonical (metadata-free) schemas and
    optional column pruning. CSV carries no column statistics, so
    pruning happens right after parse (the text of every column is
    still read — prefer parquet for 100 TB inputs; CSV is the
    ingest-from-export path)."""
    import ray.data

    ds = ray.data.read_csv(path, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds.map_batches(strip_pandas_meta, batch_format="pyarrow",
                          batch_size=None)


def read_json_clean(path, *, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_json`` (newline-delimited JSON) with canonical
    schemas and optional column pruning. Same caveat as CSV: no
    row-group pruning exists for JSONL — this is the log-ingest path,
    not the 100 TB scan path."""
    import ray.data

    ds = ray.data.read_json(path, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds.map_batches(strip_pandas_meta, batch_format="pyarrow",
                          batch_size=None)
