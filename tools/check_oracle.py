"""Local stand-in for the driver's correctness gate: run each
``queries()`` entry at a given sf and compare against ``oracle_sql()``
via DuckDB (row count + sorted-column schema + order-insensitive values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            raw_got = to_pandas(fn(sf_dir))
            got = canon(raw_got)
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        try:
            raw_exp = con.execute(sql).fetchdf()
            exp = canon(raw_exp)
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        # dtype-KIND parity before canon's normalizing casts, BOTH
        # directions: the driver hashes stringified values, so an int64
        # column on one side and float64 on the other ("512" vs "512.0")
        # hash-mismatch even when numerically identical.  Round 2 proved
        # the ours-float direction red (jn_asof); round 4 disproved the
        # "oracle-side float is harmless" carve-out (sp_pack/tp_curate:
        # DuckDB window sum() returns HUGEINT, fetchdf -> float64).  Any
        # kind divergence now fails, so local green implies driver green;
        # fix the oracle SQL with explicit CASTs, never this gate.
        def _kind(k: str) -> str:
            return {"i": "int", "u": "int", "f": "float",
                    "b": "bool"}.get(k, "obj")
        kinds_got = {c: _kind(raw_got[c].dtype.kind) for c in raw_got.columns}
        kinds_exp = {c: _kind(raw_exp[c].dtype.kind) for c in raw_exp.columns}
        drift = {c: (kinds_got[c], kinds_exp[c]) for c in kinds_got
                 if kinds_got[c] != kinds_exp[c]}
        if drift:
            print(f"FAIL {name}: dtype kind drift (ours, oracle) {drift}")
            failures += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                same = np.allclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=1e-9, equal_nan=True)
            else:
                same = (a.astype(str) == b.astype(str)).all()
            if not same:
                bad = (a.astype(str) != b.astype(str)) if a.dtype == object else None
                print(f"FAIL {name}: column {c} values differ "
                      f"(got head {a.head(3).tolist()} exp {b.head(3).tolist()})")
                eq = False
                break
        if eq:
            print(f"ok   {name}: {len(got)} rows match")
        else:
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
