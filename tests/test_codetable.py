"""The synthetic source-code table must be row-identical between the Ray
generator and the DuckDB CTE oracle (the foundation of every validation-check
oracle), and carry the planted defects at deterministic positions."""

import pandas as pd
import pytest

from feature_fabrica_ray.sources import codetable_cte, read_codetable, read_repos

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck_docs():
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def test_codetable_matches_sql(ray_session, duck_docs):
    ray_df = (read_codetable(SF).to_pandas()
              .drop(columns=["content_sha256"])
              .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    sql_df = (duck_docs.execute(codetable_cte() + "SELECT * FROM codetable").df()
              .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    sql_df.columns = ray_df.columns
    pd.testing.assert_frame_equal(ray_df, sql_df)


def test_repos_matches_sql(ray_session, duck_docs):
    ray_df = read_repos(SF).to_pandas().sort_values("repo").reset_index(drop=True)
    sql_df = duck_docs.execute(codetable_cte() + "SELECT * FROM repos ORDER BY repo").df()
    pd.testing.assert_frame_equal(ray_df, sql_df)


def test_planted_defects_present(ray_session, duck_docs):
    row = duck_docs.execute(codetable_cte() + """
        SELECT count(*) AS n,
               count(DISTINCT repo) AS n_repos,
               sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS null_lang,
               sum(CASE WHEN content = '' THEN 1 ELSE 0 END) AS empty_content
        FROM codetable""").fetchone()
    n, n_repos, null_lang, empty_content = row
    assert n > 500  # duplicates add rows
    assert n_repos >= 10  # skewed but multi-repo
    assert null_lang >= 2 and empty_content >= 1
    # orphan repos exist (repo_id == 7 rows absent from parent table)
    orphans = duck_docs.execute(codetable_cte() + """
        SELECT count(*) FROM codetable c WHERE NOT EXISTS
            (SELECT 1 FROM repos r WHERE r.repo = c.repo)""").fetchone()[0]
    assert orphans > 0


def test_sha256_stamp(ray_session):
    import hashlib

    df = read_codetable(SF).limit(5).to_pandas()
    for _, r in df.iterrows():
        assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_replicate_scales_rows(ray_session):
    n1 = read_codetable(SF, replicate=1, with_sha256=False).count()
    n3 = read_codetable(SF, replicate=3, with_sha256=False).count()
    assert n3 == 3 * n1


def test_csv_and_json_readers(ray_session, tmp_path):
    """CSV / JSONL ingest paths: same rows as the parquet read, canonical
    metadata-free schemas, column pruning, and the result feeds the
    validation suite unchanged."""
    import json as _json

    import pyarrow.parquet as pq

    from feature_fabrica_ray.sources import read_csv_clean, read_json_clean

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "lang", "n_chars"])
    df = t.to_pandas()
    csv_p = tmp_path / "docs.csv"
    df.to_csv(csv_p, index=False)
    jsn_p = tmp_path / "docs.jsonl"
    with open(jsn_p, "w") as f:
        for r in df.to_dict("records"):
            f.write(_json.dumps(r) + "\n")

    for reader, path in ((read_csv_clean, csv_p), (read_json_clean, jsn_p)):
        ds = reader(str(path), columns=["doc_id", "lang"])
        assert ds.schema().names == ["doc_id", "lang"]
        out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(out) == len(df)
        assert out["doc_id"].tolist() == sorted(df["doc_id"].tolist())
        assert set(out["lang"]) == set(df["lang"])
