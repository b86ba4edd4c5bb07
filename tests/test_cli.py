"""CLI (the ``ray job submit`` surface): validate + transform + resume."""

import json
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    t = pa.table({"repo": ["a/r1", "a/r1", "b/r2", "b/r2"],
                  "path": ["p1", "p1", "p2", "p3"],
                  "commit": ["c1", "c1", "c2", "c3"],
                  "lang": ["en", None, "es", "en"],
                  "content": ["hello", "hello", "", "world"],
                  "size": [5, 5, 0, 5]})
    pq.write_table(t, str(d / "input.parquet"))
    (d / "suite.yaml").write_text("""
checks:
  - {type: not_null, column: lang}
  - {type: min_length, column: content, min_length: 1}
  - {type: unique, columns: [repo, path, commit]}
""")
    (d / "spec.yaml").write_text("""
lang: {description: language code column, data_type: str}
lang_up:
  description: upper cased language
  data_type: str
  dependencies: [lang]
  transformation: "(lang).upper()"
""")
    return d


def _run(*args):
    p = subprocess.run([sys.executable, "-m", "feature_fabrica_ray.cli", *args],
                       capture_output=True, text=True, timeout=300,
                       cwd="/root/repo")
    assert p.returncode == 0, p.stderr[-2000:]
    return [json.loads(l) for l in p.stdout.strip().splitlines()
            if l.startswith("{")]


def test_cli_validate(workdir):
    out = _run("validate", "--input", str(workdir / "input.parquet"),
               "--suite", str(workdir / "suite.yaml"),
               "--out", str(workdir / "o1"))
    assert out[-1]["n_rows"] == 4 and out[-1]["passed"] is False


def test_cli_validate_sharded_resume(workdir):
    args = ("validate", "--input", str(workdir / "input.parquet"),
            "--suite", str(workdir / "suite.yaml"),
            "--out", str(workdir / "o2"), "--shards", "3")
    first = _run(*args)[-1]
    assert sorted(first["completed"]) == ["0000", "0001", "0002"]
    second = _run(*args)[-1]
    assert second["completed"] == [] and len(second["skipped"]) == 3
    assert second["n_rows"] == first["n_rows"] == 4


def test_cli_transform(workdir):
    out = _run("transform", "--input", str(workdir / "input.parquet"),
               "--spec", str(workdir / "spec.yaml"),
               "--out", str(workdir / "tf"))
    assert out[-1]["features"] == ["lang", "lang_up"]
    import glob

    files = glob.glob(str(workdir / "tf" / "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert "lang_up" in t.column_names


def test_cli_transform_lineage(workdir):
    import json as _json

    lin_path = workdir / "lineage.json"
    out = _run("transform", "--input", str(workdir / "input.parquet"),
               "--spec", str(workdir / "spec.yaml"),
               "--out", str(workdir / "tf2"),
               "--lineage", str(lin_path))
    assert out[-1]["features"] == ["lang", "lang_up"]
    rows = _json.loads(lin_path.read_text())
    assert {r["feature"] for r in rows} == {"lang", "lang_up"}
    for r in rows:
        assert r["wall_s"] >= 0 and r["n_rows"] > 0
        assert r["digest"] is not None


def test_cli_validate_parents_and_sketch_checks(workdir):
    """--parent NAME=PATH feeds referential checks; quantile_bound and
    distinct_bound run through the CLI surface (verdict gates the
    'passed' output; the orphan repo fails referential)."""
    pq.write_table(pa.table({"repo": ["a/r1"]}),  # b/r2 is an orphan
                   str(workdir / "repos.parquet"))
    (workdir / "suite2.yaml").write_text("""
checks:
  - {type: referential, column: repo, parent: repos, parent_column: repo}
  - {type: quantile_bound, column: size, q: 0.5, max: 100, name: p50_cap}
  - {type: distinct_bound, column: repo, min: 2, max: 10, name: repo_card}
""")
    out = _run("validate", "--input", str(workdir / "input.parquet"),
               "--suite", str(workdir / "suite2.yaml"),
               "--parent", f"repos={workdir / 'repos.parquet'}",
               "--out", str(workdir / "o_par"))
    assert out[-1]["passed"] is False        # orphans exist
    assert out[-1]["n_violations"] == 2      # two b/r2 rows


def test_cli_curate(workdir):
    """End-to-end curate surface: gate/dedup/chunk/pack documents to a
    packed-chunk parquet directory."""
    # must clear the gopher gate: alphabetic words, no word >15% of total
    words = " ".join(["alpha beta gamma delta epsilon zeta eta theta "
                      "iota kappa"] * 4)
    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": [words, words,            # exact dup pair
                           "too short",             # fails gopher gate
                           words + " extra trailer"]})
    pq.write_table(t, str(workdir / "docs.parquet"))
    out = _run("curate", "--input", str(workdir / "docs.parquet"),
               "--out", str(workdir / "curated"),
               "--min-words", "5", "--max-tokens", "16",
               "--context-len", "64", "--shards", "2")
    assert out[-1]["chunks_written"] > 0
    kept = pq.read_table(str(workdir / "curated"))
    # doc 3 gated out; dup pair keeps min id 1 -> docs {1, 4}
    ids = set(pa.compute.unique(kept.column("doc_id")).to_pylist())
    assert ids == {1, 4}
