"""End-to-end training-data curation example over the synthetic
documents table: quality filter -> exact dedup -> near-dup cluster
dedup -> language stratified sampling -> TF-IDF vocabulary, writing
partitioned parquet at each checkpoint.

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from feature_fabrica_ray.pipelines import (add_lang_id, add_quality,
                                           exact_dedup_rows_shuffle,
                                           neardup_dedup_rows,
                                           stratified_sample,
                                           tfidf_top_terms)
from feature_fabrica_ray.sources import read_parquet_clean


def main(sf_dir: str, out_dir: str) -> None:
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])

    # 1. cheap quality pre-filter (vectorized score + vectorized mask)
    import pyarrow.compute as pc

    scored = add_quality(docs)
    kept = scored.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("quality"), 0.05)),
        batch_format="pyarrow", batch_size=None)

    # 2. exact dedup on the text body (dup-heavy form: full shuffle,
    #    pick-first, zero driver state)
    deduped = exact_dedup_rows_shuffle(kept, ["text"], tiebreak="doc_id")

    # 3. near-dup cluster dedup (MinHash+LSH pairs -> union-find ->
    #    broadcast drop set)
    neardeduped = neardup_dedup_rows(deduped, threshold=0.5)

    # 4. language-stratified deterministic sampling (rerun-stable)
    sample = stratified_sample(neardeduped, "lang",
                               {"en": 1.0, "zh": 0.5, "es": 0.5},
                               key_columns=["doc_id"],
                               default_fraction=0.25)
    sample.write_parquet(f"{out_dir}/curated")

    # 5. TF-IDF top terms of the curated corpus
    tfidf_top_terms(read_parquet_clean(f"{out_dir}/curated"), k=5) \
        .write_parquet(f"{out_dir}/tfidf")
    print("wrote", out_dir)


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
             sys.argv[2] if len(sys.argv) > 2 else "/tmp/ffr_example_out")
    finally:
        ray.shutdown()
