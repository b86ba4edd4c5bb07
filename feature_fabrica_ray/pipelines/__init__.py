"""End-to-end pipelines: validation suite runner, uniqueness shuffle,
dedup, similarity search, text analysis."""

from .asof import asof_join, asof_join_broadcast
from .curation import (common_ngrams, decontaminate,
                       dedup_lines_within_doc, gopher_quality,
                       normalize_text, redact_text, remove_frequent_lines,
                       repetition_stats,
                       salted_group_agg, token_ngram_hashes)
from .packing import pack_sequences
from .quantiles import (equidepth_buckets, group_quantiles,
                        rank_normalize)
from .checkpoint import codetable_shards, merge_results, validate_resumable
from .events import (cohort_retention, cumulative_agg,
                     event_transitions, ewma_per_key, interarrival_stats,
                     rate_anomalies,
                     extract_json_int, extract_json_str,
                     fill_time_gaps, funnel_steps, interval_overlap_pairs,
                     first_last_value, percent_rank_window,
                     lag_lead,
                     rank_ntile, rolling_agg, runs_islands, sessionize,
                     sliding_window_agg,
                     time_rolling_agg, tumbling_window_agg,
                     windowed_distinct)
from .corpus import curate_corpus, mix_corpora
from .reshape import (explode_list, global_row_number,
                      list_column_stats, unpivot)
from .grouped import (anova_f, approx_distinct_per_group,
                      approx_group_quantiles, benford_profile,
                      cooccurrence_pairs,
                      chi_square_independence, fd_violations,
                      mann_whitney_auc,
                      mutual_information,
                      target_encode_loo,
                      entropy_per_group,
                      distinct_count_per_group,
                      freshness_check, grouped_correlation, grouped_outliers,
                      grouped_outliers_iqr, grouped_regression,
                      grouped_shape, grouped_stats, grouping_sets_agg,
                      histogram_fixed,
                      mode_per_group,
                      pivot_agg, rollup_agg, string_agg_per_group,
                      weighted_avg_per_group,
                      cube_agg)
from .drift_actor import DriftSketchActor, drift_report
from .join import (bloom_filtered_join, broadcast_cross_join,
                   broadcast_join, broadcast_range_join,
                   join_cardinality_estimate, shuffle_join)
from .setops import set_op_keys, snapshot_delta
from .graph import connected_components, star_edges
from .dedup import (embedding_neardup_pairs, exact_dedup_counts,
                    exact_dedup_rows, exact_dedup_rows_shuffle,
                    fuzzy_join_pairs, minhash_lsh_pairs,
                    minhash_lsh_pairs_distributed, neardup_clusters,
                    neardup_dedup_rows_distributed,
                    neardup_dedup_rows, ngram_jaccard, simhash_pairs)
from .multimodal import (DecodeImageFeatures, FrameSampler,
                         ResizeImage, audio_pipeline, decode_pipeline,
                         frame_pipeline, resize_pipeline)
from .sampling import (bottomk_sample, hash_sample, hash_split,
                       md5_fraction_threshold,
                       md5_hex_column,
                       stratified_sample, weighted_hash_sample)
from .similarity import (cosine_topk, fit_centroids, fit_pca,
                         random_projection,
                         ivf_topk, kmeans, kmeans_assign, lsh_topk,
                         semantic_dedup_ids,
                         normalize_embeddings, pca_project,
                         quantize_embeddings)
from .textstats import (add_fingerprint, add_lang_id, add_quality,
                        chunk_documents, code_line_stats,
                        text_stats, tfidf_top_terms, token_counts,
                        dsir_log_ratio, unigram_logprob, zipf_fit,
                        hashed_vectorizer)
from .topk import approx_heavy_hitters, topk_per_group
from .uniqueness import uniqueness_violations, uniqueness_violations_ds
from .writer import (compact_parquet, write_jsonl_sharded,
                     write_range_partitioned, write_validated)
from .validate import (ValidationResult, bind_baselines, compute_baseline,
                       infer_checks, profile_table, run_suite, schema_diff,
                       segment_drift)

__all__ = ["run_suite", "ValidationResult", "compute_baseline", "bind_baselines",
           "uniqueness_violations", "uniqueness_violations_ds",
           "exact_dedup_counts", "exact_dedup_rows", "minhash_lsh_pairs", "simhash_pairs",
           "topk_per_group",
           "ngram_jaccard", "embedding_neardup_pairs",
           "cosine_topk", "ivf_topk", "fit_centroids",
           "text_stats", "add_quality", "add_lang_id", "add_fingerprint",
           "DecodeImageFeatures", "FrameSampler", "decode_pipeline",
           "validate_resumable", "merge_results", "codetable_shards",
           "broadcast_join", "write_validated", "write_jsonl_sharded", "drift_report", "DriftSketchActor",
           "tumbling_window_agg", "sessionize", "extract_json_int",
           "fill_time_gaps",
           "profile_table", "hash_sample", "hash_split", "asof_join", "asof_join_broadcast",
           "minhash_lsh_pairs_distributed", "neardup_clusters", "fuzzy_join_pairs",
           "neardup_dedup_rows", "broadcast_range_join", "token_counts", "shuffle_join", "sliding_window_agg", "stratified_sample",
           "md5_fraction_threshold", "md5_hex_column",
           "freshness_check", "grouped_outliers", "grouped_outliers_iqr", "segment_drift",
           "grouped_correlation", "grouped_regression", "approx_distinct_per_group", "cube_agg",
           "exact_dedup_rows_shuffle", "tfidf_top_terms", "chunk_documents", "audio_pipeline",
           "frame_pipeline", "cumulative_agg", "normalize_embeddings",
           "fit_pca", "pca_project", "ResizeImage", "resize_pipeline",
           "redact_text", "gopher_quality", "decontaminate",
           "token_ngram_hashes", "salted_group_agg", "repetition_stats",
           "common_ngrams", "remove_frequent_lines", "dedup_lines_within_doc",
           "group_quantiles", "pack_sequences", "kmeans", "kmeans_assign",
           "rolling_agg", "distinct_count_per_group", "rollup_agg",
           "weighted_avg_per_group", "chi_square_independence",
           "histogram_fixed", "grouped_stats", "lag_lead",
           "weighted_hash_sample", "normalize_text", "pivot_agg",
           "bottomk_sample", "cooccurrence_pairs", "snapshot_delta",
           "list_column_stats", "windowed_distinct", "zipf_fit",
           "random_projection", "runs_islands", "hashed_vectorizer",
           "code_line_stats", "approx_group_quantiles",
           "rank_ntile", "mode_per_group", "set_op_keys",
           "connected_components", "star_edges",
           "funnel_steps", "interval_overlap_pairs", "unigram_logprob",
           "cohort_retention", "anova_f", "target_encode_loo",
           "mann_whitney_auc", "benford_profile",
           "event_transitions", "mutual_information", "rank_normalize",
           "equidepth_buckets", "lsh_topk", "write_range_partitioned",
           "fd_violations", "ewma_per_key", "schema_diff", "compact_parquet",
           "interarrival_stats", "dsir_log_ratio", "semantic_dedup_ids",
           "join_cardinality_estimate", "rate_anomalies",
           "quantize_embeddings",
           "neardup_dedup_rows_distributed",
           "grouping_sets_agg", "time_rolling_agg", "explode_list", "unpivot",
           "global_row_number",
           "bloom_filtered_join", "broadcast_cross_join", "approx_heavy_hitters",
           "string_agg_per_group", "first_last_value", "grouped_shape",
           "entropy_per_group", "curate_corpus", "mix_corpora",
           "extract_json_str", "percent_rank_window", "infer_checks"]
