"""Empirical scaling probe: run headline queries at sf0.001/0.01/0.1
and report the runtime ratio per 10x data step. A scalable plan grows
sub-linearly at this size (fixed overheads dominate) and at worst
linearly; a super-linear ratio (>>10x per step) flags a quadratic
operator.

Run: python tools/scale_probe.py   (~2 min; prints a table + JSON line)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "wordcount",
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "doc_fingerprint",
    "sessionize",
    "asof_join_orders",
    "range_join_shipments",
    "training_corpus",
    "heavy_hitters",
    "bigram_stats",
    "stratified_sample",
    "simhash_pairs",
    "embedding_near_dup",
    "trimmed_mean_distributed",
    "knn_lsh",
    "benchmark_overlap",
    "gopher_rules",
    "repetition_stats",
    "winnow_fingerprints",
    "profile_events",
    "chunk_documents",
    "pack_training_sequences",
    "canonical_docs",
    "leakage_safe_split",
    "dedup_clusters",
    "embedding_dedup_clusters",
    # round-5 additions
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q21_suppliers_kept_waiting",
    "paragraph_dedup",
    "lm_perplexity",
    "boilerplate_spans",
    "image_dhash_index",
    "audio_spectral",
    # round-5c/d additions
    "duplicate_spans",
    "dsir_weights",
    "token_budget_sample",
    "pagerank_dedup_graph",
    "knn_pq",
    "chunk_documents_udtf",
    "full_outer_user_activity",
    "bm25_search",
    "bloom_decontamination",
    "ngram_novelty",
    "triangle_stats",
    "distribution_drift",
    "corpus_quality_report",
    "quality_classifier",
    "hard_negative_mining",
    # round-6 additions
    "fuzzy_customer_links",
    "event_transition_matrix",
    "bpe_pair_counts",
    "sparse_doc_similarity",
    "scd2_user_state",
    "html_boilerplate_strip",
    "knn_ivf_pq",
    "merge_upsert_customers",
    "interarrival_stats",
    # round-7 additions
    "keyedtext_wordcount",
    "session_window_stats",
    "incremental_user_rollup",
    "pmi_collocations",
    "bpe_learn_merges",
    "bpe_encode_stats",
    "distinctive_terms",
    "source_overlap_matrix",
    "dedup_recall_audit",
    "hashed_features",
    "fixed_k_sample",
    "mad_outliers",
    "lang_id_confusion",
    "kmeans_embeddings",
    "semdedup_prune",
    "embedding_drift",
    "hybrid_search",
    "containment_pairs",
    "translated_near_dups",
    "session_paths",
    "calibrated_quality",
    "lpa_communities",
    "kmeans_incremental",
    "volume_anomalies",
    # round-8 addition
    "attribution_last_touch",
    # round-9 additions
    "ppjoin_pairs",
    "weighted_sample",
    # round-10 additions (r9 verdict item 6 + the new governance family)
    "corpus_snapshot_diff",
    "url_canonicalize",
    "domain_rollup",
    "blocklist_filter",
    "bpe_learn_merges_distributed",
    # round-11 additions (provenance manifest, e2e certification, PSL)
    "doc_provenance",
    "corpus_dedup_e2e",
    "domain_rollup_psl",
    # round-12 additions (full-pipeline ingest certification; parquet
    # footer-stats pushdown — expected ~flat: footers, not data pages)
    "corpus_ingest_e2e",
    "lineitem_footer_stats",
    "video_scene_cuts",
    # round-13 additions
    "video_shot_frames",
    "events_partition_stats",
    "contamination_spans",
    # round-14 additions (standing indexes + the live-sketch
    # certificate + the streaming screen's batch twin is covered by
    # contamination_spans; knn_against_index expected ~flat once the
    # identity-keyed index cache is warm — the build is keyed per SF)
    "contamination_against_index",
    "knn_against_index",
    "value_deciles_bounds",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from gomapreduce_spark.queries import QUERIES
    from gomapreduce_spark.session import get_spark
    from tools.timing import time_query, warm

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    warm(QUERIES, spark, SFS[0])

    results: dict[str, list[float]] = {
        name: [time_query(QUERIES, name, spark, sf) for sf in SFS] for name in PROBE_QUERIES
    }

    print(f"{'query':28s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'x(10x)':>7s} {'x(100x)':>8s}")
    for name, (a, b, c) in results.items():
        print(f"{name:28s} {a:8.2f} {b:8.2f} {c:8.2f} {c / max(b, 1e-9):7.1f} {c / max(a, 1e-9):8.1f}")
    print(json.dumps({"metric": "scale_probe", "times": results}))


if __name__ == "__main__":
    raise SystemExit(main())
