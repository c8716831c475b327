"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall-clock (the reference's jobTime
semantics, statsManager.go:89-99 — wall-clock around the whole job).

Each query is fully materialized through the noop sink (no driver
collect — measures the distributed plan, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # reference core / facade
    "wordcount",
    "mr_wordcount",
    "group_collect",
    "sum_reduce",
    # relational
    "q1_pricing_summary",
    "q3_top_orders",
    "q4_late_shipments",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q17_small_quantity",
    "topk_per_group",
    "rollup_revenue",
    "anti_join_customers",
    "semi_join_big_spenders",
    "order_status_pivot",
    # event-time / windows / stats
    "tumbling_window_counts",
    "sessionize",
    "running_totals",
    "asof_join_orders",
    "range_join_shipments",
    "sliding_window_counts",
    "cube_by_type_hour",
    "latest_event_per_user",
    "json_props_stats",
    "percentile_stats",
    "funnel_set_ops",
    "value_prop_correlation",
    "trimmed_mean_by_type",
    "trimmed_mean_distributed",
    "value_deciles",
    "value_deciles_approx",
    "approx_distinct_users",
    "salted_user_counts",
    "window_rank_showcase",
    "profile_events",
    # text / training pipeline
    "token_stats",
    "quality_score",
    "lang_id",
    "training_corpus",
    "doc_fingerprint",
    "heavy_hitters",
    "heavy_hitters_approx",
    "bigram_stats",
    "stratified_sample",
    "corpus_mixture",
    # dedup family
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "simhash",
    "simhash_pairs",
    "embedding_near_dup",
    # similarity / multimodal
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "array_funcs_showcase",
    "embedding_doc_join",
    "multimodal_features",
    "frame_stats",
    "audio_chunk_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from gomapreduce_spark.queries import QUERIES
    from gomapreduce_spark.session import get_spark
    from tools.timing import time_query, warm

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    warm(QUERIES, spark, sf_dir)
    times: dict[str, float] = {name: time_query(QUERIES, name, spark, sf_dir) for name in BENCH_QUERIES}

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "bench_total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
