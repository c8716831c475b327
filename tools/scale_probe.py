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
import time

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
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from gomapreduce_spark.queries import QUERIES
    from gomapreduce_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + python workers
    QUERIES["q6_forecast_revenue"](spark, SFS[0]).write.format("noop").mode("overwrite").save()
    QUERIES["multimodal_features"](spark, SFS[0]).write.format("noop").mode("overwrite").save()

    results: dict[str, list[float]] = {}
    for name in PROBE_QUERIES:
        times = []
        for sf in SFS:
            # best-of-2: single samples occasionally catch a multi-second
            # GC/JIT pause that says nothing about the plan's scaling
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times.append(round(best, 3))
        results[name] = times

    print(f"{'query':28s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'x(10x)':>7s} {'x(100x)':>8s}")
    for name, (a, b, c) in results.items():
        print(f"{name:28s} {a:8.2f} {b:8.2f} {c:8.2f} {c / max(b, 1e-9):7.1f} {c / max(a, 1e-9):8.1f}")
    print(json.dumps({"metric": "scale_probe", "times": results}))


if __name__ == "__main__":
    raise SystemExit(main())
