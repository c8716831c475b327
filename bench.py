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

# Every registered batch query, in inventory order; the streaming ops
# are excluded (they run their own micro-batch lifecycle and are
# parity-benchmarked in tests/test_streaming.py instead).
def bench_queries(queries) -> list[str]:
    return [n for n in queries if not n.startswith("streaming_")]


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

    try:
        warm(QUERIES, spark, sf_dir)
    except Exception:  # noqa: BLE001 — warmup is best-effort; per-query
        pass           # isolation below reports the real failures
    # Per-query isolation: one broken query must not kill the whole
    # run with zero numbers (the round-3 failure mode — an ingestion
    # change crashed the first event-time query and the harness died
    # before timing anything). Failures are recorded, the JSON line
    # still prints, and the exit code still flags the run as red.
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in bench_queries(QUERIES):
        try:
            times[name] = time_query(QUERIES, name, spark, sf_dir)
        except Exception as e:  # noqa: BLE001 — record and keep timing the rest
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"

    total = round(sum(times.values()), 3)
    out = {
        "metric": "bench_total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    if errors:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
