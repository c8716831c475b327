"""Shared benchmark plumbing for bench.py and tools/scale_probe.py:
warm-up (JVM, parquet footers, python workers) and best-of-N noop-sink
timing. One copy so the warm-up coverage and sampling policy can't
drift between the two harnesses."""

from __future__ import annotations

import time

WARMUP_QUERIES = ("q6_forecast_revenue", "multimodal_features")


def run_noop(queries, name: str, spark, sf_dir: str) -> None:
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()


def warm(queries, spark, sf_dir: str) -> None:
    """Warm the JVM, parquet footers, and python workers (pandas import
    per worker) so timings measure plans, not cold-start."""
    for name in WARMUP_QUERIES:
        run_noop(queries, name, spark, sf_dir)


def time_query(queries, name: str, spark, sf_dir: str, samples: int = 2) -> float:
    """Best-of-N wall-clock: single samples on this machine occasionally
    absorb a multi-second GC/scheduler transient unrelated to the plan."""
    best = float("inf")
    for _ in range(samples):
        t0 = time.time()
        run_noop(queries, name, spark, sf_dir)
        best = min(best, time.time() - t0)
    return round(best, 3)
