"""Shared benchmark plumbing for bench.py and tools/scale_probe.py:
warm-up (JVM, parquet footers, python workers) and best-of-N noop-sink
timing. One copy so the warm-up coverage and sampling policy can't
drift between the two harnesses."""

from __future__ import annotations

import time

# q6 warms the JVM + parquet footers, multimodal_features the batch
# Arrow/pandas worker pool, and the stateful streaming query the
# applyInPandasWithState path — the stateful Arrow runner keeps its
# OWN python worker pool (keyed by eval type) plus state-store
# provider/checkpoint init, so the FIRST stateful query of a session
# reads ~+2s regardless of which one it is (round-11 postmortem of the
# streaming_transition_matrix r10 "drift": the rotation moved it from
# last-of-13 to first, i.e. from warm to cold slot; controlled
# order-swap runs showed 4.4-5.3s in slot 1 vs 2.1-2.7s steady for the
# SAME query). Warming it here makes every streaming number a
# steady-state, order-independent measurement.
WARMUP_QUERIES = (
    "q6_forecast_revenue",
    "multimodal_features",
    "streaming_transition_matrix",
)


def run_noop(queries, name: str, spark, sf_dir: str) -> None:
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()


def warm(queries, spark, sf_dir: str) -> None:
    """Warm the JVM, parquet footers, and python workers (pandas import
    per worker; the stateful-streaming runner's separate pool) so
    timings measure plans, not cold-start.

    r14: the python-worker pool is keyed by EVAL TYPE, and two types
    were still cold after the query warm-ups — the grouped-map
    (applyInPandas) pool and the UDTF pool — so the bench order's
    FIRST such query absorbed a measured ~1.6 s / ~0.3 s pool
    cold-start (the same order-dependence the r11 postmortem fixed
    for applyInPandasWithState). Two 2-row synthetic calls warm them;
    they compute nothing meaningful and touch no benchmarked plan."""
    for name in WARMUP_QUERIES:
        run_noop(queries, name, spark, sf_dir)

    import pandas as pd
    from pyspark.sql.functions import udtf

    tiny = spark.createDataFrame([(0, 1), (1, 2)], "k long, v long")
    tiny.groupBy("k").applyInPandas(lambda pdf: pdf, "k long, v long").write.format(
        "noop"
    ).mode("overwrite").save()

    @udtf(returnType="x: long")
    class _WarmUDTF:
        def eval(self, v: int):
            yield (v,)

    spark.udtf.register("__warm_udtf", _WarmUDTF)
    tiny.createOrReplaceTempView("__warm_tiny")
    spark.sql(
        "SELECT u.x FROM __warm_tiny, LATERAL __warm_udtf(v) u"
    ).write.format("noop").mode("overwrite").save()


def time_query(queries, name: str, spark, sf_dir: str, samples: int = 2) -> float:
    """Best-of-N wall-clock: single samples on this machine occasionally
    absorb a multi-second GC/scheduler transient unrelated to the plan."""
    best = float("inf")
    for _ in range(samples):
        t0 = time.time()
        run_noop(queries, name, spark, sf_dir)
        best = min(best, time.time() - t0)
    return round(best, 3)
