"""Pipeline observability via Spark's Observation API.

The reference's statsManager (statsManager.go:89-99) wraps every job in
wall-clock + per-task counters; the MapReduce facade already mirrors
that (mapreduce/engine.py JobStats). This module is the DATAFLOW-level
analog for the analytics side: named metrics computed inline on a
DataFrame as it executes — zero extra actions, zero extra scans, the
numbers fall out of the same job that produced the result. At 100 TB
an extra `.count()` for monitoring is a full second read of the input;
`observe` is free.

Usage::

    obs, df = observe_counts(docs.where(...), "hygiene")
    df.write.parquet(...)          # one action
    obs.get["hygiene.rows"]        # metrics from that same action
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, name: str, value_col: str | None = None
) -> tuple[Observation, DataFrame]:
    """Attach a named Observation computing row count (plus sum/min/max
    of ``value_col`` when given) to ``df``. Returns (observation,
    observed_df); metrics materialize with the FIRST action on the
    returned frame and are read from ``observation.get``."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias(f"{name}.rows")]
    if value_col is not None:
        metrics += [
            F.sum(value_col).alias(f"{name}.sum"),
            F.min(value_col).alias(f"{name}.min"),
            F.max(value_col).alias(f"{name}.max"),
        ]
    return obs, df.observe(obs, *metrics)
