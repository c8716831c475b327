"""Event-time operators: tumbling windows, sessionization, running
aggregates.

The reference is strictly batch with no notion of event time (SURVEY
§2.2 — "no streaming of any sort"); these are driver-mandated
extensions. Batch implementations here; Structured Streaming variants
in ``gomapreduce_spark.streaming``.

Scale notes: tumbling aggregation is a single hash shuffle keyed on
(bucket, type) with partial aggregation. Sessionization shuffles once
on user_id; per-user ordering happens inside each partition (no global
sort), which holds at 100 TB as long as a single user's events fit a
partition — true for any human-generated stream; a bot-scale hot user
is handled by AQE skew splitting on the first shuffle and, if needed,
a coarse (user_id, day) pre-bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Hourly tumbling counts + value sums per event type. Window start
    is emitted as a formatted string so the oracle compare is
    timezone-unambiguous."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_minutes``. Classic lag+cumsum formulation — one
    shuffle on user_id, then per-user intra-partition sort."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sessions = (
        events.withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_us").isNull() | (F.unix_micros("ts") - F.col("prev_us") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1_000_000).alias("dur_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
        F.round(F.avg("dur_s"), 4).alias("avg_session_sec"),
    )


def running_user_totals(events: DataFrame, at_event: int = 5) -> DataFrame:
    """Running cumulative value per user ordered by event time — window
    frame rowsBetween(unboundedPreceding, current). Output is sampled at
    the user's Nth event so the running (not just total) semantics are
    observable while output stays small."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = (
        events.withColumn("cum_value", F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("rn", F.row_number().over(w))
    )
    return cum.where(F.col("rn") == at_event).select(
        "user_id", F.round("cum_value", 4).alias("cum_value_at_n")
    )
