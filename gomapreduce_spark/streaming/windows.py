"""Structured Streaming variants of the event-time operators.

The reference is strictly batch (hard barrier between phases, reference
mapreduce.go:105-143); streaming is a driver-mandated extension. These
run the same event schema through ``readStream`` with watermarks; tests
drive them to completion with availableNow + memory sink, which is also
how the batch-parity check works (streaming result == batch result on
a static input).

At scale the source becomes Kafka/files-on-arrival; the plans are
identical (incremental hash aggregation with watermark-bounded state).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet stores TIMESTAMP(NANOS): read ts as long, convert after.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _read_events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    from ..session import apply_runtime_confs

    apply_runtime_confs(spark)
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if events_path.endswith(".parquet"):  # file source wants a directory
        d, base = os.path.split(events_path)
        reader = reader.option("pathGlobFilter", base)
        events_path = d
    return reader.parquet(events_path).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(agg: DataFrame, mode: str) -> DataFrame:
    """Drive a streaming aggregation over a static source to completion
    synchronously; return the materialized result table."""
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(name)


def streaming_tumbling_counts(spark: SparkSession, events_path: str) -> DataFrame:
    """Hourly tumbling counts per event type as an incremental streaming
    aggregation with a 1-hour watermark (late rows beyond it dropped)."""
    stream = (
        _read_events_stream(spark, events_path)
        .withWatermark("ts", "1 hour")
    )
    agg = stream.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value")
    )
    # complete mode: a finite (availableNow) source never advances the
    # watermark past its last window, which in append mode would withhold
    # the final windows — complete emits the full aggregation state.
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def streaming_session_windows(spark: SparkSession, events_path: str, gap_minutes: int = 30) -> DataFrame:
    """Native session windows (session_window) — the streaming
    counterpart of operators.events.sessionize."""
    stream = (
        _read_events_stream(spark, events_path)
        .withWatermark("ts", "1 hour")
    )
    agg = stream.groupBy(F.session_window("ts", f"{gap_minutes} minutes"), "user_id").agg(
        F.count("*").alias("n_events")
    )
    out = _run_to_memory(agg, "complete")
    return out.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.max("n_events").alias("max_session_events")
    )
