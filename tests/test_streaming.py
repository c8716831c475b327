"""Structured Streaming parity: streaming result == batch result on the
same static input (the meaningful correctness check for a stream with a
finite replay)."""

from __future__ import annotations

from gomapreduce_spark.operators.events import tumbling_counts
from gomapreduce_spark.sources.registry import load_table
from gomapreduce_spark.streaming import streaming_session_windows, streaming_tumbling_counts


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_tumbling_matches_batch(spark, sf_small):
    batch = tumbling_counts(load_table(spark, sf_small, "events"))
    stream = streaming_tumbling_counts(spark, f"{sf_small}/events.parquet")
    assert _as_set(stream.select(*batch.columns)) == _as_set(batch)


def test_streaming_session_windows_sane(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    out = streaming_session_windows(spark, f"{sf_small}/events.parquet")
    rows = out.collect()
    assert len(rows) == ev.select("user_id").distinct().count()
    total_sessions = sum(r["n_sessions"] for r in rows)
    assert total_sessions >= len(rows)
