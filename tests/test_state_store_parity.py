"""State-store backend parity (round-7 verdict item 7).

The 100 TB claim for stateful streaming rests on RocksDB state stores
(state spills to disk instead of executor heap). Until round 8 only the
transformWithState path SET the RocksDB provider; these tests EXERCISE
it: the two heaviest stateful queries — applyInPandasWithState
sessionization and the stream-stream LEFT OUTER interval join (four
state stores per partition) — must produce identical results under the
default HDFS-backed provider and RocksDBStateStoreProvider.
"""

from __future__ import annotations

import pytest

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_KEY = "spark.sql.streaming.stateStore.providerClass"


def _as_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def provider_scope(spark):
    """Save/restore the provider conf (the autouse conf-leak guard in
    conftest fails any test that mutates session confs in place)."""
    prev = spark.conf.get(_KEY, None)
    yield
    if prev is None:
        spark.conf.unset(_KEY)
    else:
        spark.conf.set(_KEY, prev)


def _run_under(spark, provider: str | None, fn):
    if provider is None:
        spark.conf.unset(_KEY)
    else:
        spark.conf.set(_KEY, provider)
    return fn()


def test_stateful_sessions_parity_across_providers(spark, sf_small, provider_scope):
    from gomapreduce_spark.streaming import streaming_stateful_sessions

    path = f"{sf_small}/events.parquet"
    run = lambda: _as_set(  # noqa: E731
        streaming_stateful_sessions(spark, path).select(
            "user_id", "session_start", "n_events", "dur_s"
        )
    )
    default = _run_under(spark, None, run)
    rocks = _run_under(spark, ROCKSDB, run)
    assert len(default) > 0
    assert rocks == default


def test_interval_join_parity_across_providers(spark, sf_small, provider_scope):
    from gomapreduce_spark.streaming import streaming_left_outer_interval_join

    path = f"{sf_small}/events.parquet"
    run = lambda: _as_set(streaming_left_outer_interval_join(spark, path))  # noqa: E731
    default = _run_under(spark, None, run)
    rocks = _run_under(spark, ROCKSDB, run)
    assert len(default) > 0
    # the join must actually null-pad somewhere for the parity to bite
    assert any(t[-1] is None for t in default)
    assert rocks == default
