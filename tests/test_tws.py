"""transformWithStateInPandas surface (Spark 4 arbitrary-stateful API).

The state-API client imports google.protobuf at runtime
(pyspark/sql/streaming/stateful_processor_api_client.py), which is not
baked into this container, so the live test self-gates exactly like the
S3A connector: with protobuf it drives the stream and asserts batch
parity; without it, it asserts the operator fails FAST with the
documented guard (not a deep opaque worker crash). The processor's
accumulation logic is pinned unconditionally by driving it directly
with a stub ValueState — the same iterator-of-DataFrames contract the
real runner uses.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gomapreduce_spark.streaming import (
    RunningTotalsProcessor,
    streaming_running_totals,
    tws_available,
)


class _StubValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _StubHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttl_duration_ms=None):
        return self.states.setdefault(name, _StubValueState())


def test_processor_accumulates_across_batches():
    p = RunningTotalsProcessor()
    handle = _StubHandle()
    p.init(handle)
    b1 = pd.DataFrame({"value": [1.0, 2.0, 3.0]})
    out1 = pd.concat(list(p.handleInputRows((7,), iter([b1]), None)))
    assert out1.to_dict("records") == [{"user_id": 7, "n_events": 3, "total_value": 6.0}]
    # second batch resumes from state, and multiple chunks in one batch merge
    b2a, b2b = pd.DataFrame({"value": [4.0]}), pd.DataFrame({"value": [5.0, 6.0]})
    out2 = pd.concat(list(p.handleInputRows((7,), iter([b2a, b2b]), None)))
    assert out2.to_dict("records") == [{"user_id": 7, "n_events": 6, "total_value": 21.0}]
    assert handle.states["totals"].get() == (6, 21.0)
    p.close()


def test_running_totals_guard_or_live(spark, sf_small):
    if not tws_available():
        with pytest.raises(RuntimeError, match="google.protobuf"):
            streaming_running_totals(spark, f"{sf_small}/events.parquet")
        return
    got = streaming_running_totals(spark, f"{sf_small}/events.parquet")
    from gomapreduce_spark.sources.registry import load_table

    want = (
        load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
