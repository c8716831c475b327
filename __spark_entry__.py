"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing
summary) at sf0.001. ``queries()`` exposes the full operator inventory
(SURVEY §2 + driver-mandated extensions); ``oracle_sql()`` the matching
DuckDB SQL. Implementation lives in the ``gomapreduce_spark`` package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gomapreduce_spark import queries as _q
from gomapreduce_spark.operators.relational import q1_pricing_summary
from gomapreduce_spark.sources.registry import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Also the timestamp-encoding canary: if a testdata regeneration
    ships a new ts encoding that slips past
    ``sources.registry.normalize_timestamps``, fail the smoke gate HERE
    — loudly and first — rather than letting event-time queries compute
    on garbage mid-run (the round-3 failure mode)."""
    sf_dir = "/root/testdata/sf0.001"
    ts_dtype = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
    assert ts_dtype == "timestamp", (
        f"events.ts arrived as {ts_dtype!r}, not 'timestamp' — new testdata "
        "encoding slipped past sources.registry.normalize_timestamps"
    )
    return q1_pricing_summary(load_table(spark, sf_dir, "lineitem"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Exactly ONE query is
    intentionally absent — value_deciles_approx (GK sketch merges in
    shuffle-arrival order; dual-bound tests, the hash-oracled
    repartition(1) twin value_deciles_approx_seq, AND — round 14 —
    the hash-oracled value_deciles_bounds certificate that runs the
    LIVE multi-sketch merge path and verifies its rank bound,
    compensate); every streaming query IS present (deterministic on
    finite replay), and the deterministic codec/ANN/BPE/HLL/kmeans
    pipelines carry precomputed independent-reference VALUES
    oracles."""
    return dict(_q.ORACLES)
