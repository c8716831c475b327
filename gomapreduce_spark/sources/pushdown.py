"""Parquet aggregate pushdown: COUNT/MIN/MAX answered from row-group
footer statistics, with zero data pages read.

The reference engine must stream every chunk through a map task even
to count records (its only scan path is read-chunk → map, reference
inputer.go:33-43 + mapreduce.go's map phase); Spark's DSv2 parquet
reader can instead answer whole-table COUNT(*)/MIN/MAX from metadata
the writer already persisted in every row-group footer. At 100 TB
that is the difference between a full-corpus scan and reading a few
KB of footers per file — the cheapest query shape the engine offers,
and the right first probe a user runs against an unfamiliar corpus.

Two Spark knobs gate it, split deliberately across layers:

- ``spark.sql.parquet.aggregatePushdown`` is a session default
  (session.RUNTIME_CONFS): it only affects DSv2 ``BatchScan``
  relations, so the registry's ordinary v1 ``FileScan`` reads are
  untouched, and keeping it session-wide means a footer-stats
  DataFrame keeps its pushdown through DOWNSTREAM re-planning — any
  wrapper (a select, a noop write, the driver's compare harness)
  builds a fresh QueryExecution, which re-applies the pushdown from
  the session conf instead of silently degrading to a full scan.
- ``spark.sql.sources.useV1SourceList`` decides v1-vs-v2 at
  RELATION-CREATION time (``spark.read.parquet`` resolves the
  relation eagerly), so :func:`read_parquet_v2` flips it only around
  that call and restores it before returning — no other read in the
  process can land on the v2 path by accident.

Pushdown applies only when the plan is exactly scan→aggregate: no
filters (footer stats can't answer a filtered count), no grouping
except by partition columns, and — all-or-nothing — only NUMERIC
min/max columns (Spark declines timestamp and string stats; one such
column in the list silently degrades the whole query to a full scan,
which is why tests/test_pushdown.py pins the decline explicitly).
:func:`footer_stats` keeps itself inside that envelope by
construction; callers pick numeric columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

_V1_LIST_CONF = "spark.sql.sources.useV1SourceList"


def read_parquet_v2(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` resolved as a DSv2 ``BatchScan`` relation.

    The v1-source list is flipped only around the (eager) relation
    resolution and restored in a ``finally``, so concurrent/subsequent
    reads keep the default v1 path. Runtime confs are re-asserted
    first (the load_table convention): on a DRIVER-OWNED session that
    never touched the registry, ``aggregatePushdown`` would otherwise
    be unset and the footer-stats query would silently degrade to the
    full scan this module exists to avoid.
    """
    apply_runtime_confs(spark)
    old = spark.conf.get(_V1_LIST_CONF)
    spark.conf.set(
        _V1_LIST_CONF, ",".join(s for s in old.split(",") if s.strip() != "parquet")
    )
    try:
        return spark.read.parquet(path)
    finally:
        spark.conf.set(_V1_LIST_CONF, old)


def footer_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """One row of (n_rows, min_<col>, max_<col>...) for a parquet
    table, answered from row-group footer statistics.

    The plan must stay scan→aggregate for the pushdown to hold
    (asserted by the ``PushedAggregation`` plan gate and
    tests/test_pushdown.py): no filter, no non-partition grouping.
    The only post-scan work is merging one pre-aggregated row per
    file split — the single-partition final aggregate is over
    #splits rows, not data rows, at any corpus size.
    """
    return partition_stats(spark, path, [], cols)


def partition_stats(
    spark: SparkSession, path: str, group_cols: list[str], cols: list[str]
) -> DataFrame:
    """Per-partition footer stats over a Hive-partitioned layout
    (``write_partitioned_corpus`` output): grouping by PARTITION
    columns is the one GROUP BY shape the pushdown supports
    (``PushedGroupBy`` rides the scan next to ``PushedAggregation``),
    because each leaf directory's footers already hold its group's
    stats — the per-slice profile of a 100 TB corpus for the cost of
    listing + footers. Grouping by a DATA column declines the whole
    pushdown (same all-or-nothing rule as non-numeric min/max)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return read_parquet_v2(spark, path).groupBy(*group_cols).agg(*aggs)
