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
  that call and restores it before returning — on the single-threaded
  driver this repo uses, no other read lands on the v2 path by
  accident. The flip is NOT safe against concurrent reads on the same
  SparkSession from other driver threads (a read during the flip
  window would resolve as DSv2, and a concurrent ``read_parquet_v2``
  could clobber the finally-restore); guard with a lock if that usage
  ever appears.

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
from pyspark.sql.types import DoubleType, FloatType

from ..session import apply_runtime_confs

_V1_LIST_CONF = "spark.sql.sources.useV1SourceList"


def _normalize_signed_zero(df: DataFrame) -> DataFrame:
    """Collapse ``-0.0`` to ``+0.0`` in float/double columns, above the
    aggregate so ``PushedAggregation`` is untouched.

    Parquet writers spec-conformantly normalize a zero MIN statistic to
    ``-0.0`` in the row-group footer (and a zero MAX to ``+0.0``) even
    when every data page holds ``+0.0`` — pyarrow demonstrably does
    (tests/test_pushdown.py plants one) — so the metadata path and the
    scan path disagree on zero SIGN while agreeing on value. A scan
    (and any SQL oracle) answers ``+0.0``; the round-12 driver hash
    distinguished them. ``WHEN col = 0.0 THEN typed +0.0`` fires for
    both zero signs (IEEE ``-0.0 == 0.0``) and, unlike ``+ lit(0.0)``,
    preserves integer/decimal column types instead of widening them to
    double. Applied only to float/double outputs — the only types with
    a signed zero.

    This is a declared CONTRACT, not just a footer workaround: footer
    stats report any zero as ``+0.0`` even when the DATA's true
    min/max is ``-0.0`` (both zeros are numerically equal; only the
    hash-compare distinguishes them). The registered oracles mirror it
    (``min(col) + 0.0`` on double columns — IEEE addition normalizes
    the sign and changes nothing else), so a source that genuinely
    contains ``-0.0`` stays oracle-green under the driver's
    sign-strict value hash."""
    exprs = []
    for field in df.schema.fields:
        if isinstance(field.dataType, (FloatType, DoubleType)):
            c = F.col(field.name)
            zero = F.lit(0.0).cast(field.dataType)
            exprs.append(F.when(c == zero, zero).otherwise(c).alias(field.name))
        else:
            exprs.append(F.col(field.name))
    return df.select(*exprs)


def read_parquet_v2(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` resolved as a DSv2 ``BatchScan`` relation.

    The v1-source list is flipped only around the (eager) relation
    resolution and restored in a ``finally``, so subsequent reads keep
    the default v1 path (single-threaded driver assumption — see the
    module docstring for the concurrent-caller caveat). Runtime confs are re-asserted
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
    pushdown (same all-or-nothing rule as non-numeric min/max).

    Partition columns come back as STRING — exactly the directory-name
    round trip. Spark's default ``partitionColumnTypeInference`` would
    instead guess a type from the VALUE ('2021' → int, 'true' →
    boolean), so a string source column holding a numeric-looking
    value would silently change type (and group identity under a
    typed value hash) across the layout round trip. The flip is
    scoped to the (eager) relation resolution, same discipline as
    :func:`read_parquet_v2`'s v1-list flip; callers whose partition
    column genuinely held a non-string type cast it back — str() of
    an int/bool round-trips exactly through the directory name."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    infer_conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old = spark.conf.get(infer_conf)
    spark.conf.set(infer_conf, "false")
    try:
        rel = read_parquet_v2(spark, path)
    finally:
        spark.conf.set(infer_conf, old)
    agg = rel.groupBy(*group_cols).agg(*aggs)
    return _normalize_signed_zero(agg)


def events_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type footer stats over a Hive-partitioned events
    layout — the registered :func:`partition_stats` (``PushedGroupBy``)
    leg. The 100 TB shape: a corpus laid out ``event_type=click/…``
    answers its per-slice profile (count + numeric min/max) from
    directory listing + footers alone, zero data pages.

    The partitioned layout is MATERIALIZED ONCE into a local cache dir
    keyed by the source file's identity (path + size + mtime, so a
    regenerated testdata set can never serve a stale layout) via
    ``write_partitioned_corpus`` (one shuffle on the partition column,
    one file per partition value). Every subsequent invocation — the
    driver's compare run, bench's repeats — is footers-only. Equals
    ``SELECT event_type, count(*), min/max(...) FROM events GROUP BY
    event_type`` by construction, which is exactly the DuckDB oracle:
    the oracle needs no hive_partitioning, because a
    repartition-by-column round trip preserves group contents — FOR
    PARTITIONABLE KEYS. Hive directory encoding cannot round-trip
    empty-string or NULL partition values distinctly (both collapse
    into ``__HIVE_DEFAULT_PARTITION__`` and read back as NULL), so the
    materialization step checks ONCE for such values and, if any
    exist, drops an ``_UNPARTITIONABLE`` marker instead of a layout —
    every invocation then answers via the direct grouped aggregate
    over the source (correct on any input; only the footers-only fast
    path is forfeited, exactly for the sources that cannot have it).

    Cache hygiene (round-14 advisor finding): the cache lives under
    the OWNER-PRIVATE identity-keyed cache (sources/cache.py — 0700
    root verified on every use, atomic rename publish, pid-suffixed
    temp build, version tag ``v2`` so pre-hardening entries are never
    consulted)."""
    import os

    from .cache import ensure_cached, identity_cache_dir
    from .registry import write_partitioned_corpus

    src = os.path.join(sf_dir, "events.parquet")
    cache = identity_cache_dir("events_by_type", src, "v2")
    unpartitionable = os.path.join(cache, "_UNPARTITIONABLE")

    def direct_agg() -> DataFrame:
        return _normalize_signed_zero(
            spark.read.parquet(src)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                *[
                    f
                    for c in ("event_id", "user_id", "value")
                    for f in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))
                ],
            )
        )

    def build(tmp: str) -> None:
        # plain v1 read of the SOURCE columns: ts/props dropped — the
        # stats query never touches them, so neither should the layout
        df = spark.read.parquet(src).select("event_id", "user_id", "value", "event_type")
        bad = df.where(
            F.col("event_type").isNull() | (F.col("event_type") == "")
        ).limit(1)
        if bad.count():
            # ''/NULL can't round-trip a Hive directory name (both read
            # back as NULL) — mark once, answer directly forever
            os.makedirs(tmp, exist_ok=True)
            with open(os.path.join(tmp, "_UNPARTITIONABLE"), "w", encoding="utf-8") as fh:
                fh.write("empty-string or NULL event_type: Hive layout would merge groups")
        else:
            write_partitioned_corpus(df, tmp, "event_type")

    ensure_cached(cache, build)
    if os.path.exists(unpartitionable):
        return direct_agg()
    if not any(e.startswith("event_type=") for e in os.listdir(cache)):
        # zero-row source: partitionBy wrote no leaf dirs, so the
        # layout has no files to infer a schema from. The grouped
        # aggregate over the (empty) source is the same empty relation
        # with the same column names/types — still zero data pages.
        return direct_agg()
    return partition_stats(
        spark, cache, ["event_type"], ["event_id", "user_id", "value"]
    )
