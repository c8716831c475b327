"""Parquet aggregate pushdown (sources/pushdown.py): COUNT/MIN/MAX
answered from row-group footer statistics.

The reference engine's only way to count records is to map over every
chunk (inputer.go:33-43); the footer-stats path must return exactly
what a full scan would — pinned here against an ordinary v1 read —
while the plan proves the data pages were never touched
(PushedAggregation on a DSv2 BatchScan), and the conf plumbing must
not leak: the v1-source list is restored even on failure, and the
pushdown must survive downstream re-planning (new QueryExecutions off
the same DataFrame), since the driver and bench both wrap the
returned frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gomapreduce_spark.sources.pushdown import (
    _V1_LIST_CONF,
    footer_stats,
    partition_stats,
    read_parquet_v2,
)

from conftest import SF_MED

_PATH = f"{SF_MED}/lineitem.parquet"
_COLS = ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_footer_stats_matches_full_scan(spark):
    got = footer_stats(spark, _PATH, _COLS).collect()
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _COLS:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    ref = spark.read.parquet(_PATH).agg(*aggs).collect()
    assert got == ref


def test_pushdown_reaches_the_scan_and_survives_replanning(spark):
    df = footer_stats(spark, _PATH, _COLS)
    assert "PushedAggregation" in _plan(df)
    assert "BatchScan" in _plan(df)
    # a wrapper builds a NEW QueryExecution — the session-default
    # aggregatePushdown conf must re-apply it (the driver's compare
    # harness and bench's noop write both replan exactly like this)
    wrapped = df.select("n_rows", "max_l_extendedprice")
    assert "PushedAggregation" in _plan(wrapped)


def test_v1_list_restored_even_on_failure(spark):
    before = spark.conf.get(_V1_LIST_CONF)
    assert "parquet" in before
    read_parquet_v2(spark, _PATH)
    assert spark.conf.get(_V1_LIST_CONF) == before
    with pytest.raises(Exception):
        read_parquet_v2(spark, f"{SF_MED}/no_such_table.parquet")
    assert spark.conf.get(_V1_LIST_CONF) == before


def test_ordinary_reads_stay_v1(spark):
    """The session-default aggregatePushdown conf must be inert for the
    registry's v1 path: same aggregate over a plain read plans as a
    FileScan with no pushed aggregation."""
    df = spark.read.parquet(_PATH).agg(F.count(F.lit(1)).alias("n"))
    p = _plan(df)
    assert "PushedAggregation" not in p
    assert "FileScan" in p


def test_pushdown_declines_filtered_aggregates(spark):
    """Footer stats cannot answer a filtered count — Spark must fall
    back to a real scan (correct, just not metadata-only). Pins the
    envelope so a future 'optimization' filtering inside footer_stats
    fails loudly. The decline prints as an EMPTY PushedAggregation
    list on the scan."""
    df = (
        read_parquet_v2(spark, _PATH)
        .where(F.col("l_quantity") > 10)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "PushedAggregation: [COUNT" not in _plan(df)
    ref = (
        spark.read.parquet(_PATH)
        .where(F.col("l_quantity") > 10)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert df.collect() == ref


def test_partition_grouped_pushdown(spark, tmp_path):
    """GROUP BY a Hive PARTITION column pushes down too
    (PushedGroupBy next to PushedAggregation — each leaf directory's
    footers hold its group's stats); grouping by a DATA column
    declines, falling back to a correct full scan."""
    from gomapreduce_spark.sources.registry import (
        load_table,
        write_partitioned_corpus,
    )

    path = str(tmp_path / "corpus")
    docs = load_table(spark, SF_MED, "documents").select("doc_id", "lang", "source")
    write_partitioned_corpus(docs, path, "lang")

    by_part = partition_stats(spark, path, ["lang"], ["doc_id"])
    p = _plan(by_part)
    assert "PushedAggregation: [COUNT" in p and "PushedGroupBy" in p
    ref = (
        spark.read.parquet(path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )
    key = lambda r: r["lang"]  # noqa: E731
    assert sorted(by_part.collect(), key=key) == sorted(ref.collect(), key=key)

    by_data_col = partition_stats(spark, path, ["source"], ["doc_id"])
    assert "PushedAggregation: [COUNT" not in _plan(by_data_col)
    ref2 = (
        spark.read.parquet(path)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )
    key2 = lambda r: r["source"]  # noqa: E731
    assert sorted(by_data_col.collect(), key=key2) == sorted(ref2.collect(), key=key2)


def test_pushdown_declines_non_numeric_minmax(spark):
    """DSv2 parquet aggregate pushdown is all-or-nothing and supports
    only numeric min/max: one timestamp (or string) column in the
    aggregate list declines the WHOLE pushdown, silently falling back
    to a full scan. Pinned so the registered footer-stats query's
    numeric-only column set is a checked constraint, not folklore —
    anyone extending it to l_shipdate would flip this test before
    shipping a silent full scan as a 'metadata' query."""
    declined = footer_stats(spark, _PATH, ["l_orderkey", "l_shipdate"])
    assert "PushedAggregation: [COUNT" not in _plan(declined)
    pushed = footer_stats(spark, _PATH, ["l_orderkey"])
    assert "PushedAggregation: [COUNT" in _plan(pushed)
    # the fallback is still CORRECT, just not footer-only
    ref = spark.read.parquet(_PATH).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_l_orderkey"),
        F.max("l_orderkey").alias("max_l_orderkey"),
        F.min("l_shipdate").alias("min_l_shipdate"),
        F.max("l_shipdate").alias("max_l_shipdate"),
    )
    assert declined.collect() == ref.collect()


def test_planted_negative_zero_footer_stat_normalized(spark, tmp_path):
    """The round-12 driver failure, reproduced and pinned: parquet
    writers spec-conformantly normalize a zero MIN statistic to -0.0
    in the row-group footer even when every data page holds +0.0
    (pyarrow does exactly this — asserted below by reading the footer
    bytes back), so the metadata path answered min = -0.0 while a data
    scan (and the DuckDB oracle) answered +0.0, and the driver's value
    hash distinguishes zero signs. footer_stats must return the
    metadata answer bit-for-bit equal to the scan answer — including
    copysign — via the post-aggregate signed-zero projection, which
    sits ABOVE the aggregate so PushedAggregation survives."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "zero_stat.parquet")
    # +0.0 is the true minimum; no -0.0 anywhere in the DATA
    pq.write_table(
        pa.table({"v": pa.array([0.0, 1.5, 2.5], type=pa.float64())}), path
    )
    stat_min = pq.ParquetFile(path).metadata.row_group(0).column(0).statistics.min
    assert stat_min == 0.0 and math.copysign(1.0, stat_min) == -1.0, (
        "precondition: the writer no longer plants a -0.0 footer min; "
        "this test needs a file whose footer stat disagrees with its pages"
    )

    df = footer_stats(spark, path, ["v"])
    assert "PushedAggregation: [COUNT" in _plan(df)  # fix didn't break pushdown
    [row] = df.collect()
    [scan] = (
        spark.read.parquet(path)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    )
    assert row == scan
    # Row equality treats -0.0 == 0.0 — the driver's hash does NOT, so
    # assert the sign bit explicitly on both paths
    assert math.copysign(1.0, row["min_v"]) == 1.0
    assert math.copysign(1.0, scan["min_v"]) == 1.0
    # and planted -0.0 DATA normalizes on both paths too (scan min of
    # [-0.0, 1.0] is -0.0 at the aggregate; the projection collapses it)
    path2 = str(tmp_path / "zero_data.parquet")
    pq.write_table(
        pa.table({"v": pa.array([-0.0, 1.0], type=pa.float64())}), path2
    )
    [row2] = footer_stats(spark, path2, ["v"]).collect()
    assert math.copysign(1.0, row2["min_v"]) == 1.0


def test_signed_zero_projection_preserves_integer_types(spark):
    """`+ lit(0.0)` would have widened min/max of integer columns to
    double and broken the registered query's schema against its
    oracle; the WHEN-based projection must keep l_orderkey's long."""
    df = footer_stats(spark, _PATH, _COLS)
    dt = dict(df.dtypes)
    assert dt["min_l_orderkey"] == "bigint" and dt["max_l_orderkey"] == "bigint"
    assert dt["min_l_discount"] == "double"


def test_events_partition_stats_cache_keyed_by_source_identity(spark, tmp_path):
    """The materialized Hive layout is keyed by the source file's
    (path, size, mtime): rewriting the source at the same path must
    MISS the cache and rebuild, never serve the old layout's stats."""
    import os
    import shutil

    from gomapreduce_spark.sources.pushdown import events_partition_stats

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    ev = spark.createDataFrame(
        [(1, 10, 1.0, "click"), (2, 11, 2.0, "view")],
        "event_id long, user_id long, value double, event_type string",
    )
    ev.coalesce(1).write.parquet(str(tmp_path / "ev1"))
    src = [f for f in os.listdir(str(tmp_path / "ev1")) if f.endswith(".parquet")][0]
    shutil.copyfile(str(tmp_path / "ev1" / src), f"{sf}/events.parquet")

    first = {r["event_type"]: r["n_rows"] for r in events_partition_stats(spark, sf).collect()}
    assert first == {"click": 1, "view": 1}

    ev2 = spark.createDataFrame(
        [(3, 12, 3.0, "click"), (4, 13, 4.0, "click"), (5, 14, 5.0, "error")],
        "event_id long, user_id long, value double, event_type string",
    )
    ev2.coalesce(1).write.parquet(str(tmp_path / "ev2"))
    src2 = [f for f in os.listdir(str(tmp_path / "ev2")) if f.endswith(".parquet")][0]
    shutil.copyfile(str(tmp_path / "ev2" / src2), f"{sf}/events.parquet")

    second = {r["event_type"]: r["n_rows"] for r in events_partition_stats(spark, sf).collect()}
    assert second == {"click": 2, "error": 1}, "stale cache served after source rewrite"


def test_signed_zero_contract_matches_oracle_side(spark, tmp_path):
    """The normalization is a CONTRACT mirrored by the oracles: when
    the DATA's true min is -0.0, the Spark side reports +0.0 and the
    oracle side's `min(col) + 0.0` reports +0.0 too — bit-equal under
    a sign-strict comparator (the round-13 self-review finding: the
    old oracle SQL would have answered -0.0 and hash-diverged)."""
    import math

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "neg_zero_data.parquet")
    pq.write_table(pa.table({"v": pa.array([-0.0, 3.0], type=pa.float64())}), path)
    [row] = footer_stats(spark, path, ["v"]).collect()
    oracle_min = duckdb.sql(
        f"SELECT min(v) + 0.0 FROM read_parquet('{path}')"
    ).fetchone()[0]
    raw_min = duckdb.sql(f"SELECT min(v) FROM read_parquet('{path}')").fetchone()[0]
    assert math.copysign(1.0, raw_min) == -1.0  # the data genuinely holds -0.0
    assert row["min_v"] == oracle_min == 0.0
    assert math.copysign(1.0, row["min_v"]) == math.copysign(1.0, oracle_min) == 1.0


def test_cache_root_must_be_private(spark, tmp_path, monkeypatch):
    """The layout cache root must be owned by us with no group/other
    access: a pre-created world-writable root (another local user
    squatting the predictable path) is an ERROR, never trusted — and a
    root we created ourselves (0700) is accepted."""
    import os
    import tempfile

    import pytest

    from gomapreduce_spark.sources.pushdown import events_partition_stats

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    ev = spark.createDataFrame(
        [(1, 10, 1.0, "click")],
        "event_id long, user_id long, value double, event_type string",
    )
    ev.coalesce(1).write.parquet(str(tmp_path / "ev"))
    src = [f for f in os.listdir(str(tmp_path / "ev")) if f.endswith(".parquet")][0]
    import shutil

    shutil.copyfile(str(tmp_path / "ev" / src), f"{sf}/events.parquet")

    fake_tmp = str(tmp_path / "faketmp")
    os.makedirs(fake_tmp)
    monkeypatch.setattr(tempfile, "tempdir", fake_tmp)
    root = os.path.join(fake_tmp, f"gomapreduce_spark_cache_u{os.getuid()}")
    os.makedirs(root)
    os.chmod(root, 0o777)
    with pytest.raises(RuntimeError, match="private directory"):
        events_partition_stats(spark, sf)
    os.chmod(root, 0o700)
    rows = {r["event_type"]: r["n_rows"] for r in events_partition_stats(spark, sf).collect()}
    assert rows == {"click": 1}


def test_partition_stats_string_keys_survive_numeric_looking_values(spark, tmp_path):
    """partitionColumnTypeInference is disabled for the layout read: a
    STRING partition value that LOOKS numeric/boolean ('2021', 'true')
    must round-trip as the identical string, not an inferred int/bool
    (the round-14 advisor finding — the type flip would diverge from
    the GROUP BY oracle's VARCHAR key under a typed value hash)."""
    from gomapreduce_spark.sources.registry import write_partitioned_corpus

    path = str(tmp_path / "layout")
    df = spark.createDataFrame(
        [(1, "2021"), (2, "true"), (3, "0.5"), (4, "plain")],
        "doc_id long, tag string",
    )
    write_partitioned_corpus(df, path, "tag")
    got = partition_stats(spark, path, ["tag"], ["doc_id"])
    assert dict(got.dtypes)["tag"] == "string"
    assert {r["tag"] for r in got.collect()} == {"2021", "true", "0.5", "plain"}


def test_events_partition_stats_unpartitionable_values_fall_back(spark, tmp_path):
    """Hive directory encoding cannot round-trip '' or NULL partition
    values (both collapse into __HIVE_DEFAULT_PARTITION__ and read
    back as NULL, merging distinct groups): a source containing either
    must be detected ONCE, marked _UNPARTITIONABLE, and answered via
    the direct grouped aggregate — with '' and NULL kept as distinct
    groups, exactly like the GROUP BY oracle."""
    import os
    import shutil

    from gomapreduce_spark.sources.pushdown import events_partition_stats

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    ev = spark.createDataFrame(
        [(1, 10, 1.0, "click"), (2, 11, 2.0, ""), (3, 12, 3.0, None)],
        "event_id long, user_id long, value double, event_type string",
    )
    ev.coalesce(1).write.parquet(str(tmp_path / "ev"))
    src = [f for f in os.listdir(str(tmp_path / "ev")) if f.endswith(".parquet")][0]
    shutil.copyfile(str(tmp_path / "ev" / src), f"{sf}/events.parquet")

    rows = {r["event_type"]: r["n_rows"] for r in events_partition_stats(spark, sf).collect()}
    assert rows == {"click": 1, "": 1, None: 1}, rows
    # the marker exists and no Hive layout was written
    import hashlib
    import tempfile

    st = os.stat(f"{sf}/events.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(sf + '/events.parquet')}|{st.st_size}|{st.st_mtime_ns}|v2".encode()
    ).hexdigest()[:16]
    cache = os.path.join(
        tempfile.gettempdir(),
        f"gomapreduce_spark_cache_u{os.getuid()}",
        f"events_by_type_{key}",
    )
    assert os.path.exists(os.path.join(cache, "_UNPARTITIONABLE"))
    assert not any(e.startswith("event_type=") for e in os.listdir(cache))
    # second invocation takes the marker path (no rebuild, same answer)
    rows2 = {r["event_type"]: r["n_rows"] for r in events_partition_stats(spark, sf).collect()}
    assert rows2 == rows
