"""Runtime Bloom-filter semi-join reduction — a 100 TB posture proof.

On a real cluster, a selective dimension filter joined against a huge
fact table should not ship every fact row to the shuffle: Spark's
runtime bloom filter (SPARK-32268) builds a sketch of the creation
side's join keys and injects `bloom_filter_might_contain` into the
fact scan's filter, cutting shuffle volume before the join. The
feature only engages above size thresholds (application side ≥ 10 GB
by default), so fixtures never trigger it implicitly — these tests
lower the thresholds to force the rewrite and prove (a) the predicate
is actually injected under our join shapes and (b) results are
bit-identical with and without it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gomapreduce_spark.sources.registry import load_table

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # fixture-sized "fact" side: drop the 10 GB application-side floor
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # keep the join a shuffle join — a broadcast join needs no bloom
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_confs(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _selective_join(spark, sf_dir):
    """lineitem (fact) x a hard-filtered orders slice (creation side)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 200_000)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("qty"),
        )
    )


def test_bloom_filter_is_injected_into_fact_scan(spark, sf_med, bloom_confs):
    df = _selective_join(spark, sf_med)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the rewrite shows as a scalar-subquery bloom_filter_agg on the
    # creation side and a might_contain predicate on the fact side
    assert "might_contain" in plan, plan[:2000]
    assert "bloom_filter_agg" in plan, plan[:2000]


def test_bloom_filter_preserves_results(spark, sf_med, bloom_confs):
    with_bloom = {tuple(r) for r in _selective_join(spark, sf_med).collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = {tuple(r) for r in _selective_join(spark, sf_med).collect()}
    assert with_bloom == without
    assert with_bloom, "vacuous: the selective slice matched nothing"
