"""Write-side bucketing: the co-located join path from SCALE.md.

Bucketing both fact tables by the join key at write time lets the join
run with ZERO Exchange nodes — the shuffle is paid once at layout time
and amortized over every subsequent join. This is the 100 TB answer to
repeated orders-lineitem joins; the test asserts the plan shape, not
just the result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gomapreduce_spark.sources.registry import load_table
from tools.explain_audit import plan_str


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    # default warehouse dir (./spark-warehouse, gitignored); static conf
    # can't be changed on the shared session
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    for name, df, key in [("b_orders", orders, "o_orderkey"), ("b_lineitem", lineitem, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(name)
    yield "b_orders", "b_lineitem"
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = spark.table(ot)
    l = spark.table(lt)
    joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )
    plan = plan_str(joined)
    import re

    joins_region = plan.split("HashAggregate")[0]
    assert "Exchange" not in joins_region.split("SortMergeJoin")[0], plan[:800]
    # the join itself reads bucketed scans — no Exchange feeds it
    n_exchanges_before_agg = len(re.findall(r"\(\d+\) Exchange", plan))
    # only the final single-row aggregate may shuffle
    assert n_exchanges_before_agg <= 1, plan[:1200]


def test_bucketed_join_matches_unbucketed(spark, sf_small, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        spark.table(ot)
        .join(spark.table(lt), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert {tuple(r) for r in bucketed.collect()} == {tuple(r) for r in plain.collect()}
