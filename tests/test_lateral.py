"""lateral_topk_orders: the ANSI correlated-LATERAL surface must (a)
produce exactly the window-idiom top-k per correlation key, and (b)
decorrelate in the physical plan — WindowGroupLimit + an equi-join,
never a per-row nested-loop re-scan."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def test_lateral_matches_window_idiom(spark, sf_small):
    from gomapreduce_spark.operators.relational import lateral_topk_orders
    from gomapreduce_spark.sources.registry import load_table

    customer = load_table(spark, sf_small, "customer")
    orders = load_table(spark, sf_small, "orders")
    got = {
        (r.c_custkey, r.o_orderkey, r.o_totalprice)
        for r in lateral_topk_orders(customer, orders).collect()
    }
    rk = F.row_number().over(
        W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )
    want = {
        (r.o_custkey, r.o_orderkey, r.o_totalprice)
        for r in orders.where(F.col("o_custkey") % 50 == 0)
        .join(customer.select(F.col("c_custkey").alias("o_custkey")), "o_custkey")
        .withColumn("rk", rk)
        .where(F.col("rk") <= 3)
        .collect()
    }
    assert got == want and len(got) > 0


def test_lateral_decorrelates(spark, sf_small):
    from gomapreduce_spark.operators.relational import lateral_topk_orders
    from gomapreduce_spark.sources.registry import load_table
    from tools.explain_audit import plan_str

    plan = plan_str(
        lateral_topk_orders(
            load_table(spark, sf_small, "customer"), load_table(spark, sf_small, "orders")
        )
    )
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
