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


def _assert_index_scan_feeds_join_unshuffled(plan: str, table_marker: str) -> None:
    """Walk the formatted-plan tree upward from the named table's scan:
    narrow nodes (Filter/Project/Sort) may sit between scan and join,
    but an Exchange must not — the bucketed index side never moves."""
    assert "Bucketed: true" in plan, plan[:1200]
    tree = plan.splitlines()
    scan_line = next(i for i, l in enumerate(tree) if table_marker in l and "Scan" in l)
    indent = tree[scan_line].index("+-")
    j = scan_line
    while True:
        j = next(
            jj for jj in range(j - 1, -1, -1)
            if ("+-" in tree[jj] and tree[jj].index("+-") < indent)
            or (":-" in tree[jj] and tree[jj].index(":-") < indent)
        )
        line = tree[j]
        indent = line.index("+-") if "+-" in line else line.index(":-")
        assert "Exchange" not in line, f"index side shuffled: {line}"
        if "Join" in line:
            break


def test_signature_index_join_reads_index_colocated(spark, sf_small):
    """The standing dedup index (save_signature_index) must join each
    arriving batch WITHOUT shuffling the index side: the bucketed scan
    feeds the band join directly, so per-batch cost is O(|batch|)
    regardless of index size. Also asserts output parity with the
    single-input incremental_dedup on the equivalent split."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.operators import dedup

    docs = load_table(spark, sf_small, "documents")
    is_new = F.col("doc_id") % 5 == 0
    spark.sql("DROP TABLE IF EXISTS sig_index")
    try:
        dedup.save_signature_index(docs.where(~is_new), "sig_index", buckets=8)
        got = dedup.incremental_dedup_against_index(docs.where(is_new), "sig_index")

        # plan shape: the index scan's DIRECT parent in the tree must be
        # the join (or its sort) — never an Exchange. Only the new-batch
        # side is allowed to move.
        _assert_index_scan_feeds_join_unshuffled(plan_str(got), "default.sig_index")

        want = {tuple(r) for r in dedup.incremental_dedup(docs).collect()}
        have = {tuple(r) for r in got.collect()}
        assert have == want
        assert any(r[3] for r in have)  # non-vacuous: at least one dup found
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_index")


def test_contamination_index_broadcast_path_never_shuffles_train(spark, sf_small):
    """Standing-benchmark contamination index (round-13 verdict item
    4), default broadcast path: the train side must reach the join
    with ZERO shuffle Exchange — the only hashpartitioning exchanges
    in the whole plan are the doc_id-keyed interval-union window /
    rollup AFTER the join. Output parity with the single-input
    contamination_spans on the same split."""
    import re

    from pyspark.sql import functions as F

    from gomapreduce_spark.operators import dedup

    docs = load_table(spark, sf_small, "documents")
    is_bench = F.col("doc_id") % 43 == 0
    spark.sql("DROP TABLE IF EXISTS contam_idx")
    try:
        dedup.save_contamination_index(docs.where(is_bench), "contam_idx", buckets=8)
        got = dedup.contamination_against_index(docs.where(~is_bench), "contam_idx")
        plan = plan_str(got)
        assert "BroadcastHashJoin" in plan, plan[:1200]
        for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "doc_id" in keys, f"non-rollup shuffle: {keys}"

        want = {tuple(r) for r in dedup.contamination_spans(docs).collect()}
        have = {tuple(r) for r in got.collect()}
        assert have == want
        assert have  # non-vacuous: the fixture plants real collisions
    finally:
        spark.sql("DROP TABLE IF EXISTS contam_idx")


def test_contamination_index_sortmerge_fallback_reads_index_colocated(spark, sf_small):
    """The oversized-eval-union fallback (broadcast_index=False with
    auto-broadcast off): the join degrades to sort-merge, and the
    BUCKETED index scan must still feed it without an Exchange — only
    the arriving batch moves. Values identical to the broadcast path."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.operators import dedup

    docs = load_table(spark, sf_small, "documents")
    is_bench = F.col("doc_id") % 43 == 0
    spark.sql("DROP TABLE IF EXISTS contam_idx2")
    thresh_conf = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(thresh_conf, None)
    try:
        dedup.save_contamination_index(docs.where(is_bench), "contam_idx2", buckets=8)
        spark.conf.set(thresh_conf, "-1")
        got = dedup.contamination_against_index(
            docs.where(~is_bench), "contam_idx2", broadcast_index=False
        )
        plan = plan_str(got)
        assert "SortMergeJoin" in plan, plan[:1200]
        _assert_index_scan_feeds_join_unshuffled(plan, "default.contam_idx2")
        want = {tuple(r) for r in dedup.contamination_spans(docs).collect()}
        assert {tuple(r) for r in got.collect()} == want
    finally:
        if old is None:
            spark.conf.unset(thresh_conf)
        else:
            spark.conf.set(thresh_conf, old)
        spark.sql("DROP TABLE IF EXISTS contam_idx2")
