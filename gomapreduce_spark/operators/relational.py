"""Relational operator set: scans, filters, aggregations, joins, windows,
top-k, rollup, set ops.

The reference has none of these (SURVEY §2.2 — no joins, no window
functions, no sorts, no set ops); they are the driver-mandated analytics
surface, expressed declaratively so Catalyst supplies predicate
pushdown, column pruning, partial aggregation, and join-strategy
selection (broadcast for the dimension tables here).

Scale notes per operator are inline; the common themes:
- FIXED-size dimensions (nation: 25 rows, region: 5 rows, 1-row scalar
  aggregates) carry explicit ``F.broadcast`` hints — bounded by
  construction at any SF;
- SF-SCALING dimensions (customer/supplier/part grow linearly with the
  corpus) are joined UNHINTED: at sf0.1 Spark's size stats / AQE pick
  BroadcastHashJoin anyway (pinned by tools/explain_audit.py, which
  forbids mandatory hints on these sides and asserts the EXECUTED AQE
  plan still broadcasts at test scale), while at SF≈100k — where a
  filtered customer side is ~3B rows — the same code degrades to a
  shuffled join instead of an executor OOM;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  AQE handles skew;
- top-k is window row_number ≤ k (one shuffle, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-style pricing summary: one scan, grouped aggregate with
    partial aggregation; the shipdate filter is pushed to the parquet scan."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6-style: pure filter + scalar aggregate. Exists to prove
    pushdown — every predicate reaches the scan, output is one row."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def q3_top_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10) -> DataFrame:
    """TPC-H Q3-style shipping priority: join the filtered customer dim
    into orders (unhinted — customer scales with SF; AQE broadcasts it
    while small), shuffle-join lineitem on orderkey, top-k by revenue.

    Top-k is ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
    the distributed partial top-k (every partition keeps its local k,
    the driver merges k·partitions rows), so NO stage ever moves the
    full aggregate through one task. The rank column is derived AFTER
    the limit, where the window input is exactly k rows. Deterministic
    total ordering (revenue desc, orderkey asc) makes limit and
    row_number agree under ties across engines."""
    cust = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    # Pre-aggregate lineitem revenue per orderkey BEFORE the join: the
    # fact shuffle then carries |orders| aggregated rows instead of
    # |lineitem| raw rows (~4x smaller here). Trade-off: revenue is
    # computed for orders the filters will drop; when the order-side
    # filters are highly selective, filtering first (join then agg) can
    # win — measured at sf0.1 (~100% date pass, 20% segment pass),
    # pre-agg is ~25% faster.
    rev = lineitem.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    revenue = (
        orders.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(rev, F.col("o_orderkey") == rev.l_orderkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
    )
    order = [F.col("revenue").desc(), F.col("o_orderkey").asc()]
    return (
        revenue.orderBy(*order)
        .limit(k)  # TakeOrderedAndProject: distributed partial top-k
        .withColumn("rk", F.row_number().over(W.orderBy(*order)).cast("long"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
            "rk",
        )
    )


def q5_local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5-style: six-table join, revenue per nation where customer
    and supplier share the nation. nation⋈region is a hinted broadcast
    (fixed 25/5 rows); supplier/customer join UNHINTED (SF-scaling —
    AQE broadcasts them at test scale, shuffles at 100 TB); the only
    guaranteed shuffles are orders⋈lineitem and the final aggregate."""
    nations = (
        nation.join(F.broadcast(region.where(F.col("r_name").isin("ASIA", "AMERICA"))),
                    nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    return (
        lineitem
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nations), F.col("s_nationkey") == nations.n_nationkey)
        .join(orders.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        ), lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, (F.col("o_custkey") == customer.c_custkey)
              & (customer.c_nationkey == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def topk_per_group(lineitem: DataFrame, k: int = 5) -> DataFrame:
    """Top-k rows per group via partitioned row_number — the standard
    scale-out top-k (no global sort; each group sorts locally after one
    hash shuffle). Deterministic tie-break on (price desc, orderkey,
    linenumber)."""
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        lineitem.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    )


def rollup_revenue(lineitem: DataFrame) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — grouping-set aggregation
    with NULL-marked subtotal rows, single pass."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, since: str = "1998-01-01"
) -> DataFrame:
    """Anti-join (NOT EXISTS): customers with no orders since the cutoff
    (churn candidates), counted per market segment. The date filter is
    pushed to the orders scan before the anti-join; Catalyst broadcasts
    whichever side is small enough. (Without the cutoff every customer
    has an order and the result is empty — a useless check.)"""
    recent = orders.where(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def big_spenders_semi_join(customer: DataFrame, orders: DataFrame, min_total: float = 450_000.0) -> DataFrame:
    """Semi-join (EXISTS): customers having at least one order above the
    threshold, per market segment with their average account balance.
    left_semi keeps the probe side only — no row multiplication however
    many qualifying orders a customer has."""
    big = orders.where(F.col("o_totalprice") > min_total)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"))
    )


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q17-style: avg yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) weren't filled, for one
    brand.

    The correlated scalar subquery (per-part avg over *all* lineitems)
    is decorrelated into an explicit aggregate + unhinted dim join — the
    plan Catalyst would rewrite to anyway, stated directly so the
    fact table is scanned exactly twice (once for thresholds, once for
    revenue) with both scans column-pruned."""
    thresholds = lineitem.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    brand_parts = part.where(F.col("p_brand") == brand).select("p_partkey")
    return (
        lineitem.join(brand_parts, lineitem.l_partkey == brand_parts.p_partkey)
        .join(thresholds, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q4_late_shipments(orders: DataFrame, lineitem: DataFrame, grace_days: int = 60) -> DataFrame:
    """TPC-H Q4-flavored: per order priority, how many orders had at
    least one line item shipped more than ``grace_days`` past the order
    date (the fixture lacks commit/receipt dates, so lateness is
    ship-vs-order). EXISTS with a correlated inter-column predicate —
    expressed as a left-semi join so each order counts once no matter
    how many late lines it has."""
    o = orders.select("o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("timestamp").alias("o_ts"))
    l = lineitem.select("l_orderkey", F.col("l_shipdate").cast("timestamp").alias("s_ts"))
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.unix_micros("s_ts") > F.unix_micros("o_ts") + grace_days * 86_400_000_000),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_late_orders"))


def q10_returned_items(customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 20) -> DataFrame:
    """TPC-H Q10-style: top-k customers by revenue lost to returned
    items ('R' flag). Fact-fact shuffle join + unhinted customer dim
    join (AQE broadcasts at test scale) +
    distributed top-k: ``orderBy().limit(k)`` plans
    TakeOrderedAndProject (per-partition partial top-k, driver merge of
    k·partitions rows — never the full customer set through one task);
    rk is derived post-limit over exactly k rows."""
    rev = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    joined = rev.join(customer, rev.o_custkey == customer.c_custkey)
    order = [F.col("revenue").desc(), F.col("c_custkey").asc()]
    return (
        joined.orderBy(*order)
        .limit(k)  # TakeOrderedAndProject: distributed partial top-k
        .withColumn("rk", F.row_number().over(W.orderBy(*order)).cast("long"))
        .select("c_custkey", "c_name", "c_mktsegment", "revenue", "rk")
    )


def q14_promo_revenue(
    lineitem: DataFrame, part: DataFrame, start: str = "1997-01-01", end: str = "1998-01-01"
) -> DataFrame:
    """TPC-H Q14-style: share of revenue from promotional parts in a
    ship-date window. Conditional aggregation (CASE inside SUM) over a
    part join (unhinted — part scales with SF; AQE broadcasts it while
    small) — one fact scan; the date range is pushed to the parquet scan."""
    price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .join(part.select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", price).otherwise(F.lit(0.0))) / F.sum(price),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_volume_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    min_qty: float = 300.0, k: int = 20,
) -> DataFrame:
    """TPC-H Q18-style: top-k largest orders by total line-item quantity
    (HAVING-filtered aggregate subquery). The quantity rollup shuffles
    lineitem once on orderkey and the HAVING filter drops ~99% of groups
    BEFORE the orders join, so the join probe side is tiny; the customer
    join is unhinted (AQE broadcasts at test scale); top-k is
    TakeOrderedAndProject (per-partition
    partial top-k, never the full order set through one task)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    joined = (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
    )
    order = [F.col("total_qty").desc(), F.col("o_orderkey").asc()]
    return (
        joined.orderBy(*order)
        .limit(k)  # TakeOrderedAndProject: distributed partial top-k
        .withColumn("rk", F.row_number().over(W.orderBy(*order)).cast("long"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
            "rk",
        )
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-style: revenue from three OR'd brand/size/quantity
    bands. Exercises disjunctive predicate handling — the shared
    equi-key (partkey) keeps this a single equi-join (AQE-broadcast at
    test scale) with the
    disjunction evaluated as a post-join filter; no plan split, no
    nested-loop fallback. Catalyst extracts the common l_quantity
    bounds (1..30) as a pushable conjunct from the OR."""
    price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        lineitem.join(
            part.select("p_partkey", "p_brand", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where(cond)
        .agg(
            F.round(F.sum(price), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q16_supplier_part_counts(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q16-style: distinct suppliers able to supply each
    (brand, type, size) bucket, for selected sizes and excluding one
    brand (the fixture has no partsupp table, so lineitem's
    (partkey, suppkey) pairs stand in as the observed supply relation).

    COUNT(DISTINCT) after the part equi-join: Catalyst plans the standard
    two-phase distinct aggregate — partial dedup keyed on
    (group, suppkey) BEFORE the shuffle, then partial/final distinct
    count — so no distinct-set ever materializes per group."""
    sizes = [1, 4, 7, 10, 13, 16, 19, 22]
    p = part.where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13-style custdist: distribution of customers by how many
    qualifying orders they placed, INCLUDING zero-order customers (the
    left outer join is the point of the query shape). The fixture has no
    o_comment, so the 'not special requests' exclusion becomes a
    priority exclusion.

    Scale shape: orders are pre-aggregated to one row per custkey BEFORE
    the outer join, so the join probe carries |customers-with-orders|
    aggregated rows, not |orders| raw rows; the count-of-counts
    re-aggregation shuffles only |distinct c_count| ≤ a few hundred
    rows. No broadcast of the fact side at scale — the custkey join
    shuffles both sides on the key once."""
    qualifying = orders.where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = qualifying.groupBy("o_custkey").agg(F.count("*").alias("c_count"))
    return (
        customer.select("c_custkey")
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q21_suppliers_kept_waiting(
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    grace_days: int = 60,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q21-style: suppliers who were the SOLE late supplier on a
    multi-supplier finished order. The fixture lacks commit/receipt
    dates, so 'late' is shipdate > orderdate + grace (same contract as
    q4_late_shipments); the original's single-nation filter becomes a
    three-nation IN over the synthetic nations.

    The two correlated subqueries (EXISTS another supplier on the order,
    NOT EXISTS another LATE supplier on the order) are decorrelated into
    per-order distinct-supplier counts — the standard rewrite: for a
    late (order, supplier) pair, 'another supplier exists' ⇔
    n_suppliers ≥ 2 and 'no other late supplier' ⇔ n_late_suppliers = 1.
    One lineitem⋈orders shuffle on orderkey feeds both counts and the
    late-pair set; nation is hinted-broadcast into supplier (fixed 25
    rows) but the supplier side itself joins unhinted; top-k is
    TakeOrderedAndProject."""
    o_f = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    l = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = l.join(o_f, l.l_orderkey == o_f.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.unix_micros(F.col("l_shipdate").cast("timestamp"))
            > F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            + grace_days * 86_400_000_000
        ).alias("is_late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_suppliers"),
    )
    late_pairs = lines.where(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    sole_late = (
        late_pairs.join(per_order, "l_orderkey")
        .where((F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1))
    )
    nat = nation.where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
    sup = (
        supplier.join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    numwait = (
        sole_late.join(sup, sole_late.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
    order = [F.col("numwait").desc(), F.col("s_name").asc()]
    return (
        numwait.orderBy(*order)
        .limit(k)  # TakeOrderedAndProject: distributed partial top-k
        .withColumn("rk", F.row_number().over(W.orderBy(*order)).cast("long"))
        .select("s_name", "numwait", "rk")
    )


def q22_global_sales_opportunity(
    customer: DataFrame, orders: DataFrame, since: str = "1998-01-01"
) -> DataFrame:
    """TPC-H Q22-style: per 'country code' bucket, the count and total
    balance of above-average-balance customers with no RECENT orders.
    Two fixture adaptations: no c_phone, so the code is the last digit
    of c_name ('Customer#%09d' → position 18) filtered to the odd
    digits; and every fixture customer has at least one order, so the
    original's 'never ordered' becomes 'no order since the cutoff'
    (same lapsed-customer contract as customers_without_orders — the
    plain NOT EXISTS would be vacuously empty).

    The global scalar-avg subquery is decorrelated into a 1-row
    aggregate broadcast-crossed into the probe (the plan Catalyst
    produces for an uncorrelated scalar subquery); NOT EXISTS is a
    left-anti join against the date-filtered orders key column. One
    customer scan feeds both the avg and the probe; the anti join
    shuffles on custkey (orders side is key-only and column-pruned,
    with the date filter pushed to its scan)."""
    coded = customer.select(
        "c_custkey",
        "c_acctbal",
        F.substring("c_name", 18, 1).alias("cntrycode"),
    ).where(F.col("cntrycode").isin("1", "3", "5", "7", "9"))
    avg_bal = coded.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
    return (
        coded.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    p_type: str = "STANDARD",
    max_size: int = 15,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2-style: for each qualifying part, the regional supplier(s)
    offering the minimum cost, with the correlated MIN subquery
    decorrelated into a per-part window min. The fixture has no partsupp
    table, so 'supply cost' is the minimum extended price the supplier
    ever charged for the part in lineitem — an exact double (no float
    arithmetic), so the min-equality filter is bit-stable across engines.

    Scale shape: the (partkey, suppkey) cost rollup is one partial-agg
    shuffle over lineitem; nation/region hint-broadcast into supplier
    (fixed-size) and the regional supplier set joins the facts UNHINTED
    (region prunes BEFORE the fact join, so non-regional suppliers
    never enter the shuffle); the per-part min is a window over the
    already-aggregated pair rows (|pairs| ≪ |lineitem|), and top-k is
    TakeOrderedAndProject — no global sort."""
    cost = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    reg = region.where(F.col("r_name") == region_name)
    regsup = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = part.where((F.col("p_type") == p_type) & (F.col("p_size") <= max_size)).select(
        "p_partkey", "p_brand"
    )
    pairs = (
        cost.join(parts, cost.l_partkey == parts.p_partkey)
        .join(regsup, cost.l_suppkey == regsup.s_suppkey)
        .withColumn("mincost", F.min("cost").over(W.partitionBy("p_partkey")))
        .where(F.col("cost") == F.col("mincost"))
    )
    order = [
        F.col("s_acctbal").desc(),
        F.col("n_name").asc(),
        F.col("s_name").asc(),
        F.col("p_partkey").asc(),
    ]
    return (
        pairs.orderBy(*order)
        .limit(k)
        .withColumn("rk", F.row_number().over(W.orderBy(*order)).cast("long"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("cost", 2).alias("cost"),
            "rk",
        )
    )


def q7_nation_volume_shipping(
    supplier: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nations by year, in
    both directions — the double-nation-join shape (supplier nation via
    lineitem, customer nation via orders) with the symmetric pair filter.

    Scale shape: the fixed nation dim hint-broadcasts into supplier and
    customer, which pre-filter to the two nations BEFORE touching the
    facts and then join the facts UNHINTED (AQE broadcasts the filtered
    sides at test scale, shuffles at 100 TB); the
    lineitem⋈orders equi-join on orderkey is the one fact-fact shuffle;
    the final group-by is 2 nations × years — tiny."""
    nat = nation.where(F.col("n_name").isin(nation_a, nation_b))
    sup = (
        supplier.join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        customer.join(F.broadcast(nat), customer.c_nationkey == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = lineitem.where(
        F.col("l_shipdate").between("1995-01-01", "1997-12-31 23:59:59")
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q8_market_share(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    p_type: str = "ECONOMY",
    target_nation: str = "NATION_5",
) -> DataFrame:
    """TPC-H Q8-style national market share: the target nation's share
    of regional sales volume for one part type, per order year — the
    conditional-aggregate-ratio shape over a five-table join.

    Scale shape: nation/region hint-broadcast inside the dim prep; the
    part (type-filtered), supplier, and customer sides join the facts
    UNHINTED (AQE-broadcast at test scale); the part filter
    reaches the lineitem join before the orders join, so the fact-fact
    orderkey shuffle carries only the type's lines. The ratio is
    computed inside one aggregate pass (sum of CASE over sum), per year
    — no second scan, no self-join."""
    parts = part.where(F.col("p_type") == p_type).select("p_partkey")
    sup = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    reg = region.where(F.col("r_name") == region_name)
    cust = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("c_custkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(parts, lineitem.l_partkey == parts.p_partkey)
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), lineitem.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(sup, lineitem.l_suppkey == sup.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_word: str = "widget",
) -> DataFrame:
    """TPC-H Q9-style product-type profit by supplier nation and year.
    No partsupp in the fixture, so unit cost is p_retailprice (profit =
    discounted revenue − retailprice × quantity); the part-name LIKE
    filter and the nation × year rollup keep the original's shape.

    Scale shape: nation hint-broadcasts into supplier; the name-filtered
    part and supplier sides join the facts unhinted;
    lineitem⋈orders shuffles on orderkey once; the grouped result is
    |nations| × |years|. The LIKE filter lands in PushedFilters as a
    StringContains on the part scan."""
    parts = part.where(F.col("p_name").contains(name_word)).select("p_partkey", "p_retailprice")
    sup = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    # the subtraction makes this sum land near cent boundaries more often
    # than the pure-revenue queries, and a double sum is order-dependent
    # in its last bits — so accumulate in exact decimal (associative,
    # engine-order-independent) and round the exact total
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(28,6)")
    return (
        lineitem.join(parts, lineitem.l_partkey == parts.p_partkey)
        .join(orders.select("o_orderkey", "o_orderdate"), lineitem.l_orderkey == F.col("o_orderkey"))
        .join(sup, lineitem.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        # round the EXACT decimal (half-away-from-zero in both engines),
        # THEN cast: rounding after a double cast re-introduces the
        # boundary problem (a .725 total has no exact double)
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


def q11_important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    fraction: float = 0.002,
) -> DataFrame:
    """TPC-H Q11-style important stock: parts whose sales value through
    one nation's suppliers exceeds a fraction of that nation's total —
    the scalar-subquery-in-HAVING shape. No partsupp, so value is the
    summed extended price of the nation's lineitem rows per part.

    Scale shape: the nation's supplier keys join the lineitem scan
    unhinted (AQE broadcasts them at test scale — filter before
    shuffle); one partial-agg shuffle on partkey;
    the global total is a 1-row aggregate of the per-part rollup
    broadcast-crossed into the HAVING filter — the same decorrelation
    Catalyst applies to an uncorrelated scalar subquery, never a second
    lineitem scan."""
    nat = nation.where(F.col("n_name") == nation_name)
    sup = supplier.join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey).select(
        "s_suppkey"
    )
    per_part = (
        lineitem.join(sup, lineitem.l_suppkey == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = per_part.agg(F.sum("value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") > fraction * F.col("total_value"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


def q12_late_lines_by_returnflag(
    orders: DataFrame, lineitem: DataFrame, grace_days: int = 90
) -> DataFrame:
    """TPC-H Q12-style shipping-mode priority split: for late lines
    (shipped past orderdate + grace — the fixture has no commit/receipt
    dates or shipmode, so returnflag stands in as the mode group and
    q4's lateness contract applies), count critical-priority vs other
    orders per group. The CASE-WHEN conditional double count is the
    shape.

    Scale shape: one orderkey equi-join shuffle; the date-window filter
    on l_shipdate is pushed to the scan; both counts come out of a
    single aggregate pass (no per-priority re-scan)."""
    li = lineitem.where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = (
        F.unix_micros(F.col("l_shipdate").cast("timestamp"))
        > F.unix_micros(F.col("o_orderdate").cast("timestamp")) + grace_days * 86_400_000_000
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_count"),
        )
    )


def q15_top_supplier(
    supplier: DataFrame, lineitem: DataFrame, start: str = "1996-01-01", end: str = "1996-04-01"
) -> DataFrame:
    """TPC-H Q15-style top supplier: the revenue-view + scalar-MAX
    subquery shape. Revenue per supplier over one quarter is rounded to
    cents BEFORE the max/equality so the tie condition compares
    identical values on both engines.

    Scale shape: one partial-agg shuffle on suppkey builds the revenue
    view; the max is a 1-row aggregate of that view broadcast-crossed
    back (the view is computed once — Spark reuses the plan subtree,
    never re-scans lineitem); supplier dim joins broadcast."""
    rev = (
        lineitem.where((F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q20_excess_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "red",
    year: int = 1997,
    share: float = 0.25,
) -> DataFrame:
    """TPC-H Q20-style excess-stock suppliers: suppliers who, for some
    name-matched part, shipped more than ``share`` of that part's total
    year volume — the nested-IN + correlated-half-sum shape, decorrelated
    into a per-(part, supplier) rollup joined to its per-part total. No
    partsupp, so 'availqty' is the supplier's shipped quantity; sums of
    integral quantities are exact doubles, so the strict > is
    cross-engine stable.

    Scale shape: the name-prefix part keys join the year-filtered
    lineitem scan unhinted (AQE-broadcast at test scale); the pair rollup and its per-part total share
    one partkey-partitioned shuffle (the total is a re-aggregation of
    the pair rollup, not a second scan); the supplier set then
    DISTINCTs on suppkey — rows ≪ lineitem throughout."""
    parts = part.where(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    qty = (
        lineitem.where(F.year("l_shipdate") == year)
        .join(parts, lineitem.l_partkey == parts.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    tot = qty.groupBy(F.col("l_partkey").alias("t_partkey")).agg(F.sum("q").alias("tq"))
    excess = (
        qty.join(tot, qty.l_partkey == tot.t_partkey)
        .where(F.col("q") > share * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(excess, supplier.s_suppkey == excess.l_suppkey)
        .select("s_name", "s_acctbal")
    )


def date_funcs_showcase(orders: DataFrame) -> DataFrame:
    """The date/time scalar surface (absent in the reference, SURVEY
    §2.2) rolled up per (year, quarter): extraction (year/quarter/
    month/day), arithmetic (+30 days), boundary snapping (month
    start/end) — aggregated so the oracle result is small and every
    function's value feeds a checked column."""
    d = F.col("o_orderdate").cast("timestamp")
    return (
        orders.select(
            F.year(d).cast("long").alias("o_year"),
            F.quarter(d).cast("long").alias("o_quarter"),
            F.month(d).cast("long").alias("o_month"),
            F.dayofmonth(d).cast("long").alias("o_day"),
            F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.trunc(d.cast("date"), "month"), "yyyy-MM-dd").alias("month_start"),
        )
        .groupBy("o_year", "o_quarter")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_month").alias("min_month"),
            F.max("o_day").alias("max_day"),
            F.max("due_date").alias("max_due"),
            F.max("month_end").alias("max_month_end"),
            F.min("month_start").alias("min_month_start"),
        )
    )


def order_status_pivot(orders: DataFrame) -> DataFrame:
    """Pivot order counts by status per priority — expressed as
    conditional aggregation so the oracle SQL is portable."""
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
    )


def grouping_sets_revenue(lineitem: DataFrame) -> DataFrame:
    """GROUPING SETS revenue rollup — the one multi-level aggregation
    shape not yet covered by rollup_revenue (ROLLUP) and
    cube_by_type_hour (CUBE): an explicit, non-hierarchical set list
    ((returnflag, linestatus), (linestatus), ()). Spark 4's native
    ``DataFrame.groupingSets`` plans this as ONE Expand + one
    aggregation — each input row is replicated once per set it belongs
    to and partial aggregation runs map-side, so the shuffle carries
    |sets| partial rows per group, never a re-scan per set.

    Null grouping keys are disambiguated the standard way: grouping()
    flags (packed as g_id) distinguish "aggregated away" from a null
    data value, and the keys are coalesced to 'ALL' for display."""
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("g_id"),
            F.round(revenue, 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_id",
            "revenue",
            "n_lines",
        )
    )


def monthly_revenue_trend(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Window-over-aggregate trend analysis (the TPC-DS Q47 family —
    absent from TPC-H's shapes): monthly revenue, its centered 3-month
    moving average, the month-over-month delta, and the deviation from
    the trailing average — the shape every ops dashboard runs.

    The aggregate reduces the fact table to |months| rows FIRST (one
    partial-agg shuffle); every window then runs over that tiny series
    — a deliberate single-partition window over months, bounded by the
    calendar, not the data."""
    monthly = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .groupBy("month")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
    )
    from pyspark.sql import Window as W

    w = W.orderBy("month")
    ma = F.avg("revenue").over(w.rowsBetween(-1, 1))
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round(ma, 2).alias("ma3"),
        F.round(F.col("revenue") - F.coalesce(prev, F.col("revenue")), 2).alias("mom_delta"),
        F.round(F.col("revenue") - ma, 2).alias("dev_from_ma3"),
    )


def synth_customer_changes(customers: DataFrame) -> DataFrame:
    """Deterministic CDC change feed derived from the customer table
    (the fixture ships no change log; same pattern as the synthetic
    codec/HTML/typo feeds): DELETE every custkey % 13 == 0, UPDATE
    (acctbal + 100) every remaining custkey % 7 == 0, and INSERT one
    brand-new customer per nation (key = 1_000_000 + nationkey).
    Reproducible in ANSI SQL, so the MERGE oracle regenerates it."""
    deletes = customers.where(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit("D").alias("op"),
    )
    updates = (
        customers.where((F.col("c_custkey") % 13 != 0) & (F.col("c_custkey") % 7 == 0))
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
            "c_mktsegment",
            F.lit("U").alias("op"),
        )
    )
    inserts = (
        customers.select("c_nationkey")
        .distinct()
        .select(
            (F.lit(1_000_000) + F.col("c_nationkey")).cast("long").alias("c_custkey"),
            F.concat(F.lit("NewCustomer#"), F.col("c_nationkey").cast("string")).alias("c_name"),
            "c_nationkey",
            F.lit(0.0).alias("c_acctbal"),
            F.lit("BUILDING").alias("c_mktsegment"),
            F.lit("I").alias("op"),
        )
    )
    return deletes.unionByName(updates).unionByName(inserts)


def merge_upsert_customers(customers: DataFrame) -> DataFrame:
    """MERGE INTO semantics — the lakehouse CDC apply (Delta/Iceberg
    MERGE: WHEN MATCHED AND op='D' THEN DELETE / AND op='U' THEN UPDATE
    / WHEN NOT MATCHED AND op='I' THEN INSERT), expressed as ONE
    full-outer join + conditional projection, which is exactly how
    table-format engines physically execute it. Output is the merged
    snapshot plus a last_op audit column ('K' = untouched base row).

    Scale shape: one equi-join on the merge key — at 100 TB the change
    feed is the small side (AQE broadcasts it; a forced hint is
    deliberately absent) and the base side would be a partitioned table
    so the rewrite touches only matched files. The conditional
    projection is narrow; no second scan of either side."""
    ch = synth_customer_changes(customers)
    base = customers.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("b_nationkey"),
        F.col("c_acctbal").alias("b_acctbal"),
        F.col("c_mktsegment").alias("b_mktsegment"),
    )
    chg = ch.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("n_name"),
        F.col("c_nationkey").alias("n_nationkey"),
        F.col("c_acctbal").alias("n_acctbal"),
        F.col("c_mktsegment").alias("n_mktsegment"),
        "op",
    )
    merged = base.join(chg, "k", "full_outer")
    keep = merged.where(F.coalesce(F.col("op"), F.lit("K")) != "D")
    use_new = F.col("op").isin("U", "I")
    return keep.select(
        F.col("k").alias("c_custkey"),
        F.when(use_new, F.col("n_name")).otherwise(F.col("b_name")).alias("c_name"),
        F.when(use_new, F.col("n_nationkey")).otherwise(F.col("b_nationkey"))
        .cast("int")
        .alias("c_nationkey"),
        F.when(use_new, F.col("n_acctbal")).otherwise(F.col("b_acctbal")).alias("c_acctbal"),
        F.when(use_new, F.col("n_mktsegment")).otherwise(F.col("b_mktsegment")).alias("c_mktsegment"),
        F.coalesce(F.col("op"), F.lit("K")).alias("last_op"),
    )


def lateral_topk_orders(
    customer: DataFrame, orders: DataFrame, k: int = 3, sample_every: int = 50
) -> DataFrame:
    """ANSI correlated LATERAL subquery surface: for each sampled
    customer, the top-k orders by price — written EXACTLY as a user
    migrating SQL would write it (``FROM customer c, LATERAL (SELECT …
    WHERE o_custkey = c.c_custkey ORDER BY … LIMIT k)``), not as the
    window idiom.

    The point is what Catalyst does with it: DecorrelateInnerQuery
    rewrites the per-row ORDER BY/LIMIT into ``WindowGroupLimit`` (the
    rank-pushdown group limit) feeding ONE equi-join on the
    correlation key — verified by the plan gate, the same physical
    shape as :func:`topk_per_group`. A correlated LATERAL therefore
    costs nothing at 100 TB versus hand-writing the window; the
    nested-loop per-customer re-scan a naive engine would run never
    exists. Ties are broken by (o_totalprice DESC, o_orderkey) — a
    total order, so the result is deterministic in both engines.
    """
    import uuid

    spark = customer.sparkSession
    # per-call view names: a fixed name would silently clobber a
    # user's view of the same name (spark.sql resolves views at
    # ANALYSIS time, so previously returned plans are unaffected
    # either way — this guards the user's own catalog, not ours)
    tag = uuid.uuid4().hex[:12]
    vc, vo = f"lat_customer_{tag}", f"lat_orders_{tag}"
    customer.createOrReplaceTempView(vc)
    orders.createOrReplaceTempView(vo)
    try:
        return spark.sql(
            f"""
            SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
            FROM {vc} c, LATERAL (
              SELECT o_orderkey, o_totalprice FROM {vo}
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT {int(k)}
            ) o
            WHERE c.c_custkey % {int(sample_every)} = 0
            """
        )
    finally:
        # the returned plan is bound at analysis time; dropping the
        # views immediately keeps the session catalog clean
        spark.catalog.dropTempView(vc)
        spark.catalog.dropTempView(vo)
