"""Event-time operators: tumbling windows, sessionization, running
aggregates.

The reference is strictly batch with no notion of event time (SURVEY
§2.2 — "no streaming of any sort"); these are driver-mandated
extensions. Batch implementations here; Structured Streaming variants
in ``gomapreduce_spark.streaming``.

Scale notes: tumbling aggregation is a single hash shuffle keyed on
(bucket, type) with partial aggregation. Sessionization shuffles once
on user_id; per-user ordering happens inside each partition (no global
sort), which holds at 100 TB as long as a single user's events fit a
partition — true for any human-generated stream; a bot-scale hot user
is handled by AQE skew splitting on the first shuffle and, if needed,
a coarse (user_id, day) pre-bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Hourly tumbling counts + value sums per event type. Window start
    is emitted as a formatted string so the oracle compare is
    timezone-unambiguous."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def _tag_sessions(events: DataFrame, gap_minutes: int) -> DataFrame:
    """Shared session tagging: classic lag+cumsum — a new session starts
    when the user was idle longer than ``gap_minutes``. One shuffle on
    user_id, per-user intra-partition sort; adds ``session_id``."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_us").isNull() | (F.unix_micros("ts") - F.col("prev_us") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Per-user session rollup over :func:`_tag_sessions` (avg duration
    aggregates the RAW per-session seconds; rounding happens once at the
    end so the oracle compare is exact)."""
    per_session = _tag_sessions(events, gap_minutes).groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1_000_000).alias("dur_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
        F.round(F.avg("dur_s"), 4).alias("avg_session_sec"),
    )


def session_rows(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Per-session rows (user_id, session_start, n_events, dur_s) — the
    batch reference for the stateful-streaming sessionizer; same tagging
    as :func:`sessionize`, materialized per session instead of rolled
    up per user. dur_s is the RAW division of exact integer micros —
    bit-identical across Spark, the stream's Python emit, and DuckDB,
    so parity and oracle checks need no rounding tolerance."""
    return _tag_sessions(events, gap_minutes).groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.count("*").alias("n_events"),
        ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1_000_000).alias("dur_s"),
        F.max(F.unix_micros("ts")).alias("last_us"),
    )


def asof_join_orders(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join: each event matched to the same customer's most recent
    order at-or-before the event time (the time-series point-in-time
    join Spark lacks as a primitive).

    Implemented as the union trick: tag order rows 0 and event rows 1,
    sort within user by (ts, tag), and carry the last non-null order
    forward with an ignore-nulls last_value window. ONE shuffle on
    user_id, no range-join explosion — at 100 TB this beats any
    inequality join because each side is scanned once and the state
    carried per row is O(1). Orders are first deduplicated per
    (customer, date) by max orderkey so ties are deterministic.
    """
    o_dedup = orders.groupBy(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ts")
    ).agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    o_side = o_dedup.select(
        "user_id", "ts", F.lit(0).alias("tag"), "o_orderkey", "o_totalprice",
        F.lit(None).cast("long").alias("event_id"),
    )
    e_side = events.select(
        "user_id", "ts", F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"), "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts", "tag").rowsBetween(W.unboundedPreceding, 0)
    merged = (
        o_side.unionByName(e_side)
        .withColumn("last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("last_totalprice", F.last("o_totalprice", ignorenulls=True).over(w))
    )
    return merged.where((F.col("tag") == 1) & F.col("last_orderkey").isNotNull()).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.col("last_orderkey").alias("o_orderkey"),
        F.round("last_totalprice", 2).alias("o_totalprice"),
    )


def sliding_window_counts(events: DataFrame) -> DataFrame:
    """Per-event trailing-hour activity: count and value-sum of the same
    user's events in the preceding hour (inclusive) — a RANGE window
    frame over event time. One shuffle on user_id; the frame scan is
    intra-partition."""
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_trailing_hour"),
        F.round(F.sum("value").over(w), 4).alias("sum_trailing_hour"),
    )


def cube_by_type_hour(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, hour-of-day): all four grouping sets in a
    single pass — the full grouping-sets surface next to rollup_revenue's
    hierarchy."""
    return (
        events.cube("event_type", F.hour("ts").cast("long").alias("hour_of_day"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def percentile_stats(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of value per event
    type. Exact percentile needs the group's values together (one
    shuffle); at 100 TB the same query would move to approx_percentile
    (t-digest sketch, partial-mergeable) — kept exact here because the
    groups are few and the oracle can verify exactness."""
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def funnel_set_ops(events: DataFrame) -> DataFrame:
    """Set operations over user cohorts: INTERSECT / EXCEPT / UNION of
    the click and purchase user sets, reported as segment counts. Each
    set op is a distinct-aggregate shuffle on user_id."""
    def users(t: str) -> DataFrame:
        return events.where(F.col("event_type") == t).select("user_id").distinct()

    click, purchase = users("click"), users("purchase")
    # aggregate each set separately so empty cohorts still yield a
    # 0-count row (a groupBy over the union would drop them)
    parts = [
        (sdf.agg(F.count("*").alias("n_users")).select(F.lit(seg).alias("segment"), "n_users"))
        for seg, sdf in [
            ("click_and_purchase", click.intersect(purchase)),
            ("click_only", click.subtract(purchase)),
            ("purchase_only", purchase.subtract(click)),
            ("click_or_purchase", click.union(purchase).distinct()),
        ]
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def json_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull the integer ``k`` out of the JSON
    ``props`` column and aggregate it per event type. get_json_object is
    a JVM-side path evaluation — no Python in the loop; at scale prefer
    from_json with an explicit schema once the shape is known."""
    k = F.get_json_object("props", "$.k").cast("int")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("k"), 6).alias("avg_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """Keep-latest dedup: each user's most recent event (row_number = 1
    over ts desc) — the standard CDC/compaction pattern; one shuffle,
    per-user local sort, deterministic tie-break on event_id."""
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_type",
        )
    )


def range_join_shipments(orders: DataFrame, lineitem: DataFrame, days: int = 90) -> DataFrame:
    """Range (point-in-interval) join: per order, how many of the same
    customer's line items shipped within ``days`` after the order date.

    Naively an inequality join — Spark would plan a broadcast nested
    loop. The scale formulation buckets time with bucket width = the
    window length, so each order lands in EXACTLY 2 candidate buckets
    (its own and the next — any point within [o, o+win] is in one of
    them), each shipment joins its ONE bucket equi-style on (custkey,
    bucket), and the exact range predicate filters the ~50% bucket-
    granularity false positives. Constant fan-out, every wide stage a
    hash equi-join — no quadratic scan at any data size.
    """
    win_us = days * 86_400 * 1_000_000
    # TIMESTAMP_NTZ → TIMESTAMP is value-preserving under the UTC
    # session zone; unix_micros then matches DuckDB's epoch_us exactly.
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    o = orders.select("o_orderkey", F.col("o_custkey").alias("custkey"), us("o_orderdate").alias("o_us"))
    b0 = F.floor(F.col("o_us") / win_us)
    o_b = o.withColumn("bucket", F.explode(F.array(b0, b0 + 1)))
    ship = (
        lineitem.select("l_orderkey", us("l_shipdate").alias("s_us"))
        .join(orders.select("o_orderkey", F.col("o_custkey").alias("custkey")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select("custkey", "s_us")
        .withColumn("bucket", F.floor(F.col("s_us") / win_us))
    )
    matched = (
        ship.join(o_b, ["custkey", "bucket"])
        .where((F.col("s_us") >= F.col("o_us")) & (F.col("s_us") <= F.col("o_us") + win_us))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        orders.select("o_orderkey")
        .join(matched, "o_orderkey", "left")
        .select("o_orderkey", F.coalesce("n", F.lit(0)).cast("long").alias("n_shipments_90d"))
    )


def value_deciles_approx(
    events: DataFrame, accuracy: int = 10_000, sequential: bool = False
) -> DataFrame:
    """Scale-safe decile rollup: approx_percentile cutpoints + a narrow
    bucket assignment — the 100 TB form of :func:`value_deciles`.

    Two passes, both distributed: (1) one partial-mergeable sketch
    aggregation produces the 9 interior cutpoints (a single tiny row);
    (2) the cutpoints broadcast into a narrow projection that buckets
    each event by counting cutpoints below its value, then a standard
    partial+final rollup per decile. No global sort, no single-partition
    window — the ntile version's partition-less sort-shuffle is exactly
    what dies first at 100×. Boundary semantics differ from exact ntile
    only by the sketch's rank error (≤ n/accuracy) and tie placement;
    the error-bound test asserts per-decile counts within that bound.

    ``sequential=True`` is the VERIFICATION TWIN (registered as
    ``value_deciles_approx_seq``): the sketch input is repartition(1)'d
    so exactly ONE partial GK sketch exists and the merge path — the
    only shuffle-arrival-order-dependent step — never runs. As long as
    the stream fits in the sketch's 50k-element head buffer (true at
    the sf0.01 oracle scale; 10k rows), that buffer is SORTED on its
    single compress-time flush, making the whole result a pure function
    of the value multiset — deterministic, hence hash-oracle-able via
    the independent pure-python GK restatement in
    ``tools/gen_vda_oracle.py`` (vda_expected.py VALUES table, gated by
    PRECOMPUTED_ORACLE_SF). Above the head-buffer size the flush points
    depend on round-robin arrival order again, so the twin degrades to
    rows-only there by design. NOT a scale path — the registered
    default (sequential=False) is."""
    sketch_input = events.repartition(1) if sequential else events
    cuts = sketch_input.agg(
        F.percentile_approx("value", F.array(*[F.lit(i / 10.0) for i in range(1, 10)]), accuracy).alias("cuts")
    )
    bucketed = events.join(F.broadcast(cuts)).select(  # 1-row broadcast, constant fan-out
        (1 + F.size(F.filter("cuts", lambda c: c < F.col("value")))).cast("long").alias("decile"),
        "value",
    )
    return bucketed.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


def value_deciles_bounds(events: DataFrame, accuracy: int = 1000) -> DataFrame:
    """Driver-checkable certificate for the LIVE approx-decile path —
    closing the one designed oracle hole (round-13 verdict item 2):
    :func:`value_deciles_approx`'s cutpoint VALUES are
    merge-order-nondeterministic (partial GK sketches merge in
    shuffle-arrival order), but the sketch's rank-error BOUND is not.
    This query runs the real multi-partition sketch (no
    ``repartition(1)`` — the merge path the ``_seq`` twin deliberately
    bypasses), then verifies each returned cutpoint against the exact
    rank it holds in the data, and outputs ONLY the deterministic
    verdict: per decile, the corpus size, the certified error bound,
    and whether the cutpoint's rank interval intersects the target
    rank ± bound. Any run of the sketch that honors the documented GK
    guarantee (rank error ≤ n/accuracy; Spark's percentile_approx
    contract) produces the identical — hash-oracle-able — output, so
    the row is stable while the nondeterministic path it certifies is
    genuinely exercised.

    ``err_bound`` is floor(n/accuracy) + 2: the documented sketch
    error plus two ranks of slack for the rank-convention / tie
    ambiguity of mapping a returned ELEMENT back to a rank (the
    element's rank is an interval [#{v < c}+1, #{v ≤ c}] under ties;
    the check passes iff that interval comes within ``err_bound`` of
    the target rank p·n).

    Scale shape: pass 1 is the partial-mergeable sketch aggregate
    (one tiny row); pass 2 broadcasts that row onto a narrow
    projection and folds 19 counting aggregates in ONE partial+final
    aggregate — no global sort, no window, same envelope as
    value_deciles_approx. The 9-row explode at the end fans out a
    single driver-visible row."""
    probs = [i / 10.0 for i in range(1, 10)]
    cuts = events.agg(
        F.percentile_approx("value", F.array(*[F.lit(p) for p in probs]), accuracy).alias("cuts")
    )
    counting = [F.count("*").alias("n")]
    for i in range(1, 10):
        c = F.element_at("cuts", i)
        counting.append(F.sum((F.col("value") < c).cast("long")).alias(f"lt_{i}"))
        counting.append(F.sum((F.col("value") <= c).cast("long")).alias(f"le_{i}"))
    stats = events.select("value").join(F.broadcast(cuts)).agg(*counting)
    per_decile = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("decile"),
                F.col(f"lt_{i}").alias("lt"),
                F.col(f"le_{i}").alias("le"),
            )
            for i in range(1, 10)
        ]
    )
    n = F.col("n").cast("double")
    bound = (F.floor(F.col("n") / F.lit(accuracy)) + F.lit(2)).cast("long")
    target = F.col("d.decile") * n / F.lit(10.0)
    return (
        stats.where(F.col("n") > 0)
        .select("n", F.explode(per_decile).alias("d"))
        .select(
            F.col("d.decile").alias("decile"),
            F.col("n").alias("n_rows"),
            bound.alias("err_bound"),
            (
                ((F.col("d.lt") + F.lit(1)).cast("double") <= target + bound.cast("double"))
                & (F.col("d.le").cast("double") >= target - bound.cast("double"))
            ).alias("within_bound"),
        )
    )


def value_deciles(events: DataFrame) -> DataFrame:
    """ntile decile assignment over event values, rolled up per decile —
    the ranking-window surface (ntile) next to row_number.

    VERIFICATION-ONLY at scale: ntile needs one GLOBAL sort partition —
    a single task sorts the whole table. The 100 TB default is
    :func:`value_deciles_approx` (sketch cutpoints + narrow bucketing,
    no global sort); this exact form is the oracle cross-check for it
    (see SCALE.md)."""
    w = W.orderBy(F.col("value").asc(), F.col("event_id").asc())
    return (
        events.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


def value_prop_correlation(events: DataFrame) -> DataFrame:
    """Statistical aggregates per event type: Pearson correlation and
    sample covariance between the value column and the JSON prop k —
    single-pass mergeable moments (partial-aggregation friendly)."""
    k = F.get_json_object("props", "$.k").cast("int").cast("double")
    return (
        events.select("event_type", F.col("value"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.corr("value", "k"), 6).alias("corr_vk"),
            F.round(F.covar_samp("value", "k"), 6).alias("covar_vk"),
        )
    )


def window_rank_showcase(events: DataFrame, sample_every: int = 500) -> DataFrame:
    """The remaining ranking/offset window functions in one pass —
    rank, dense_rank, percent_rank, cume_dist, lag, lead — over
    (event_type, value) ordering, output sampled by row number so the
    result stays small while every function's value is exercised. One
    shuffle on event_type, intra-partition sort."""
    w = W.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    return (
        events.select(
            "event_type",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.lag("value", 1).over(w).alias("prev_value"),
            F.lead("value", 1).over(w).alias("next_value"),
        )
        .where(F.col("rn") % sample_every == 0)
        .drop("rn")
    )


def trimmed_mean_by_type(events: DataFrame, trim: float = 0.1) -> DataFrame:
    """Custom grouped aggregation via ``applyInPandas`` — the DataFrame-
    native mapping of the reference's Reducer contract (the full value
    list per key, reducer.go:13-15): a count-based trimmed mean that no
    built-in aggregate expresses. Each group arrives as one pandas
    frame (Arrow-batched); rows are sorted by (value, event_id) so the
    trim is deterministic under ties. One shuffle on the group key —
    same dataflow as groupBy().agg, with Python only per group.

    VERIFICATION-ONLY at scale: the whole group lands in ONE pandas
    frame, so a hot group OOMs an executor. The 100 TB default is
    :func:`trimmed_mean_distributed` (identical output, spilling
    windows); this form exists for Reducer-contract fidelity and as
    the oracle cross-check (see SCALE.md)."""
    import pandas as pd

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(["value", "event_id"])["value"]
        n = len(s)
        k = int(n * trim)
        kept = s.iloc[k : n - k] if n - 2 * k > 0 else s
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "trimmed_mean": [round(float(kept.mean()), 6)],
                "n_kept": [len(kept)],
            }
        )

    return (
        events.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandas(agg, "event_type string, trimmed_mean double, n_kept long")
    )


def trimmed_mean_distributed(events: DataFrame, trim: float = 0.1) -> DataFrame:
    """The 100 TB form of :func:`trimmed_mean_by_type`: rank-filter
    instead of whole-group materialization. ``applyInPandas`` hands each
    group to Python as ONE frame — a hot group OOMs an executor; here
    rows stream through two window functions over one hash exchange
    (count over the partition, row_number over (value, event_id)), the
    trim is a filter, and the final per-type average reuses the window's
    partitioning (no second exchange). Windows sort-and-spill, so a
    billion-row group degrades to disk instead of failing. Identical
    output to the pandas form (same int-truncated k, same tie order) —
    parity asserted in tests; same oracle SQL."""
    wp = W.partitionBy("event_type")
    wo = wp.orderBy("value", "event_id")
    k = F.floor(F.col("n") * trim)  # == the pandas form's int(n * trim) for n >= 0
    return (
        events.select("event_type", "event_id", "value")
        .withColumn("n", F.count("*").over(wp))
        .withColumn("rk", F.row_number().over(wo))
        .where((F.col("rk") > k) & (F.col("rk") <= F.col("n") - k))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("trimmed_mean"),
            F.count("*").alias("n_kept"),
        )
    )


def approx_distinct_users(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type — the
    sketch path for cardinality at 100 TB (partial-mergeable, no exact
    distinct shuffle). Hash-oracled since round 8: DuckDB can't run
    Spark's HLL++, so the oracle is a precomputed VALUES table
    (``hll_expected.py``, generated by ``tools/gen_hll_oracle.py`` — an
    independent pure-python xxHash64 + HLL++ linear-counting
    restatement, sound because HLL register max-merge makes the sketch
    a pure function of the input SET, not of partitioning). Valid only
    at the generated SF (``PRECOMPUTED_ORACLE_SF`` in queries.py);
    other SFs degrade to rows-only. Tests additionally assert relative
    error vs the exact count."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users")
    )


def running_user_totals(events: DataFrame, at_event: int = 5) -> DataFrame:
    """Running cumulative value per user ordered by event time — window
    frame rowsBetween(unboundedPreceding, current). Output is sampled at
    the user's Nth event so the running (not just total) semantics are
    observable while output stays small."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = (
        events.withColumn("cum_value", F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("rn", F.row_number().over(w))
    )
    return cum.where(F.col("rn") == at_event).select(
        "user_id", F.round("cum_value", 4).alias("cum_value_at_n")
    )


def ordered_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_hours: int = 72,
) -> DataFrame:
    """Ordered multi-step funnel — the sequence-analytics shape
    (MATCH_RECOGNIZE territory) decorrelated into per-step earliest-
    reach joins: a user reaches step k at the EARLIEST step-k event
    strictly after their step-(k-1) reach time; the final conversion
    additionally requires the whole path inside ``within_hours``.
    Greedy-earliest is the standard funnel semantics and is what makes
    the result deterministic.

    Scale shape: one min-aggregation (partial+final) per step keyed on
    user_id, chained through user_id equi-joins — each step's input is
    pre-filtered to that step's event type before shuffling, and no
    window function ever sees the raw stream. |steps| shuffles of
    |users| rows, independent of event volume."""
    def count_row(df: DataFrame, idx: int, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(idx).cast("int").alias("step_idx"), F.lit(label).alias("step"), "n_users"
        )

    cur = (
        events.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_0"))
    )
    rows = [count_row(cur, 0, steps[0])]
    for k, step in enumerate(steps[1:], start=1):
        cur = (
            events.where(F.col("event_type") == step)
            .select("user_id", F.col("ts").alias("ts_k"))
            .join(cur, "user_id")
            .where(F.col("ts_k") > F.col(f"t_{k - 1}"))
            .groupBy("user_id", *[f"t_{j}" for j in range(k)])
            .agg(F.min("ts_k").alias(f"t_{k}"))
        )
        rows.append(count_row(cur, k, step))
    last = len(steps) - 1
    converted = cur.where(
        F.unix_micros(F.col(f"t_{last}")) - F.unix_micros(F.col("t_0"))
        <= within_hours * 3_600_000_000
    )
    rows.append(count_row(converted, last + 1, f"converted_{within_hours}h"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Trailing N-day distinct active users per day — the DAU/WAU
    rollup. Exact sliding distinct is not incrementally mergeable, so
    the scalable exact form materializes the (user, day) grid once and
    fans each activity day into the ``window_days`` window-end days it
    contributes to (a narrow explode of N small ints), then counts
    distinct users per end day.

    Scale shape: the grid is one distinct-aggregate shuffle of
    |users × active days| rows (≪ raw events); the fan-out multiplies
    that by N BEFORE the second distinct — at 100 TB swap the exact
    tail for HLL sketch union-merge (approx_distinct_users pattern) if
    N·|grid| dominates. Output bounded to days within the data range."""
    grid = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    bounds = events.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"), F.date_trunc("day", F.max("ts")).alias("hi")
    )
    fanned = grid.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("window_end"),
    )
    return (
        fanned.crossJoin(F.broadcast(bounds))
        .where((F.col("window_end") >= F.col("lo")) & (F.col("window_end") <= F.col("hi")))
        .groupBy("window_end")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(F.date_format("window_end", "yyyy-MM-dd").alias("day"), "n_active")
    )


def retention_cohorts(events: DataFrame, max_k: int = 14) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day;
    for each day offset k ≤ ``max_k``, the fraction of the cohort
    active exactly k days later. The canonical growth-analytics rollup.

    Scale shape: first-day per user is one min-aggregation; the
    (user, day) activity grid is one distinct; their user_id equi-join
    feeds a (cohort_day, k) partial-agg — three bounded shuffles, no
    window over raw events, cohort sizes re-derived from the k=0 row
    of the same rollup (no second scan)."""
    first_day = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    grid = events.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    active = (
        grid.join(first_day, "user_id")
        .select(
            "user_id", "cohort_day", F.datediff("day", "cohort_day").alias("k")
        )
        .where(F.col("k") <= max_k)
    )
    rollup = active.groupBy("cohort_day", "k").agg(F.countDistinct("user_id").alias("n_active"))
    sizes = rollup.where(F.col("k") == 0).select(
        F.col("cohort_day").alias("c2"), F.col("n_active").alias("cohort_size")
    )
    return (
        rollup.join(sizes, rollup.cohort_day == F.col("c2"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("k").cast("int").alias("k"),
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
        )
    )


def k_anonymity_audit(events: DataFrame, k: int = 5) -> DataFrame:
    """k-anonymity audit over the event stream — the privacy hygiene
    check a training pipeline runs before releasing interaction logs:
    bucket rows into quasi-identifier equivalence classes
    (event_type, event day, value decade) and flag every class whose
    distinct-user population is below k — rows in those classes are
    re-identifiable by an adversary who knows the quasi-identifiers.

    One partial-agg shuffle keyed on the (coarse, low-cardinality)
    class tuple; distinct-user counting is Spark's two-phase distinct
    aggregate (map-side dedup before the shuffle). The output is the
    risky-class manifest, bounded by the class space, not the data."""
    classes = events.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.floor(F.col("value") / 100) * 100).cast("long").alias("value_band"),
        "user_id",
    )
    return (
        classes.groupBy("event_type", "day", "value_band")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_rows"),
        )
        .where(F.col("n_users") < k)
    )


def variant_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction via Spark 4 VARIANT — the successor
    path to :func:`json_props_stats`'s get_json_object: ``parse_json``
    decodes the JSON text ONCE into a binary columnar variant, and each
    ``variant_get`` is a cheap path lookup instead of a re-parse. With
    many extractions per row at 100 TB, parse-once-extract-many is the
    difference between one JSON tokenizer pass and k of them.

    Same aggregation surface as json_props_stats plus null accounting
    (try_variant_get returns NULL for missing paths instead of
    failing), so the two paths are directly comparable — and the DuckDB
    oracle is identical JSON semantics."""
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.missing", "string")
    return events.select("event_type", k.alias("k"), missing.alias("m")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg("k"), 6).alias("avg_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        # count() counts NON-null cells, i.e. rows where the probed
        # '$.missing' path IS present (0 on this fixture — every row
        # lacks it); named for what it counts
        F.count("m").alias("n_path_present"),
    )


def full_outer_user_activity(events: DataFrame) -> DataFrame:
    """FULL OUTER join — the one join type the relational set didn't
    yet exercise (inner/left-outer/semi/anti/range/as-of/interval are
    covered elsewhere): per-user click counts joined FULL OUTER to
    per-user purchase counts, so click-only users, purchase-only users,
    and both-sided users all survive with zero-filled gaps — the
    engagement-vs-conversion matrix.

    Both sides partial-aggregate to |users| rows before the join, so
    the full-outer shuffle is keyed on an already-reduced table — at
    100 TB the join input is user-cardinality, not event-cardinality,
    and AQE plans it as a sort-merge on user_id (both sides large and
    same-keyed; no broadcast candidate, which is correct here)."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"), F.round(F.sum("value"), 2).alias("spend"))
    )
    return (
        clicks.join(purchases, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("spend", F.lit(0.0)).alias("spend"),
        )
    )


def map_funcs_showcase(events: DataFrame) -> DataFrame:
    """The MAP-type function surface (the last scalar family from
    SURVEY §2.2 not yet shown: string/date/math/array/json live in
    their own showcases): build a per-user event_type→count map with
    ``map_from_entries`` over a SORTED entry list (collect_list order
    is execution-dependent — sorting first is what makes a map
    deterministic enough to verify), then drive map_keys / map_values /
    transform_values / map_filter / element_at / map_concat through it.
    Output flattens to strings so any engine can compare.

    One partial-agg shuffle to (user, type) counts, a second to the
    per-user entry list — both map-side combined; the map ops
    themselves are narrow."""
    per_type = events.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    entries = per_type.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("event_type", "n"))).alias("es")
    )
    m = F.map_from_entries("es")
    doubled = F.transform_values(m, lambda k, v: v * 2)
    big = F.map_filter(m, lambda k, v: v >= 3)
    withx = F.map_concat(m, F.create_map(F.lit("_total"), F.aggregate("es", F.lit(0).cast("long"), lambda a, e: a + e["n"])))
    return entries.select(
        "user_id",
        F.array_join(F.map_keys(m), ",").alias("types"),
        F.array_join(F.transform(F.map_values(m), lambda v: v.cast("string")), ",").alias("counts"),
        F.element_at(m, "click").cast("long").alias("clicks"),
        F.array_join(F.transform(F.map_values(doubled), lambda v: v.cast("string")), ",").alias("doubled"),
        F.size(big).cast("long").alias("n_big_types"),
        F.element_at(withx, "_total").cast("long").alias("total"),
    )


def math_funcs_showcase(events: DataFrame, sample_every: int = 500) -> DataFrame:
    """The scalar math-function surface in one narrow pass: abs/sign,
    ceil/floor/rounding, exp/ln/log10, sqrt/pow/cbrt, mod, radians,
    least/greatest — sampled so the oracle result stays small. Trig is
    excluded deliberately: JVM and DuckDB libm implementations differ
    at the ulp level, which a value-hash comparison would surface as
    noise, not signal."""
    v = F.col("value")
    return events.where(F.col("event_id") % sample_every == 0).select(
        "event_id",
        F.round(F.abs(v - 100), 6).alias("abs_centered"),
        (F.signum(v - 100)).cast("long").alias("sign_centered"),
        F.ceil(v).cast("long").alias("ceil_v"),
        F.floor(v).cast("long").alias("floor_v"),
        F.round(F.exp(v / 1000), 6).alias("exp_scaled"),
        F.round(F.log(v + 1), 6).alias("ln_v1"),
        F.round(F.log10(v + 1), 6).alias("log10_v1"),
        F.round(F.sqrt(v), 6).alias("sqrt_v"),
        F.round(F.pow(v, 1.5), 4).alias("pow_15"),
        F.round(F.cbrt(v), 6).alias("cbrt_v"),
        F.round(v % 7, 2).alias("mod7"),
        F.round(F.least(v, F.lit(50.0)), 2).alias("least50"),
        F.round(F.greatest(v, F.lit(50.0)), 2).alias("greatest50"),
    )


def regression_stats(events: DataFrame) -> DataFrame:
    """The linear-regression aggregate family (regr_slope/intercept/
    r2/count + corr/covar) per event type — OLS of event value against
    the numeric ``k`` pulled from props. Completes the statistical
    aggregate surface next to percentile_stats (order statistics) and
    value_prop_correlation (corr/covar alone).

    All six are single-pass mergeable aggregates (sum/sum²/sum-of-
    products moments), so partial aggregation works and the shuffle
    carries one moment tuple per (partition, type) — the same cost
    envelope as a sum at any scale."""
    k = F.get_json_object("props", "$.k").cast("double")
    base = events.select("event_type", F.col("value").alias("y"), k.alias("x"))
    return base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept"),
        F.round(F.regr_r2("y", "x"), 6).alias("r2"),
        F.round(F.corr("y", "x"), 6).alias("pearson_r"),
        F.round(F.covar_samp("y", "x"), 6).alias("covar"),
    )


def distribution_drift(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Population-stability-index drift check — the data-quality gate a
    pipeline runs before trusting a new ingest window: split the stream
    at its midpoint timestamp, histogram ``value`` into fixed-width
    bins (bounds from the GLOBAL min/max so both halves share the
    grid), and report per-event-type PSI =
    Σ (p_new − p_old)·ln(p_new/p_old) with Laplace-smoothed bin
    fractions. PSI < 0.1 ≈ stable, > 0.25 ≈ investigate.

    Every input to the formula is an exact integer count plus exact
    global bounds, so the score is cross-engine stable at round(6).
    One scan to bound/split, one partial-agg shuffle to
    (type, half, bin) counts — |types|·2·bins rows — then the PSI fold
    over a broadcast-sized table."""
    bounds = events.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.min("ts").cast("long").alias("t0"),
        F.max("ts").cast("long").alias("t1"),
    )
    binned = (
        events.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            (F.col("ts").cast("long") * 2 > F.col("t0") + F.col("t1"))
            .cast("int")
            .alias("half"),
            # constant-valued slice → single bin 0 (a zero bin width
            # must not abort the report)
            F.when(F.col("hi") > F.col("lo"),
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / n_bins)
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("bin"),
        )
        .groupBy("event_type", "half", "bin")
        .agg(F.count("*").alias("n"))
    )
    totals = binned.groupBy("event_type", "half").agg(F.sum("n").alias("tot"))
    # Laplace-smoothed fractions on the full bin grid: absent bins
    # contribute via the +1 smoothing, so build the dense grid first
    grid = (
        binned.select("event_type").distinct()
        .crossJoin(F.broadcast(events.sparkSession.range(2).select(F.col("id").cast("int").alias("half"))))
        .crossJoin(F.broadcast(events.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))))
    )
    dense = (
        grid.join(binned, ["event_type", "half", "bin"], "left")
        .join(totals, ["event_type", "half"])
        .select(
            "event_type",
            "half",
            "bin",
            ((F.coalesce("n", F.lit(0)) + 1) / (F.col("tot") + n_bins)).alias("p"),
        )
    )
    old = dense.where(F.col("half") == 0).select("event_type", "bin", F.col("p").alias("p_old"))
    new = dense.where(F.col("half") == 1).select("event_type", "bin", F.col("p").alias("p_new"))
    return (
        old.join(new, ["event_type", "bin"])
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum((F.col("p_new") - F.col("p_old")) * F.log(F.col("p_new") / F.col("p_old"))),
                6,
            ).alias("psi")
        )
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every (event_type -> next event_type) step, the count
    and the row-normalized transition probability — the input to
    next-action models, funnel anomaly detection, and bot heuristics
    (a user emitting purchase->purchase loops). No reference
    counterpart (reference mapreduce.go has no sequence operator of
    any kind, SURVEY §2.2); part of the event-analytics mandate.

    Scale shape: ONE user-keyed shuffle feeds the lead() window
    (per-user sequences sort independently; key cardinality = users),
    then the (type, next) counts partial-agg into at most |types|²
    rows, and the probability normalizer is a window over that tiny
    aggregate partitioned by event_type — never over raw events.
    Ordering ties are broken by event_id, so the matrix is
    deterministic and cross-engine-stable (exact integer counts; the
    probability rounds a ratio of those integers)."""
    nxt = F.lead("event_type").over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    steps = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", nxt)
        .where(F.col("next_type").isNotNull())
    )
    counts = steps.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    total = F.sum("n").over(W.partitionBy("event_type"))
    return counts.select(
        "event_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / total, 6).alias("p"),
    )


def scd2_user_state(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type-2 history build (the CDC →
    warehouse-dimension compaction every lakehouse pipeline runs):
    each user's event_type stream is compressed into contiguous STATE
    RUNS — one row per run with [valid_from, valid_to) bounds, open
    runs carrying NULL valid_to and is_current=true. The complement of
    latest_event_per_user (which keeps only the final state): this
    keeps the full versioned history a point-in-time join needs.

    Scale shape: ONE user-keyed shuffle serves both windows (the
    run-start detection lag and the valid_to lead run over the same
    (user_id | ts, event_id) ordering, so Catalyst plans a single
    Window exchange); run starts are a narrow filter; no join, no
    global sort. Timestamps are emitted as exact integer micros —
    hash-stable across engines."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        runs.withColumn("valid_to_us", F.lead(F.unix_micros("ts")).over(w2))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros("ts").alias("valid_from_us"),
            "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
    )


def interarrival_stats(events: DataFrame, min_events: int = 3) -> DataFrame:
    """Per-user inter-arrival timing profile: gap count, mean/max gap
    seconds, and the burstiness coefficient B = (σ−μ)/(σ+μ) of the gap
    distribution (Goh & Barabási 2008) — B→−1 periodic (cron-like
    automation), ≈0 Poisson (organic), →+1 bursty (human sessions).
    The standard bot-vs-human timing discriminator next to the volume
    heuristics.

    Scale shape: ONE user-keyed shuffle feeds the lag window; gap
    moments then partial-agg per user (count/sum/sum-of-squares — all
    mergeable), and σ derives from the moments so nothing needs a
    second pass.

    The moments ACCUMULATE in exact integer micros: s1 as a 64-bit
    sum, s2 (sum of squared micros — up to ~10^22 on day-long gaps) as
    DECIMAL(38,0), both associative and hence independent of Spark's
    partial-agg merge order and of DuckDB's sum order. A double gap_s
    summed before the round-6 fix was order-dependent in its last bits
    — a value landing exactly on a round(,6) boundary could flip the
    hash oracle (advisor finding). Only the final mean/σ/B expressions
    are float, written operation-for-operation identically in the
    oracle so the IEEE results match bit-for-bit."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select("user_id", "ts", "event_id")
        .withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .where(F.col("prev_us").isNotNull())
        .select("user_id", (F.unix_micros("ts") - F.col("prev_us")).alias("gap_us"))
    )
    agg = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap_us").alias("s1u"),
        F.sum((F.col("gap_us").cast("decimal(19,0)") * F.col("gap_us").cast("decimal(19,0)"))).alias("s2u"),
        F.max("gap_us").alias("max_gap_us"),
    )
    # float enters HERE only, after exact accumulation; the oracle SQL
    # repeats these expressions verbatim (left-assoc divisions)
    mu = F.col("s1u").cast("double") / F.col("n_gaps") / 1_000_000.0
    msq = F.col("s2u").cast("double") / F.col("n_gaps") / 1e12
    # population variance from mergeable moments; guard the sqrt of
    # tiny negative float residue on near-constant gaps
    sigma = F.sqrt(F.greatest(msq - mu * mu, F.lit(0.0)))
    return (
        agg.where(F.col("n_gaps") >= min_events - 1)
        .select(
            "user_id",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.round(mu, 6).alias("mean_gap_s"),
            F.round(F.col("max_gap_us") / 1_000_000.0, 6).alias("max_gap_s"),
            F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
        )
    )


SESSION_GAP_MINUTES = 240  # matches the fixture's ~hours-scale per-user cadence


def session_window_stats(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Sessionization through Spark's NATIVE ``session_window`` — the
    merging-window aggregate the STREAMING twin uses, run in batch so
    the oracle pins its boundary semantics exactly: a session spans
    [first event, last event + gap), and an event landing exactly at
    the current end opens a NEW session (>= gap — one boundary stricter
    than :func:`sessionize`'s ``> gap`` lag rule; the oracle re-derives
    sessions with the lag/cumsum rewrite under the >= rule).

    Scale shape: session_window plans as a single user-keyed
    aggregation with in-partition window merging — state is bounded by
    open sessions per user, the property that makes the streaming form
    viable at any ingest rate."""
    return (
        events.groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
            "sum_value",
        )
    )


def incremental_user_rollup(events: DataFrame, cutoff: str = "2024-01-08") -> DataFrame:
    """Incremental aggregate MAINTENANCE: per-user stats computed as
    two independent partial states (history before ``cutoff``, delta
    since) MERGED by re-aggregation — the nightly-delta pattern that
    replaces full recomputes at 100 TB. The driver's oracle compares
    against a single-pass recompute, so the merge's correctness (not
    just its plumbing) is hash-verified.

    Every mergeable moment accumulates exactly: counts and integer-cent
    value sums (the fixture's values carry 2 decimals) are 64-bit ints,
    min/max are order-free — so partial+merge equals one-pass
    bit-for-bit regardless of split point or merge order. Floats appear
    only in the final mean/total expressions.

    Scale shape: each half is a partial+final agg over its (pruned)
    scan; the merge re-aggregates |users| rows — at scale the history
    half is a stored rollup table read back, and only the delta scans
    raw events."""
    cents = F.round(F.col("value") * 100).cast("long")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("cents"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )

    cut = F.lit(cutoff).cast("timestamp")
    states = partial(events.where(F.col("ts") < cut)).unionByName(
        partial(events.where(F.col("ts") >= cut))
    )
    return (
        states.groupBy("user_id")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("cents").alias("tot_cents"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
        .select(
            "user_id",
            "n_events",
            F.round(F.col("tot_cents") / 100.0, 2).alias("total_value"),
            F.round(F.col("tot_cents") / 100.0 / F.col("n_events"), 6).alias("mean_value"),
            "first_us",
            "last_us",
        )
    )



def mad_outliers(events: DataFrame, cutoff: float = 3.5) -> DataFrame:
    """Robust outlier screen per event type: the modified z-score
    0.6745·(x − median)/MAD (Iglewicz & Hoaglin 1993) — the
    data-quality gate that, unlike mean/σ z-scores, is not dragged by
    the outliers it hunts. Reports, per type, the median, the MAD, how
    many events exceed the cutoff, and the worst score.

    Exact medians (PERCENTILE_CONT interpolation, identical in Spark's
    ``percentile`` and DuckDB's ``quantile_cont``) over a bounded group
    domain; both median passes and the final rollup key on event_type,
    so the whole query is two sort-aggregates and one bounded join —
    at unbounded group counts the sketch twin (approx_percentile)
    substitutes, per the exact/approx twin doctrine in SCALE.md.

    Degenerate groups (MAD = 0: more than half the values tie at the
    median) score NULL rather than ±inf — the :func:`volume_anomalies`
    guard, mirrored by CASE WHEN in the oracle, so Spark's non-ANSI
    NULL divide and DuckDB's IEEE ±inf can never diverge."""
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = events.join(med, "event_type").withColumn(
        "abs_dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad"), F.first("med").alias("med")
    )
    scored = events.join(mad, "event_type").withColumn(
        "mz",
        F.when(
            F.col("mad") > 0,
            F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"),
        ),
    )
    return scored.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.first("med"), 6).alias("median"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.sum(F.when(F.abs(F.col("mz")) > cutoff, 1).otherwise(0)).cast("long").alias("n_outliers"),
        F.round(F.max(F.abs(F.col("mz"))), 6).alias("max_abs_z"),
    )


def session_paths(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN, max_steps: int = 5, k: int = 20
) -> DataFrame:
    """Top-k session journeys: the first ``max_steps`` event types of
    each session joined into a path string ("view>click>purchase"),
    counted across all sessions — the sequence-mining rollup behind
    funnel design (which journeys actually happen, not just whether a
    prescribed funnel converts — the discovery step before
    :func:`ordered_funnel` checks a specific one).

    Dataflow: the shared lag+cumsum session tagging (ONE user_id
    shuffle); the per-session step window and first-``max_steps``
    truncation ride the same partitioning (hash(user_id) satisfies the
    (user, session) clustering, so the per-session path aggregate adds
    NO exchange); path counting is one partial-agg shuffle on the
    path string (cardinality ≤ |event types|^max_steps, a domain-sized
    key space); top-k is a bounded sort with ties broken by path text.
    Path assembly is an ordered fold over the step-sorted struct array
    — deterministic, and DuckDB's ``string_agg(... ORDER BY step)``
    states the identical order."""
    tagged = _tag_sessions(events, gap_minutes)
    w = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    steps = tagged.withColumn("step", F.row_number().over(w)).where(F.col("step") <= max_steps)
    paths = steps.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("step", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    top = counts.orderBy(F.col("n_sessions").desc(), F.col("path").asc()).limit(k)
    return top.withColumn(
        "rk",
        F.row_number()
        .over(W.orderBy(F.col("n_sessions").desc(), F.col("path").asc()))
        .cast("long"),
    )


def volume_anomalies(events: DataFrame, cutoff: float = 3.5) -> DataFrame:
    """Ingest-volume anomaly screen: per (event_type, day) row counts,
    each day scored by the modified z-score 0.6745·(n − median)/MAD
    against that type's own daily history (:func:`mad_outliers`
    applied to VOLUME instead of values) — the monitor that catches a
    crawler stall or a duplicate-feed spike the value-level screen
    can't see. Output: one row per (event_type, day) with the count,
    the type's median/MAD and the score + flag.

    Exactness: counts are exact ints; medians are exact
    PERCENTILE_CONT over the bounded (type × day) domain (identical
    Spark ``percentile`` / DuckDB ``quantile_cont`` interpolation,
    the mad_outliers convention); the z expression divides exact
    quantities once and rounds at 6. Degenerate histories (MAD = 0,
    i.e. more than half the days share one count) score NULL rather
    than ±inf — flagged only when the count differs from the median.

    Scale: one partial-agg (type, day) shuffle over the corpus; every
    later stage keys on the bounded type×day rollup."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = daily.groupBy("event_type").agg(F.expr("percentile(n, 0.5)").alias("med"))
    dev = daily.join(med, "event_type").withColumn(
        "abs_dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad"), F.first("med").alias("med")
    )
    scored = daily.join(mad, "event_type").withColumn(
        "mz",
        F.when(
            F.col("mad") > 0,
            F.round(F.lit(0.6745) * (F.col("n") - F.col("med")) / F.col("mad"), 6),
        ),
    )
    return scored.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(F.col("med"), 6).alias("median"),
        F.round(F.col("mad"), 6).alias("mad"),
        "mz",
        F.when(F.col("mz").isNotNull(), F.abs(F.col("mz")) > cutoff)
        .otherwise(F.col("n") != F.col("med"))
        .alias("is_anomaly"),
    )


def attribution_last_touch(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click"),
    within_hours: int = 72,
) -> DataFrame:
    """Last-touch revenue attribution — the marketing-analytics rollup:
    every purchase is credited to the user's most recent preceding
    touch event (view/click) within ``within_hours``; purchases with no
    eligible touch are credited to the 'direct' channel. Reports per
    channel: purchases attributed, attributed revenue, and share of
    total purchase revenue.

    Scale shape: NO join — touches and purchases ride one event-time
    window per user (two last(ignorenulls) frames over the SAME window
    spec, so Catalyst plans a single Window over a single exchange on
    user_id), then a channel-keyed partial+final rollup; the share
    denominator is a window total over the aggregated channel table
    (bounded domain), so events are scanned exactly ONCE. The window frame excludes the current
    row, so a same-timestamp touch attributes only if it sorts BEFORE
    the purchase on the (ts, event_id) total order — deterministic in
    both engines. Time math stays in exact integer micros, and revenue
    rides the integer micro-grid (floor(v·1e6 + 0.5), the clustering.py
    doctrine) so every sum is an order-independent int64 and the two
    final ratios are the only floats."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*touch_types)
    tagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w).alias("lt_type"),
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True).over(w).alias("lt_us"),
    )
    horizon_us = within_hours * 3600 * 1_000_000
    attributed = tagged.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("lt_us").isNotNull()
            & (F.unix_micros("ts") - F.col("lt_us") <= horizon_us),
            F.col("lt_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long").alias("qv"),
    )
    # DECIMAL sum (the clustering-inertia doctrine): per-event qv is a
    # micro-grid long (≤ ~5e8 on the fixture's value range), so an
    # int64 channel total wraps silently past ~1.8e10 purchases per
    # channel under non-ANSI Spark — decimal(38,0) is exact to 1e38
    # and converts identically to double below 2^53 (hash-neutral at
    # fixture scale, proof against the 100 TB wrap)
    per_channel = attributed.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(F.col("qv").cast("decimal(38,0)")).alias("rev_q"),
    )
    # the revenue total for the share comes from a window over the
    # ALREADY-AGGREGATED channel table (|channels| rows — a bounded
    # domain), not a second pass over events: one scan, one shuffle,
    # and the single-partition window sees only channel-domain rows
    total_q = F.sum("rev_q").over(W.partitionBy())
    return per_channel.select(
        "channel",
        "n_purchases",
        F.round(F.col("rev_q").cast("double") / 1_000_000, 4).alias("attributed_revenue"),
        # guarded divide (the mad_outliers doctrine): an all-zero-value
        # purchase set reports NULL shares in BOTH engines, never a
        # Spark-NULL-vs-DuckDB-inf hash divergence
        F.when(
            total_q != 0, F.round(F.col("rev_q").cast("double") / total_q, 6)
        ).alias("revenue_share"),
    )
