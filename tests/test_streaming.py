"""Structured Streaming parity: streaming result == batch result on the
same static input (the meaningful correctness check for a stream with a
finite replay)."""

from __future__ import annotations

from gomapreduce_spark.operators.events import tumbling_counts
from gomapreduce_spark.sources.registry import load_table
from gomapreduce_spark.streaming import streaming_session_windows, streaming_tumbling_counts


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_tumbling_matches_batch(spark, sf_small):
    batch = tumbling_counts(load_table(spark, sf_small, "events"))
    stream = streaming_tumbling_counts(spark, f"{sf_small}/events.parquet")
    assert _as_set(stream.select(*batch.columns)) == _as_set(batch)


def test_streaming_sliding_matches_batch(spark, sf_small):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_small, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    from gomapreduce_spark.streaming import streaming_sliding_counts

    stream = streaming_sliding_counts(spark, f"{sf_small}/events.parquet")
    assert _as_set(stream.select(*batch.columns)) == _as_set(batch)


def test_streaming_stateful_sessions_match_batch(spark, sf_small):
    """The stateful sessionizer must emit exactly the batch sessions that
    are flushable at end-of-stream: with a 0s watermark delay the final
    watermark is max(ts), so sessions still inside their gap window at
    stream end stay open (unemitted); everything else must match the
    batch lag+cumsum sessionization row-for-row."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.operators.events import session_rows
    from gomapreduce_spark.streaming import streaming_stateful_sessions

    from pyspark.sql import Window as W

    ev = load_table(spark, sf_small, "events")
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    gap_us = 30 * 60 * 1_000_000
    # Spark-exact flush semantics: a session is emitted iff it was
    # closed by a later event of the same user (every non-final
    # session) OR its event-time timeout fired — and timeouts fire only
    # when the MS-TRUNCATED watermark is STRICTLY past the ms-truncated
    # timeout timestamp. Mirroring that here (instead of a micros <=)
    # makes the parity exact at the boundary, not just off-by-one-safe.
    user_last = F.max("last_us").over(W.partitionBy("user_id"))
    batch = (
        session_rows(ev)
        .withColumn("user_last_us", user_last)
        .where(
            (F.col("last_us") < F.col("user_last_us"))
            | (F.lit(max_us // 1000) > F.expr(f"(last_us + {gap_us}) div 1000"))
        )
        .select("user_id", "session_start", "n_events", "dur_s")
    )
    stream = streaming_stateful_sessions(spark, f"{sf_small}/events.parquet")
    got = _as_set(stream.select("user_id", "session_start", "n_events", "dur_s"))
    want = _as_set(batch)
    assert got == want


def test_streaming_session_windows_matches_batch(spark, sf_small):
    """Native session_window streaming == the same session_window
    aggregation on a static read == the hand-rolled lag+cumsum
    sessionizer (three independent formulations of one semantics)."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.operators.events import sessionize

    ev = load_table(spark, sf_small, "events")
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.max("n_events").alias("max_session_events"))
    )
    stream = streaming_session_windows(spark, f"{sf_small}/events.parquet")
    assert _as_set(stream.select(*batch.columns)) == _as_set(batch)
    lagged = sessionize(ev).select("user_id", "n_sessions", "max_session_events")
    assert _as_set(stream.select(*lagged.columns)) == _as_set(lagged)


def test_streaming_dedup_matches_batch(spark, sf_small, tmp_path):
    """Duplicate the whole events table (full replay) plus a partial
    replay of half of it; the streaming dedup must recover exactly the
    batch dropDuplicates result."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_dedup_events

    raw = spark.read.parquet(f"{sf_small}/events.parquet")
    dup_dir = str(tmp_path / "dup_events")
    raw.unionByName(raw).unionByName(raw.where(F.col("event_id") % 2 == 0)).write.mode(
        "overwrite"
    ).parquet(dup_dir)

    got = streaming_dedup_events(spark, dup_dir)
    assert got.count() == raw.count()
    assert got.select("event_id").distinct().count() == raw.count()


def test_streaming_interval_join_matches_batch(spark, sf_small):
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_click_purchase_join

    ev = load_table(spark, sf_small, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    batch = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")),
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    stream = streaming_click_purchase_join(spark, f"{sf_small}/events.parquet")
    got, want = _as_set(stream), _as_set(batch)
    assert len(want) > 0, "vacuous: no click->purchase pairs in fixture"
    assert got == want


def test_streaming_left_outer_join_matches_watermark_filtered_batch(spark, sf_small):
    """LEFT OUTER stream-stream join: all inner matches, plus a
    null-padded row for exactly the unmatched clicks whose match window
    closed before the final watermark (min of both sides' ms-truncated
    max event time, minus the 1-hour delay). Pins the eviction predicate
    the hash oracle encodes."""
    import datetime

    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_left_outer_interval_join

    ev = load_table(spark, sf_small, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    inner = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")),
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")

    mx_c, mx_p = clicks.agg(F.max("click_ts")).first()[0], purchases.agg(F.max("purchase_ts")).first()[0]
    trunc = lambda t: t.replace(microsecond=t.microsecond // 1000 * 1000)
    wm = min(trunc(mx_c), trunc(mx_p)) - datetime.timedelta(hours=1)
    nullpad = (
        clicks.join(inner.select("click_id").distinct(), "click_id", "left_anti")
        .where(F.col("click_ts") + F.expr("INTERVAL 60 MINUTES") < F.lit(wm))
        .select(F.col("c_user").alias("user_id"), "click_id", F.lit(None).cast("long").alias("purchase_id"))
    )
    want = _as_set(inner) | _as_set(nullpad)

    got = _as_set(streaming_left_outer_interval_join(spark, f"{sf_small}/events.parquet"))
    assert len(want) > len(_as_set(inner)), "vacuous: no null-padded rows in fixture"
    assert got == want


def _write_time_ordered_files(
    spark, src_df, out_dir: str, n_files: int, ts_col: str = "ts", chunk_col: str | None = None
):
    """Split a DataFrame into ``n_files`` event-time-ordered parquet
    files with strictly increasing modification times, so a file stream
    with maxFilesPerTrigger=1 replays them as in-order micro-batches
    (FileStreamSource orders by mod time) — the shape a live
    file-arrival ingest actually has. Pass ``chunk_col`` (values
    1..n_files) to control the split boundaries explicitly."""
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import functions as F, Window as W

    os.makedirs(out_dir, exist_ok=True)
    if chunk_col:
        chunked = src_df.withColumnRenamed(chunk_col, "_chunk")
    else:
        chunked = src_df.withColumn(
            "_chunk", F.ntile(n_files).over(W.orderBy(F.col(ts_col), F.col("event_id")))
        )
    for k in range(1, n_files + 1):
        part_dir = f"{out_dir}/_stage_{k}"
        chunked.where(F.col("_chunk") == k).drop("_chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        src = globmod.glob(f"{part_dir}/part-*.parquet")[0]
        dst = f"{out_dir}/chunk_{k:03d}.parquet"
        shutil.move(src, dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))


def test_multibatch_sessions_match_single_batch(spark, sf_small, tmp_path):
    """Incremental replay (one file per micro-batch, watermark advancing
    between batches, event-time timeouts firing mid-stream) must emit
    exactly the same sessions as the everything-in-one-batch replay —
    the real proof the stateful operator's semantics are incremental,
    not an artifact of single-batch processing."""
    from gomapreduce_spark.streaming import streaming_stateful_sessions

    ev = load_table(spark, sf_small, "events")
    mb_dir = str(tmp_path / "mb_events")
    _write_time_ordered_files(spark, ev, mb_dir, n_files=6)

    single = _as_set(streaming_stateful_sessions(spark, f"{sf_small}/events.parquet"))
    multi = _as_set(streaming_stateful_sessions(spark, mb_dir, max_files_per_trigger=1))
    assert len(single) > 0
    assert multi == single


def test_multibatch_left_outer_join_matches_single_batch(spark, sf_small, tmp_path):
    """Null-padding is emitted by mid-stream state eviction in the
    incremental replay (not just the end-of-stream flush); the final
    row set must be identical to the single-batch replay because
    time-ordered arrival means every match lands before its left row's
    window expires."""
    from gomapreduce_spark.streaming import streaming_left_outer_interval_join

    ev = load_table(spark, sf_small, "events")
    mb_dir = str(tmp_path / "mb_events_lo")
    _write_time_ordered_files(spark, ev, mb_dir, n_files=6)

    single = _as_set(streaming_left_outer_interval_join(spark, f"{sf_small}/events.parquet"))
    multi = _as_set(streaming_left_outer_interval_join(spark, mb_dir, max_files_per_trigger=1))
    assert multi == single


def test_multibatch_dedup_state_eviction_contract(spark, sf_small, tmp_path):
    """dropDuplicatesWithinWatermark's PRODUCTION contract: a replayed
    id arriving within the watermark horizon is dropped, but one
    arriving after the original's state was evicted (event time > 1 h
    past it in a later batch) SURVIVES — that state bound is the whole
    point of the within-watermark variant. The single-batch replay
    can't show this (all state lives for the lone batch); the
    incremental replay must."""
    import datetime

    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_dedup_events

    ev = load_table(spark, sf_small, "events").orderBy("ts").limit(200).cache()
    rows = ev.collect()
    t0 = rows[0]["ts"]
    near = spark.createDataFrame([rows[0]], ev.schema).withColumn(
        "ts", F.lit(t0 + datetime.timedelta(minutes=5)).cast("timestamp")
    )
    far = spark.createDataFrame([rows[0]], ev.schema).withColumn(
        "ts", F.lit(t0 + datetime.timedelta(hours=3)).cast("timestamp")
    )
    # synthetic watermark-driver events guarantee the watermark crosses
    # original + 1 h regardless of fixture density; two of them because
    # expired state is physically removed at batch COMMIT — a replay in
    # the same batch the watermark first crosses the bound can still
    # hit lingering state (the within-watermark guarantee is one-sided)
    def synth(eid: int, minutes: int):
        return spark.createDataFrame([rows[0]], ev.schema).withColumn(
            "event_id", F.lit(eid).cast("long")
        ).withColumn("ts", F.lit(t0 + datetime.timedelta(minutes=minutes)).cast("timestamp"))

    spiked = ev.unionByName(near).unionByName(far).unionByName(synth(-999, 230)).unionByName(
        synth(-998, 235)
    )
    # batch plan (watermark shown is the one the batch RUNS with):
    #   b1 wm=-inf : original + near (+5 min) → near deduped in-state
    #   b2 wm≈t0-55m : all real events ≤ +230m, driver -999 at +230m
    #   b3 wm=+170m : driver -998 at +235m — original's state (expiry
    #                 +60m < wm) is evicted at this batch's commit
    #   b4 wm=+175m : far (+180m — NEWER than wm, so not late-dropped,
    #                 and its key's state is gone → kept) + all
    #                 remaining real events (all newer still)
    m = lambda x: F.lit(t0 + datetime.timedelta(minutes=x)).cast("timestamp")
    is_far = (F.col("event_id") == rows[0]["event_id"]) & (F.col("ts") == m(180))
    chunk = (
        F.when(F.col("ts") <= m(10), 1)
        .when(is_far, 4)
        .when(F.col("event_id") == -998, 3)
        .when(F.col("ts") <= m(230), 2)
        .otherwise(4)
    )
    mb_dir = str(tmp_path / "mb_events_dd")
    _write_time_ordered_files(
        spark, spiked.withColumn("_chunk", chunk), mb_dir, n_files=4, chunk_col="_chunk"
    )

    got = streaming_dedup_events(spark, mb_dir, max_files_per_trigger=1)
    dup_rows = got.where(F.col("event_id") == rows[0]["event_id"]).count()
    # original kept; +5 min replay deduped (state alive); +3 h replay
    # kept (state evicted once the watermark passed original + 1 h)
    assert dup_rows == 2
    assert got.count() == ev.count() + 3  # + far + 2 drivers


def test_streaming_upsert_sink_matches_batch_and_is_idempotent(spark, sf_small, tmp_path):
    """foreachBatch partition-overwrite sink: the parquet table equals
    the batch aggregation, and re-running the stream over the same
    input (fresh checkpoint, same output dir) leaves it unchanged —
    replay rewrites partitions instead of duplicating rows."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_upsert_counts

    ev = load_table(spark, sf_small, "events")
    batch = {
        (r["hour"], r["event_type"], r["n_events"])
        for r in ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd-HH").alias("hour"),
            "event_type",
            "n_events",
        )
        .collect()
    }
    out = str(tmp_path / "counts")
    streaming_upsert_counts(spark, f"{sf_small}/events.parquet", out, str(tmp_path / "ckpt1"))
    got1 = {tuple(r) for r in spark.read.parquet(out).select("hour", "event_type", "n_events").collect()}
    assert got1 == batch
    # replay with a fresh checkpoint: same totals, no duplication
    streaming_upsert_counts(spark, f"{sf_small}/events.parquet", out, str(tmp_path / "ckpt2"))
    got2 = {tuple(r) for r in spark.read.parquet(out).select("hour", "event_type", "n_events").collect()}
    assert got2 == batch


def test_streaming_static_enrichment_matches_batch(spark, sf_small):
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_static_enrichment

    cust = load_table(spark, sf_small, "customer")
    got = _as_set(
        streaming_static_enrichment(spark, f"{sf_small}/events.parquet", cust)
    )
    dim = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )
    exp = _as_set(
        load_table(spark, sf_small, "events")
        .join(dim, "user_id", "left")
        .select("event_id", "user_id", "event_type", "segment", "acctbal")
    )
    assert got == exp and len(got) > 0


def test_streaming_upsert_sink_incremental_batch_keeps_siblings(spark, tmp_path):
    """A later micro-batch that touches only ONE event type in an hour
    must not wipe that hour's other event types — overwrite granularity
    has to match the (hour, event_type) update key. Two runs against a
    growing source dir with the SAME checkpoint: run 2 processes only
    the new file, whose events are in-watermark and re-emit one type's
    window while the sibling type's rows must survive."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_upsert_counts

    def raw_events(rows):
        # fixture layout: ts is int64 NANOS (reader does ts div 1000)
        return spark.createDataFrame(
            [(i, int(ts * 1e9), 1, et, 1.0, "{}") for i, (ts, et) in enumerate(rows)],
            "event_id long, ts long, user_id long, event_type string, value double, props string",
        )

    base = 1_700_000_000  # epoch seconds, hour-aligned enough for windows
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "counts"), str(tmp_path / "ckpt")
    # batch 1: typeA and typeB in the same hour
    raw_events([(base, "typeA"), (base + 600, "typeB")]).write.parquet(src)
    streaming_upsert_counts(spark, src, out, ckpt)
    got1 = {tuple(r) for r in spark.read.parquet(out).select("hour", "event_type", "n_events").collect()}
    assert {t for _, t, _ in got1} == {"typeA", "typeB"}
    # batch 2 (same checkpoint): one more typeA event in the SAME hour,
    # within the watermark — update mode re-emits only typeA's window
    raw_events([(base + 1200, "typeA")]).write.mode("append").parquet(src)
    streaming_upsert_counts(spark, src, out, ckpt)
    got2 = {(t, n) for _, t, n in (tuple(r) for r in
            spark.read.parquet(out).select("hour", "event_type", "n_events").collect())}
    assert ("typeB", 1) in got2, "incremental batch deleted the sibling event type"
    assert ("typeA", 2) in got2


def test_streaming_gopher_filter_matches_batch(spark, sf_small):
    """The streaming corpus-hygiene filter must equal the batch
    gopher_rules projection row-for-row on a static replay."""
    from gomapreduce_spark.operators.text import gopher_rules
    from gomapreduce_spark.streaming import streaming_gopher_filter

    batch = gopher_rules(load_table(spark, sf_small, "documents"))
    stream = streaming_gopher_filter(spark, f"{sf_small}/documents.parquet")
    got, want = _as_set(stream.select(*batch.columns)), _as_set(batch)
    assert got == want and len(got) > 0


def test_streaming_contamination_filter_matches_batch(spark, sf_small):
    """The streaming decontamination screen must equal batch
    contamination_spans row-for-row on a static replay (shared oracle
    contract): the stateless membership join plus the order-free
    sorted-array union fold reproduce the batch interval-union window
    exactly."""
    from gomapreduce_spark.operators.dedup import contamination_spans
    from gomapreduce_spark.streaming import streaming_contamination_filter

    batch = contamination_spans(load_table(spark, sf_small, "documents"))
    stream = streaming_contamination_filter(spark, f"{sf_small}/documents.parquet")
    got, want = _as_set(stream.select(*batch.columns)), _as_set(batch)
    assert got == want and len(got) > 0


def test_streaming_contamination_filter_split_invariant(spark, sf_small, tmp_path):
    """Doc-level verdicts cannot depend on micro-batch boundaries: a
    3-file replay (maxFilesPerTrigger=1 — genuinely incremental) must
    equal the single-file replay."""
    import os

    from gomapreduce_spark.streaming import streaming_contamination_filter

    docs = load_table(spark, sf_small, "documents")
    mb_dir = str(tmp_path / "mb_docs_contam")
    os.makedirs(mb_dir, exist_ok=True)
    docs.repartition(3).write.mode("overwrite").parquet(mb_dir)
    single = _as_set(streaming_contamination_filter(spark, f"{sf_small}/documents.parquet"))
    multi = _as_set(streaming_contamination_filter(spark, mb_dir))
    assert single == multi and len(single) > 0


def test_streaming_weighted_sample_matches_batch(spark, sf_small):
    """The streaming importance thinner, calibrated by the static
    snapshot of the same corpus, must equal batch weighted_sample
    row-for-row on a static replay (shared oracle contract)."""
    from gomapreduce_spark.operators.text import weighted_sample
    from gomapreduce_spark.streaming import streaming_weighted_sample

    docs = load_table(spark, sf_small, "documents")
    batch = weighted_sample(docs)
    stream = streaming_weighted_sample(spark, f"{sf_small}/documents.parquet", docs)
    got, want = _as_set(stream.select(*batch.columns)), _as_set(batch)
    assert got == want and len(got) > 0


def test_streaming_weighted_sample_split_invariant(spark, sf_small, tmp_path):
    """A stateless per-row decision cannot depend on micro-batch
    boundaries: streaming the corpus as a 3-file directory yields the
    same sample as the single-file replay."""
    import os

    from gomapreduce_spark.streaming import streaming_weighted_sample

    docs = load_table(spark, sf_small, "documents")
    mb_dir = str(tmp_path / "mb_docs")
    os.makedirs(mb_dir, exist_ok=True)
    docs.repartition(3).write.mode("overwrite").parquet(mb_dir)
    single = _as_set(streaming_weighted_sample(spark, f"{sf_small}/documents.parquet", docs))
    multi = _as_set(streaming_weighted_sample(spark, mb_dir, docs))
    assert single == multi and len(single) > 0


def test_streaming_chained_windows_matches_batch(spark, sf_small):
    """The two-tier chained rollup equals the equivalent batch two-level
    aggregation, restricted to hours the final watermark closed (hour
    end <= ms-truncated max ts — the append-mode emission contract)."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_chained_windows

    got = _as_set(streaming_chained_windows(spark, f"{sf_small}/events.parquet"))
    ev = load_table(spark, sf_small, "events")
    minute = ev.groupBy(
        F.window("ts", "10 minutes").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    hourly = (
        minute.groupBy(F.window(F.col("w.start"), "1 hour").alias("hw"), "event_type")
        .agg(
            F.sum("n").alias("total"),
            F.max("n").alias("peak_10min"),
            F.count("*").alias("n_windows"),
        )
    )
    wm_ms = ev.agg(
        (F.floor(F.unix_micros(F.max("ts")) / 1000) * 1000).alias("wm_us")
    )
    want = _as_set(
        hourly.crossJoin(F.broadcast(wm_ms))
        .where(F.unix_micros(F.col("hw.end")) <= F.col("wm_us"))
        .select(
            F.date_format(F.col("hw.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            F.col("total").cast("long"),
            F.col("peak_10min").cast("long"),
            F.col("n_windows").cast("long"),
        )
    )
    assert len(got) > 0
    assert got == want


def test_multibatch_chained_windows_match_single_batch(spark, sf_small, tmp_path):
    """Chained stateful operators under incremental replay: both tiers'
    state must survive watermark advances across micro-batches and
    produce the single-batch result exactly."""
    from gomapreduce_spark.streaming import streaming_chained_windows

    ev = load_table(spark, sf_small, "events")
    mb_dir = str(tmp_path / "mb_events_chain")
    _write_time_ordered_files(spark, ev, mb_dir, n_files=6)

    single = _as_set(streaming_chained_windows(spark, f"{sf_small}/events.parquet"))
    multi = _as_set(streaming_chained_windows(spark, mb_dir, max_files_per_trigger=1))
    assert len(single) > 0
    assert multi == single


def test_streaming_incremental_dedup_split_invariant(spark, sf_small, tmp_path):
    """The ingest-dedup verdicts are identical whether the corpus
    arrives as one batch or one file per batch — the keep-first-by-id
    rule decouples the result from the batch boundaries — and they
    agree with the batch keep-first scorer on the same corpus."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from gomapreduce_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_K,
        _score_new_vs_index,
        banded_signatures,
        minhash_wide,
    )
    from gomapreduce_spark.streaming import streaming_incremental_dedup

    docs = load_table(spark, sf_small, "documents")
    mb_dir = str(tmp_path / "mb_docs")
    _write_time_ordered_files(
        spark,
        docs.withColumn(
            "_chunk", F.ntile(5).over(W.orderBy("doc_id"))
        ),
        mb_dir,
        n_files=5,
        chunk_col="_chunk",
    )
    single = _as_set(
        streaming_incremental_dedup(spark, mb_dir, str(tmp_path / "w1"))
    )
    multi = _as_set(
        streaming_incremental_dedup(
            spark, mb_dir, str(tmp_path / "w2"), max_files_per_trigger=1
        )
    )
    assert len(single) == docs.count()
    assert multi == single
    # batch-engine parity: the same keep-first rule in one shot
    b = banded_signatures(minhash_wide(docs, MINHASH_K), MINHASH_K, MINHASH_BANDS)
    want = _as_set(
        _score_new_vs_index(
            docs.select("doc_id"), b, b, MINHASH_K, 0.5, require_lower_index_id=True
        )
    )
    assert single == want


def test_streaming_incremental_dedup_flags_planted_dup(spark, tmp_path):
    """A verbatim copy arriving later in the stream is dropped; the
    original is kept."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_incremental_dedup

    body = "the quick brown fox jumps over the lazy dog again and again " * 3
    other = "completely different content with nothing shared at all in any way " * 3
    docs = spark.createDataFrame(
        [(1, body), (2, other), (10, body)], "doc_id long, text string"
    )
    mb_dir = str(tmp_path / "mb")
    _write_time_ordered_files(
        spark,
        docs.withColumn("_chunk", F.ntile(3).over(W.orderBy("doc_id"))),
        mb_dir,
        n_files=3,
        chunk_col="_chunk",
    )
    got = {
        r["doc_id"]: r
        for r in streaming_incremental_dedup(
            spark, mb_dir, str(tmp_path / "w"), max_files_per_trigger=1
        ).collect()
    }
    assert not got[1]["is_dup"] and not got[2]["is_dup"]
    assert got[10]["is_dup"] and got[10]["best_jaccard"] == 1.0


def test_windowed_agg_drops_late_rows_in_append_mode(spark, sf_small, tmp_path):
    """Watermark late-data semantics, proven end-to-end: a row whose
    event time is far behind the watermark (it arrives in the final
    micro-batch but carries the FIRST batch's timestamp) must be
    dropped from an append-mode windowed aggregation — its window was
    finalized and emitted long before. The result equals the batch
    aggregation WITHOUT the late row, restricted to watermark-closed
    windows."""
    import datetime
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming.windows import _read_events_stream, _run_to_memory

    ev = load_table(spark, sf_small, "events").orderBy("ts").limit(300).cache()
    rows = ev.collect()
    t0 = rows[0]["ts"]
    mb_dir = str(tmp_path / "mb_late")
    _write_time_ordered_files(
        spark,
        ev.withColumn("_chunk", F.ntile(3).over(W.orderBy("ts", "event_id"))),
        mb_dir,
        n_files=3,
        chunk_col="_chunk",
    )
    # the late straggler: arrives LAST (newest file mtime), but its
    # event time is the very first timestamp of the stream
    late = spark.createDataFrame([rows[0]], ev.schema).withColumn(
        "ts", F.lit(t0).cast("timestamp")
    ).withColumn("event_id", F.lit(999_999))
    stage = str(tmp_path / "stage_late")
    late.coalesce(1).write.mode("overwrite").parquet(stage)
    src = globmod.glob(f"{stage}/part-*.parquet")[0]
    dst = f"{mb_dir}/chunk_999.parquet"
    shutil.move(src, dst)
    os.utime(dst, (1_700_000_999, 1_700_000_999))

    stream = _read_events_stream(spark, mb_dir, max_files_per_trigger=1).withWatermark(
        "ts", "0 seconds"
    )
    agg = stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n")
    )
    got = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in _run_to_memory(agg, "append").collect()
    }
    # batch expectation: original 300 rows only (late row dropped),
    # windows closed by the final watermark (ms-truncated max ts)
    wm = ev.agg((F.floor(F.unix_micros(F.max("ts")) / 1000) * 1000).alias("wm")).collect()[0]["wm"]
    want = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .where(F.unix_micros(F.col("w.end")) <= wm)
        ).collect()
    }
    assert len(want) > 0
    assert got == want
    # and the late row's (window, type) bucket kept its ORIGINAL count —
    # the straggler neither created a duplicate emission nor mutated it
    k0 = next((k for k in want if k[0] <= t0.replace(minute=0, second=0, microsecond=0) <= k[0] + datetime.timedelta(hours=1)), None)
    assert k0 is not None


def test_streaming_queries_survive_an_empty_stream(spark, sf_small, tmp_path):
    """Day-one of an ingest pipeline: the events directory exists but
    holds zero rows. The streaming lifecycles (windowed agg, arbitrary
    state, chained aggs) must complete their availableNow replay with
    a DEFINED empty result — not hang, not crash."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import (
        streaming_chained_windows,
        streaming_stateful_sessions,
        streaming_tumbling_counts,
    )

    d = str(tmp_path / "empty_events")
    load_table(spark, sf_small, "events").limit(0).write.parquet(f"{d}/events.parquet")
    path = f"{d}/events.parquet"
    assert streaming_tumbling_counts(spark, path).count() == 0
    assert streaming_stateful_sessions(spark, path).count() == 0
    assert streaming_chained_windows(spark, path).count() == 0


def test_streaming_transition_matrix_matches_batch(spark, sf_small):
    from gomapreduce_spark.operators.events import event_transition_matrix
    from gomapreduce_spark.streaming import streaming_transition_matrix

    batch = event_transition_matrix(load_table(spark, sf_small, "events"))
    stream = streaming_transition_matrix(spark, f"{sf_small}/events.parquet")
    assert _as_set(stream.select(*batch.columns)) == _as_set(batch)


def test_multibatch_transition_matrix_matches_single_batch(spark, sf_small, tmp_path):
    """Incremental replay: each user's LAST event carries across
    micro-batch boundaries in GroupState, so the step chain over six
    in-order batches must equal the single-batch (and thus the batch
    window's) transition pairs."""
    from gomapreduce_spark.streaming import streaming_transition_matrix

    ev = load_table(spark, sf_small, "events")
    mb_dir = str(tmp_path / "mb_events_tm")
    _write_time_ordered_files(spark, ev, mb_dir, n_files=6)

    single = _as_set(streaming_transition_matrix(spark, f"{sf_small}/events.parquet"))
    multi = _as_set(streaming_transition_matrix(spark, mb_dir, max_files_per_trigger=1))
    assert len(single) > 0
    assert multi == single


def test_streaming_full_outer_join_matches_watermark_filtered_batch(spark, sf_small):
    """FULL OUTER stream-stream join: all inner matches, null-padded
    unmatched clicks whose window closed before the final watermark,
    AND null-padded unmatched purchases with purchase_ts before it —
    the purchase side evicts as soon as the watermark passes
    purchase_ts (any later click fails purchase_ts >= click_ts). Pins
    both eviction predicates the hash oracle encodes."""
    import datetime

    from pyspark.sql import functions as F

    from gomapreduce_spark.streaming import streaming_full_outer_interval_join

    ev = load_table(spark, sf_small, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    inner = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES")),
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")

    mx_c, mx_p = clicks.agg(F.max("click_ts")).first()[0], purchases.agg(F.max("purchase_ts")).first()[0]
    trunc = lambda t: t.replace(microsecond=t.microsecond // 1000 * 1000)  # noqa: E731
    wm = min(trunc(mx_c), trunc(mx_p)) - datetime.timedelta(hours=1)
    null_clicks = (
        clicks.join(inner.select("click_id").distinct(), "click_id", "left_anti")
        .where(F.col("click_ts") + F.expr("INTERVAL 60 MINUTES") < F.lit(wm))
        .select(F.col("c_user").alias("user_id"), "click_id", F.lit(None).cast("long").alias("purchase_id"))
    )
    null_purchases = (
        purchases.join(inner.select("purchase_id").distinct(), "purchase_id", "left_anti")
        .where(F.col("purchase_ts") < F.lit(wm))
        .select(F.col("p_user").alias("user_id"), F.lit(None).cast("long").alias("click_id"), "purchase_id")
    )
    want = _as_set(inner) | _as_set(null_clicks) | _as_set(null_purchases)

    got = _as_set(streaming_full_outer_interval_join(spark, f"{sf_small}/events.parquet"))
    assert len(_as_set(null_purchases)) > 0, "vacuous: no unmatched purchases in fixture"
    assert got == want
