"""Unreliable mode (O25 parity): the reference's RPC chaos — drop 10%
of requests, execute-but-discard-reply on ~20% of the rest (reference
mapreduce.go:24, 465-523) — restated as deterministic first-attempt
task failures (mapreduce/chaos.py), with the recovery contract proven
on executed jobs:

1. the MapReduce facade run with ``unreliable=True`` at the reference's
   default rates (drop 10%, reply-lost 20%) produces EXACTLY the
   reliable run's output;
2. a shuffle map task that emits ALL its rows and then dies
   (reply-lost) never double-counts — attempt isolation: downstream
   reads exactly one attempt's shuffle output per partition;
3. a parquet write task that writes ALL its rows and then dies never
   leaves orphan data visible — the FileCommitProtocol commits only
   the successful attempt's files.

Needs a master with task retries (``local[4, 2]``), which the shared
test session doesn't have, so the proofs run in ONE subprocess with its
own SparkContext (same pattern as test_fault_tolerance.py).
"""

from __future__ import annotations

import os
import subprocess
import sys

SCRIPT = r"""
import glob, os, sys
sys.path.insert(0, {repo!r})
marker = {marker!r}
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4, 2]")  # 2 task attempts
    .appName("unreliable-proof")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("FATAL")

from gomapreduce_spark.mapreduce.chaos import chaos_mode, unreliable_partition
from gomapreduce_spark.mapreduce.demo import DemoMapper, DemoReducer
from gomapreduce_spark.mapreduce.engine import JobConfig, MapReduceEngine
from gomapreduce_spark.mapreduce.api import ListOutputer
from gomapreduce_spark.mapreduce.io import MemoryInputer

# ---- proof 1: engine facade, unreliable=True == reliable run --------
docs = {{str(i): f"alpha beta beta gamma doc{{i}}" for i in range(6)}}
m = r = 4
# the default 10/20 bands inject on (map,p3)=drop and (reduce,p2)=
# reply_lost for this shape — assert the premise so the proof can't
# silently run chaos-free if the shape changes
expect = {{
    f"{{stage}}-p{{pid}}": chaos_mode(stage, pid)
    for stage in ("map", "reduce")
    for pid in range(r)
    if chaos_mode(stage, pid)
}}
assert "drop" in expect.values() and "reply_lost" in expect.values(), expect

def run(unreliable):
    eng = MapReduceEngine(
        spark, unreliable=unreliable,
        chaos_marker_dir=marker if unreliable else None,
    )
    out = ListOutputer()
    job_id = eng.submit(JobConfig(m=m, r=r), DemoMapper(), DemoReducer(),
                        MemoryInputer(docs), out, sync=True)
    eng.wait(job_id)
    return dict(out.pairs)

reliable = run(False)
chaotic = run(True)
assert chaotic == reliable and reliable["beta"] == 12, (reliable, chaotic)
fired = {{os.path.basename(p): open(p).read() for p in glob.glob(os.path.join(marker, "*"))}}
assert fired == expect, (fired, expect)
for p in glob.glob(os.path.join(marker, "*")):
    os.remove(p)

# ---- proof 2: reply-lost map attempt never double-counts ------------
# the wrapped stage emits EVERY row, then dies on attempt 0; the retry
# emits them again — if both attempts' shuffle output were visible the
# counts would double
def identity(batches):
    yield from batches

chaos_map = unreliable_partition("m2", identity, 0, 100, marker)  # every partition reply-lost
df = spark.range(0, 4000, 1, 4).withColumn("key", F.col("id") % 8)
counts = (
    df.mapInPandas(chaos_map, df.schema)
    .groupBy("key").count().orderBy("key").collect()
)
assert [row["count"] for row in counts] == [500] * 8, counts
assert len(glob.glob(os.path.join(marker, "m2-p*"))) == 4
for p in glob.glob(os.path.join(marker, "*")):
    os.remove(p)

# ---- proof 3: reply-lost write attempt never commits its files ------
out_dir = os.path.join(marker, "sink")
chaos_write = unreliable_partition("w3", identity, 0, 100, marker)
df.mapInPandas(chaos_write, df.schema).write.mode("overwrite").parquet(out_dir)
back = spark.read.parquet(out_dir)
assert back.count() == 4000
assert back.select(F.sum("id")).first()[0] == sum(range(4000))
assert len(glob.glob(os.path.join(marker, "w3-p*"))) == 4

print("UNRELIABLE_PROOF_OK")
"""


def test_unreliable_mode_recovers_exactly_once(tmp_path):
    marker = str(tmp_path / "chaos")
    os.makedirs(marker, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = SCRIPT.format(repo=repo, marker=marker)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "UNRELIABLE_PROOF_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-3000:]


# ---------------------------------------------------------------------------
# round-12: unreliable mode at the STREAMING sinks (r11 verdict item 4)
# ---------------------------------------------------------------------------
# The reference's unreliable mode targets exactly the lost-reply
# re-execution class: work completed, acknowledgment lost, caller
# re-executes. For a foreachBatch sink that is a micro-batch whose
# writes all landed but whose streaming commit didn't — the engine
# redelivers the batch on restart and the sink must absorb the replay.
# Batch-level injection needs no task retries (the failure is in the
# driver-side batch function, recovery is a query RESTART from the
# checkpoint), so these proofs run in the shared session.


def _run_with_restarts(run_once, max_restarts: int = 8) -> int:
    """Drive a chaos-wrapped streaming query to completion the way an
    operator would: restart from the same checkpoint until it finishes.
    Returns the number of injected failures absorbed; re-raises
    anything that is not an injected failure."""
    failures = 0
    for _ in range(max_restarts):
        try:
            run_once()
            return failures
        except Exception as e:  # StreamingQueryException wraps the injection
            if "unreliable:" not in str(e):
                raise
            failures += 1
    raise AssertionError(f"query did not complete within {max_restarts} restarts")


def test_streaming_upsert_sink_exactly_once_under_chaos(spark, sf_small, tmp_path):
    """streaming_upsert_counts under both injection modes: the query
    fails mid-run (batch dropped / batch commit lost after all writes
    landed), a restart from the same checkpoint redelivers, and the
    final table EQUALS the chaos-free run — the dynamic
    partition-overwrite sink rewrites its partitions instead of
    double-counting the replayed batch."""
    from gomapreduce_spark.mapreduce.chaos import unreliable_foreach_batch
    from gomapreduce_spark.streaming import streaming_upsert_counts

    src = f"{sf_small}/events.parquet"
    clean_out = str(tmp_path / "clean")
    streaming_upsert_counts(spark, src, clean_out, str(tmp_path / "ckpt_clean"))
    want = {
        tuple(r)
        for r in spark.read.parquet(clean_out)
        .select("hour", "event_type", "n_events")
        .collect()
    }
    assert want

    for mode, rates in (("drop", (100, 0)), ("reply_lost", (0, 100))):
        out, ckpt = str(tmp_path / f"out_{mode}"), str(tmp_path / f"ckpt_{mode}")
        att = tmp_path / f"att_{mode}"
        mrk = tmp_path / f"mrk_{mode}"
        att.mkdir(), mrk.mkdir()

        def wrap(fn, _rates=rates, _att=str(att), _mrk=str(mrk)):
            return unreliable_foreach_batch(
                "upsert", fn, _att, *_rates, marker_dir=_mrk
            )

        n_failures = _run_with_restarts(
            lambda: streaming_upsert_counts(spark, src, out, ckpt, wrap_batch=wrap)
        )
        got = {
            tuple(r)
            for r in spark.read.parquet(out)
            .select("hour", "event_type", "n_events")
            .collect()
        }
        assert got == want, mode
        fired = {p.name: p.read_text() for p in mrk.iterdir()}
        assert fired and set(fired.values()) == {mode}, fired
        assert n_failures == len(fired), (n_failures, fired)


def test_streaming_upsert_multibatch_replay_after_partial_progress(spark, sf_small, tmp_path):
    """The partial-progress case: a MULTI-batch upsert run where every
    batch's first delivery is reply-lost (all writes landed, commit
    died). Each restart must resume AFTER the committed batches and
    redeliver only the failed one; the cumulative update-mode state
    (per-window counts carried across batches) must survive the
    restarts, so the final table equals the chaos-free multi-batch
    run — which itself equals the single-batch batch aggregation."""
    from pyspark.sql import functions as F
    from test_streaming import _write_time_ordered_files

    from gomapreduce_spark.mapreduce.chaos import unreliable_foreach_batch
    from gomapreduce_spark.sources.registry import load_table
    from gomapreduce_spark.streaming import streaming_upsert_counts

    ev = load_table(spark, sf_small, "events")
    mb_dir = str(tmp_path / "mb_events")
    _write_time_ordered_files(spark, ev, mb_dir, n_files=3)

    clean_out = str(tmp_path / "clean")
    streaming_upsert_counts(spark, mb_dir, clean_out, str(tmp_path / "ckpt_clean"))
    want = {
        tuple(r)
        for r in spark.read.parquet(clean_out)
        .select("hour", "event_type", "n_events")
        .collect()
    }
    assert want

    att, mrk = tmp_path / "att", tmp_path / "mrk"
    att.mkdir(), mrk.mkdir()

    def wrap(fn):
        return unreliable_foreach_batch(
            "upsert_mb", fn, str(att), 0, 100, marker_dir=str(mrk)
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    n_failures = _run_with_restarts(
        lambda: streaming_upsert_counts(spark, mb_dir, out, ckpt, wrap_batch=wrap)
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("hour", "event_type", "n_events")
        .collect()
    }
    assert got == want
    # one injected failure per micro-batch, each absorbed by a restart
    # that resumed after the already-committed batches: with
    # maxFilesPerTrigger unset, availableNow plans the 3 files as one
    # batch per trigger only if the source splits them — assert off
    # the fired set instead of assuming a count
    fired = {p.name: p.read_text() for p in mrk.iterdir()}
    assert fired and set(fired.values()) == {"reply_lost"}
    assert n_failures == len(fired)
    # every batch id was first-delivered exactly once (attempt markers
    # are created only on first delivery — a redelivered committed
    # batch would have created a duplicate-named file and failed)
    assert len(list(att.iterdir())) == len(fired)


def test_streaming_incremental_dedup_exactly_once_under_chaos(spark, sf_small, tmp_path):
    """streaming_incremental_dedup with every micro-batch's first
    delivery reply-lost (writes landed — verdicts AND index appended —
    then the commit dies): restarts redeliver each batch once, and the
    verdict manifest equals the chaos-free multi-batch run. This is
    the sharpest replay case: the redelivered batch must overwrite its
    own first-delivery output AND must not band-join against its own
    first-delivery index rows (the batch_id < own filter)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from test_streaming import _as_set, _write_time_ordered_files

    from gomapreduce_spark.mapreduce.chaos import unreliable_foreach_batch
    from gomapreduce_spark.sources.registry import load_table
    from gomapreduce_spark.streaming import streaming_incremental_dedup

    docs = load_table(spark, sf_small, "documents")
    mb_dir = str(tmp_path / "mb_docs")
    _write_time_ordered_files(
        spark,
        docs.withColumn("_chunk", F.ntile(3).over(W.orderBy("doc_id"))),
        mb_dir,
        n_files=3,
        chunk_col="_chunk",
    )
    want = _as_set(
        streaming_incremental_dedup(
            spark, mb_dir, str(tmp_path / "w_clean"), max_files_per_trigger=1
        )
    )
    assert len(want) == docs.count()

    att = tmp_path / "att"
    mrk = tmp_path / "mrk"
    att.mkdir(), mrk.mkdir()

    def wrap(fn):
        return unreliable_foreach_batch(
            "ingest", fn, str(att), 0, 100, marker_dir=str(mrk)
        )

    work = str(tmp_path / "w_chaos")
    n_failures = _run_with_restarts(
        lambda: streaming_incremental_dedup(
            spark, mb_dir, work, max_files_per_trigger=1, wrap_batch=wrap
        )
    )
    got = _as_set(spark.read.parquet(f"{work}/verdicts").select(
        "doc_id", "n_matches", "best_jaccard", "is_dup"
    ))
    assert got == want
    # all 3 batches injected exactly once, each absorbed by one restart
    fired = {p.name: p.read_text() for p in mrk.iterdir()}
    assert fired == {f"ingest-b{b}": "reply_lost" for b in range(3)}, fired
    assert n_failures == 3


def test_incremental_dedup_bootstrap_batch_replay(spark, sf_small, tmp_path):
    """The index-bootstrap edge (round-13): batch 0's FIRST delivery
    takes the no-index-yet path (the index directory does not exist);
    its REPLAY takes the structurally different index-exists path,
    where the directory now holds exactly the replayed batch's own
    first-delivery signature rows — the one state where the
    ``batch_id < own`` filter is load-bearing ALONE (no older batches
    exist to mask a miss: without the filter every batch-0 doc would
    band-join its own first-delivery row at jaccard 1.0 and be marked
    a duplicate). Chaos is targeted at batch 0 ONLY via a stage name
    whose deterministic band injects reply_lost on batch 0 and nothing
    on batches 1-2 (asserted, not assumed), so later batches commit
    first-try and the final manifest must equal the chaos-free run."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from test_streaming import _as_set, _write_time_ordered_files

    from gomapreduce_spark.mapreduce.chaos import chaos_mode, unreliable_foreach_batch
    from gomapreduce_spark.sources.registry import load_table
    from gomapreduce_spark.streaming import streaming_incremental_dedup

    stage = "boot2"  # adler32 bands: batch 0 -> 5, batch 1 -> 42, batch 2 -> 79
    assert chaos_mode(stage, 0, 0, 10) == "reply_lost"
    assert chaos_mode(stage, 1, 0, 10) is None and chaos_mode(stage, 2, 0, 10) is None

    docs = load_table(spark, sf_small, "documents")
    mb_dir = str(tmp_path / "mb_docs")
    _write_time_ordered_files(
        spark,
        docs.withColumn("_chunk", F.ntile(3).over(W.orderBy("doc_id"))),
        mb_dir,
        n_files=3,
        chunk_col="_chunk",
    )
    want = _as_set(
        streaming_incremental_dedup(
            spark, mb_dir, str(tmp_path / "w_clean"), max_files_per_trigger=1
        )
    )

    att, mrk = tmp_path / "att", tmp_path / "mrk"

    def wrap(fn):
        return unreliable_foreach_batch(stage, fn, str(att), 0, 10, marker_dir=str(mrk))

    work = str(tmp_path / "w_chaos")
    n_failures = _run_with_restarts(
        lambda: streaming_incremental_dedup(
            spark, mb_dir, work, max_files_per_trigger=1, wrap_batch=wrap
        )
    )
    got = _as_set(spark.read.parquet(f"{work}/verdicts").select(
        "doc_id", "n_matches", "best_jaccard", "is_dup"
    ))
    assert got == want
    fired = {p.name: p.read_text() for p in mrk.iterdir()}
    assert fired == {f"{stage}-b0": "reply_lost"} and n_failures == 1, fired


def test_incremental_dedup_crash_between_sinks(spark, sf_small, tmp_path):
    """Multi-sink partial progress (round-13): streaming_incremental_
    dedup feeds TWO sinks from one foreachBatch (verdicts, then the
    signature index); unreliable_sink_gap crashes every batch's first
    delivery BETWEEN them, so each redelivery arrives with its own
    verdicts already durable and its index rows absent. The redelivery
    must overwrite its verdicts partition (dynamic overwrite) and
    write the missing index rows; the final manifest equals the
    chaos-free run and the index holds every batch exactly once."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from test_streaming import _as_set, _write_time_ordered_files

    from gomapreduce_spark.mapreduce.chaos import unreliable_sink_gap
    from gomapreduce_spark.sources.registry import load_table
    from gomapreduce_spark.streaming import streaming_incremental_dedup

    docs = load_table(spark, sf_small, "documents")
    mb_dir = str(tmp_path / "mb_docs")
    _write_time_ordered_files(
        spark,
        docs.withColumn("_chunk", F.ntile(3).over(W.orderBy("doc_id"))),
        mb_dir,
        n_files=3,
        chunk_col="_chunk",
    )
    want = _as_set(
        streaming_incremental_dedup(
            spark, mb_dir, str(tmp_path / "w_clean"), max_files_per_trigger=1
        )
    )

    gap = unreliable_sink_gap(
        "gap", str(tmp_path / "att"), marker_dir=str(tmp_path / "mrk")
    )
    work = str(tmp_path / "w_chaos")
    n_failures = _run_with_restarts(
        lambda: streaming_incremental_dedup(
            spark, mb_dir, work, max_files_per_trigger=1, between_sinks=gap
        )
    )
    got = _as_set(spark.read.parquet(f"{work}/verdicts").select(
        "doc_id", "n_matches", "best_jaccard", "is_dup"
    ))
    assert got == want
    fired = {p.name: p.read_text() for p in (tmp_path / "mrk").iterdir()}
    assert fired == {f"gap-g{b}": "sink_gap" for b in range(3)} and n_failures == 3
    # the index holds each batch's signatures exactly once: one row
    # per (band, band_hash, doc) overall, no batch written twice
    idx = spark.read.parquet(f"{work}/index")
    assert sorted(
        r["batch_id"] for r in idx.select("batch_id").distinct().collect()
    ) == [0, 1, 2]
    assert idx.count() == idx.select("band", "band_hash", "doc_id").distinct().count()


def test_incremental_dedup_source_regeneration_after_mid_index_crash(
    spark, sf_small, tmp_path
):
    """Round-14 ratchet: a crash lands BETWEEN the verdict and index
    writes (mid-batch on the signature-index path), and the run is
    COMPOSED with a testdata regeneration — the source corpus
    rewritten in place with the same file names and pinned mtimes, the
    way the driver regenerates fixtures. Two guarantees must compose:

    (1) replay correctness on the ORIGINAL identity: restarting the v1
        run absorbs the mid-index crash exactly once (manifest equals
        the chaos-free v1 run; index holds every batch exactly once);
    (2) identity isolation across the regeneration: the work dir
        (checkpoint + verdicts + index) is keyed by the SOURCE's
        identity (sources.cache.identity_cache_dir — directory
        identity folds per-entry sizes, so same-name same-mtime
        rewrites still change the key). The regenerated corpus maps to
        a FRESH work dir: the v2 run starts from a clean checkpoint
        (every v2 doc gets a verdict — a reused checkpoint would
        silently skip the same-named files as already-seen), and the
        v1 work dir is left byte-untouched. Resuming a stale
        checkpoint against regenerated files is exactly the hazard the
        identity key forecloses."""
    import os
    import shutil

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from test_streaming import _as_set, _write_time_ordered_files

    from gomapreduce_spark.mapreduce.chaos import unreliable_sink_gap
    from gomapreduce_spark.sources.cache import identity_cache_dir
    from gomapreduce_spark.sources.registry import load_table
    from gomapreduce_spark.streaming import streaming_incremental_dedup

    docs = load_table(spark, sf_small, "documents")
    v1 = docs.where(F.col("doc_id") % 2 == 0)

    def write_corpus(df, out_dir):
        _write_time_ordered_files(
            spark,
            df.withColumn("_chunk", F.ntile(3).over(W.orderBy("doc_id"))),
            out_dir,
            n_files=3,
            chunk_col="_chunk",
        )

    mb_dir = str(tmp_path / "mb_docs")
    write_corpus(v1, mb_dir)
    work1 = identity_cache_dir("sid_work", mb_dir, "test_regen")

    want_v1 = _as_set(
        streaming_incremental_dedup(
            spark, mb_dir, str(tmp_path / "w_clean1"), max_files_per_trigger=1
        )
    )

    # crash between the two sinks on batch 1's first delivery only
    gap = unreliable_sink_gap(
        "regen", str(tmp_path / "att"), marker_dir=str(tmp_path / "mrk")
    )

    def gap_b1(batch_id: int) -> None:
        if batch_id == 1:
            gap(batch_id)

    try:
        n_failures = _run_with_restarts(
            lambda: streaming_incremental_dedup(
                spark, mb_dir, work1, max_files_per_trigger=1, between_sinks=gap_b1
            )
        )
        # (1) the restart absorbed the mid-index crash on the same identity
        assert n_failures == 1
        got_v1 = _as_set(
            spark.read.parquet(f"{work1}/verdicts").select(
                "doc_id", "n_matches", "best_jaccard", "is_dup"
            )
        )
        assert got_v1 == want_v1
        idx = spark.read.parquet(f"{work1}/index")
        assert sorted(
            r["batch_id"] for r in idx.select("batch_id").distinct().collect()
        ) == [0, 1, 2]
        assert idx.count() == idx.select("band", "band_hash", "doc_id").distinct().count()

        # regenerate the corpus IN PLACE: same file names, pinned
        # mtimes, different content/sizes (v2 = the full corpus)
        write_corpus(docs, mb_dir)
        work2 = identity_cache_dir("sid_work", mb_dir, "test_regen")
        assert work2 != work1, "directory identity must change on regeneration"

        def snapshot(d):
            return {
                os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
                for r, _, fs in os.walk(d)
                for f in fs
            }

        before = snapshot(work1)
        got_v2 = _as_set(
            streaming_incremental_dedup(spark, mb_dir, work2, max_files_per_trigger=1)
        )
        # (2) fresh identity => fresh checkpoint: EVERY v2 doc verdicted
        assert len(got_v2) == docs.count()
        want_v2 = _as_set(
            streaming_incremental_dedup(
                spark, mb_dir, str(tmp_path / "w_clean2"), max_files_per_trigger=1
            )
        )
        assert got_v2 == want_v2
        assert snapshot(work1) == before, "v2 run touched the v1 work dir"
    finally:
        for d in (work1,):
            shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(
            identity_cache_dir("sid_work", mb_dir, "test_regen"), ignore_errors=True
        )
