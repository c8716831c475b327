"""Training-shard writer: range-partitioned, internally sorted parquet
(`sources.registry.write_training_shards`)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from gomapreduce_spark.sources.registry import load_table, write_training_shards


def test_training_shards_layout(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, order_col="doc_id")

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) == 4

    # every shard is internally sorted, and shard key ranges are
    # disjoint and ordered by file name (range partitioning)
    ranges = []
    total = 0
    for f in files:
        ids = [r["doc_id"] for r in spark.read.parquet(f).select("doc_id").collect()]
        assert ids == sorted(ids), f"shard {f} not sorted"
        if ids:
            ranges.append((ids[0], ids[-1]))
            total += len(ids)
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo, "shard ranges overlap"

    # lossless: the shard set is exactly the input
    assert total == docs.count()
    back = spark.read.parquet(out)
    assert back.select("doc_id").distinct().count() == docs.count()


def test_partitioned_corpus_layout_and_pruning(spark, sf_small, tmp_path):
    """Hive layout on disk; a partition-column filter must prune at
    planning time (PartitionFilters, file count bounded by the matching
    directory) rather than scan-and-discard."""
    import glob
    import os

    from gomapreduce_spark.sources.registry import load_table, write_partitioned_corpus
    from tools.explain_audit import plan_str

    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "part_corpus")
    write_partitioned_corpus(docs, out, "lang", "source")
    langs = {os.path.basename(p) for p in glob.glob(f"{out}/lang=*")}
    assert langs == {f"lang={r['lang']}" for r in docs.select("lang").distinct().collect()}
    assert glob.glob(f"{out}/lang=en/source=*")

    back = spark.read.parquet(out)
    filtered = back.where((F.col("lang") == "en") & (F.col("source") == "src3"))
    plan = plan_str(filtered)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    # round-trip integrity on the pruned slice
    want = docs.where((F.col("lang") == "en") & (F.col("source") == "src3"))
    assert {tuple(sorted(r.asDict().items())) for r in filtered.collect()} == {
        tuple(sorted(r.asDict().items())) for r in want.collect()
    }
    # one file per (lang, source) leaf — the repartition-by-partition-cols
    # write contract (no tasks×partitions small-file explosion)
    for leaf in glob.glob(f"{out}/lang=*/source=*"):
        assert len(glob.glob(f"{leaf}/part-*.parquet")) == 1, leaf


def test_zorder_layout_prunes_both_dimensions(spark, sf_med, tmp_path):
    """Per-file footer stats after a Z-order write are tight in BOTH
    key dimensions: a point filter on either column skips most files,
    while the linear-sort baseline prunes only its own sort column."""
    import pyarrow.parquet as pq

    from gomapreduce_spark.sources.registry import load_table, write_zordered

    from pyspark.sql import Window as W

    raw = load_table(spark, sf_med, "events")
    # equal-frequency bucket both dimensions into the same 8-bit range
    # first: Morton interleaving balances dimensions of comparable
    # magnitude, and rank buckets (not min/max scaling) keep a skewed
    # dimension from collapsing onto a few codes — the same prep a
    # production OPTIMIZE ZORDER applies via range-partition ids
    ev = raw.select(
        "event_id",
        (F.ntile(256).over(W.orderBy("user_id", "event_id")) - 1).cast("long").alias("user_id"),
        (F.ntile(256).over(W.orderBy("value", "event_id")) - 1).cast("long").alias("vband"),
    )
    zdir, ldir = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(ev, zdir, "user_id", "vband", n_files=8, bits=8)
    (
        ev.repartitionByRange(8, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    def hits(d, col, val):
        n_files, n_hit = 0, 0
        for f in glob.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            n_files += 1
            n_hit += int(lo <= val <= hi)
        return n_files, n_hit

    # medians of each dimension as the probe points
    u = ev.approxQuantile("user_id", [0.5], 0.0)[0]
    v = ev.approxQuantile("vband", [0.5], 0.0)[0]
    zn, zu = hits(zdir, "user_id", u)
    _, zv = hits(zdir, "vband", v)
    ln, lu = hits(ldir, "user_id", u)
    _, lv = hits(ldir, "vband", v)
    assert zn == ln == 8
    assert lu <= 2                    # linear: near-perfect on its own sort column
    assert lv == 8                    # ...and zero pruning on the other
    # z-order's contract: EACH dimension prunes (a point filter never
    # scans every file), unlike linear where the second dimension reads
    # 8/8. Exact counts wobble ±1 with range-boundary sampling, so the
    # bounds are the curve's theoretical envelope (<= 6 of 8 per dim),
    # not a point estimate.
    assert zv < lv and zv <= 6 and zu <= 6
    assert zu + zv <= 11              # combined cost stays near linear's
                                      # 1 + 8 while covering both predicates
    # round-trip integrity
    assert spark.read.parquet(zdir).count() == ev.count()


def test_dataset_manifest_matches_dataset(spark, sf_small, tmp_path):
    import json

    from gomapreduce_spark.sources.registry import (
        load_table,
        write_dataset_manifest,
        write_training_shards,
    )

    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    m = write_dataset_manifest(out, order_col="doc_id")
    assert m["total_rows"] == docs.count() and m["n_files"] == 4
    # range-routing contract: shard key ranges are disjoint and ordered
    spans = sorted((e["min"], e["max"]) for e in m["files"])
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # the file on disk round-trips
    disk = json.load(open(f"{out}/_MANIFEST.json"))
    assert disk["total_rows"] == m["total_rows"]
    assert sum(e["rows"] for e in disk["files"]) == m["total_rows"]


def test_compact_dataset_reduces_files_and_preserves_rows(spark, sf_small, tmp_path):
    from gomapreduce_spark.sources.registry import compact_dataset, load_table

    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "fragmented")
    docs.repartition(40).write.parquet(out)  # 40 tiny files
    before = {tuple(r) for r in spark.read.parquet(out).collect()}
    stats = compact_dataset(spark, out, target_mb=128, order_col="doc_id")
    assert stats["files_before"] == 40 and stats["files_after"] == 1
    after_df = spark.read.parquet(out)
    after = {tuple(r) for r in after_df.select(*docs.columns).collect()}
    assert after == before
    # ordered rewrite restored footer pruning: single file, sorted run
    ids = [r["doc_id"] for r in after_df.select("doc_id").collect()]
    assert ids == sorted(ids)


def test_compact_dataset_recovers_from_crash_leftovers(spark, sf_small, tmp_path):
    """The two-rename swap has a window where the dataset exists only
    at <path>__old; a rerun must restore it, and stale __old /
    __compacting leftovers from completed-or-failed runs must not make
    the rename/rmtree steps fail or delete live data."""
    import os

    from gomapreduce_spark.sources.registry import compact_dataset, load_table

    docs = load_table(spark, sf_small, "documents").limit(50)
    out = str(tmp_path / "ds")
    docs.repartition(5).write.parquet(out)
    before = {tuple(r) for r in spark.read.parquet(out).collect()}

    # simulate a crash BETWEEN the two renames: dataset only at __old
    os.rename(out, out + "__old")
    os.makedirs(out + "__compacting")  # plus a half-written rewrite dir
    stats = compact_dataset(spark, out, target_mb=128)
    assert stats["files_before"] == 5 and stats["files_after"] == 1
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == before
    assert not os.path.exists(out + "__old") and not os.path.exists(out + "__compacting")

    # simulate a crash AFTER the swap (stale __old beside a live path):
    # the live dataset must win and the stale copy must be cleared
    spark.read.parquet(out).limit(10).write.parquet(out + "__old")
    stats = compact_dataset(spark, out, target_mb=128)
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == before
    assert not os.path.exists(out + "__old")


def test_hilbert_key_is_a_true_hilbert_curve(spark):
    """The mathematical signature of a Hilbert curve, pinned exactly:
    over the full 16x16 grid the key is a BIJECTION onto 0..255 and
    every pair of consecutive codes maps to GRID-ADJACENT cells
    (|dx|+|dy| == 1) — the property Morton order lacks (its seam jumps
    are why Hilbert clusters tighter)."""
    from gomapreduce_spark.sources.registry import with_hilbert_key

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = with_hilbert_key(grid, "x", "y", bits=4, out="d").collect()
    by_d = {r.d: (r.x, r.y) for r in rows}
    assert sorted(by_d) == list(range(256))  # bijection
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_layout_prunes_both_dimensions(spark, sf_med, tmp_path):
    """Same both-dimension pruning contract as the z-order test, on the
    Hilbert layout: a point filter on either bucketed column must skip
    files (<= 6 of 8), unlike a linear sort's 8/8 on its second
    column; round-trip row count intact."""
    import pyarrow.parquet as pq

    from pyspark.sql import Window as W

    from gomapreduce_spark.sources.registry import load_table, write_hilbert_clustered

    raw = load_table(spark, sf_med, "events")
    ev = raw.select(
        "event_id",
        (F.ntile(256).over(W.orderBy("user_id", "event_id")) - 1).cast("long").alias("user_id"),
        (F.ntile(256).over(W.orderBy("value", "event_id")) - 1).cast("long").alias("vband"),
    )
    hdir = str(tmp_path / "hilbert")
    write_hilbert_clustered(ev, hdir, "user_id", "vband", n_files=8, bits=8)

    def hits(col, val):
        n_files, n_hit = 0, 0
        for f in glob.glob(f"{hdir}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            n_files += 1
            n_hit += int(lo <= val <= hi)
        return n_files, n_hit

    u = ev.approxQuantile("user_id", [0.5], 0.0)[0]
    v = ev.approxQuantile("vband", [0.5], 0.0)[0]
    nf, hu = hits("user_id", u)
    _, hv = hits("vband", v)
    assert nf == 8
    assert hu <= 6 and hv <= 6
    assert hu + hv <= 11
    assert spark.read.parquet(hdir).count() == ev.count()
