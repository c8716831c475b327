"""Spark 4 Python Data Source ("keyedtext") — the reference's custom
Inputer/Outputer contract as a registered Catalyst format: per-file /
per-chunk partition planning, planning-time file pruning from pushed
key predicates, and a commit-protocol keyed writer."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registered(spark):
    from gomapreduce_spark.sources.keyedtext import KeyedTextDataSource

    spark.dataSource.register(KeyedTextDataSource)
    return spark


def _write_files(d, files: dict[str, str]) -> str:
    os.makedirs(d, exist_ok=True)
    for name, content in files.items():
        with open(os.path.join(d, name), "w") as fh:
            fh.write(content)
    return str(d)


FILES = {
    "alpha.txt": "one two three\nfour five\n",
    "beta.txt": "six seven\n",
    "gamma.log": "eight\nnine ten eleven\ntwelve\n",
}


def test_read_one_row_per_file(registered, tmp_path):
    d = _write_files(tmp_path / "in", FILES)
    got = {r.key: r.value for r in registered.read.format("keyedtext").load(d).collect()}
    assert got == FILES


def test_chunked_read_splits_on_line_boundaries(registered, tmp_path):
    d = _write_files(tmp_path / "in", FILES)
    rows = (
        registered.read.format("keyedtext")
        .option("chunk_bytes", 10)
        .load(d)
        .collect()
    )
    # chunks reassemble to the originals, in #idx order (the reference
    # chunker's contract: split at >= chunk_bytes, only on newlines)
    by_file: dict[str, list] = {}
    for r in rows:
        name, idx = r.key.rsplit("#", 1)
        by_file.setdefault(name, []).append((int(idx), r.value))
    assert {n: "".join(v for _, v in sorted(parts)) for n, parts in by_file.items()} == FILES
    for parts in by_file.values():
        for _, chunk in sorted(parts)[:-1]:
            assert chunk.endswith("\n"), "chunk boundary not line-aligned"
    assert len(rows) > len(FILES)  # chunking actually split something


def test_pushed_key_filter_prunes_file_listing(registered, tmp_path):
    from pyspark.sql.datasource import EqualTo, StringStartsWith

    from gomapreduce_spark.sources.keyedtext import KeyedTextReader

    d = _write_files(tmp_path / "in", FILES)
    # planner-level: the reader consumes key predicates for pruning
    # (and yields them back for row-level re-application)
    r = KeyedTextReader({"path": d})
    leftover = list(r.pushFilters([EqualTo(("key",), "beta.txt")]))
    assert len(leftover) == 1
    assert [p.key for p in r.partitions()] == ["beta.txt"]
    r2 = KeyedTextReader({"path": d, "chunk_bytes": "10"})
    list(r2.pushFilters([StringStartsWith(("key",), "gamma")]))
    assert all(p.key.startswith("gamma") for p in r2.partitions())
    assert len(r2.partitions()) >= 2
    # end-to-end: the SQL filter returns exactly the matching rows
    df = registered.read.format("keyedtext").load(d).where(F.col("key") == "beta.txt")
    assert [tuple(r) for r in df.collect()] == [("beta.txt", FILES["beta.txt"])]


def test_keyed_writer_one_file_per_key(registered, tmp_path):
    d = str(tmp_path / "out")
    os.makedirs(d)
    df = registered.createDataFrame(
        [("k1", "hello"), ("k2", "world"), ("k3", "42")], "key string, value string"
    )
    df.write.format("keyedtext").mode("overwrite").save(d)
    names = sorted(n for n in os.listdir(d) if not n.startswith("_"))
    assert names == ["k1", "k2", "k3"]
    assert open(os.path.join(d, "k2")).read() == "world"
    # overwrite replaces prior keys instead of accumulating
    registered.createDataFrame([("k9", "new")], "key string, value string").write.format(
        "keyedtext"
    ).mode("overwrite").save(d)
    assert sorted(n for n in os.listdir(d) if not n.startswith("_")) == ["k9"]


def test_wordcount_through_the_source_matches_direct(registered, tmp_path):
    """The reference's composite demo (O1→O12) with the source half
    served by the registered format: word counts through keyedtext
    equal counts computed from the raw strings."""
    from collections import Counter

    from gomapreduce_spark.operators.wordcount import word_count

    d = _write_files(tmp_path / "in", FILES)
    df = registered.read.format("keyedtext").load(d)
    got = {r.word: r.cnt for r in word_count(df, text_col="value").collect()}
    want = Counter(w for c in FILES.values() for w in c.split())
    assert got == dict(want)


def test_stream_reader_offsets_unit():
    """Offset bookkeeping without Spark: new files between offsets are
    exactly the emitted rows, and readBetweenOffsets replays them."""
    import tempfile

    from gomapreduce_spark.sources.keyedtext import KeyedTextStreamReader

    with tempfile.TemporaryDirectory() as d:
        _write_files(d, {"a": "1", "b": "2"})
        r = KeyedTextStreamReader({"path": d})
        o0 = r.initialOffset()
        rows, o1 = r.read(o0)
        assert sorted(rows) == [("a", "1"), ("b", "2")]
        assert o1 == {"seen": ["a", "b"]}
        rows2, o2 = r.read(o1)
        assert list(rows2) == [] and o2 == o1  # nothing new
        _write_files(d, {"c": "3"})
        rows3, o3 = r.read(o1)
        assert list(rows3) == [("c", "3")] and o3 == {"seen": ["a", "b", "c"]}
        assert sorted(r.readBetweenOffsets(o0, o3)) == [("a", "1"), ("b", "2"), ("c", "3")]


def test_stream_read_picks_up_arriving_files(registered, tmp_path):
    """Live micro-batch path: a readStream on the format sees the
    initial files, then a file that arrives mid-stream."""
    import time

    d = _write_files(tmp_path / "arrivals", {"f1": "hello\n", "f2": "world\n"})
    q = (
        registered.readStream.format("keyedtext")
        .load(d)
        .writeStream.format("memory")
        .queryName("kt_stream")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        def rows():
            return {tuple(r) for r in registered.table("kt_stream").collect()}

        deadline = time.time() + 60
        while len(rows()) < 2 and time.time() < deadline:
            time.sleep(0.5)
        assert rows() == {("f1", "hello\n"), ("f2", "world\n")}
        _write_files(d, {"f3": "late\n"})
        while len(rows()) < 3 and time.time() < deadline:
            time.sleep(0.5)
        assert ("f3", "late\n") in rows()
    finally:
        q.stop()


def test_keyed_writer_overwrite_survives_stray_subdir(registered, tmp_path):
    """Overwrite cleanup must rmtree directories in the target (an old
    partitioned layout) instead of crashing in os.remove, and the
    per-attempt temp layout still lands one complete file per key
    (advisor round-6 finding)."""
    d = str(tmp_path / "out")
    os.makedirs(os.path.join(d, "lang=en"))
    with open(os.path.join(d, "lang=en", "old.txt"), "w") as fh:
        fh.write("stale")
    with open(os.path.join(d, "stale_key"), "w") as fh:
        fh.write("stale")
    registered.createDataFrame(
        [("k1", "alpha"), ("k2", "beta")], "key string, value string"
    ).repartition(2).write.format("keyedtext").mode("overwrite").save(d)
    assert sorted(n for n in os.listdir(d) if not n.startswith("_")) == ["k1", "k2"]
    assert open(os.path.join(d, "k1")).read() == "alpha"
    # the job temp dir (and its per-attempt subdirs) are gone
    assert not [n for n in os.listdir(d) if n.startswith("_temporary-")]
