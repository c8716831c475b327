"""Training-shard writer: range-partitioned, internally sorted parquet
(`sources.registry.write_training_shards`)."""

from __future__ import annotations

import glob
import os

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
