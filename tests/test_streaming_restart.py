"""Streaming restart/recovery proof: a stopped query restarted on the
same checkpoint must resume from its committed offsets with its state
store intact — the operational guarantee that makes streaming dedup
exactly-once across process restarts (the reference has no recovery
story at all: its intermediate store is volatile RAM,
emittedStore.go:18-21 / README.md:74)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_chunk(spark, rows, schema, path):
    import glob
    import shutil

    tmp = path + "__tmp"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(src, path)
    shutil.rmtree(tmp)


def test_dedup_state_survives_query_restart(spark, tmp_path):
    schema = "event_id long, user_id long, v double"
    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run_available():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .dropDuplicates(["event_id"])
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: ids 0..9 and 10..19; id 7 will be re-sent after restart
    _write_chunk(spark, [(i, i % 3, float(i)) for i in range(10)], schema, f"{src}/f1.parquet")
    _write_chunk(spark, [(i, i % 3, float(i)) for i in range(10, 20)], schema, f"{src}/f2.parquet")
    run_available()
    first = spark.read.parquet(out)
    assert first.count() == 20

    # restart input: one NEW id and one DUPLICATE of id 7 from run 1 —
    # dropping it requires the RESTORED state store, not just offsets
    _write_chunk(
        spark, [(20, 0, 20.0), (7, 1, 777.0)], schema, f"{src}/f3.parquet"
    )
    run_available()
    final = spark.read.parquet(out)
    assert final.count() == 21  # 0..20 exactly once; the re-sent 7 was dropped
    assert final.where(F.col("event_id") == 7).count() == 1
    # the surviving id-7 row is run 1's original, not the 777.0 replay
    assert final.where(F.col("event_id") == 7).head().v == 7.0
    # and the restart did not reprocess run 1's files (exactly-once on
    # the source side too): every id appears exactly once
    assert final.groupBy("event_id").count().where(F.col("count") > 1).count() == 0
