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
