"""Task-failure recovery — the reference's failure-detection /
reassignment story (O21/O22, taskManager.go:165-182) actually
demonstrated rather than subsumed-on-faith: a partition's first attempt
dies mid-task; Spark reschedules it and the job completes with the
correct result.

Needs a master with task retries (`local[4, 2]`), which the shared test
session doesn't have (plain local = 1 attempt, failures fatal), so the
proof runs in a subprocess with its own SparkContext.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

marker_dir = tempfile.mkdtemp()

spark = (
    SparkSession.builder.master("local[4, 2]")  # 2 task attempts
    .appName("retry-proof")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("FATAL")

def flaky(batches):
    import os
    from pyspark import TaskContext
    tc = TaskContext.get()
    flag = os.path.join({marker!r}, f"p{{tc.partitionId()}}")
    if tc.partitionId() == 1 and not os.path.exists(flag):
        open(flag, "w").write("died once")
        raise RuntimeError("injected first-attempt failure")
    for pdf in batches:
        pdf["doubled"] = pdf["id"] * 2
        yield pdf[["id", "doubled"]]

df = spark.range(0, 1000, 1, 4).mapInPandas(flaky, "id long, doubled long")
rows = df.collect()
assert len(rows) == 1000, len(rows)
assert all(r["doubled"] == 2 * r["id"] for r in rows)
assert os.path.exists(os.path.join({marker!r}, "p1")), "failure never injected"
print("RETRY_PROOF_OK")
"""


def test_task_failure_is_retried_and_result_correct(tmp_path):
    marker = str(tmp_path / "markers")
    import os

    os.makedirs(marker, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = SCRIPT.format(repo=repo, marker=marker)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY_PROOF_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
    # the marker proves attempt 1 actually died before attempt 2 passed
    assert os.path.exists(os.path.join(marker, "p1"))
