"""Table registry for the driver testdata.

Spark-first replacement for the reference's sole connector surface
(S3 list/get/chunk — reference inputer.go:33-43, s3_utils.go:39-107):
``spark.read.parquet`` enumerates files, splits them into input
partitions by ``spark.sql.files.maxPartitionBytes``, prunes columns, and
pushes filters into the scan — all of which the reference hand-rolls or
lacks. The same calls take ``s3a://`` URIs unchanged on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; with ``nanosAsLong`` it arrives as a long
    that we floor-divide to microseconds (integer division — the value
    exceeds 2**53 so a double roundtrip would lose precision) to match
    DuckDB's nanos→micros truncation exactly.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
