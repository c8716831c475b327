"""S3 / object-store connector surface.

The reference's sole connector is S3 (reference s3_utils.go:39-107:
session + list-objects + get-object; inputer.go:23-43 builds ListKeys/
GetValue on it). On Spark the whole surface is the Hadoop S3A
filesystem: ``spark.read.parquet("s3a://bucket/prefix")`` does the
listing, split planning, ranged GETs, retries and credential resolution
that the reference hand-rolls — every reader in this package
(`registry.load_table`, `read_text_dir`, `read_as`) takes an
``s3a://`` URI unchanged.

What this module adds is the *configuration* recipe as code:

- :func:`s3a_confs` — the Hadoop conf key/values for a real cluster or
  a path-style local stub (MinIO / LocalStack), so the settings live in
  one audited place instead of scattered notebook snippets.
- :func:`configure_s3a` — applies them to a live session's Hadoop conf
  (fs.* keys are read at FileSystem-instantiation time, so runtime
  application works; fresh sessions can pass them as ``spark.hadoop.*``
  builder confs instead).
- :func:`s3a_available` — probe for the S3A jars. The pyspark wheel
  does NOT bundle hadoop-aws; on a cluster image it is present, in this
  container it is not, and tests gate on this probe.

At 100 TB the confs that matter beyond credentials: the directory
committer (``magic`` — BOTH halves: the fs.s3a.committer.* Hadoop keys
and the spark.sql commit-protocol bindings from spark-hadoop-cloud,
since either alone leaves writes on the rename committer), a high
``fs.s3a.connection.maximum`` (one pool per executor feeding many
concurrent ranged reads), and ``fs.s3a.experimental.input.fadvise=
random`` for parquet's non-sequential column reads.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: hadoop-aws must match the Hadoop client bundled with pyspark
#: (hadoop-client-api-3.4.2 here) — mixed versions fail at runtime.
HADOOP_AWS_COORD = "org.apache.hadoop:hadoop-aws:3.4.2"

#: Spark-side committer bindings (PathOutputCommitProtocol and the
#: parquet binding committer) live in the spark-hadoop-cloud module —
#: also not bundled in the pyspark wheel; match the Spark version.
SPARK_HADOOP_CLOUD_COORD = "org.apache.spark:spark-hadoop-cloud_2.13:4.1.2"

#: Spark SQL confs that actually route DataFrame writes through the
#: S3A committer. Setting only the fs.s3a.committer.* Hadoop keys is
#: NOT enough for spark.sql writes — without these, parquet commits
#: silently stay on the rename-based FileOutputCommitter.
MAGIC_COMMITTER_SPARK_CONFS = {
    "spark.sql.sources.commitProtocolClass":
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class":
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
}


def s3a_confs(
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool | None = None,
    anonymous: bool = False,
    magic_committer: bool = True,
) -> dict[str, str]:
    """Hadoop conf map for S3A. Defaults target a real AWS endpoint
    with the instance/environment credential chain; pass ``endpoint`` +
    ``path_style=True`` + keys for MinIO/LocalStack stubs."""
    confs: dict[str, str] = {
        "fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        # parquet column chunks are read out of order; 'random' skips
        # the drop-and-reopen penalty sequential mode pays per seek
        "fs.s3a.experimental.input.fadvise": "random",
        "fs.s3a.connection.maximum": "96",
    }
    if magic_committer:
        confs["fs.s3a.committer.name"] = "magic"
        confs["fs.s3a.committer.magic.enabled"] = "true"
    if endpoint:
        confs["fs.s3a.endpoint"] = endpoint
        # stubs sit behind one host -> bucket-in-path addressing
        confs["fs.s3a.path.style.access"] = "true" if path_style is not False else "false"
    elif path_style is not None:
        confs["fs.s3a.path.style.access"] = "true" if path_style else "false"
    if anonymous:
        confs["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    if access_key is not None:
        confs["fs.s3a.access.key"] = access_key
    if secret_key is not None:
        confs["fs.s3a.secret.key"] = secret_key
    return confs


def committer_bindings_available(spark: SparkSession) -> bool:
    """True iff spark-hadoop-cloud's PathOutputCommitProtocol is on the
    JVM classpath — the prerequisite for Spark SQL writes to use the
    S3A magic committer at all."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        )
        return True
    except Exception:
        return False


def configure_s3a(spark: SparkSession, **kwargs) -> dict[str, str]:
    """Apply :func:`s3a_confs` to the session's live Hadoop conf and
    return what was set. fs.* keys are consulted when a FileSystem for
    the scheme is first instantiated (per URI authority), so this works
    on an already-running session.

    When the magic committer is requested, the Spark-side commit
    protocol (``MAGIC_COMMITTER_SPARK_CONFS``) is also applied —
    without it, Spark SQL writes ignore the fs.s3a.committer.* keys and
    keep using rename-based commits. Applied ONLY when the
    spark-hadoop-cloud bindings are on the classpath (add
    ``SPARK_HADOOP_CLOUD_COORD`` next to ``HADOOP_AWS_COORD``):
    pointing the commit protocol at a missing class would break every
    write on the session."""
    confs = s3a_confs(**kwargs)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in confs.items():
        hconf.set(k, v)
    if kwargs.get("magic_committer", True) and committer_bindings_available(spark):
        for k, v in MAGIC_COMMITTER_SPARK_CONFS.items():
            spark.conf.set(k, v)
        confs = {**confs, **MAGIC_COMMITTER_SPARK_CONFS}
    return confs


def s3a_available(spark: SparkSession) -> bool:
    """True iff the S3A filesystem class is on the JVM classpath
    (hadoop-aws + AWS SDK bundle)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem")
        return True
    except Exception:
        return False
