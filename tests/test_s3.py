"""S3A connector surface (reference s3_utils.go:39-107, inputer.go:23-43).

No S3 endpoint exists in this container and the pyspark wheel does not
bundle hadoop-aws, so the live-read test self-gates on jar presence:
with the jars it reads through a configured endpoint; without them it
asserts the exact failure mode — the URI must reach Hadoop's FileSystem
dispatch and fail on the missing S3A class, proving scheme routing (not
our code) is the only gap. The config recipe itself is exercised for
real against the session's Hadoop conf.
"""

from __future__ import annotations

import pytest

from gomapreduce_spark.sources.s3 import (
    HADOOP_AWS_COORD,
    configure_s3a,
    s3a_available,
    s3a_confs,
)


def test_s3a_confs_stub_profile():
    """MinIO/LocalStack profile: endpoint + path-style + static keys."""
    c = s3a_confs(
        endpoint="http://127.0.0.1:9000",
        access_key="minio",
        secret_key="minio123",
        path_style=True,
        magic_committer=False,
    )
    assert c["fs.s3a.endpoint"] == "http://127.0.0.1:9000"
    assert c["fs.s3a.path.style.access"] == "true"
    assert c["fs.s3a.access.key"] == "minio"
    assert "fs.s3a.committer.name" not in c
    # the perf confs are always on — parquet reads are random-access
    assert c["fs.s3a.experimental.input.fadvise"] == "random"


def test_s3a_confs_cluster_profile():
    """Real-endpoint profile: credential chain, magic committer on."""
    c = s3a_confs()
    assert c["fs.s3a.committer.name"] == "magic"
    assert "fs.s3a.endpoint" not in c
    assert "fs.s3a.access.key" not in c
    assert HADOOP_AWS_COORD.endswith("3.4.2")  # pinned to bundled hadoop


def test_configure_s3a_applies_to_live_session(spark):
    applied = configure_s3a(spark, endpoint="http://127.0.0.1:9000", anonymous=True)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in applied.items():
        assert hconf.get(k) == v
    assert "Anonymous" in hconf.get("fs.s3a.aws.credentials.provider")


def test_s3a_uri_reaches_filesystem_dispatch(spark):
    """`load_table`-style reads route s3a:// URIs through Hadoop FS
    dispatch unchanged. With hadoop-aws present this is a live read;
    without it the failure MUST be the missing S3A class (anything else
    — e.g. 'No FileSystem for scheme' pre-dispatch, or a path parse
    error in our code — would mean the connector claim is wrong)."""
    configure_s3a(spark, endpoint="http://127.0.0.1:9", anonymous=True)
    if s3a_available(spark):
        pytest.skip("hadoop-aws present: exercise against a real stub endpoint")
    with pytest.raises(Exception) as ei:
        spark.read.parquet("s3a://no-such-bucket/table.parquet").limit(1).collect()
    msg = str(ei.value)
    assert "S3AFileSystem not found" in msg or "s3a" in msg.lower()


def test_load_table_passes_s3a_uri_to_filesystem_dispatch(spark):
    """The actual entry point users call — ``load_table`` — must hand an
    ``s3a://`` sf_dir to Hadoop unchanged (no local-path assumptions in
    our code). Covers the reference's ListKeys/GetValue-over-S3 surface
    (s3_utils.go:39-67) at the API level: with hadoop-aws present this
    is a live read; without it the failure must be the missing S3A
    class, proving dispatch was reached."""
    from gomapreduce_spark.sources.registry import load_table

    configure_s3a(spark, endpoint="http://127.0.0.1:9", anonymous=True)
    if s3a_available(spark):
        pytest.skip("hadoop-aws present: exercise against a real stub endpoint")
    with pytest.raises(Exception) as ei:
        load_table(spark, "s3a://no-such-bucket/sf100", "lineitem").limit(1).collect()
    msg = str(ei.value)
    assert "S3AFileSystem not found" in msg or "s3a" in msg.lower()


def test_magic_committer_spark_confs_gated_on_bindings(spark):
    """The Spark-side commit protocol must be applied only when the
    spark-hadoop-cloud bindings exist — pointing commitProtocolClass at
    a missing class would break every write. This container has no
    bindings, so configure_s3a must NOT set them (and must still set
    the Hadoop-side committer keys)."""
    from gomapreduce_spark.sources.s3 import (
        MAGIC_COMMITTER_SPARK_CONFS,
        committer_bindings_available,
        configure_s3a,
    )

    applied = configure_s3a(spark, magic_committer=True)
    assert applied["fs.s3a.committer.name"] == "magic"
    if committer_bindings_available(spark):
        for k, v in MAGIC_COMMITTER_SPARK_CONFS.items():
            assert applied[k] == v == spark.conf.get(k)
    else:
        assert not any(k in applied for k in MAGIC_COMMITTER_SPARK_CONFS)
        # and the session's write path is untouched
        assert spark.conf.get("spark.sql.sources.commitProtocolClass", None) not in (
            MAGIC_COMMITTER_SPARK_CONFS["spark.sql.sources.commitProtocolClass"],
        )
