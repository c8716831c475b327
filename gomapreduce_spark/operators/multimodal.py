"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed in Arrow batches via ``mapInPandas``.

Driver-mandated extension. The image/audio codecs are NOT in this
container, so the decode step is stubbed (``decode_image`` raises
``NotImplementedError`` unless ``fake=True``); everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real and
tested. The deterministic fake "decoder" derives metadata from the
payload bytes so results remain oracle-checkable.

At 100 TB: binary payloads ride in their own column (parquet keeps them
out of unrelated scans via column pruning); decode work is
embarrassingly parallel per Arrow batch, sized by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, size_bytes int, fake_width int, fake_height int, header string"


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model documents as multimodal rows: payload = utf-8 bytes of the
    text (stands in for image/audio bytes) + typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("orig_chars"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """STUB: real image decode needs PIL/libvips — not in this container.

    ``fake=True`` derives deterministic dimensions from the byte length,
    keeping the pipeline testable end-to-end."""
    if not fake:
        raise NotImplementedError("image codecs unavailable in this environment; use fake=True")
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas: one pandas batch in, one out; no per-row Python."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sizes = pdf["payload"].map(len)
            dims = pdf["payload"].map(lambda b: decode_image(b, fake=True))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "size_bytes": sizes.astype("int32"),
                    "fake_width": dims.map(lambda d: d[0]).astype("int32"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int32"),
                    "header": pdf["payload"].map(lambda b: b[:8].decode("utf-8", "replace")),
                }
            )

    return mm.mapInPandas(batches, FEATURE_SCHEMA)


def multimodal_features(docs: DataFrame) -> DataFrame:
    """End-to-end: encode → mapInPandas feature extraction. Output is
    deterministic from text so a SQL oracle can replicate it."""
    return extract_features(with_binary_payload(docs))
