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


def read_binary_dir(spark, path: str, glob: str | None = None) -> DataFrame:
    """Ingest a directory of opaque media files as multimodal rows via
    Spark's binaryFile source: (path, modificationTime, length, content)
    → (doc_id from path hash, payload, meta). The real-ingest
    counterpart of :func:`with_binary_payload`; Spark enumerates and
    splits the listing exactly like the reference's S3 prefix scan
    (reference inputer.go:33-37) but distributed."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.abs(F.xxhash64("path")).alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            # extension from the BASENAME only — splitting the whole
            # path on '.' returns garbage for dots in directory names
            # or extension-less files; this yields '' for no extension
            F.regexp_extract("path", r"\.([^/.]+)$", 1).alias("ext"),
            F.col("length").alias("orig_bytes"),
            F.col("path").alias("source_path"),
        ).alias("meta"),
    )


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


RESIZE_SCHEMA = "doc_id long, width int, height int, thumb binary"


def resize_images(mm: DataFrame, width: int = 64, height: int = 48, fake: bool = True) -> DataFrame:
    """STUB-decoded resize: binary in → binary out through mapInPandas.

    The real path (PIL/libvips) is unavailable in this container and
    raises ``NotImplementedError``; the fake path emits a deterministic
    "thumbnail" (strided byte sample of the payload, length width*height
    /64 capped) so schema, batch shape, and binary-column round-trip are
    real and testable. At 100 TB this is the canonical decode-transform
    stage: embarrassingly parallel, Arrow-batched, output column pruned
    by parquet when unused."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("image codecs unavailable; use fake=True")
            n_out = max(1, (width * height) // 64)
            thumbs = pdf["payload"].map(
                lambda b: bytes(b[:: max(1, len(b) // n_out)][:n_out]) if len(b) else b"\x00"
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "thumb": thumbs,
                }
            ).astype({"width": "int32", "height": "int32"})

    return mm.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_header binary"


def sample_frames(mm: DataFrame, frame_size: int = 256, every_n: int = 4) -> DataFrame:
    """Frame sampling for "video" payloads: chunk the byte stream into
    fixed-size frames and keep every Nth — a 1→N mapInPandas (each input
    row yields multiple frame rows; batch shape changes, which is why
    this is mapInPandas and not a scalar UDF). Deterministic from the
    payload so tests can assert exact frame counts."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, headers = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, (len(payload) + frame_size - 1) // frame_size)
                for f in range(0, n_frames, every_n):
                    chunk = payload[f * frame_size : (f + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(f)
                    sizes.append(len(chunk))
                    headers.append(bytes(chunk[:8]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes, "frame_header": headers}
            ).astype({"frame_idx": "int32", "frame_bytes": "int32"})

    return mm.mapInPandas(batches, FRAME_SCHEMA)


def decode_audio(payload: bytes, fake: bool = False) -> bytes:
    """STUB: real audio decode (PCM from mp3/flac/ogg) needs ffmpeg/
    soundfile — not in this container. ``fake=True`` treats the payload
    bytes themselves as 8-bit samples, keeping the chunking and feature
    plumbing testable end-to-end."""
    if not fake:
        raise NotImplementedError("audio codecs unavailable in this environment; use fake=True")
    return payload


AUDIO_CHUNK_SCHEMA = "doc_id long, chunk_idx int, start_byte int, n_bytes int, mean_amp double"


def chunk_audio(mm: DataFrame, chunk_bytes: int = 64, fake: bool = True) -> DataFrame:
    """Fixed-window chunking of "audio" payloads + per-chunk amplitude —
    the featurization front-end (frame → window → feature) every audio
    pipeline starts with, as a 1→N mapInPandas. Empty payloads yield one
    empty chunk (a doc never vanishes). ``mean_amp`` is the mean sample
    value of the fake 8-bit decode — deterministic, asserted against a
    plain-Python reference in tests; the chunk ACCOUNTING (counts,
    offsets, byte totals) is SQL-oracle-checked via
    :func:`audio_chunk_stats`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, sizes, amps = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = decode_audio(payload, fake=fake)
                n_chunks = max(1, (len(samples) + chunk_bytes - 1) // chunk_bytes)
                for c in range(n_chunks):
                    chunk = samples[c * chunk_bytes : (c + 1) * chunk_bytes]
                    ids.append(doc_id)
                    idxs.append(c)
                    starts.append(c * chunk_bytes)
                    sizes.append(len(chunk))
                    amps.append(float(sum(chunk)) / len(chunk) if chunk else 0.0)
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_idx": idxs, "start_byte": starts,
                 "n_bytes": sizes, "mean_amp": amps}
            ).astype({"chunk_idx": "int32", "start_byte": "int32", "n_bytes": "int32"})

    return mm.mapInPandas(batches, AUDIO_CHUNK_SCHEMA)


def audio_chunk_stats(docs: DataFrame) -> DataFrame:
    """Queryable rollup of the audio chunker: chunk count, byte total,
    and last-chunk accounting per doc — pure arithmetic in the payload
    length, so a SQL oracle replicates it exactly."""
    chunks = chunk_audio(with_binary_payload(docs))
    return chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.max("start_byte").cast("long").alias("last_start"),
        F.max_by("n_bytes", "chunk_idx").cast("long").alias("last_bytes"),
    )


def frame_stats(docs: DataFrame) -> DataFrame:
    """Queryable rollup of the frame sampler: frames kept + bytes per
    doc — deterministic from text length, so SQL-oracle-checkable."""
    frames = sample_frames(with_binary_payload(docs))
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("frame_bytes").cast("long").alias("sampled_bytes"),
        F.min("frame_idx").cast("long").alias("first_frame"),
        F.max("frame_idx").cast("long").alias("last_frame"),
    )
