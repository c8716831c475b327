"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed in Arrow batches via ``mapInPandas``.

Driver-mandated extension. Codec status, honestly:

- Image formats decode FOR REAL, pure numpy + stdlib, no external
  libs: binary PPM (P6) images (:func:`decode_ppm`, with a real
  nearest-neighbor :func:`resize_rgb`), 8-bit PNG (:func:`decode_png`,
  zlib inflate + scanline un-filtering), baseline JPEG
  (``operators.jpeg``: Huffman entropy decode, dequant + IDCT,
  greyscale/YCbCr, 4:4:4/4:2:2/4:2:0, restart markers), and PCM
  RIFF/WAVE audio (:func:`decode_wav`). Exercised end-to-end through
  mapInPandas with exact numpy-reference and round-trip tests.
- The REMAINING formats (WebP, progressive JPEG, MP3/video) need
  libvips/ffmpeg — not in this container — so those paths raise
  ``NotImplementedError`` unless ``fake=True``, whose deterministic
  byte-derived metadata keeps the Spark-side plumbing (schema, batch
  iteration, partitioning, UDF signatures) testable and
  oracle-checkable.

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


def _decode_ppm_at(payload: bytes, start: int):
    """Parse ONE binary PPM (P6) image at byte ``start`` of a buffer →
    (w, h, px, end) where ``end`` is the offset one past the raster —
    the sequential-parse primitive :func:`decode_ppm` (single image)
    and :func:`iter_ppm_frames` (concatenated video frames) share."""
    import numpy as np

    if payload[start : start + 2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    tokens: list[int] = []
    i = start + 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (w={w}, h={h}, maxval={maxval})")
    i += 1  # exactly one whitespace byte separates maxval from raster
    if len(payload) - i < w * h * 3:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)
    return w, h, px, i + w * h * 3


def decode_ppm(payload: bytes):
    """REAL image decode for binary PPM (P6) — pure numpy, no codec
    library: parse the ASCII header (magic, optional ``#`` comments,
    width, height, maxval), then view the raw RGB bytes as an
    (h, w, 3) uint8 array. Raises ValueError on anything that is not a
    well-formed 8-bit P6 payload."""
    w, h, px, _ = _decode_ppm_at(payload, 0)
    return w, h, px


def iter_ppm_frames(payload: bytes):
    """Sequentially decode a concatenated-P6 'video' payload (the
    MJPEG-style raw frame stream :func:`synth_video_payloads` builds)
    into (h, w, 3) pixel arrays. Raises ValueError on a malformed or
    trailing-garbage payload — the whole video is then treated as one
    corrupt sample by callers. An EMPTY payload is malformed too
    (zero-frame 'videos' don't exist; silently yielding nothing would
    misclassify a corrupt sample as a decoded one)."""
    if not payload:
        raise ValueError("empty video payload")
    off = 0
    while off < len(payload):
        _, _, px, off = _decode_ppm_at(payload, off)
        yield px


def encode_ppm(px) -> bytes:
    """Inverse of :func:`decode_ppm` (used by tests and the resize
    round-trip): (h, w, 3) uint8 array → P6 bytes."""
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype("uint8").tobytes()


def resize_rgb(px, out_w: int, out_h: int):
    """REAL nearest-neighbor resize — pure numpy index striding (the
    same kernel every image library bottoms out in for NEAREST)."""
    import numpy as np

    h, w = px.shape[:2]
    yi = np.arange(out_h) * h // out_h
    xi = np.arange(out_w) * w // out_w
    return px[yi][:, xi]


def decode_wav(payload: bytes):
    """REAL audio decode for PCM RIFF/WAVE — pure numpy: walk the RIFF
    chunks, parse ``fmt ``, view ``data`` as int16 (or uint8) samples,
    reshape per channel. Raises ValueError for non-WAV payloads and
    NotImplementedError for compressed (non-PCM) WAV."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = bits = channels = None
    data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1:
                raise NotImplementedError("only PCM WAV decodes natively (no ffmpeg here)")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    else:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    if channels and channels > 1:
        samples = samples[: len(samples) - len(samples) % channels].reshape(-1, channels)
    return rate, samples


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # greyscale, RGB, RGBA


def decode_png(payload: bytes):
    """REAL image decode for non-interlaced 8-bit greyscale/RGB/RGBA
    PNG — stdlib ``zlib`` + numpy, no PIL: walk the IHDR/IDAT chunks,
    inflate, and un-filter the scanlines (all five PNG filter types:
    None/Sub/Up/Average/Paeth). Returns (w, h, (h, w, channels) uint8
    array). Raises ValueError for malformed payloads and
    NotImplementedError for valid-but-unsupported PNG variants
    (16-bit, palette, interlaced — the formats that genuinely need a
    codec library)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    header = None
    idat: list[bytes] = []
    i = 8
    while i + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + size]
        if len(data) < size:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + size  # length + type + data + crc32
    if header is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, bit_depth, color_type, compression, filter_method, interlace = header
    if w <= 0 or h <= 0 or compression != 0 or filter_method != 0:
        raise ValueError(f"malformed IHDR (w={w}, h={h})")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"only non-interlaced 8-bit grey/RGB/RGBA PNG decodes natively "
            f"(bit_depth={bit_depth}, color_type={color_type}, interlace={interlace})"
        )
    bpp = _PNG_CHANNELS[color_type]
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(arr[y, 0]), arr[y, 1:]
        if f == 0:  # None
            cur = line.copy()
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp] → per-lane
            # cumulative sum; uint8 cast applies the mod-256 wrap
            cur = (
                np.cumsum(line.reshape(w, bpp), axis=0, dtype=np.uint32)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up (uint8 addition wraps mod 256)
            cur = line + prev
        elif f == 3:  # Average — sequential in x (left is reconstructed)
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        recon[y] = cur
        prev = cur
    return w, h, recon.reshape(h, w, bpp)


def encode_png(px) -> bytes:
    """Inverse of :func:`decode_png` (tests + thumbnail round trips):
    (h, w[, channels]) uint8 array → non-interlaced 8-bit PNG with
    filter-0 scanlines, stdlib zlib CRC/deflate."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


JPEG_SIG = b"\xff\xd8"


def decode_rgb(payload: bytes):
    """Format-sniffing decode to an RGB array: P6 PPM, 8-bit PNG, or
    baseline JPEG — ALL real decodes (greyscale broadcast to 3
    channels, RGBA alpha dropped). The shared entry point for the image
    stats/resize/dHash pipelines."""
    import numpy as np

    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(JPEG_SIG):
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    w, h, px = decode_png(payload)
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    elif px.shape[2] == 4:
        px = px[:, :, :3]
    return w, h, px


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Image dimensions. P6 PPM, 8-bit PNG, and baseline JPEG payloads
    decode FOR REAL (numpy; stdlib zlib for PNG; operators.jpeg for
    JPEG — greyscale + YCbCr, 4:4:4/4:2:2/4:2:0, restart markers); the
    remaining formats (WebP, progressive JPEG, 16-bit/palette/
    interlaced PNG) raise unless ``fake=True``, which derives
    deterministic dimensions from the byte length to keep the pipeline
    testable end-to-end."""
    if payload.startswith(b"P6"):
        try:
            w, h, _ = decode_ppm(payload)
            return w, h
        except ValueError:
            if not fake:
                raise
    elif payload.startswith(PNG_SIG):
        try:
            w, h, _ = decode_png(payload)
            return w, h
        except (ValueError, NotImplementedError):
            if not fake:
                raise
    elif payload.startswith(JPEG_SIG):
        from .jpeg import decode_jpeg

        try:
            w, h, _ = decode_jpeg(payload)
            return w, h
        except (ValueError, NotImplementedError):
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            "codec unavailable: P6 PPM, 8-bit PNG, and baseline JPEG decode "
            "natively; WebP/progressive-JPEG need PIL/libvips, or use fake=True"
        )
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


PPM_STATS_SCHEMA = "doc_id long, width int, height int, mean_r double, mean_g double, mean_b double"


def ppm_image_stats(mm: DataFrame) -> DataFrame:
    """REAL image featurization — no fake path: decode each P6 PPM or
    8-bit PNG payload with numpy inside an Arrow batch and emit
    dimensions + per-channel means. Rows that are neither are dropped
    (the standard corrupt-sample filter in a media pipeline). Tests
    assert exact values against an independent numpy reference."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, px = decode_rgb(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                means = px.reshape(-1, 3).mean(axis=0)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(float(means[0]))
                rows["mean_g"].append(float(means[1]))
                rows["mean_b"].append(float(means[2]))
            yield pd.DataFrame(rows).astype({"width": "int32", "height": "int32"})

    return mm.mapInPandas(batches, PPM_STATS_SCHEMA)


def resize_ppm_images(mm: DataFrame, width: int = 8, height: int = 6) -> DataFrame:
    """REAL decode → resize → re-encode round trip: P6 PPM or 8-bit
    PNG in, smaller P6 out, nearest-neighbor kernel, all numpy. The
    binary-in/binary-out shape of :func:`resize_images` with an actual
    image transform."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, thumbs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _, _, px = decode_rgb(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                ids.append(doc_id)
                thumbs.append(encode_ppm(resize_rgb(px, width, height)))
            yield pd.DataFrame(
                {"doc_id": ids, "width": width, "height": height, "thumb": thumbs}
            ).astype({"width": "int32", "height": "int32"})

    return mm.mapInPandas(batches, RESIZE_SCHEMA)


WAV_FEATURES_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, n_channels int, rms double, zero_cross_rate double"
)


def wav_audio_features(mm: DataFrame) -> DataFrame:
    """REAL audio featurization — no fake path: decode PCM WAV payloads
    with numpy and emit sample rate, length, RMS amplitude, and
    zero-crossing rate (the two features every audio-quality filter
    starts with). Non-WAV rows are dropped; multi-channel audio is
    downmixed by channel mean before the features."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                k: []
                for k in ("doc_id", "sample_rate", "n_samples", "n_channels", "rms", "zero_cross_rate")
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rate, samples = decode_wav(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                n_channels = samples.shape[1] if samples.ndim == 2 else 1
                mono = samples.mean(axis=1) if samples.ndim == 2 else samples.astype("float64")
                n = len(mono)
                rms = float(np.sqrt(np.mean(mono.astype("float64") ** 2))) if n else 0.0
                zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["n_channels"].append(n_channels)
                rows["rms"].append(rms)
                rows["zero_cross_rate"].append(zcr)
            yield pd.DataFrame(rows).astype(
                {"sample_rate": "int32", "n_samples": "int64", "n_channels": "int32"}
            )

    return mm.mapInPandas(batches, WAV_FEATURES_SCHEMA)


def grayscale(px):
    """ITU-R BT.601 luma from an (h, w, 3) uint8 array → (h, w) float64
    (the same weights every image library uses for L-mode conversion)."""
    return px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114


def image_dhash(px) -> int:
    """REAL perceptual difference hash (dHash) — pure numpy: grayscale,
    nearest-neighbor resize to 9×8, then one bit per horizontal
    gradient sign (64 bits). Near-identical images (re-encodes, small
    crops/noise) land within a few flipped bits; the industry-standard
    cheap image near-dup signature. Returned as a signed int64 bit
    pattern (Spark LongType-safe; Hamming via bit_count(xor) is
    sign-agnostic)."""
    import numpy as np

    g = grayscale(px)
    h, w = g.shape
    yi = np.arange(8) * h // 8
    xi = np.arange(9) * w // 9
    small = g[yi][:, xi]
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    return int(np.packbits(bits).view(">u8")[0].astype("int64"))


DHASH_SCHEMA = "doc_id long, width int, height int, dhash long"


def _dhash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Batch generator of :func:`image_dhashes` — module-level so the
    fused synth→feature single-pass operators can compose it Python-side
    (optimization r15, guide §4)."""
    for pdf in it:
        rows = {k: [] for k in ("doc_id", "width", "height", "dhash")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            try:
                w, h, px = decode_rgb(bytes(payload))
            except (ValueError, NotImplementedError):
                continue
            rows["doc_id"].append(doc_id)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["dhash"].append(image_dhash(px))
        yield pd.DataFrame(rows).astype({"width": "int32", "height": "int32"})


def image_dhashes(mm: DataFrame) -> DataFrame:
    """Per-image dHash fingerprints over decodable payloads (P6 PPM or
    8-bit PNG — both REAL decodes); undecodable rows are dropped, the
    standard corrupt-sample filter. One narrow Arrow pass, no shuffle."""
    return mm.mapInPandas(_dhash_batches, DHASH_SCHEMA)


def image_dhash_pairs(mm: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs: dHash fingerprints → the SAME exact
    pigeonhole Hamming banding the text SimHash dedup uses
    (dedup.hamming_band_pairs, 64 bits / 4 bands) → bit_count(xor)
    verification. The multimodal leg of the dedup family: candidate
    generation is banded equi-join, never all-pairs; shuffle is 4 rows
    per image. Proven on real images by the planted-near-dup test
    (single-pixel corruption pairs, mirror image does not); the
    registered query ships the fingerprint INDEX instead — dHash is a
    perceptual signature, and text-derived synthetic images have no
    perceptual neighborhood structure for pairs to be meaningful
    over."""
    from .dedup import hamming_band_pairs

    return hamming_band_pairs(
        image_dhashes(mm).localCheckpoint(), "dhash", 64, 4, max_hamming
    )


def synth_ppm_payloads(
    docs: DataFrame,
    width: int = 24,
    height: int = 16,
    formats: tuple[str, ...] = ("ppm", "png", "jpeg"),
) -> DataFrame:
    """Deterministic REAL-image corpus from the documents table: each
    doc's utf-8 bytes tiled into a (height, width, 3) pixel array and
    encoded in one of the natively-supported formats (round-robin by
    doc_id — P6 PPM, PNG, and baseline 4:2:0 JPEG by default, so a
    registered query exercises every real decode path including the
    JPEG Huffman/IDCT one). No binary fixtures shipped; similar texts
    yield similar images, so near-dup structure carries through."""
    return docs.select("doc_id", "text").mapInPandas(
        _synth_ppm_batches(width, height, formats), "doc_id long, payload binary"
    )


def _synth_ppm_batches(width: int, height: int, formats: tuple[str, ...]):
    """Batch-generator factory of :func:`synth_ppm_payloads` (module
    level for the fused single-pass composition — guide §4)."""
    import numpy as np

    from .jpeg import encode_jpeg

    encoders = {
        "ppm": encode_ppm,
        "png": encode_png,
        "jpeg": lambda px: encode_jpeg(px, subsample=True),
    }
    n = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                buf = (raw * (n // max(len(raw), 1) + 1))[:n]
                px = np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)
                payloads.append(encoders[formats[int(doc_id) % len(formats)]](px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return batches


def synth_wav_payloads(docs: DataFrame, rate: int = 16000) -> DataFrame:
    """Deterministic REAL-audio corpus from the documents table: each
    doc's utf-8 bytes become int16 PCM samples wrapped in a RIFF/WAVE
    container (decoded by the real codec path downstream)."""
    return docs.select("doc_id", "text").mapInPandas(
        _synth_wav_batches(rate), "doc_id long, payload binary"
    )


def _synth_wav_batches(rate: int):
    """Batch-generator factory of :func:`synth_wav_payloads` (module
    level for the fused single-pass composition — guide §4)."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")
                data = raw[: len(raw) - len(raw) % 2]
                fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
                body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
                body += b"data" + struct.pack("<I", len(data)) + data
                payloads.append(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return batches


SPECTRAL_SCHEMA = (
    "doc_id long, n_samples long, centroid_hz double, rolloff_hz double, flatness double"
)


def audio_spectral_features(mm: DataFrame) -> DataFrame:
    """REAL spectral featurization — numpy rfft over decoded PCM WAV:
    spectral centroid (power-weighted mean frequency), 85% rolloff,
    and spectral flatness (geometric/arithmetic power mean — ~1 for
    noise, →0 for tonal) — the trio behind every audio-quality /
    speech-vs-music filter. Multi-channel is downmixed first;
    undecodable rows are dropped. Embarrassingly parallel per Arrow
    batch; no shuffle."""
    return mm.mapInPandas(_spectral_batches, SPECTRAL_SCHEMA)


def _spectral_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Batch generator of :func:`audio_spectral_features` (module level
    for the fused single-pass composition — guide §4)."""
    import numpy as np

    for pdf in it:
        rows = {k: [] for k in ("doc_id", "n_samples", "centroid_hz", "rolloff_hz", "flatness")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            try:
                rate, samples = decode_wav(bytes(payload))
            except (ValueError, NotImplementedError):
                continue
            mono = samples.mean(axis=1) if samples.ndim == 2 else samples.astype("float64")
            n = len(mono)
            if n < 2:
                continue
            power = np.abs(np.fft.rfft(mono)) ** 2
            freqs = np.fft.rfftfreq(n, d=1.0 / rate)
            total = power.sum()
            if total <= 0:
                continue
            centroid = float((freqs * power).sum() / total)
            rolloff = float(freqs[np.searchsorted(np.cumsum(power), 0.85 * total)])
            flatness = float(np.exp(np.mean(np.log(power + 1e-12))) / (total / len(power)))
            rows["doc_id"].append(doc_id)
            rows["n_samples"].append(n)
            rows["centroid_hz"].append(centroid)
            rows["rolloff_hz"].append(rolloff)
            rows["flatness"].append(flatness)
        yield pd.DataFrame(rows).astype({"n_samples": "int64"})


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


# video scene detection: frame geometry + the deterministic scene
# plan (shared by synth_video_payloads and tools/gen_video_oracle.py's
# independent restatement — the generator re-derives both from these
# three constants plus its own tiling/dhash code)
VIDEO_W, VIDEO_H = 16, 12
VIDEO_SCENE_ROT = 17  # scene s tiles text rotated by s*17 utf-8 bytes


def video_scene_plan(doc_id: int) -> tuple[int, int]:
    """(n_scenes, frames_per_scene) for a doc — deterministic,
    non-constant across the corpus (2-3 scenes x 2-3 frames)."""
    return 2 + doc_id % 2, 2 + (doc_id >> 1) % 2


def synth_video_payloads(docs: DataFrame, width: int = VIDEO_W, height: int = VIDEO_H) -> DataFrame:
    """Deterministic REAL-video corpus from the documents table: each
    doc becomes a concatenated-P6 raw frame stream (the decoded-
    frame-buffer analog of an MJPEG segment — container demuxing needs
    ffmpeg, which this container lacks; the FRAMES are real images
    through the real codec path). Scene s tiles the doc's utf-8 bytes
    rotated by ``s * VIDEO_SCENE_ROT``; frames within a scene are
    identical, so scene boundaries are the only gradient changes —
    the planted structure :func:`video_scene_cuts` must recover."""
    return docs.select("doc_id", "text").mapInPandas(
        _synth_video_batches(width, height), "doc_id long, payload binary"
    )


def _synth_video_batches(width: int, height: int):
    """Batch-generator factory of :func:`synth_video_payloads` (module
    level for the fused single-pass composition — guide §4)."""
    import numpy as np

    n = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")
                if not raw:  # no pixels to tile (empty/null) — drop, don't crash
                    continue
                n_scenes, per_scene = video_scene_plan(int(doc_id))
                frames = []
                for s in range(n_scenes):
                    r = (s * VIDEO_SCENE_ROT) % len(raw)
                    rot = raw[r:] + raw[:r]
                    buf = (rot * (n // len(rot) + 1))[:n]
                    px = np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)
                    frames.extend([encode_ppm(px)] * per_scene)
                ids.append(doc_id)
                payloads.append(b"".join(frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads}).astype(
                {"doc_id": "int64"}
            )

    return batches


SCENE_CUT_SCHEMA = "doc_id long, n_frames int, n_cuts int, cut_frames string, max_step int"


def video_scene_cuts(mm: DataFrame, threshold: int = 10) -> DataFrame:
    """Video scene-cut detection — the shot-segmentation step a video
    training-data pipeline runs before per-shot sampling/captioning:
    decode each video's frame stream, dHash every frame
    (:func:`image_dhash` — the same REAL perceptual signature the
    image dedup leg uses), and call frame i a cut when its Hamming
    distance to frame i-1 EXCEEDS ``threshold`` (strict >; re-encodes
    and noise land within a few bits, a content change flips ~half).
    Output per video: (doc_id, n_frames, n_cuts, cut_frames =
    comma-joined first-frame-of-new-scene indices, max_step = the
    largest inter-frame distance). Undecodable payloads are dropped —
    the standard corrupt-sample filter (:func:`image_dhashes`).

    Scale shape: a video's frames are ADJACENT BYTES in one payload,
    so decode, hashing, and the consecutive-distance scan are all
    local to the row — ONE narrow Arrow pass, zero shuffle, one output
    row per video at any corpus size (the reference engine has no
    binary/video surface at all; this is part of the repo's mandated
    multimodal leg)."""
    return mm.mapInPandas(_scene_cut_batches(threshold), SCENE_CUT_SCHEMA)


def _scene_cut_batches(threshold: int):
    """Batch-generator factory of :func:`video_scene_cuts` (module
    level for the fused single-pass composition — guide §4)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "n_frames", "n_cuts", "cut_frames", "max_step")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    hashes = [image_dhash(px) for px in iter_ppm_frames(bytes(payload))]
                except ValueError:
                    continue
                if not hashes:
                    continue
                steps = [
                    ((a ^ b) & 0xFFFFFFFFFFFFFFFF).bit_count()
                    for a, b in zip(hashes, hashes[1:])
                ]
                cuts = [i + 1 for i, d in enumerate(steps) if d > threshold]
                rows["doc_id"].append(doc_id)
                rows["n_frames"].append(len(hashes))
                rows["n_cuts"].append(len(cuts))
                rows["cut_frames"].append(",".join(map(str, cuts)))
                rows["max_step"].append(max(steps, default=0))
            yield pd.DataFrame(rows).astype(
                {"n_frames": "int32", "n_cuts": "int32", "max_step": "int32"}
            )

    return batches


SHOT_FRAME_SCHEMA = (
    "doc_id long, shot_id int, start_frame int, n_frames int, "
    "rep_frame int, rep_dhash long"
)


def video_shot_frames(mm: DataFrame, threshold: int = 10) -> DataFrame:
    """Per-shot representative-frame sampling — the step a video
    training pipeline actually trains on: after
    :func:`video_scene_cuts` finds shot boundaries, each SHOT (the
    frame run between consecutive cuts) contributes its MIDDLE frame
    (index ``start + (len-1)//2`` — the canonical keyframe heuristic:
    maximally far from both transitions) and that frame's dHash
    (:func:`image_dhash`, the same real perceptual signature the image
    dedup leg dedups on — per-shot keyframes feed straight into
    ``image_dhash_pairs``-style cross-video dedup). Output one row per
    shot: (doc_id, shot_id, start_frame, n_frames, rep_frame,
    rep_dhash) — all integers, hash-stable across engines. Cut
    semantics are IDENTICAL to video_scene_cuts (strict
    ``hamming > threshold``), so a shot can legitimately span two
    planted scenes whose hashes land within the threshold; the rep
    frame then comes from whichever scene holds the middle index.
    Undecodable payloads are dropped (corrupt-sample filter).

    Scale shape: identical to video_scene_cuts — a video's frames are
    adjacent bytes in one payload, so decode, hashing, the cut scan,
    and shot segmentation are all row-local: ONE narrow Arrow pass,
    zero shuffle, #shots rows out (bounded by #frames). Oracle: an
    independent restatement in tools/gen_video_oracle.py (VALUES
    table, tri-SF). The reference engine has no binary/video surface;
    this extends the repo's mandated multimodal leg."""
    return mm.mapInPandas(_shot_frame_batches(threshold), SHOT_FRAME_SCHEMA)


def _shot_frame_batches(threshold: int):
    """Batch-generator factory of :func:`video_shot_frames` (module
    level for the fused single-pass composition — guide §4)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                k: []
                for k in (
                    "doc_id",
                    "shot_id",
                    "start_frame",
                    "n_frames",
                    "rep_frame",
                    "rep_dhash",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    hashes = [image_dhash(px) for px in iter_ppm_frames(bytes(payload))]
                except ValueError:
                    continue
                if not hashes:
                    continue
                cuts = [
                    i + 1
                    for i, (a, b) in enumerate(zip(hashes, hashes[1:]))
                    if ((a ^ b) & 0xFFFFFFFFFFFFFFFF).bit_count() > threshold
                ]
                bounds = [0, *cuts, len(hashes)]
                for shot_id, (start, end) in enumerate(zip(bounds, bounds[1:])):
                    rep = start + (end - start - 1) // 2
                    rows["doc_id"].append(doc_id)
                    rows["shot_id"].append(shot_id)
                    rows["start_frame"].append(start)
                    rows["n_frames"].append(end - start)
                    rows["rep_frame"].append(rep)
                    rows["rep_dhash"].append(hashes[rep])
            yield pd.DataFrame(rows).astype(
                {
                    "shot_id": "int32",
                    "start_frame": "int32",
                    "n_frames": "int32",
                    "rep_frame": "int32",
                }
            )

    return batches


# ---------------------------------------------------------------------------
# Fused synth→feature single-pass forms (optimization r15, guide §4).
#
# The registered queries compose a synthetic-payload generator with a
# feature extractor: synth_ppm_payloads → image_dhashes,
# synth_wav_payloads → audio_spectral_features, synth_video_payloads →
# video_scene_cuts / video_shot_frames. Chained as two mapInPandas
# operators, the intermediate BINARY PAYLOADS cross the JVM↔Python
# boundary twice (py → JVM → py), paying a second Arrow round-trip
# (measured fixed floor ~0.25-0.3 s per Python stage at local scale,
# plus the payload serialization itself — frames are the widest rows in
# the suite). Each fused form chains the SAME batch generators
# Python-side inside ONE mapInPandas, so the payload bytes are
# produced and consumed in the same worker and never re-enter the JVM.
# Output is bit-identical by construction — the identical generator
# code runs in the identical order on identical batches — and each
# query keeps its independent VALUES oracle.
# ---------------------------------------------------------------------------


def synth_image_dhashes(
    docs: DataFrame,
    width: int = 24,
    height: int = 16,
    formats: tuple[str, ...] = ("ppm", "png", "jpeg"),
) -> DataFrame:
    """Fused :func:`synth_ppm_payloads` → :func:`image_dhashes`: one
    Arrow pass, payloads never re-enter the JVM (guide §4)."""
    synth = _synth_ppm_batches(width, height, formats)

    def fused(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _dhash_batches(synth(it))

    return docs.select("doc_id", "text").mapInPandas(fused, DHASH_SCHEMA)


def synth_audio_spectral(docs: DataFrame, rate: int = 16000) -> DataFrame:
    """Fused :func:`synth_wav_payloads` → :func:`audio_spectral_features`:
    one Arrow pass, payloads never re-enter the JVM (guide §4)."""
    synth = _synth_wav_batches(rate)

    def fused(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _spectral_batches(synth(it))

    return docs.select("doc_id", "text").mapInPandas(fused, SPECTRAL_SCHEMA)


def synth_video_scene_cuts(
    docs: DataFrame, threshold: int = 10, width: int = VIDEO_W, height: int = VIDEO_H
) -> DataFrame:
    """Fused :func:`synth_video_payloads` → :func:`video_scene_cuts`:
    one Arrow pass — the concatenated frame streams (the widest rows in
    the suite) never re-enter the JVM (guide §4)."""
    synth = _synth_video_batches(width, height)
    cuts = _scene_cut_batches(threshold)

    def fused(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from cuts(synth(it))

    return docs.select("doc_id", "text").mapInPandas(fused, SCENE_CUT_SCHEMA)


def synth_video_shot_frames(
    docs: DataFrame, threshold: int = 10, width: int = VIDEO_W, height: int = VIDEO_H
) -> DataFrame:
    """Fused :func:`synth_video_payloads` → :func:`video_shot_frames`:
    one Arrow pass — frame streams never re-enter the JVM (guide §4)."""
    synth = _synth_video_batches(width, height)
    shots = _shot_frame_batches(threshold)

    def fused(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from shots(synth(it))

    return docs.select("doc_id", "text").mapInPandas(fused, SHOT_FRAME_SCHEMA)
