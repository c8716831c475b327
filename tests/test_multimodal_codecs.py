"""REAL codec paths: pure-numpy P6 PPM and PCM WAV decode, exercised
end-to-end (files on disk → binaryFile source → mapInPandas → features)
and asserted against independent numpy/python references. The fake
paths cover compressed formats; these prove the uncompressed decode is
actual decoding, not plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gomapreduce_spark.operators import multimodal as mm


def _gradient_px(w: int, h: int) -> np.ndarray:
    """Deterministic RGB test image: R = x, G = y, B = (x+y) mod 256."""
    x = np.arange(w, dtype=np.uint16)
    y = np.arange(h, dtype=np.uint16)
    r = np.broadcast_to(x % 256, (h, w))
    g = np.broadcast_to((y % 256)[:, None], (h, w))
    b = (r + g) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _wav_bytes(rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_ppm_roundtrip_and_comment_header():
    px = _gradient_px(5, 3)
    w, h, got = mm.decode_ppm(mm.encode_ppm(px))
    assert (w, h) == (5, 3) and np.array_equal(got, px)
    # header comments are legal PPM and must be skipped
    commented = b"P6\n# a comment line\n5 3\n255\n" + px.tobytes()
    w2, h2, got2 = mm.decode_ppm(commented)
    assert (w2, h2) == (5, 3) and np.array_equal(got2, px)
    with pytest.raises(ValueError):
        mm.decode_ppm(b"JFIF not a ppm")
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P6\n5 3\n255\nshort")  # truncated raster


def test_resize_rgb_is_nearest_neighbor():
    px = _gradient_px(16, 12)
    out = mm.resize_rgb(px, 4, 3)
    assert out.shape == (3, 4, 3)
    # nearest-neighbor: output pixel (yo, xo) == input (yo*h//oh, xo*w//ow)
    for yo in range(3):
        for xo in range(4):
            assert np.array_equal(out[yo, xo], px[yo * 12 // 3, xo * 16 // 4])


def test_ppm_pipeline_end_to_end(spark, tmp_path):
    """Files on disk → read_binary_dir → ppm_image_stats/resize — exact
    per-channel means vs numpy, non-image files dropped."""
    d = tmp_path / "imgs"
    d.mkdir()
    imgs = {"a.ppm": _gradient_px(6, 4), "b.ppm": _gradient_px(3, 5)}
    for name, px in imgs.items():
        (d / name).write_bytes(mm.encode_ppm(px))
    (d / "junk.bin").write_bytes(b"not an image at all")

    rows = mm.read_binary_dir(spark, str(d)).collect()
    assert len(rows) == 3
    stats = mm.ppm_image_stats(mm.read_binary_dir(spark, str(d))).collect()
    by_dims = {(r["width"], r["height"]): r for r in stats}
    assert len(stats) == 2  # junk.bin dropped
    for px in imgs.values():
        h, w = px.shape[:2]
        r = by_dims[(w, h)]
        want = px.reshape(-1, 3).mean(axis=0)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == tuple(want)

    thumbs = mm.resize_ppm_images(mm.read_binary_dir(spark, str(d)), 3, 2).collect()
    assert len(thumbs) == 2
    for t in thumbs:
        w, h, px_t = mm.decode_ppm(bytes(t["thumb"]))
        assert (w, h) == (3, 2) and px_t.shape == (2, 3, 3)


def test_wav_decode_matches_struct_reference():
    rate = 8000
    t = np.arange(800)
    sine = (np.sin(2 * np.pi * 440 * t / rate) * 12000).astype("<i2")
    got_rate, got = mm.decode_wav(_wav_bytes(rate, sine))
    assert got_rate == rate and np.array_equal(got, sine)
    # stereo reshapes to (n, 2)
    stereo = np.stack([sine, -sine], axis=-1).reshape(-1)
    _, got2 = mm.decode_wav(_wav_bytes(rate, stereo, channels=2))
    assert got2.shape == (800, 2) and np.array_equal(got2[:, 0], sine)
    with pytest.raises(ValueError):
        mm.decode_wav(b"OggS not a wav")


def test_wav_features_end_to_end(spark, tmp_path):
    d = tmp_path / "audio"
    d.mkdir()
    rate = 8000
    t = np.arange(1600)
    sine = (np.sin(2 * np.pi * 100 * t / rate) * 10000).astype("<i2")
    (d / "tone.wav").write_bytes(_wav_bytes(rate, sine))
    (d / "noise.txt").write_bytes(b"definitely not audio")

    out = mm.wav_audio_features(mm.read_binary_dir(spark, str(d))).collect()
    assert len(out) == 1
    r = out[0]
    mono = sine.astype("float64")
    assert r["sample_rate"] == rate and r["n_samples"] == 1600 and r["n_channels"] == 1
    assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(mono**2))), rel=1e-12)
    want_zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    assert r["zero_cross_rate"] == pytest.approx(want_zcr, rel=1e-12)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_bytes(px: np.ndarray, filter_types: list[int]) -> bytes:
    """Independent PNG writer: filters each scanline per the PNG spec
    (computed on ORIGINAL bytes, exactly as RFC 2083 defines them) so
    the decoder's un-filtering is checked against the spec, not against
    our own encoder."""
    import zlib

    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    raw_rows = px.reshape(h, w * ch).astype(int)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=int)
    for y, ft in zip(range(h), filter_types):
        line = raw_rows[y]
        left = np.concatenate([np.zeros(ch, int), line[:-ch]])
        upleft = np.concatenate([np.zeros(ch, int), prev[:-ch]])
        if ft == 0:
            f = line
        elif ft == 1:
            f = line - left
        elif ft == 2:
            f = line - prev
        elif ft == 3:
            f = line - (left + prev) // 2
        elif ft == 4:
            f = np.empty_like(line)
            for x in range(len(line)):
                a, b, c = left[x], prev[x], upleft[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                f[x] = line[x] - pred
        out += bytes([ft]) + (f % 256).astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        mm.PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_rgb_rgba_grey():
    px = _gradient_px(6, 4)
    w, h, got = mm.decode_png(mm.encode_png(px))
    assert (w, h) == (6, 4) and np.array_equal(got, px)
    rgba = np.dstack([px, ((px[:, :, 0] + 7) % 256).astype(np.uint8)])
    _, _, got4 = mm.decode_png(mm.encode_png(rgba))
    assert got4.shape == (4, 6, 4) and np.array_equal(got4, rgba)
    grey = px[:, :, 0]
    _, _, got1 = mm.decode_png(mm.encode_png(grey))
    assert got1.shape == (4, 6, 1) and np.array_equal(got1[:, :, 0], grey)


def test_png_unfilters_all_five_filter_types():
    px = _gradient_px(7, 5)
    # one scanline per filter type (0..4) — each must invert exactly
    _, _, got = mm.decode_png(_png_bytes(px, [0, 1, 2, 3, 4]))
    assert np.array_equal(got, px)
    # and with the row order shuffled so every type also follows Paeth
    _, _, got2 = mm.decode_png(_png_bytes(px, [4, 3, 2, 1, 0]))
    assert np.array_equal(got2, px)
    rgba = np.dstack([px, ((px[:, :, 1] * 3) % 256).astype(np.uint8)])
    _, _, got3 = mm.decode_png(_png_bytes(rgba, [4, 4, 4, 4, 4]))
    assert np.array_equal(got3, rgba)


def test_png_rejects_malformed_and_unsupported():
    px = _gradient_px(4, 3)
    good = mm.encode_png(px)
    with pytest.raises(ValueError):
        mm.decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage")
    with pytest.raises(ValueError):
        mm.decode_png(good[:30])  # truncated chunk
    # 16-bit depth is valid PNG but honestly unsupported (needs PIL)
    bad_depth = bytearray(good)
    assert bad_depth[24] == 8  # IHDR bit-depth byte
    bad_depth[24] = 16
    type_and_data = bytes(bad_depth[12:29])  # chunk type + 13 IHDR bytes
    import zlib

    rebuilt = (
        mm.PNG_SIG
        + struct.pack(">I", 13)
        + type_and_data
        + struct.pack(">I", zlib.crc32(type_and_data) & 0xFFFFFFFF)
        + good[33:]
    )
    with pytest.raises(NotImplementedError):
        mm.decode_png(rebuilt)


def test_png_pipeline_end_to_end(spark, tmp_path):
    """PNG files flow through the same stats/resize pipelines as PPM."""
    d = tmp_path / "pngs"
    d.mkdir()
    imgs = {"a.png": _gradient_px(6, 4), "b.png": _gradient_px(3, 5)}
    for name, px in imgs.items():
        (d / name).write_bytes(mm.encode_png(px))
    (d / "c.ppm").write_bytes(mm.encode_ppm(_gradient_px(2, 2)))
    (d / "junk.bin").write_bytes(b"not an image")

    stats = mm.ppm_image_stats(mm.read_binary_dir(spark, str(d))).collect()
    assert len(stats) == 3  # 2 PNG + 1 PPM, junk dropped
    by_dims = {(r["width"], r["height"]): r for r in stats}
    for px in imgs.values():
        h, w = px.shape[:2]
        want = px.reshape(-1, 3).mean(axis=0)
        r = by_dims[(w, h)]
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == tuple(want)

    thumbs = mm.resize_ppm_images(mm.read_binary_dir(spark, str(d)), 3, 2).collect()
    assert len(thumbs) == 3
    for t in thumbs:
        w, h, _ = mm.decode_ppm(bytes(t["thumb"]))
        assert (w, h) == (3, 2)


def test_decode_image_handles_png():
    px = _gradient_px(11, 6)
    assert mm.decode_image(mm.encode_png(px)) == (11, 6)


def test_decode_image_prefers_real_ppm():
    px = _gradient_px(7, 9)
    assert mm.decode_image(mm.encode_ppm(px)) == (7, 9)
    # a "P6"-prefixed payload that is NOT a ppm falls back to fake dims
    fake = mm.decode_image(b"P6 but nothing else", fake=True)
    assert fake == ((19 % 640) + 1, (19 % 480) + 1)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG compressed")


# ---------------------------------------------------------------------------
# Perceptual dHash + spectral features (round 5)
# ---------------------------------------------------------------------------

def test_dhash_known_gradients():
    # strictly increasing rows → every horizontal gradient bit set → all-ones
    # int64 (-1); strictly decreasing → no bit set → 0
    inc = np.tile(np.arange(0, 252, 14, dtype=np.uint8), (8, 1))  # 18 wide
    px_inc = np.stack([inc] * 3, axis=-1)
    assert mm.image_dhash(px_inc) == -1
    assert mm.image_dhash(px_inc[:, ::-1]) == 0


def test_dhash_stable_under_reencode_and_resize():
    px = _gradient_px(64, 48)
    h_ppm = mm.image_dhash(mm.decode_rgb(mm.encode_ppm(px))[2])
    h_png = mm.image_dhash(mm.decode_rgb(mm.encode_png(px))[2])
    assert h_ppm == h_png  # lossless codecs → identical pixels → identical hash
    # 2x upscale resamples to the same 9x8 grid → identical hash
    up = px.repeat(2, axis=0).repeat(2, axis=1)
    assert mm.image_dhash(up) == h_ppm


def test_dhash_pairs_finds_planted_near_dup(spark):
    px = _gradient_px(36, 24)
    near = px.copy()
    near[0, 0] = [255, 255, 255]  # single-pixel corruption → tiny Hamming move
    far = _gradient_px(36, 24)[:, ::-1].copy()  # mirrored → different gradients
    rows = [
        (1, bytearray(mm.encode_ppm(px))),
        (2, bytearray(mm.encode_png(near))),
        (3, bytearray(mm.encode_ppm(far))),
        (4, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in mm.image_dhash_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all({a, b} == {1, 2} for a, b in pairs)  # mirror image is not a near-dup


def test_spectral_features_sine_vs_dc():
    rate, n, f0 = 16000, 16000, 1000
    t = np.arange(n) / rate
    sine = (10000 * np.sin(2 * np.pi * f0 * t)).astype("<i2")
    rate_d, samples = mm.decode_wav(_wav_bytes(rate, sine))
    assert rate_d == rate
    power = np.abs(np.fft.rfft(samples.astype("float64"))) ** 2
    freqs = np.fft.rfftfreq(n, 1 / rate)
    # independent reference: centroid of a pure tone is its frequency
    assert abs(float((freqs * power).sum() / power.sum()) - f0) < 2.0


def test_spectral_pipeline_end_to_end(spark):
    rate, n, f0 = 16000, 4096, 1000
    t = np.arange(n) / rate
    sine = (10000 * np.sin(2 * np.pi * f0 * t)).astype("<i2")
    dc = np.full(n, 5000, dtype="<i2")
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(rate, sine))), (2, bytearray(_wav_bytes(rate, dc))),
         (3, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in mm.audio_spectral_features(df).collect()}
    assert set(got) == {1, 2}  # junk row dropped
    assert abs(got[1]["centroid_hz"] - f0) < 8.0
    assert abs(got[1]["rolloff_hz"] - f0) < 8.0
    assert got[1]["flatness"] < 0.01  # pure tone is maximally peaky
    assert got[2]["centroid_hz"] < 8.0  # DC energy sits in the 0 bin


def test_synth_payloads_decode_for_real(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zzz qqq")],
        "doc_id long, text string",
    )
    imgs = mm.image_dhashes(mm.synth_ppm_payloads(docs, formats=("ppm",))).collect()
    assert {r["doc_id"] for r in imgs} == {1, 2, 3}
    assert all(r["width"] == 24 and r["height"] == 16 for r in imgs)
    by_id = {r["doc_id"]: r["dhash"] for r in imgs}
    assert by_id[1] == by_id[2]  # identical text → identical image → same hash
    # default mixed-format corpus: PPM + PNG + baseline JPEG payloads
    # all decode through the real codec paths (every row survives)
    mixed = mm.synth_ppm_payloads(docs).collect()
    sigs = {bytes(r["payload"])[:2] for r in mixed}
    assert sigs == {b"P6", b"\x89P", b"\xff\xd8"}
    assert mm.image_dhashes(mm.synth_ppm_payloads(docs)).count() == 3
    wavs = {r["doc_id"]: r for r in mm.audio_spectral_features(mm.synth_wav_payloads(docs)).collect()}
    assert wavs[1]["n_samples"] == 11  # 22 utf-8 bytes → 11 int16 samples


# ---------------------------------------------------------------------------
# Baseline JPEG codec (round 5) — real encode/decode, no libjpeg
# ---------------------------------------------------------------------------

def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def test_jpeg_flat_grey_reconstructs_within_quant_step():
    from gomapreduce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((16, 16), 128, dtype=np.uint8)
    w, h, rgb = decode_jpeg(encode_jpeg(flat))
    assert (w, h) == (16, 16)
    assert np.array_equal(rgb[..., 0], flat)  # 128 is exactly representable
    # 77 is not a multiple of the DC quant step → off-by-one at most
    w, h, rgb = decode_jpeg(encode_jpeg(np.full((8, 8), 77, dtype=np.uint8)))
    assert np.abs(rgb.astype(int) - 77).max() <= 1


def test_jpeg_roundtrip_all_layouts():
    from gomapreduce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    px = _gradient_px(64, 48)
    for kwargs in ({}, {"subsample": True}, {"restart_interval": 2},
                   {"subsample": True, "restart_interval": 1}):
        w, h, rgb = decode_jpeg(encode_jpeg(px, **kwargs))
        assert (w, h) == (64, 48)
        assert _psnr(rgb, px) > 35.0, kwargs


def test_jpeg_odd_dimensions_and_greyscale():
    from gomapreduce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    odd = _gradient_px(61, 45)
    w, h, rgb = decode_jpeg(encode_jpeg(odd, subsample=True))
    assert (w, h) == (61, 45)
    assert _psnr(rgb, odd) > 35.0
    grey = (np.arange(31 * 23, dtype=np.uint32).reshape(23, 31) * 7 % 256).astype(np.uint8)
    w, h, rgb = decode_jpeg(encode_jpeg(grey))
    assert (w, h) == (31, 23)
    assert np.array_equal(rgb[..., 0], rgb[..., 1])  # grey replicated


def test_jpeg_rejects_non_baseline_honestly():
    import pytest as _pytest

    from gomapreduce_spark.operators.jpeg import decode_jpeg, encode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must raise, not garble
    blob = bytearray(encode_jpeg(np.full((8, 8), 1, dtype=np.uint8)))
    idx = bytes(blob).find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_jpeg_through_decode_rgb_and_dhash():
    from gomapreduce_spark.operators.jpeg import encode_jpeg

    # gradient steep enough (~25 luma/sampled step) that JPEG's ±3
    # quantization error cannot flip a dHash comparison
    x = np.arange(36, dtype=np.uint16)
    ramp = np.broadcast_to((x * 7 % 256).astype(np.uint8), (24, 36))
    px = np.stack([ramp] * 3, axis=-1)
    w, h, out = mm.decode_rgb(encode_jpeg(px))
    assert (w, h) == (36, 24)
    # perceptual identity across codecs: JPEG loss must not move dHash
    # far from the lossless PNG hash of the same image
    d_png = mm.image_dhash(mm.decode_rgb(mm.encode_png(px))[2])
    d_jpg = mm.image_dhash(out)
    assert bin(d_png ^ d_jpg).count("1") <= 3
    assert mm.decode_image(encode_jpeg(px)) == (36, 24)
