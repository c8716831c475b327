"""Video scene-cut detection (multimodal.py video leg): the
concatenated-P6 frame-stream parser, planted-cut recovery, the strict
threshold boundary, and the corrupt-sample filter.

The reference engine has no binary/video surface (its one scan path is
text chunks, inputer.go:33-43); the contract pinned here is the repo's
mandated multimodal extension: frames decode through the REAL PPM
codec path and cuts come from real per-frame dHashes — the registered
query's values are additionally hash-verified tri-SF against
tools/gen_video_oracle.py's independent restatement.
"""

from __future__ import annotations

import numpy as np
import pytest

from gomapreduce_spark.operators.multimodal import (
    encode_ppm,
    image_dhash,
    iter_ppm_frames,
    synth_video_payloads,
    video_scene_cuts,
    video_scene_plan,
)


def _frame(seed: int, w: int = 16, h: int = 12) -> np.ndarray:
    rows = (np.arange(h * w * 3, dtype=np.int64) * (2 * seed + 1)) % 256
    return rows.astype(np.uint8).reshape(h, w, 3)


def test_iter_ppm_frames_roundtrip_exact():
    frames = [_frame(s) for s in range(3)]
    payload = b"".join(encode_ppm(f) for f in frames)
    got = list(iter_ppm_frames(payload))
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert (a == b).all()


def test_iter_ppm_frames_rejects_trailing_garbage_and_truncation():
    payload = encode_ppm(_frame(0))
    with pytest.raises(ValueError):
        list(iter_ppm_frames(payload + b"garbage"))
    with pytest.raises(ValueError):
        list(iter_ppm_frames(payload[:-5]))
    with pytest.raises(ValueError):  # empty = malformed, not a 0-frame video
        list(iter_ppm_frames(b""))


def test_synth_drops_empty_text_instead_of_crashing(spark):
    docs = spark.createDataFrame(
        [(1, "some genuine document text here"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = video_scene_cuts(synth_video_payloads(docs)).collect()
    assert [r.doc_id for r in rows] == [1]


def test_planted_cut_recovered_and_threshold_is_strict(spark):
    """Two scenes of identical frames: the only cut is the scene
    boundary; a video whose frames are all identical has none. The
    cut predicate is STRICT (> threshold): setting threshold to the
    exact boundary distance must suppress the cut."""
    a, b = _frame(1), _frame(9)
    dist = bin((image_dhash(a) ^ image_dhash(b)) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert dist > 10  # the fixture must actually exceed the default
    two_scene = b"".join([encode_ppm(a)] * 2 + [encode_ppm(b)] * 3)
    flat = b"".join([encode_ppm(a)] * 4)
    mm = spark.createDataFrame(
        [(1, bytearray(two_scene)), (2, bytearray(flat))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in video_scene_cuts(mm).collect()}
    assert rows[1].n_frames == 5 and rows[1].n_cuts == 1
    assert rows[1].cut_frames == "2" and rows[1].max_step == dist
    assert rows[2].n_frames == 4 and rows[2].n_cuts == 0
    assert rows[2].cut_frames == "" and rows[2].max_step == 0
    at_threshold = {
        r.doc_id: r for r in video_scene_cuts(mm, threshold=dist).collect()
    }
    assert at_threshold[1].n_cuts == 0  # strict >: == is not a cut


def test_corrupt_videos_are_dropped_not_fatal(spark):
    good = b"".join([encode_ppm(_frame(0))] * 2)
    mm = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a video")), (3, bytearray(b""))],
        "doc_id long, payload binary",
    )
    rows = video_scene_cuts(mm).collect()
    assert [r.doc_id for r in rows] == [1]


def test_synth_structure_matches_scene_plan(spark):
    """The synthesized corpus's recovered cuts are exactly the scene
    plan's boundaries: n_frames = scenes x per_scene and the cut list
    is every per_scene-th index (scene content rotations differ by
    >threshold on the fixture texts — asserted, not assumed)."""
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    out = {r.doc_id: r for r in video_scene_cuts(synth_video_payloads(docs)).collect()}
    assert len(out) == 40
    for doc_id, r in out.items():
        n_scenes, per_scene = video_scene_plan(doc_id)
        assert r.n_frames == n_scenes * per_scene
        expected_cuts = [s * per_scene for s in range(1, n_scenes)]
        assert r.cut_frames == ",".join(map(str, expected_cuts)), doc_id


def test_shot_frames_planted_structure(spark):
    """Per-shot keyframe sampling (video_shot_frames): a two-scene
    video yields two shots whose representative frames carry each
    scene's dHash; a flat video yields ONE whole-video shot. The rep
    index is the canonical middle (start + (len-1)//2), and when the
    threshold suppresses the cut, the merged shot's rep hash comes
    from whichever scene holds the middle index."""
    from gomapreduce_spark.operators.multimodal import video_shot_frames

    a, b = _frame(1), _frame(9)
    ha, hb = image_dhash(a), image_dhash(b)
    dist = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert dist > 10
    two_scene = b"".join([encode_ppm(a)] * 2 + [encode_ppm(b)] * 3)
    flat = b"".join([encode_ppm(a)] * 4)
    mm = spark.createDataFrame(
        [(1, bytearray(two_scene)), (2, bytearray(flat))],
        "doc_id long, payload binary",
    )
    rows = sorted(video_shot_frames(mm).collect(), key=lambda r: (r.doc_id, r.shot_id))
    by_doc = {1: [r for r in rows if r.doc_id == 1], 2: [r for r in rows if r.doc_id == 2]}
    s0, s1 = by_doc[1]
    assert (s0.start_frame, s0.n_frames, s0.rep_frame, s0.rep_dhash) == (0, 2, 0, ha)
    assert (s1.start_frame, s1.n_frames, s1.rep_frame, s1.rep_dhash) == (2, 3, 3, hb)
    [whole] = by_doc[2]
    assert (whole.start_frame, whole.n_frames, whole.rep_frame, whole.rep_dhash) == (0, 4, 1, ha)
    # threshold == boundary distance merges the shots: middle of the
    # 5-frame video is frame 2, which belongs to scene B
    [merged] = [r for r in video_shot_frames(mm, threshold=dist).collect() if r.doc_id == 1]
    assert (merged.n_frames, merged.rep_frame, merged.rep_dhash) == (5, 2, hb)


def test_shot_frames_consistent_with_scene_cuts(spark):
    """On the synthesized corpus, shots partition each video's frame
    range exactly: per doc, shot n_frames sum to the video's n_frames,
    starts chain contiguously, and #shots == n_cuts + 1."""
    from gomapreduce_spark.operators.multimodal import video_shot_frames
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(30)
    mm = synth_video_payloads(docs).localCheckpoint()
    cuts = {r.doc_id: r for r in video_scene_cuts(mm).collect()}
    shots: dict[int, list] = {}
    for r in video_shot_frames(mm).collect():
        shots.setdefault(r.doc_id, []).append(r)
    assert set(shots) == set(cuts)
    for doc_id, ss in shots.items():
        ss.sort(key=lambda r: r.shot_id)
        assert len(ss) == cuts[doc_id].n_cuts + 1
        assert sum(r.n_frames for r in ss) == cuts[doc_id].n_frames
        pos = 0
        for r in ss:
            assert r.start_frame == pos
            assert r.start_frame <= r.rep_frame < r.start_frame + r.n_frames
            pos += r.n_frames
