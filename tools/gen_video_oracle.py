"""Generate the DuckDB literal-table oracle for ``video_scene_cuts``,
making the video leg a full hash-verified query (the codec-oracle
discipline of tools/gen_codec_oracle.py).

The pipeline is a deterministic function of ``documents.text`` (the
concatenated-P6 frame stream is built FROM the text — see
multimodal.synth_video_payloads), so its expected output per scale
factor is precomputed into a VALUES table. The reference here
re-derives everything INDEPENDENTLY of the operator code: its own
tiling/rotation (numpy), gen_codec_oracle's loop-built ref_dhash (not
the operator's packbits form), and its own cut scan — only the three
published geometry constants (VIDEO_W/VIDEO_H/VIDEO_SCENE_ROT) and
the scene plan are shared, since they ARE the contract. Frames within
a scene are identical by construction, so the reference hashes one
frame per scene and expands the step sequence structurally. A
self-check compares the generated table against the live Spark
pipeline and refuses to write on any mismatch.

Run: python tools/gen_video_oracle.py   (regenerates EXPECTED_BY_SF for every committed SF)
Writes: gomapreduce_spark/video_expected.py (committed; imported by
queries.py into ORACLES).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_codec_oracle import ref_dhash  # independent loop-built dHash

THRESHOLD = 10


def ref_scene_hashes(text: str, doc_id: int) -> tuple[list[int], int]:
    """(per-scene dHash list, frames_per_scene) — independent tiling +
    rotation restatement."""
    from gomapreduce_spark.operators.multimodal import (
        VIDEO_H,
        VIDEO_SCENE_ROT,
        VIDEO_W,
        video_scene_plan,
    )

    raw = text.encode("utf-8")
    n = VIDEO_W * VIDEO_H * 3
    n_scenes, per_scene = video_scene_plan(doc_id)
    hashes = []
    for s in range(n_scenes):
        r = (s * VIDEO_SCENE_ROT) % len(raw)
        rot = raw[r:] + raw[:r]
        reps = -(-n // max(len(rot), 1))  # ceil
        buf = (rot * (reps + 1))[:n]
        px = np.frombuffer(buf, dtype=np.uint8).reshape(VIDEO_H, VIDEO_W, 3)
        hashes.append(ref_dhash(px))
    return hashes, per_scene


def ref_cuts(text: str, doc_id: int):
    scene_hashes, per_scene = ref_scene_hashes(text, doc_id)
    # expand structurally: within a scene every step is 0; the step
    # into scene s+1 is the inter-scene hash distance
    frame_hashes = [h for h in scene_hashes for _ in range(per_scene)]
    steps = [
        bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
        for a, b in zip(frame_hashes, frame_hashes[1:])
    ]
    cuts = [i + 1 for i, d in enumerate(steps) if d > THRESHOLD]
    return (
        doc_id,
        len(frame_hashes),
        len(cuts),
        ",".join(map(str, cuts)),
        max(steps, default=0),
    )


SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
PRIMARY_SF = "/root/testdata/sf0.01"


def build(sf_dir: str, spark) -> str:
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    # empty-text docs are DROPPED by synth_video_payloads (no pixels
    # to tile — the corrupt-sample philosophy); mirror that here
    rows = [ref_cuts(text, doc_id) for doc_id, text in docs if text]

    sql = (
        "SELECT v.doc_id::BIGINT AS doc_id, v.n_frames::INT AS n_frames,\n"
        "       v.n_cuts::INT AS n_cuts, v.cut_frames::VARCHAR AS cut_frames,\n"
        "       v.max_step::INT AS max_step\n"
        "FROM (VALUES\n"
        + ",\n".join(f"  ({d}, {nf}, {nc}, {cf!r}, {ms})" for d, nf, nc, cf, ms in rows)
        + "\n) AS v(doc_id, n_frames, n_cuts, cut_frames, max_step)\n"
        "WHERE v.doc_id IN (SELECT doc_id FROM documents)"
    )

    # self-check: the independent reference must agree with the live
    # Spark pipeline cell-for-cell before anything is written
    from gomapreduce_spark.queries import QUERIES

    got = {
        r.doc_id: (r.n_frames, r.n_cuts, r.cut_frames, r.max_step)
        for r in QUERIES["video_scene_cuts"](spark, sf_dir).collect()
    }
    exp = {d: (nf, nc, cf, ms) for d, nf, nc, cf, ms in rows}
    assert got == exp, "video reference disagrees with the Spark pipeline"

    print(f"built {sf_dir}: {len(rows)} video rows")
    return sql


def main() -> int:
    from tools.gen_common import reject_retired_sf_dir_arg

    reject_retired_sf_dir_arg()
    from gomapreduce_spark.session import get_spark

    spark = get_spark("gen_video_oracle", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    by_sf = {sf: build(sf, spark) for sf in SF_DIRS}

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "gomapreduce_spark",
        "video_expected.py",
    )
    with open(out_path, "w") as fh:
        fh.write(
            '"""Precomputed video-scene-cut oracle (GENERATED — do not edit).\n\n'
            "Source: tools/gen_video_oracle.py (independent tiling/dhash/cut\n"
            "reference, self-checked against the live pipeline at generation\n"
            "time). Valid for the deterministic testdata generation seeded per\n"
            "sf; regenerate if testdata or the video synth parameters change.\n"
            'Every committed SF has its table in EXPECTED_BY_SF.\n"""\n\n'
            f"GENERATED_SF_DIR = {PRIMARY_SF!r}\n\n"
            f"VIDEO_SCENE_CUTS_EXPECTED_SQL = '''\n{by_sf[PRIMARY_SF]}\n'''\n\n"
            "EXPECTED_BY_SF = {\n"
            + "".join(
                f"    {sf!r}: {{\n        'video_scene_cuts': '''\n{sql}\n''',\n    }},\n"
                for sf, sql in by_sf.items()
            )
            + "}\n"
        )
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
