"""Candidate-growth law probe for the embedding cosine dedup family
(round-12 verdict item 6): embedding_dedup_clusters is the one
operator at ×3.5–3.8 per decade in all three 10×-probe runs. This
tool turns the "linear in candidates" claim from design argument into
a measurement — the ppjoin_pairs discipline — and measures the
production mitigation live.

What it measures, on sf0.1 embeddings (2k vectors) and the 10×-probe
self-union (20k vectors, scale_probe_10x's deterministic rotation
recipe):

1. CANDIDATE VOLUME: Σ over LSH cells of m·(m−1)/2 member pairs +
   m·p member×visitor pairs — computed from the operator's OWN cell
   relation (dedup._embedding_cells, the exact plan it scores on), so
   the number is what the applyInPandas stage actually pays, hot-cap
   included.
2. WALL per candidate at both scales: if wall growth tracks candidate
   growth (after subtracting nothing — the fixed overhead only makes
   the big scale look BETTER), the operator is linear in candidates
   and the decade ratio is the candidate-growth law, not a
   super-linear implementation term.
3. THE MITIGATION: the same corpus at n_planes = 6 + log2(10) ≈ 9
   (occupancy restored to the sf0.1 setting, 8× more cells/table).
   Reported: candidate volume, wall, output pairs, and RECALL vs the
   6-plane output on the identical corpus — the standard LSH sizing
   trade (hold occupancy constant with log2(N); buy recall with
   tables/probe radius) measured rather than asserted.

Run: python tools/probe_embedding_candidates.py [n_copies]
(~3 min; prints a table + one JSON line; scratch dir removed on
success). Uses only the embeddings table, so the scratch footprint is
tiny compared to the full 10× probe.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spark_graft_emb_cand_probe"


def candidate_volume(emb, n_planes: int, n_tables: int, max_cell: int) -> dict:
    """Σ_cells m(m−1)/2 + m·p from the operator's own cell relation."""
    from gomapreduce_spark.operators.dedup import _embedding_cells

    cells = _embedding_cells(emb, n_planes, n_tables, max_cell)
    row = (
        cells.groupBy("table", "bucket")
        .agg(
            F.sum(F.when(F.col("is_probe") == 0, 1).otherwise(0)).alias("m"),
            F.sum(F.col("is_probe")).alias("p"),
        )
        .agg(
            F.sum(F.expr("m * (m - 1) / 2")).cast("long").alias("member_pairs"),
            F.sum(F.expr("m * p")).cast("long").alias("visitor_pairs"),
            F.count("*").alias("n_cells"),
            F.max("m").alias("max_members"),
        )
        .first()
    )
    return {
        "member_pairs": row["member_pairs"],
        "visitor_pairs": row["visitor_pairs"],
        "candidates": row["member_pairs"] + row["visitor_pairs"],
        "n_cells": row["n_cells"],
        "max_members": row["max_members"],
    }


def run_operator(emb, n_planes: int, n_tables: int, max_cell: int, reps: int = 2):
    """Best-of-reps wall + output pair set size for embedding_near_dup
    at the given plane count (pairs collected once — deterministic)."""
    from gomapreduce_spark.operators.dedup import embedding_near_dup

    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup(emb, 0.4, n_planes, n_tables, max_cell)
        .select("vec_a", "vec_b")
        .collect()
    }
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        embedding_near_dup(emb, 0.4, n_planes, n_tables, max_cell).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best, pairs


def main() -> int:
    from gomapreduce_spark.operators.dedup import LSH_MAX_BUCKET, NEAR_DUP_TABLES
    from gomapreduce_spark.session import get_spark
    from gomapreduce_spark.sources.registry import load_table
    from tools.scale_probe_10x import synth_10x

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("probe_embedding_candidates")
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(SCRATCH, exist_ok=True)
    # reuse the full synth (writes all five tables once) — embeddings
    # is what we read; keep the recipe identical to the decade probe
    synth_10x(spark, SCRATCH, n_copies)

    emb_small = load_table(spark, SRC, "embeddings").localCheckpoint()
    emb_big = load_table(spark, SCRATCH, "embeddings").localCheckpoint()

    results = {}
    for label, emb, planes, tables in (
        ("sf0.1_p6", emb_small, 6, NEAR_DUP_TABLES),
        ("x10_p6", emb_big, 6, NEAR_DUP_TABLES),
        ("x10_p9", emb_big, 9, NEAR_DUP_TABLES),
        # recall bought back with TABLES at constant occupancy — the
        # second half of the standard LSH sizing trade
        ("x10_p9_t48", emb_big, 9, 2 * NEAR_DUP_TABLES),
    ):
        vol = candidate_volume(emb, planes, tables, LSH_MAX_BUCKET)
        wall, pairs = run_operator(emb, planes, tables, LSH_MAX_BUCKET)
        vol.update(wall_sec=round(wall, 3), out_pairs=len(pairs))
        results[label] = (vol, pairs)
        print(
            f"{label:10s} planes={planes} candidates={vol['candidates']:>12,} "
            f"(members {vol['member_pairs']:,} + visitors {vol['visitor_pairs']:,}) "
            f"wall={wall:6.2f}s pairs={len(pairs)}",
            flush=True,
        )

    small, big6, big9 = (results[k][0] for k in ("sf0.1_p6", "x10_p6", "x10_p9"))
    cand_ratio = big6["candidates"] / small["candidates"]
    wall_ratio = big6["wall_sec"] / small["wall_sec"]
    ns_small = small["wall_sec"] * 1e9 / small["candidates"]
    ns_big = big6["wall_sec"] * 1e9 / big6["candidates"]
    big9t48 = results["x10_p9_t48"][0]
    pairs6, pairs9 = results["x10_p6"][1], results["x10_p9"][1]
    pairs9t48 = results["x10_p9_t48"][1]
    mitigation = {
        "candidates_vs_p6": round(big9["candidates"] / big6["candidates"], 4),
        "wall_vs_p6": round(big9["wall_sec"] / big6["wall_sec"], 3),
        "recall_vs_p6": round(len(pairs6 & pairs9) / max(len(pairs6), 1), 4),
        "extra_pairs": len(pairs9 - pairs6),
        "t48_recall_vs_p6": round(len(pairs6 & pairs9t48) / max(len(pairs6), 1), 4),
        "t48_candidates_vs_p6": round(big9t48["candidates"] / big6["candidates"], 4),
        "t48_wall_vs_p6": round(big9t48["wall_sec"] / big6["wall_sec"], 3),
    }
    summary = {
        "metric": "embedding_candidate_law",
        "n_copies": n_copies,
        "sf0.1_p6": small,
        "x10_p6": big6,
        "x10_p9": big9,
        "x10_p9_t48": big9t48,
        "candidate_ratio_x10": round(cand_ratio, 2),
        "wall_ratio_x10": round(wall_ratio, 2),
        "ns_per_candidate": {"sf0.1": round(ns_small, 1), "x10": round(ns_big, 1)},
        "mitigation_p9": mitigation,
    }
    print(json.dumps(summary))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
