"""Production-k probe for the clustering family (round-7 verdict item 2).

The registered queries fit k=8 fixture clusters; SemDeDup-style corpus
pipelines run k in the tens of thousands. This probe runs
kmeans_embeddings and semdedup_prune at k = 8 / 64 / 256 on one SF and
reports, per k:

- wall seconds,
- the k-proportional quantities: centroid-update shuffle rows per Lloyd
  round (k x d after map-side combine) and driver state (k x d int64s),
- corpus-independence: those quantities are functions of (k, d) only.

Pass/fail intuition: wall should grow FAR slower than k (the per-round
Arrow assignment pass is O(n·k·d) BLAS work but one scan; shuffle and
driver state are k-sized, corpus-independent). A super-linear wall jump
flags a k-scaling defect.

Run: python tools/kprobe.py [sf_dir]   (~2 min at sf0.1; prints a table
+ one JSON line; SCALE.md records the measured rows)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KS = (8, 64, 256)


def main() -> None:
    from gomapreduce_spark.operators.clustering import (
        KM_ROUNDS,
        kmeans_embeddings,
        semdedup_prune,
    )
    from gomapreduce_spark.session import get_spark
    from gomapreduce_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("kprobe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n, d = emb.count(), len(emb.head()["embedding"])
    print(f"{sf_dir}: n={n} d={d} rounds={KM_ROUNDS}")

    out: dict[str, dict] = {}
    header = f"{'op':18s} {'k':>4s} {'wall_s':>8s} {'shuffle_rows/round':>18s} {'driver_ints':>12s} {'clusters_out':>12s}"
    print(header)
    for name, fn in (("kmeans_embeddings", kmeans_embeddings), ("semdedup_prune", semdedup_prune)):
        for k in KS:
            t0 = time.monotonic()
            res = fn(emb, k=k)
            n_out = res.count()
            wall = time.monotonic() - t0
            # the k-proportional plan quantities (exact by construction:
            # the update agg groups on (cluster, pos) -> <= k*d rows;
            # driver centroid state is exactly k*d ints)
            srows, dints = k * d, k * d
            print(f"{name:18s} {k:4d} {wall:8.2f} {srows:18d} {dints:12d} {n_out:12d}")
            out.setdefault(name, {})[str(k)] = {
                "wall_s": round(wall, 2),
                "shuffle_rows_per_round": srows,
                "driver_ints": dints,
                "n_out": n_out,
            }
    for name, per_k in out.items():
        w8, w256 = per_k["8"]["wall_s"], per_k["256"]["wall_s"]
        ratio = w256 / max(w8, 1e-9)
        print(f"{name}: wall x{ratio:.1f} for k x32 (sub-linear iff < 32)")
        per_k["wall_ratio_k32"] = round(ratio, 2)
    print(json.dumps({"metric": "kprobe", "sf_dir": sf_dir, "n": n, "d": d, "results": out}))


if __name__ == "__main__":
    raise SystemExit(main())
