"""Distributed k-means over the embeddings table, integer-exact.

The gomapreduce reference has no clustering operator (its analytics
surface stops at the MapReduce demo pair, pkg_test.go:43-79); this
module belongs to the driver-mandated LLM-data-pipeline surface:
cluster-balanced sampling and cluster-level curation are the standard
preprocessing steps in front of SemDeDup-style pruning (Abbas et al.
2023, arXiv:2303.09540) and DoReMi-style mixture reweighting. Algorithm
is plain Lloyd (1957/1982) with a deterministic init (the k lowest
``vec_id`` vectors) and a fixed round count — the same determinism
contract as the IVF/PQ trainers in operators/similarity.py.

Cross-engine determinism doctrine (why this is hash-oracle-able):
every number that can influence a branch is an exact int64, never an
accumulated float —

- vectors are quantized ONCE to integers: ``q_d = floor(x_d * 1e6 +
  0.5)`` (one IEEE multiply + add on the exact float32→double widening;
  identical in Spark, DuckDB and numpy);
- distances are exact int64 sums of squared integer differences
  (|q| ≤ ~6e5 on unit-ish embeddings → d² ≤ 64·(1.2e6)² ≈ 9e13,
  far inside int64);
- centroid updates are exact integer sums (map-side-combined
  ``sum(long)``; overflows only past ~1.5e13 members/cluster) divided
  half-up in exact integer arithmetic on the driver:
  ``(2s + n) // (2n)`` — floor division, i.e. half-toward-+inf for
  all signs, the same convention as the ``floor(y + 0.5)`` quantizer;
- the final inertia is summed as DECIMAL (exact, order-independent,
  overflow-proof at any corpus size) and only converted to a rounded
  double in the last projection.

So the whole iteration is a deterministic function of the input and
the oracle can be precomputed by an independent numpy/python
restatement (tools/gen_kmeans_oracle.py → kmeans_expected.py), the
gen_ann_oracle mechanism.

100 TB shape: each round is (a) one narrow Arrow assignment pass —
per batch an (n × k·d) int64 matmul-free broadcast-subtract against a
k×d centroid closure (k·d = 512 ints, fixed-size, NOT corpus-scaling,
so shipping it in the closure is legal under the no-scaling-broadcast
doctrine) — and (b) one per-dim sum shuffle whose map-side combine
reduces it to ``partitions × k × d`` rows. Driver state is k×d
integers. This is exactly MLlib KMeans' aggregate shape. The quantized
input is localCheckpoint'ed because rounds+1 passes consume it; at
petabyte scale swap that for persist(DISK_ONLY) or re-scanning the
columnar source, whichever the cluster's disk budget prefers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

KM_K = 8          # clusters
KM_ROUNDS = 4     # fixed Lloyd rounds (determinism > convergence test)
KM_SCALE = 1_000_000  # quantization grid: 1e-6 embedding units


def _quantized(emb: DataFrame) -> DataFrame:
    """vec_id, label, qvec array<long>: the one float→int boundary."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * KM_SCALE + F.lit(0.5)).cast("long"),
    )
    return emb.select("vec_id", "label", q.alias("qvec"))


def _assign(q: DataFrame, cmat) -> DataFrame:
    """One assignment pass: nearest centroid by exact integer L2²,
    ties to the lowest cluster id (numpy argmin is first-match)."""
    import numpy as np
    import pandas as pd

    c = np.asarray(cmat, dtype=np.int64)  # k × d

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]], dtype=np.int64)
            diff = mat[:, None, :] - c[None, :, :]          # n × k × d int64
            d2 = np.einsum("nkd,nkd->nk", diff, diff)        # exact: |diff|²·d ≪ 2^63
            cl = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "qvec": pdf["qvec"],
                    "cluster": cl.astype("int64"),
                    "d2": d2[np.arange(len(cl)), cl],
                }
            )

    return q.mapInPandas(
        assign, "vec_id long, label long, qvec array<long>, cluster long, d2 long"
    )


def _update_centroids(assigned: DataFrame, prev: list[list[int]]) -> list[list[int]]:
    """Exact integer centroid update. The shuffle carries only
    (cluster, pos) partial sums after map-side combine; the collect is
    k × d rows — fixed-size driver state, not a data-sized collect."""
    rows = (
        assigned.select("cluster", F.posexplode("qvec").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cents = [list(c) for c in prev]  # empty clusters keep their centroid
    dims: dict[int, list] = {}
    for r in rows:
        dims.setdefault(int(r["cluster"]), []).append(r)
    for cl, rs in dims.items():
        vec = cents[cl]
        for r in rs:
            s, n = int(r["s"]), int(r["n"])
            vec[int(r["pos"])] = (2 * s + n) // (2 * n)  # half-toward-+inf
    return cents


def kmeans_embeddings(
    emb: DataFrame, k: int = KM_K, rounds: int = KM_ROUNDS
) -> DataFrame:
    """Per-cluster summary of a k-means fit over ``embeddings``:
    cluster_id, n_points, majority_label (ties to the lowest label),
    purity, inertia (sum of squared L2 distances, embedding units),
    c_norm (centroid L2 norm). Deterministic end-to-end; oracle is the
    precomputed VALUES table from tools/gen_kmeans_oracle.py."""
    import math

    q = _quantized(emb).localCheckpoint()
    # TakeOrdered delivers sorted rows today, but the seed→cluster_id
    # mapping must not depend on collect order — re-sort driver-side
    seeds = sorted(
        q.orderBy("vec_id").limit(k).select("vec_id", "qvec").collect(),
        key=lambda r: r["vec_id"],
    )
    if not seeds:
        return emb.sparkSession.createDataFrame(
            [],
            "cluster_id long, n_points long, majority_label long, "
            "purity double, inertia double, c_norm double",
        )
    cents = [[int(v) for v in r["qvec"]] for r in seeds]
    while len(cents) < k:  # degenerate tiny input: duplicate last seed
        cents.append(list(cents[-1]))
    for _ in range(rounds):
        cents = _update_centroids(_assign(q, cents), cents)

    final = _assign(q, cents).localCheckpoint()  # consumed by 2 branches
    stats = final.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        # DECIMAL sum: exact + order-independent + overflow-proof
        F.sum(F.col("d2").cast("decimal(30,0)")).alias("ssd"),
    )
    lab = final.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("c"))
    wl = W.partitionBy("cluster").orderBy(F.col("c").desc(), F.col("label").asc())
    lab = lab.withColumn("rk", F.row_number().over(wl)).where(F.col("rk") == 1)

    norms = emb.sparkSession.createDataFrame(
        [(i, float(math.sqrt(sum(v * v for v in c))) / KM_SCALE) for i, c in enumerate(cents)],
        "cluster long, c_norm_raw double",
    )
    # k-row joins: genuinely fixed-size sides (k = 8 regardless of SF)
    return (
        stats.join(lab.select("cluster", "label", "c"), "cluster")
        .join(norms, "cluster")
        .select(
            F.col("cluster").cast("long").alias("cluster_id"),
            F.col("n_points").cast("long").alias("n_points"),
            F.col("label").cast("long").alias("majority_label"),
            F.round(F.col("c") / F.col("n_points"), 6).alias("purity"),
            F.round(F.col("ssd").cast("double") / (KM_SCALE * float(KM_SCALE)), 6).alias(
                "inertia"
            ),
            F.round(F.col("c_norm_raw"), 6).alias("c_norm"),
        )
        .orderBy("cluster_id")
    )
