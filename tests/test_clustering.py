"""Integer-exact k-means: hand-computed tiny fixture, fixture-scale
invariants, and bitwise determinism across independent runs."""

from __future__ import annotations

import math

from gomapreduce_spark.operators.clustering import KM_SCALE, kmeans_embeddings


def test_kmeans_tiny_hand_computed(spark):
    """k=2, rounds=2 over four 2-d points — every assignment, the
    integer half-up centroid updates, and the final per-cluster stats
    are derived by hand in the comments.

    Seeds: c0=(0,0), c1=(100000,0) (two lowest vec_ids, quantized).
    Round 1 assigns {v0}->c0, {v1,v2,v3}->c1; update gives
    c0=(0,0), c1=((2*2000000+3)//6, same)=(666667,666667).
    Round 2 re-captures v1 into c0; update gives c0=(50000,0),
    c1=(950000,1000000). Final assignment: {v0,v1} / {v2,v3}, each
    point 50000 units from its centroid -> inertia 2*(0.05^2)=0.005
    per cluster."""
    rows = [
        (0, 5, [0.0, 0.0]),
        (1, 5, [0.1, 0.0]),
        (2, 3, [1.0, 1.0]),
        (3, 3, [0.9, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>")
    got = {r.cluster_id: r for r in kmeans_embeddings(emb, k=2, rounds=2).collect()}
    assert set(got) == {0, 1}
    assert (got[0].n_points, got[0].majority_label, got[0].purity) == (2, 5, 1.0)
    assert (got[1].n_points, got[1].majority_label, got[1].purity) == (2, 3, 1.0)
    assert got[0].inertia == 0.005 and got[1].inertia == 0.005
    assert got[0].c_norm == 0.05
    want = round(math.sqrt(950000**2 + 1000000**2) / KM_SCALE, 6)
    assert abs(got[1].c_norm - want) < 1e-9


def test_kmeans_fixture_invariants_and_determinism(spark, sf_small):
    from gomapreduce_spark.sources.registry import load_table

    emb = load_table(spark, sf_small, "embeddings")
    total = emb.count()
    a = kmeans_embeddings(emb).collect()
    assert sum(r.n_points for r in a) == total
    assert all(0.0 < r.purity <= 1.0 for r in a)
    assert all(r.inertia >= 0.0 for r in a)
    assert len(a) <= 8
    b = kmeans_embeddings(emb).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmeans_empty_input(spark):
    emb = spark.createDataFrame([], "vec_id long, label long, embedding array<float>")
    assert kmeans_embeddings(emb).count() == 0
