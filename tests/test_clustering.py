"""Integer-exact k-means: hand-computed tiny fixture, fixture-scale
invariants, and bitwise determinism across independent runs."""

from __future__ import annotations

import math

from gomapreduce_spark.operators.clustering import (
    KM_SCALE,
    kmeans_embeddings,
    semdedup_prune,
)


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


def test_semdedup_tiny_hand_computed(spark):
    """Two far-apart groups (k=2 separates them); within group A, v0/v1
    are near-identical (cos ≈ 1 ≥ 0.4) so v1 is pruned by v0; v4 sits
    orthogonal-ish to both (cos < 0.4) and survives. Within group B,
    v2/v3 are near-identical, v3 pruned by v2."""
    rows = [
        (0, 5, [1.0, 0.0]),
        (1, 5, [0.99, 0.01]),
        (2, 3, [-1.0, -1.0]),
        (3, 3, [-0.99, -1.0]),
        (4, 5, [0.1, 0.9]),  # same half-space as A seeds but dissimilar
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>")
    got = {r.vec_id: r for r in semdedup_prune(emb, k=2, rounds=2).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[0].keep and not got[1].keep
    assert got[2].keep and not got[3].keep
    assert got[4].keep and got[4].n_close == 0
    assert got[0].n_close == 1 and got[1].n_close == 1


def test_semdedup_fixture_invariants(spark, sf_small):
    from gomapreduce_spark.sources.registry import load_table

    emb = load_table(spark, sf_small, "embeddings")
    rows = semdedup_prune(emb).collect()
    assert len(rows) == emb.count()  # manifest covers every vector
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for members in by_cluster.values():
        # the lowest vec_id of a cluster is never pruned (keep-first)
        first = min(members, key=lambda r: r.vec_id)
        assert first.keep
        # anything pruned must have at least one near neighbor
        assert all(r.n_close >= 1 for r in members if not r.keep)


def test_semdedup_hot_cluster_cap_passthrough(spark):
    """With max_cluster below the cluster size, everything passes
    through unpruned (keep=true, n_close=0) — the no-silent-caps
    backstop — even for vectors that would otherwise be pruned."""
    rows = [(i, 1, [1.0, float(i) * 1e-4]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>")
    pruned = semdedup_prune(emb, k=1, rounds=1).collect()
    assert sum(1 for r in pruned if not r.keep) > 0  # sanity: near-dups prune
    capped = semdedup_prune(emb, k=1, rounds=1, max_cluster=5).collect()
    assert len(capped) == 10
    assert all(r.keep and r.n_close == 0 for r in capped)


def test_embedding_drift_hand_computed(spark):
    """Two labels in 2-d: label 1 = {(1,0),(1,0)}, label 2 = {(0,1),(0,1)}.
    Global mean (micro, half-up of 2e6/4=5e5): (500000, 500000); label
    means (1e6,0) and (0,1e6) -> delta vectors (±5e5, ∓5e5), l2 =
    sqrt(2)*0.5 for both, top_dim = 0 (tie -> lowest dim)."""
    import math

    from gomapreduce_spark.operators.similarity import embedding_drift

    rows = [
        (0, 1, [1.0, 0.0]),
        (1, 1, [1.0, 0.0]),
        (2, 2, [0.0, 1.0]),
        (3, 2, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>")
    # note: operator hardcodes nothing about dim — oracle does (64)
    got = {r.label: r for r in embedding_drift(emb).collect()}
    want_l2 = round(math.sqrt(2 * 500000**2) / 1e6, 6)
    assert set(got) == {1, 2}
    for lb in (1, 2):
        assert got[lb].n_vecs == 2
        assert got[lb].l2_to_global == want_l2
        assert got[lb].top_dim == 0
        assert got[lb].top_abs_delta == 0.5


def test_embedding_drift_single_label_is_zero(spark):
    """One label == the whole corpus -> centroid equals the global
    centroid exactly (identical integer division on identical sums)."""
    from gomapreduce_spark.operators.similarity import embedding_drift

    rows = [(i, 7, [0.1 * i, -0.3, 0.7]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>")
    [r] = embedding_drift(emb).collect()
    assert (r.label, r.n_vecs, r.l2_to_global, r.top_abs_delta) == (7, 5, 0.0, 0.0)


def test_kmeans_incremental_invariants(spark, sf_small):
    """Warm-start refresh: manifest covers the corpus, cluster ids are
    the BASE model's ids (stability is the point), shift >= 0, and a
    cluster whose membership didn't change between base fit and
    refresh reports a meaningful (finite, rounded) drift."""
    from gomapreduce_spark.operators.clustering import kmeans_incremental_update
    from gomapreduce_spark.sources.registry import load_table

    emb = load_table(spark, sf_small, "embeddings")
    rows = kmeans_incremental_update(emb).collect()
    assert sum(r.n_points for r in rows) == emb.count()
    assert all(0 <= r.cluster_id < 8 for r in rows)
    assert all(r.shift >= 0.0 and r.inertia >= 0.0 for r in rows)
    # determinism across runs (the VALUES-oracle prerequisite)
    again = kmeans_incremental_update(emb).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_kmeans_incremental_stable_on_unchanged_corpus(spark):
    """If the 'refresh' sees exactly the base slice's distribution
    (every point duplicated into the odd ids), the warm-start update
    leaves centroids where the base fit put them — shift 0.0."""
    from gomapreduce_spark.operators.clustering import kmeans_incremental_update

    pts = [(0.0, 0.0), (0.1, 0.0), (1.0, 1.0), (0.9, 1.0)]
    rows = [(2 * i, 5, list(p)) for i, p in enumerate(pts)] + [
        (2 * i + 1, 5, list(p)) for i, p in enumerate(pts)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>")
    out = kmeans_incremental_update(emb, k=2, base_rounds=2, refresh_rounds=2).collect()
    assert all(r.shift == 0.0 for r in out)
    assert sum(r.n_points for r in out) == 8
