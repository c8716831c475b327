"""Hot-bucket cap tests: a planted boilerplate mega-cluster must not
produce quadratic pair work in the LSH stages, while recall on the
rest of the fixture is preserved (SCALE.md's documented production
mitigation, now implemented in minhash_lsh_pairs and
embedding_near_dup)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _planted_docs(spark, n_template: int = 20):
    """2 identical 'real' near-dup docs + n_template copies of a
    boilerplate template + a few distinct docs."""
    pair_text = "the quick brown fox jumps over the lazy dog again and again today"
    template = "all rights reserved cookie policy accept terms privacy contact us sitemap"
    rows = [(1, pair_text), (2, pair_text)]
    rows += [(1000 + i, template) for i in range(n_template)]
    rows += [
        (100, "completely unrelated sentence about distributed query engines"),
        (101, "another singleton document mentioning adaptive execution"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_drops_template_cluster_keeps_real_pairs(spark):
    from gomapreduce_spark.operators.dedup import minhash_lsh_pairs

    docs = _planted_docs(spark)
    capped = minhash_lsh_pairs(docs, max_bucket=8).collect()
    uncapped = minhash_lsh_pairs(docs).collect()  # default cap far above fixture

    # identical template docs collide in every band -> every bucket
    # holding them exceeds the cap of 8 -> no template x template pairs
    assert not any(r.doc_a >= 1000 and r.doc_b >= 1000 for r in capped)
    assert any(r.doc_a >= 1000 and r.doc_b >= 1000 for r in uncapped)
    # the 2-doc real duplicate pair sits in buckets of size 2 and survives
    assert any((r.doc_a, r.doc_b) == (1, 2) for r in capped)
    # recall outside the dropped cluster is untouched: same non-template pairs
    key = lambda r: (r.doc_a, r.doc_b)  # noqa: E731
    non_template = lambda rows: {key(r) for r in rows if r.doc_b < 1000}  # noqa: E731
    assert non_template(capped) == non_template(uncapped)


def test_minhash_cap_is_not_silent(spark):
    """The drop count rides the plan as a named CollectMetrics
    observation — visible to any QueryExecutionListener, per the
    repo's no-silent-caps rule."""
    from gomapreduce_spark.operators.dedup import minhash_lsh_pairs
    from tools.explain_audit import plan_str

    df = minhash_lsh_pairs(_planted_docs(spark), max_bucket=8)
    plan = plan_str(df)
    assert "minhash_lsh_hot_buckets" in plan
    assert "CollectMetrics" in plan


def test_minhash_cap_boundary_is_exclusive(spark):
    """The cap predicate is n > max_bucket: a bucket holding EXACTLY
    max_bucket docs is kept whole, one more drops it. Pins the
    boundary through the bucket-local rewrite (the window-count
    filter must behave exactly like the old anti-join's n_docs >
    max_bucket)."""
    from gomapreduce_spark.operators.dedup import minhash_lsh_pairs

    # n identical docs collide in every band -> every bucket holds
    # exactly n of them
    text = "all rights reserved cookie policy accept terms privacy contact us"
    docs = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    at_cap = minhash_lsh_pairs(docs, max_bucket=6).collect()
    assert {(r.doc_a, r.doc_b) for r in at_cap} == {
        (a, b) for a in range(6) for b in range(6) if a < b
    }
    over_cap = minhash_lsh_pairs(docs, max_bucket=5).collect()
    assert over_cap == []


def test_embedding_cap_drops_template_cell_keeps_real_pairs(spark):
    from gomapreduce_spark.operators.dedup import embedding_near_dup

    # the corpus-wide LSH planes are sized to the embeddings fixture (dim 64)
    dim = 64
    u = [((i * 7) % 13 - 6) / 6.0 for i in range(dim)]
    t = [-v for v in u]  # opposite direction -> different sign buckets
    rows = [(1, u), (2, u)]  # the real near-dup pair (cos = 1)
    rows += [(1000 + i, t) for i in range(20)]  # template mega-cluster
    rows += [(100, [1.0 if i % 2 else -1.0 for i in range(dim)])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert len(emb.head().embedding) == dim

    capped = embedding_near_dup(emb, max_cell=8).collect()
    uncapped = embedding_near_dup(emb).collect()

    assert not any(r.vec_a >= 1000 and r.vec_b >= 1000 for r in capped)
    assert any(r.vec_a >= 1000 and r.vec_b >= 1000 for r in uncapped)
    assert any((r.vec_a, r.vec_b) == (1, 2) for r in capped)


def test_embedding_cap_is_not_silent(spark):
    from gomapreduce_spark.operators.dedup import embedding_near_dup
    from tools.explain_audit import plan_str

    emb = spark.createDataFrame(
        [(i, [float(i % 3) - 1.0] * 64) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    plan = plan_str(embedding_near_dup(emb, max_cell=2))
    assert "embedding_near_dup_hot_cells" in plan
    assert "CollectMetrics" in plan


def _hot_shingle_docs(spark, n_template: int = 12):
    """Docs engineered so one 3-word shingle ('rights reserved cookie'
    etc.) is hot (df = n_template + 2) while a genuine near-dup pair
    shares plenty of cold shingles."""
    boiler = "all rights reserved cookie policy"
    pair_a = f"alpha beta gamma delta epsilon zeta {boiler}"
    pair_b = f"alpha beta gamma delta epsilon eta {boiler}"
    rows = [(1, pair_a), (2, pair_b)]
    # template docs share ONLY the boilerplate shingles with 1/2
    rows += [(1000 + i, f"unique{i} prefix{i} words {boiler}") for i in range(n_template)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_df_cap_only_under_reports(spark):
    """The hot-shingle df cap on ngram_jaccard_pairs (round-7 verdict
    item 1) is one-sided: denominators use TRUE set sizes, so every
    capped similarity <= its uncapped value, the boilerplate-only
    pair fan-out disappears, and real pairs survive."""
    from gomapreduce_spark.operators.dedup import ngram_jaccard_pairs

    docs = _hot_shingle_docs(spark)
    capped = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, 0.0, max_df=8).collect()}
    uncapped = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, 0.0).collect()}

    # template x template pairs share ONLY hot shingles -> gone entirely
    assert not any(a >= 1000 and b >= 1000 for a, b in capped)
    assert any(a >= 1000 and b >= 1000 for a, b in uncapped)
    # the real pair shares cold shingles and survives
    assert (1, 2) in capped
    # one-sided guarantee: never over-report (TRUE-size denominators)
    for k, v in capped.items():
        assert v <= uncapped[k] + 1e-12, k
    # and the real pair's score is strictly the cold-intersection value,
    # computed against FULL set sizes (not post-cap sizes)
    assert capped[(1, 2)] < uncapped[(1, 2)]


def test_jaccard_df_cap_is_not_silent(spark):
    from gomapreduce_spark.operators.dedup import ngram_jaccard_pairs
    from tools.explain_audit import plan_str

    plan = plan_str(ngram_jaccard_pairs(_hot_shingle_docs(spark), 0.0, max_df=8))
    assert "jaccard_hot_shingles" in plan
    assert "CollectMetrics" in plan


def test_knn_lsh_cap_drops_degenerate_bucket_keeps_real_neighbors(spark):
    """A mega-cluster of identical vectors collapses into one signature
    bucket per table; with the cap those candidates vanish (observed,
    bounded join) while distinct real neighbors still rank."""
    from gomapreduce_spark.operators.similarity import knn_lsh
    from tools.explain_audit import plan_str

    dim = 64
    u = [((i * 5) % 11 - 5) / 5.0 + 0.01 for i in range(dim)]
    v = [x * 0.9 for x in u]        # near-dup of u -> identical sign buckets
    # perturbed copy: collides with u in SOME tables (so uncapped sees
    # it) but not the tables where the (u, v) pair lives (so the pair's
    # own 2-member buckets survive the cap)
    t = [x + 0.5 * (1 if i % 2 else -1) for i, x in enumerate(u)]
    rows = [(0, u), (1, v)]
    rows += [(1000 + i, t) for i in range(30)]  # degenerate identical cluster
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = knn_lsh(emb, n_queries=2, k=3, max_bucket=8).collect()
    uncapped = knn_lsh(emb, n_queries=2, k=3).collect()
    # the template cluster disappears from capped candidates entirely
    assert not any(r.neighbor_id >= 1000 for r in capped)
    assert any(r.neighbor_id >= 1000 for r in uncapped)
    # the genuine neighbor pair survives in both directions
    assert any((r.query_id, r.neighbor_id) == (0, 1) for r in capped)
    assert any((r.query_id, r.neighbor_id) == (1, 0) for r in capped)
    # and the cap is observed, never silent
    plan = plan_str(knn_lsh(emb, n_queries=2, k=3, max_bucket=8))
    assert "knn_lsh_hot_buckets" in plan and "CollectMetrics" in plan
