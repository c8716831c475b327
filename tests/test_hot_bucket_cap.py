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
