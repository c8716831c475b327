"""ppjoin_pairs: prefix-filtered EXACT set-similarity self-join.

Three contracts under test:
1. Losslessness — results are identical to the uncapped brute-force
   jaccard (ngram_jaccard_pairs with max_df=None) on every fixture,
   including ones where the CAPPED production form drops pairs.
2. The prefix filter actually engages — on a corpus whose only shared
   shingle is hot boilerplate, the candidate join produces ZERO pairs
   (the hot shingle sorts last in every document's df-ascending order
   and falls outside all prefixes), while a naive share-any-shingle
   join would produce C(n,2).
3. Edge shapes — sub-shingle docs, identical-doc cliques, empty input.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def _pairs(df):
    return sorted((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())


def _near_dup_docs(spark):
    """Two near-dup pairs + singletons; all docs >= 3 tokens."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (5, "completely unrelated sentence about distributed query engines"),
        (6, "another singleton document mentioning adaptive execution"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ppjoin_matches_uncapped_exact_jaccard(spark):
    from gomapreduce_spark.operators.dedup import ngram_jaccard_pairs, ppjoin_pairs

    docs = _near_dup_docs(spark)
    for t in (0.3, 0.5, 0.8):
        assert _pairs(ppjoin_pairs(docs, t)) == _pairs(
            ngram_jaccard_pairs(docs, t, max_df=None)
        ), f"threshold {t}"


def test_ppjoin_finds_pairs_the_df_cap_drops(spark):
    """20 identical template docs: every shingle has df=20 > max_df=8,
    so the capped production form reports NO template pairs; ppjoin
    reports the full jaccard=1.0 clique — losslessness where it
    matters most."""
    from gomapreduce_spark.operators.dedup import ngram_jaccard_pairs, ppjoin_pairs

    template = "all rights reserved cookie policy accept terms privacy contact us sitemap"
    docs = spark.createDataFrame(
        [(i, template) for i in range(20)], "doc_id long, text string"
    )
    capped = _pairs(ngram_jaccard_pairs(docs, 0.5, max_df=8))
    exact = _pairs(ppjoin_pairs(docs, 0.5))
    assert capped == []  # the cap's documented one-sided under-report
    assert len(exact) == 20 * 19 // 2
    assert all(j == 1.0 for _, _, j in exact)


def test_ppjoin_prefix_filter_prunes_hot_shingle(spark):
    """40 docs, each 15 unique words plus one shared boilerplate
    3-gram. The shared shingle has the corpus-max df (40) so it sorts
    LAST in every doc's (df asc, hash asc) order — outside every
    prefix at t=0.5. Candidate count observed via the plan's
    CollectMetrics must be ZERO (a naive share-any-shingle join would
    emit C(40,2)=780 candidate pairs), and the result is empty."""
    from gomapreduce_spark.operators.dedup import ppjoin_pairs

    rows = []
    for i in range(40):
        uniq = " ".join(f"w{i}x{k}" for k in range(15))
        rows.append((i, f"{uniq} foo bar baz"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation()
    out = ppjoin_pairs(docs, 0.5, observation=obs)
    assert out.collect() == []
    assert obs.get["n_candidates"] == 0


def test_ppjoin_candidates_bounded_on_near_dups(spark):
    """On the near-dup fixture the filter still admits the true pairs:
    candidates >= result pairs, but far below all-pairs."""
    from gomapreduce_spark.operators.dedup import ppjoin_pairs

    docs = _near_dup_docs(spark)
    obs = Observation()
    out = ppjoin_pairs(docs, 0.5, observation=obs)
    n_pairs = out.count()
    assert n_pairs == 2  # (1,2) and (3,4)
    assert n_pairs <= obs.get["n_candidates"] < 6 * 5 // 2


def test_ppjoin_is_not_silent(spark):
    from gomapreduce_spark.operators.dedup import ppjoin_pairs
    from tools.explain_audit import plan_str

    plan = plan_str(ppjoin_pairs(_near_dup_docs(spark)))
    assert "ppjoin_candidates" in plan
    assert "CollectMetrics" in plan


def test_ppjoin_edge_shapes(spark):
    from gomapreduce_spark.operators.dedup import ppjoin_pairs

    # docs shorter than the shingle width produce no shingles -> excluded
    short = spark.createDataFrame(
        [(1, "two words"), (2, "two words"), (3, "")], "doc_id long, text string"
    )
    assert ppjoin_pairs(short, 0.5).collect() == []
    # threshold 1.0: only identical sets survive
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "a b c d e g"),
        ],
        "doc_id long, text string",
    )
    assert _pairs(ppjoin_pairs(docs, 1.0)) == [(1, 2, 1.0)]


def test_ppjoin_threshold_domain_guard(spark):
    """Round-9 verdict watch item: prefix length |x|-ceil(t|x|)+1
    approaches |x| as t->0, silently degrading toward brute force.
    Below the recommended domain the operator must WARN (results stay
    exact); t<=0 / t>1 must raise."""
    import warnings

    import pytest

    from gomapreduce_spark.operators.dedup import PPJOIN_MIN_RECOMMENDED_T, ppjoin_pairs

    docs = _near_dup_docs(spark)
    with pytest.warns(RuntimeWarning, match="below the recommended domain"):
        low = ppjoin_pairs(docs, threshold=0.1)
    # the warning is advisory only: the low-threshold run is still exact
    # (a superset of the t=0.5 pairs, all with jaccard >= 0.1)
    got = low.collect()
    assert all(r.jaccard >= 0.1 for r in got)
    at_half = {(r.doc_a, r.doc_b) for r in ppjoin_pairs(docs, threshold=0.5).collect()}
    assert at_half <= {(r.doc_a, r.doc_b) for r in got}
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # in-domain: silent
        ppjoin_pairs(docs, threshold=PPJOIN_MIN_RECOMMENDED_T)
    for bad in (0.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="threshold must be in"):
            ppjoin_pairs(docs, threshold=bad)
