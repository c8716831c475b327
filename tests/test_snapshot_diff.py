"""corpus_snapshot_diff: crawl-to-crawl governance classification.
Statuses are a pure function of the two content-hash sets; the
crafted fixture pins each branch (added / removed / changed /
unchanged / moved-source) exactly."""

from __future__ import annotations


def _snap(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_diff_classifies_every_branch(spark):
    from gomapreduce_spark.operators.dedup import corpus_snapshot_diff

    old = _snap(
        spark,
        [
            (1, "same text", "srcA"),
            (2, "will change", "srcA"),
            (3, "will vanish", "srcB"),
            (4, "moves source", "srcB"),
        ],
    )
    new = _snap(
        spark,
        [
            (1, "same text", "srcA"),
            (2, "has changed", "srcA"),
            (4, "moves source", "srcC"),  # same content, new home
            (5, "brand new", "srcC"),
        ],
    )
    got = {(r.source, r.status): r.n_docs for r in corpus_snapshot_diff(old, new).collect()}
    assert got == {
        ("srcA", "unchanged"): 1,
        ("srcA", "changed"): 1,
        ("srcB", "removed"): 1,
        # a moved doc reports under its NEW source, content unchanged
        ("srcC", "unchanged"): 1,
        ("srcC", "added"): 1,
    }


def test_synth_snapshot_is_deterministic_and_disjoint(spark, sf_small):
    """The synthetic next-crawl feed must be reproducible (two builds
    identical) and its fresh doc_ids disjoint from the originals."""
    from gomapreduce_spark.operators.dedup import synth_corpus_snapshot
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    a = sorted(map(tuple, synth_corpus_snapshot(docs).collect()))
    b = sorted(map(tuple, synth_corpus_snapshot(docs).collect()))
    assert a == b and len(a) > 0
    old_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    fresh = [t for t in a if t[0] >= 9_000_000]
    assert fresh and not old_ids & {t[0] for t in fresh}
