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
    # fresh ids live above 2^60 (h64 < 2^60), structurally disjoint
    # from any real doc_id
    fresh = [t for t in a if t[0] >= (1 << 60)]
    n_sources = docs.select("source").distinct().count()
    assert len(fresh) == n_sources and not old_ids & {t[0] for t in fresh}


def test_synth_snapshot_fresh_ids_survive_odd_sources(spark):
    """Round-9 advisor finding: the old numeric-suffix regex NULLed a
    digit-free source and collided sources sharing a suffix. The
    h64-derived ids must give every source a distinct non-null id."""
    from gomapreduce_spark.operators.dedup import synth_corpus_snapshot

    docs = spark.createDataFrame(
        [
            (1, "alpha text", "en", "no-digits-here", 10),
            (2, "beta text", "en", "crawl7", 9),
            (3, "gamma text", "en", "batch7", 10),  # shares suffix '7'
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    fresh = [
        r
        for r in synth_corpus_snapshot(docs).collect()
        if r.doc_id is not None and r.doc_id >= (1 << 60)
    ]
    assert len(fresh) == 3
    assert len({r.doc_id for r in fresh}) == 3
