"""Hybrid retrieval: RRF arithmetic, rank-list consistency, and the
partially-embedded-corpus candidate contract."""

from __future__ import annotations

from gomapreduce_spark.operators.similarity import (
    HYBRID_RRF_K,
    HYBRID_TOP,
    hybrid_search,
)


def test_hybrid_fixture_invariants(spark, sf_small):
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    emb = load_table(spark, sf_small, "embeddings")
    rows = hybrid_search(docs, emb).collect()
    assert len(rows) == HYBRID_TOP
    assert sorted(r.rk for r in rows) == list(range(1, HYBRID_TOP + 1))
    # both rank lists are permutations over the candidate set: distinct
    # and positive; fused score recomputes exactly from the ranks
    assert len({r.bm25_rk for r in rows}) == len(rows)
    assert len({r.cos_rk for r in rows}) == len(rows)
    for r in rows:
        assert r.bm25_rk >= 1 and r.cos_rk >= 1
        want = round(1.0 / (HYBRID_RRF_K + r.bm25_rk) + 1.0 / (HYBRID_RRF_K + r.cos_rk), 6)
        assert r.rrf_score == want
    # RRF ordering: scores non-increasing with rk
    by_rk = sorted(rows, key=lambda r: r.rk)
    assert all(a.rrf_score >= b.rrf_score for a, b in zip(by_rk, by_rk[1:]))


def test_hybrid_only_embedded_docs_are_candidates(spark):
    """Docs matching the query terms but with no embedding row never
    appear — both rank lists are computed over the same joined set."""
    docs = spark.createDataFrame(
        [(i, "spark table query spark", "en", "src0", 23) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) / 10.0], 0) for i in (0, 2, 4)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = hybrid_search(docs, emb).collect()
    assert {r.doc_id for r in rows} == {0, 2, 4}
    assert sorted(r.bm25_rk for r in rows) == [1, 2, 3]
    assert sorted(r.cos_rk for r in rows) == [1, 2, 3]


def test_hybrid_empty_candidates(spark):
    docs = spark.createDataFrame(
        [(0, "nothing matches here", "en", "src0", 20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert hybrid_search(docs, emb).count() == 0


def test_containment_detects_embedded_excerpt(spark):
    """A short doc fully contained in a long doc: Jaccard is tiny (the
    structural blind spot) but containment_a is 1.0."""
    from gomapreduce_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    excerpt = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, excerpt, "en", "src0", len(excerpt)),
            (2, filler + " " + excerpt + " " + filler, "en", "src0", 500),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    [r] = containment_pairs(docs).collect()
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment_a == 1.0  # every excerpt shingle is in doc 2
    assert r.containment_b < 0.1
    # and the jaccard form misses the pair at the same 0.5 bar
    assert ngram_jaccard_pairs(docs).count() == 0


def test_containment_hot_shingle_cap(spark):
    """With max_df below the corpus df, the shared shingle is dropped
    before the pair join and no pair survives — the no-silent-caps
    backstop (denominators still reflect true sizes)."""
    from gomapreduce_spark.operators.dedup import containment_pairs

    text = "common one two three four five"
    docs = spark.createDataFrame(
        [(i, text, "en", "src0", len(text)) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert containment_pairs(docs).count() == 6  # all pairs identical
    assert containment_pairs(docs, max_df=3).count() == 0


def test_translated_near_dups_cross_lang_only(spark):
    """Near-identical vectors in different langs surface; the
    same-lang near-dup pair is filtered out."""
    from gomapreduce_spark.operators.dedup import translated_near_dups

    docs = spark.createDataFrame(
        [
            (0, "hello world", "en", "src0", 11),
            (1, "bonjour monde", "fr", "src0", 13),
            (2, "hallo welt", "de", "src0", 10),
            (3, "hi there", "en", "src0", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    def v64(x: float, y: float) -> list[float]:
        return [x, y] + [0.0] * 62  # the LSH signer expects dim=64

    emb = spark.createDataFrame(
        [
            (0, v64(1.0, 0.0), 0),    # en ~ fr pair (cross-lang, surfaces)
            (1, v64(0.99, 0.01), 0),
            (2, v64(0.0, 1.0), 1),    # de, far from everything
            (3, v64(1.0, 0.01), 0),   # en ~ en with 0 (same lang, filtered)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = translated_near_dups(docs, emb).collect()
    got = {(r.doc_a, r.doc_b): (r.lang_a, r.lang_b) for r in rows}
    assert (0, 1) in got and got[(0, 1)] == ("en", "fr")
    assert (1, 3) in got and got[(1, 3)] == ("fr", "en")
    assert (0, 3) not in got  # en-en near-dup excluded


def test_session_paths_hand_computed(spark):
    """One user, two sessions split by a >30min gap; paths truncate at
    max_steps and rank (count desc, path asc)."""
    from datetime import datetime

    from gomapreduce_spark.operators.events import session_paths

    def ev(eid, minute, typ):
        return (eid, datetime(2024, 1, 1, 10 + minute // 60, minute % 60), 1, typ, 1.0, "{}")

    rows = [
        ev(1, 0, "view"), ev(2, 1, "click"),          # session 1: view>click
        ev(3, 60, "view"), ev(4, 61, "click"),        # session 2 (59-min gap): view>click
        ev(5, 200, "buy"),                            # session 3: buy
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.path: r for r in session_paths(events, gap_minutes=30).collect()}
    assert got["view>click"].n_sessions == 2 and got["view>click"].rk == 1
    assert got["buy"].n_sessions == 1 and got["buy"].rk == 2


def test_session_paths_truncates_at_max_steps(spark):
    from datetime import datetime

    from gomapreduce_spark.operators.events import session_paths

    rows = [
        (i, datetime(2024, 1, 1, 10, i), 1, f"t{i}", 1.0, "{}") for i in range(8)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    [r] = session_paths(events, max_steps=3).collect()
    assert r.path == "t0>t1>t2" and r.n_sessions == 1


def test_calibrated_quality_recalibrates_sources(spark):
    """Source A scores uniformly high, source B uniformly low: a raw
    0.5 bar keeps all of A and none of B, while the per-source 0.5
    percentile bar keeps the top half of EACH."""
    from gomapreduce_spark.operators.text import calibrated_quality

    rich = "the quick brown fox jumps over a lazy dog and runs to the hills again " * 3
    poor = "zzz 123 !!!"
    docs = spark.createDataFrame(
        [(i, rich + f" extra{i}", "en", "A", 100) for i in range(4)]
        + [(10 + i, poor + f" {i}", "en", "B", 10) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = calibrated_quality(docs).collect()
    a = [r for r in rows if r.source == "A"]
    b = [r for r in rows if r.source == "B"]
    assert all(r.keep_raw for r in a) and not any(r.keep_raw for r in b)
    assert sum(r.keep_cal for r in a) == 2 and sum(r.keep_cal for r in b) == 2
    # percent_rank spans [0, 1] within each source
    for grp in (a, b):
        assert min(r.pct_rank for r in grp) == 0.0
        assert max(r.pct_rank for r in grp) == 1.0


def test_lpa_separates_bridged_cliques(spark):
    """Two dense near-dup families joined by one bridge doc: connected
    components merges everything into ONE cluster, while 3-round
    synchronous LPA keeps the two dense families in distinct
    communities — the complementary graph view, pinned directly."""
    from gomapreduce_spark.operators.dedup import dedup_clusters, lpa_communities

    fam_a = "alpha beta gamma delta epsilon zeta eta theta " * 6
    fam_b = "one two three four five six seven eight " * 6
    rows = (
        [(i, fam_a + f"a{i}", "en", "src0", 100) for i in range(3)]
        + [(10 + i, fam_b + f"b{i}", "en", "src0", 100) for i in range(3)]
        # bridge: half family-A words, half family-B words
        + [(20, (fam_a[: len(fam_a) // 2] + fam_b[: len(fam_b) // 2]), "en", "src0", 100)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    lpa = {r.doc_id: r.community for r in lpa_communities(docs, threshold=0.2).collect()}
    a_comms = {lpa[i] for i in (0, 1, 2)}
    b_comms = {lpa[i] for i in (10, 11, 12)}
    assert len(a_comms) == 1 and len(b_comms) == 1
    assert a_comms != b_comms  # dense families stay separate
    cc = {r.doc_id: r.cluster_id for r in dedup_clusters(docs, threshold=0.2).collect()}
    assert len({cc[i] for i in (0, 1, 2, 10, 11, 12, 20)}) == 1  # CC merges via the bridge


def test_volume_anomalies_flags_spike_day(spark):
    """A flat 10-events/day history with one 100-event day: the spike
    day (and only it) is flagged; MAD is 0-safe when most days tie."""
    from datetime import datetime

    from gomapreduce_spark.operators.events import volume_anomalies

    rows = []
    eid = 0
    for day in range(1, 8):
        per_day = 100 if day == 4 else 10
        for i in range(per_day):
            rows.append((eid, datetime(2024, 1, day, 12, 0, i % 60), 1, "view", 1.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.day: r for r in volume_anomalies(events).collect()}
    assert len(got) == 7
    assert got["2024-01-04"].is_anomaly and got["2024-01-04"].n == 100
    normal = [r for d, r in got.items() if d != "2024-01-04"]
    assert all(not r.is_anomaly for r in normal)
    # 6 of 7 days tie at 10 -> median 10, MAD 0 -> degenerate branch:
    # the spike is flagged via n != median, normals are not
    assert got["2024-01-04"].mz is None and got["2024-01-04"].mad == 0.0
