"""Round-7 operators: session_window boundary semantics, incremental
rollup merge-equals-recompute invariance, PMI collocation sanity."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


def test_session_window_boundary_semantics(spark):
    """An event exactly gap after the previous one opens a NEW session
    (session end = last event + gap, [start, end) half-open), while one
    a microsecond earlier extends the session — the >= rule the oracle
    re-derives."""
    from gomapreduce_spark.operators.events import session_window_stats

    t0 = datetime(2024, 1, 1)
    gap = timedelta(minutes=240)
    rows = [
        (1, 1, t0, 1.0),                                   # session A
        (2, 1, t0 + gap - timedelta(microseconds=1), 1.0), # extends A
        (3, 1, t0 + 2 * gap, 1.0),                         # exactly at A's new end -> B
        (4, 2, t0, 1.0),                                   # other user
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.start_us): (r.end_us, r.n_events)
        for r in session_window_stats(ev, gap_minutes=240).collect()
    }
    us = lambda dt: int(dt.timestamp() * 1_000_000)  # noqa: E731
    gap_us = 240 * 60 * 1_000_000
    a_last = t0 + gap - timedelta(microseconds=1)
    assert got[(1, us(t0))] == (us(a_last) + gap_us, 2)
    assert got[(1, us(t0 + 2 * gap))] == (us(t0 + 2 * gap) + gap_us, 1)
    assert got[(2, us(t0))] == (us(t0) + gap_us, 1)


def test_incremental_rollup_invariant_under_cutoff(spark, sf_med):
    """The merged two-state rollup equals itself at ANY split point —
    including degenerate cutoffs where one half is empty — because
    every moment accumulates exactly (ints, min/max)."""
    from gomapreduce_spark.operators.events import incremental_user_rollup
    from gomapreduce_spark.sources.registry import load_table

    ev = load_table(spark, sf_med, "events")
    base = {tuple(r) for r in incremental_user_rollup(ev, cutoff="2024-01-08").collect()}
    for cutoff in ("2024-01-03", "2024-06-01", "1970-01-01"):
        assert {tuple(r) for r in incremental_user_rollup(ev, cutoff=cutoff).collect()} == base


def test_pmi_ranks_planted_collocation_first(spark):
    """A pair that ALWAYS co-occurs ("new york") outranks frequent
    independent pairs; a pair of independently-frequent words gets
    low PMI."""
    from gomapreduce_spark.operators.text import pmi_collocations

    filler = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(i, f"new york {filler}" if i % 2 == 0 else f"{filler} the cat", "en")
         for i in range(20)],
        "doc_id long, text string, lang string",
    )
    got = pmi_collocations(docs, min_count=5, k=5).collect()
    assert (got[0].w1, got[0].w2) == ("new", "york")
    assert got[0].rk == 1 and got[0].pmi > 0


def test_bpe_learns_planted_frequent_pair_first(spark):
    """A corpus dominated by one word must merge that word's first
    character pair at rank 1, and encoding must compress the fully
    merged word to a single token once enough merges exist."""
    from gomapreduce_spark.operators.text import bpe_encode_stats, bpe_learn_merges

    docs = spark.createDataFrame(
        [(i, "aaab " + ("xy" if i % 5 == 0 else "zq"), "en") for i in range(50)],
        "doc_id long, text string, lang string",
    )
    merges = bpe_learn_merges(docs, n_merges=6, top_words=100).collect()
    assert (merges[0].rank, merges[0].left, merges[0].right) == (1, "a", "a")
    assert merges[0].pair_count == 100  # two 'aa' occurrences x 50 docs
    stats = {r.lang: r for r in bpe_encode_stats(docs, n_merges=6, top_words=100).collect()}
    en = stats["en"]
    assert en.n_words == 100
    # 'aaab' needs 4 merges to fuse to one symbol; 'xy'/'zq' need 2 —
    # 6 deterministic merges cover the dominant word at least
    assert en.n_single_token_words >= 50
    assert en.fertility < 3.0


def test_scaling_hint_gate_negative_control(spark, sf_med):
    """The forbid_scaling_hints gate must FLAG a mandatory broadcast of
    an SF-scaling dimension (customer) and must ALLOW the legitimate
    hints: fixed nation/region keys and 1-row scalar crosses — proof
    the round-7 gate detects exactly the violation it forbids."""
    from tools.explain_audit import scaling_hint_lines

    from gomapreduce_spark.sources.registry import load_table

    customer = load_table(spark, sf_med, "customer")
    nation = load_table(spark, sf_med, "nation")
    region = load_table(spark, sf_med, "region")
    orders = load_table(spark, sf_med, "orders")

    # violation: forced broadcast of the SF-scaling customer side
    bad = orders.join(
        F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
        orders.o_custkey == customer.c_custkey,
    )
    assert scaling_hint_lines(bad), "gate missed a forced customer broadcast"

    # legitimate: fixed 25-row nation hint on its key
    ok_dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    assert scaling_hint_lines(ok_dim) == []

    # legitimate: 1-row scalar aggregate broadcast-crossed
    avg_bal = customer.agg(F.avg("c_acctbal").alias("ab"))
    ok_cross = customer.crossJoin(F.broadcast(avg_bal))
    assert scaling_hint_lines(ok_cross) == []

    # and the unhinted form of the violation is clean
    good = orders.join(
        customer.where(F.col("c_mktsegment") == "BUILDING"),
        orders.o_custkey == customer.c_custkey,
    )
    assert scaling_hint_lines(good) == []

    # round-8 advisor bypasses, now closed by the structural walk:
    # (a) a forced broadcast of a customer JOIN nation OUTPUT — the join
    # condition mentions n_nationkey but the hinted side scales with SF
    cust_nat = customer.join(nation, customer.c_nationkey == nation.n_nationkey)
    smuggled = orders.join(
        F.broadcast(cust_nat), orders.o_custkey == cust_nat.c_custkey
    )
    assert scaling_hint_lines(smuggled), "gate missed a customer x nation broadcast"
    # (b) a CROSS join does not launder a corpus-sized hinted side
    bad_cross = orders.crossJoin(
        F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING"))
    )
    assert scaling_hint_lines(bad_cross), "gate missed a scaling cross-join broadcast"
    # (c) a statically row-bounded side (top-k Limit) is legitimate
    topk = customer.orderBy(F.col("c_acctbal").desc()).limit(10)
    assert scaling_hint_lines(orders.crossJoin(F.broadcast(topk))) == []
    # (d) column-NAME smuggling (round-8 reviewer finding): projecting
    # a corpus-sized side down to nation-named columns — or aliasing
    # c_name AS n_name — must not fool the gate; it validates LEAF
    # relations, not output schemas
    smuggled_names = orders.crossJoin(
        F.broadcast(cust_nat.select("n_name"))
    )
    assert scaling_hint_lines(smuggled_names), "gate missed a projected-to-n_name broadcast"
    aliased = orders.crossJoin(
        F.broadcast(customer.select(F.col("c_name").alias("n_name")))
    )
    assert scaling_hint_lines(aliased), "gate missed an aliased-to-n_name broadcast"
    # (e) while nation JOIN region (both leaves fixed) stays legitimate
    nat_reg = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    assert scaling_hint_lines(customer.join(
        F.broadcast(nat_reg), customer.c_nationkey == nat_reg.n_nationkey
    )) == []


def test_distinctive_terms_finds_planted_source_vocabulary(spark):
    """A token exclusive to one source must top that source's list
    with a strongly positive z; a token uniform across sources must
    never rank near the top anywhere."""
    from gomapreduce_spark.operators.text import distinctive_terms

    common = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (i, f"{common} quux quux" if i % 2 == 0 else common,
             "srcA" if i % 2 == 0 else "srcB")
            for i in range(40)
        ],
        "doc_id long, text string, source string",
    )
    got = distinctive_terms(docs, k=3, min_count=5).collect()
    a = sorted((r.rk, r.token, r.z) for r in got if r.source == "srcA")
    assert a[0][1] == "quux" and a[0][2] > 0
    # the uniform tokens never beat the planted one anywhere
    b = sorted((r.rk, r.token, r.z) for r in got if r.source == "srcB")
    assert all(t != "quux" for _, t, _ in b)


def test_source_overlap_matrix_planted_duplication(spark):
    """Two sources sharing half their shingle text overlap strongly; a
    disjoint third source appears in NO pair with them (sparse
    semantics) except through genuinely shared shingles."""
    from gomapreduce_spark.operators.dedup import source_overlap_matrix

    shared = "the quick brown fox jumps over the lazy dog entirely"
    docs = spark.createDataFrame(
        [
            (0, shared + " alpha beta gamma", "srcA"),
            (1, shared + " delta epsilon zeta", "srcB"),
            (2, "completely different tokens here nothing matches at all ever", "srcC"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {(r.src_a, r.src_b): (r.n_common, r.jaccard) for r in source_overlap_matrix(docs).collect()}
    assert ("srcA", "srcB") in rows and rows[("srcA", "srcB")][1] > 0.4
    assert all("srcC" not in pair for pair in rows)


def test_dedup_recall_audit_counts_planted_pairs(spark):
    """Planted near-identical docs are true pairs AND LSH candidates;
    unrelated docs are neither — the audit's counts and ratios follow."""
    from gomapreduce_spark.operators.dedup import dedup_recall_audit

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (0, base, "en"),
            (1, base + " extra", "en"),                       # near-dup of 0
            (2, "completely unrelated words nowhere near the others at all", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    row = dedup_recall_audit(docs).collect()[0]
    assert row.n_true >= 1 and row.n_hit == row.n_true and row.recall == 1.0
    assert 0 < row.precision <= 1.0


def test_dedup_recall_audit_warning_gated_on_size(spark, monkeypatch):
    """Round-9 advisor finding: the sample_mod=1 RuntimeWarning fired
    unconditionally, spamming every fixture-scale driver/bench run the
    docstring itself endorses. It must stay silent below the probe
    threshold and fire above it."""
    import warnings

    from gomapreduce_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"doc body number {i} with words", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # would raise if emitted
        dedup.dedup_recall_audit(docs).collect()
    monkeypatch.setattr(dedup, "_AUDIT_WARN_DOCS", 3)
    with pytest.warns(RuntimeWarning, match="UNCAPPED exact n-gram"):
        dedup.dedup_recall_audit(docs)  # plan construction probes + warns
    # sample_mod>1 never probes or warns, at any size
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        dedup.dedup_recall_audit(docs, sample_mod=2)


def test_hashed_features_signed_counts(spark):
    """Repeated tokens accumulate |weight| = count in ONE bucket; the
    same token always lands in the same signed bucket (vocabulary-free
    determinism), and exact sign-cancellation rows are dropped."""
    from gomapreduce_spark.operators.text import hashed_features

    docs = spark.createDataFrame(
        [(0, "tok tok tok", "en"), (10, "tok", "en")],
        "doc_id long, text string, lang string",
    )
    rows = hashed_features(docs, sample_every=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.bucket, r.weight))
    assert len(by_doc[0]) == 1 and len(by_doc[10]) == 1
    (b0, w0), (b1, w1) = by_doc[0][0], by_doc[10][0]
    assert b0 == b1 and abs(w0) == 3 and abs(w1) == 1
    assert (w0 > 0) == (w1 > 0)


def test_fixed_k_sample_exact_counts_and_determinism(spark, sf_med):
    """Exactly min(k, |stratum|) rows per language, identical across
    runs (seeded-hash order, no RNG)."""
    from gomapreduce_spark.operators.text import fixed_k_sample
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_med, "documents")
    s1 = {tuple(r) for r in fixed_k_sample(docs, k=7).collect()}
    s2 = {tuple(r) for r in fixed_k_sample(docs, k=7).collect()}
    assert s1 == s2
    from collections import Counter

    per_lang = Counter(lang for _, lang, _, _ in s1)
    strata = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert per_lang == {lang: min(7, n) for lang, n in strata.items()}


def test_mad_outliers_flags_planted_spike(spark):
    """A single huge value among tight ones is flagged; a clean group
    reports zero outliers (MAD is not dragged by the spike)."""
    from gomapreduce_spark.operators.events import mad_outliers

    rows = [(i, "spiky", 10.0 + (i % 5) * 0.1) for i in range(20)] + [(99, "spiky", 1e6)]
    rows += [(200 + i, "clean", 5.0 + (i % 3) * 0.2) for i in range(21)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r.event_type: r for r in mad_outliers(ev).collect()}
    assert got["spiky"].n_outliers == 1 and got["spiky"].max_abs_z > 1000
    assert got["clean"].n_outliers == 0


def test_lang_id_confusion_fractions_sum_to_one(spark, sf_med):
    """Within every true label the fractions sum to ~1 and counts sum
    to the label's corpus size — the matrix is complete and normalized."""
    from gomapreduce_spark.operators.text import lang_id_confusion
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_med, "documents")
    rows = lang_id_confusion(docs).collect()
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    by_true = {}
    for r in rows:
        agg = by_true.setdefault(r.lang_true, [0, 0.0])
        agg[0] += r.n
        agg[1] += r.frac
    assert {t: a[0] for t, a in by_true.items()} == sizes
    assert all(abs(a[1] - 1.0) < 1e-4 for a in by_true.values())


def test_late_round_gate_negative_controls(spark, sf_small):
    """The late-round plan gates detect exactly what they forbid:
    (a) lpa_communities' row_number ban flags a sort-window argmax
    variant (the shape the operator deliberately avoids — since the
    r14 optimization the gate permits the COUNT window that computes
    n_members, so the ban is on the row_number token, not Window), and (b)
    translated_near_dups' FlatMapGroupsInPandas requirement flags a
    plan that skipped the Arrow cell-scoring stage."""
    from pyspark.sql import Window as W

    from tools.explain_audit import AUDITS, audit_one

    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    # (a) a window-argmax label vote — correct output, forbidden shape
    votes = docs.select(F.col("doc_id"), (F.col("doc_id") % 7).alias("label"), F.lit(1).alias("n"))
    w = W.partitionBy("doc_id").orderBy(F.col("n").desc(), F.col("label").asc())
    windowed = votes.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    fails = audit_one("lpa_communities", windowed, AUDITS["lpa_communities"])
    assert any("row_number" in f for f in fails), "row_number ban missed a sort-window argmax"

    # (b) a lang self-join with no Arrow scoring stage anywhere
    lang = docs.select("doc_id", "lang")
    plain = lang.join(lang.withColumnRenamed("lang", "lang_b"), "doc_id")
    fails = audit_one("translated_near_dups", plain, AUDITS["translated_near_dups"])
    assert any("FlatMapGroupsInPandas" in f for f in fails), (
        "required-node gate missed a plan without the Arrow pair scorer"
    )
