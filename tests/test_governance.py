"""Provenance manifest + e2e dedup certification: cross-operator
consistency contracts the per-query hash oracles can't see — the
manifest must agree row-for-row with the standalone operators it
unifies, and the e2e count chain must satisfy the pipeline's
arithmetic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, sf_small):
    from gomapreduce_spark.sources.registry import load_table

    return load_table(spark, sf_small, "documents")


def test_provenance_covers_every_doc_once(spark, sf_small):
    from gomapreduce_spark.operators.governance import doc_provenance

    docs = _docs(spark, sf_small)
    prov = doc_provenance(docs)
    assert prov.count() == docs.count()
    assert prov.select("doc_id").distinct().count() == docs.count()
    # governance columns never NULL
    for c in prov.columns:
        assert prov.where(F.col(c).isNull()).count() == 0, c


def test_provenance_agrees_with_standalone_operators(spark, sf_small):
    """The manifest restates four oracle-verified operators; each
    facet must match the standalone run exactly (split is DERIVED
    from cluster_id rather than re-running components — this is the
    test that proves the derivation equals dedup.leakage_safe_split)."""
    from gomapreduce_spark.operators.dedup import canonical_docs, leakage_safe_split
    from gomapreduce_spark.operators.governance import doc_provenance
    from gomapreduce_spark.operators.web import url_canonicalize

    docs = _docs(spark, sf_small)
    prov = {r.doc_id: r for r in doc_provenance(docs).collect()}

    for r in leakage_safe_split(docs).collect():
        assert prov[r.doc_id].split == r.split
        assert prov[r.doc_id].cluster_id == r.cluster_id
    for r in canonical_docs(docs).collect():
        assert prov[r.doc_id].is_canonical == r.keep
        assert prov[r.doc_id].cluster_size == r.cluster_size
    for r in url_canonicalize(docs).collect():
        assert prov[r.doc_id].canonical_url == r.canonical_url
        assert prov[r.doc_id].registered_domain == r.registered_domain


def test_provenance_transforms_audit(spark, sf_small):
    """`transforms` is the comma-joined audit of what the pipeline did:
    each flag present iff its condition holds, '' for untouched docs."""
    from gomapreduce_spark.operators.governance import doc_provenance

    docs = _docs(spark, sf_small)
    rows = doc_provenance(docs).collect()
    n_untouched = 0
    for r in rows:
        t = set(r.transforms.split(",")) if r.transforms else set()
        assert ("blocklist_drop" in t) == r.blocked
        assert ("near_dup_prune" in t) == (not r.is_canonical)
        if not t:
            n_untouched += 1
    # the synthetic feed guarantees all three transforms fire somewhere
    all_t = {x for r in rows if r.transforms for x in r.transforms.split(",")}
    assert all_t == {"canonicalize_url", "blocklist_drop", "near_dup_prune"}
    assert n_untouched > 0  # and some docs pass through clean


def test_provenance_snapshot_status_matches_diff_rollup(spark, sf_small):
    """The manifest's per-doc snapshot_status is the pre-aggregation
    view of corpus_snapshot_diff: grouping it by (source, status) must
    reproduce the diff's counts exactly for the old-doc statuses
    (added rows live only on the new side, so the manifest never
    carries them)."""
    from pyspark.sql import functions as F

    from gomapreduce_spark.operators.dedup import corpus_snapshot_diff, synth_corpus_snapshot
    from gomapreduce_spark.operators.governance import doc_provenance

    docs = _docs(spark, sf_small)
    diff = {
        (r.source, r.status): r.n_docs
        for r in corpus_snapshot_diff(docs, synth_corpus_snapshot(docs)).collect()
        if r.status != "added"
    }
    prov = {
        (r.source, r.snapshot_status): r.n
        for r in doc_provenance(docs)
        .groupBy("source", "snapshot_status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert prov == diff


def test_e2e_count_chain(spark, sf_small):
    """The certification row's arithmetic invariants: monotone chain,
    split partition of the kept set, near-dup cluster consistency,
    and stage agreement with the standalone operators."""
    from gomapreduce_spark.operators.dedup import exact_dedup
    from gomapreduce_spark.operators.governance import corpus_dedup_e2e

    docs = _docs(spark, sf_small)
    got = {r.stage: r.n_docs for r in corpus_dedup_e2e(docs).collect()}
    assert set(got) == {
        "e2e_00_input", "e2e_01_exact_survivors", "e2e_02_near_dup_docs",
        "e2e_03_near_dup_clusters", "e2e_04_canonical_kept",
        "e2e_05_train", "e2e_06_validation", "e2e_07_test",
    }
    assert got["e2e_00_input"] == docs.count()
    assert got["e2e_01_exact_survivors"] == exact_dedup(docs).count()
    assert got["e2e_00_input"] >= got["e2e_01_exact_survivors"]
    assert got["e2e_01_exact_survivors"] >= got["e2e_04_canonical_kept"] > 0
    # every multi-doc cluster has >= 2 docs; kept = survivors - pruned
    assert got["e2e_02_near_dup_docs"] >= 2 * got["e2e_03_near_dup_clusters"]
    assert (
        got["e2e_04_canonical_kept"]
        == got["e2e_01_exact_survivors"]
        - (got["e2e_02_near_dup_docs"] - got["e2e_03_near_dup_clusters"])
    )
    # the split partitions the kept set
    assert (
        got["e2e_05_train"] + got["e2e_06_validation"] + got["e2e_07_test"]
        == got["e2e_04_canonical_kept"]
    )


def test_ingest_e2e_count_chain_and_sequential_equivalence(spark, sf_small):
    """corpus_ingest_e2e's arithmetic invariants, PLUS the claim its
    docstring makes: the flags-and-conjunctive-count formulation equals
    running the admission stages as SEQUENTIAL FILTERS of the actual
    operators (blocklist_filter → gopher_rules → quality_classifier →
    exact_dedup), which is what a deployment literally executes."""
    from gomapreduce_spark.operators.dedup import exact_dedup
    from gomapreduce_spark.operators.governance import corpus_ingest_e2e
    from gomapreduce_spark.operators.text import gopher_rules, quality_classifier
    from gomapreduce_spark.operators.web import blocklist_filter

    docs = _docs(spark, sf_small)
    got = {r.stage: r.n_docs for r in corpus_ingest_e2e(docs).collect()}
    assert set(got) == {
        "ing_00_input", "ing_01_blocklist_pass", "ing_02_gopher_pass",
        "ing_03_quality_pass", "ing_04_exact_survivors", "ing_05_near_dup_docs",
        "ing_06_near_dup_clusters", "ing_07_canonical_kept",
        "ing_08_train", "ing_09_validation", "ing_10_test",
    }
    # monotone admission chain ending in a non-empty kept set
    chain = ["ing_00_input", "ing_01_blocklist_pass", "ing_02_gopher_pass",
             "ing_03_quality_pass", "ing_04_exact_survivors", "ing_07_canonical_kept"]
    for a, b in zip(chain, chain[1:]):
        assert got[a] >= got[b], (a, b, got)
    assert got["ing_07_canonical_kept"] > 0

    # sequential-filter equivalence, stage by stage, real operators
    assert got["ing_00_input"] == docs.count()
    bl_pass = docs.join(blocklist_filter(docs).select("doc_id"), "doc_id")
    assert got["ing_01_blocklist_pass"] == bl_pass.count()
    gop_pass = bl_pass.join(
        gopher_rules(bl_pass).where(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    assert got["ing_02_gopher_pass"] == gop_pass.count()
    qual_pass = gop_pass.join(
        quality_classifier(gop_pass).where(F.col("keep")).select("doc_id"), "doc_id"
    )
    assert got["ing_03_quality_pass"] == qual_pass.count()
    assert got["ing_04_exact_survivors"] == exact_dedup(qual_pass).count()

    # near-dup cluster consistency + split partition of the kept set
    assert got["ing_05_near_dup_docs"] >= 2 * got["ing_06_near_dup_clusters"]
    assert (
        got["ing_07_canonical_kept"]
        == got["ing_04_exact_survivors"]
        - (got["ing_05_near_dup_docs"] - got["ing_06_near_dup_clusters"])
    )
    assert (
        got["ing_08_train"] + got["ing_09_validation"] + got["ing_10_test"]
        == got["ing_07_canonical_kept"]
    )
    # the admission stages actually bite on the fixture (certification
    # would be vacuous if any stage passed everything through)
    assert got["ing_01_blocklist_pass"] < got["ing_00_input"]
    assert got["ing_02_gopher_pass"] < got["ing_01_blocklist_pass"]


def test_admission_flag_exprs_equal_operators(spark, sf_small):
    """The single-source-of-truth flag expressions corpus_ingest_e2e
    inlines into its scan (optimization r14) must equal the standalone
    operators' verdicts doc-for-doc — the contract that lets the e2e
    row claim its flags 'come from the REAL operators'."""
    from gomapreduce_spark.operators.text import (
        gopher_keep_expr,
        gopher_rules,
        quality_classifier,
        quality_keep_expr,
    )
    from gomapreduce_spark.operators.web import blocklist_filter, blocklist_pass_expr

    docs = _docs(spark, sf_small)
    got = {
        r.doc_id: (r.bl, r.gop, r.q)
        for r in docs.select(
            "doc_id",
            blocklist_pass_expr().alias("bl"),
            gopher_keep_expr().alias("gop"),
            quality_keep_expr().alias("q"),
        ).collect()
    }
    bl_pass = {r.doc_id for r in blocklist_filter(docs).select("doc_id").collect()}
    gop = {r.doc_id: r.keep == 1 for r in gopher_rules(docs).collect()}
    q = {r.doc_id: bool(r.keep) for r in quality_classifier(docs).collect()}
    assert set(got) == set(gop)
    for did, (f_bl, f_gop, f_q) in got.items():
        assert f_bl == (did in bl_pass), did
        assert f_gop == gop[did], did
        assert f_q == q[did], did
