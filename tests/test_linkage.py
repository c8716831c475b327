"""Record-linkage (SymSpell deletion-neighborhood) and the other
round-6 operators: behavioral tests beyond the DuckDB oracle —
unmatched handling, deterministic ambiguity resolution, probability
normalization, planted-pair recovery."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_symspell_matches_edit_distance_one_only(spark):
    from gomapreduce_spark.operators.linkage import symspell_match

    clean = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "clean_id long, name string"
    )
    dirty = spark.createDataFrame(
        [
            (10, "alpha"),   # exact (distance 0)
            (11, "alpa"),    # deletion
            (12, "betax"),   # insertion
            (13, "gamma!"),  # insertion (punct)
            (14, "delta"),   # no reference within distance 1 -> absent
            (15, "alphaxx"), # distance 2 -> absent
        ],
        "dirty_id long, name string",
    )
    got = {r.dirty_id: (r.matched_id, r.edit_distance) for r in symspell_match(clean, dirty).collect()}
    assert got == {10: (1, 0), 11: (1, 1), 12: (2, 1), 13: (3, 1)}


def test_symspell_ambiguity_resolves_to_lowest_id(spark):
    from gomapreduce_spark.operators.linkage import symspell_match

    # "ab" is at distance 1 from both "abc" (id 7) and "abd" (id 3)
    clean = spark.createDataFrame([(7, "abc"), (3, "abd")], "clean_id long, name string")
    dirty = spark.createDataFrame([(1, "ab")], "dirty_id long, name string")
    row = symspell_match(clean, dirty).collect()[0]
    assert (row.matched_id, row.edit_distance, row.n_candidates) == (3, 1, 2)


def test_fuzzy_customer_links_covers_every_dirty_row(spark, sf_small):
    from gomapreduce_spark.operators.linkage import fuzzy_customer_links
    from gomapreduce_spark.sources.registry import load_table

    cust = load_table(spark, sf_small, "customer")
    rows = fuzzy_customer_links(cust).collect()
    # every perturbation is a single edit, so every dirty row matches
    assert len(rows) == cust.count()
    assert all(r.edit_distance == 1 for r in rows)
    # the overwhelming majority resolve to their own parent; ambiguous
    # typos resolve DETERMINISTICALLY to the lower custkey
    self_rate = sum(1 for r in rows if r.dirty_id == r.matched_id) / len(rows)
    assert self_rate > 0.8
    assert all(r.matched_id <= r.dirty_id or r.n_candidates == 1 for r in rows)


def test_transition_matrix_rows_normalize(spark, sf_small):
    from gomapreduce_spark.operators.events import event_transition_matrix
    from gomapreduce_spark.sources.registry import load_table

    rows = event_transition_matrix(load_table(spark, sf_small, "events")).collect()
    assert rows, "no transitions on the fixture?"
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.event_type, []).append(r)
    for src, rs in by_src.items():
        assert abs(sum(r.p for r in rs) - 1.0) < 1e-4, src
        assert all(r.n >= 1 for r in rs)


def test_sparse_doc_similarity_finds_planted_twin(spark):
    from gomapreduce_spark.operators.text import sparse_doc_similarity

    base = "alpha beta gamma delta epsilon zeta eta theta " * 3
    other = "one two three four five six seven eight nine ten " * 3
    tail = " extra tail tokens here now"
    # doc 5 shares the tail with doc 4 so tail grams have df >= 2 and
    # SURVIVE the rare-gram filter — otherwise 3 and 4 would be
    # identical in the kept vocabulary (by design of the df cap)
    rows = [(1, base), (2, base), (3, other), (4, other + tail), (5, tail * 4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sparse_doc_similarity(docs, max_df=10, top_k=10).collect()
    top = got[0]
    assert (top.doc_a, top.doc_b, top.cosine) == (1, 2, 1.0)
    # the 3-4 pair shares most grams but not all -> present, below 1.0
    pair34 = [r for r in got if (r.doc_a, r.doc_b) == (3, 4)]
    assert pair34 and 0.5 < pair34[0].cosine < 1.0


def test_bpe_pair_counts_planted_frequency(spark):
    from gomapreduce_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "aaaa bb", "xx", "s"), (2, "aaa cc", "xx", "s")],
        "doc_id long, text string, lang string, source string",
    )
    got = {(r.pair): (r.n, r.rank) for r in bpe_pair_counts(docs).collect()}
    # "aaaa" has 3 'aa' pairs, "aaa" has 2 -> 'aa' dominates
    assert got["aa"] == (5, 1)
    assert got["bb"] == (1, 2) and got["cc"] == (1, 3)  # tie broken by pair asc


def test_html_strip_gates_link_heavy_pages(spark):
    """The link-density gate must separate content pages from nav/menu
    chrome: a short doc (anchor text dominates the clean text) fails,
    a normal doc passes, and script/style content never leaks into the
    cleaned text hash (same doc_id parity => same clean hash)."""
    from gomapreduce_spark.operators.text import html_boilerplate_strip

    docs = spark.createDataFrame(
        [
            (1, "a reasonably long paragraph of ordinary page text " * 5, "en", "s"),
            (2, "hi", "en", "s"),  # clean text ~= the nav/footer anchors
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r.doc_id: r for r in html_boilerplate_strip(docs).collect()}
    assert got[1].kept and not got[2].kept
    assert got[1].n_links == 4 and got[1].n_tags > 20
    # script/style leak check via length arithmetic: doc 2's clean text
    # is just title + nav + "hi" + footer text (~60 chars); the script
    # and style blocks alone are ~60 chars, so any leak is visible
    assert got[2].clean_len < 70
    # and the long doc's clean text is its own text plus that same
    # fixed chrome budget — nothing more
    chrome = got[2].clean_len - len("hi")
    body = len("a reasonably long paragraph of ordinary page text " * 5)
    assert abs(got[1].clean_len - (body + chrome)) <= 2  # ws collapse slack


def test_deletion_variants_guard_empty_and_null(spark):
    """sequence(1, 0) steps DOWNWARD on an empty string ([1, 0] — two
    bogus variants) and a NULL name yields NULL variants; both inputs
    are dropped before the fan-out (advisor round-6 finding)."""
    from gomapreduce_spark.operators.linkage import deletion_variants

    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], "id long, name string"
    )
    rows = deletion_variants(df, "id", "name").collect()
    assert {r.id for r in rows} == {1}
    assert sorted(r.variant for r in rows) == ["a", "ab", "b"]
