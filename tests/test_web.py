"""URL/domain governance: canonicalization branch semantics on
crafted URLs (each transform pinned individually), registered-domain
extraction edges, and blocklist enforcement. The fixture-scale
hash-oracle lives in queries.py; these tests pin the operator
contracts the oracle can't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _canon(spark, urls):
    from gomapreduce_spark.operators.web import canonical_url_expr

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url_expr(F.col("url")).alias("c")).collect()]


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        # scheme + host lowercase; PATH case preserved
        ("HTTPS://WWW.Example.COM/Articles/X", "https://example.com/Articles/X"),
        # default port stripped per scheme; explicit port kept
        ("https://a.com:443/p", "https://a.com/p"),
        ("http://a.com:80/p", "http://a.com/p"),
        ("http://a.com:443/p", "http://a.com:443/p"),  # 443 is NOT http's default
        ("https://a.com:8080/p", "https://a.com:8080/p"),
        # fragment dropped
        ("https://a.com/p#Section2", "https://a.com/p"),
        # tracking params: leading, trailing, middle; separators healed
        ("https://a.com/p?utm_source=x&id=3", "https://a.com/p?id=3"),
        ("https://a.com/p?id=3&utm_campaign=y&ref=tw", "https://a.com/p?id=3"),
        ("https://a.com/p?utm_source=x", "https://a.com/p"),
        ("https://a.com/p?a=1&gclid=z&b=2", "https://a.com/p?a=1&b=2"),
        # 'ref' strips; 'referrer' (prefix collision) survives
        ("https://a.com/p?referrer=x", "https://a.com/p?referrer=x"),
        # trailing slash dropped; www under m. NOT stripped (not a prefix)
        ("https://m.a.com/dir/", "https://m.a.com/dir"),
        ("https://www.a.co.uk/", "https://a.co.uk"),
        # PATH trailing slash strips even ahead of a query…
        ("https://a.com/p/?id=3", "https://a.com/p?id=3"),
        # …but a slash ending a QUERY VALUE is content and survives
        ("https://a.com/p?next=/", "https://a.com/p?next=/"),
        # not URL-shaped: pass through untouched (no manufactured '://')
        ("example.com/path", "example.com/path"),
        ("/relative/only", "/relative/only"),
        # '&' is LEGAL inside a path segment: a literal '&ref=' or
        # '&utm_x=' in the PATH must survive — tracking removal runs
        # over the query only (round-11 advisor fix; the old
        # path+query-as-one-string form ate '/a&ref=x/p' down to '/a')
        ("https://a.com/a&ref=x/p", "https://a.com/a&ref=x/p"),
        ("https://a.com/x&utm_s=1/y?utm_a=2", "https://a.com/x&utm_s=1/y"),
        ("https://a.com/a&gclid=q/p?id=3&ref=t", "https://a.com/a&gclid=q/p?id=3"),
    ],
)
def test_canonical_branches(spark, raw, want):
    assert _canon(spark, [raw]) == [want]


def test_registered_domain_edges(spark):
    from gomapreduce_spark.operators.web import registered_domain_expr

    cases = [
        ("https://a.src3.co.uk/p", "src3.co.uk"),   # multi-part suffix: 3 labels
        ("https://deep.sub.src4.com/p", "src4.com"),  # plain suffix: 2 labels
        ("https://src5.com", "src5.com"),
        ("https://localhost/p", ""),                 # no dot: unparseable, '' not NULL
        ("https://x.ac.jp:8080/p", "x.ac.jp"),       # port never leaks into the domain
        # an IPv4 literal is its own registered domain (blocklists
        # carry raw IPs; the label-suffix rule would emit '3.4')
        ("https://192.168.3.4/p", "192.168.3.4"),
        ("http://10.0.0.7:8080/x", "10.0.0.7"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "canonical string")
    got = [
        r.d
        for r in df.select(
            registered_domain_expr(F.col("canonical")).alias("d")
        ).collect()
    ]
    assert got == [w for _, w in cases]
    assert all(g is not None for g in got)


def test_synth_urls_deterministic_and_branch_covering(spark, sf_small):
    from gomapreduce_spark.operators.web import synth_doc_urls
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    a = sorted(r.url for r in synth_doc_urls(docs).select("url").collect())
    b = sorted(r.url for r in synth_doc_urls(docs).select("url").collect())
    assert a == b
    joined = "\n".join(a)
    # every canonicalization branch must have real exercise in the feed
    for marker in ("HTTPS://", "http://", "WWW.", "m.", ".co.uk", ".com",
                   ":443", ":8080", "?utm_source=", "&utm_campaign=", "#Section2"):
        assert marker in joined, marker


def test_blocklist_filter_drops_only_blocked(spark, sf_small):
    from gomapreduce_spark.operators.web import (
        blocklist_filter,
        domain_rollup,
        url_canonicalize,
    )
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    all_rows = url_canonicalize(docs)
    kept = blocklist_filter(docs)
    dropped = all_rows.count() - kept.count()
    rollup = {r.registered_domain: r for r in domain_rollup(docs).collect()}
    blocked_docs = sum(r.n_docs for r in rollup.values() if r.blocked)
    assert dropped == blocked_docs > 0
    # the rollup's blocked flag is EXACTLY blocklist membership — no
    # domain flagged that isn't listed, none listed-and-present missed
    from gomapreduce_spark.operators.web import DEFAULT_BLOCKLIST

    assert {d for d, r in rollup.items() if r.blocked} == (
        set(DEFAULT_BLOCKLIST) & set(rollup)
    )
    kept_domains = {r.registered_domain for r in kept.collect()}
    assert all(not rollup[d].blocked for d in kept_domains)


def test_domain_rollup_accounts_every_doc(spark, sf_small):
    from gomapreduce_spark.operators.web import domain_rollup
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    rows = domain_rollup(docs).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    # registered domains never NULL (governance must count unparseable
    # hosts, not drop them)
    assert all(r.registered_domain is not None for r in rows)


def test_canonicalization_idempotent(spark):
    """canon(canon(u)) == canon(u): re-canonicalizing an already-clean
    catalog must be a no-op (the repetition-safe '(www\\.)+' / '/+$'
    forms exist exactly for this — single-step variants drift on
    'www.www.' hosts and '//' tails). Checked on the crafted traps, a
    hypothesis sweep of URL-shaped strings, and the full synthetic
    corpus feed."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from gomapreduce_spark.operators.web import canonical_url_expr, synth_doc_urls
    from gomapreduce_spark.sources.registry import load_table

    def canon_once(vals):
        df = spark.createDataFrame([(u,) for u in vals], "url string")
        return [r.c for r in df.select(canonical_url_expr(F.col("url")).alias("c")).collect()]

    traps = [
        "https://www.www.a.com/x//",
        "HTTP://WWW.WWW.WWW.b.co.uk:80///",
        "https://a.com/p?utm_a=1&utm_b=2#f/",
        "https://www.a.com:443/?ref=x",
        "scheme-less.com/x//",  # pass-through must not grow '://'
        "https://a.com/p//?next=/",  # path slash strips, query slash stays
    ]
    once = canon_once(traps)
    assert canon_once(once) == once

    host = st.from_regex(r"(www\.){0,2}[a-z]{1,6}(\.[a-z]{2,3}){1,2}", fullmatch=True)
    tail = st.from_regex(
        r"(:\d{2,4})?(/[A-Za-z0-9]{0,5}){0,3}/{0,2}"
        r"(\?(utm_[a-z]{1,4}|ref|id|q)=[A-Za-z0-9]{0,4}(&(utm_[a-z]{1,4}|ref|id|q)=[A-Za-z0-9]{0,4}){0,3})?"
        r"(#[A-Za-z0-9]{0,4})?",
        fullmatch=True,
    )

    @settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.tuples(st.sampled_from(["http", "HTTPS", "https"]), host, tail),
                    min_size=1, max_size=8))
    def sweep(parts):
        urls = [f"{s}://{h}{t}" for s, h, t in parts]
        c1 = canon_once(urls)
        assert canon_once(c1) == c1

    sweep()

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = canon_once([r.url for r in synth_doc_urls(docs).select("url").collect()])
    assert canon_once(corpus) == corpus
