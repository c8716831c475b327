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
    assert not any(r.blocked for d, r in rollup.items() if d not in rollup or not r.blocked)
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
