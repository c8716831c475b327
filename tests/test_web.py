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


def test_psl_registered_domain_edges(spark):
    """The publicsuffix.org algorithm on the committed PSL slice:
    literal rules, longest-match, wildcard (*.ck), exception
    (!www.ck), host-is-a-suffix, no-rule default, and IPv4 — each
    edge the fixture-scoped lite regex cannot represent."""
    from gomapreduce_spark.operators.web import psl_rules_df, registered_domain_psl

    cases = [
        ("a.src3.co.uk", "src3.co.uk"),        # multi-label literal rule
        ("deep.sub.src4.com", "src4.com"),      # plain literal rule
        ("example.com.br", "example.com.br"),   # SLD suffix the lite rule collapses
        ("a.b.example.com.br", "example.com.br"),
        ("foo.bar.ck", "foo.bar.ck"),           # wildcard *.ck: bar.ck is a suffix
        ("www.ck", "www.ck"),                   # exception !www.ck: registrable
        ("sub.www.ck", "www.ck"),               # exception beats the wildcard
        ("co.uk", ""),                          # host IS a public suffix
        ("com", ""),
        ("localhost", ""),                      # no dot, no rule: default, too short
        ("example.fr", "example.fr"),           # 1-label ccTLD rule
        ("a.example.xyz", "example.xyz"),       # NO rule at all: implicit '*'
        ("192.168.3.4", "192.168.3.4"),         # IPv4 literal
        # -- round-12: normalization + IDN/punycode rule shapes --
        ("Example.COM.", "example.com"),        # uppercase + trailing root dot
        ("WWW.SRC3.CO.UK..", "src3.co.uk"),     # multi-dot tail, normalized idempotently
        ("a.xn--p1ai", "a.xn--p1ai"),           # punycode ccTLD rule (.рф)
        ("b.a.xn--p1ai", "a.xn--p1ai"),
        ("foo.xn--55qx5d.xn--j6w193g", "foo.xn--55qx5d.xn--j6w193g"),  # 2-label punycode rule (公司.香港)
        ("xn--55qx5d.xn--j6w193g", ""),         # host IS the punycode suffix
        ("a.xn--j6w193g", "a.xn--j6w193g"),     # bare .香港 under the TLD rule
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "doc_id long, host string"
    )
    out = registered_domain_psl(df, psl_rules_df(spark))
    got = {r.doc_id: r.registered_domain for r in out.collect()}
    for i, (host, want) in enumerate(cases):
        assert got[i] == want, (host, got[i], want)


def test_psl_vs_lite_parity_and_divergence(spark, sf_small):
    """On the synthetic fixture feed (hosts under .com / .co.uk only)
    the PSL path and the lite regex agree domain-for-domain — and on
    the PSL slice's richer shapes they provably diverge (that
    divergence is WHY the PSL variant exists)."""
    from gomapreduce_spark.operators.web import (
        domain_rollup,
        domain_rollup_psl,
        psl_rules_df,
        registered_domain_expr,
        registered_domain_psl,
    )
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    lite = {(r.registered_domain, r.n_docs, r.n_sources, r.total_chars, r.blocked)
            for r in domain_rollup(docs).collect()}
    psl = {(r.registered_domain, r.n_docs, r.n_sources, r.total_chars, r.blocked)
           for r in domain_rollup_psl(docs).collect()}
    assert lite == psl  # fixture-feed parity

    # divergence: lite collapses com.br and misreads wildcard ccTLDs
    urls = ["https://a.example.com.br/p", "https://foo.bar.ck/p"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    lite_rd = [
        r.d for r in df.select(registered_domain_expr(F.col("url")).alias("d")).orderBy("doc_id").collect()
    ]
    hosts = df.select("doc_id", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host"))
    psl_rd_map = {
        r.doc_id: r.registered_domain
        for r in registered_domain_psl(hosts, psl_rules_df(spark)).collect()
    }
    psl_rd = [psl_rd_map[i] for i in range(len(urls))]
    assert lite_rd == ["com.br", "bar.ck"]              # wrong at production scale
    assert psl_rd == ["example.com.br", "foo.bar.ck"]   # PSL-correct


def test_psl_matches_independent_reference(spark):
    """Property: the DataFrame PSL resolution equals an INDEPENDENT
    pure-python restatement of the publicsuffix.org algorithm (rules
    match right-aligned with '*' wildcarding one label; an exception
    rule prevails and registers at its own label count; else the
    longest match; else the implicit '*'; registered domain = public
    suffix + one label, '' when the host IS a suffix) over a
    hypothesis sweep of hosts built from random labels and every rule
    shape in the committed slice."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from gomapreduce_spark.operators.web import PSL_SLICE, psl_rules_df, registered_domain_psl

    def ref(host: str) -> str:
        # normalization step of the publicsuffix.org algorithm:
        # lowercase, strip trailing root dot(s) — restated here so the
        # sweep's cased/dotted hosts check the operator's version
        host = host.lower().rstrip(".")
        labels = host.split(".")
        exc_ps, lit_ps = None, None
        for raw in PSL_SLICE:
            exc = raw.startswith("!")
            rl = (raw[1:] if exc else raw).split(".")
            if len(rl) > len(labels):
                continue
            tail = labels[-len(rl):]
            if all(a == "*" or a == b for a, b in zip(rl, tail)):
                if exc:
                    exc_ps = max(exc_ps or 0, len(rl) - 1)
                else:
                    lit_ps = max(lit_ps or 0, len(rl))
        ps = exc_ps if exc_ps is not None else (lit_ps if lit_ps is not None else 1)
        return ".".join(labels[-(ps + 1):]) if len(labels) > ps else ""

    rules = psl_rules_df(spark)
    label = st.from_regex(r"[a-z]{1,8}", fullmatch=True)
    suffix = st.sampled_from(
        [r.lstrip("!").replace("*", "x") for r in PSL_SLICE]  # every rule shape, wildcard instantiated
        + ["ck", "www.ck", "sub.www.ck", "foo.bar.ck", "xyz", "a.b.xyz"]
    )
    # decorate ~half the hosts with the normalization hazards the
    # operator must erase: random casing and a trailing root dot
    # (PSL_SLICE's xn-- rows flow into `suffix` automatically, so
    # punycode shapes are swept without special-casing)
    host_st = st.builds(
        lambda pre, suf, up, dot: (
            (".".join(pre + [suf]) if pre else suf).upper() if up else
            (".".join(pre + [suf]) if pre else suf)
        ) + ("." if dot else ""),
        st.lists(label, min_size=0, max_size=3),
        suffix,
        st.booleans(),
        st.booleans(),
    )

    @settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(host_st, min_size=1, max_size=25, unique=True))
    def sweep(hosts):
        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(hosts)], "doc_id long, host string"
        )
        got = {
            r.doc_id: r.registered_domain
            for r in registered_domain_psl(df, rules).collect()
        }
        for i, h in enumerate(hosts):
            assert got[i] == ref(h), (h, got[i], ref(h))

    sweep()


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
