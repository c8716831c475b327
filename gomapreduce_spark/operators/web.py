"""URL / domain governance: the C4 / CCNet-style domain-level hygiene
stage of a web-scale training-data pipeline — canonicalize every
document's URL, roll quality/volume up to the REGISTERED domain (the
unit moderation decisions are made at), and enforce a domain
blocklist before anything downstream trains on the text.

The reference engine has no web stage (its sole connector is S3,
s3_utils.go:39-107); this family is part of the repo's mandated
LLM-data-pipeline surface, like dedup/ANN/quality. The fixture ships
no URL column, so :func:`synth_doc_urls` derives a deterministic one
per document (the ``synth_corpus_snapshot`` / ``synth_customer_changes``
synthetic-feed recipe) that exercises every canonicalization branch;
every expression stays inside the shared Java-regex ∩ RE2 subset so
the plain-SQL DuckDB oracle reproduces the strings byte-for-byte.

Scale shape: canonicalization is ROW-LEVEL string rewriting — one
narrow scan, zero shuffles, whole-stage-codegen'd JVM regexps (never
Python). The rollup is one partial+final aggregate keyed on the
registered domain (bounded by the web's domain count, not the corpus,
so the reduced side is millions of rows at 100 TB — trivially
shuffle-safe). The blocklist is a catalog-bounded artifact (thousands
of rows at production scale), so the filter join broadcasts it —
a LEFT ANTI broadcast hash join: the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Registered-domain blocklist default — a catalog artifact in
# production (swap in the real list); chosen here to hit both TLD
# branches of the synthetic feed plus one absent domain, so tests and
# oracles see hits AND misses.
DEFAULT_BLOCKLIST = ["src3.com", "src7.co.uk", "src13.com", "badsite.example"]

# Tracking query parameters stripped by canonicalization (the C4/
# CCNet hygiene set): analytics attribution noise that makes one page
# look like many distinct URLs.
_TRACKING = r"(utm_[a-z]+|ref|fbclid|gclid)"

# public-suffix-lite: multi-part suffixes where the registered domain
# is the LAST THREE labels (a real deployment ships the full Mozilla
# public-suffix list as a broadcast dim; the regex keeps the fixture
# path oracle-expressible)
_MULTIPART_SUFFIX = r"([^.]+\.(?:co|ac|gov)\.[a-z]+)$"


def synth_url_expr() -> Column:
    """The synthetic URL as a plain Column expression over (doc_id,
    source) — the single source of truth :func:`synth_doc_urls`
    projects and composed pipelines (corpus_ingest_e2e's admission
    flag) inline into their own scan."""
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    scheme = (
        F.when(did % 3 == 0, F.lit("HTTPS"))
        .when(did % 3 == 1, F.lit("http"))
        .otherwise(F.lit("https"))
    )
    sub = F.when(did % 4 == 0, F.lit("WWW.")).when(did % 4 == 1, F.lit("m.")).otherwise(F.lit(""))
    host = F.when(did % 2 == 0, F.upper("source")).otherwise(F.col("source"))
    tld = F.when(did % 5 < 2, F.lit(".co.uk")).otherwise(F.lit(".com"))
    port = F.when(did % 6 == 0, F.lit(":443")).when(did % 6 == 3, F.lit(":8080")).otherwise(F.lit(""))
    path = F.concat(F.lit("/Articles/"), s(did % 50))
    slash = F.when(did % 7 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(did % 2 == 0, F.concat(F.lit("?utm_source=feed&id="), s(did % 9)))
        .when(did % 5 == 1, F.concat(F.lit("?id="), s(did % 9), F.lit("&utm_campaign=news&ref=tw")))
        .otherwise(F.lit(""))
    )
    frag = F.when(did % 3 == 2, F.lit("#Section2")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), sub, host, tld, port, path, slash, query, frag)


def synth_doc_urls(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic URL per document — a pure function of
    (doc_id, source) reproducible in ANSI SQL, covering every branch
    the canonicalizer handles: mixed-case scheme and host, ``WWW.`` /
    ``m.`` subdomains, multi-part (``.co.uk``) and plain (``.com``)
    suffixes, default (``:443``) and explicit (``:8080``) ports,
    trailing slashes, tracking parameters in leading and trailing
    query positions, and fragments."""
    return docs.withColumn("url", synth_url_expr())


def _auth_parts(url: Column) -> tuple[Column, Column, Column]:
    """(lower scheme, lower authority, rest) of a fragment-stripped
    URL. Authority = host[:port]; rest = path + query."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", "")
    return scheme, auth, rest


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of a URL column, entirely in JVM regexps (no
    UDF): drop the fragment; lowercase scheme and authority (path and
    query case are significant and preserved); strip a ``www.``
    prefix; strip the scheme's DEFAULT port only (``:80`` for http,
    ``:443`` for https — an explicit ``:8080`` is a different origin
    and stays); remove tracking query parameters (``utm_*``, ``ref``,
    ``fbclid``, ``gclid``) wherever they sit in the query string,
    healing the ``?``/``&`` separators; drop trailing slashes from the
    PATH (never from a query value — '?next=/' keeps its slash).

    A string with no ``scheme://`` prefix passes through UNCHANGED
    (canonicalizing what we cannot parse would corrupt it — the old
    behavior manufactured '://…' and grew on every application); such
    rows carry registered_domain '' downstream, so governance COUNTS
    them (domain_rollup) rather than judging them — normalize
    scheme-less records at ingest if they must face the blocklist."""
    scheme, auth, rest = _auth_parts(url)
    # repetition-safe forms ('(www\.)+', '/+$') keep the transform
    # IDEMPOTENT — canon(canon(u)) == canon(u) — so re-canonicalizing
    # an already-clean catalog is a no-op, not a drift source
    # (property-tested); the single-step '^www\.' / '/$' variants break
    # that on 'www.www.' hosts and '//' tails
    auth = F.regexp_replace(auth, r"^(www\.)+", "")
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    # split rest into PATH and QUERY at the first '?' FIRST (no
    # lookbehind — RE2 has none), then transform each side on its own:
    # tracking-param removal must never see the path ('&' is legal
    # inside a path segment, e.g. '/a&ref=x/p' — running the strip over
    # path+query as one string would eat that segment), and the
    # trailing-slash strip must never see the query (a slash ending a
    # QUERY VALUE, '?next=/', distinguishes real pages)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    qs = F.regexp_replace(rest, r"^[^?]*", "")
    # tracking params, QUERY side only: '&p=v' anywhere, then a leading
    # '?p=v&' (keeps the '?' for survivors), then a lone '?p=v' at end
    qs = F.regexp_replace(qs, rf"&{_TRACKING}=[^&#]*", "")
    qs = F.regexp_replace(qs, rf"\?{_TRACKING}=[^&#]*&", "?")
    qs = F.regexp_replace(qs, rf"\?{_TRACKING}=[^&#]*$", "")
    return F.when(
        scheme == "", url  # not URL-shaped: pass through, stay idempotent
    ).otherwise(F.concat(scheme, F.lit("://"), auth, path, qs))


def registered_domain_expr(canonical: Column) -> Column:
    """Registered domain of a CANONICAL url (lowercased, www-less):
    last three labels under a multi-part public suffix (``co.uk`` …),
    else last two. An IPv4-literal host IS its own registered domain
    (a label-suffix rule would blocklist '3.4' instead of the actual
    address — crawl blocklists carry raw IPs). Unparseable hosts
    yield '' (kept, never NULL — a governance rollup must count them,
    not drop them). Two documented fixture-scale simplifications of
    the lite rule: (a) 2-letter country TLDs outside co/ac/gov
    collapse to two labels ('example.com.br' → 'com.br'); (b) a host
    whose registered domain itself starts with 'www' is mangled
    upstream — canonicalization strips '(www.)+', so 'www.com'
    becomes 'com' and lands in the '' bucket, silently EXEMPT from
    the blocklist. Production deployments must use the broadcast
    public-suffix-list variant (:func:`registered_domain_psl_expr` /
    ``domain_rollup(..., psl=...)``) which both cases motivate."""
    host = F.regexp_extract(canonical, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    ipv4 = F.regexp_extract(host, r"^(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})$", 1)
    rd3 = F.regexp_extract(host, _MULTIPART_SUFFIX, 1)
    rd2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(ipv4 != "", ipv4).when(rd3 != "", rd3).otherwise(rd2)


# Committed public-suffix-list slice (publicsuffix.org format, public
# data): enough of the real list to exercise every rule shape the
# algorithm must handle — plain multi-label suffixes, 2-letter country
# TLDs whose SLDs are suffixes (com.br — the lite regex collapses
# these), wildcard rules (*.ck: EVERY label under ck is a public
# suffix) and their exceptions (!www.ck: www.ck is registrable).
# Production swaps in the full ~10k-row Mozilla list — same broadcast
# dim, same algorithm, zero code change.
PSL_SLICE = [
    "com", "org", "net", "edu", "gov", "io", "info", "biz",
    "uk", "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "jp", "ac.jp", "co.jp", "go.jp", "or.jp", "ne.jp",
    "br", "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "in", "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "nz", "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    "za", "co.za", "net.za", "org.za", "ac.za", "gov.za",
    "ar", "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "mx", "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "tr", "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "cn", "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "kr", "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr",
    "pl", "com.pl", "net.pl", "org.pl", "gov.pl", "edu.pl",
    "ru", "com.ru", "org.ru", "net.ru",
    "fr", "de", "it", "es", "nl", "se", "no", "fi", "ch", "at", "be",
    "ck", "*.ck", "!www.ck",
    "bd", "*.bd",
    "kw", "*.kw", "com.kw", "edu.kw", "gov.kw",
    "er", "*.er",
    "jm", "*.jm",
    # IDN ccTLDs in ACE (punycode) form — REAL rows of the public
    # list, covering the xn-- rule shapes: a bare punycode TLD
    # (xn--p1ai = .рф, xn--fiqs8s = .中国) and multi-label rules whose
    # EVERY label is punycode (公司.香港 / 網絡.香港 under .香港). The
    # list publishes IDN rules in both forms; the matcher operates on
    # the ACE form — hosts arrive ACE-encoded from URL parsing (RFC
    # 3986 hosts are ASCII), and a custom PSL's Unicode rows must be
    # idna-encoded once at load (a catalog-side transform, not a
    # per-row cluster op).
    "xn--p1ai",
    "xn--fiqs8s",
    "xn--j6w193g", "xn--55qx5d.xn--j6w193g", "xn--od0alg.xn--j6w193g",
]

_PSL_MAX_LABELS = 6  # longest rule in the full Mozilla list is 5 labels


def psl_rules_df(spark, psl: list[str] | None = None) -> DataFrame:
    """The public-suffix list as a broadcast-sized rules dim:
    (rule, n_labels, is_exception). Exception rules are stored with
    the '!' stripped; wildcard rules keep their literal '*.' head (the
    candidate generator below emits star-headed candidates to match
    them with a plain equi-join — no LIKE, no UDF)."""
    rows = []
    for raw in psl if psl is not None else PSL_SLICE:
        exc = raw.startswith("!")
        rule = raw[1:] if exc else raw
        rows.append((rule, rule.count(".") + 1, exc))
    return spark.createDataFrame(rows, "rule string, n_labels int, is_exception boolean")


def registered_domain_psl(
    keyed: DataFrame, rules: DataFrame, host_col: str = "host", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """PSL-exact registered domain for a host column — the production
    replacement for :func:`registered_domain_expr`'s fixture-scoped
    regex, implementing the publicsuffix.org algorithm as pure
    DataFrame ops: explode each host into its ≤2·min(labels, 6)
    label-suffix candidates (literal + star-headed per length), ONE
    broadcast equi-join against the rules dim, then per-host rule
    resolution (an exception rule prevails and registers at
    rule_labels−1; else the longest matching rule; else the implicit
    '*' default, 1 label). Registered domain = public suffix + one
    label; a host that IS a public suffix registers '' (kept, never
    NULL — same governance contract as the lite rule); IPv4 literals
    are their own registered domain.

    Host normalization (publicsuffix.org algorithm step 1): the host
    is lowercased and trailing root dots stripped BEFORE candidate
    generation ('Example.COM.' registers example.com), and the
    returned ``host_col`` is the NORMALIZED form — the form every
    downstream rollup/blocklist key must use. IDN hosts must arrive
    ACE-encoded (``xn--…``), which URL-parsed crawl hosts already are
    (RFC 3986 authorities are ASCII); matching runs on the ACE form
    against ACE rules (see the xn-- rows of PSL_SLICE).

    Precondition: ``id_cols`` MUST uniquely identify input rows — the
    resolve aggregate reduces each id group to one row, so duplicate
    ids would silently merge distinct hosts' candidate sets and
    resolve against their union. Payload columns are carried through
    as min(struct(payload)) so even then the payload values stay
    row-consistent (never mixed across rows column-by-column), but
    the registered domain for a duplicated id is not meaningful.

    Scale shape: the fan-out is a bounded ≤12-row explode per host,
    the PSL join broadcasts the ~10k-row rules dim with a LEFT join
    (so rule-less hosts like 'localhost' survive to the implicit '*'
    default), and the resolve is ONE partial+final max-aggregate
    keyed on the id that carries the host and any extra payload
    columns through — there is NO join back to the corpus, so the
    only corpus-keyed shuffle is that single agg. Keep the payload
    narrow (ids + rollup scalars); for wide payloads
    (text/embeddings) resolve on a projected slice and join back on
    the id instead."""
    # '\.+$' (not '\.$') keeps normalization IDEMPOTENT on malformed
    # multi-dot tails, the canonical_url_expr doctrine
    h = F.lower(F.regexp_replace(F.col(host_col), r"\.+$", ""))
    payload = [c for c in keyed.columns if c not in id_cols and c != host_col]
    n = F.size(F.split(h, r"\."))
    cand_i = F.explode(F.sequence(F.lit(1), F.least(n, F.lit(_PSL_MAX_LABELS)))).alias("i")
    # substring_index via expr: the python wrapper pins count to a
    # literal int, but the catalyst function takes any expression
    exploded = keyed.select(
        *id_cols, h.alias("__host"), *payload, cand_i
    ).withColumn(
        "cand",
        F.explode(
            F.array(
                F.expr("substring_index(__host, '.', -i)"),
                F.when(
                    F.col("i") >= 2,
                    F.concat(F.lit("*."), F.expr("substring_index(__host, '.', -(i - 1))")),
                ),
            )
        ),
    )
    # LEFT join: unmatched candidates carry NULL rule metadata and
    # resolve to the default below (NULL star-candidates at i=1 and
    # never-matching literal candidates just contribute NULL rows)
    matched = exploded.join(F.broadcast(rules), F.col("cand") == F.col("rule"), "left")
    # payload rides as ONE min(struct(...)): under the documented
    # uniqueness precondition this equals per-column min, and if the
    # precondition is ever violated the payload values still come from
    # a single row instead of being min'd independently per column
    pay_agg = (
        [F.min(F.struct(*payload)).alias("__pay")] if payload else []
    )
    resolved = matched.groupBy(*id_cols).agg(
        F.max(F.when(F.col("is_exception"), F.col("n_labels") - 1)).alias("__exc_ps"),
        F.max(F.when(~F.col("is_exception"), F.col("n_labels"))).alias("__lit_ps"),
        F.min("__host").alias("__host"),
        *pay_agg,
    ).withColumn("__ps", F.coalesce("__exc_ps", "__lit_ps", F.lit(1)))
    if payload:
        resolved = resolved.select(
            *id_cols, "__exc_ps", "__lit_ps", "__host", "__ps",
            *[F.col(f"__pay.{c}").alias(c) for c in payload],
        )
    hh = F.col("__host")
    ipv4 = F.regexp_extract(hh, r"^(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})$", 1)
    nn = F.size(F.split(hh, r"\."))
    rd = (
        F.when(ipv4 != "", ipv4)
        .when(nn > F.col("__ps"), F.expr("substring_index(__host, '.', -(__ps + 1))"))
        .otherwise(F.lit(""))
    )
    return resolved.withColumn("registered_domain", rd).withColumn(
        host_col, hh
    ).drop("__exc_ps", "__lit_ps", "__ps", "__host")


def domain_rollup_psl(
    docs: DataFrame, blocklist: list[str] | None = None, psl: list[str] | None = None
) -> DataFrame:
    """:func:`domain_rollup` with the registered domain resolved by the
    broadcast public-suffix list instead of the fixture-scoped regex —
    the variant a production deployment runs (the lite rule collapses
    'example.com.br' to 'com.br' and mis-registers wildcard ccTLDs;
    the PSL path handles both, divergence pinned in tests). Same
    output shape and blocked flag; one extra broadcast join + one
    keyed agg over the lite plan."""
    spark = docs.sparkSession
    bl = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    canon = canonical_url_expr(F.col("url"))
    keyed = synth_doc_urls(docs).select(
        "doc_id",
        "source",
        "n_chars",
        F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1).alias("host"),
    )
    rd = registered_domain_psl(keyed, psl_rules_df(spark, psl))
    return (
        rd.groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .withColumn("blocked", F.col("registered_domain").isin(bl))
    )


def url_canonicalize(docs: DataFrame) -> DataFrame:
    """Per-document URL hygiene: raw url → canonical url + registered
    domain. Row-level (one narrow scan, zero shuffle, all codegen'd
    regexps); this is the normalization every dedup-by-URL and
    domain-rollup stage keys on — without it one page counts as many
    (tracking params, casing, www, default ports)."""
    with_urls = synth_doc_urls(docs)
    canon = canonical_url_expr(F.col("url"))
    return with_urls.select(
        "doc_id",
        "url",
        canon.alias("canonical_url"),
        registered_domain_expr(canon).alias("registered_domain"),
    )


def domain_rollup(docs: DataFrame, blocklist: list[str] | None = None) -> DataFrame:
    """Registered-domain governance rollup: docs, distinct sources,
    total chars, and blocklist status per registered domain — the
    table a corpus curator reads before admitting a crawl (C4 dropped
    whole domains off exactly this view).

    One narrow scan + ONE partial+final aggregate; the blocked flag
    is a literal IN over the bounded blocklist, evaluated pre-shuffle
    so the rollup is a single exchange keyed on the domain (domain
    count is web-bounded, millions of groups at 100 TB — the 8-byte
    key shuffle is the reduced side, never the corpus text)."""
    bl = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    canon = canonical_url_expr(F.col("url"))
    return (
        synth_doc_urls(docs)
        .select(
            registered_domain_expr(canon).alias("registered_domain"),
            "source",
            "n_chars",
        )
        .groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .withColumn("blocked", F.col("registered_domain").isin(bl))
    )


def blocklist_pass_expr(blocklist: list[str] | None = None) -> Column:
    """The blocklist admission verdict (registered domain of the
    canonical synthetic URL NOT blocklisted) as a boolean Column over
    (doc_id, source) — the same decision :func:`blocklist_filter`'s
    anti-join makes, as an expression composed pipelines
    (corpus_ingest_e2e) inline into their own scan. ``isin`` over the
    catalog-bounded list is the :func:`domain_rollup` convention;
    ``registered_domain_expr`` yields '' (never NULL) for unparseable
    hosts, so the NOT is total. An explicitly EMPTY blocklist
    short-circuits to literal true: ``isin([])`` builds an empty IN
    whose semantics differ across Spark versions, while
    :func:`blocklist_filter`'s left-anti join against an empty dim
    keeps every row — the expression must match that."""
    bl = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    if not bl:
        return F.lit(True)
    canon = canonical_url_expr(synth_url_expr())
    return ~registered_domain_expr(canon).isin(bl)


def blocklist_filter(docs: DataFrame, blocklist: list[str] | None = None) -> DataFrame:
    """Domain blocklist enforcement: keep only documents whose
    registered domain is NOT blocklisted — the admission filter that
    runs before dedup/training. Shipped as a LEFT ANTI join against
    the blocklist dim (broadcast: the blocklist is catalog-bounded —
    thousands of rows in production — never SF-scaling, so the hint
    is structurally safe and the corpus side never shuffles)."""
    spark = docs.sparkSession
    bl = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    dim = spark.createDataFrame([(d,) for d in bl], "registered_domain string")
    canon = canonical_url_expr(F.col("url"))
    keyed = synth_doc_urls(docs).select(
        "doc_id",
        canon.alias("canonical_url"),
        registered_domain_expr(canon).alias("registered_domain"),
    )
    return keyed.join(F.broadcast(dim), "registered_domain", "left_anti").select(
        "doc_id", "canonical_url", "registered_domain"
    )
