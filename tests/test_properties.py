"""Property-based tests (hypothesis): randomized inputs against
invariants, the testing dimension the reference lacks entirely
(SURVEY §5 — its only e2e check was "job completed").

Each property runs a handful of examples (Spark round-trips are ~100ms
each); the generators bias toward edge cases: empty strings, single
tokens, duplicate texts, identical timestamps.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gomapreduce_spark.operators import dedup, events, wordcount

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(alphabet=" abcx", min_size=0, max_size=30), min_size=1, max_size=10
)


@given(docs=texts)
@settings(**SETTINGS)
def test_mr_facade_matches_dataframe_wordcount(spark, docs):
    """The MapReduce facade (Mapper/Reducer over RDDs, reference
    semantics) and the DataFrame wordcount must agree on any input."""
    from gomapreduce_spark.mapreduce import (
        DataFrameInputer,
        DemoMapper,
        DemoReducer,
        JobConfig,
        MapReduceEngine,
        MemoryOutputer,
    )

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = MemoryOutputer()
    eng = MapReduceEngine(spark)
    job_id = eng.submit(JobConfig(m=2, r=2), DemoMapper(), DemoReducer(), DataFrameInputer(df, "doc_id", "text"), out, sync=True)
    assert eng.status(job_id)
    facade = {(k, int(v)) for k, v in out.results.items()}
    df_counts = {
        (r["word"], r["cnt"]) for r in wordcount.word_count(df).collect()
    }
    assert facade == df_counts


@given(
    ts_offsets=st.lists(st.integers(min_value=0, max_value=7200), min_size=1, max_size=20),
    n_users=st.integers(min_value=1, max_value=3),
)
@settings(**SETTINGS)
def test_sessionize_conservation(spark, ts_offsets, n_users):
    """Sessionization conserves events: sum(total_events) == |events|;
    every user present gets >= 1 session; max <= total per user."""
    base = 1_704_067_200  # 2024-01-01 UTC
    rows = [(i, i % n_users, base + o, float(o)) for i, o in enumerate(ts_offsets)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, epoch long, value double").withColumn(
        "ts", F.timestamp_seconds("epoch")
    )
    out = events.sessionize(df).collect()
    assert sum(r["total_events"] for r in out) == len(rows)
    assert {r["user_id"] for r in out} == {i % n_users for i in range(len(rows))}
    for r in out:
        assert 1 <= r["max_session_events"] <= r["total_events"]
        assert r["n_sessions"] >= 1


@given(docs=st.lists(st.sampled_from(["a b c d", "a b c e", "x y z w", ""]), min_size=2, max_size=12))
@settings(**SETTINGS)
def test_exact_dedup_partitions_corpus(spark, docs):
    """exact_dedup's copy counts must partition the corpus: sum of
    n_copies == |docs|, one group per distinct text, keep_id is the min
    doc_id of its group."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = dedup.exact_dedup(df).collect()
    assert sum(r["n_copies"] for r in out) == len(docs)
    assert len(out) == len(set(docs))
    firsts = {}
    for i, t in enumerate(docs):
        firsts.setdefault(t, i)
    assert sorted(r["keep_id"] for r in out) == sorted(firsts.values())


@given(
    event_offsets=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=15),
    order_offsets=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=10),
)
@settings(**SETTINGS)
def test_asof_join_matches_naive(spark, event_offsets, order_offsets):
    """The union+last_value as-of join must agree with a naive python
    as-of on random data — including exact timestamp ties between
    events and orders (inclusive <=) and duplicate order dates per
    customer (max-orderkey tie-break)."""
    from gomapreduce_spark.operators.events import asof_join_orders

    base = 1_704_067_200
    events = spark.createDataFrame(
        [(i, 0, base + o) for i, o in enumerate(event_offsets)],
        "event_id long, user_id long, epoch long",
    ).withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
    orders = spark.createDataFrame(
        [(100 + i, 0, base + o, float(100 + i)) for i, o in enumerate(order_offsets)],
        "o_orderkey long, o_custkey long, epoch long, o_totalprice double",
    ).withColumn("o_orderdate", F.timestamp_seconds("epoch").cast("timestamp_ntz")).drop("epoch")
    got = {
        (r["event_id"], r["o_orderkey"]) for r in asof_join_orders(events, orders).collect()
    }
    want = set()
    for ei, eo in enumerate(event_offsets):
        elig = [(oo, 100 + oi) for oi, oo in enumerate(order_offsets) if oo <= eo]
        if elig:
            best_date = max(o for o, _ in elig)
            best_key = max(k for o, k in elig if o == best_date)
            want.add((ei, best_key))
    assert got == want


@given(docs=texts)
@settings(**SETTINGS)
def test_winnow_fingerprints_vs_python(spark, docs):
    """Winnowing must equal a direct python implementation of the
    same scheme (min per w-window over k-gram hashes, distinct)."""
    import hashlib

    from gomapreduce_spark.operators import text as text_ops

    k, w = 8, 4

    def py_h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expected = set()
    for i, t in enumerate(docs):
        n_grams = max(len(t) - (k - 1), 1)
        hashes = [py_h64(t[j : j + k]) for j in range(n_grams)]
        for start in range(max(n_grams - w, 0) + 1):
            expected.add((i, min(hashes[start : start + w])))
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {(r["doc_id"], r["fingerprint"]) for r in text_ops.winnow_fingerprints(df).collect()}
    assert got == expected


@given(docs=texts)
@settings(**SETTINGS)
def test_gopher_rules_word_accounting(spark, docs):
    """n_words must equal the shared tokenizer's count and keep must be
    0 for any sub-50-word doc (the fixture alphabet can't pass the
    bound by accident)."""
    from gomapreduce_spark.operators import text as text_ops
    from gomapreduce_spark.operators.wordcount import py_tokenize

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_ops.gopher_rules(df).collect()}
    assert set(out) == set(range(len(docs)))
    for i, t in enumerate(docs):
        assert out[i]["n_words"] == len(py_tokenize(t))
        if out[i]["n_words"] < 50:
            assert out[i]["keep"] == 0


@given(docs=texts)
@settings(**SETTINGS)
def test_repetition_stats_bounds(spark, docs):
    """Fractions live in (0,1]; sum/max/distinct accounting must agree
    with a direct python count of each doc's bigrams."""
    from collections import Counter

    from gomapreduce_spark.operators import text as text_ops
    from gomapreduce_spark.operators.wordcount import py_tokenize

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_ops.repetition_stats(df).collect()}
    for i, t in enumerate(docs):
        toks = py_tokenize(t)
        bigrams = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        if len(toks) < 2:
            assert i not in out
            continue
        r = out[i]
        assert r["n_bigrams"] == sum(bigrams.values())
        assert r["n_distinct_bigrams"] == len(bigrams)
        assert abs(r["top_bigram_frac"] - max(bigrams.values()) / sum(bigrams.values())) < 1e-6


@given(
    n_tokens=st.integers(min_value=0, max_value=120),
    chunk_size=st.integers(min_value=2, max_value=32),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(**SETTINGS)
def test_chunk_documents_invariants(spark, n_tokens, chunk_size, overlap_frac):
    """For any (doc length, chunk size, overlap): chunks cover every
    token in order, every chunk except possibly the last is full-size,
    and re-joining chunk k's suffix with chunk k+1's prefix reproduces
    the original token stream."""
    from gomapreduce_spark.operators import text as text_ops

    overlap = min(int(chunk_size * overlap_frac), chunk_size - 1)
    stride = chunk_size - overlap
    toks = [f"w{i}" for i in range(n_tokens)]
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    out = sorted(
        (r["chunk_id"], r["chunk_text"].split(" "))
        for r in text_ops.chunk_documents(docs, chunk_size, overlap).collect()
    )
    if n_tokens == 0:
        assert out == []
        return
    # stitch: first chunk whole, then the non-overlapping tail of each
    stitched = list(out[0][1]) if out else []
    for _, c in out[1:]:
        stitched.extend(c[overlap:])
    assert stitched == toks
    for _, c in out:
        assert len(c) <= chunk_size
    for _, c in out[:-1]:
        # the start grid stops at n - overlap - 1, which makes every
        # non-last chunk exactly full (n - s >= chunk_size + 1 there)
        assert len(c) == chunk_size


@given(
    token_counts=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=12),
    budget=st.integers(min_value=5, max_value=80),
)
@settings(**SETTINGS)
def test_pack_training_sequences_conservation(spark, token_counts, budget):
    """Packing conserves docs and tokens, sequence ids are dense from 0
    within a shard, and every sequence except the last starts strictly
    inside the budget grid (greedy in-order semantics)."""
    from gomapreduce_spark.operators import text as text_ops

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(token_counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["seq_id"], r["n_docs"], r["seq_tokens"])
        for r in text_ops.pack_training_sequences(docs, budget=budget, shard_size=1000).collect()
    )
    assert sum(n for _, n, _ in out) == len(token_counts)
    assert sum(t for _, _, t in out) == sum(token_counts)
    # greedy grid check against a python reference
    import itertools

    cum = list(itertools.accumulate([0] + token_counts[:-1]))
    want_seqs = sorted({c // budget for c in cum})
    assert [s for s, _, _ in out] == want_seqs


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=28),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_duplicate_spans_matches_python_reference(spark, docs):
    """duplicate_spans == a direct Python implementation of the same
    window/interval-union spec, on adversarially repetitive inputs (a
    3-letter vocabulary makes cross- and self-duplication rampant)."""
    w, stride = 10, 5
    texts = [" ".join(d) for d in docs]
    # Python reference on window STRINGS (the md5 hash is injective here)
    windows = {}
    per_doc = {}
    for i, toks in enumerate(docs):
        n = len(toks)
        starts = list(range(0, n - w + 1, stride)) if n >= w else []
        per_doc[i] = [(s, " ".join(toks[s : s + w])) for s in starts]
        for _, key in per_doc[i]:
            windows[key] = windows.get(key, 0) + 1
    want = {}
    for i, toks in enumerate(docs):
        n = len(toks)
        if n == 0:
            continue
        dup = sorted(s for s, key in per_doc[i] if windows[key] > 1)
        covered, prev_end = 0, 0
        for s in dup:
            e = s + w
            covered += max(0, e - max(prev_end, s))
            prev_end = max(prev_end, e)
        want[i] = (n, len(per_doc[i]), len(dup), covered)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_windows"], r["n_dup_windows"], r["dup_tokens"])
        for r in dedup.duplicate_spans(df, w=w, stride=stride).collect()
    }
    assert got == want


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=12),
    budget=st.sampled_from([80, 400, 4000]),
)
@settings(**SETTINGS)
def test_token_budget_sample_matches_python_reference(spark, sizes, budget):
    """token_budget_sample == the greedy Python admission over the same
    md5 hash order, for any doc-size mix and budget."""
    import hashlib

    from gomapreduce_spark.operators import text as text_ops

    n_buckets = 4
    docs = [(i, "en" if i % 2 else "fr", " ".join(["w"] * n)) for i, n in enumerate(sizes)]

    def h(seed, v):
        return int(hashlib.md5(f"{seed}{v}".encode()).hexdigest()[:15], 16)

    per_group = {}
    for doc_id, lang, _ in docs:
        b = h("budget|", doc_id) % n_buckets
        per_group.setdefault((lang, b), []).append(doc_id)
    want = set()
    bucket_budget = budget // n_buckets
    for (lang, b), ids in per_group.items():
        ids.sort(key=lambda d: (h("order|", d), d))
        cum = 0
        for d in ids:
            if cum < bucket_budget:
                want.add(d)
            cum += sizes[d]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]
        for r in text_ops.token_budget_sample(df, budget_tokens=budget, n_buckets=n_buckets).collect()
    }
    assert got == want


@given(
    names=st.lists(
        st.text(alphabet="abcde", min_size=2, max_size=8), min_size=1, max_size=6, unique=True
    ),
    edit=st.tuples(st.integers(min_value=0, max_value=2), st.integers(min_value=0, max_value=7)),
)
@settings(**SETTINGS)
def test_symspell_always_finds_a_single_edit(spark, names, edit):
    """Property: for ANY clean vocabulary and ANY single edit (delete /
    substitute / insert at any position) applied to names[0], the
    SymSpell matcher returns a match at distance <= 1 for the dirty
    string — the deletion-neighborhood blocking never loses a true
    distance-1 neighbor (completeness of the pigeonhole argument)."""
    from gomapreduce_spark.operators.linkage import symspell_match

    kind, pos = edit
    s = names[0]
    p = pos % len(s)
    if kind == 0:
        dirty_s = s[:p] + s[p + 1:]          # delete
    elif kind == 1:
        dirty_s = s[:p] + "z" + s[p + 1:]    # substitute (z not in alphabet)
    else:
        dirty_s = s[:p] + "z" + s[p:]        # insert
    clean = spark.createDataFrame(list(enumerate(names)), "clean_id long, name string")
    dirty = spark.createDataFrame([(100, dirty_s)], "dirty_id long, name string")
    rows = symspell_match(clean, dirty).collect()
    assert rows, f"lost neighbor: {s!r} -> {dirty_s!r}"
    assert rows[0].edit_distance <= 1


@given(st.permutations(list(range(12))))
@settings(**SETTINGS)
def test_bpe_merge_table_is_input_order_invariant(perm):
    """The learned BPE merge table is a pure function of the word-freq
    DICT — shuffling the frequency-head list (any layout the
    distributed word count might deliver after TakeOrdered ties) never
    changes a single merge. This is the layout-independence the VALUES
    oracle relies on."""
    from gomapreduce_spark.operators.text import _bpe_merge_loop

    base = [("aab", 9), ("abab", 7), ("ba", 7), ("cc", 5), ("abc", 4),
            ("ccc", 3), ("b", 3), ("aa", 2), ("cab", 2), ("bb", 1),
            ("ac", 1), ("a", 1)]
    want = _bpe_merge_loop(list(base), 8)
    got = _bpe_merge_loop([base[i] for i in perm], 8)
    assert got == want


@given(docs=st.lists(st.text(alphabet=" abcx", min_size=0, max_size=40), min_size=2, max_size=6))
@settings(**SETTINGS)
def test_containment_matches_bruteforce(spark, docs):
    """containment_pairs against an independent Python restatement on
    random corpora: identical pair set, intersection counts, and both
    rounded containments (threshold 0 = every intersecting pair).
    Also pins containment >= jaccard on every pair — the asymmetry
    the operator exists for."""
    from gomapreduce_spark.operators.dedup import containment_pairs
    from gomapreduce_spark.operators.wordcount import py_tokenize

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.containment_a, r.containment_b)
        for r in containment_pairs(df, threshold=0.0).collect()
    }

    def shingles(text):
        toks = py_tokenize(text)
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(docs) if shingles(t)}
    import math

    def r6(x):  # HALF_UP at 6 decimals (no representable ties for m<128)
        return math.floor(x * 1e6 + 0.5) / 1e6

    want = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j and sets[i] & sets[j]:
                inter = len(sets[i] & sets[j])
                want[(i, j)] = (inter, r6(inter / len(sets[i])), r6(inter / len(sets[j])))
                # the structural claim: containment dominates jaccard
                jac = inter / len(sets[i] | sets[j])
                assert want[(i, j)][1] >= jac and want[(i, j)][2] >= jac
    assert got == want


@given(
    journey=st.lists(
        st.tuples(
            st.integers(0, 3),                      # user
            st.integers(0, 400),                    # hours offset (past the 72h horizon)
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(0, 5),                      # value in whole units
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_attribution_matches_naive_reference(spark, journey):
    """Random user journeys vs a transparent O(n²) python scorer:
    identical channel totals and revenue under every interleaving of
    touches, horizon expiries, same-timestamp ties (event_id order),
    and zero-revenue corner cases."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, u, base + datetime.timedelta(hours=h), t, float(v))
        for i, (u, h, t, v) in enumerate(journey)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )

    # naive reference: scan each purchase's full history
    naive: dict[str, list] = {}
    for i, u, ts, t, v in rows:
        if t != "purchase":
            continue
        touches = [
            (ts2, i2, t2)
            for (i2, u2, ts2, t2, _) in rows
            if u2 == u and t2 in ("view", "click") and (ts2, i2) < (ts, i)
        ]
        channel = "direct"
        if touches:
            lt_ts, _, lt_type = max(touches)
            if (ts - lt_ts).total_seconds() <= 72 * 3600:
                channel = lt_type
        agg = naive.setdefault(channel, [0, 0])
        agg[0] += 1
        agg[1] += round(v * 1_000_000)
    total_q = sum(a[1] for a in naive.values())
    want = {
        ch: (
            n,
            round(q / 1_000_000, 4),
            round(q / total_q, 6) if total_q else None,
        )
        for ch, (n, q) in naive.items()
    }

    got = {
        r.channel: (r.n_purchases, r.attributed_revenue, r.revenue_share)
        for r in events.attribution_last_touch(ev).collect()
    }
    assert got == want


@given(
    docs=st.lists(
        # tiny vocab + 4..10 words per doc: dense shingle collisions,
        # so random corpora actually produce candidate pairs
        st.lists(st.sampled_from("abcdef"), min_size=4, max_size=10).map(" ".join),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]),
)
@settings(**SETTINGS)
def test_ppjoin_lossless_property(spark, docs, threshold):
    """The PPJoin lossless contract as a property: on ANY corpus and
    threshold, the prefix+positional+size-filtered join returns
    EXACTLY the uncapped brute-force jaccard pairs — no pair gained,
    none lost to pruning (incl. round-boundary and tie-heavy shapes
    the tiny vocabulary provokes)."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = sorted(map(tuple, dedup.ppjoin_pairs(df, threshold).collect()))
    want = sorted(
        map(tuple, dedup.ngram_jaccard_pairs(df, threshold, max_df=None).collect())
    )
    assert got == want


@given(
    docs=st.lists(
        st.sampled_from(
            [
                "a b c d e f g",      # base doc
                "a b c d e f h",      # near-dup of base (shares most shingles)
                "x y z w v u t",      # unrelated
                "a b c d e f g",      # exact dup -> guaranteed full-band buckets
                "p q r",              # minimum shingle width
                "a b",                # too short: no shingle, no signature
                "",                   # empty
            ]
        ),
        min_size=2,
        max_size=10,
    ),
    max_bucket=st.sampled_from([2, 3, 1024]),
)
@settings(**SETTINGS)
def test_minhash_lsh_pairs_vs_python(spark, docs, max_bucket):
    """The bucket-local pair generator must equal a direct python
    restatement of the WHOLE contract — KM minhash from one md5 per
    shingle, order-canonicalized band hashes, the strict n > max_bucket
    bucket drop, in-bucket i<j pairs, signature-agreement scoring,
    cross-band dedup — on randomized corpora including exact dups
    (mega-buckets), sub-shingle docs, and caps tight enough to drop
    real buckets."""
    import hashlib

    k, bands, n = dedup.MINHASH_K, dedup.MINHASH_BANDS, dedup.SHINGLE_N
    r = k // bands

    def signature(text: str):
        toks = [t for t in text.split() if t]
        shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - (n - 1))}
        if not shingles:
            return None
        mins = [dedup.MH_MASK] * k
        for s in shingles:
            h = hashlib.md5(s.encode()).hexdigest()
            a = int(h[:15], 16)
            b = int(h[16:31], 16) & dedup.MH_BMASK
            for i in range(k):
                mins[i] = min(mins[i], (a + i * b) & dedup.MH_MASK)
        return mins

    def py_h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sigs = {i: sig for i, t in enumerate(docs) if (sig := signature(t)) is not None}
    expected = {}
    for band in range(bands):
        buckets: dict = {}
        for doc_id, sig in sigs.items():
            entries = sorted(f"{band * r + j}:{sig[band * r + j]}" for j in range(r))
            buckets.setdefault(py_h64(",".join(entries)), []).append(doc_id)
        for members in buckets.values():
            if len(members) > max_bucket:
                continue
            for ai in range(len(members)):
                for bi in range(ai + 1, len(members)):
                    a, b = sorted((members[ai], members[bi]))
                    est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / k
                    expected[(a, b)] = round(est, 6)

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (row["doc_a"], row["doc_b"]): row["est_jaccard"]
        for row in dedup.minhash_lsh_pairs(df, max_bucket=max_bucket).collect()
    }
    assert got == expected
