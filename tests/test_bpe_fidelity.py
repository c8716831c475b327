"""BPE head-truncation fidelity (round-7 verdict item 3).

``bpe_learn_merges`` trains on the top-``BPE_TOP_WORDS`` word-frequency
head to bound driver state; real trainers fold the full dictionary.
These tests QUANTIFY the cut instead of asserting it away:

- on the fixtures the head IS the full dict (vocab 31), so head and
  full-dict training must be bit-identical end to end;
- on a synthetic 6000-word Zipf corpus whose tail past rank 2000 holds
  ~9 % of token mass, the head-trained merge sequence must reproduce
  full-dict training exactly through merge 35 — past the production
  BPE_N_MERGES=24 with a 11-merge margin. The corpus and the loop are
  deterministic, so the divergence point is pinned, not sampled.
"""

from __future__ import annotations

from gomapreduce_spark.operators.text import (
    BPE_N_MERGES,
    _bpe_merge_loop,
    _bpe_merge_loop_reference,
    _bpe_word_freqs,
    bpe_learn_merges,
)
from gomapreduce_spark.sources.registry import load_table


def _zipf_freqs(vocab: int = 6000) -> list[tuple[str, int]]:
    """Deterministic heavy-tail dictionary: word i (base-7 spelling
    over 'abcdefg', injective) has frequency max(1, vocab // i)."""
    alpha = "abcdefg"

    def word(i: int) -> str:
        out = []
        while True:
            out.append(alpha[i % 7])
            i //= 7
            if not i:
                return "".join(out)

    freqs = [(word(i), max(1, vocab // i)) for i in range(1, vocab + 1)]
    assert len({w for w, _ in freqs}) == vocab
    return sorted(freqs, key=lambda kv: (-kv[1], kv[0]))


def test_fixture_head_training_equals_full_dict(spark, sf_small):
    """The registered query's artifact is full-dict-exact on the
    fixtures: vocab (31) < head (2000), so nothing is truncated."""
    docs = load_table(spark, sf_small, "documents")
    full = _bpe_word_freqs(docs, None)
    assert len(full) < 2000  # precondition: the head covers everything
    head_rows = bpe_learn_merges(docs).collect()
    full_rows = bpe_learn_merges(docs, top_words=None).collect()
    as_tuples = lambda rows: [(r.rank, r.left, r.right, r.pair_count) for r in rows]  # noqa: E731
    assert as_tuples(head_rows) == as_tuples(full_rows)
    assert len(head_rows) == BPE_N_MERGES


def test_zipf_head_training_divergence_point_is_past_production_depth():
    """On a dictionary 3x the head budget, with ~9 % of mass in the
    dropped tail, head training matches full-dict training exactly for
    35 merges — the production depth (24) carries a measured margin."""
    order = _zipf_freqs()
    head_mass = sum(n for _, n in order[:2000])
    tail_mass = sum(n for _, n in order[2000:])
    assert tail_mass / (head_mass + tail_mass) > 0.08  # the cut is not a no-op

    m_full = _bpe_merge_loop(list(order), 64)
    m_head = _bpe_merge_loop(order[:2000], 64)
    prefix = 0
    for a, b in zip(m_full, m_head):
        if a[1:3] != b[1:3]:
            break
        prefix += 1
    # deterministic corpus + deterministic loop => pinned, not flaky
    assert prefix == 35
    assert prefix >= BPE_N_MERGES + 10

    # within the production depth the artifacts agree on PAIRS; counts
    # differ only by the dropped tail's (bounded) contribution
    for a, b in zip(m_full[:BPE_N_MERGES], m_head[:BPE_N_MERGES]):
        assert a[1:3] == b[1:3]
        assert 0 <= a[3] - b[3] <= tail_mass


def test_incremental_loop_reproduces_reference_exactly():
    """The production-depth loop (round-9): the incremental delta+heap
    form must reproduce the textbook full-recount reference loop
    BIT-IDENTICALLY — ranks, pairs, tie order, and counts — deep into
    a heavy-tail dictionary, including past the point where merged
    symbols themselves start pairing (multi-level merges) and through
    count-tie runs where only the lex order decides. 300 merges over
    the 6000-word Zipf dict exercises all of it; the fixture-corpus
    oracle VALUES (unchanged since r7) pin the registered depth."""
    order = _zipf_freqs()
    assert _bpe_merge_loop(list(order), 300) == _bpe_merge_loop_reference(list(order), 300)


def test_incremental_loop_edge_dicts():
    """Degenerate shapes the delta bookkeeping must survive: repeated
    symbols inside one word (overlapping pair occurrences, greedy
    non-overlap rewrite), single-char words (sentinel-only pairs), and
    a dict that EXHAUSTS (every word fused to one symbol) before the
    requested depth — the loop must stop where the reference stops."""
    cases = [
        [("aaaa", 5), ("aa", 3), ("a", 9)],
        [("ab", 2), ("ba", 2), ("abba", 1)],
        [("x", 1)],
        [("ab", 7), ("ab", 3)],  # duplicate words keep independent slots
    ]
    for freqs in cases:
        assert _bpe_merge_loop(list(freqs), 50) == _bpe_merge_loop_reference(list(freqs), 50)


def test_distributed_escape_hatch_matches_driver_loop(spark, sf_small):
    """The huge-dict escape hatch (round-9 prototype): the per-merge
    Spark recount loop — pair-count agg, TakeOrdered(1) argmax, Arrow
    rewrite sharing _bpe_rewrite — must reproduce the driver loop
    BIT-IDENTICALLY on the full fixture dictionary (no head), proving
    the documented 100 TB path is real, not an argument."""
    from gomapreduce_spark.operators.text import (
        _bpe_merge_loop,
        _bpe_word_freqs,
        bpe_learn_merges_distributed,
    )
    from gomapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_small, "documents")
    dist = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges_distributed(docs, 8).collect()
    ]
    assert dist == _bpe_merge_loop(_bpe_word_freqs(docs, None), 8)
    assert len(dist) == 8


def test_distributed_escape_hatch_supplementary_plane(spark):
    """Symbolization must be per CODE POINT, not per UTF-16 unit: a
    JVM zero-width split cleaves supplementary-plane characters into
    lone surrogates (different pair counts, invalid UTF-8 for Arrow).
    The corpus plants emoji-bearing words to pin the Python-domain
    [*w] symbolization against the driver loop."""
    from gomapreduce_spark.operators.text import (
        _bpe_merge_loop,
        _bpe_word_freqs,
        bpe_learn_merges_distributed,
    )

    rows = [
        (1, "hi \U0001F600x \U0001F600x grin \U0001F600x"),
        (2, "ab ab ab cd cd \U0001F600x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dist = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges_distributed(docs, 5).collect()
    ]
    assert dist == _bpe_merge_loop(_bpe_word_freqs(docs, None), 5)
    assert any("\U0001F600" in left for _, left, _r, _ in dist)
