"""Word count and the reference's core MapReduce dataflow, DataFrame-native.

The reference's one end-to-end pipeline is word count
(O1→O2→O5→O6/O7→O8→O9→O11→O12 in SURVEY §2.1; demo mapper at reference
mapper.go:38-55, demo reducer at reducer.go:37-45). Tokenization matches
Go's ``strings.Fields`` (mapper.go:42): split on runs of whitespace,
drop empty tokens.

Spark-first notes: ``explode(split(...))`` + ``groupBy().count()`` is
one shuffle with automatic partial aggregation — exactly the map-side
combine the reference hand-rolls in its demo mapper (mapper.go:43-49).
At 100 TB the plan is shuffle-minimal already: partial counts reduce the
shuffle to |vocabulary| × partitions rows.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Go unicode.IsSpace = ASCII whitespace + NEL (U+0085) + the Z
# categories (Zs space separators, Zl U+2028, Zp U+2029). Java's and
# RE2's bare \s are ASCII-only, so both engines get this explicit
# class; \p{Zs} and the literal chars parse identically in both.
WS_RE = "[\\s\u0085\u2028\u2029\\p{Zs}]+"

# the SAME class for Python re (used by Arrow/pandas stages and the
# MapReduce demo mapper): Python's str-mode \s also matches
# U+001C-001F, which Java's/RE2's \s does not \u2014 so the ASCII core and
# the Zs category are enumerated explicitly instead.
PY_WS_RE = re.compile(
    "[\\t\\n\\x0b\\f\\r \\x85\\u2028\\u2029"
    "\\xa0\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000]+"
)


def py_tokenize(text: str) -> list[str]:
    """``strings.Fields`` semantics in plain Python \u2014 bit-identical to
    :func:`tokenize` (parity asserted in tests/test_mapreduce.py)."""
    return [t for t in PY_WS_RE.split(text) if t]


def tokenize(text: Column | str) -> Column:
    """``strings.Fields`` semantics: non-empty whitespace-separated
    tokens, Unicode-whitespace aware (see WS_RE)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, WS_RE), lambda t: F.length(t) > 0)


def word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over all documents — the reference's flagship job."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def distinct_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct intermediate keys — the key-set half of the reference's
    group-by-key (reference tasks.go:147-150)."""
    return docs.select(F.explode(tokenize(text_col)).alias("word")).distinct()


def group_collect(docs: DataFrame) -> DataFrame:
    """Group-by-key with full value collection (O9, reference
    tasks.go:143-161): every value for a key gathered in one place, here
    rendered order-canonical (sorted, joined) so it is comparable.

    This is the general non-associative-Reducer contract; analytics
    paths should prefer ``agg`` (partial aggregation) — see
    ``sum_reduce``.
    """
    return docs.groupBy(F.col("lang").alias("key")).agg(
        F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("doc_ids"),
        F.count("*").alias("n_docs"),
    )


def sum_reduce(events: DataFrame) -> DataFrame:
    """Per-key SUM — the demo reducer's fold (reference reducer.go:37-45)
    as a partially-aggregated ``agg`` instead of a groupByKey."""
    return events.groupBy(F.col("event_type").alias("key")).agg(
        F.round(F.sum("value"), 4).alias("total"),
        F.count("*").alias("n"),
    )
