"""The reference's demo computation: word count with map-side combine.

DemoMapper (reference mapper.go:26-55): tokenize the chunk on
whitespace (``strings.Fields`` → split + drop empties, mapper.go:42),
count words within the chunk (the hand-rolled combiner,
mapper.go:43-49), emit (word, local_count).

DemoReducer (reference reducer.go:24-45): sum the per-chunk counts for
a word and output the total. Declares ``associative = True`` — summing
partial sums is the combiner fast path.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Any

from .api import Emitter, Mapper, Outputer, Reducer

# the SAME whitespace class as wordcount.WS_RE / the DuckDB oracle:
# the regex \s core plus NEL/LS/PS plus the Unicode Zs category
# (Python re lacks \p{Zs}, so Zs is enumerated explicitly).
# str.split() would differ: its str-mode whitespace set also contains
# U+001C-001F, letting the facade and oracle diverge on control chars.
_WS_SPLIT = re.compile(
    "[\\t\\n\\x0b\\f\\r \\x85\\u2028\\u2029"
    "\\xa0\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000]+"
)


class DemoMapper(Mapper):
    def map(self, key: str, value: Any, emitter: Emitter) -> None:
        counts = Counter(t for t in _WS_SPLIT.split(str(value)) if t)
        for word, n in counts.items():
            emitter.emit(word, n)


class DemoReducer(Reducer):
    associative = True

    def reduce(self, key: str, values: list[Any], outputer: Outputer) -> None:
        outputer.output(key, sum(int(v) for v in values))
