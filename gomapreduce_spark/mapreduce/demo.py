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

from collections import Counter
from typing import Any

from ..operators.wordcount import py_tokenize
from .api import Emitter, Mapper, Outputer, Reducer


class DemoMapper(Mapper):
    # tokenizes with wordcount.py_tokenize — the ONE whitespace
    # definition shared by the engine tokenizer, the Arrow shingle
    # stages, and the DuckDB oracle (str.split would also split on
    # U+001C-001F and silently diverge)
    def map(self, key: str, value: Any, emitter: Emitter) -> None:
        counts = Counter(py_tokenize(str(value)))
        for word, n in counts.items():
            emitter.emit(word, n)


class DemoReducer(Reducer):
    associative = True

    def reduce(self, key: str, values: list[Any], outputer: Outputer) -> None:
        outputer.output(key, sum(int(v) for v in values))
