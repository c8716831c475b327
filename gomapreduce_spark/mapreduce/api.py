"""The reference's four client interfaces, as Python protocols.

API-fidelity layer: a user of the reference implements ``Mapper``,
``Reducer``, ``Inputer``, ``Outputer`` and submits a ``Job``; this
package preserves those contracts verbatim while executing on Spark.

Reference citations:
- Mapper  — reference mapper.go:13-20 (``Map(key, value, emitter)``;
  any number of emits per input).
- Reducer — reference reducer.go:13-15 (``Reduce(key, values, outputer)``;
  sees the COMPLETE value list for its key, so the engine must
  groupByKey, never combine — unless the reducer declares itself
  associative, the fast path the reference's demo hand-rolls in its
  mapper, mapper.go:43-49).
- Emitter — reference emitter.go:16-19 (``Emit(key, value)``).
- Inputer — reference inputer.go:11-14 (``ListKeys() / GetValue(key)``).
- Outputer — reference outputer.go:11-13 (``Output(key, value)``).

Keys are strings (the reference's universal contract, SURVEY §1.2);
values are arbitrary picklable Python objects (pickle plays the role of
the reference's gob encoding, mapreduce.go:436-449).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any


class Emitter(ABC):
    """Map-side emit hook (reference emitter.go:16-19)."""

    @abstractmethod
    def emit(self, key: str, value: Any) -> None: ...


class Mapper(ABC):
    """Per-chunk transform; may emit any number of pairs
    (reference mapper.go:13-20)."""

    @abstractmethod
    def map(self, key: str, value: Any, emitter: Emitter) -> None: ...


class Reducer(ABC):
    """Per-key fold over the complete value list (reference
    reducer.go:13-15). Set ``associative = True`` if ``reduce`` can be
    applied to partial value lists — enables map-side combining.

    Associative contract: during combining the engine calls
    ``reduce`` with an EMPTY key (partial merges are key-agnostic), so
    an associative reducer must ignore its key argument and must emit
    exactly one pair per call (the engine asserts this). A reducer
    whose output depends on its key must stay non-associative."""

    associative: bool = False

    @abstractmethod
    def reduce(self, key: str, values: list[Any], outputer: "Outputer") -> None: ...


class Inputer(ABC):
    """Input enumeration + fetch (reference inputer.go:11-14)."""

    @abstractmethod
    def list_keys(self) -> list[str]: ...

    @abstractmethod
    def get_value(self, key: str) -> Any: ...


class Outputer(ABC):
    """Per-key output hook (reference outputer.go:11-13)."""

    @abstractmethod
    def output(self, key: str, value: Any) -> None: ...


class ListEmitter(Emitter):
    """Collects emits into a list — the engine's shim between the
    callback-style API and RDD flatMap."""

    def __init__(self) -> None:
        self.pairs: list[tuple[str, Any]] = []

    def emit(self, key: str, value: Any) -> None:
        self.pairs.append((key, value))


class ListOutputer(Outputer):
    """Collects outputs into a list — reduce-side shim."""

    def __init__(self) -> None:
        self.pairs: list[tuple[str, Any]] = []

    def output(self, key: str, value: Any) -> None:
        self.pairs.append((key, value))
