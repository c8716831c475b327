"""Client stub — the reference's ``Clerk`` (O26, client.go:17-47).

In the reference this is dead code: ``MakeClerk`` builds a stub holding
a random client id and a unique-request-id generator, but nothing ever
constructs or calls it. Here it is a WORKING façade so a user of the
reference's intended client API gets the real thing: the Clerk holds a
client identity plus a per-clerk request-id generator (first id 1,
never 0 — client.go:36-47 starts the enclosed base at -1 deliberately,
so a real request id can't be confused with a zero-valued int field),
and forwards job submission/status/release to a ``MapReduceEngine``
the way the reference's Clerk would RPC a MapReduceServer.

Spark-first reading: there are no client-visible "servers" to pick
among — the engine IS the cluster entry point (the SparkSession talks
to the scheduler) — so the Clerk keeps the reference's client-side
semantics (identity, request ids, the submit/status/done verbs) and
drops only the RPC transport, which Spark owns (same boundary as O25).
"""

from __future__ import annotations

import uuid
from typing import Callable

from .api import Inputer, Mapper, Outputer, Reducer
from .engine import JobConfig, MapReduceEngine


def make_id_generator() -> Callable[[], int]:
    """Unique ids from an enclosed incrementing base, first id 1 —
    the reference's make_id_generator (client.go:36-47), kept as a
    standalone function for API parity. Note the reference's own code
    contradicts its comment: it documents "the first returned id is 1"
    to avoid zero-value confusion, but starts the base at -1 and
    returns it post-increment, so its first id is actually 0 — a
    latent bug its dead-code status never surfaced. This follows the
    documented intent (first id 1, never 0), like the engine follows
    the intent of the reference's never-reassigning task manager."""
    base_id = 0

    def next_id() -> int:
        nonlocal base_id
        base_id += 1
        return base_id

    return next_id


class Clerk:
    """Application-facing MapReduce client (reference client.go:17-33,
    made functional). One Clerk per application; each submission gets a
    unique (clerk_id, request_id) pair, mirroring the reference's
    client-identifier + per-clerk request-id scheme."""

    def __init__(self, engine: MapReduceEngine):
        self.engine = engine
        self.clerk_id = uuid.uuid4().hex  # reference: rand.Int()
        self._next_request_id = make_id_generator()
        self.requests: dict[int, str] = {}  # request_id -> job_id

    def submit(
        self,
        config: JobConfig,
        mapper: Mapper,
        reducer: Reducer,
        inputer: Inputer,
        outputer: Outputer,
        sync: bool = False,
    ) -> int:
        """Submit a job; returns this Clerk's request id (≥1)."""
        request_id = self._next_request_id()
        self.requests[request_id] = self.engine.submit(
            config, mapper, reducer, inputer, outputer, sync=sync
        )
        return request_id

    def status(self, request_id: int) -> bool:
        """True iff the request's job completed. Unknown or released
        request ids report False — same tolerance as the engine's
        status on unknown job ids (a poll after done() is a natural
        client pattern and must not crash)."""
        job_id = self.requests.get(request_id)
        return job_id is not None and self.engine.status(job_id)

    def wait(self, request_id: int, timeout: float = 300.0) -> None:
        """No-op for unknown/released ids (nothing left to wait on)."""
        job_id = self.requests.get(request_id)
        if job_id is not None:
            self.engine.wait(job_id, timeout=timeout)

    def done(self, request_id: int) -> None:
        """Release the request's job state on the engine; idempotent
        (a second done() on the same id is a no-op, not a KeyError)."""
        job_id = self.requests.pop(request_id, None)
        if job_id is not None:
            self.engine.done(job_id)
