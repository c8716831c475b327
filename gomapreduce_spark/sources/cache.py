"""Source-identity-keyed local cache with atomic publish — the shared
machinery behind derived layouts (events_partition_stats' Hive layout,
the persisted kNN index): a derived artifact is keyed by the SOURCE
file's identity (absolute path + size + mtime + a version tag), built
under a pid-suffixed temp sibling, and published with one atomic
``os.rename`` — so a regenerated source can never serve a stale
artifact, a crash mid-build never leaves a half-readable cache entry,
and a lost publish race just discards the loser's (equivalent) build.

The cache root is OWNER-PRIVATE (``gomapreduce_spark_cache_u<uid>``,
created 0700 and verified owned-by-us with no group/other access on
every use): the path is predictable, so a pre-created root owned by
another local user is an ERROR, never trusted (round-14 advisor
finding).

At 100 TB the same contract moves to the object store: key = source
manifest etag, publish = conditional PUT of a manifest object — the
local form here is the single-node stand-in with identical semantics.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable


def cache_root() -> str:
    """The verified owner-private cache root (created on demand)."""
    root = os.path.join(
        tempfile.gettempdir(), f"gomapreduce_spark_cache_u{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    rst = os.stat(root)
    if rst.st_uid != os.getuid() or (rst.st_mode & 0o077):
        raise RuntimeError(
            f"cache root {root} is not a private directory owned by uid "
            f"{os.getuid()} (uid={rst.st_uid}, mode={oct(rst.st_mode & 0o777)}) "
            "— refusing to trust a cache another local user can write"
        )
    return root


def identity_cache_dir(prefix: str, src: str, version: str) -> str:
    """Cache path for an artifact derived from ``src``, keyed by the
    source's identity plus a ``version`` tag that callers bump
    whenever the DERIVATION changes. A file's identity is its (path,
    size, mtime); a DIRECTORY's identity folds every immediate entry's
    (name, size, mtime) — a regenerated multi-file corpus changes the
    key even when the writer reuses file names and pins mtimes (sizes
    differ), so a stale artifact (or a stale streaming checkpoint kept
    under the cache dir) can never be consulted for new data."""
    st = os.stat(src)
    if os.path.isdir(src):
        parts = []
        for name in sorted(os.listdir(src)):
            est = os.stat(os.path.join(src, name))
            parts.append(f"{name}|{est.st_size}|{est.st_mtime_ns}")
        ident = f"dir:{os.path.abspath(src)}|" + "|".join(parts)
    else:
        ident = f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}"
    key = hashlib.md5(f"{ident}|{version}".encode()).hexdigest()[:16]
    return os.path.join(cache_root(), f"{prefix}_{key}")


def ensure_cached(cache: str, build: Callable[[str], None]) -> str:
    """Return ``cache``, building it first if absent: ``build(tmp_dir)``
    populates a temp sibling, which is then atomically renamed into
    place. A concurrent builder that loses the rename race discards its
    own build — same cache key means same source identity, so the
    winner's artifact is equivalent."""
    if not os.path.isdir(cache):
        tmp = f"{cache}.tmp-{os.getpid()}"
        build(tmp)
        try:
            os.rename(tmp, cache)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return cache
