"""Cross-engine deterministic 60-bit hash.

The reference partitions intermediates with ``adler32(key) % R``
(reference emittedStore.go:40). Only the grouping contract matters
("equal keys meet in one partition"), so Spark's own hash partitioner
covers that role. What *we* additionally need — and the reference never
did — is a hash whose value is reproducible in BOTH Spark SQL and DuckDB
so MinHash/SimHash/fingerprint operators can be verified against an SQL
oracle: md5 is bit-identical everywhere, and 15 hex chars (60 bits) fit
a signed 64-bit int in both engines.

Spark:  cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)
DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h64(col: Column | str, seed: str = "") -> Column:
    """Deterministic 60-bit non-negative hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.concat(F.lit(seed), c.cast("string")) if seed else c.cast("string")
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def duck_h64(expr: str, seed: str = "") -> str:
    """The DuckDB-SQL rendering of :func:`h64` for oracle queries."""
    inner = f"'{seed}' || ({expr})" if seed else f"({expr})"
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"
