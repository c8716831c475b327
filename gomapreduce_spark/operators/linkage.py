"""Record linkage / entity resolution: fuzzy matching of dirty records
to a clean reference table WITHOUT an all-pairs comparison.

The reference repo has no such operator (its only string computation is
whitespace tokenization, reference mapper.go:42); this is part of the
driver-mandated data-pipeline surface — the dedup family's cousin for
STRUCTURED identifiers (names, addresses, product titles) where
near-duplicates are edit-distance variants rather than shingle
overlaps.

Method: SymSpell-style deletion-neighborhood blocking (Garbe's
symmetric delete algorithm — public domain technique used by every
production spell-corrector). Two strings are within Damerau-free edit
distance 1 (one insert, delete, or substitute) iff the sets
{s} ∪ {s minus one char} intersect. Each side therefore fans out to
len(s)+1 variant rows (narrow, no shuffle), candidates come from ONE
equi-join on the variant — never a cross join — and exact
``levenshtein`` verification + an argmin pick run on the (tiny)
candidate set. At 100 TB: variant fan-out is linear in total string
bytes, the join shuffles identifier-sized keys (hash them via h64 for
long strings), and the per-dirty-record argmin is a partial-agg; work
never depends on |clean| × |dirty|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h64  # noqa: F401 — the long-string key variant documented below


def deletion_variants(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """(id, original string, variant): the string itself and every
    single-character deletion of it — the SymSpell neighborhood. The
    ORIGINAL string rides along each variant row (strings are
    identifier-sized by contract) so the candidate join needs no
    join-back to the source tables for scoring.

    The join key is the variant STRING itself: identifier-sized keys
    shuffle as cheaply as a fixed hash and are exactly collision-free
    — and hashing measurably dominated this operator (md5-based h64
    over ~4.5M variant rows at sf0.1 cost more than the join it fed).
    For LONG strings (addresses, titles) swap in ``h64(variant)`` to
    cut shuffle bytes; nothing else changes (the h64 import stays for
    that variant).

    Degenerate inputs (advisor round-6 finding): ``sequence(1, 0)`` on
    an EMPTY string steps DOWNWARD to [1, 0] — two bogus variant rows —
    and a NULL string propagates NULL variants into the join key; both
    are filtered out up front (a zero-/NULL-length identifier has no
    meaningful deletion neighborhood to match on)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s_col)),
        lambda i: F.concat(
            F.substring(F.col(s_col), F.lit(1), i - 1),
            F.col(s_col).substr(i + 1, F.length(s_col)),
        ),
    )
    variants = F.array_union(F.array(F.col(s_col)), dels)
    return df.where(F.length(s_col) >= 1).select(
        F.col(id_col),
        F.col(s_col).alias("__s"),
        F.explode(variants).alias("variant"),
    )


def symspell_match(
    clean: DataFrame,
    dirty: DataFrame,
    clean_id: str = "clean_id",
    dirty_id: str = "dirty_id",
    s_col: str = "name",
) -> DataFrame:
    """Best clean match per dirty record at edit distance <= 1.

    Output: (dirty_id, matched_id, edit_distance, n_candidates) —
    matched_id is the argmin by (distance, clean id) for deterministic
    tie-breaks (an ambiguous perturbation can sit at distance 1 from
    two reference rows), n_candidates counts the clean rows VERIFIED
    at distance <= 1 (ambiguity audit column).
    Unmatched dirty rows are absent (left-join them back for a
    keep/quarantine manifest).
    """
    cv = deletion_variants(clean.select(F.col(clean_id), F.col(s_col)), clean_id, s_col)
    dv = deletion_variants(dirty.select(F.col(dirty_id), F.col(s_col)), dirty_id, s_col)
    # both strings ride the variant rows, so ONE equi-join + a pair
    # dedup yields scoreable candidates — no join-back to the sources
    # (names are functionally dependent on the ids, so the pair dedup
    # is deterministic)
    scored = (
        dv.join(cv.withColumnRenamed("__s", "__cs"), "variant")
        .dropDuplicates([dirty_id, clean_id])  # many shared variants per pair
        .select(
            dirty_id,
            F.col(clean_id),
            F.levenshtein("__s", "__cs").alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= 1)
    )
    best = F.min(F.struct("edit_distance", clean_id)).alias("b")
    return (
        scored.groupBy(dirty_id)
        .agg(best, F.count("*").alias("n_candidates"))
        .select(
            dirty_id,
            F.col(f"b.{clean_id}").alias("matched_id"),
            F.col("b.edit_distance").cast("int").alias("edit_distance"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )


def perturbed_customers(customers: DataFrame) -> DataFrame:
    """Deterministic 'dirty' feed derived from customer names (the
    fixture ships no dirty table, same pattern as the synthetic codec
    payloads): per customer one typo'd copy — delete / substitute-'x' /
    insert-'x' at a key-dependent position, cycling by c_custkey % 3.
    Reproducible in ANSI SQL, so the oracle regenerates it exactly."""
    name = F.col("c_name")
    pos = (F.col("c_custkey") % F.length(name)) + 1  # 1-based
    kind = F.col("c_custkey") % 3
    pre = F.substring(name, F.lit(1), pos - 1)
    post_incl = name.substr(pos, F.length(name))  # char at pos onward
    post_excl = name.substr(pos + 1, F.length(name))  # after pos
    dirty = (
        F.when(kind == 0, F.concat(pre, post_excl))  # delete
        .when(kind == 1, F.concat(pre, F.lit("x"), post_excl))  # substitute
        .otherwise(F.concat(pre, F.lit("x"), post_incl))  # insert
    )
    return customers.select(
        F.col("c_custkey").alias("dirty_id"), dirty.alias("name")
    )


def fuzzy_customer_links(customers: DataFrame) -> DataFrame:
    """The registered query: link the deterministic typo'd customer
    feed back to the clean customer table via :func:`symspell_match`.
    Every dirty row is at true edit distance 1 from its parent, so the
    match table doubles as a self-test — but ambiguous typos (a digit
    deletion that reconstructs a DIFFERENT padded key) legitimately
    resolve to the lower custkey, which the oracle reproduces."""
    clean = customers.select(F.col("c_custkey").alias("clean_id"), F.col("c_name").alias("name"))
    return symspell_match(clean, perturbed_customers(customers))
