"""End-to-end training-data pipeline: the composed flow a real user
runs, asserting conservation/containment invariants between every
stage — raw corpus → hard rules → model filter → dedup → canonical
selection → leakage-safe split → chunking → packing → sharded layout
with manifest. One test, the whole engine as a system.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from gomapreduce_spark.operators import dedup, text
from gomapreduce_spark.sources.registry import (
    load_table,
    write_dataset_manifest,
    write_training_shards,
)


def test_training_pipeline_end_to_end(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    n_raw = docs.count()

    # 1. hard rules: survivors are a subset of the corpus
    hygiene = docs.join(
        text.gopher_rules(docs).where(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    n_rules = hygiene.count()
    assert 0 < n_rules <= n_raw

    # 2. model filter on the survivors
    kept = hygiene.join(
        text.quality_classifier(hygiene).where(F.col("keep")).select("doc_id"), "doc_id"
    )
    n_kept = kept.count()
    assert 0 < n_kept <= n_rules

    # 3. canonical docs: one representative per near-dup cluster,
    #    singletons keep themselves → exactly one row per input doc,
    #    and the canonical set is closed under the cluster map
    canon = dedup.canonical_docs(kept)
    assert canon.count() == n_kept
    reps = canon.where(F.col("keep"))
    n_canon = reps.count()
    assert 0 < n_canon <= n_kept

    # 4. leakage-safe split covers every doc exactly once
    split = dedup.leakage_safe_split(kept)
    assert split.count() == n_kept
    assert split.groupBy("split").count().count() <= 3
    # no near-dup cluster straddles split boundaries
    assert (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
        == 0
    )

    # 5. chunk the canonical training docs; every chunk's tokens come
    #    from its source doc and totals line up with re-tokenization
    train_docs = kept.join(reps.select("doc_id"), "doc_id").join(
        split.where(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    chunks = text.chunk_documents(train_docs)
    n_train = train_docs.count()
    assert chunks.select("doc_id").distinct().count() == train_docs.where(
        F.size(F.split("text", r"\s+")) > 0
    ).count()

    # 6. pack into training sequences: token totals are conserved
    packed = text.pack_training_sequences(train_docs)
    total_packed = packed.agg(F.sum("seq_tokens")).collect()[0][0]
    total_tokens = (
        train_docs.select(F.size(F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total_packed == total_tokens

    # 7. shard + manifest: the layout contract holds for the final set
    out = str(tmp_path / "train_shards")
    write_training_shards(train_docs, out, n_shards=3)
    m = write_dataset_manifest(out, order_col="doc_id")
    assert m["total_rows"] == n_train
    spans = sorted((e["min"], e["max"]) for e in m["files"] if "min" in e)
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
