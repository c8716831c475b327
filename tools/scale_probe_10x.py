"""Extra-decade scale probe (round-11 verdict item 3): the standing
claim is ≤3.7x wall over 100x data growth, measured sf0.001→0.1. This
tool adds one more decade for the expensive dedup/LSH/ANN family by
synthesizing a ~10x re-keyed self-union of the sf0.1 tables
(/root/testdata is read-only, so the synthetic decade lives in a
scratch dir) and timing the top-cost operators at sf0.1 vs 10x.

Synthesis recipe (deterministic, no RNG — the synth_corpus_snapshot /
perturbed_customers doctrine): 10 copies of each input table with
disjoint re-keyed ids (copy i adds i·10^9 to every key column).
Content perturbation is chosen so each copy preserves the ORIGINAL
within-copy structure while copies stay unrelated to each other —
i.e. the 10x corpus is ten disjoint replicas of the sf0.1 workload,
the cleanest possible scaling fixture:

- documents: copy i applies a CHARACTER-ROTATION cipher
  (``translate(text, 'bcgjklmpqr', rot_i('bcgjklmpqr'))``) — a
  bijection on ten letters chosen to be DISJOINT from the gopher
  stopword letters ({t,h,e,a,o,f,n,d,i,s}), so every row-level
  measure is preserved EXACTLY per copy (token count, token lengths,
  text length, stopword presence, distinct-token count, alpha ratio
  → gopher/quality/admission verdicts replicate 10×) while nearly
  every content token's spelling changes per copy, decorrelating
  word shingles across copies → near-dup clusters are 10 disjoint
  replicas. Copy 0 is verbatim. Earlier draft used an every-gap tag
  token instead; that DOUBLED each copy's token count, and ppjoin's
  prefix length is linear in document size — the probe then measured
  doc-length growth compounded with corpus growth (155× wall),
  not the scaling of interest. A handful of vocabulary words spell
  entirely outside the cipher alphabet (fast/hash/data + the
  stopwords) and stay shared across copies; at shingle width 3 the
  induced cross-copy Jaccard is ~0.01 — far below the 0.5 threshold.
- embeddings: copy i rotates the vector by i positions — norms
  preserved, cross-copy cosine decorrelated, within-copy geometry
  identical.
- customer: copy i appends ``q<i><i>`` to c_name (doubled digit:
  cross-copy edit distance 2, outside symspell's radius-1 matches,
  so the linkage candidate structure replicates instead of merging).
- orders/lineitem: keys re-based consistently (o_orderkey ↔
  l_orderkey, o_custkey); dates untouched, so each customer's
  bucket-join fan-out is exactly the original's.

Run: python tools/scale_probe_10x.py [n_copies]   (~10 min; prints a
table + JSON line). The scratch dir (~10x the sf0.1 footprint) is
removed on success.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spark_graft_scale10x"
OFF = 1_000_000_000  # copy i re-bases ids by i*OFF; far below the
#                      synth-snapshot fresh-id floor of 2^60

# the top-cost operators the r11 verdict names, plus this round's
# ingest certification (same LSH subtree + admission scans)
TARGETS = [
    "doc_provenance",
    "corpus_dedup_e2e",
    "corpus_ingest_e2e",
    "embedding_dedup_clusters",
    "dedup_clusters",
    "ppjoin_pairs",
    "minhash_lsh_pairs",
    "kmeans_embeddings",
    "fuzzy_customer_links",
    "range_join_shipments",
]


def _union_copies(df: DataFrame, transform, n: int) -> DataFrame:
    return reduce(DataFrame.unionByName, [transform(df, i) for i in range(n)])


def synth_10x(spark, out_dir: str, n_copies: int) -> None:
    from gomapreduce_spark.sources.registry import load_table

    os.makedirs(out_dir, exist_ok=True)

    AL = "bcgjklmpqr"  # 10 letters, none used by a gopher stopword

    def docs_copy(df, i):
        if i == 0:
            return df
        return df.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFF)).withColumn(
            "text", F.translate("text", AL, AL[i:] + AL[:i])
        )

    def emb_copy(df, i):
        if i == 0:
            return df
        rot = F.expr(
            f"concat(slice(embedding, {i + 1}, size(embedding) - {i}),"
            f" slice(embedding, 1, {i}))"
        )
        return df.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFF)).withColumn(
            "embedding", rot
        )

    def cust_copy(df, i):
        if i == 0:
            return df
        return df.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * OFF)).withColumn(
            "c_name", F.concat(F.col("c_name"), F.lit(f" q{i}{i}"))
        )

    def orders_copy(df, i):
        if i == 0:
            return df
        return df.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OFF)).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(i * OFF)
        )

    def li_copy(df, i):
        if i == 0:
            return df
        return df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OFF))

    recipes = {
        "documents": docs_copy,
        "embeddings": emb_copy,
        "customer": cust_copy,
        "orders": orders_copy,
        "lineitem": li_copy,
    }
    for table, fn in recipes.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        src = load_table(spark, SRC, table)
        _union_copies(src, fn, n_copies).write.mode("overwrite").parquet(dst)
        print(f"synth {table}: x{n_copies}", flush=True)


def main() -> int:
    from gomapreduce_spark.queries import QUERIES
    from gomapreduce_spark.session import get_spark
    from tools.timing import time_query, warm

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale_probe_10x")
    spark.sparkContext.setLogLevel("ERROR")
    synth_10x(spark, SCRATCH, n_copies)
    warm(QUERIES, spark, SRC)

    rows = []
    for name in TARGETS:
        t_base = time_query(QUERIES, name, spark, SRC)
        t_big = time_query(QUERIES, name, spark, SCRATCH)
        rows.append((name, t_base, t_big))
        print(f"{name:28s} sf0.1 {t_base:7.2f}s  x{n_copies} {t_big:7.2f}s  "
              f"ratio {t_big / max(t_base, 1e-9):5.1f}", flush=True)

    print(json.dumps({
        "metric": "scale_probe_10x",
        "n_copies": n_copies,
        "times": {n: {"sf0.1": a, "x10": b, "ratio": round(b / max(a, 1e-9), 2)}
                  for n, a, b in rows},
    }))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
