"""Hot-cap WALL proof on a planted-template corpus (round-8 verdict
item 6): the hot-key caps (`max_df` on the exact-jaccard shingle join,
`LSH_MAX_BUCKET` on the minhash band join) only ENGAGE on
boilerplate-heavy corpora — organic sf0.1 tops out at bucket size 12,
so the per-round bench never shows what the caps buy. This probe
plants the pathology: 30 % of the sf0.1 documents (1500 of 5000) have
their text replaced by a shared 60-token boilerplate template plus 10
doc-unique tokens — the "same cookie banner on every page of a big
site" shape — making every template shingle's df and every planted
band bucket ≈ 1500, past the 1024 caps.

Measured (one warm session, capped vs cap-disabled on the SAME
corpus): wall, output pairs, and the fan-out the cap removed. The
uncapped exact join must chew ~58 shingles × C(1500,2) ≈ 65M
intermediate pair rows; the capped form anti-joins those shingles
away before the pair join and keeps only the organic pairs. Results
recorded in SCALE.md ("Hot-cap wall proof").

Run: python tools/hotcap_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

PLANT_PCT = 3  # doc_id % 10 < 3 → 30 %
TEMPLATE_TOKENS = 60
UNIQUE_TOKENS = 10


def planted_corpus_pct(docs, tenths: int):
    """``tenths``/10 of docs become template + unique-tail; rest unchanged."""
    template = " ".join(f"tmpl{i}" for i in range(TEMPLATE_TOKENS))
    tail = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(UNIQUE_TOKENS - 1)),
            lambda j: F.concat(F.lit("u"), F.col("doc_id"), F.lit("x"), j),
        ),
        " ",
    )
    plant = F.concat(F.lit(template + " "), tail)
    return docs.withColumn(
        "text", F.when(F.pmod("doc_id", F.lit(10)) < tenths, plant).otherwise(F.col("text"))
    )


def planted_corpus(docs):
    return planted_corpus_pct(docs, PLANT_PCT)


def timed(label, df):
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    print(f"{label:>40}: {dt:7.2f}s  {n} pairs")
    return dt, n


def main() -> int:
    from gomapreduce_spark.operators import dedup
    from gomapreduce_spark.session import get_spark
    from gomapreduce_spark.sources.registry import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("hotcap_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = planted_corpus(load_table(spark, sf_dir, "documents")).localCheckpoint()
    n_docs = docs.count()
    n_planted = docs.where(F.pmod("doc_id", F.lit(10)) < PLANT_PCT).count()
    print(f"corpus: {n_docs} docs, {n_planted} planted with the shared template")

    # how hot are the planted keys? (reported directly; the queries
    # also observe this via their named CollectMetrics)
    sh = dedup.shingle_arrays(docs).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    hot = (
        sh.groupBy("s").agg(F.count("*").alias("df")).where(F.col("df") > 1024)
    )
    n_hot, max_df = hot.agg(
        F.count("*"), F.coalesce(F.max("df"), F.lit(0))
    ).first()
    print(f"planted hot shingles (df>1024): {n_hot}, max df {max_df}")

    # warmup the Arrow worker path once
    dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents")).count()

    jc = timed("ngram_jaccard_pairs capped(1024)", dedup.ngram_jaccard_pairs(docs))
    ju = timed("ngram_jaccard_pairs UNCAPPED", dedup.ngram_jaccard_pairs(docs, max_df=None))
    lc = timed("minhash_lsh_pairs capped(1024)", dedup.minhash_lsh_pairs(docs))
    lu = timed("minhash_lsh_pairs UNCAPPED", dedup.minhash_lsh_pairs(docs, max_bucket=1 << 40))

    print(
        f"\njaccard: cap bounds the join {ju[0] / jc[0]:.1f}x faster "
        f"({ju[1] - jc[1]} template pairs suppressed, one-sided under-report by design)"
    )
    print(
        f"lsh:     capped/uncapped wall {lc[0]:.2f}/{lu[0]:.2f}s, "
        f"{lu[1] - lc[1]} mega-bucket candidates suppressed (exact/paragraph "
        f"dedup owns those near-identical docs)"
    )

    # LSH crossover: suppressed pair volume grows QUADRATICALLY in
    # bucket size while the cap's agg+anti-join overhead is flat, so
    # the cap's wall win appears at hotter buckets than the jaccard
    # df cap's (whose uncapped form pays per shingle occurrence).
    # Double the planted share and the sign flips.
    hot_docs = planted_corpus_pct(load_table(spark, sf_dir, "documents"), 6).localCheckpoint()
    lc2 = timed("minhash_lsh 60% planted capped", dedup.minhash_lsh_pairs(hot_docs))
    lu2 = timed(
        "minhash_lsh 60% planted UNCAPPED", dedup.minhash_lsh_pairs(hot_docs, max_bucket=1 << 40)
    )
    print(
        f"lsh @60%: cap {lu2[0] / lc2[0]:.1f}x faster "
        f"({lu2[1] - lc2[1]} quadratic candidates suppressed)"
    )

    # PPJoin regime: hot boilerplate embedded in otherwise-DISSIMILAR
    # docs (a cookie banner prepended to every organic text). Here the
    # df cap is WRONG (banner shingles genuinely push some pairs over
    # the threshold — one-sided under-report made concrete), brute
    # force pays 18 hot shingles × C(n,2) join rows, and ppjoin's
    # prefix order puts the banner shingles LAST — out of every
    # prefix — so it returns the exact answer at bounded cost.
    banner = " ".join(f"cb{i}" for i in range(20)) + " "
    bdocs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("text", F.concat(F.lit(banner), F.col("text")))
        .localCheckpoint()
    )
    bdocs.count()
    pp = timed("ppjoin_pairs banner-100%", dedup.ppjoin_pairs(bdocs))
    bu = timed("ngram_jaccard UNCAPPED banner", dedup.ngram_jaccard_pairs(bdocs, max_df=None))
    bc = timed("ngram_jaccard capped banner", dedup.ngram_jaccard_pairs(bdocs))
    print(
        f"ppjoin: exact answer {bu[0] / pp[0]:.1f}x faster than brute force "
        f"(same {pp[1]} pairs); the capped form under-reports {bu[1] - bc[1]} pairs here"
    )

    # Snapshot-diff under SOURCE skew (round-9 verdict item 6): one
    # source owning 90 % of the corpus. Structural expectation: the
    # full-outer join keys on doc_id (uniform — skew CANNOT reach it),
    # and the only source-keyed stage is the (source, status) rollup,
    # whose hot group collapses map-side in the partial aggregate, so
    # the final exchange carries per-partition partials, not 90 % of
    # the rows. Wall parity with the uniform corpus is the proof.
    base = load_table(spark, sf_dir, "documents")
    skewed = base.withColumn(
        "source",
        F.when(F.pmod("doc_id", F.lit(10)) < 9, F.lit("megasource")).otherwise(
            F.col("source")
        ),
    ).localCheckpoint()
    skewed.count()
    du = timed("snapshot_diff uniform sources", dedup.corpus_snapshot_diff(
        base, dedup.synth_corpus_snapshot(base)))
    ds = timed("snapshot_diff 90%-one-source", dedup.corpus_snapshot_diff(
        skewed, dedup.synth_corpus_snapshot(skewed)))
    print(
        f"snapshot-diff skew: uniform {du[0]:.2f}s vs 90%-one-source {ds[0]:.2f}s "
        f"(x{ds[0] / max(du[0], 1e-9):.2f} — join keys on doc_id, hot source "
        f"collapses in the partial agg)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
