"""The named query inventory + DuckDB oracle SQL.

One entry per implemented operator from SURVEY §2 (reference rows O1-O12
have data semantics; O13-O27 are engine machinery that Spark subsumes)
plus the driver-mandated extensions (SURVEY §2.3). Every Spark query
aliases its computed columns to the same names as its oracle; integer
outputs are cast to BIGINT on both sides; float aggregates are rounded
identically; timestamps are emitted as formatted UTC strings.

The ONE query without an oracle entry gets the driver's weaker
rows-only check by design:
  - value_deciles_approx (percentile_approx merges partial GK sketches
    in shuffle-arrival order, which the scheduler does not fix — the
    cutpoints can wobble within the rank-error bound run-to-run, so a
    literal oracle would be flaky by construction; dual-bound tests —
    absolute sketch error AND per-decile agreement bands vs the exact
    ntile twin — are the compensating check)
approx_distinct_users graduated in round 8: HLL++ registers max-merge
(commutative/associative/idempotent), so unlike GK the sketch is a
pure function of the input set and tools/gen_hll_oracle.py precomputes
its VALUES oracle from a pure-python xxHash64 + HLL++ restatement.

knn_ivf / knn_pq / knn_ivf_pq ARE hash-oracled (round 7): every stage
is deterministic (fixed md5-seeded training, stable argsort ties,
first-match argmax), so tools/gen_ann_oracle.py precomputes their
expected output from an INDEPENDENT numpy restatement of the published
algorithms into VALUES tables (ann_expected.py), self-checked against
the live pipelines at generation time. heavy_hitters_approx is
hash-oracled against the EXACT top-k SQL: its head is provably exact
whenever every reported token survives each partition's local top-m
(asserted by tests on the fixtures), so the exact oracle doubles as a
live proof of head-exactness at the driver's check SF.

image_dhash_index and audio_spectral ARE hash-oracled despite being
non-SQL codec/FFT work: the pipelines are deterministic functions of
documents.text, so their expected outputs are precomputed into DuckDB
VALUES tables by an independent numpy reference
(tools/gen_codec_oracle.py, self-checked at generation; committed as
codec_expected.py) — on top of the exact-reference + planted-near-dup
codec tests in tests/test_multimodal_codecs.py.

Every streaming query IS hash-oracled: on a finite availableNow replay
the streaming results are deterministic functions of the input (windows,
sessions-flushable-at-final-watermark, interval joins, dedup), so each
has exact DuckDB SQL. Batch parity is ALSO asserted in
tests/test_streaming.py (stream == batch == oracle, three-way).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.skew import salted_counts
from .operators import (
    clustering,
    dedup,
    events,
    governance,
    linkage,
    multimodal,
    relational,
    similarity,
    text,
    web,
    wordcount,
)
from .operators.wordcount import WS_RE
from .sources import pushdown
from .sources.registry import load_table, profile_table
from .mapreduce import DemoMapper, DemoReducer, DataFrameInputer, JobConfig, MapReduceEngine, MemoryOutputer

QueryFn = Callable[[SparkSession, str], DataFrame]


def _t(name: str):
    def loader(spark: SparkSession, sf_dir: str) -> DataFrame:
        return load_table(spark, sf_dir, name)

    return loader


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------

def _keyedtext_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.keyedtext import keyedtext_roundtrip_wordcount

    return keyedtext_roundtrip_wordcount(spark, sf_dir)


def _mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the MapReduce facade — proves the reference's
    Mapper/Reducer/Inputer/Outputer path end-to-end (reference
    pkg_test.go:43-79 analog, with an actual output assertion via the
    oracle instead of completion-only)."""
    docs = load_table(spark, sf_dir, "documents")
    eng = MapReduceEngine(spark)
    out = MemoryOutputer()
    job_id = eng.submit(
        JobConfig(m=8, r=8),
        DemoMapper(),
        DemoReducer(),
        DataFrameInputer(docs, "doc_id", "text"),
        out,
        sync=True,
    )
    assert eng.status(job_id), "mapreduce job did not complete"
    df = spark.createDataFrame(
        [(k, int(v)) for k, v in out.results.items()], "word string, cnt long"
    )
    eng.done(job_id)
    return df


def _knn_against_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN against the standing IVF+PQ index: the index is built ONCE
    per source identity into the owner-private cache (sources/cache.py
    — same staleness/atomicity contract as events_partition_stats'
    layout) and every invocation serves the query batch from it — no
    training or corpus encode in the query path. Same parameters and
    query slice as knn_ivf_pq, so the output is bit-equal (parity-
    asserted in tests) and shares its independent VALUES oracle."""
    from .sources.cache import ensure_cached, identity_cache_dir

    src = f"{sf_dir}/embeddings.parquet"
    cache = identity_cache_dir("knn_index", src, "v1")
    ensure_cached(
        cache,
        lambda tmp: similarity.save_knn_index(load_table(spark, sf_dir, "embeddings"), tmp),
    )
    queries_df = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 10)
    return similarity.knn_against_index(spark, cache, queries_df)


def _contamination_against_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing-index decontamination, driver-runnable form: build (or
    overwrite) the bench window-hash index from the deterministic
    ``doc_id % 43 == 0`` eval slice, then screen the train slice
    against the persisted table. Equals contamination_spans on the
    same split (parity-asserted in tests), so it shares that oracle;
    what it additionally certifies is the PERSISTED index round trip —
    bucketed write, broadcast read, batch-only shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 43 == 0
    dedup.save_contamination_index(docs.where(is_bench), "contamination_index")
    return dedup.contamination_against_index(docs.where(~is_bench), "contamination_index")


# Ordering is priority-ordering: the driver records CORRECTNESS rows
# for only the FIRST ~50 entries, so the first 50 are (a) the reference
# core dataflow, (b) every entry that is NEW or whose implementation
# CHANGED this round (their previous green rows no longer vouch for the
# current code), and (c) entries with no row in round 1. The tail past
# 50 is exactly the queries that are UNCHANGED since their green
# round-1 hash-match and re-verified every run by pytest +
# tools/check_oracle.py, plus the streaming ops (rows-only by design,
# batch parity asserted in tests/test_streaming.py).
QUERIES: dict[str, QueryFn] = {
    # -- reference core dataflow (SURVEY §2.1) --
    "wordcount": lambda s, d: wordcount.word_count(load_table(s, d, "documents")),
    "mr_wordcount": _mr_wordcount,
    # the registered Python Data Source (O1-O3 reader/chunker + O12
    # sink) exercised end-to-end under the hash oracle (round 7)
    "keyedtext_wordcount": lambda s, d: _keyedtext_wordcount(s, d),
    "group_collect": lambda s, d: wordcount.group_collect(load_table(s, d, "documents")),
    "sum_reduce": lambda s, d: wordcount.sum_reduce(load_table(s, d, "events")),
    # -- no round-1 driver row --
    "multimodal_features": lambda s, d: multimodal.multimodal_features(load_table(s, d, "documents")),
    "frame_stats": lambda s, d: multimodal.frame_stats(load_table(s, d, "documents")),
    "audio_chunk_stats": lambda s, d: multimodal.audio_chunk_stats(load_table(s, d, "documents")),
    "array_funcs_showcase": lambda s, d: similarity.array_funcs_showcase(load_table(s, d, "embeddings")),
    "embedding_doc_join": lambda s, d: similarity.embedding_doc_join(
        load_table(s, d, "documents"), load_table(s, d, "embeddings")
    ),
    "knn_lsh": lambda s, d: similarity.knn_lsh(load_table(s, d, "embeddings")),
    "knn_ivf": lambda s, d: similarity.knn_ivf(load_table(s, d, "embeddings")),
    "knn_pq": lambda s, d: similarity.knn_pq(load_table(s, d, "embeddings")),
    "knn_ivf_pq": lambda s, d: similarity.knn_ivf_pq(load_table(s, d, "embeddings")),
    # -- round-14: ANN served from a PERSISTED index (no in-query
    # training/encoding) — bit-equal to knn_ivf_pq, shares its oracle
    "knn_against_index": lambda s, d: _knn_against_index(s, d),
    "approx_distinct_users": lambda s, d: events.approx_distinct_users(load_table(s, d, "events")),
    # -- NEW this round --
    "simhash_pairs": lambda s, d: dedup.simhash_pairs(load_table(s, d, "documents")),
    "heavy_hitters": lambda s, d: text.heavy_hitters(load_table(s, d, "documents")),
    "bigram_stats": lambda s, d: text.bigram_stats(load_table(s, d, "documents")),
    "stratified_sample": lambda s, d: text.stratified_sample(load_table(s, d, "documents")),
    "corpus_mixture": lambda s, d: text.corpus_mixture(load_table(s, d, "documents")),
    "benchmark_overlap": lambda s, d: dedup.benchmark_overlap(load_table(s, d, "documents")),
    "gopher_rules": lambda s, d: text.gopher_rules(load_table(s, d, "documents")),
    "repetition_stats": lambda s, d: text.repetition_stats(load_table(s, d, "documents")),
    "winnow_fingerprints": lambda s, d: text.winnow_fingerprints(load_table(s, d, "documents")),
    "pii_scrub": lambda s, d: text.pii_scrub(load_table(s, d, "documents")),
    "tf_idf": lambda s, d: text.tf_idf(load_table(s, d, "documents")),
    # postings is array<long> in the library API; flatten to a comma-joined
    # string here because the driver's comparator can't sort array cells
    "inverted_index": lambda s, d: text.inverted_index(load_table(s, d, "documents")).select(
        "token",
        "df",
        F.array_join(F.transform("postings", lambda x: x.cast("string")), ",").alias("postings"),
    ),
    "embedding_dedup_clusters": lambda s, d: dedup.embedding_dedup_clusters(
        load_table(s, d, "embeddings")
    ),
    # -- NEW round 4: training-data preparation ops --
    "chunk_documents": lambda s, d: text.chunk_documents(load_table(s, d, "documents")),
    "pack_training_sequences": lambda s, d: text.pack_training_sequences(
        load_table(s, d, "documents")
    ),
    "canonical_docs": lambda s, d: dedup.canonical_docs(load_table(s, d, "documents")),
    "leakage_safe_split": lambda s, d: dedup.leakage_safe_split(load_table(s, d, "documents")),
    # -- round-4 relational widening: inside the driver's check budget --
    "q14_promo_revenue": lambda s, d: relational.q14_promo_revenue(
        load_table(s, d, "lineitem"), load_table(s, d, "part")
    ),
    "q18_large_orders": lambda s, d: relational.q18_large_volume_orders(
        load_table(s, d, "customer"), load_table(s, d, "orders"), load_table(s, d, "lineitem")
    ),
    "q19_disjunctive_revenue": lambda s, d: relational.q19_disjunctive_revenue(
        load_table(s, d, "lineitem"), load_table(s, d, "part")
    ),
    "q16_supplier_parts": lambda s, d: relational.q16_supplier_part_counts(
        load_table(s, d, "lineitem"), load_table(s, d, "part")
    ),
    # -- round-5 relational widening: the last three distinctive TPC-H
    # -- shapes (grouped outer-join distribution, double-correlated
    # -- EXISTS/NOT-EXISTS, substring bucket + anti join + scalar avg) --
    "q13_customer_distribution": lambda s, d: relational.q13_customer_distribution(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    ),
    "q21_suppliers_kept_waiting": lambda s, d: relational.q21_suppliers_kept_waiting(
        load_table(s, d, "supplier"), load_table(s, d, "nation"),
        load_table(s, d, "orders"), load_table(s, d, "lineitem"),
    ),
    "q22_global_sales_opportunity": lambda s, d: relational.q22_global_sales_opportunity(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    ),
    # -- round-5 corpus hygiene: paragraph-level exact dedup manifest --
    "paragraph_dedup": lambda s, d: dedup.paragraph_dedup(load_table(s, d, "documents")),
    # -- round-5 quality signals: corpus-self-trained bigram-LM doc
    # -- scoring and frequent-span boilerplate audit --
    "lm_perplexity": lambda s, d: text.lm_perplexity(load_table(s, d, "documents")),
    "boilerplate_spans": lambda s, d: text.boilerplate_spans(load_table(s, d, "documents")),
    # -- round-5: production-shape incremental dedup (new batch checked
    # -- against the standing MinHash index, never a corpus self-join) --
    "incremental_dedup": lambda s, d: dedup.incremental_dedup(load_table(s, d, "documents")),
    # -- round-5 event analytics: ordered sequences, sliding distinct,
    # -- cohort retention --
    "ordered_funnel": lambda s, d: events.ordered_funnel(load_table(s, d, "events")),
    "rolling_active_users": lambda s, d: events.rolling_active_users(load_table(s, d, "events")),
    "retention_cohorts": lambda s, d: events.retention_cohorts(load_table(s, d, "events")),
    # -- round-5 real-codec multimodal: dHash fingerprint index over a
    # -- synthesized-but-really-decoded P6 corpus, and numpy-rfft
    # -- spectral features over a synthesized PCM WAV corpus. Rows-only
    # -- by design (perceptual hashing and FFTs are not SQL); the real
    # -- work is pinned by exact-reference and planted-near-dup tests
    # -- in tests/test_multimodal_codecs.py --
    # r15: fused synth→feature single Arrow pass (bit-identical — the
    # same batch generators chained Python-side; the synthetic payloads
    # never re-enter the JVM, one Python stage instead of two)
    "image_dhash_index": lambda s, d: multimodal.synth_image_dhashes(
        load_table(s, d, "documents")
    ),
    "audio_spectral": lambda s, d: multimodal.synth_audio_spectral(
        load_table(s, d, "documents")
    ),
    # -- round-12: the video leg — shot segmentation over a
    # -- synthesized-but-really-decoded concatenated-P6 frame stream;
    # -- hash-oracled via tools/gen_video_oracle.py (VALUES tables,
    # -- tri-SF, independent tiling/dhash/cut restatement) --
    # r15: fused synth→cuts single Arrow pass (see image_dhash_index)
    "video_scene_cuts": lambda s, d: multimodal.synth_video_scene_cuts(
        load_table(s, d, "documents")
    ),
    # -- round-13: per-shot representative-frame sampling (the video
    # -- step a pipeline trains on: one keyframe + dHash per shot);
    # -- same tri-SF independent-restatement oracle discipline --
    # r15: fused synth→shots single Arrow pass (see image_dhash_index)
    "video_shot_frames": lambda s, d: multimodal.synth_video_shot_frames(
        load_table(s, d, "documents")
    ),
    # -- round-6: record linkage, Markov transitions, BPE training --
    # -- step, sparse lexical similarity                            --
    "fuzzy_customer_links": lambda s, d: linkage.fuzzy_customer_links(
        load_table(s, d, "customer")
    ),
    "event_transition_matrix": lambda s, d: events.event_transition_matrix(
        load_table(s, d, "events")
    ),
    "bpe_pair_counts": lambda s, d: text.bpe_pair_counts(load_table(s, d, "documents")),
    "sparse_doc_similarity": lambda s, d: text.sparse_doc_similarity(
        load_table(s, d, "documents")
    ),
    "scd2_user_state": lambda s, d: events.scd2_user_state(load_table(s, d, "events")),
    "merge_upsert_customers": lambda s, d: relational.merge_upsert_customers(
        load_table(s, d, "customer")
    ),
    "interarrival_stats": lambda s, d: events.interarrival_stats(load_table(s, d, "events")),
    # -- round-7 additions --
    "session_window_stats": lambda s, d: events.session_window_stats(load_table(s, d, "events")),
    "incremental_user_rollup": lambda s, d: events.incremental_user_rollup(load_table(s, d, "events")),
    "pmi_collocations": lambda s, d: text.pmi_collocations(load_table(s, d, "documents")),
    "bpe_learn_merges": lambda s, d: text.bpe_learn_merges(load_table(s, d, "documents")),
    # the huge-dict escape hatch, registered at a small merge depth so
    # the production path carries its own driver hash row (round-9
    # verdict item 4): bit-exact with the driver loop by the parity
    # tests, so it shares the same independent VALUES oracle truncated
    # to rank <= 8
    "bpe_learn_merges_distributed": lambda s, d: text.bpe_learn_merges_distributed(
        load_table(s, d, "documents"), n_merges=8
    ),
    "bpe_encode_stats": lambda s, d: text.bpe_encode_stats(load_table(s, d, "documents")),
    "distinctive_terms": lambda s, d: text.distinctive_terms(load_table(s, d, "documents")),
    "source_overlap_matrix": lambda s, d: dedup.source_overlap_matrix(load_table(s, d, "documents")),
    "dedup_recall_audit": lambda s, d: dedup.dedup_recall_audit(load_table(s, d, "documents")),
    "hashed_features": lambda s, d: text.hashed_features(load_table(s, d, "documents")),
    "fixed_k_sample": lambda s, d: text.fixed_k_sample(load_table(s, d, "documents")),
    "mad_outliers": lambda s, d: events.mad_outliers(load_table(s, d, "events")),
    "lang_id_confusion": lambda s, d: text.lang_id_confusion(load_table(s, d, "documents")),
    "kmeans_embeddings": lambda s, d: clustering.kmeans_embeddings(load_table(s, d, "embeddings")),
    "semdedup_prune": lambda s, d: clustering.semdedup_prune(load_table(s, d, "embeddings")),
    "embedding_drift": lambda s, d: similarity.embedding_drift(load_table(s, d, "embeddings")),
    "hybrid_search": lambda s, d: similarity.hybrid_search(
        load_table(s, d, "documents"), load_table(s, d, "embeddings")
    ),
    "containment_pairs": lambda s, d: dedup.containment_pairs(load_table(s, d, "documents")),
    "translated_near_dups": lambda s, d: dedup.translated_near_dups(
        load_table(s, d, "documents"), load_table(s, d, "embeddings")
    ),
    "session_paths": lambda s, d: events.session_paths(load_table(s, d, "events")),
    "calibrated_quality": lambda s, d: text.calibrated_quality(load_table(s, d, "documents")),
    "lpa_communities": lambda s, d: dedup.lpa_communities(load_table(s, d, "documents")),
    "kmeans_incremental": lambda s, d: clustering.kmeans_incremental_update(
        load_table(s, d, "embeddings")
    ),
    "volume_anomalies": lambda s, d: events.volume_anomalies(load_table(s, d, "events")),
    "attribution_last_touch": lambda s, d: events.attribution_last_touch(
        load_table(s, d, "events")
    ),
    "html_boilerplate_strip": lambda s, d: text.html_boilerplate_strip(
        load_table(s, d, "documents")
    ),
    # -- round-5c: repeated-substring dedup, DSIR importance weights, --
    # -- token-budget sampling, GROUPING SETS, k-anonymity audit      --
    "duplicate_spans": lambda s, d: dedup.duplicate_spans(load_table(s, d, "documents")),
    # -- round-13: span-level decontamination (GPT-3 13-gram collisions) --
    "contamination_spans": lambda s, d: dedup.contamination_spans(
        load_table(s, d, "documents")
    ),
    # -- round-14: standing-benchmark contamination index (the
    # incremental_dedup shape for decontamination): persist the bench
    # window-hash set ONCE, screen the arriving batch against it.
    # Same split/params as contamination_spans, so it shares that
    # oracle; the saveAsTable is the production index build, keyed by
    # query name in the session warehouse
    "contamination_against_index": lambda s, d: _contamination_against_index(s, d),
    "dsir_weights": lambda s, d: text.dsir_weights(load_table(s, d, "documents")),
    "token_budget_sample": lambda s, d: text.token_budget_sample(load_table(s, d, "documents")),
    "grouping_sets_revenue": lambda s, d: relational.grouping_sets_revenue(
        load_table(s, d, "lineitem")
    ),
    "k_anonymity_audit": lambda s, d: events.k_anonymity_audit(load_table(s, d, "events")),
    # -- round-5d: iterative PageRank, Spark-4 VARIANT, Python UDTF --
    "pagerank_dedup_graph": lambda s, d: dedup.pagerank_dedup_graph(
        load_table(s, d, "documents")
    ),
    "variant_props_stats": lambda s, d: events.variant_props_stats(load_table(s, d, "events")),
    "chunk_documents_udtf": lambda s, d: text.chunk_documents_udtf(load_table(s, d, "documents")),
    "full_outer_user_activity": lambda s, d: events.full_outer_user_activity(
        load_table(s, d, "events")
    ),
    "map_funcs_showcase": lambda s, d: events.map_funcs_showcase(load_table(s, d, "events")),
    "math_funcs_showcase": lambda s, d: events.math_funcs_showcase(load_table(s, d, "events")),
    "quality_classifier": lambda s, d: text.quality_classifier(load_table(s, d, "documents")),
    "hard_negative_mining": lambda s, d: similarity.hard_negative_mining(
        load_table(s, d, "embeddings")
    ),
    "regression_stats": lambda s, d: events.regression_stats(load_table(s, d, "events")),
    "corpus_quality_report": lambda s, d: text.corpus_quality_report(
        load_table(s, d, "documents")
    ),
    "bm25_search": lambda s, d: text.bm25_search(load_table(s, d, "documents")),
    "distribution_drift": lambda s, d: events.distribution_drift(load_table(s, d, "events")),
    "ngram_novelty": lambda s, d: dedup.ngram_novelty(load_table(s, d, "documents")),
    "triangle_stats": lambda s, d: dedup.triangle_stats(load_table(s, d, "documents")),
    "vocab_coverage": lambda s, d: text.vocab_coverage(load_table(s, d, "documents")),
    "monthly_revenue_trend": lambda s, d: relational.monthly_revenue_trend(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    ),
    "bloom_decontamination": lambda s, d: dedup.bloom_decontamination(
        load_table(s, d, "documents")
    ),
    # -- round-5b: the final eight TPC-H patterns — all 22 shapes now --
    # -- covered (partsupp-less fixture adaptations documented on each --
    # -- function) --
    "q2_min_cost_supplier": lambda s, d: relational.q2_min_cost_supplier(
        load_table(s, d, "part"), load_table(s, d, "supplier"), load_table(s, d, "nation"),
        load_table(s, d, "region"), load_table(s, d, "lineitem"),
    ),
    "q7_nation_volume": lambda s, d: relational.q7_nation_volume_shipping(
        load_table(s, d, "supplier"), load_table(s, d, "nation"), load_table(s, d, "customer"),
        load_table(s, d, "orders"), load_table(s, d, "lineitem"),
    ),
    "q8_market_share": lambda s, d: relational.q8_market_share(
        load_table(s, d, "part"), load_table(s, d, "supplier"), load_table(s, d, "nation"),
        load_table(s, d, "region"), load_table(s, d, "customer"), load_table(s, d, "orders"),
        load_table(s, d, "lineitem"),
    ),
    "q9_product_profit": lambda s, d: relational.q9_product_profit(
        load_table(s, d, "part"), load_table(s, d, "supplier"), load_table(s, d, "nation"),
        load_table(s, d, "orders"), load_table(s, d, "lineitem"),
    ),
    "q11_important_parts": lambda s, d: relational.q11_important_parts(
        load_table(s, d, "lineitem"), load_table(s, d, "supplier"), load_table(s, d, "nation"),
    ),
    "q12_late_by_returnflag": lambda s, d: relational.q12_late_lines_by_returnflag(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    ),
    "q15_top_supplier": lambda s, d: relational.q15_top_supplier(
        load_table(s, d, "supplier"), load_table(s, d, "lineitem")
    ),
    "q20_excess_suppliers": lambda s, d: relational.q20_excess_suppliers(
        load_table(s, d, "supplier"), load_table(s, d, "nation"), load_table(s, d, "part"),
        load_table(s, d, "lineitem"),
    ),
    "trimmed_mean_distributed": lambda s, d: events.trimmed_mean_distributed(load_table(s, d, "events")),
    "value_deciles_approx": lambda s, d: events.value_deciles_approx(load_table(s, d, "events")),
    # repartition(1) verification twin — ONE partial GK sketch, no
    # order-dependent merge, single sorted head-buffer flush => pure
    # function of the value multiset at the oracle SF; hash-oracled via
    # the independent restatement in tools/gen_vda_oracle.py
    "value_deciles_approx_seq": lambda s, d: events.value_deciles_approx(
        load_table(s, d, "events"), sequential=True
    ),
    # hash-stable certificate for the LIVE multi-sketch merge path
    # (round-13 verdict item 2): outputs only the deterministic
    # rank-bound verdict, so the driver can green-check the very path
    # value_deciles_approx leaves rows-only by design
    "value_deciles_bounds": lambda s, d: events.value_deciles_bounds(load_table(s, d, "events")),
    "heavy_hitters_approx": lambda s, d: text.heavy_hitters_approx(load_table(s, d, "documents")),
    # -- implementation CHANGED this round (re-verify) --
    "token_stats": lambda s, d: text.token_stats(load_table(s, d, "documents")),
    "quality_score": lambda s, d: text.quality_score(load_table(s, d, "documents")),
    "weighted_sample": lambda s, d: text.weighted_sample(load_table(s, d, "documents")),
    "lang_id": lambda s, d: text.lang_id(load_table(s, d, "documents")),
    "doc_fingerprint": lambda s, d: text.doc_fingerprint(load_table(s, d, "documents")),
    "exact_dedup": lambda s, d: dedup.exact_dedup(load_table(s, d, "documents")),
    "ngram_jaccard_pairs": lambda s, d: dedup.ngram_jaccard_pairs(load_table(s, d, "documents")),
    "ppjoin_pairs": lambda s, d: dedup.ppjoin_pairs(load_table(s, d, "documents")),
    "corpus_snapshot_diff": lambda s, d: dedup.corpus_snapshot_diff(
        load_table(s, d, "documents"),
        dedup.synth_corpus_snapshot(load_table(s, d, "documents")),
    ),
    # -- round-10: URL/domain governance (C4/CCNet domain hygiene) --
    "url_canonicalize": lambda s, d: web.url_canonicalize(load_table(s, d, "documents")),
    "domain_rollup": lambda s, d: web.domain_rollup(load_table(s, d, "documents")),
    "blocklist_filter": lambda s, d: web.blocklist_filter(load_table(s, d, "documents")),
    # -- round-11: provenance manifest + e2e certification + PSL --
    "doc_provenance": lambda s, d: governance.doc_provenance(load_table(s, d, "documents")),
    "corpus_dedup_e2e": lambda s, d: governance.corpus_dedup_e2e(load_table(s, d, "documents")),
    "domain_rollup_psl": lambda s, d: web.domain_rollup_psl(load_table(s, d, "documents")),
    # -- round-12: full-pipeline ingest certification --
    "corpus_ingest_e2e": lambda s, d: governance.corpus_ingest_e2e(load_table(s, d, "documents")),
    # -- round-12: parquet aggregate pushdown (footer-only stats) --
    # reads the raw parquet path (not load_table): the pushdown needs a
    # bare scan→aggregate plan — no rebalance repartition, no column
    # normalization — so the footers answer it without touching a page.
    # numeric columns only: DSv2 declines timestamp/string min-max
    # (all-or-nothing), pinned by tests/test_pushdown.py
    "lineitem_footer_stats": lambda s, d: pushdown.footer_stats(
        s,
        f"{d}/lineitem.parquet",
        ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"],
    ),
    # -- round-13: the grouped pushdown leg (PushedGroupBy) --
    # per-event-type stats from a Hive-partitioned layout's footers;
    # layout materialized once into a source-identity-keyed cache, so
    # the measured query is listing + footers only (plan-gated)
    "events_partition_stats": lambda s, d: pushdown.events_partition_stats(s, d),
    "minhash_signatures": lambda s, d: dedup.minhash_signatures(load_table(s, d, "documents")),
    "minhash_lsh_pairs": lambda s, d: dedup.minhash_lsh_pairs(load_table(s, d, "documents")),
    "simhash": lambda s, d: dedup.simhash(load_table(s, d, "documents")),
    "dedup_clusters": lambda s, d: dedup.dedup_clusters(load_table(s, d, "documents")),
    "embedding_near_dup": lambda s, d: dedup.embedding_near_dup(load_table(s, d, "embeddings")),
    "knn_bruteforce": lambda s, d: similarity.knn_bruteforce(load_table(s, d, "embeddings")),
    "training_corpus": lambda s, d: text.training_corpus(
        load_table(s, d, "documents"), load_table(s, d, "embeddings")
    ),
    "profile_events": lambda s, d: profile_table(load_table(s, d, "events")),
    "q3_top_orders": lambda s, d: relational.q3_top_orders(
        load_table(s, d, "customer"), load_table(s, d, "orders"), load_table(s, d, "lineitem")
    ),
    "q10_returned_items": lambda s, d: relational.q10_returned_items(
        load_table(s, d, "customer"), load_table(s, d, "orders"), load_table(s, d, "lineitem")
    ),
    # -- unchanged relational/event spot-checks filling the budget;   --
    # -- with the round-5 promotions these sit just past position 50  --
    # -- (all carry green prior-round hash rows), checked only if the --
    # -- driver's cap allows                                          --
    "q1_pricing_summary": lambda s, d: relational.q1_pricing_summary(load_table(s, d, "lineitem")),
    "q6_forecast_revenue": lambda s, d: relational.q6_forecast_revenue(load_table(s, d, "lineitem")),
    "q5_local_supplier": lambda s, d: relational.q5_local_supplier_volume(
        load_table(s, d, "region"), load_table(s, d, "nation"), load_table(s, d, "customer"),
        load_table(s, d, "supplier"), load_table(s, d, "orders"), load_table(s, d, "lineitem"),
    ),
    "q17_small_quantity": lambda s, d: relational.q17_small_quantity_revenue(
        load_table(s, d, "lineitem"), load_table(s, d, "part")
    ),
    "q4_late_shipments": lambda s, d: relational.q4_late_shipments(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    ),
    "asof_join_orders": lambda s, d: events.asof_join_orders(
        load_table(s, d, "events"), load_table(s, d, "orders")
    ),
    "range_join_shipments": lambda s, d: events.range_join_shipments(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    ),
    "sessionize": lambda s, d: events.sessionize(load_table(s, d, "events")),
    "percentile_stats": lambda s, d: events.percentile_stats(load_table(s, d, "events")),
    # ---- ~50-entry budget line (exact boundary: see the promotion   ----
    # ---- note after the streaming entries): entries below are       ----
    # ---- UNCHANGED since their green                                ----
    # ---- round-1 rows (re-verified by pytest + check_oracle.py) and ----
    # ---- cede driver-check priority.                                ----
    "topk_per_group": lambda s, d: relational.topk_per_group(load_table(s, d, "lineitem")),
    "lateral_topk_orders": lambda s, d: relational.lateral_topk_orders(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    ),
    "rollup_revenue": lambda s, d: relational.rollup_revenue(load_table(s, d, "lineitem")),
    "anti_join_customers": lambda s, d: relational.customers_without_orders(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    ),
    "semi_join_big_spenders": lambda s, d: relational.big_spenders_semi_join(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    ),
    "order_status_pivot": lambda s, d: relational.order_status_pivot(load_table(s, d, "orders")),
    "tumbling_window_counts": lambda s, d: events.tumbling_counts(load_table(s, d, "events")),
    "running_totals": lambda s, d: events.running_user_totals(load_table(s, d, "events")),
    "sliding_window_counts": lambda s, d: events.sliding_window_counts(load_table(s, d, "events")),
    "cube_by_type_hour": lambda s, d: events.cube_by_type_hour(load_table(s, d, "events")),
    "funnel_set_ops": lambda s, d: events.funnel_set_ops(load_table(s, d, "events")),
    "json_props_stats": lambda s, d: events.json_props_stats(load_table(s, d, "events")),
    "latest_event_per_user": lambda s, d: events.latest_event_per_user(load_table(s, d, "events")),
    "value_deciles": lambda s, d: events.value_deciles(load_table(s, d, "events")),
    "value_prop_correlation": lambda s, d: events.value_prop_correlation(load_table(s, d, "events")),
    "trimmed_mean_by_type": lambda s, d: events.trimmed_mean_by_type(load_table(s, d, "events")),
    "distinct_words": lambda s, d: wordcount.distinct_words(load_table(s, d, "documents")),
    "string_funcs_showcase": lambda s, d: text.string_funcs_showcase(load_table(s, d, "documents")),
    "date_funcs_showcase": lambda s, d: relational.date_funcs_showcase(load_table(s, d, "orders")),
    "window_rank_showcase": lambda s, d: events.window_rank_showcase(load_table(s, d, "events")),
    "salted_user_counts": lambda s, d: salted_counts(load_table(s, d, "events"), "user_id"),
}


def _streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_tumbling_counts

    return streaming_tumbling_counts(spark, f"{sf_dir}/events.parquet")


def _streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_sliding_counts

    return streaming_sliding_counts(spark, f"{sf_dir}/events.parquet")


def _streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_stateful_sessions

    return streaming_stateful_sessions(spark, f"{sf_dir}/events.parquet")


def _streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_click_purchase_join

    return streaming_click_purchase_join(spark, f"{sf_dir}/events.parquet")


def _streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_session_windows

    return streaming_session_windows(spark, f"{sf_dir}/events.parquet")


def _streaming_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_gopher_filter

    return streaming_gopher_filter(spark, f"{sf_dir}/documents.parquet")


def _streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_dedup_events

    # ts emitted as exact integer micros: hash-stable across engines
    # (timestamp cells would compare via string formatting instead)
    return streaming_dedup_events(spark, f"{sf_dir}/events.parquet").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


QUERIES["streaming_tumbling_counts"] = _streaming_tumbling
QUERIES["streaming_sliding_counts"] = _streaming_sliding
QUERIES["streaming_stateful_sessions"] = _streaming_sessions
QUERIES["streaming_interval_join"] = _streaming_interval_join
QUERIES["streaming_session_windows"] = _streaming_session_windows
QUERIES["streaming_dedup_events"] = _streaming_dedup
QUERIES["streaming_gopher_filter"] = _streaming_gopher


def _streaming_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_contamination_filter

    return streaming_contamination_filter(spark, f"{sf_dir}/documents.parquet")


# equals contamination_spans row-for-row on a finite replay (stateless
# stream-static membership join; order-free sorted-array union fold),
# so it carries the batch form's full value-hash oracle
QUERIES["streaming_contamination_filter"] = _streaming_contamination


def _streaming_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_static_enrichment

    return streaming_static_enrichment(
        spark, f"{sf_dir}/events.parquet", load_table(spark, sf_dir, "customer")
    )


# deterministic row-level stream-static join — like every streaming
# entry it is fully hash-oracled; all eight round-4 streaming queries
# carry green r04 hash rows, so round 5 cedes their priority slots to
# the new entries (see _CHANGED_THIS_ROUND below).
QUERIES["streaming_static_enrichment"] = _streaming_enrichment


def _streaming_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_weighted_sample

    return streaming_weighted_sample(
        spark, f"{sf_dir}/documents.parquet", load_table(spark, sf_dir, "documents")
    )


# stateless row-level importance thinning calibrated by the static
# snapshot: on a finite replay of the same corpus the output equals
# batch weighted_sample, so it shares that full value-hash oracle
QUERIES["streaming_weighted_sample"] = _streaming_weighted_sample


def _streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_left_outer_interval_join

    return streaming_left_outer_interval_join(spark, f"{sf_dir}/events.parquet")


QUERIES["streaming_left_outer_join"] = _streaming_left_outer_join


def _streaming_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_full_outer_interval_join

    return streaming_full_outer_interval_join(spark, f"{sf_dir}/events.parquet")


QUERIES["streaming_full_outer_join"] = _streaming_full_outer_join


def _streaming_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_chained_windows

    return streaming_chained_windows(spark, f"{sf_dir}/events.parquet")


QUERIES["streaming_chained_windows"] = _streaming_chained_windows


def _streaming_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import streaming_transition_matrix

    return streaming_transition_matrix(spark, f"{sf_dir}/events.parquet")


# stateful per-user last-event chaining; on a finite replay its step
# emissions equal the batch lead() pairs, so it shares the batch
# operator's oracle (assigned after the ORACLES dict below)
QUERIES["streaming_transition_matrix"] = _streaming_transition_matrix

# Driver-check priority: the driver records CORRECTNESS rows for only
# the first ~50 entries, so the front of the dict is rebuilt each
# round. Round 14 executes the round-13 verdict's rotation order
# (item 1), stalest-first: the ENTIRE 41-query r10-stale block (the
# only queries whose last driver row is older than r11 after r13) in
# registration order; then the four round-14 additions
# (value_deciles_bounds closes the last designed oracle hole with a
# hash-stable certificate of the LIVE GK merge path;
# contamination_against_index and knn_against_index are the
# standing-index production forms; streaming_contamination_filter the
# streaming decontamination screen); then the three queries whose
# implementation changed this round (contamination_spans dropped its
# corpus-sized localCheckpoint for the split-before-tokenize form —
# values verified unchanged; events_partition_stats moved to the
# hardened owner-private atomic cache with partition type inference
# disabled; embedding_near_dup gained the scale-derived
# n_planes/n_tables default — derived == pinned at every fixture SF,
# values verified unchanged); then two r11-stale backfills to fill
# the 50-row budget. After r14 no registered query's last driver row
# is older than r11. Every entry is still re-verified each round by
# pytest + tools/check_oracle.py regardless of position.
_R14_PRIORITY = [
    # (a) the complete r10-stale pool, registration order
    'image_dhash_index',
    'audio_spectral',
    'event_transition_matrix',
    'bpe_pair_counts',
    'sparse_doc_similarity',
    'scd2_user_state',
    'merge_upsert_customers',
    'bpe_learn_merges_distributed',
    'dedup_recall_audit',
    'html_boilerplate_strip',
    'pagerank_dedup_graph',
    'variant_props_stats',
    'triangle_stats',
    'weighted_sample',
    'ppjoin_pairs',
    'corpus_snapshot_diff',
    'dedup_clusters',
    'q4_late_shipments',
    'asof_join_orders',
    'range_join_shipments',
    'percentile_stats',
    'topk_per_group',
    'rollup_revenue',
    'anti_join_customers',
    'semi_join_big_spenders',
    'order_status_pivot',
    'tumbling_window_counts',
    'running_totals',
    'cube_by_type_hour',
    'funnel_set_ops',
    'json_props_stats',
    'latest_event_per_user',
    'value_deciles',
    'value_prop_correlation',
    'trimmed_mean_by_type',
    'distinct_words',
    'string_funcs_showcase',
    'date_funcs_showcase',
    'salted_user_counts',
    'streaming_weighted_sample',
    'streaming_transition_matrix',
    # (b) NEW in round 14 — no driver row exists yet
    "value_deciles_bounds",           # live-sketch rank-bound certificate (r13 verdict item 2)
    "contamination_against_index",    # standing-benchmark index screen (r13 verdict item 4)
    "knn_against_index",              # ANN served from the persisted IVF+PQ index (r13 verdict item 5)
    "streaming_contamination_filter", # streaming decontamination screen (r13 verdict item 6)
    # (c) implementation changed in round 14 (re-row)
    "contamination_spans",            # r13 (checkpoint-removal refactor)
    "events_partition_stats",         # r13 (hardened cache + inference off)
    "embedding_near_dup",             # r13 (scale-derived LSH defaults)
    # (d) r11-stale backfill to the 50-row budget, registration order
    'knn_ivf',                        # r11
    'knn_pq',                         # r11
]
_order = [n for n in QUERIES if n not in _R14_PRIORITY]
_order[0:0] = _R14_PRIORITY
QUERIES = {k: QUERIES[k] for k in _order}


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (tables pre-registered as views by the driver)
# ---------------------------------------------------------------------------

_H = "('0x' || substr(md5({s}), 1, 15))::BIGINT"

_TOKS = f"list_filter(regexp_split_to_array(text, '{WS_RE}'), x -> strlen(x) > 0)"

_SHINGLES = rf"""
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
  WHERE len(t) >= 3
)"""

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_PHONE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
_PII_SCRUBBED = (
    "regexp_replace(regexp_replace(regexp_replace(text, "
    f"'{_PII_EMAIL}', '[EMAIL]', 'g'), "
    f"'{_PII_IP}', '[IP]', 'g'), "
    f"'{_PII_PHONE}', '[PHONE]', 'g')"
)
_PII_ORACLE = f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_emails,
               len(regexp_extract_all(text, '{_PII_IP}'))::BIGINT AS n_ips,
               len(regexp_extract_all(text, '{_PII_PHONE}'))::BIGINT AS n_phones,
               {_H.format(s=_PII_SCRUBBED)} AS scrub_hash
        FROM documents
    """

ORACLE_MINHASH_LSH = f"""
        WITH {_SHINGLES},
        ab AS (
          SELECT doc_id,
                 ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS a,
                 ('0x' || substr(md5(shingle), 17, 15))::BIGINT & ((1::BIGINT << 59) - 1) AS b
          FROM sh
        ),
        sig AS (
          SELECT doc_id, i AS hash_idx,
                 min((a + i * b) & ((1::BIGINT << 60) - 1)) AS minhash
          FROM ab, unnest(range(0, 8)) AS u(i)
          GROUP BY 1, 2
        ),
        banded AS (
          SELECT doc_id, (hash_idx // 2)::INT AS band,
                 {_H.format(s="string_agg(hash_idx || ':' || minhash, ',' ORDER BY hash_idx || ':' || minhash)")} AS band_hash
          FROM sig GROUP BY doc_id, (hash_idx // 2)::INT
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(avg(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END), 6) AS est_jaccard
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_a
        JOIN sig sb ON sb.doc_id = doc_b AND sb.hash_idx = sa.hash_idx
        GROUP BY doc_a, doc_b
    """

_SIMHASH_SQL = f"""toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        w AS (
          SELECT doc_id, tok, count(*) AS w, {_H.format(s='tok')} AS h
          FROM toks GROUP BY doc_id, tok
        ),
        votes AS (
          SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END) AS v
          FROM w, unnest(range(0, 48)) AS u(b)
          GROUP BY doc_id, b
        ),
        sim AS (
          SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
          FROM votes GROUP BY doc_id
        )"""

# the canonical_docs cluster/quality CTE chain against a
# parameterizable source table — the SINGLE statement of the LSH →
# components → quality → keep pipeline's oracle SQL, used by the
# canonical_docs / leakage_safe_split entries below and reused by the
# round-11 provenance manifest and e2e certification row (so a future
# change to the pipeline's reference semantics edits ONE place).
# through="labels" stops after the components — pairs..labels plus a
# `base` CTE covering EVERY doc with self-coalesced labels — for
# consumers that need only cluster ids (the leakage_safe_split oracle,
# which would otherwise pay the full-text quality scan and per-cluster
# keep window it never reads); through="keepd" (default) is the full
# chain ending in (doc_id, cluster_id, cluster_size, quality, keep).
def _cluster_ctes(tbl: str, through: str = "keepd") -> str:
    lsh = ORACLE_MINHASH_LSH.replace("FROM documents", f"FROM {tbl}")
    head = rf"""
    pairs AS ({lsh}),
    edges AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= 0.5),
    und AS (SELECT doc_a AS a, doc_b AS b FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    labels AS (SELECT a AS doc_id, least(min(b), a) AS cluster_id FROM reach GROUP BY a)"""
    if through == "labels":
        return (
            head
            + rf""",
    base AS (
      SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
      FROM (SELECT doc_id FROM {tbl}) d
      LEFT JOIN labels l ON d.doc_id = l.doc_id
    )"""
        )
    assert through == "keepd", through
    return head + rf""",
    sizes AS (SELECT cluster_id, count(*) AS n FROM labels GROUP BY 1),
    qual AS (
      SELECT doc_id,
             round(0.3 * least(len(t)::DOUBLE / 100.0, 1.0)
                   + 0.3 * least(len(list_filter(t, x -> x IN ('the','a','of','and','is','to','in')))::DOUBLE
                                 / greatest(len(t), 1) * 5, 1.0)
                   + 0.2 * (len(list_distinct(t))::DOUBLE / greatest(len(t), 1))
                   + 0.2 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                            / greatest(length(text), 1)), 6) AS quality
      FROM (SELECT doc_id, text, {_TOKS} AS t FROM {tbl})
    ),
    j AS (
      SELECT q.doc_id,
             coalesce(l.cluster_id, q.doc_id) AS cluster_id,
             coalesce(s.n, 1)::BIGINT AS cluster_size,
             q.quality
      FROM qual q
      LEFT JOIN labels l ON q.doc_id = l.doc_id
      LEFT JOIN sizes s ON l.cluster_id = s.cluster_id
    ),
    keepd AS (
      SELECT doc_id, cluster_id, cluster_size, quality,
             row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) = 1 AS keep
      FROM j
    )"""


# the leakage-safe split assignment (60-bit seeded hash of the cluster
# id, mod 100) — single-sourced for the leakage_safe_split oracle and
# the governance manifests
_SPLIT_BUCKET = f"{_H.format(s=chr(39) + 'split:' + chr(39) + ' || cluster_id::VARCHAR')} % 100"
_SPLIT_CASE = f"""CASE WHEN {_SPLIT_BUCKET} < 10 THEN 'test'
                       WHEN {_SPLIT_BUCKET} < 20 THEN 'validation'
                       ELSE 'train' END"""

ORACLES: dict[str, str] = {
    "wordcount": r"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(text, '[\s  \p{Zs}]+')) AS word FROM documents)
        WHERE strlen(word) > 0
        GROUP BY word
    """,
    "mr_wordcount": r"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(text, '[\s  \p{Zs}]+')) AS word FROM documents)
        WHERE strlen(word) > 0
        GROUP BY word
    """,
    # the keyedtext roundtrip writes its fixed-size documents subset
    # (doc_id % 50 = 0, doc_id < 2500) through the sink
    # and word-counts what the chunked reader returns — line-aligned
    # chunks with '\n' a token separator make it equal to counting the
    # subset's raw text, which is what this computes from the parquet
    "keyedtext_wordcount": r"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(text, '[\s  \p{Zs}]+')) AS word FROM documents WHERE doc_id % 50 = 0 AND doc_id < 2500)
        WHERE strlen(word) > 0
        GROUP BY word
    """,
    "distinct_words": r"""
        SELECT DISTINCT word
        FROM (SELECT unnest(regexp_split_to_array(text, '[\s  \p{Zs}]+')) AS word FROM documents)
        WHERE strlen(word) > 0
    """,
    "group_collect": """
        SELECT lang AS key,
               array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
               count(*) AS n_docs
        FROM documents GROUP BY lang
    """,
    "sum_reduce": """
        SELECT event_type AS key, round(sum(value), 4) AS total, count(*) AS n
        FROM events GROUP BY event_type
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "q3_top_orders": """
        WITH rev AS (
          SELECT o_orderkey, o_orderdate, o_orderpriority,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
          GROUP BY 1, 2, 3
        )
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority, revenue,
               (row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC))::BIGINT AS rk
        FROM rev QUALIFY rk <= 10
    """,
    "q5_local_supplier": """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN supplier ON s_nationkey = n_nationkey
        JOIN lineitem ON l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
        WHERE r_name IN ('ASIA', 'AMERICA')
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "topk_per_group": """
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               (row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))::BIGINT AS rk
        FROM lineitem QUALIFY rk <= 5
    """,
    # the IDENTICAL correlated-LATERAL text Spark runs — both engines
    # decorrelate it (Spark to WindowGroupLimit + equi-join)
    "lateral_topk_orders": """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
        WHERE c.c_custkey % 50 = 0
    """,
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q17_small_quantity": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    "anti_join_customers": """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY c_mktsegment
    """,
    "q4_late_shipments": """
        SELECT o_orderpriority, count(*) AS n_late_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + 5184000000000
        )
        GROUP BY o_orderpriority
    """,
    "q10_returned_items": """
        WITH rev AS (
          SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R'
          GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, c_mktsegment, revenue,
               (row_number() OVER (ORDER BY revenue DESC, c_custkey ASC))::BIGINT AS rk
        FROM rev JOIN customer ON o_custkey = c_custkey
        QUALIFY rk <= 20
    """,
    "semi_join_big_spenders": """
        SELECT c_mktsegment, count(*) AS n_customers, round(avg(c_acctbal), 6) AS avg_acctbal
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        GROUP BY c_mktsegment
    """,
    "asof_join_orders": """
        WITH o AS (
          SELECT o_custkey, o_orderdate,
                 max(o_orderkey) AS o_orderkey,
                 arg_max(o_totalprice, o_orderkey) AS o_totalprice
          FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
               o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
        FROM events e ASOF JOIN o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "sliding_window_counts": """
        SELECT event_id, user_id,
               count(*) OVER w AS n_trailing_hour,
               round(sum(value) OVER w, 4) AS sum_trailing_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "cube_by_type_hour": """
        SELECT event_type, hour(ts)::BIGINT AS hour_of_day,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY CUBE (event_type, hour(ts)::BIGINT)
    """,
    "percentile_stats": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
    """,
    "funnel_set_ops": """
        WITH click AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
             purch AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        SELECT 'click_and_purchase' AS segment, count(*) AS n_users
          FROM (SELECT user_id FROM click INTERSECT SELECT user_id FROM purch)
        UNION ALL
        SELECT 'click_only', count(*) FROM (SELECT user_id FROM click EXCEPT SELECT user_id FROM purch)
        UNION ALL
        SELECT 'purchase_only', count(*) FROM (SELECT user_id FROM purch EXCEPT SELECT user_id FROM click)
        UNION ALL
        SELECT 'click_or_purchase', count(*) FROM (SELECT user_id FROM click UNION SELECT user_id FROM purch)
    """,
    "json_props_stats": """
        SELECT event_type, count(*) AS n,
               round(avg(k), 6) AS avg_k,
               min(k)::BIGINT AS min_k,
               max(k)::BIGINT AS max_k
        FROM (SELECT event_type, json_extract(props, '$.k')::INT AS k FROM events)
        GROUP BY event_type
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    "salted_user_counts": """
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    """,
    "value_deciles": """
        SELECT decile, count(*) AS n, round(min(value), 4) AS lo, round(max(value), 4) AS hi
        FROM (SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS decile FROM events)
        GROUP BY decile
    """,
    "range_join_shipments": """
        WITH ship AS (
          SELECT o2.o_custkey AS custkey, epoch_us(l.l_shipdate) AS s_us
          FROM lineitem l JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
        )
        SELECT o.o_orderkey, count(s.s_us) AS n_shipments_90d
        FROM orders o LEFT JOIN ship s
          ON s.custkey = o.o_custkey
         AND s.s_us >= epoch_us(o.o_orderdate)
         AND s.s_us <= epoch_us(o.o_orderdate) + 7776000000000
        GROUP BY 1
    """,
    "window_rank_showcase": """
        WITH r AS (
          SELECT event_type, event_id,
                 row_number() OVER w AS rn,
                 rank() OVER w AS rnk,
                 dense_rank() OVER w AS drnk,
                 round(percent_rank() OVER w, 6) AS prnk,
                 round(cume_dist() OVER w, 6) AS cdist,
                 lag(value, 1) OVER w AS prev_value,
                 lead(value, 1) OVER w AS next_value
          FROM events
          WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
        )
        SELECT event_type, event_id, rnk, drnk, prnk, cdist, prev_value, next_value
        FROM r WHERE rn % 500 = 0
    """,
    "profile_events": """
        SELECT 'event_id' AS col_name, count(*) AS n_rows,
               sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
               count(DISTINCT event_id) AS n_distinct,
               min(event_id)::VARCHAR AS min_value, max(event_id)::VARCHAR AS max_value
        FROM events
        UNION ALL
        SELECT 'ts', count(*), sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT ts), strftime(min(ts), '%Y-%m-%d %H:%M:%S'),
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') FROM events
        UNION ALL
        SELECT 'user_id', count(*), sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT user_id), min(user_id)::VARCHAR, max(user_id)::VARCHAR FROM events
        UNION ALL
        SELECT 'event_type', count(*), sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT event_type), min(event_type), max(event_type) FROM events
        UNION ALL
        SELECT 'value', count(*), sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT value), min(value)::VARCHAR, max(value)::VARCHAR FROM events
        UNION ALL
        SELECT 'props', count(*), sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT props), min(props), max(props) FROM events
    """,
    "trimmed_mean_by_type": """
        WITH r AS (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events
        )
        SELECT event_type, round(avg(value), 6) AS trimmed_mean, count(*) AS n_kept
        FROM r
        WHERE rn > floor(n * 0.1)::BIGINT AND rn <= n - floor(n * 0.1)::BIGINT
        GROUP BY event_type
    """,
    # the distributed rank-filter form computes the same result as the
    # applyInPandas form — one oracle, two physical strategies
    "trimmed_mean_distributed": """
        WITH r AS (
          SELECT event_type, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events
        )
        SELECT event_type, round(avg(value), 6) AS trimmed_mean, count(*) AS n_kept
        FROM r
        WHERE rn > floor(n * 0.1)::BIGINT AND rn <= n - floor(n * 0.1)::BIGINT
        GROUP BY event_type
    """,
    "value_prop_correlation": """
        SELECT event_type,
               round(corr(value, k), 6) AS corr_vk,
               round(covar_samp(value, k), 6) AS covar_vk
        FROM (SELECT event_type, value,
                     json_extract(props, '$.k')::INT::DOUBLE AS k FROM events)
        GROUP BY event_type
    """,
    "training_corpus": rf"""
        WITH c AS (
          SELECT doc_id, text, {_TOKS} AS t FROM documents
        ), m AS (
          SELECT doc_id,
                 len(t) AS nt, greatest(len(t), 1) AS n,
                 len(list_filter(t, x -> x IN ('the','a','of','and','is','to','in'))) AS stop_hits,
                 len(list_distinct(t)) AS n_uniq,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
                 greatest(length(text), 1) AS len_text
          FROM c
        ), q AS (
          SELECT doc_id,
                 round(0.3 * least(nt::DOUBLE / 100.0, 1.0)
                       + 0.3 * least(stop_hits::DOUBLE / n * 5, 1.0)
                       + 0.2 * (n_uniq::DOUBLE / n)
                       + 0.2 * (n_alpha::DOUBLE / len_text), 6) AS quality
          FROM m
        ), kept AS (
          SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT AS content_hash,
                 min(d.doc_id) AS doc_id, count(*) AS n_dups
          FROM documents d JOIN q USING (doc_id)
          WHERE q.quality >= 0.5
          GROUP BY 1
        )
        SELECT k.doc_id, k.content_hash, k.n_dups, q.quality,
               round(list_sum(e.embedding::DOUBLE[]), 4) AS embedding_sum
        FROM kept k
        JOIN q ON q.doc_id = k.doc_id
        JOIN embeddings e ON e.vec_id = k.doc_id
    """,
    "order_status_pivot": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "date_funcs_showcase": """
        WITH x AS (
          SELECT year(o_orderdate)::BIGINT AS o_year,
                 quarter(o_orderdate)::BIGINT AS o_quarter,
                 month(o_orderdate)::BIGINT AS o_month,
                 day(o_orderdate)::BIGINT AS o_day,
                 strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
                 strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
                 strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
          FROM orders
        )
        SELECT o_year, o_quarter, count(*) AS n_orders,
               min(o_month) AS min_month, max(o_day) AS max_day,
               max(due_date) AS max_due, max(month_end) AS max_month_end,
               min(month_start) AS min_month_start
        FROM x GROUP BY 1, 2
    """,
    "string_funcs_showcase": """
        SELECT doc_id,
               upper(substr(text, 1, 12)) AS upper_prefix,
               lower(substr(text, 1, 12)) AS lower_prefix,
               regexp_replace(substr(text, 1, 30), '[aeiou]', '_', 'g') AS devoweled,
               lpad(substr(text, 1, 5), 8, '.') AS padded,
               reverse(substr(text, 1, 10)) AS reversed_prefix,
               substr(text, 1, 3) || '|' || substr(text, 4, 3) AS pieces,
               length(text)::BIGINT AS len,
               instr(text, 'the')::BIGINT AS first_the,
               trim(substr('  ' || text, 1, 8)) AS trimmed
        FROM documents WHERE doc_id % 50 = 0
    """,
    "tumbling_window_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "sessionize": """
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM x
        ), per AS (
          SELECT user_id, session_id, count(*) AS n_events,
                 (max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0 AS dur_s
          FROM s GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
               sum(n_events)::BIGINT AS total_events, round(avg(dur_s), 4) AS avg_session_sec
        FROM per GROUP BY user_id
    """,
    "running_totals": """
        WITH c AS (
          SELECT user_id,
                 sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS cum_value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events
        )
        SELECT user_id, round(cum_value, 4) AS cum_value_at_n FROM c WHERE rn = 5
    """,
    "token_stats": rf"""
        SELECT doc_id,
               len(t)::BIGINT AS n_tokens,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT AS n_bpe_tokens,
               len(list_distinct(t))::BIGINT AS n_unique_tokens,
               round(list_sum(list_transform(t, x -> length(x)))::DOUBLE / greatest(len(t), 1), 6) AS mean_token_len
        FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    """,
    "quality_score": rf"""
        WITH c AS (
          SELECT doc_id, n_chars, text, {_TOKS} AS t FROM documents
        ), m AS (
          SELECT doc_id, n_chars,
                 len(t) AS nt, greatest(len(t), 1) AS n,
                 len(list_filter(t, x -> x IN ('the','a','of','and','is','to','in'))) AS stop_hits,
                 len(list_distinct(t)) AS n_uniq,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
                 greatest(length(text), 1) AS len_text
          FROM c
        )
        SELECT doc_id, n_chars, nt::BIGINT AS n_tokens,
               round(stop_hits::DOUBLE / n, 6) AS stopword_ratio,
               round(n_uniq::DOUBLE / n, 6) AS type_token_ratio,
               round(n_alpha::DOUBLE / len_text, 6) AS alpha_ratio,
               round(0.3 * least(nt::DOUBLE / 100.0, 1.0)
                     + 0.3 * least(stop_hits::DOUBLE / n * 5, 1.0)
                     + 0.2 * (n_uniq::DOUBLE / n)
                     + 0.2 * (n_alpha::DOUBLE / len_text), 6) AS quality
        FROM m
    """,
    "lang_id": rf"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (
          SELECT doc_id,
                 len(list_filter(toks, x -> x IN ('der','die','und','das','ist')))::BIGINT AS h_de,
                 len(list_filter(toks, x -> x IN ('the','a','of','and','is')))::BIGINT AS h_en,
                 len(list_filter(toks, x -> x IN ('el','los','las','es','y')))::BIGINT AS h_es,
                 len(list_filter(toks, x -> x IN ('le','la','et','les','est')))::BIGINT AS h_fr
          FROM t
        )
        SELECT doc_id,
               CASE WHEN mx = 0 THEN 'und'
                    WHEN h_de = mx THEN 'de'
                    WHEN h_en = mx THEN 'en'
                    WHEN h_es = mx THEN 'es'
                    ELSE 'fr' END AS lang_pred,
               mx AS marker_hits
        FROM (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS mx FROM s)
    """,
    "doc_fingerprint": f"""
        WITH grams AS (
          SELECT doc_id, substr(text, i, 8) AS gram
          FROM documents, unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS u(i)
        )
        SELECT doc_id, min({_H.format(s='gram')}) AS fingerprint FROM grams GROUP BY doc_id
    """,
    "winnow_fingerprints": f"""
        WITH g AS (
          SELECT doc_id, i AS pos, {_H.format(s='substr(text, i, 8)')} AS h,
                 greatest(length(text) - 7, 1) AS n_grams
          FROM documents, unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS u(i)
        ),
        wm AS (
          SELECT doc_id, pos, n_grams,
                 min(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
          FROM g
        )
        SELECT DISTINCT doc_id, fp AS fingerprint
        FROM wm WHERE pos <= greatest(n_grams - 4, 0) + 1
    """,
    # counts on the original text per pattern; redaction order
    # email → IP → phone matches the Spark side exactly. Patterns are
    # the shared Java-regex/RE2 subset; DuckDB needs the explicit 'g'
    # flag (it replaces first-match-only by default, Spark replaces all)
    "pii_scrub": _PII_ORACLE,
    # ranking orders by the ROUNDED tfidf (then token) on both sides so
    # sub-1e-6 libm differences in ln() can never flip a rank
    "tf_idf": f"""
        WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, token, tf, df,
                 round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
          FROM tf JOIN dfq USING (token), nd
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
          FROM scored
        )
        SELECT doc_id, token, tf::BIGINT AS tf, df::BIGINT AS df, tfidf, rk::BIGINT AS rk
        FROM ranked WHERE rk <= 5
    """,
    "inverted_index": f"""
        WITH pairs AS (
          SELECT DISTINCT doc_id, unnest({_TOKS}) AS token FROM documents
        )
        SELECT token, count(*)::BIGINT AS df,
               list_aggregate(list_transform(list_sort(list(doc_id)), x -> x::VARCHAR),
                              'string_agg', ',') AS postings
        FROM pairs GROUP BY token
    """,
    "streaming_static_enrichment": """
        SELECT e.event_id, e.user_id, e.event_type,
               c.c_mktsegment AS segment, c.c_acctbal AS acctbal
        FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
    """,
    # -- streaming oracles: a finite availableNow replay makes each
    # -- streaming result a deterministic function of the static input,
    # -- so they are exact-SQL-checkable (plus three-way parity vs the
    # -- batch formulations in tests/test_streaming.py) --
    "streaming_tumbling_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    # each event lands in exactly 4 sliding windows (1h window, 15m
    # slide, both epoch-aligned): starts at bucket15(ts) - k*15m, k=0..3
    "streaming_sliding_counts": """
        WITH w AS (
          SELECT make_timestamp((epoch_us(ts) // 900000000 - k.k) * 900000000) AS wstart,
                 event_type, value
          FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k
        )
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM w GROUP BY 1, 2
    """,
    # the stream (0s watermark delay) emits exactly the sessions whose
    # flush time (last event + gap) is reached by the final watermark
    # max(ts); sessions still inside their gap at end-of-stream stay
    # open. dur_s is a raw division of integer micros — bit-identical
    # across engines, no rounding semantics involved.
    "streaming_stateful_sessions": """
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM x
        ), per AS (
          SELECT user_id,
                 strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                 count(*) AS n_events,
                 (max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0 AS dur_s,
                 max(epoch_us(ts)) AS last_us,
                 max(max(epoch_us(ts))) OVER (PARTITION BY user_id) AS user_last_us
          FROM s GROUP BY user_id, session_id
        )
        -- emitted iff closed by a later event of the same user (every
        -- non-final session), OR flushed by the event-time timeout:
        -- Spark fires a timeout when the MS-TRUNCATED watermark is
        -- STRICTLY past the ms-truncated timeout timestamp — mirror
        -- that exactly so boundary sessions can't diverge
        SELECT user_id, session_start, n_events, dur_s
        FROM per
        WHERE last_us < user_last_us
           OR (SELECT max(epoch_us(ts)) FROM events) // 1000
              > (last_us + 1800000000) // 1000
    """,
    "streaming_interval_join": """
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 60 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    # LEFT OUTER adds null-padded rows for unmatched clicks, but ONLY
    # those whose match window fully closed before the final watermark:
    # wm = min(max click ts, max purchase ts, each ms-truncated) - the
    # 1-hour delay; a click null-pads iff click_ts + 60min < wm (later
    # unmatched clicks stay in state at end-of-stream, un-emitted).
    # Verified empirically at sf0.001 and sf0.01 (boundary bracketed to
    # a 7-minute window containing exactly this threshold) and pinned by
    # the three-way parity test in tests/test_streaming.py.
    "streaming_left_outer_join": """
        WITH clicks AS (
          SELECT user_id, event_id AS click_id, ts AS click_ts
          FROM events WHERE event_type = 'click'
        ), purchases AS (
          SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'
        ), wm AS (
          SELECT least(
            (SELECT date_trunc('milliseconds', max(click_ts)) FROM clicks),
            (SELECT date_trunc('milliseconds', max(purchase_ts)) FROM purchases)
          ) - INTERVAL 1 HOUR AS w
        ), matched AS (
          SELECT c.user_id, c.click_id, p.purchase_id, c.click_ts
          FROM clicks c JOIN purchases p
            ON c.user_id = p.user_id
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL 60 MINUTE
        )
        SELECT user_id, click_id, purchase_id FROM matched
        UNION ALL
        SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS purchase_id
        FROM clicks c, wm
        WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.click_id = c.click_id)
          AND c.click_ts + INTERVAL 60 MINUTE < wm.w
    """,
    # FULL OUTER twin: same matches and unmatched-click rows, plus a
    # null-padded row per unmatched purchase once the watermark passes
    # purchase_ts (any later click fails purchase_ts >= click_ts)
    "streaming_full_outer_join": """
        WITH clicks AS (
          SELECT user_id, event_id AS click_id, ts AS click_ts
          FROM events WHERE event_type = 'click'
        ), purchases AS (
          SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'
        ), wm AS (
          SELECT least(
            (SELECT date_trunc('milliseconds', max(click_ts)) FROM clicks),
            (SELECT date_trunc('milliseconds', max(purchase_ts)) FROM purchases)
          ) - INTERVAL 1 HOUR AS w
        ), matched AS (
          SELECT c.user_id, c.click_id, p.purchase_id, c.click_ts
          FROM clicks c JOIN purchases p
            ON c.user_id = p.user_id
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL 60 MINUTE
        )
        SELECT user_id, click_id, purchase_id FROM matched
        UNION ALL
        SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS purchase_id
        FROM clicks c, wm
        WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.click_id = c.click_id)
          AND c.click_ts + INTERVAL 60 MINUTE < wm.w
        UNION ALL
        SELECT p.user_id, CAST(NULL AS BIGINT) AS click_id, p.purchase_id
        FROM purchases p, wm
        WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.purchase_id = p.purchase_id)
          AND p.purchase_ts < wm.w
    """,
    "streaming_session_windows": """
        -- session_window merges events only when windows OVERLAP
        -- ([ts, ts+gap) touching at exactly gap does NOT merge), so the
        -- break condition is >= gap — unlike the stateful sessionizer's
        -- strictly-greater contract above
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM x
        ), per AS (
          SELECT user_id, session_id, count(*) AS n_events FROM s GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
        FROM per GROUP BY user_id
    """,
    # pristine driver events have unique ids, so streaming dedup over
    # them is the identity projection; the duplicate-recovery behavior
    # is separately proven by tests/test_streaming.py on a replayed dir
    "streaming_dedup_events": """
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
        FROM events
    """,
    "embedding_dedup_clusters": """
        WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        edges AS (
          SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v)
                      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
                >= 0.4
        ),
        und AS (SELECT doc_a AS a, doc_b AS b FROM edges
                UNION SELECT doc_b, doc_a FROM edges),
        reach(a, b) AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
        ),
        labels AS (SELECT a AS vec_id, least(min(b), a) AS cluster_id FROM reach GROUP BY a)
        SELECT l.vec_id, l.cluster_id, s.n AS cluster_size
        FROM labels l
        JOIN (SELECT cluster_id, count(*) AS n FROM labels GROUP BY 1) s USING (cluster_id)
    """,
    "heavy_hitters": f"""
        WITH toks AS (SELECT unnest({_TOKS}) AS token FROM documents),
        counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
        SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rk
        FROM counts ORDER BY cnt DESC, token LIMIT 25
    """,
    "lm_perplexity": f"""
        WITH t AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
        occ AS (
          SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS bigram
          FROM t, unnest(range(1, len(t))) AS u(i)
          WHERE len(t) >= 2
        ),
        lm AS (SELECT lang, bigram, count(*) AS c2 FROM occ GROUP BY 1, 2),
        pre AS (
          SELECT lang, split_part(bigram, ' ', 1) AS w1, sum(c2) AS c1
          FROM lm GROUP BY 1, 2
        ),
        lp AS (
          SELECT lm.lang, lm.bigram, ln(c2 / c1) AS logp
          FROM lm JOIN pre ON lm.lang = pre.lang
                          AND split_part(lm.bigram, ' ', 1) = pre.w1
        )
        SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               round(avg(logp), 4) AS avg_logp,
               round(exp(-avg(logp)), 3) AS ppl
        FROM occ JOIN lp ON occ.lang = lp.lang AND occ.bigram = lp.bigram
        GROUP BY doc_id
    """,
    "boilerplate_spans": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        occ AS (
          SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS span
          FROM t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
          WHERE len(t) >= 3
        ),
        freq AS (
          SELECT span FROM (
            SELECT span, count(DISTINCT doc_id) AS n_docs FROM occ GROUP BY 1
          ) WHERE n_docs >= 4
        ),
        boiler AS (
          SELECT doc_id, count(*) AS n_boiler
          FROM occ WHERE span IN (SELECT span FROM freq)
          GROUP BY 1
        )
        SELECT o.doc_id, count(*)::BIGINT AS n_spans,
               coalesce(any_value(b.n_boiler), 0)::BIGINT AS n_boiler,
               round(coalesce(any_value(b.n_boiler), 0) / count(*), 4) AS boiler_frac
        FROM occ o LEFT JOIN boiler b ON o.doc_id = b.doc_id
        GROUP BY o.doc_id
    """,
    "bigram_stats": f"""
        WITH t AS (SELECT lang, {_TOKS} AS t FROM documents),
        bg AS (
          SELECT lang, t[i] || ' ' || t[i+1] AS bigram
          FROM t, unnest(range(1, len(t))) AS u(i)
          WHERE len(t) >= 2
        ),
        counts AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY lang, bigram)
        SELECT lang, bigram, cnt, rk FROM (
          SELECT lang, bigram, cnt,
                 row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rk
          FROM counts)
        WHERE rk <= 5
    """,
    "stratified_sample": f"""
        WITH rates AS (
          SELECT lang, source, count(*) AS n_total,
                 round(least(1.0, 50 / count(*)), 6) AS rate
          FROM documents GROUP BY lang, source
        ),
        samp AS (
          SELECT d.lang, d.source, count(*) AS n_sampled
          FROM documents d JOIN rates r USING (lang, source)
          WHERE ({_H.format(s="'strat|' || d.doc_id::VARCHAR")} % 10000) < r.rate * 10000
          GROUP BY d.lang, d.source
        )
        SELECT r.lang, r.source, r.n_total,
               coalesce(s.n_sampled, 0) AS n_sampled, r.rate
        FROM rates r LEFT JOIN samp s USING (lang, source)
    """,
    "corpus_mixture": f"""
        WITH toks AS (
          SELECT lang, count(*) AS n_docs, sum(len({_TOKS}))::BIGINT AS n_tokens
          FROM documents GROUP BY lang
        ),
        tot AS (SELECT sum(n_tokens) AS tot FROM toks),
        shared AS (
          SELECT lang, n_docs, n_tokens, n_tokens / tot AS share FROM toks, tot
        ),
        z AS (SELECT sum(pow(share, 0.5)) AS z FROM shared)
        SELECT lang, n_docs, n_tokens,
               round(share, 6) AS share,
               round(pow(share, 0.5) / z, 6) AS weight,
               round(pow(share, 0.5) / z * 1000000, 0)::BIGINT AS alloc_tokens
        FROM shared, z
    """,
    "benchmark_overlap": f"""
        WITH {_SHINGLES},
        hsh AS (SELECT doc_id, {_H.format(s='shingle')} AS sh_h FROM sh),
        bench AS (SELECT doc_id AS bench_id, sh_h FROM hsh WHERE doc_id % 43 = 0),
        train AS (SELECT doc_id, sh_h FROM hsh WHERE doc_id % 43 <> 0)
        SELECT t.doc_id,
               count(DISTINCT t.sh_h) AS n_hit_shingles,
               count(DISTINCT b.bench_id) AS n_bench_docs
        FROM train t JOIN bench b ON t.sh_h = b.sh_h
        GROUP BY t.doc_id
        HAVING count(DISTINCT t.sh_h) >= 2
    """,
    "gopher_rules": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
        m AS (
          SELECT doc_id,
                 len(t) AS n_words,
                 list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE
                   / greatest(len(t), 1) AS mean_len,
                 len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
                   / greatest(len(t), 1) AS alpha_ratio,
                 (length(text) - length(replace(text, '#', ''))
                    + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
                   / greatest(len(t), 1) AS symbol_ratio,
                 ((CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(t, 'a') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(t, 'of') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(t, 'and') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(t, 'is') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(t, 'to') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(t, 'in') THEN 1 ELSE 0 END)) AS n_stop
          FROM t
        )
        SELECT doc_id,
               n_words::BIGINT AS n_words,
               round(mean_len, 6) AS mean_word_len,
               round(symbol_ratio, 6) AS symbol_ratio,
               round(alpha_ratio, 6) AS alpha_word_ratio,
               n_stop::BIGINT AS n_stop_distinct,
               (CASE WHEN n_words BETWEEN 50 AND 100000
                      AND mean_len >= 3 AND mean_len <= 10
                      AND symbol_ratio < 0.1
                      AND alpha_ratio > 0.8
                      AND n_stop >= 2 THEN 1 ELSE 0 END)::INT AS keep
        FROM m
    """,
    "repetition_stats": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        bg AS (
          SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
          FROM toks, unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)
          WHERE len(t) >= 2
        ),
        per AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2)
        SELECT doc_id,
               sum(cnt)::BIGINT AS n_bigrams,
               count(*)::BIGINT AS n_distinct_bigrams,
               round(max(cnt)::DOUBLE / sum(cnt), 6) AS top_bigram_frac,
               round(1.0 - count(*)::DOUBLE / sum(cnt), 6) AS dup_bigram_frac
        FROM per GROUP BY doc_id
    """,
    "exact_dedup": f"""
        SELECT {_H.format(s='text')} AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    # ngram_jaccard_pairs: assigned below via _jaccard_sql (capped/uncapped twin)
    "minhash_signatures": f"""
        WITH {_SHINGLES},
        ab AS (
          SELECT doc_id,
                 ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS a,
                 ('0x' || substr(md5(shingle), 17, 15))::BIGINT & ((1::BIGINT << 59) - 1) AS b
          FROM sh
        )
        SELECT doc_id, i::INT AS hash_idx,
               min((a + i * b) & ((1::BIGINT << 60) - 1)) AS minhash
        FROM ab, unnest(range(0, 8)) AS u(i)
        GROUP BY 1, 2
    """,
    "minhash_lsh_pairs": ORACLE_MINHASH_LSH,
    # same sig/banded CTEs as the pair oracle, but candidates come from
    # the new×index band join and roll up per new doc
    "incremental_dedup": f"""
        WITH {_SHINGLES},
        ab AS (
          SELECT doc_id,
                 ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS a,
                 ('0x' || substr(md5(shingle), 17, 15))::BIGINT & ((1::BIGINT << 59) - 1) AS b
          FROM sh
        ),
        sig AS (
          SELECT doc_id, i AS hash_idx,
                 min((a + i * b) & ((1::BIGINT << 60) - 1)) AS minhash
          FROM ab, unnest(range(0, 8)) AS u(i)
          GROUP BY 1, 2
        ),
        banded AS (
          SELECT doc_id, (hash_idx // 2)::INT AS band,
                 {_H.format(s="string_agg(hash_idx || ':' || minhash, ',' ORDER BY hash_idx || ':' || minhash)")} AS band_hash
          FROM sig GROUP BY doc_id, (hash_idx // 2)::INT
        ),
        cand AS (
          SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS index_id
          FROM banded n JOIN banded i
            ON n.band = i.band AND n.band_hash = i.band_hash
          WHERE n.doc_id % 5 = 0 AND i.doc_id % 5 <> 0
        ),
        est AS (
          SELECT new_id, index_id,
                 avg(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END) AS est
          FROM cand
          JOIN sig sa ON sa.doc_id = new_id
          JOIN sig sb ON sb.doc_id = index_id AND sb.hash_idx = sa.hash_idx
          GROUP BY 1, 2
        ),
        hits AS (
          SELECT new_id, count(*) AS n_matches, round(max(est), 6) AS best_jaccard
          FROM est WHERE est >= 0.5 GROUP BY 1
        )
        SELECT d.doc_id, coalesce(n_matches, 0)::BIGINT AS n_matches,
               coalesce(best_jaccard, 0.0) AS best_jaccard,
               (n_matches IS NOT NULL) AS is_dup
        FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
        LEFT JOIN hits ON d.doc_id = hits.new_id
    """,
    "dedup_clusters": f"""
        WITH RECURSIVE pairs AS ({ORACLE_MINHASH_LSH}),
        edges AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= 0.5),
        und AS (SELECT doc_a AS a, doc_b AS b FROM edges
                UNION SELECT doc_b, doc_a FROM edges),
        reach(a, b) AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
        ),
        labels AS (SELECT a AS doc_id, least(min(b), a) AS cluster_id FROM reach GROUP BY a)
        SELECT l.doc_id, l.cluster_id, s.n AS cluster_size
        FROM labels l
        JOIN (SELECT cluster_id, count(*) AS n FROM labels GROUP BY 1) s USING (cluster_id)
    """,
    "chunk_documents": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        s AS (
          SELECT doc_id, t,
                 unnest(range(0, greatest(len(t) - {text.CHUNK_OVERLAP}, 1),
                              {text.CHUNK_SIZE - text.CHUNK_OVERLAP})) AS start
          FROM t
        )
        SELECT doc_id,
               (start // {text.CHUNK_SIZE - text.CHUNK_OVERLAP})::BIGINT AS chunk_id,
               len(list_slice(t, start + 1, start + {text.CHUNK_SIZE}))::BIGINT AS n_tokens,
               array_to_string(list_slice(t, start + 1, start + {text.CHUNK_SIZE}), ' ') AS chunk_text
        FROM s
        WHERE len(list_slice(t, start + 1, start + {text.CHUNK_SIZE})) > 0
    """,
    "pack_training_sequences": f"""
        WITH d AS (
          SELECT doc_id, doc_id // {text.PACK_SHARD} AS shard, len({_TOKS})::BIGINT AS n_tokens
          FROM documents
        ), c AS (
          SELECT doc_id, shard, n_tokens,
                 coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM d
        )
        SELECT shard, (cum_before // {text.PACK_BUDGET})::BIGINT AS seq_id,
               count(*) AS n_docs, sum(n_tokens)::BIGINT AS seq_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c GROUP BY 1, 2
    """,
    "canonical_docs": f"""
        WITH RECURSIVE {_cluster_ctes("documents")}
        SELECT doc_id, cluster_id, cluster_size, quality, keep FROM keepd
    """,
    "leakage_safe_split": f"""
        WITH RECURSIVE {_cluster_ctes("documents", through="labels")},
        b AS (SELECT doc_id, cluster_id, {_SPLIT_BUCKET} AS bucket, {_SPLIT_CASE} AS split
              FROM base)
        SELECT doc_id, cluster_id, bucket::BIGINT AS bucket, split FROM b
    """,
    "simhash": f"""
        WITH {_SIMHASH_SQL}
        SELECT doc_id, simhash FROM sim
    """,
    # banding is a lossless candidate filter for d<=3 over 4 bands
    # (pigeonhole), so the all-pairs oracle is value-identical
    "simhash_pairs": f"""
        WITH {_SIMHASH_SQL}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "embedding_near_dup": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
    """,
    "array_funcs_showcase": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 100 = 0)
        SELECT vec_id,
               len(v)::BIGINT AS dim,
               round(list_sum(v), 6) AS sum_fold,
               len(list_filter(v, x -> x > 0))::BIGINT AS n_positive,
               len(list_filter(v, x -> x > 0.49)) > 0 AS has_large,
               len(list_filter(v, x -> x <= -1.0)) = 0 AS all_gt_neg1,
               round(list_dot_product(v, v), 6) AS self_dot,
               round(list_max(list_transform(v, x -> round(x, 6))), 6) AS max_val,
               round(list_sum(v[1:8]), 6) AS head8_sum
        FROM e
    """,
    "knn_bruteforce": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                   WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
        s AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(list_dot_product(q.v, c.v)
                       / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
          FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id != c.vec_id
        )
        SELECT query_id, neighbor_id, sim,
               (row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id))::BIGINT AS rk
        FROM s QUALIFY rk <= 5
    """,
    "embedding_doc_join": """
        SELECT label, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars,
               round(avg(list_sum(embedding::DOUBLE[])), 6) AS avg_embedding_sum
        FROM documents JOIN embeddings ON doc_id = vec_id
        GROUP BY label
    """,
    "frame_stats": """
        WITH c AS (
          SELECT doc_id, octet_length(encode(text)) AS L,
                 greatest((octet_length(encode(text)) + 255) // 256, 1) AS nf
          FROM documents
        ),
        d AS (
          SELECT doc_id, L, nf, ((nf - 1) // 4) + 1 AS kept, ((nf - 1) // 4) * 4 AS last_f FROM c
        )
        SELECT doc_id,
               kept::BIGINT AS n_frames,
               (256 * (kept - 1)
                + CASE WHEN last_f = nf - 1 THEN L - 256 * (nf - 1) ELSE 256 END)::BIGINT AS sampled_bytes,
               0::BIGINT AS first_frame,
               last_f::BIGINT AS last_frame
        FROM d
    """,
    "audio_chunk_stats": """
        WITH c AS (
          SELECT doc_id, octet_length(encode(text)) AS nb,
                 greatest((octet_length(encode(text)) + 63) // 64, 1) AS n_chunks
          FROM documents
        )
        SELECT doc_id,
               n_chunks::BIGINT AS n_chunks,
               nb::BIGINT AS total_bytes,
               ((n_chunks - 1) * 64)::BIGINT AS last_start,
               (nb - (n_chunks - 1) * 64)::BIGINT AS last_bytes
        FROM c
    """,
    "multimodal_features": """
        SELECT doc_id,
               octet_length(encode(text))::INT AS size_bytes,
               (octet_length(encode(text)) % 640 + 1)::INT AS fake_width,
               (octet_length(encode(text)) % 480 + 1)::INT AS fake_height,
               substr(text, 1, 8) AS header
        FROM documents
    """,
    "q14_promo_revenue": """
        SELECT round(
                 100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
    "q18_large_orders": """
        WITH big AS (
          SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
        )
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(total_qty, 2) AS total_qty,
               (row_number() OVER (ORDER BY total_qty DESC, o_orderkey ASC))::BIGINT AS rk
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        QUALIFY rk <= 20
    """,
    "q19_disjunctive_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    "q16_supplier_parts": """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        GROUP BY p_brand, p_type, p_size
    """,
    # keep-first = lexicographic min over (doc_id, para_idx), expressed
    # as min(struct) in Spark and a row_number window here
    "paragraph_dedup": rf"""
        WITH p AS (
          SELECT doc_id, u.i - 1 AS para_idx, trim(parts[u.i]) AS para
          FROM (SELECT doc_id, regexp_split_to_array(text, '\n\s*\n') AS parts
                FROM documents),
               unnest(range(1, len(parts) + 1)) AS u(i)
        ),
        np AS (SELECT * FROM p WHERE strlen(para) > 0),
        r AS (
          SELECT {_H.format(s='para')} AS para_hash, doc_id, para_idx,
                 row_number() OVER (PARTITION BY {_H.format(s='para')}
                                    ORDER BY doc_id, para_idx) AS rn,
                 count(*) OVER (PARTITION BY {_H.format(s='para')}) AS n_copies
          FROM np
        )
        SELECT para_hash, doc_id AS keep_doc, para_idx::BIGINT AS keep_para, n_copies
        FROM r WHERE rn = 1
    """,
    "q2_min_cost_supplier": """
        WITH cost AS (
          SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
          FROM lineitem GROUP BY 1, 2
        ), regsup AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'
        ), pc AS (
          SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost,
                 min(cost) OVER (PARTITION BY p_partkey) AS mincost
          FROM part JOIN cost c ON p_partkey = c.l_partkey
          JOIN regsup s ON c.l_suppkey = s.s_suppkey
          WHERE p_type = 'STANDARD' AND p_size <= 15
        ), win AS (
          SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
                 round(cost, 2) AS cost,
                 row_number() OVER (ORDER BY s_acctbal DESC, n_name, s_name, p_partkey) AS rk
          FROM pc WHERE cost = mincost
        )
        SELECT * FROM win WHERE rk <= 100
    """,
    "q7_nation_volume": """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(vol), 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS vol
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN '1995-01-01' AND '1997-12-31 23:59:59'
        ) GROUP BY 1, 2, 3
    """,
    "q8_market_share": """
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE 0 END)
                     / sum(vol), 4) AS mkt_share
        FROM (
          SELECT year(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS vol,
                 n1.n_name AS supp_nation
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        ) GROUP BY 1
    """,
    "q9_product_profit": """
        SELECT nation, o_year, round(sum(profit), 2)::DOUBLE AS sum_profit
        FROM (
          SELECT n_name AS nation, year(o_orderdate) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                   - p_retailprice * l_quantity AS DECIMAL(28,6)) AS profit
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%widget%'
        ) GROUP BY 1, 2
    """,
    "q11_important_parts": """
        WITH pv AS (
          SELECT l_partkey, sum(l_extendedprice) AS value
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3' GROUP BY 1
        )
        SELECT l_partkey, round(value, 2) AS value
        FROM pv WHERE value > 0.002 * (SELECT sum(value) FROM pv)
    """,
    "q12_late_by_returnflag": """
        SELECT l_returnflag,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE epoch_us(l_shipdate) > epoch_us(o_orderdate) + 90 * 86400000000
          AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
        GROUP BY 1
    """,
    "q15_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "q20_excess_suppliers": """
        WITH qty AS (
          SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
          FROM lineitem
          WHERE year(l_shipdate) = 1997
            AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          GROUP BY 1, 2
        ), tot AS (
          SELECT l_partkey, sum(q) AS tq FROM qty GROUP BY 1
        )
        SELECT s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM qty JOIN tot USING (l_partkey) WHERE q > 0.25 * tq
        )
    """,
    # greedy-earliest reach per step, chained strictly-after joins
    "ordered_funnel": """
        WITH s0 AS (
          SELECT user_id, min(ts) AS t_0 FROM events WHERE event_type = 'view' GROUP BY 1
        ), s1 AS (
          SELECT e.user_id, t_0, min(ts) AS t_1
          FROM events e JOIN s0 ON e.user_id = s0.user_id
          WHERE event_type = 'click' AND ts > t_0 GROUP BY 1, 2
        ), s2 AS (
          SELECT e.user_id, t_0, t_1, min(ts) AS t_2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE event_type = 'purchase' AND ts > t_1 GROUP BY 1, 2, 3
        )
        SELECT 0::INT AS step_idx, 'view' AS step, count(*)::BIGINT AS n_users FROM s0
        UNION ALL
        SELECT 1::INT, 'click', count(*)::BIGINT FROM s1
        UNION ALL
        SELECT 2::INT, 'purchase', count(*)::BIGINT FROM s2
        UNION ALL
        SELECT 3::INT, 'converted_72h', count(*)::BIGINT FROM s2
        WHERE epoch_us(t_2) - epoch_us(t_0) <= 72::BIGINT * 3600000000
    """,
    # each (user, active day) contributes to the 7 window-end days
    "rolling_active_users": """
        WITH grid AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ), bounds AS (
          SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi FROM events
        ), fanned AS (
          SELECT user_id, day + (i || ' days')::INTERVAL AS window_end
          FROM grid, unnest(range(0, 7)) AS u(i)
        )
        SELECT strftime(window_end, '%Y-%m-%d') AS day,
               count(DISTINCT user_id)::BIGINT AS n_active
        FROM fanned, bounds
        WHERE window_end >= lo AND window_end <= hi
        GROUP BY 1
    """,
    "retention_cohorts": """
        WITH first_day AS (
          SELECT user_id, date_trunc('day', min(ts)) AS cohort_day FROM events GROUP BY 1
        ), grid AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ), active AS (
          SELECT g.user_id, cohort_day, date_diff('day', cohort_day, day) AS k
          FROM grid g JOIN first_day f ON g.user_id = f.user_id
          WHERE date_diff('day', cohort_day, day) <= 14
        ), rollup AS (
          SELECT cohort_day, k, count(DISTINCT user_id) AS n_active
          FROM active GROUP BY 1, 2
        ), sizes AS (
          SELECT cohort_day, n_active AS cohort_size FROM rollup WHERE k = 0
        )
        SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
               r.k::INT AS k, r.n_active::BIGINT AS n_active,
               s.cohort_size::BIGINT AS cohort_size,
               round(r.n_active / s.cohort_size, 4) AS retention
        FROM rollup r JOIN sizes s ON r.cohort_day = s.cohort_day
    """,
    "q13_customer_distribution": """
        WITH per AS (
          SELECT o_custkey, count(*) AS c_count
          FROM orders WHERE o_orderpriority <> '1-URGENT'
          GROUP BY o_custkey
        )
        SELECT coalesce(p.c_count, 0)::BIGINT AS c_count, count(*) AS custdist
        FROM customer c LEFT JOIN per p ON c.c_custkey = p.o_custkey
        GROUP BY 1
    """,
    # the oracle keeps the ORIGINAL correlated EXISTS / NOT EXISTS shape
    # so the decorrelated Spark rewrite is checked against the textbook
    # formulation, not against itself
    "q21_suppliers_kept_waiting": """
        WITH lo AS (
          SELECT l_orderkey, l_suppkey,
                 epoch_us(l_shipdate) > epoch_us(o_orderdate) + 5184000000000 AS is_late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ),
        cand AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE is_late),
        w AS (
          SELECT s_name, count(*) AS numwait
          FROM cand c
          JOIN supplier ON s_suppkey = c.l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
            AND EXISTS (SELECT 1 FROM lo l2
                        WHERE l2.l_orderkey = c.l_orderkey
                          AND l2.l_suppkey <> c.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lo l3
                            WHERE l3.l_orderkey = c.l_orderkey
                              AND l3.l_suppkey <> c.l_suppkey AND l3.is_late)
          GROUP BY s_name
        )
        SELECT s_name, numwait,
               (row_number() OVER (ORDER BY numwait DESC, s_name ASC))::BIGINT AS rk
        FROM w QUALIFY rk <= 100
    """,
    "q22_global_sales_opportunity": """
        WITH coded AS (
          SELECT c_custkey, c_acctbal, substr(c_name, 18, 1) AS cntrycode
          FROM customer
          WHERE substr(c_name, 18, 1) IN ('1', '3', '5', '7', '9')
        )
        SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        FROM coded c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM coded WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
                          AND o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY cntrycode
    """,
}

# the streaming gopher filter runs the IDENTICAL narrow projection as
# the batch form on a finite replay — one oracle, two execution modes
ORACLES["streaming_gopher_filter"] = ORACLES["gopher_rules"]

# round-5c oracles — window-hash substring dedup, DSIR, budget sampler,
# GROUPING SETS, k-anonymity. Constants mirror the operator defaults
# (dedup.duplicate_spans w=10/stride=5; text.DSIR_BUCKETS/
# DSIR_TARGET_SOURCE; text.BUDGET_TOKENS/BUDGET_BUCKETS;
# events.k_anonymity_audit k=5).
ORACLES["duplicate_spans"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    base AS (SELECT doc_id, len(t)::BIGINT AS n_tokens FROM toks WHERE len(t) >= 1),
    wins AS (
      SELECT doc_id, i AS s,
             ('0x' || substr(md5(array_to_string(t[i:i+9], ' ')), 1, 15))::BIGINT AS win_hash
      FROM toks, unnest(range(1, len(t) - 8, 5)) AS u(i)
      WHERE len(t) >= 10
    ),
    dup AS (SELECT win_hash FROM wins GROUP BY 1 HAVING count(*) > 1),
    dw AS (SELECT w.doc_id, w.s, w.s + 9 AS e FROM wins w JOIN dup USING (win_hash)),
    cov AS (
      SELECT doc_id,
             greatest(0, e - greatest(coalesce(max(e) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), s - 1)) AS add
      FROM dw
    ),
    ca AS (SELECT doc_id, sum(add)::BIGINT AS dup_tokens, count(*)::BIGINT AS n_dup_windows
           FROM cov GROUP BY 1),
    nw AS (SELECT doc_id, count(*)::BIGINT AS n_windows FROM wins GROUP BY 1)
    SELECT b.doc_id, b.n_tokens,
           coalesce(nw.n_windows, 0)::BIGINT AS n_windows,
           coalesce(ca.n_dup_windows, 0)::BIGINT AS n_dup_windows,
           coalesce(ca.dup_tokens, 0)::BIGINT AS dup_tokens,
           round(coalesce(ca.dup_tokens, 0) / b.n_tokens::DOUBLE, 4) AS dup_frac
    FROM base b LEFT JOIN nw USING (doc_id) LEFT JOIN ca USING (doc_id)
"""

ORACLES["contamination_spans"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    wins AS (
      SELECT doc_id, len(t)::BIGINT AS n_tokens, i AS s,
             ('0x' || substr(md5(array_to_string(t[i:i+12], ' ')), 1, 15))::BIGINT AS win_hash
      FROM toks, unnest(range(1, len(t) - 11, 1)) AS u(i)
      WHERE len(t) >= 13
    ),
    bench AS (SELECT DISTINCT win_hash FROM wins WHERE doc_id % 43 = 0),
    hits AS (
      SELECT w.doc_id, w.n_tokens, w.s, w.s + 12 AS e
      FROM wins w JOIN bench USING (win_hash)
      WHERE w.doc_id % 43 <> 0
    ),
    cov AS (
      SELECT doc_id, n_tokens, s,
             greatest(0, e - greatest(coalesce(max(e) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), s - 1)) AS add
      FROM hits
    )
    SELECT doc_id,
           min(n_tokens)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_hit_windows,
           sum(add)::BIGINT AS contaminated_tokens,
           round(sum(add) / min(n_tokens)::DOUBLE, 4) AS contam_frac,
           min(s)::BIGINT AS first_hit_start
    FROM cov GROUP BY doc_id
"""

# the standing-index form screens the identical train slice against
# the identical bench window-hash set — only the index's storage
# (persisted bucketed table vs in-plan relation) differs, so the SQL
# oracle is the same relation-level restatement
ORACLES["contamination_against_index"] = ORACLES["contamination_spans"]
# the streaming screen is deterministic on a finite replay and equals
# the batch form row-for-row (doc-level decisions are stream-split
# independent: the membership join is stateless and the union fold is
# order-free) — same oracle
ORACLES["streaming_contamination_filter"] = ORACLES["contamination_spans"]

ORACLES["dsir_weights"] = f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
    occ AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('dsir|' || tok), 1, 15))::BIGINT % 1024 AS bucket
      FROM toks, unnest(t) AS u(tok)
    ),
    raw AS (SELECT bucket, count(*)::BIGINT AS c_raw FROM occ GROUP BY 1),
    tgt AS (SELECT bucket, count(*)::BIGINT AS c_tgt FROM occ
            WHERE source = 'src0' GROUP BY 1),
    tot AS (SELECT count(*)::BIGINT AS t_raw,
                   count(*) FILTER (WHERE source = 'src0')::BIGINT AS t_tgt FROM occ),
    lr AS (
      SELECT bucket,
             ln((coalesce(c_tgt, 0) + 1) / (t_tgt + 1024)::DOUBLE)
             - ln((c_raw + 1) / (t_raw + 1024)::DOUBLE) AS lr
      FROM raw LEFT JOIN tgt USING (bucket), tot
    )
    SELECT doc_id, count(*)::BIGINT AS n_tokens, round(avg(lr), 4) AS avg_log_ratio
    FROM occ JOIN lr USING (bucket) GROUP BY 1
"""

ORACLES["token_budget_sample"] = f"""
    WITH base AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('budget|' || doc_id), 1, 15))::BIGINT % 8 AS bucket,
             ('0x' || substr(md5('order|' || doc_id), 1, 15))::BIGINT AS ord,
             len({_TOKS})::BIGINT AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, bucket, n_tokens, cum_before FROM (
      SELECT doc_id, lang, bucket, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY lang, bucket ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
      FROM base
    ) WHERE cum_before < 250
"""

ORACLES["grouping_sets_revenue"] = """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           (grouping(l_returnflag) * 2 + grouping(l_linestatus))::BIGINT AS g_id,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*)::BIGINT AS n_lines
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""

ORACLES["k_anonymity_audit"] = """
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           (floor(value / 100) * 100)::BIGINT AS value_band,
           count(DISTINCT user_id)::BIGINT AS n_users,
           count(*)::BIGINT AS n_rows
    FROM events
    GROUP BY 1, 2, 3
    HAVING count(DISTINCT user_id) < 5
"""

# chained two-tier windowed rollup: append-mode emission cutoff is the
# final watermark (max ts, ms-truncated, 0s delay) — a window at either
# tier is emitted iff its end <= watermark, which the oracle reproduces
# from max(ts). The tier-1 cutoff is implied by the tier-2 one (every
# 10-min window inside an emitted hour ends before that hour does).
ORACLES["streaming_chained_windows"] = """
    WITH wm AS (SELECT (max(epoch_us(ts)) // 1000) * 1000 AS wm_us FROM events),
    m AS (
      SELECT (epoch_us(ts) // 600000000) * 600000000 AS mstart_us, event_type,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    h AS (
      SELECT (mstart_us // 3600000000) * 3600000000 AS hstart_us, event_type,
             sum(n)::BIGINT AS total, max(n)::BIGINT AS peak_10min,
             count(*)::BIGINT AS n_windows
      FROM m GROUP BY 1, 2
    )
    SELECT strftime(make_timestamp(hstart_us), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, total, peak_10min, n_windows
    FROM h, wm WHERE hstart_us + 3600000000 <= wm_us
"""

# PageRank over the LSH near-dup graph: fixed 3 power iterations
# unrolled as chained CTEs with the SAME literals (0.15/0.85/1.0) so
# every float op matches the Spark plan bit-for-bit before the final
# round(6)
ORACLES["pagerank_dedup_graph"] = f"""
    WITH pairs AS ({ORACLE_MINHASH_LSH}),
    e AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE est_jaccard >= 0.5
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs WHERE est_jaccard >= 0.5
    ),
    deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
    nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
    p0 AS (SELECT src AS id, 1.0 / (SELECT n FROM nn) AS p FROM deg),
    p1 AS (SELECT e.dst AS id, 0.15 / (SELECT n FROM nn) + 0.85 * sum(p.p / d.deg) AS p
           FROM e JOIN p0 p ON p.id = e.src JOIN deg d ON d.src = e.src GROUP BY e.dst),
    p2 AS (SELECT e.dst AS id, 0.15 / (SELECT n FROM nn) + 0.85 * sum(p.p / d.deg) AS p
           FROM e JOIN p1 p ON p.id = e.src JOIN deg d ON d.src = e.src GROUP BY e.dst),
    p3 AS (SELECT e.dst AS id, 0.15 / (SELECT n FROM nn) + 0.85 * sum(p.p / d.deg) AS p
           FROM e JOIN p2 p ON p.id = e.src JOIN deg d ON d.src = e.src GROUP BY e.dst)
    SELECT d.src AS doc_id, d.deg, round(p3.p, 6) AS pagerank
    FROM p3 JOIN deg d ON d.src = p3.id
"""

# VARIANT path extraction matches the JSON-text semantics exactly
ORACLES["variant_props_stats"] = """
    SELECT event_type, count(*)::BIGINT AS n,
           round(avg(k), 6) AS avg_k,
           min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k,
           count(m)::BIGINT AS n_path_present
    FROM (SELECT event_type,
                 json_extract(props, '$.k')::INT AS k,
                 json_extract_string(props, '$.missing') AS m
          FROM events)
    GROUP BY event_type
"""

# the UDTF chunker reproduces chunk_documents exactly — one oracle,
# two execution paths (Catalyst-native vs Python UDTF)
ORACLES["chunk_documents_udtf"] = ORACLES["chunk_documents"]

ORACLES["full_outer_user_activity"] = """
    WITH c AS (SELECT user_id, count(*)::BIGINT AS n_clicks FROM events
               WHERE event_type = 'click' GROUP BY 1),
    p AS (SELECT user_id, count(*)::BIGINT AS n_purchases,
                 round(sum(value), 2) AS spend FROM events
          WHERE event_type = 'purchase' GROUP BY 1)
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(n_clicks, 0)::BIGINT AS n_clicks,
           coalesce(n_purchases, 0)::BIGINT AS n_purchases,
           coalesce(spend, 0.0) AS spend
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""

ORACLES["map_funcs_showcase"] = """
    WITH per AS (SELECT user_id, event_type, count(*)::BIGINT AS n
                 FROM events GROUP BY 1, 2)
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS types,
           string_agg(n::VARCHAR, ',' ORDER BY event_type) AS counts,
           max(CASE WHEN event_type = 'click' THEN n END)::BIGINT AS clicks,
           string_agg((n * 2)::VARCHAR, ',' ORDER BY event_type) AS doubled,
           (count(*) FILTER (WHERE n >= 3))::BIGINT AS n_big_types,
           sum(n)::BIGINT AS total
    FROM per GROUP BY user_id
"""

ORACLES["math_funcs_showcase"] = """
    SELECT event_id,
           round(abs(value - 100), 6) AS abs_centered,
           sign(value - 100)::BIGINT AS sign_centered,
           ceil(value)::BIGINT AS ceil_v,
           floor(value)::BIGINT AS floor_v,
           round(exp(value / 1000), 6) AS exp_scaled,
           round(ln(value + 1), 6) AS ln_v1,
           round(log10(value + 1), 6) AS log10_v1,
           round(sqrt(value), 6) AS sqrt_v,
           round(pow(value, 1.5), 4) AS pow_15,
           round(cbrt(value), 6) AS cbrt_v,
           round(value % 7, 2) AS mod7,
           round(least(value, 50.0), 2) AS least50,
           round(greatest(value, 50.0), 2) AS greatest50
    FROM events WHERE event_id % 500 = 0
"""

# logistic classifier inference: identical closed-form features and
# weights as text.QC_WEIGHTS; sigmoid rounded to 4 decimals (cross-libm
# exp() agrees far beyond that)
# the logit is the exact rational NUM/(1000·n·L) and its 4-decimal
# HALF-UP rounding is done in int64 (sign · (2·|NUM|·1e4 + DEN) //
# (2·DEN)) — rounding the DOUBLE diverges between engines exactly on
# half boundaries (Spark rounds the shortest decimal repr, DuckDB the
# binary value; seen live at sf0.1); keep compares NUM >= 0 (p>=0.5 ⇔
# logit>=0), float-free
ORACLES["quality_classifier"] = rf"""
    WITH c AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
    m AS (
      SELECT doc_id,
             len(t)::BIGINT AS nt,
             greatest(len(t), 1)::BIGINT AS n,
             greatest(length(text), 1)::BIGINT AS chars,
             len(list_filter(t, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT AS s,
             len(list_distinct(t))::BIGINT AS u,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT AS alpha
      FROM c
    ),
    f AS (
      SELECT doc_id,
             (-2000 * n * chars + 18 * least(nt, 100) * n * chars
              + 3000 * s * chars + 1200 * u * chars + 1500 * alpha * n) AS num,
             1000 * n * chars AS den
      FROM m
    ),
    lg AS (
      SELECT doc_id,
             (sign(num)::BIGINT *
              ((2 * 10000 * abs(num)::HUGEINT + den) // (2 * den::HUGEINT))::BIGINT)::DOUBLE
               / 10000.0 AS logit,
             num >= 0 AS keep
      FROM f
    )
    SELECT doc_id, logit,
           round(1.0 / (1.0 + exp(-logit)), 4) AS p_keep,
           keep
    FROM lg
"""

# hardest positive / hardest negative per anchor: row_number over
# (sim desc, vec_id asc) within the label/non-label slices — the same
# total order the Spark max-of-struct aggregation encodes
# similarity on the int64 micro-grid (embedding_drift doctrine):
# quantize once, exact integer dot/norm² (< 2^53, so the DOUBLE casts
# are exact), then correctly-rounded sqrt/divide/round on inputs that
# are BIT-IDENTICAL to Spark's — a float32 fold differs by an ULP
# between engines and round(,6) flips at a boundary (seen at sf0.001)
ORACLES["hard_negative_mining"] = """
    WITH base AS (
      SELECT * FROM (
        SELECT vec_id, label,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv,
               sqrt(CAST(list_aggregate(list_transform(
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)),
                 x -> x * x), 'sum') AS DOUBLE)) AS nrm
        FROM embeddings
      ) WHERE nrm > 0
    ),
    a AS (SELECT vec_id AS anchor_id, label AS anchor_label, qv AS qe, nrm AS qn
          FROM base WHERE vec_id < 10),
    scored AS (
      SELECT a.anchor_id, a.anchor_label, b.vec_id, b.label,
             round(CAST(list_aggregate(list_transform(range(1, len(qe) + 1),
                     i -> qe[i] * b.qv[i]), 'sum') AS DOUBLE) / (qn * b.nrm), 6) AS sim
      FROM a JOIN base b ON b.vec_id <> a.anchor_id
    ),
    pos AS (
      SELECT anchor_id, vec_id, sim,
             row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, vec_id ASC) AS rk
      FROM scored WHERE label = anchor_label
    ),
    neg AS (
      SELECT anchor_id, vec_id, sim,
             row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, vec_id ASC) AS rk
      FROM scored WHERE label <> anchor_label
    )
    SELECT a.anchor_id, a.anchor_label,
           p.vec_id AS pos_id, p.sim AS pos_sim,
           n.vec_id AS neg_id, n.sim AS neg_sim,
           round(p.sim - n.sim, 6) AS margin
    FROM a
    JOIN pos p ON p.anchor_id = a.anchor_id AND p.rk = 1
    JOIN neg n ON n.anchor_id = a.anchor_id AND n.rk = 1
"""

ORACLES["regression_stats"] = """
    WITH b AS (SELECT event_type, value AS y,
                      json_extract(props, '$.k')::DOUBLE AS x FROM events)
    SELECT event_type, count(*)::BIGINT AS n,
           round(regr_slope(y, x), 6) AS slope,
           round(regr_intercept(y, x), 6) AS intercept,
           round(regr_r2(y, x), 6) AS r2,
           round(corr(y, x), 6) AS pearson_r,
           round(covar_samp(y, x), 6) AS covar
    FROM b GROUP BY event_type
"""

ORACLES["corpus_quality_report"] = rf"""
    WITH c AS (SELECT lang, source, text, {_TOKS} AS t FROM documents),
    m AS (
      SELECT lang, source, len(t)::BIGINT AS n_tokens,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS content_hash,
             CASE WHEN 1.0 / (1.0 + exp(-(
               -2.0 + 1.8 * least(len(t)::DOUBLE / 100.0, 1.0)
               + 3.0 * (len(list_filter(t, x -> x IN ('the','a','of','and','is','to','in')))::DOUBLE
                        / greatest(len(t), 1))
               + 1.2 * (len(list_distinct(t))::DOUBLE / greatest(len(t), 1))
               + 1.5 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                        / greatest(length(text), 1))
             ))) >= 0.5 THEN 1 ELSE 0 END AS keep
      FROM c
    )
    SELECT lang, source, count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens,
           round(avg(n_tokens), 2) AS avg_tokens,
           count(DISTINCT content_hash)::BIGINT AS n_distinct,
           round((count(*) - count(DISTINCT content_hash)) / count(*)::DOUBLE, 6) AS dup_rate,
           round(avg(keep), 6) AS keep_rate
    FROM m GROUP BY lang, source
"""

ORACLES["bm25_search"] = rf"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    stats AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks),
    corpus AS (SELECT count(*)::DOUBLE AS n_docs,
                      sum(dl) / count(*) AS avgdl FROM stats),
    occ AS (SELECT doc_id, term FROM toks, unnest(t) AS u(term)
            WHERE term IN ('table', 'query', 'spark')),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM occ GROUP BY 1, 2),
    idf AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
            FROM (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1), corpus),
    contrib AS (
      SELECT tf.doc_id,
             idf.idf * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * s.dl / c.avgdl)) AS cc
      FROM tf JOIN idf USING (term) JOIN stats s ON s.doc_id = tf.doc_id, corpus c
    ),
    scored AS (
      SELECT doc_id, round(sum(cc), 6) AS score, count(*)::BIGINT AS n_terms_hit
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score, n_terms_hit,
           row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rk
    FROM scored QUALIFY rk <= 15
"""

# PSI drift: exact integer bin counts over a shared global grid, exact
# global bounds, Laplace smoothing — identical doubles in any engine
ORACLES["distribution_drift"] = """
    WITH bounds AS (
      SELECT min(value) AS lo, max(value) AS hi,
             min(epoch_us(ts) // 1000000) AS t0,
             max(epoch_us(ts) // 1000000) AS t1
      FROM events
    ),
    binned AS (
      SELECT event_type,
             CASE WHEN (epoch_us(ts) // 1000000) * 2 > t0 + t1 THEN 1 ELSE 0 END AS half,
             CASE WHEN hi > lo
                  THEN least(9, floor((value - lo) / ((hi - lo) / 10)))
                  ELSE 0 END::INT AS bin,
             count(*)::BIGINT AS n
      FROM events, bounds
      GROUP BY 1, 2, 3
    ),
    totals AS (SELECT event_type, half, sum(n)::BIGINT AS tot FROM binned GROUP BY 1, 2),
    grid AS (
      SELECT t.event_type, h.half::INT AS half, b.bin::INT AS bin
      FROM (SELECT DISTINCT event_type FROM binned) t,
           range(0, 2) h(half), range(0, 10) b(bin)
    ),
    dense AS (
      SELECT g.event_type, g.half, g.bin,
             (coalesce(n, 0) + 1) / (tot + 10)::DOUBLE AS p
      FROM grid g
      LEFT JOIN binned USING (event_type, half, bin)
      JOIN totals USING (event_type, half)
    )
    SELECT o.event_type,
           round(sum((n.p - o.p) * ln(n.p / o.p)), 6) AS psi
    FROM dense o JOIN dense n
      ON o.event_type = n.event_type AND o.bin = n.bin
     AND o.half = 0 AND n.half = 1
    GROUP BY o.event_type
"""

# distinct-shingle novelty of the arriving batch vs the standing corpus
# (same doc_id % 5 split convention as incremental_dedup)
ORACLES["ngram_novelty"] = f"""
    WITH {_SHINGLES},
    h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh_h FROM sh),
    corpus AS (SELECT DISTINCT sh_h FROM h WHERE doc_id % 5 <> 0),
    new AS (SELECT doc_id, sh_h FROM h WHERE doc_id % 5 = 0)
    SELECT n.doc_id,
           count(*)::BIGINT AS n_shingles,
           (count(*) FILTER (WHERE c.sh_h IS NULL))::BIGINT AS n_novel,
           round((count(*) FILTER (WHERE c.sh_h IS NULL)) / count(*)::DOUBLE, 6)
             AS novelty_rate
    FROM new n LEFT JOIN corpus c USING (sh_h)
    GROUP BY n.doc_id
"""

ORACLES["triangle_stats"] = f"""
    WITH pairs AS ({ORACLE_MINHASH_LSH}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs WHERE est_jaccard >= 0.5),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pn AS (
      SELECT doc_id, count(*)::BIGINT AS n_triangles
      FROM (SELECT x AS doc_id FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY doc_id
    ),
    deg AS (
      SELECT doc_id, count(*)::BIGINT AS deg
      FROM (SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e)
      GROUP BY doc_id
    )
    SELECT d.doc_id, d.deg, coalesce(pn.n_triangles, 0)::BIGINT AS n_triangles,
           round(CASE WHEN d.deg >= 2
                 THEN 2.0 * coalesce(pn.n_triangles, 0) / (d.deg * (d.deg - 1))
                 ELSE 0.0 END, 6) AS clustering_coef
    FROM deg d LEFT JOIN pn ON pn.doc_id = d.doc_id
"""

ORACLES["vocab_coverage"] = f"""
    WITH freq AS (
      SELECT tok, count(*)::BIGINT AS n
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
      GROUP BY tok
    ),
    ranked AS (
      SELECT n,
             row_number() OVER (ORDER BY n DESC, tok ASC) AS rk,
             sum(n) OVER (ORDER BY n DESC, tok ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM freq
    ),
    tot AS (SELECT sum(n)::BIGINT AS t FROM freq)
    SELECT rk::BIGINT AS k, cum::BIGINT AS covered_tokens,
           round(cum / t::DOUBLE, 6) AS coverage
    FROM ranked, tot WHERE rk IN (5, 10, 25)
"""

ORACLES["monthly_revenue_trend"] = """
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    )
    SELECT month, revenue,
           round(avg(revenue) OVER w3, 2) AS ma3,
           round(revenue - coalesce(lag(revenue) OVER (ORDER BY month), revenue), 2)
             AS mom_delta,
           round(revenue - avg(revenue) OVER w3, 2) AS dev_from_ma3
    FROM monthly
    WINDOW w3 AS (ORDER BY month ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
"""

# first-principles Bloom filter: set-bit positions and probes both use
# the deterministic md5 hash, so the sketch verifies bit-for-bit
ORACLES["bloom_decontamination"] = """
    WITH bits AS (
      SELECT DISTINCT pos FROM (
        SELECT ('0x' || substr(md5('bloom0|' || text), 1, 15))::BIGINT % 4096 AS pos
        FROM documents WHERE doc_id % 43 = 0
        UNION ALL
        SELECT ('0x' || substr(md5('bloom1|' || text), 1, 15))::BIGINT % 4096
        FROM documents WHERE doc_id % 43 = 0
        UNION ALL
        SELECT ('0x' || substr(md5('bloom2|' || text), 1, 15))::BIGINT % 4096
        FROM documents WHERE doc_id % 43 = 0
      )
    ),
    probes AS (
      SELECT doc_id, ('0x' || substr(md5('bloom0|' || text), 1, 15))::BIGINT % 4096 AS pos
      FROM documents WHERE doc_id % 43 <> 0
      UNION ALL
      SELECT doc_id, ('0x' || substr(md5('bloom1|' || text), 1, 15))::BIGINT % 4096
      FROM documents WHERE doc_id % 43 <> 0
      UNION ALL
      SELECT doc_id, ('0x' || substr(md5('bloom2|' || text), 1, 15))::BIGINT % 4096
      FROM documents WHERE doc_id % 43 <> 0
    ),
    hits AS (
      SELECT doc_id, count(*)::BIGINT AS n_hits
      FROM probes WHERE pos IN (SELECT pos FROM bits)
      GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
           (coalesce(h.n_hits, 0) = 3) AS maybe_contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 43 <> 0) d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
"""

# Codec-pipeline oracles: deterministic numpy codec/FFT work is not
# SQL-expressible, but its expected output at the driver's check SF is
# — precomputed VALUES tables from an independent reference
# (tools/gen_codec_oracle.py; self-checked against the live pipeline
# at generation time and filtered through the documents view so subset
# SFs still compare correctly).
from .codec_expected import AUDIO_SPECTRAL_EXPECTED_SQL, DHASH_EXPECTED_SQL
from .video_expected import (
    VIDEO_SCENE_CUTS_EXPECTED_SQL,
    VIDEO_SHOT_FRAMES_EXPECTED_SQL,
)

ORACLES["image_dhash_index"] = DHASH_EXPECTED_SQL
ORACLES["audio_spectral"] = AUDIO_SPECTRAL_EXPECTED_SQL
ORACLES["video_scene_cuts"] = VIDEO_SCENE_CUTS_EXPECTED_SQL
ORACLES["video_shot_frames"] = VIDEO_SHOT_FRAMES_EXPECTED_SQL

# ANN oracles (round 7): same mechanism as the codec oracles — the
# knn_ivf/knn_pq/knn_ivf_pq pipelines are deterministic end-to-end, so
# tools/gen_ann_oracle.py precomputes their expected rows from an
# independent numpy reference (self-checked at generation time).
from .ann_expected import (
    GENERATED_SF_DIR as _ANN_SF,
    KNN_IVF_EXPECTED_SQL,
    KNN_IVF_PQ_EXPECTED_SQL,
    KNN_LSH_EXPECTED_SQL,
    KNN_PQ_EXPECTED_SQL,
)

ORACLES["knn_lsh"] = KNN_LSH_EXPECTED_SQL
ORACLES["knn_ivf"] = KNN_IVF_EXPECTED_SQL
ORACLES["knn_pq"] = KNN_PQ_EXPECTED_SQL
ORACLES["knn_ivf_pq"] = KNN_IVF_PQ_EXPECTED_SQL
# the standing-index form is operation-identical to knn_ivf_pq (same
# training sample, matmuls, tie rules — only the storage of the model
# and lists differs), so it shares the independent VALUES oracle
ORACLES["knn_against_index"] = KNN_IVF_PQ_EXPECTED_SQL

# HLL++ oracle (round 8): HLL registers are MAX-merged (commutative,
# associative, idempotent), so approx_count_distinct is a pure function
# of the input SET — partitioning-independent, unlike GK quantile
# sketches. tools/gen_hll_oracle.py restates xxHash64 + HLL++ linear
# counting in pure python (self-checked at generation time).
from .hll_expected import (
    APPROX_DISTINCT_USERS_SQL,
    GENERATED_SF_DIR as _HLL_SF,
)

ORACLES["approx_distinct_users"] = APPROX_DISTINCT_USERS_SQL

# GK decile oracle (round 9): the repartition(1) twin of
# value_deciles_approx runs exactly one partial sketch whose only
# head-buffer flush SORTS first, so its output is a pure function of
# the value multiset at any SF that fits the 50k head buffer.
# tools/gen_vda_oracle.py restates Greenwald-Khanna under Spark's
# scheduling in pure python (merge/query rules pinned by live probes;
# self-checked at generation time). The registered scale form stays
# rows-only BY DESIGN — multi-sketch GK merges are
# shuffle-arrival-order-dependent.
from .vda_expected import (
    GENERATED_SF_DIR as _VDA_SF,
    VALUE_DECILES_APPROX_SEQ_SQL,
)

ORACLES["value_deciles_approx_seq"] = VALUE_DECILES_APPROX_SEQ_SQL

# value_deciles_bounds: the oracle RESTATES the GK guarantee the Spark
# side verifies against the live sketch — n, the certified bound
# floor(n/accuracy)+2, and within_bound TRUE for all nine deciles. If
# the sketch ever returned a cutpoint whose rank interval missed the
# target by more than the bound, the Spark side would emit FALSE and
# the hash would diverge — the row is a real check, not an echo.
ORACLES["value_deciles_bounds"] = """
    WITH n AS (SELECT count(*)::BIGINT AS n FROM events)
    SELECT i::BIGINT AS decile,
           n AS n_rows,
           (n // 1000 + 2)::BIGINT AS err_bound,
           TRUE AS within_bound
    FROM n, range(1, 10) AS r(i)
    WHERE n > 0
"""

# n-gram jaccard, parameterized over the hot-shingle df cap so the
# registered query (capped, mirroring the Spark default) and
# dedup_recall_audit's ground truth (UNCAPPED — the audit must not
# inherit the approximation it certifies) share one SQL body.
def _jaccard_sql(cap: int | None) -> str:
    shc = (
        f"""shc AS (SELECT sh.doc_id, sh.shingle FROM sh
               JOIN (SELECT shingle FROM sh GROUP BY shingle
                     HAVING count(*) <= {cap}) keep USING (shingle))"""
        if cap is not None
        else "shc AS (SELECT doc_id, shingle FROM sh)"
    )
    return f"""
        WITH {_SHINGLES},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        {shc},
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
    """


# true set sizes predate the cap, so the capped jaccard can only
# under-report (n/(A+B-n) is increasing in n) — mirrors max_df=1024
ORACLES["ngram_jaccard_pairs"] = _jaccard_sql(1024)

# ppjoin_pairs is EXACT (prefix filtering is lossless), so its oracle
# is the uncapped brute-force jaccard — the strongest statement the
# harness can make: the clever scale plan and the naive SQL agree
# bit-for-bit, with no cap mirrored anywhere.
ORACLES["ppjoin_pairs"] = _jaccard_sql(None)

# corpus_snapshot_diff: the synthetic next-crawl snapshot regenerated
# in SQL (drop %17==3, revise %13==5, one fresh doc per source with
# doc_id = 2^60 + h64(source), collision-free vs real ids), then the
# same hash-compare full-outer diff
ORACLES["corpus_snapshot_diff"] = rf"""
    WITH newsnap AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 13 = 5 THEN text || ' rev2' ELSE text END AS text
      FROM documents WHERE doc_id % 17 != 3
      UNION ALL
      SELECT 1152921504606846976 + {_H.format(s="source")} AS doc_id,
             source, 'fresh crawl content for ' || source AS text
      FROM (SELECT DISTINCT source FROM documents)
    ),
    a AS (SELECT doc_id, source AS src_old, {_H.format(s="text")} AS h_old FROM documents),
    b AS (SELECT doc_id, source AS src_new, {_H.format(s="text")} AS h_new FROM newsnap),
    j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, src_old, src_new, h_old, h_new
          FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT coalesce(src_new, src_old) AS source,
           CASE WHEN h_old IS NULL THEN 'added'
                WHEN h_new IS NULL THEN 'removed'
                WHEN h_old = h_new THEN 'unchanged'
                ELSE 'changed' END AS status,
           count(*) AS n_docs
    FROM j GROUP BY 1, 2
"""

# -- round-10: URL/domain governance ---------------------------------
# The synthetic per-doc URL (operators/web.py synth_doc_urls) and its
# canonicalization, restated in DuckDB. Every regex is in the shared
# Java ∩ RE2 subset; DuckDB regexp_replace carries the 'g' flag
# (Spark replaces all matches by default).

_URL_SQL = """
    CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' WHEN doc_id % 3 = 1 THEN 'http' ELSE 'https' END
    || '://'
    || CASE WHEN doc_id % 4 = 0 THEN 'WWW.' WHEN doc_id % 4 = 1 THEN 'm.' ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
    || CASE WHEN doc_id % 5 < 2 THEN '.co.uk' ELSE '.com' END
    || CASE WHEN doc_id % 6 = 0 THEN ':443' WHEN doc_id % 6 = 3 THEN ':8080' ELSE '' END
    || '/Articles/' || CAST(doc_id % 50 AS VARCHAR)
    || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 9 AS VARCHAR)
            WHEN doc_id % 5 = 1 THEN '?id=' || CAST(doc_id % 9 AS VARCHAR) || '&utm_campaign=news&ref=tw'
            ELSE '' END
    || CASE WHEN doc_id % 3 = 2 THEN '#Section2' ELSE '' END
"""

# CTE chain ending in `rd(doc_id, source, n_chars, url,
# canonical_url, registered_domain)` — shared by all three oracles
_URL_CANON_CTES = rf"""
    urls AS (SELECT doc_id, source, n_chars, {_URL_SQL} AS url FROM documents),
    u1 AS (SELECT *, regexp_replace(url, '#.*$', '', 'g') AS u FROM urls),
    parts AS (SELECT *,
        lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS auth0,
        regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+', '', 'g') AS rest0
        FROM u1),
    auth_steps AS (SELECT *,
        CASE WHEN scheme = 'http'
             THEN regexp_replace(regexp_replace(auth0, '^(www\.)+', '', 'g'), ':80$', '', 'g')
             WHEN scheme = 'https'
             THEN regexp_replace(regexp_replace(auth0, '^(www\.)+', '', 'g'), ':443$', '', 'g')
             ELSE regexp_replace(auth0, '^(www\.)+', '', 'g') END AS auth
        FROM parts),
    -- split path/query FIRST, then strip tracking params from the
    -- QUERY only ('&' is legal in a path segment — mirrors web.py)
    split_steps AS (SELECT *,
        regexp_replace(regexp_extract(rest0, '^([^?]*)', 1), '/+$', '', 'g') AS path1,
        regexp_replace(rest0, '^[^?]*', '', 'g') AS qs0
        FROM auth_steps),
    qs_steps AS (SELECT *,
        regexp_replace(
          regexp_replace(
            regexp_replace(qs0, '&(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*', '', 'g'),
            '\?(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*&', '?', 'g'),
          '\?(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*$', '', 'g') AS qs
        FROM split_steps),
    canon AS (SELECT *,
        CASE WHEN scheme = '' THEN url
             ELSE scheme || '://' || auth || path1 || qs END AS canonical_url
        FROM qs_steps),
    hosts AS (SELECT *,
        regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS h
        FROM canon),
    rd AS (SELECT doc_id, source, n_chars, url, canonical_url,
        CASE WHEN regexp_extract(h, '^(\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}})$', 1) != ''
             THEN h
             WHEN regexp_extract(h, '([^.]+\.(?:co|ac|gov)\.[a-z]+)$', 1) != ''
             THEN regexp_extract(h, '([^.]+\.(?:co|ac|gov)\.[a-z]+)$', 1)
             ELSE regexp_extract(h, '([^.]+\.[^.]+)$', 1) END AS registered_domain
        FROM hosts)
"""

_BLOCKLIST_SQL = "('src3.com', 'src7.co.uk', 'src13.com', 'badsite.example')"

ORACLES["url_canonicalize"] = f"""
    WITH {_URL_CANON_CTES}
    SELECT doc_id, url, canonical_url, registered_domain FROM rd
"""

ORACLES["domain_rollup"] = f"""
    WITH {_URL_CANON_CTES}
    SELECT registered_domain,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           sum(n_chars)::BIGINT AS total_chars,
           registered_domain IN {_BLOCKLIST_SQL} AS blocked
    FROM rd GROUP BY registered_domain
"""

ORACLES["blocklist_filter"] = f"""
    WITH {_URL_CANON_CTES}
    SELECT doc_id, canonical_url, registered_domain FROM rd
    WHERE registered_domain NOT IN {_BLOCKLIST_SQL}
"""

# -- round-11: provenance manifest + e2e certification + PSL ---------
# (built on the shared _cluster_ctes / _SPLIT_CASE helpers defined
# above the ORACLES dict — the same SQL the canonical_docs and
# leakage_safe_split entries use, so the manifest oracles can never
# drift from the standalone operators' oracles)

ORACLES["doc_provenance"] = f"""
    WITH RECURSIVE {_URL_CANON_CTES},
    {_cluster_ctes("documents")},
    newsnap AS (
      SELECT doc_id, CASE WHEN doc_id % 13 = 5 THEN text || ' rev2' ELSE text END AS text
      FROM documents WHERE doc_id % 17 != 3
    ),
    snap AS (
      SELECT d.doc_id, d.source,
             CASE WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN {_H.format(s='d.text')} = {_H.format(s='n.text')} THEN 'unchanged'
                  ELSE 'changed' END AS snapshot_status
      FROM documents d LEFT JOIN newsnap n ON d.doc_id = n.doc_id
    ),
    manifest AS (
      SELECT s.doc_id, s.source, rd.url, rd.canonical_url, rd.registered_domain,
             rd.registered_domain IN {_BLOCKLIST_SQL} AS blocked,
             s.snapshot_status, k.cluster_id, k.cluster_size, k.keep AS is_canonical,
             {_SPLIT_CASE} AS split
      FROM snap s
      JOIN rd ON rd.doc_id = s.doc_id
      JOIN keepd k ON k.doc_id = s.doc_id
    )
    SELECT doc_id, source, canonical_url, registered_domain, blocked, snapshot_status,
           cluster_id, cluster_size, is_canonical, split,
           concat_ws(',',
             CASE WHEN canonical_url != url THEN 'canonicalize_url' END,
             CASE WHEN blocked THEN 'blocklist_drop' END,
             CASE WHEN NOT is_canonical THEN 'near_dup_prune' END) AS transforms
    FROM manifest
"""

ORACLES["corpus_dedup_e2e"] = f"""
    WITH RECURSIVE
    sv AS (
      SELECT * FROM documents
      WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY {_H.format(s='text')})
    ),
    {_cluster_ctes("sv")},
    spl AS (SELECT *, {_SPLIT_CASE} AS split FROM keepd)
    SELECT 'e2e_00_input' AS stage, count(*)::BIGINT AS n_docs FROM documents
    UNION ALL SELECT 'e2e_01_exact_survivors', count(*)::BIGINT FROM keepd
    UNION ALL SELECT 'e2e_02_near_dup_docs', count(*)::BIGINT FROM keepd WHERE cluster_size >= 2
    UNION ALL SELECT 'e2e_03_near_dup_clusters', count(DISTINCT cluster_id)::BIGINT
              FROM keepd WHERE cluster_size >= 2
    UNION ALL SELECT 'e2e_04_canonical_kept', count(*)::BIGINT FROM keepd WHERE keep
    UNION ALL SELECT 'e2e_05_train', count(*)::BIGINT FROM spl WHERE keep AND split = 'train'
    UNION ALL SELECT 'e2e_06_validation', count(*)::BIGINT FROM spl WHERE keep AND split = 'validation'
    UNION ALL SELECT 'e2e_07_test', count(*)::BIGINT FROM spl WHERE keep AND split = 'test'
"""

# the publicsuffix.org resolution algorithm restated in SQL over the
# committed PSL slice: explode ≤2·min(labels,6) candidates per host
# (literal + star-headed), match rules, exception prevails else
# longest, registered domain = public suffix + 1 label
_PSL_VALUES = ", ".join(f"('{r}')" for r in web.PSL_SLICE)

ORACLES["domain_rollup_psl"] = f"""
    WITH {_URL_CANON_CTES},
    psl_raw(raw) AS (VALUES {_PSL_VALUES}),
    rules AS (
      SELECT CASE WHEN raw LIKE '!%' THEN substr(raw, 2) ELSE raw END AS rule,
             len(string_split(CASE WHEN raw LIKE '!%' THEN substr(raw, 2) ELSE raw END, '.')) AS n_labels,
             raw LIKE '!%' AS is_exception
      FROM psl_raw
    ),
    hl AS (
      SELECT doc_id, source, n_chars,
             regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
             string_split(regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), '.') AS parts,
             len(string_split(regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1), '.')) AS n
      FROM rd
    ),
    cands AS (
      SELECT doc_id, i,
             array_to_string(list_slice(parts, n - i + 1, n), '.') AS lit_cand,
             CASE WHEN i >= 2 THEN '*.' || array_to_string(list_slice(parts, n - i + 2, n), '.') END AS star_cand
      FROM hl, unnest(range(1, least(n, 6) + 1)) AS u(i)
    ),
    matched AS (
      SELECT c.doc_id, r.n_labels, r.is_exception
      FROM cands c JOIN rules r ON r.rule = c.lit_cand OR r.rule = c.star_cand
    ),
    resolved AS (
      SELECT doc_id,
             max(CASE WHEN is_exception THEN n_labels - 1 END) AS exc_ps,
             max(CASE WHEN NOT is_exception THEN n_labels END) AS lit_ps
      FROM matched GROUP BY doc_id
    ),
    rdp AS (
      SELECT h.doc_id, h.source, h.n_chars,
             CASE WHEN regexp_extract(h.host, '^(\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}})$', 1) != ''
                  THEN h.host
                  WHEN h.n > coalesce(r.exc_ps, r.lit_ps, 1)
                  THEN array_to_string(
                         list_slice(h.parts, h.n - coalesce(r.exc_ps, r.lit_ps, 1), h.n), '.')
                  ELSE '' END AS registered_domain
      FROM hl h LEFT JOIN resolved r USING (doc_id)
    )
    SELECT registered_domain,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources,
           sum(n_chars)::BIGINT AS total_chars,
           registered_domain IN {_BLOCKLIST_SQL} AS blocked
    FROM rdp GROUP BY registered_domain
"""

# -- round-12: full-pipeline ingest certification --------------------
# the admission chain (blocklist → gopher → quality) restated from the
# SAME per-stage oracle SQL the standalone entries use (the rd CTE of
# _URL_CANON_CTES, the gopher m CTE, the quality num CTE), then the
# shared _cluster_ctes dedup tail on the ADMITTED set — so this oracle
# can only drift from the standalone stages if queries.py itself does
ORACLES["corpus_ingest_e2e"] = f"""
    WITH RECURSIVE {_URL_CANON_CTES},
    gm AS (
      SELECT doc_id, len(t) AS n_words,
             list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE
               / greatest(len(t), 1) AS mean_len,
             len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
               / greatest(len(t), 1) AS alpha_ratio,
             (length(text) - length(replace(text, '#', ''))
                + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
               / greatest(len(t), 1) AS symbol_ratio,
             ((CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END)
              + (CASE WHEN list_contains(t, 'a') THEN 1 ELSE 0 END)
              + (CASE WHEN list_contains(t, 'of') THEN 1 ELSE 0 END)
              + (CASE WHEN list_contains(t, 'and') THEN 1 ELSE 0 END)
              + (CASE WHEN list_contains(t, 'is') THEN 1 ELSE 0 END)
              + (CASE WHEN list_contains(t, 'to') THEN 1 ELSE 0 END)
              + (CASE WHEN list_contains(t, 'in') THEN 1 ELSE 0 END)) AS n_stop
      FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    ),
    qm AS (
      SELECT doc_id,
             (-2000 * n * chars + 18 * least(nt, 100) * n * chars
              + 3000 * s * chars + 1200 * u * chars + 1500 * alpha * n) >= 0 AS q_keep
      FROM (
        SELECT doc_id, len(t)::BIGINT AS nt, greatest(len(t), 1)::BIGINT AS n,
               greatest(length(text), 1)::BIGINT AS chars,
               len(list_filter(t, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT AS s,
               len(list_distinct(t))::BIGINT AS u,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT AS alpha
        FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents)
      )
    ),
    flags AS MATERIALIZED (
      SELECT d.doc_id,
             rd.registered_domain NOT IN {_BLOCKLIST_SQL} AS bl,
             (gm.n_words BETWEEN 50 AND 100000
               AND gm.mean_len >= 3 AND gm.mean_len <= 10
               AND gm.symbol_ratio < 0.1 AND gm.alpha_ratio > 0.8
               AND gm.n_stop >= 2) AS gop,
             qm.q_keep AS q
      FROM documents d
      JOIN rd ON rd.doc_id = d.doc_id
      JOIN gm ON gm.doc_id = d.doc_id
      JOIN qm ON qm.doc_id = d.doc_id
    ),
    admitted AS MATERIALIZED (
      SELECT d.* FROM documents d JOIN flags f ON f.doc_id = d.doc_id
      WHERE f.bl AND f.gop AND f.q
    ),
    sv AS MATERIALIZED (
      SELECT * FROM admitted
      WHERE doc_id IN (SELECT min(doc_id) FROM admitted GROUP BY {_H.format(s='text')})
    ),
    {_cluster_ctes("sv")},
    spl AS (SELECT *, {_SPLIT_CASE} AS split FROM keepd)
    SELECT 'ing_00_input' AS stage, count(*)::BIGINT AS n_docs FROM documents
    UNION ALL SELECT 'ing_01_blocklist_pass', sum(bl::INT)::BIGINT FROM flags
    UNION ALL SELECT 'ing_02_gopher_pass', sum((bl AND gop)::INT)::BIGINT FROM flags
    UNION ALL SELECT 'ing_03_quality_pass', sum((bl AND gop AND q)::INT)::BIGINT FROM flags
    UNION ALL SELECT 'ing_04_exact_survivors', count(*)::BIGINT FROM keepd
    UNION ALL SELECT 'ing_05_near_dup_docs', count(*)::BIGINT FROM keepd WHERE cluster_size >= 2
    UNION ALL SELECT 'ing_06_near_dup_clusters', count(DISTINCT cluster_id)::BIGINT
              FROM keepd WHERE cluster_size >= 2
    UNION ALL SELECT 'ing_07_canonical_kept', count(*)::BIGINT FROM keepd WHERE keep
    UNION ALL SELECT 'ing_08_train', count(*)::BIGINT FROM spl WHERE keep AND split = 'train'
    UNION ALL SELECT 'ing_09_validation', count(*)::BIGINT FROM spl WHERE keep AND split = 'validation'
    UNION ALL SELECT 'ing_10_test', count(*)::BIGINT FROM spl WHERE keep AND split = 'test'
"""

# footer stats: whole-table COUNT/MIN/MAX — answered by Spark from
# parquet row-group footers (PushedAggregation, plan-gated); DuckDB
# computes the same aggregates its own way, so the hash compare proves
# the metadata path returns exactly what a full scan would
# the + 0.0 on DOUBLE min/max mirrors the operator's declared
# signed-zero contract (footer stats report any zero as +0.0 —
# sources/pushdown._normalize_signed_zero): IEEE -0.0 + 0.0 = +0.0
# and every other value is unchanged, so genuinely-negative-zero DATA
# stays oracle-green under the driver's sign-strict value hash
ORACLES["lineitem_footer_stats"] = """
    SELECT count(*) AS n_rows,
           min(l_orderkey) AS min_l_orderkey,
           max(l_orderkey) AS max_l_orderkey,
           min(l_quantity) + 0.0 AS min_l_quantity,
           max(l_quantity) + 0.0 AS max_l_quantity,
           min(l_extendedprice) + 0.0 AS min_l_extendedprice,
           max(l_extendedprice) + 0.0 AS max_l_extendedprice,
           min(l_discount) + 0.0 AS min_l_discount,
           max(l_discount) + 0.0 AS max_l_discount
    FROM lineitem
"""

# grouped footer stats: a repartition-by-column round trip preserves
# group contents losslessly, so the partitioned layout's footer answer
# must equal a plain GROUP BY over the source table — the oracle needs
# no hive_partitioning and no path literal
ORACLES["events_partition_stats"] = """
    SELECT event_type,
           count(*) AS n_rows,
           min(event_id) AS min_event_id,
           max(event_id) AS max_event_id,
           min(user_id) AS min_user_id,
           max(user_id) AS max_user_id,
           min(value) + 0.0 AS min_value,
           max(value) + 0.0 AS max_value
    FROM events
    GROUP BY event_type
"""

# heavy_hitters_approx: the SpaceSaving-flavored scale path reports the
# EXACT head whenever each reported token survives every partition's
# local top-m — true by a wide margin for a top-25 head at local_m=512
# on the fixtures (tests assert exact agreement with heavy_hitters).
# Oracle = the exact top-k SQL, so the driver hash doubles as a live
# head-exactness proof at its check SF.
ORACLES["heavy_hitters_approx"] = ORACLES["heavy_hitters"]

# Precomputed VALUES oracles are literals generated at ONE scale
# factor; comparing them at any other SF is meaningless (the advisor's
# round-6 finding: a subset-id guard only saves id-subset SFs). Check
# tooling consults this map and SKIPS the value compare (rows-only)
# when the SF under check differs from the generation SF.
from .codec_expected import GENERATED_SF_DIR as _CODEC_SF
from .video_expected import GENERATED_SF_DIR as _VIDEO_SF

# BPE oracles: the iterative merge loop is not SQL-expressible; the
# expected tables come from tools/gen_bpe_oracle.py (independent
# reference, self-checked), valid at the generation SF only.
from .bpe_expected import (
    GENERATED_SF_DIR as _BPE_SF,
    BPE_ENCODE_EXPECTED_SQL,
    BPE_MERGES_EXPECTED_SQL,
)

ORACLES["bpe_learn_merges"] = BPE_MERGES_EXPECTED_SQL
ORACLES["bpe_encode_stats"] = BPE_ENCODE_EXPECTED_SQL
# the distributed escape hatch is bit-exact with the driver loop
# (tests/test_bpe_fidelity.py), so it shares the same independent
# VALUES oracle, truncated to its registered merge depth
ORACLES["bpe_learn_merges_distributed"] = (
    f"SELECT * FROM ({BPE_MERGES_EXPECTED_SQL}) WHERE rank <= 8"
)

# k-means oracle (round 7): the integer-exact Lloyd loop of
# operators/clustering.py is deterministic end-to-end, so
# tools/gen_kmeans_oracle.py precomputes its per-cluster summary from
# an independent numpy restatement (self-checked at generation time).
from .kmeans_expected import (
    GENERATED_SF_DIR as _KMEANS_SF,
    KMEANS_EXPECTED_SQL,
    KMEANS_INCR_EXPECTED_SQL,
    SEMDEDUP_EXPECTED_SQL,
)

ORACLES["kmeans_embeddings"] = KMEANS_EXPECTED_SQL
ORACLES["semdedup_prune"] = SEMDEDUP_EXPECTED_SQL
ORACLES["kmeans_incremental"] = KMEANS_INCR_EXPECTED_SQL

# volume_anomalies: mad_outliers' exact-quantile convention applied
# to daily volumes (quantile_cont == Spark percentile interpolation).
ORACLES["volume_anomalies"] = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    med AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM daily GROUP BY 1),
    mad AS (
      SELECT d.event_type, quantile_cont(abs(d.n - m.med), 0.5) AS mad, any_value(m.med) AS med
      FROM daily d JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n,
           round(m.med, 6) AS median, round(m.mad, 6) AS mad,
           CASE WHEN m.mad > 0
                THEN round(0.6745 * (d.n - m.med) / m.mad, 6) END AS mz,
           CASE WHEN m.mad > 0
                THEN abs(round(0.6745 * (d.n - m.med) / m.mad, 6)) > 3.5
                ELSE d.n <> m.med END AS is_anomaly
    FROM daily d JOIN mad m USING (event_type)
"""

# attribution_last_touch: the same (ts, event_id)-ordered per-user
# window in both engines; the frame excludes the current row, revenue
# rides the integer micro-grid so sums are order-independent int64s.
ORACLES["attribution_last_touch"] = """
    WITH tagged AS (
      SELECT event_type, value, epoch_us(ts) AS ts_us,
             last_value(CASE WHEN event_type IN ('view','click') THEN event_type END IGNORE NULLS)
               OVER w AS lt_type,
             last_value(CASE WHEN event_type IN ('view','click') THEN epoch_us(ts) END IGNORE NULLS)
               OVER w AS lt_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    attributed AS (
      SELECT CASE WHEN lt_us IS NOT NULL AND ts_us - lt_us <= 72::BIGINT * 3600 * 1000000
                  THEN lt_type ELSE 'direct' END AS channel,
             floor(value * 1000000 + 0.5)::BIGINT AS qv
      FROM tagged WHERE event_type = 'purchase'
    ),
    per_channel AS (
      SELECT channel, count(*)::BIGINT AS n_purchases, sum(qv)::BIGINT AS rev_q
      FROM attributed GROUP BY 1
    )
    SELECT channel, n_purchases,
           round(rev_q / 1000000.0, 4) AS attributed_revenue,
           round(rev_q::DOUBLE / NULLIF((SELECT sum(qv) FROM attributed), 0), 6) AS revenue_share
    FROM per_channel
"""

# lpa_communities: three UNROLLED synchronous LPA rounds over the
# same thresholded pair graph as dedup_clusters — counts are exact
# ints, ties (n desc, label asc) total, so every round is
# deterministic in both engines.
ORACLES["lpa_communities"] = f"""
    WITH pairs AS ({ORACLE_MINHASH_LSH}),
    edges AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= 0.5),
    und AS (SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    l0 AS (SELECT DISTINCT src AS doc_id, src AS label FROM und),
    n1 AS (SELECT u.src AS doc_id, l.label FROM und u JOIN l0 l ON l.doc_id = u.dst
           UNION ALL SELECT doc_id, label FROM l0),
    c1 AS (SELECT doc_id, label, count(*) AS n FROM n1 GROUP BY 1, 2),
    l1 AS (SELECT doc_id, label FROM (
             SELECT doc_id, label,
                    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, label ASC) AS rk
             FROM c1) WHERE rk = 1),
    n2 AS (SELECT u.src AS doc_id, l.label FROM und u JOIN l1 l ON l.doc_id = u.dst
           UNION ALL SELECT doc_id, label FROM l1),
    c2 AS (SELECT doc_id, label, count(*) AS n FROM n2 GROUP BY 1, 2),
    l2 AS (SELECT doc_id, label FROM (
             SELECT doc_id, label,
                    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, label ASC) AS rk
             FROM c2) WHERE rk = 1),
    n3 AS (SELECT u.src AS doc_id, l.label FROM und u JOIN l2 l ON l.doc_id = u.dst
           UNION ALL SELECT doc_id, label FROM l2),
    c3 AS (SELECT doc_id, label, count(*) AS n FROM n3 GROUP BY 1, 2),
    l3 AS (SELECT doc_id, label FROM (
             SELECT doc_id, label,
                    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, label ASC) AS rk
             FROM c3) WHERE rk = 1)
    SELECT l3.doc_id, l3.label AS community, s.n::BIGINT AS n_members
    FROM l3 JOIN (SELECT label, count(*) AS n FROM l3 GROUP BY 1) s USING (label)
"""

# calibrated_quality: the quality_score CTE + within-source
# percent_rank over the total (quality, doc_id) order — identical
# (rank-1)/(n-1) definition in both engines, 0 for 1-row sources.
ORACLES["calibrated_quality"] = rf"""
    WITH c AS (
      SELECT doc_id, source, text, {{toks}} AS t FROM documents
    ), m AS (
      SELECT doc_id, source,
             len(t) AS nt, greatest(len(t), 1) AS n,
             len(list_filter(t, x -> x IN ('the','a','of','and','is','to','in'))) AS stop_hits,
             len(list_distinct(t)) AS n_uniq,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
             greatest(length(text), 1) AS len_text
      FROM c
    ), q AS (
      SELECT doc_id, source,
             round(0.3 * least(nt::DOUBLE / 100.0, 1.0)
                   + 0.3 * least(stop_hits::DOUBLE / n * 5, 1.0)
                   + 0.2 * (n_uniq::DOUBLE / n)
                   + 0.2 * (n_alpha::DOUBLE / len_text), 6) AS quality
      FROM m
    ), p AS (
      SELECT doc_id, source, quality,
             round(percent_rank() OVER (PARTITION BY source
                                        ORDER BY quality, doc_id), 6) AS pct_rank
      FROM q
    )
    SELECT doc_id, source, quality, pct_rank,
           (quality >= 0.5) AS keep_raw,
           (pct_rank >= 0.5) AS keep_cal
    FROM p
""".replace("{toks}", _TOKS)

# weighted_sample: the quality CTE in micro-units + a HUGEINT
# multiply-compare — the exact twin of the Spark DECIMAL(38,0) form
# (no division, no float in the inclusion decision; W=0 degenerates
# to an empty sample on both sides).
ORACLES["weighted_sample"] = rf"""
    WITH c AS (
      SELECT doc_id, source, text, {{toks}} AS t FROM documents
    ), m AS (
      SELECT doc_id, source,
             len(t) AS nt, greatest(len(t), 1) AS n,
             len(list_filter(t, x -> x IN ('the','a','of','and','is','to','in'))) AS stop_hits,
             len(list_distinct(t)) AS n_uniq,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
             greatest(length(text), 1) AS len_text
      FROM c
    ), w AS (
      SELECT doc_id, source,
             CAST(round(round(0.3 * least(nt::DOUBLE / 100.0, 1.0)
                   + 0.3 * least(stop_hits::DOUBLE / n * 5, 1.0)
                   + 0.2 * (n_uniq::DOUBLE / n)
                   + 0.2 * (n_alpha::DOUBLE / len_text), 6) * 1000000) AS BIGINT) AS w_micro
      FROM m
    ), tot AS (
      SELECT count(*) AS n_total, coalesce(sum(w_micro), 0) AS w_total FROM w
    )
    SELECT doc_id, source, w_micro AS weight_micro
    FROM w, tot
    WHERE (({_H.format(s="'ws|' || doc_id")} % 1000000)::HUGEINT * w_total::HUGEINT)
          < (200000::HUGEINT * w_micro::HUGEINT * n_total::HUGEINT)
""".replace("{toks}", _TOKS)

# the streaming importance thinner replays the same corpus against
# totals calibrated from it — identical rows as the batch sampler
ORACLES["streaming_weighted_sample"] = ORACLES["weighted_sample"]

# session_paths: the sessionize tagging CTE + ordered string_agg —
# the ORDER BY step inside the aggregate states the same fold order
# as the Spark side's step-sorted array join.
ORACLES["session_paths"] = """
    WITH x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    ),
    st AS (
      SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS step
      FROM s
    ),
    paths AS (
      SELECT user_id, session_id, string_agg(event_type, '>' ORDER BY step) AS path
      FROM st WHERE step <= 5 GROUP BY 1, 2
    ),
    c AS (SELECT path, count(*)::BIGINT AS n_sessions FROM paths GROUP BY 1)
    SELECT path, n_sessions,
           row_number() OVER (ORDER BY n_sessions DESC, path ASC)::BIGINT AS rk
    FROM c QUALIFY rk <= 20
"""

# translated_near_dups: the exact all-pairs cosine oracle restricted
# to cross-language pairs via the documents lang tags.
ORACLES["translated_near_dups"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
    )
    SELECT p.doc_a, p.doc_b, da.lang AS lang_a, db.lang AS lang_b, p.sim
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    WHERE da.lang <> db.lang
"""

# containment_pairs: the jaccard-pairs join with asymmetric
# denominators and the hot-shingle df cap mirrored exactly (HAVING
# count <= cap); true set sizes predate the cap on both sides.
ORACLES["containment_pairs"] = f"""
    WITH {_SHINGLES},
    sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
    keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1024),
    shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           round(n_inter::DOUBLE / sa.n_sh, 6) AS containment_a,
           round(n_inter::DOUBLE / sb.n_sh, 6) AS containment_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE greatest(round(n_inter::DOUBLE / sa.n_sh, 6),
                   round(n_inter::DOUBLE / sb.n_sh, 6)) >= 0.5
"""

# hybrid_search: BM25 recall (the bm25_search oracle at k=50) joined
# to embeddings, pseudo-relevance-feedback query centroid on the
# quantize-once micro grid (exact int sums + pmod floor division),
# shared-fold cosine rerank, reciprocal-rank fusion on exact integer
# ranks. Rank windows are over the <=50-row candidate set.
ORACLES["hybrid_search"] = rf"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    stats AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks),
    corpus AS (SELECT count(*)::DOUBLE AS n_docs,
                      sum(dl) / count(*) AS avgdl FROM stats),
    occ AS (SELECT doc_id, term FROM toks, unnest(t) AS u(term)
            WHERE term IN ('table', 'query', 'spark')),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM occ GROUP BY 1, 2),
    idf AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
            FROM (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1), corpus),
    contrib AS (
      SELECT tf.doc_id,
             idf.idf * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * s.dl / c.avgdl)) AS cc
      FROM tf JOIN idf USING (term) JOIN stats s ON s.doc_id = tf.doc_id, corpus c
    ),
    scored AS (
      SELECT doc_id, round(sum(cc), 6) AS score
      FROM contrib GROUP BY doc_id
    ),
    b AS (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk0
      FROM scored QUALIFY rk0 <= 50
    ),
    cand AS (
      SELECT b.doc_id, b.score, e.embedding::DOUBLE[] AS v,
             row_number() OVER (ORDER BY b.score DESC, b.doc_id ASC) AS bm25_rk
      FROM b JOIN embeddings e ON e.vec_id = b.doc_id
    ),
    seedsum AS (
      SELECT u.i AS pos,
             sum(CAST(floor(v[u.i + 1] * 1000000 + 0.5) AS BIGINT))::BIGINT AS s,
             count(*)::BIGINT AS n
      FROM cand, unnest(range(0, 64)) AS u(i)
      WHERE bm25_rk <= 5
      GROUP BY 1
    ),
    qv AS (
      SELECT list(qc ORDER BY pos) AS q FROM (
        SELECT pos,
               ((((2*s + n) - (((2*s + n) % (2*n) + (2*n)) % (2*n))) // (2*n))) / 1000000.0 AS qc
        FROM seedsum
      )
    ),
    rer AS (
      SELECT doc_id, bm25_rk,
             round(list_dot_product(q, v)
                   / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))), 6) AS cos
      FROM cand, qv
    ),
    cr AS (
      SELECT doc_id, bm25_rk,
             row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS cos_rk
      FROM rer
    ),
    fused AS (
      SELECT doc_id, bm25_rk::BIGINT AS bm25_rk, cos_rk::BIGINT AS cos_rk,
             round(1.0 / (60.0 + bm25_rk) + 1.0 / (60.0 + cos_rk), 6) AS rrf_score
      FROM cr
    )
    SELECT doc_id, bm25_rk, cos_rk, rrf_score,
           row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)::BIGINT AS rk
    FROM fused QUALIFY rk <= 15
"""

# embedding_drift: exact-integer math end-to-end (1e-6 quantize grid,
# pmod-corrected floor division on exactly-divisible integers — `//`
# vs `div` truncation semantics can't differ), so a PLAIN SQL oracle
# suffices: only the final sqrt/divide/round touch floats.
ORACLES["embedding_drift"] = """
    WITH comps AS (
      SELECT label::BIGINT AS label, u.i AS pos,
             CAST(floor(CAST(embedding[u.i + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qv
      FROM embeddings, unnest(range(0, 64)) AS u(i)
    ),
    per AS (
      SELECT label, pos, sum(qv)::BIGINT AS s_l, count(*)::BIGINT AS n_l
      FROM comps GROUP BY 1, 2
    ),
    corpuswide AS (
      SELECT pos, sum(s_l)::BIGINT AS s_g, sum(n_l)::BIGINT AS n_g
      FROM per GROUP BY 1
    ),
    m AS (
      SELECT label, pos, n_l,
             (((2*s_l + n_l) - (((2*s_l + n_l) % (2*n_l) + (2*n_l)) % (2*n_l))) // (2*n_l))
           - (((2*s_g + n_g) - (((2*s_g + n_g) % (2*n_g) + (2*n_g)) % (2*n_g))) // (2*n_g))
             AS delta
      FROM per JOIN corpuswide USING (pos)
    ),
    stats AS (
      SELECT label, max(n_l)::BIGINT AS n_vecs, sum(delta*delta)::BIGINT AS ssd
      FROM m GROUP BY 1
    ),
    top AS (
      SELECT label, pos::BIGINT AS top_dim, abs(delta) AS top_abs,
             row_number() OVER (PARTITION BY label ORDER BY abs(delta) DESC, pos ASC) AS rk
      FROM m
    )
    SELECT s.label, s.n_vecs,
           round(sqrt(CAST(s.ssd AS DOUBLE)) / 1000000, 6) AS l2_to_global,
           t.top_dim,
           round(CAST(t.top_abs AS DOUBLE) / 1000000, 6) AS top_abs_delta
    FROM stats s JOIN top t ON t.label = s.label AND t.rk = 1
"""

PRECOMPUTED_ORACLE_SF = {
    "bpe_learn_merges": _BPE_SF,
    "bpe_learn_merges_distributed": _BPE_SF,
    "bpe_encode_stats": _BPE_SF,
    "kmeans_embeddings": _KMEANS_SF,
    "semdedup_prune": _KMEANS_SF,
    "kmeans_incremental": _KMEANS_SF,
    "image_dhash_index": _CODEC_SF,
    "audio_spectral": _CODEC_SF,
    "video_scene_cuts": _VIDEO_SF,
    "video_shot_frames": _VIDEO_SF,
    "knn_lsh": _ANN_SF,
    "knn_ivf": _ANN_SF,
    "knn_pq": _ANN_SF,
    "knn_ivf_pq": _ANN_SF,
    "knn_against_index": _ANN_SF,
    "approx_distinct_users": _HLL_SF,
    "value_deciles_approx_seq": _VDA_SF,
}

# Round-11 (r10 verdict item 6): each generator now emits expected
# tables for EVERY committed SF (EXPECTED_BY_SF), so check tooling can
# hash-verify the precomputed-oracle queries at sf0.001/sf0.1 too
# instead of degrading to rows-only. ORACLES itself stays the
# PRIMARY-SF (sf0.01) tables — the driver contract runs there. The one
# intentional hole: value_deciles_approx_seq has no sf0.1 entry (100k
# values exceed the GK 50k single-flush bound, where even the
# repartition(1) twin is arrival-order-dependent — see
# tools/gen_vda_oracle.py), so it stays rows-only at sf0.1 by design.
PRECOMPUTED_ORACLE_SQL_BY_SF: dict[str, dict[str, str]] = {}


def _load_by_sf() -> None:
    from . import (
        ann_expected,
        bpe_expected,
        codec_expected,
        hll_expected,
        kmeans_expected,
        vda_expected,
        video_expected,
    )

    for mod in (ann_expected, bpe_expected, codec_expected, hll_expected,
                kmeans_expected, vda_expected, video_expected):
        for sfd, tabs in getattr(mod, "EXPECTED_BY_SF", {}).items():
            for qname, sql in tabs.items():
                PRECOMPUTED_ORACLE_SQL_BY_SF.setdefault(qname, {})[sfd] = sql
    # the distributed BPE escape hatch is bit-exact with the driver
    # loop, sharing the merges table truncated to its registered depth
    for sfd, sql in PRECOMPUTED_ORACLE_SQL_BY_SF.get("bpe_learn_merges", {}).items():
        PRECOMPUTED_ORACLE_SQL_BY_SF.setdefault("bpe_learn_merges_distributed", {})[sfd] = (
            f"SELECT * FROM ({sql}) WHERE rank <= 8"
        )
    # the standing-index ANN form is bit-equal to knn_ivf_pq at every SF
    for sfd, sql in PRECOMPUTED_ORACLE_SQL_BY_SF.get("knn_ivf_pq", {}).items():
        PRECOMPUTED_ORACLE_SQL_BY_SF.setdefault("knn_against_index", {})[sfd] = sql


_load_by_sf()

# -- round-6 additions ------------------------------------------------

# SymSpell deletion-neighborhood linkage: the oracle regenerates the
# deterministic typo feed, fans both sides out to their deletion
# variants (joined on the variant STRING — equivalent to the Spark
# side's 60-bit variant hash modulo negligible collisions), verifies
# with DuckDB's levenshtein, and picks the same (distance, id) argmin.
ORACLES["fuzzy_customer_links"] = """
    WITH clean AS (SELECT c_custkey AS clean_id, c_name AS name FROM customer),
    dirty AS (
      SELECT c_custkey AS dirty_id,
             CASE c_custkey % 3
               WHEN 0 THEN substr(c_name, 1, pos - 1) || substr(c_name, pos + 1)
               WHEN 1 THEN substr(c_name, 1, pos - 1) || 'x' || substr(c_name, pos + 1)
               ELSE substr(c_name, 1, pos - 1) || 'x' || substr(c_name, pos)
             END AS name
      FROM (SELECT *, (c_custkey % length(c_name))::INT + 1 AS pos FROM customer)
    ),
    cv AS (
      SELECT DISTINCT clean_id, v FROM (
        SELECT clean_id, name AS v FROM clean
        UNION ALL
        SELECT clean_id, substr(name, 1, i - 1) || substr(name, i + 1)
        FROM clean, unnest(generate_series(1, length(name))) AS t(i)
      )
    ),
    dv AS (
      SELECT DISTINCT dirty_id, v FROM (
        SELECT dirty_id, name AS v FROM dirty
        UNION ALL
        SELECT dirty_id, substr(name, 1, i - 1) || substr(name, i + 1)
        FROM dirty, unnest(generate_series(1, length(name))) AS t(i)
      )
    ),
    cand AS (SELECT DISTINCT dirty_id, clean_id FROM dv JOIN cv USING (v)),
    scored AS (
      SELECT c.dirty_id, c.clean_id,
             levenshtein(d.name, cl.name) AS edit_distance
      FROM cand c
      JOIN dirty d USING (dirty_id)
      JOIN clean cl USING (clean_id)
      WHERE levenshtein(d.name, cl.name) <= 1
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY dirty_id ORDER BY edit_distance, clean_id) AS rk,
             count(*) OVER (PARTITION BY dirty_id) AS n_candidates
      FROM scored
    )
    SELECT dirty_id, clean_id AS matched_id, edit_distance::INT AS edit_distance,
           n_candidates::BIGINT AS n_candidates
    FROM ranked WHERE rk = 1
"""

ORACLES["event_transition_matrix"] = """
    WITH steps AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type, next_type, count(*)::BIGINT AS n
      FROM steps WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, next_type, n,
           round(n / sum(n) OVER (PARTITION BY event_type), 6) AS p
    FROM c
"""

ORACLES["bpe_pair_counts"] = f"""
    WITH words AS (
      SELECT lang, w FROM (
        SELECT lang, unnest({_TOKS}) AS w FROM documents
      ) WHERE length(w) >= 2
    ),
    pairs AS (
      SELECT lang, substr(w, i, 2) AS pair
      FROM words, unnest(generate_series(1, length(w) - 1)) AS t(i)
    ),
    c AS (SELECT lang, pair, count(*)::BIGINT AS n FROM pairs GROUP BY 1, 2)
    SELECT lang, pair, n, rank::INT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, pair) AS rank FROM c
    ) WHERE rank <= 10
"""

# tf-weighted trigram cosine: dot products and norms are exact BIGINT
# sums (order-independent), so the only float op is the final division
# — identical in both engines; the oracle groups on the raw gram
# string where Spark groups on its 60-bit hash (collision-free at any
# verifiable scale).
ORACLES["sparse_doc_similarity"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
    grams AS (
      SELECT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS g
      FROM t, unnest(generate_series(1, len(ts) - 2)) AS u(i)
      WHERE len(ts) >= 3
    ),
    tf AS (SELECT doc_id, g, count(*)::BIGINT AS tf FROM grams GROUP BY 1, 2),
    keep AS (
      SELECT g FROM (SELECT g, count(*) AS df FROM tf GROUP BY g)
      WHERE df BETWEEN 2 AND 50
    ),
    post AS (SELECT tf.* FROM tf JOIN keep USING (g)),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.tf * b.tf)::BIGINT AS dot
      FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    norms AS (SELECT doc_id, sum(tf * tf)::BIGINT AS nrm FROM post GROUP BY 1)
    SELECT doc_a, doc_b, dot,
           round(dot / (sqrt(na.nrm) * sqrt(nb.nrm)), 6) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    ORDER BY cosine DESC, doc_a, doc_b LIMIT 50
"""

ORACLES["scd2_user_state"] = """
    WITH runs AS (
      SELECT user_id, ts, event_id, event_type FROM (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
      ) WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type AS state,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
    FROM runs
"""

ORACLES["streaming_transition_matrix"] = ORACLES["event_transition_matrix"]

# HTML extraction: the synthetic page is rebuilt with ||, every strip
# step is the same Java-regex/RE2 shared-subset pattern with DuckDB's
# 'g' flag standing in for Spark's replace-all default, and the clean
# hash reuses the cross-engine md5 h64. DuckDB `// 2` mirrors Spark's
# truncating (length/2)::int split point.
ORACLES["html_boilerplate_strip"] = f"""
    WITH pages AS (
      SELECT doc_id,
             '<html><head><title>Doc ' || doc_id ||
             '</title><script>var x = 1; track();</script>' ||
             '<style>.nav{{color:#333}}</style></head><body>' ||
             '<nav><a href="/home">Home</a> | <a href="/about">About</a></nav><p>' ||
             substr(text, 1, length(text) // 2) || '</p><p>' ||
             substr(text, length(text) // 2 + 1) ||
             '</p><footer>&copy; 2024 Example Corp ' ||
             '<a href="/privacy">Privacy</a> &amp; <a href="/tos">Terms</a>' ||
             '</footer></body></html>' AS html
      FROM documents
    ),
    stripped AS (
      SELECT doc_id, html,
             regexp_replace(
               regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS no_blocks
      FROM pages
    ),
    cleaned AS (
      SELECT doc_id, html, no_blocks,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(no_blocks, '<[^>]+>', ' ', 'g'),
                     '&copy;', '(c)', 'g'),
                   '&amp;', '&', 'g'),
                 '&lt;|&gt;', ' ', 'g'),
               '\\s+', ' ', 'g')) AS clean
      FROM stripped
    )
    SELECT doc_id,
           len(regexp_extract_all(html, '<a[\\s>]'))::BIGINT AS n_links,
           len(regexp_extract_all(html, '<[^>]+>'))::BIGINT AS n_tags,
           length(clean)::BIGINT AS clean_len,
           round(
             list_sum(list_transform(
               regexp_extract_all(no_blocks, '(?s)<a[^>]*>(.*?)</a>', 1),
               a -> length(trim(a))))::DOUBLE
             / greatest(length(clean), 1), 6) AS link_density,
           {_H.format(s="clean")} AS clean_hash,
           (round(
             list_sum(list_transform(
               regexp_extract_all(no_blocks, '(?s)<a[^>]*>(.*?)</a>', 1),
               a -> length(trim(a))))::DOUBLE
             / greatest(length(clean), 1), 6) <= 0.25) AS kept
    FROM cleaned
"""

ORACLES["merge_upsert_customers"] = """
    WITH changes AS (
      SELECT c_custkey, NULL::VARCHAR AS c_name, NULL::INT AS c_nationkey,
             NULL::DOUBLE AS c_acctbal, NULL::VARCHAR AS c_mktsegment, 'D' AS op
      FROM customer WHERE c_custkey % 13 = 0
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 100.0, 2), c_mktsegment, 'U'
      FROM customer WHERE c_custkey % 13 <> 0 AND c_custkey % 7 = 0
      UNION ALL
      SELECT (1000000 + c_nationkey)::BIGINT, 'NewCustomer#' || c_nationkey,
             c_nationkey, 0.0, 'BUILDING', 'I'
      FROM (SELECT DISTINCT c_nationkey FROM customer)
    ),
    merged AS (
      SELECT coalesce(b.c_custkey, c.c_custkey) AS c_custkey,
             b.c_name AS b_name, b.c_nationkey AS b_nationkey,
             b.c_acctbal AS b_acctbal, b.c_mktsegment AS b_mktsegment,
             c.c_name AS n_name, c.c_nationkey AS n_nationkey,
             c.c_acctbal AS n_acctbal, c.c_mktsegment AS n_mktsegment,
             coalesce(c.op, 'K') AS last_op
      FROM customer b FULL OUTER JOIN changes c USING (c_custkey)
    )
    SELECT c_custkey,
           CASE WHEN last_op IN ('U','I') THEN n_name ELSE b_name END AS c_name,
           (CASE WHEN last_op IN ('U','I') THEN n_nationkey ELSE b_nationkey END)::INT AS c_nationkey,
           CASE WHEN last_op IN ('U','I') THEN n_acctbal ELSE b_acctbal END AS c_acctbal,
           CASE WHEN last_op IN ('U','I') THEN n_mktsegment ELSE b_mktsegment END AS c_mktsegment,
           last_op
    FROM merged WHERE last_op <> 'D'
"""

ORACLES["interarrival_stats"] = """
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS gap_us
      FROM events
    ),
    -- moments accumulate in EXACT integers (HUGEINT for the squares),
    -- associative hence order-independent — mirrors the Spark side's
    -- long / DECIMAL(38,0) accumulation; float enters only below
    agg AS (
      SELECT user_id, count(*)::BIGINT AS n_gaps, sum(gap_us) AS s1u,
             sum(gap_us::HUGEINT * gap_us::HUGEINT) AS s2u, max(gap_us) AS max_gap_us
      FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
    ),
    m AS (
      SELECT user_id, n_gaps, max_gap_us,
             s1u::DOUBLE / n_gaps / 1000000.0 AS mu,
             s2u::DOUBLE / n_gaps / 1e12 AS msq
      FROM agg
    )
    SELECT user_id, n_gaps,
           round(mu, 6) AS mean_gap_s,
           round(max_gap_us / 1000000.0, 6) AS max_gap_s,
           round((sqrt(greatest(msq - mu*mu, 0.0)) - mu)
                 / (sqrt(greatest(msq - mu*mu, 0.0)) + mu), 6)
             AS burstiness
    FROM m WHERE n_gaps >= 2
"""


# session_window semantics: [first event, last event + gap), with an
# event exactly at the current end opening a NEW session — re-derived
# here with the lag/cumsum rewrite under the >= boundary rule
ORACLES["session_window_stats"] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events),
    f AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w >= 240::BIGINT * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id) AS seq FROM f
    )
    SELECT user_id,
           min(us)::BIGINT AS start_us,
           (max(us) + 240::BIGINT * 60 * 1000000)::BIGINT AS end_us,
           count(*)::BIGINT AS n_events,
           round(sum(value), 4) AS sum_value
    FROM s GROUP BY user_id, seq
"""

# the oracle recomputes in ONE pass what the Spark side computes as
# two merged partial states — the merge IS what the hash verifies
ORACLES["incremental_user_rollup"] = """
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           round(sum(round(value * 100)::BIGINT) / 100.0, 2) AS total_value,
           round(sum(round(value * 100)::BIGINT) / 100.0 / count(*), 6) AS mean_value,
           min(epoch_us(ts))::BIGINT AS first_us,
           max(epoch_us(ts))::BIGINT AS last_us
    FROM events GROUP BY user_id
"""

ORACLES["pmi_collocations"] = f"""
    WITH t AS (SELECT {_TOKS} AS t FROM documents),
    uni AS (
      SELECT w, count(*) AS c1
      FROM (SELECT unnest(t) AS w FROM t) GROUP BY w
    ),
    n1 AS (SELECT sum(c1) AS n1 FROM uni),
    big AS (
      SELECT w1, w2, count(*) AS c2
      FROM (
        SELECT t[i] AS w1, t[i+1] AS w2
        FROM t, unnest(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
      ) GROUP BY w1, w2
    ),
    n2 AS (SELECT sum(c2) AS n2 FROM big),
    scored AS (
      SELECT w1, w2, c2::BIGINT AS c2,
             round(ln((c2::DOUBLE * n1 * n1) / (n2::DOUBLE * a.c1 * b.c1)), 6) AS pmi
      FROM big, n1, n2
      JOIN uni a ON a.w = w1
      JOIN uni b ON b.w = w2
      WHERE c2 >= 5
    )
    SELECT w1, w2, c2, pmi,
           (row_number() OVER (ORDER BY pmi DESC, w1, w2))::BIGINT AS rk
    FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 30
"""

# Monroe-2008 informative-Dirichlet log-odds: exact integer counts from
# one tokenize pass; the float delta/var/z expressions mirror the
# Spark side operation-for-operation (left-assoc, same literals)
ORACLES["distinctive_terms"] = f"""
    WITH toks AS (SELECT source AS grp, unnest({_TOKS}) AS w FROM documents),
    ygw AS (SELECT grp, w, count(*) AS ygw FROM toks GROUP BY grp, w),
    yw AS (SELECT w, sum(ygw) AS yw FROM ygw GROUP BY w),
    ng AS (SELECT grp, sum(ygw) AS ng FROM ygw GROUP BY grp),
    n AS (SELECT sum(ygw) AS n FROM ygw),
    scored AS (
      SELECT grp AS source, ygw.w AS token, ygw::BIGINT AS n_in_group,
             round(
               (ln((ygw + 500.0 * yw / n) / (ng + 500.0 - ygw - 500.0 * yw / n))
                - ln(((yw - ygw) + 500.0 * yw / n) / ((n - ng) + 500.0 - (yw - ygw) - 500.0 * yw / n)))
               / sqrt(1.0 / (ygw + 500.0 * yw / n) + 1.0 / ((yw - ygw) + 500.0 * yw / n)),
               6) AS z
      FROM ygw JOIN yw USING (w) JOIN ng USING (grp), n
      WHERE ygw >= 5
    )
    SELECT source, token, n_in_group, z,
           (row_number() OVER (PARTITION BY source ORDER BY z DESC, token))::BIGINT AS rk
    FROM scored
    QUALIFY rk <= 10
"""

# source-vs-source shingle overlap: the per-source shingle SET is the
# distinct (source, shingle) projection; sparse semantics (zero-overlap
# pairs omitted) match the Spark side's inner overlap join
ORACLES["source_overlap_matrix"] = f"""
    WITH toks AS (SELECT source, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_common::BIGINT AS n_common,
           round(n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
"""

# composes the two already-verified pair oracles: ground truth from the
# exact-jaccard SELECT, candidates from the LSH SELECT, one full-outer
# pair join + a single aggregate row
def _recall_audit_sql() -> str:
    truth = _jaccard_sql(None)  # UNCAPPED exact ground truth (see operator)
    cand = ORACLES["minhash_lsh_pairs"]
    return f"""
    WITH t AS (SELECT doc_a, doc_b FROM ({truth})),
    c AS (SELECT doc_a, doc_b FROM ({cand})),
    j AS (
      SELECT coalesce(t.doc_a, c.doc_a) AS doc_a,
             t.doc_a IS NOT NULL AS is_true, c.doc_a IS NOT NULL AS is_cand
      FROM t FULL OUTER JOIN c USING (doc_a, doc_b)
    )
    SELECT sum(is_true::INT)::BIGINT AS n_true,
           sum(is_cand::INT)::BIGINT AS n_candidates,
           sum((is_true AND is_cand)::INT)::BIGINT AS n_hit,
           round(sum((is_true AND is_cand)::INT)::DOUBLE
                 / NULLIF(sum(is_cand::INT), 0), 6) AS precision,
           round(sum((is_true AND is_cand)::INT)::DOUBLE
                 / NULLIF(sum(is_true::INT), 0), 6) AS recall
    FROM j
    """


ORACLES["dedup_recall_audit"] = _recall_audit_sql()

# feature hashing: bucket/sign both from the 60-bit md5 (duck twin of
# functions.hashing.h64 with the "sign" seed); signed counts are exact
# ints so the rollup is order-free
ORACLES["hashed_features"] = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS w FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id,
           ({_H.format(s="w")} % 64)::BIGINT AS bucket,
           sum(CASE WHEN ('0x' || substr(md5('sign' || w), 1, 15))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END)::BIGINT AS weight
    FROM toks
    GROUP BY doc_id, bucket
    HAVING weight != 0
"""

# exact-k stratified sample: rank by the seeded 60-bit hash, doc_id
# tie-break — the reproducible shuffle both engines compute identically
ORACLES["fixed_k_sample"] = """
    SELECT doc_id, lang, source, rk FROM (
      SELECT doc_id, lang, source,
             (row_number() OVER (
                PARTITION BY lang
                ORDER BY ('0x' || substr(md5('fk' || doc_id::VARCHAR), 1, 15))::BIGINT, doc_id
             ))::BIGINT AS rk
      FROM documents
    ) WHERE rk <= 20
"""

# modified z-score outlier screen: exact PERCENTILE_CONT medians
# (quantile_cont matches Spark's percentile interpolation — pinned by
# percentile_stats); float expressions mirrored op-for-op
ORACLES["mad_outliers"] = """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad, any_value(med) AS med
      FROM events JOIN med USING (event_type) GROUP BY event_type
    ),
    scored AS (
      SELECT e.event_type,
             CASE WHEN m.mad > 0 THEN 0.6745 * (value - med) / m.mad END AS mz,
             med, m.mad
      FROM events e JOIN mad m USING (event_type)
    )
    SELECT event_type, count(*)::BIGINT AS n,
           round(any_value(med), 6) AS median,
           round(any_value(mad), 6) AS mad,
           sum(CASE WHEN abs(mz) > 3.5 THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           round(max(abs(mz)), 6) AS max_abs_z
    FROM scored GROUP BY event_type
"""

# confusion matrix over the already-verified lang_id SELECT: join back
# to the labeled lang, count, normalize within the true label
def _lang_confusion_sql() -> str:
    return f"""
    WITH pred AS ({ORACLES["lang_id"]})
    SELECT d.lang AS lang_true, p.lang_pred, count(*)::BIGINT AS n,
           round(count(*)::DOUBLE
                 / sum(count(*)) OVER (PARTITION BY d.lang), 6) AS frac
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.lang_pred
    """


ORACLES["lang_id_confusion"] = _lang_confusion_sql()
