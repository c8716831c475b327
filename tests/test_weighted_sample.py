"""weighted_sample: deterministic weight-proportional Bernoulli
thinning. The inclusion decision is a DECIMAL(38,0) multiply-compare
(pmod(h64(doc_id), 1e6) * W < rate_micro * w * N) — no division, no
float, no RNG state — so the contracts under test are probability
semantics, not statistics: zero weight is never kept, a weight large
enough that rate*w*N >= 1e6*W is always kept, results are bitwise
reproducible, and injected weights (weight_col) steer the sample."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs_with_weights(spark, weights):
    rows = [
        (i, f"doc {i} text body", "en", f"src{i % 3}", 20, w)
        for i, w in enumerate(weights)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long, w long"
    )


def test_zero_weight_never_sampled(spark):
    from gomapreduce_spark.operators.text import weighted_sample

    docs = _docs_with_weights(spark, [0] * 50 + [500_000] * 50)
    out = weighted_sample(docs, rate=0.9, weight_col="w").collect()
    assert out  # plenty of weighted docs survive a 0.9 rate
    assert all(r.weight_micro > 0 for r in out)


def test_heavy_weight_always_sampled(spark):
    """One doc carries half the total weight: rate*w*N/W = 0.1*5e5*100/1e6
    = 5 >= 1, so it is kept with probability 1 regardless of its hash."""
    from gomapreduce_spark.operators.text import weighted_sample

    docs = _docs_with_weights(spark, [500_000] + [5_051] * 99)
    out = weighted_sample(docs, rate=0.1, weight_col="w").collect()
    assert any(r.doc_id == 0 for r in out)


def test_deterministic_and_seed_sensitive(spark):
    from gomapreduce_spark.operators.text import weighted_sample

    docs = _docs_with_weights(spark, [100_000 + i for i in range(200)])
    a = sorted(r.doc_id for r in weighted_sample(docs, 0.3, weight_col="w").collect())
    b = sorted(r.doc_id for r in weighted_sample(docs, 0.3, weight_col="w").collect())
    assert a == b  # bitwise reproducible
    c = sorted(
        r.doc_id
        for r in weighted_sample(docs, 0.3, seed="other|", weight_col="w").collect()
    )
    assert a != c  # the seed actually enters the hash


def test_rate_scales_expected_size(spark):
    """Equal weights degenerate to plain Bernoulli(rate): the kept set
    at a lower rate is a SUBSET of the kept set at a higher rate
    (the hash comparison is monotone in rate), and sizes track rate."""
    from gomapreduce_spark.operators.text import weighted_sample

    docs = _docs_with_weights(spark, [300_000] * 400)
    small = {r.doc_id for r in weighted_sample(docs, 0.1, weight_col="w").collect()}
    big = {r.doc_id for r in weighted_sample(docs, 0.5, weight_col="w").collect()}
    assert small <= big
    assert 0 < len(small) < len(big) < 400


def test_all_zero_weights_empty_sample(spark):
    from gomapreduce_spark.operators.text import weighted_sample

    docs = _docs_with_weights(spark, [0] * 30)
    assert weighted_sample(docs, 0.5, weight_col="w").collect() == []


def test_default_weights_are_quality_scores(spark):
    """Without weight_col the sampler scores docs with quality_score;
    the emitted weight_micro must equal round(quality * 1e6)."""
    from gomapreduce_spark.operators.text import quality_score, weighted_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r.doc_id: r.weight_micro for r in weighted_sample(docs, 0.3).collect()}
    q = {
        r.doc_id: int(round(r.quality * 1_000_000))
        for r in quality_score(docs).collect()
    }
    assert out
    assert all(q[d] == w for d, w in out.items())


def test_weighted_total_lit_survives_beyond_int64(spark):
    """Round-9 advisor finding: the streaming twin routed the collected
    DECIMAL(38,0) totals through int() + F.lit, re-typing them as
    LongType and raising past int64. weighted_total_lit must carry a
    >2^63 Decimal intact and degrade NULL -> no rows kept."""
    from decimal import Decimal

    from gomapreduce_spark.operators.text import weighted_keep_expr, weighted_total_lit

    big = Decimal(2**63) * 10  # far past int64
    df = spark.createDataFrame([(1, 500_000)], "doc_id long, w_micro long")
    keep = weighted_keep_expr(
        F.col("w_micro"),
        weighted_total_lit(Decimal(1)),
        weighted_total_lit(big),
        200_000,
        "ws|",
    )
    # w_total huge vs n_total=1: probability ~0 -> row dropped, and no
    # literal-construction error on the way
    assert df.where(keep).count() == 0
    # NULL total (38-digit overflow path) -> comparison NULL -> empty
    keep_null = weighted_keep_expr(
        F.col("w_micro"),
        weighted_total_lit(None),
        weighted_total_lit(Decimal(1)),
        200_000,
        "ws|",
    )
    assert df.where(keep_null).count() == 0
    # (streaming-twin == batch parity after this fix is re-asserted by
    # test_streaming.py::test_streaming_weighted_sample_matches_batch)
