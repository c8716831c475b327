"""Similarity search over the ``embeddings`` table: exact brute-force
top-k cosine (the correctness baseline) and a random-hyperplane LSH
variant (the 100 TB scale path).

Driver-mandated extension. All vector math is JVM-side
(functions.vectors — zip_with/aggregate fold, no Python UDF).

Scale design: brute force is O(|Q|·|N|) — fine when the query set is
broadcastable and per-partition top-k (partial aggregation via window
over candidate partitions) keeps the shuffle tiny. The LSH variant
buckets vectors by sign-bit signature of d_h deterministic hyperplanes;
top-k then only scans buckets whose signature is Hamming-close to the
query's, trading recall for a ~2^d_h scan reduction. Hyperplane
components derive from the cross-engine hash so the whole pipeline is
reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

import hashlib

from ..functions.hashing import h64
from ..functions.vectors import cosine, dot, l2_norm


def knn_bruteforce(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    The query side is tiny → broadcast; candidates never shuffle until
    reduced to k rows per query by the window. Deterministic ranking on
    (rounded sim desc, neighbor id asc). Zero-norm vectors are excluded
    up front — cosine is undefined for them, and an unguarded divide is
    a Spark-NULL-vs-DuckDB-IEEE hash divergence (the guarded-divide
    doctrine); the oracle applies the same exclusion."""
    base = emb.select("vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")).where(
        F.col("nrm") > 0
    )
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("nrm").alias("qn")
    )
    c = base.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), F.col("nrm").alias("cn"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        # norms precomputed per vector; arithmetic identical to cosine()
        .withColumn("sim", F.round(dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def _plane_vals(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random vector: component j is
    md5-hash("plane{idx}|j") mapped to [-1, 1) — the same 60-bit md5
    construction as functions.hashing.h64, computed driver-side (the
    plane is a constant; no reason to evaluate md5 per row)."""
    vals = []
    for j in range(dim):
        h = int(hashlib.md5(f"plane{plane_idx}|{j}".encode()).hexdigest()[:15], 16)
        vals.append((h % 1_000_000) / 500_000.0 - 1.0)
    return vals


def lsh_signatures(emb: DataFrame, n_planes: int = 6, n_tables: int = 6, dim: int = 64) -> DataFrame:
    """Multi-table sign-bit LSH: ``n_tables`` independent signatures of
    ``n_planes`` bits each → (vec_id, embedding, table, bucket) rows.
    Recall for neighbors at angle θ is 1-(1-p^b)^L with p = 1-θ/π —
    multiple tables are what make random-hyperplane LSH usable for
    mid-similarity neighbors.

    One narrow Arrow pass, zero shuffle: per batch, a single
    (rows × dim) @ (dim × tables·planes) numpy matmul replaces
    tables·planes interpreted Catalyst fold expressions (folds are
    evaluated per element per plane — ~36 × dim interpreted ops per
    row; the matmul is the same dataflow at BLAS speed). Hyperplanes
    are deterministic md5-derived constants, so buckets are stable
    run-to-run; the smallest |projection| in the fixtures is ~7e-6,
    orders of magnitude above fp-accumulation-order wiggle, so the
    sign bits match the fold form bit-for-bit."""
    import numpy as np
    import pandas as pd

    planes = np.stack(
        [_plane_vals(dim, t * 1009 + i) for t in range(n_tables) for i in range(n_planes)]
    )  # (tables·planes) × dim
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def sign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            bits = (mat @ planes.T >= 0).reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)  # rows × tables
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().repeat(n_tables),
                    "embedding": [v for v in pdf["embedding"] for _ in range(n_tables)],
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        sign, "vec_id long, embedding array<float>, table int, bucket long"
    )


def knn_lsh(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 6,
    dim: int = 64,
    max_bucket: int = 1024,
) -> DataFrame:
    """Approximate top-k: candidates are vectors sharing a bucket with
    the query in ANY table, plus Hamming-distance-1 probe buckets
    (multi-probe). Same output schema as knn_bruteforce; recall vs the
    exact result is asserted in tests.

    Scan fraction, honestly: each table × probe covers ~1/2^n_planes of
    the corpus, so the expected candidate volume is about
    n_tables·(1+n_planes)/2^n_planes — at the fixture defaults (6
    tables, 6 planes, radius-1 probing) that is ~0.66·N: a
    RECALL-oriented setting, not a scan reduction. The knob that buys
    reduction is n_planes, raised with corpus size (e.g. 16 planes →
    6·17/65536 ≈ 0.16 % of N); tables/probes then buy recall back.
    Degenerate signatures (many near-identical or near-zero vectors
    collapsing into one bucket) get the repo's standard hot-key cap:
    candidate buckets holding more than ``max_bucket`` vectors are
    dropped BEFORE the probe join via an anti-join, under a named
    CollectMetrics observation — never silently.

    No cache: the query side signs only the ``vec_id < n_queries``
    slice (the filter reaches the parquet scan before the Arrow stage),
    so the corpus is signed exactly once — caching it would pin
    |corpus|·tables rows in executor memory for no reuse and leak the
    cached plan into long-lived sessions."""
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
    )
    q = lsh_signatures(emb.where(F.col("vec_id") < n_queries), n_planes, n_tables, dim).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("table").alias("q_table"),
        F.explode(probes).alias("probe_bucket"),
    )
    # checkpointed: the hot-bucket aggregate and the probe join are two
    # consumers, and recomputing the subtree means running the Arrow
    # signing pass twice (the minhash localCheckpoint doctrine)
    c = lsh_signatures(emb, n_planes, n_tables, dim).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), "table", "bucket"
    ).localCheckpoint()
    hot = (
        c.groupBy("table", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
        .observe(
            "knn_lsh_hot_buckets",
            F.count(F.lit(1)).alias("n_hot_buckets"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_rows_dropped"),
        )
        .select("table", "bucket")
    )
    c = c.join(hot, ["table", "bucket"], "left_anti")
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("table") == F.col("q_table"))
            & (F.col("probe_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", "qe", "ce")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("sim", F.round(cosine(F.col("qe"), F.col("ce")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


IVF_SEED = 9000  # plane-index offset so IVF centroids ≠ LSH hyperplanes
IVF_SAMPLE = 512  # deterministic training sample (first N vec_ids)
IVF_ITERS = 3     # Lloyd iterations on the sample


def _training_sample(emb: DataFrame):
    """The shared deterministic training sample (first IVF_SAMPLE
    vec_ids via TakeOrdered — layout-independent) both trainers
    consume. Collected ONCE per composed pipeline: knn_ivf_pq passes
    the same rows to the coarse quantizer and the PQ codebooks instead
    of paying two corpus-wide TakeOrdered jobs for identical data."""
    return emb.orderBy("vec_id").limit(IVF_SAMPLE).select("embedding").collect()


def train_centroids(
    emb: DataFrame, n_centroids: int, dim: int, sample: list | None = None
) -> list[list[float]]:
    """Spherical k-means-lite: deterministic pseudo-random init, then a
    few Lloyd iterations over a small fixed sample (first IVF_SAMPLE
    vec_ids), driver-side numpy. At 100 TB the sample is a
    `.sample(fraction)` collect of ~100k rows — training cost is
    independent of corpus size; only the assignment pass scales."""
    import numpy as np

    # deterministic for ANY id layout (orderBy+limit = TakeOrdered) —
    # a `vec_id < N` predicate would silently bake in 0-based fixture
    # ids and crash on an empty sample
    rows = sample if sample is not None else _training_sample(emb)
    if not rows:
        return [_plane_vals(dim, IVF_SEED + j) for j in range(n_centroids)]
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cents = np.array([_plane_vals(dim, IVF_SEED + j) for j in range(n_centroids)])
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    for _ in range(IVF_ITERS):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                c = members.sum(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return [[float(v) for v in c] for c in cents]


def ivf_assignments(
    emb: DataFrame, n_centroids: int = 16, dim: int = 64, centroids: list[list[float]] | None = None
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its max-cosine
    centroid — one narrow Arrow pass (per batch, (rows × dim) @
    (dim × n_centroids) matmul + argmax; ties break to the first
    centroid, same as array_position-of-max), no shuffle. Centroids
    come from :func:`train_centroids` (k-means-lite on a deterministic
    sample)."""
    import numpy as np
    import pandas as pd

    cents = centroids if centroids is not None else train_centroids(emb, n_centroids, dim)
    cmat = np.array(cents, dtype=np.float64)  # n_centroids × dim

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            cent = np.argmax(mat @ cmat.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "embedding": pdf["embedding"], "cent": cent}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, embedding array<float>, cent int"
    )


def knn_ivf(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``nprobe``
    closest centroids and scores only vectors assigned there — the
    inverted-list ANN scale path (scan fraction ≈ nprobe/n_centroids).
    Partitioning the assigned table by ``cent`` makes the probe join a
    co-located lookup at scale. Same schema as knn_bruteforce; recall
    asserted in tests."""
    import numpy as np
    import pandas as pd

    cents = train_centroids(emb, n_centroids, dim)
    # no cache: assigned feeds exactly one join — caching would pin the
    # corpus in memory for zero reuse and leak into long-lived sessions
    assigned = ivf_assignments(emb, n_centroids, dim, centroids=cents)
    # query probe order uses the SAME float64 BLAS matmul as corpus
    # assignment (ivf_assignments), so the two sides can never disagree
    # on a near-tie: identical inputs through identical accumulation
    # give bit-identical scores. A Catalyst-fold scoring here would
    # accumulate in a different order and could rank a near-tied top
    # centroid differently than argmax assigned it — with nprobe=1 that
    # query would probe the wrong cell entirely. Stable argsort breaks
    # exact ties to the lowest centroid index, matching argmax.
    cmat = np.array(cents, dtype=np.float64)

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            order = np.argsort(-(mat @ cmat.T), axis=1, kind="stable")[:, :nprobe]
            out = pdf.loc[pdf.index.repeat(order.shape[1])].reset_index(drop=True)
            out["probe_cent"] = order.ravel().astype("int32")
            yield out[["vec_id", "embedding", "probe_cent"]]

    q = (
        emb.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .mapInPandas(probe, "vec_id long, embedding array<float>, probe_cent int")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            "probe_cent",
        )
    )
    scored = (
        assigned.join(
            F.broadcast(q),
            (F.col("cent") == F.col("probe_cent")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def array_funcs_showcase(emb: DataFrame, sample_every: int = 100) -> DataFrame:
    """The higher-order array-function surface in one narrow pass over
    the embedding vectors: transform, filter, exists, forall, aggregate
    (fold), zip_with, slice, sort, distinct-size — the API family every
    dedup/similarity operator builds on, shown explicitly and
    oracle-checked against DuckDB's list functions."""
    v = F.col("embedding")
    return emb.where(F.col("vec_id") % sample_every == 0).select(
        "vec_id",
        F.size(v).cast("long").alias("dim"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double")), 6).alias("sum_fold"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.exists(v, lambda x: x > 0.49).alias("has_large"),
        F.forall(v, lambda x: x > -1.0).alias("all_gt_neg1"),
        F.round(F.aggregate(F.zip_with(v, v, lambda a, b: a.cast("double") * b.cast("double")),
                            F.lit(0.0), lambda a, x: a + x), 6).alias("self_dot"),
        F.round(F.element_at(F.array_sort(F.transform(v, lambda x: F.round(x.cast("double"), 6))), -1), 6).alias("max_val"),
        F.round(F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x.cast("double")), 6).alias("head8_sum"),
    )


def embedding_doc_join(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """Multimodal join: documents ⋈ embeddings by id, per-label doc
    stats. The embedding side is keyed by vec_id == doc_id."""
    joined = docs.join(emb, docs.doc_id == emb.vec_id)
    return joined.groupBy("label").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x.cast("double"))), 6).alias(
            "avg_embedding_sum"
        ),
    )


# product-quantization knobs
PQ_M = 16       # subspaces (64-d → 16 × 4-d sub-vectors)
PQ_KSUB = 16    # codewords per subspace (4-bit codes; 16 codes = 8 bytes/vector)
PQ_ITERS = 5    # Lloyd iterations per subspace on the training sample


def train_pq_codebooks(
    emb: DataFrame, m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = 64, sample: list | None = None
):
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the (normalized)
    vector into ``m`` sub-vectors and k-means each subspace
    independently — the cross product of the m codebooks is an implicit
    ksub^m-cell quantizer at m·ksub·dsub floats of storage.

    Deterministic: the training set is the first IVF_SAMPLE vec_ids
    (TakeOrdered, layout-independent), init spreads ksub sample rows
    evenly, Lloyd runs a fixed PQ_ITERS with empty-cluster carry-over —
    no RNG anywhere. Training cost is independent of corpus size (the
    sample is bounded); only the coding pass scales."""
    import numpy as np

    assert dim % m == 0, (dim, m)
    dsub = dim // m
    rows = sample if sample is not None else _training_sample(emb)
    if not rows:
        return np.zeros((m, ksub, dsub), dtype=np.float64)
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        # deterministic farthest-point init (k-means++ without RNG):
        # guarantees every distinct sub-vector value becomes its own
        # codeword whenever the subspace has <= ksub distinct values —
        # an even-stride init can pick duplicates and strand a cluster
        chosen = [0]
        d2min = ((sub - sub[0]) ** 2).sum(axis=1)
        for _ in range(ksub - 1):
            nxt = int(np.argmax(d2min))
            chosen.append(nxt)
            d2min = np.minimum(d2min, ((sub - sub[nxt]) ** 2).sum(axis=1))
        cents = sub[chosen].copy()
        for _ in range(PQ_ITERS):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_codes(
    emb: DataFrame, m: int = PQ_M, ksub: int = PQ_KSUB, dim: int = 64, codebooks=None
) -> DataFrame:
    """PQ encoding: one narrow Arrow pass — normalize, per-subspace
    argmin-L2 against the codebook, emit (vec_id, codes array<int>,
    recon_mse). 64 floats (256 B) become m 4-bit codes (8 B at the
    defaults) — the ~32× memory-bandwidth reduction is what makes scanning a 100 TB
    vector corpus feasible. Zero shuffle; codebooks ride in the
    closure (m·ksub·dsub floats, broadcast with the task)."""
    import numpy as np
    import pandas as pd

    books = codebooks if codebooks is not None else train_pq_codebooks(emb, m, ksub, dim)
    dsub = dim // m

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.zeros((len(mat), m), dtype=np.int32)
            mse = np.zeros(len(mat), dtype=np.float64)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
                mse += d2[np.arange(len(mat)), codes[:, j]]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "codes": list(codes),
                    "recon_mse": mse / dim,
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id long, codes array<int>, recon_mse double"
    )


def knn_pq(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    rerank: int = 48,
) -> DataFrame:
    """PQ approximate top-k via asymmetric distance computation (ADC):
    each query precomputes an m × ksub inner-product lookup table
    against the codebooks (driver-side — n_queries · m · ksub floats,
    bounded by construction), then the corpus scan scores each vector
    as a sum of m table lookups over its codes — no float vector is
    touched during the scan. The ADC top-``rerank`` shortlist is then
    RE-RANKED with exact cosine on the raw vectors (the standard
    ADC+rerank production shape: the compressed scan does the corpus-
    sized work, exact scoring touches only n_queries × rerank rows).
    Completes the ANN family: knn_bruteforce (exact) / knn_lsh (hash
    buckets) / knn_ivf (inverted lists) / knn_pq (compressed-domain
    scan). Same output schema; recall asserted in tests.

    Scale shape: encoding and ADC scoring are narrow Arrow passes over
    the codes table (m·log2(ksub) bits/vector — 16 B at the defaults,
    a 16× bandwidth cut); the shortlist join BROADCASTS the tiny
    shortlist onto the corpus scan; the only shuffles are the two
    bounded top-k windows."""
    import numpy as np
    import pandas as pd

    books = train_pq_codebooks(emb, m, ksub, dim)
    dsub = dim // m
    qrows = (
        emb.where(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect()
    )
    if not qrows:  # empty corpus / no query rows: defined empty result
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rk long"
        )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # LUT[q, j, c] = <query_q sub_j, codebook_j[c]>
    lut = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qmat), m, dsub), books)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # n × m
            n = len(codes)
            sims = np.zeros((len(qids), n), dtype=np.float64)
            for j in range(m):
                sims += lut[:, j, codes[:, j]]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), len(qids)),
                    "sim": np.round(sims.ravel(), 6),
                }
            )
            yield out[out["query_id"] != out["neighbor_id"]]

    scored = pq_codes(emb, m, ksub, dim, codebooks=books).mapInPandas(
        score, "query_id long, neighbor_id long, sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    shortlist = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qdf = emb.sparkSession.createDataFrame(
        [(int(r["vec_id"]), [float(v) for v in r["embedding"]]) for r in qrows],
        "query_id long, qe array<float>",
    )
    reranked = (
        emb.join(F.broadcast(shortlist), emb["vec_id"] == shortlist["neighbor_id"])
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
        )
    )
    return (
        reranked.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def hard_negative_mining(emb: DataFrame, n_anchors: int = 10) -> DataFrame:
    """Contrastive-pair mining over the labeled embedding table — the
    data-prep step for embedding-model training: for each anchor, the
    hardest POSITIVE (most-similar same-label vector; if even it is far,
    the label region is diffuse) and the hardest NEGATIVE (most-similar
    DIFFERENT-label vector — the pair that actually teaches the
    margin), plus the margin between them.

    Anchor side broadcasts (bounded); candidates never shuffle until
    reduced to two argmax rows per anchor via conditional max-of-struct
    aggregation (sim desc, id asc tie-break — deterministic in any
    engine). At 100 TB the exact scorer swaps for the knn_pq/knn_ivf
    shortlist with identical downstream aggregation.

    Similarity rides the int64 micro-grid (the embedding_drift
    doctrine): elements quantize ONCE to floor(x·1e6 + 0.5), the dot
    and squared norms are exact order-free int64 sums (≤ 6.4e13 at
    64 dims — inside 2^53, so the double casts are exact), and sqrt/
    divide/round are correctly-rounded IEEE ops on BIT-IDENTICAL
    inputs in both engines. A float32 fold instead differs by an ULP
    between engines, and round(·, 6) amplifies that to a wrong 6th
    decimal whenever a sim lands on a rounding boundary — observed
    live at sf0.001 (round-10 cross-SF oracle sweep)."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1_000_000 + F.lit(0.5)).cast("long"),
    )
    nrm2 = F.aggregate(
        F.transform(F.col("qv"), lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    base = (
        emb.select("vec_id", "label", q.alias("qv"))
        .select("vec_id", "label", "qv", F.sqrt(nrm2.cast("double")).alias("nrm"))
        .where(F.col("nrm") > 0)  # cosine undefined for zero vectors (guarded-divide doctrine)
    )
    a = base.where(F.col("vec_id") < n_anchors).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("qv").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    dot_int = F.aggregate(
        F.zip_with(F.col("qe"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = base.join(F.broadcast(a), F.col("vec_id") != F.col("anchor_id")).select(
        "anchor_id",
        "anchor_label",
        "vec_id",
        "label",
        F.round(dot_int.cast("double") / (F.col("qn") * F.col("nrm")), 6).alias("sim"),
    )
    # argmax as max-of-struct: (sim, -vec_id) orders by sim desc then
    # vec_id asc — the same total order the SQL row_number uses
    best = F.struct(F.col("sim"), (-F.col("vec_id")).alias("neg_id"))
    pos = F.max(F.when(F.col("label") == F.col("anchor_label"), best)).alias("pos")
    neg = F.max(F.when(F.col("label") != F.col("anchor_label"), best)).alias("neg")
    return (
        scored.groupBy("anchor_id", "anchor_label")
        .agg(pos, neg)
        .select(
            "anchor_id",
            "anchor_label",
            (-F.col("pos.neg_id")).cast("long").alias("pos_id"),
            F.col("pos.sim").alias("pos_sim"),
            (-F.col("neg.neg_id")).cast("long").alias("neg_id"),
            F.col("neg.sim").alias("neg_sim"),
            F.round(F.col("pos.sim") - F.col("neg.sim"), 6).alias("margin"),
        )
    )


def knn_ivf_pq(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 8,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    rerank: int = 64,
) -> DataFrame:
    """IVF + PQ composed — the FAISS "IVFADC" production ANN shape
    (Jégou et al. 2011 §IV): a coarse quantizer restricts each query
    to ``nprobe`` of ``n_centroids`` inverted lists, and within those
    lists the scan is compressed-domain ADC over 4-bit PQ codes; the
    shortlist is re-ranked with exact cosine. The separate knn_ivf
    (list restriction, raw vectors) and knn_pq (full-corpus ADC)
    queries each demonstrate one half; THIS is the shape a 100 TB
    vector corpus actually runs: scan fraction ≈ nprobe/n_centroids AND
    ~32× less bandwidth per scanned row, multiplicatively.

    Scale shape: cell assignment + PQ encoding happen in ONE narrow
    Arrow pass (no join between an assignment table and a codes table
    — at scale the codes live partitioned/bucketed by cell); the
    per-query probe set and ADC lookup tables are driver-side bounded
    (n_queries × m × ksub floats); the scan scores only rows whose
    cell is probed; the two top-k windows and the broadcast rerank are
    bounded by n_queries × rerank. Recall vs knn_bruteforce asserted
    in tests; rows-only for the driver like the rest of the ANN family.

    Measured on the fixture: the coarse restriction dominates the
    recall loss (IVF alone 0.52 at nprobe=4; composed 0.50) — with the
    exact rerank, quantization is nearly free, so recall tuning is
    nprobe tuning (0.78 at the nprobe=8 default).
    """
    import numpy as np
    import pandas as pd

    sample = _training_sample(emb)  # ONE TakeOrdered feeds both trainers
    cents = np.array(train_centroids(emb, n_centroids, dim, sample=sample), dtype=np.float64)
    books = train_pq_codebooks(emb, m, ksub, dim, sample=sample)
    dsub = dim // m
    qrows = emb.where(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect()
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rk long"
        )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # probe sets use the SAME matmul as corpus assignment (stable
    # argsort, ties to the lower centroid — the knn_ivf determinism
    # argument applies unchanged)
    probe = np.argsort(-(qmat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    lut = np.einsum("qjd,jcd->qjc", qn.reshape(len(qn), m, dsub), books)

    def encode_and_score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            cell = np.argmax(mat @ cents.T, axis=1)
            x = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(x), m), dtype=np.int64)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            ids = pdf["vec_id"].to_numpy()
            frames = []
            for qi in range(len(qids)):
                mask = np.isin(cell, probe[qi]) & (ids != qids[qi])
                if not mask.any():
                    continue
                c = codes[mask]
                sims = np.zeros(c.shape[0], dtype=np.float64)
                for j in range(m):
                    sims += lut[qi, j, c[:, j]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": ids[mask],
                            "sim": np.round(sims, 6),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        encode_and_score, "query_id long, neighbor_id long, sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    shortlist = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qdf = emb.sparkSession.createDataFrame(
        [(int(r["vec_id"]), [float(v) for v in r["embedding"]]) for r in qrows],
        "query_id long, qe array<float>",
    )
    reranked = (
        emb.join(F.broadcast(shortlist), emb["vec_id"] == shortlist["neighbor_id"])
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
        )
    )
    return (
        reranked.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def save_knn_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
) -> None:
    """Persist the IVF+PQ index :func:`knn_against_index` serves from —
    the PRODUCTION ANN shape (round-13 verdict item 5): the in-query
    :func:`knn_ivf_pq` retrains centroids/codebooks and re-encodes the
    corpus on EVERY query, which is the demo form; a serving pipeline
    trains once, persists, and answers every arriving query batch
    against the standing index.

    Layout: ``<path>/lists`` holds (vec_id, embedding, codes)
    partitioned by coarse cell — a Hive layout, so a query probing
    ``nprobe`` of ``n_centroids`` cells PRUNES the scan to those
    directories at planning time (PartitionFilters; the plan gate
    asserts it). Raw vectors ride in the lists next to their codes (the
    standard IVFADC + refine layout) so the exact rerank reads only
    probed cells too. ``<path>/model`` is the tiny sidecar —
    n_centroids + m·ksub rows of float64 arrays — that the query path
    loads driver-side (bounded by construction, never corpus-sized).

    Training + encoding match :func:`knn_ivf_pq` operation-for-
    operation (same bounded sample, same BLAS matmuls, same argmin/
    argmax tie rules), so serving from the index returns BIT-IDENTICAL
    results to the in-query form — parity-asserted in tests, and the
    registered query shares knn_ivf_pq's independent VALUES oracle.

    Scale shape: one bounded-sample train (corpus-size-independent),
    ONE narrow Arrow encode pass over the corpus, one shuffle on cell
    (write_partitioned_corpus — each cell written by its owning task).
    At 100 TB, raise n_centroids so cells stay file-sized;
    re-partitioning the lists is the only corpus-sized step and is
    paid once per index build."""
    import os

    import numpy as np
    import pandas as pd

    from ..sources.registry import write_partitioned_corpus

    spark = emb.sparkSession
    sample = _training_sample(emb)
    cents = np.array(
        train_centroids(emb, n_centroids, dim, sample=sample), dtype=np.float64
    )
    books = train_pq_codebooks(emb, m, ksub, dim, sample=sample)
    dsub = dim // m

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            cell = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
            x = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "codes": list(codes),
                    "cent": cell,
                }
            )

    coded = emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id long, embedding array<float>, codes array<int>, cent int"
    )
    write_partitioned_corpus(coded, os.path.join(path, "lists"), "cent")
    model_rows = [
        ("centroid", int(j), 0, [float(v) for v in cents[j]]) for j in range(n_centroids)
    ] + [
        ("codebook", int(j), int(c), [float(v) for v in books[j][c]])
        for j in range(m)
        for c in range(ksub)
    ]
    (
        spark.createDataFrame(model_rows, "kind string, i int, c int, vals array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "model"))
    )


def knn_against_index(
    spark,
    path: str,
    queries_df: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    rerank: int = 64,
) -> DataFrame:
    """Approximate top-k against the STANDING index written by
    :func:`save_knn_index` — NO training, NO corpus encode in the
    query path: load the bounded model sidecar, compute each query's
    probe set driver-side, and scan ONLY the probed cells (the Hive
    partition filter prunes every other directory at planning time —
    scan fraction ≈ |union of probe sets| / n_centroids before a byte
    is read). ADC scoring, shortlist and exact rerank are
    operation-identical to :func:`knn_ivf_pq`, so the result is
    bit-equal to the in-query form with the same parameters
    (parity-asserted in tests).

    Scale shape: model + query batch are bounded driver-side rows; the
    pruned lists scan is one narrow Arrow pass; the rerank joins a
    BROADCAST shortlist back onto the same pruned scan; the only
    shuffles are the two bounded top-k windows."""
    import os

    import numpy as np
    import pandas as pd

    mrows = spark.read.parquet(os.path.join(path, "model")).collect()
    cent_rows = sorted(
        ((r["i"], r["vals"]) for r in mrows if r["kind"] == "centroid")
    )
    book_rows = [
        (r["i"], r["c"], r["vals"]) for r in mrows if r["kind"] == "codebook"
    ]
    cents = np.array([v for _, v in cent_rows], dtype=np.float64)
    m = 1 + max(i for i, _, _ in book_rows)
    ksub = 1 + max(c for _, c, _ in book_rows)
    dsub = len(book_rows[0][2])
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for i, c, vals in book_rows:
        books[i][c] = vals
    qrows = queries_df.select("vec_id", "embedding").collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rk long"
        )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # probe order: SAME unnormalized matmul + stable argsort as index
    # build / knn_ivf_pq — near-tied centroids rank identically
    probe = np.argsort(-(qmat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    lut = np.einsum("qjd,jcd->qjc", qn.reshape(len(qn), m, dsub), books)
    probed = sorted({int(c) for row in probe for c in row})
    lists = spark.read.parquet(os.path.join(path, "lists")).where(
        F.col("cent").isin(probed)
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            cell = pdf["cent"].to_numpy()
            ids = pdf["vec_id"].to_numpy()
            frames = []
            for qi in range(len(qids)):
                mask = np.isin(cell, probe[qi]) & (ids != qids[qi])
                if not mask.any():
                    continue
                c = codes[mask]
                sims = np.zeros(c.shape[0], dtype=np.float64)
                for j in range(m):
                    sims += lut[qi, j, c[:, j]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": ids[mask],
                            "sim": np.round(sims, 6),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames)

    scored = lists.select("vec_id", "codes", "cent").mapInPandas(
        score, "query_id long, neighbor_id long, sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    shortlist = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qdf = spark.createDataFrame(
        [(int(r["vec_id"]), [float(v) for v in r["embedding"]]) for r in qrows],
        "query_id long, qe array<float>",
    )
    reranked = (
        lists.join(F.broadcast(shortlist), lists["vec_id"] == shortlist["neighbor_id"])
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
        )
    )
    return (
        reranked.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def embedding_drift(emb: DataFrame) -> DataFrame:
    """Embedding-space drift per subpopulation: how far each label's
    mean vector sits from the global mean, and along which dimension.
    The embedding twin of ``events.distribution_drift`` — the monitor a
    training pipeline runs per source/shard/day to catch representation
    shift before it poisons a mixture (a label whose centroid wanders
    is a subpopulation whose content changed).

    Output: (label, n_vecs, l2_to_global, top_dim, top_abs_delta) —
    L2 distance between the label centroid and the corpus centroid in
    embedding units, plus the single dimension contributing the
    largest |delta| (ties to the lowest dimension).

    Exactness doctrine (operators/clustering.py): components quantize
    ONCE to the 1e-6 integer grid; per-(label, dim) sums are exact
    int64 (map-side combined — the ONE corpus-sized shuffle, keyed on
    (label, pos)); the global sums re-aggregate the per-label rollup
    (aggregate-of-aggregate, no second scan). Centroid means land back
    on the micro grid via half-up integer division — pmod-corrected
    floor division on exactly-divisible integers, so truncating `div`
    is exact — making every delta an order-free integer; ssd ≤
    d·(2.4e6)² ≈ 4e14 stays int64-exact at ANY corpus size (deltas are
    value-bounded, not corpus-bounded). The only float ops are the
    final sqrt/divide/round, identical in Spark and DuckDB — a plain
    SQL oracle, no VALUES table needed.

    100 TB shape: one narrow exchange of d rows per input row after
    in-task projection; the d-row global side joins unhinted (AQE
    broadcasts it); the per-label window ranks d rows per label.
    int64 headroom: 2·s+n overflows past ~3.8e12 vectors per label —
    switch the two sum columns to DECIMAL(38,0) beyond that."""
    from .clustering import KM_SCALE

    comps = emb.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * KM_SCALE + F.lit(0.5)).cast("long"),
            )
        ).alias("pos", "qv"),
    )
    per = comps.groupBy("label", "pos").agg(
        F.sum("qv").alias("s_l"), F.count(F.lit(1)).alias("n_l")
    )
    glob = per.groupBy("pos").agg(F.sum("s_l").alias("s_g"), F.sum("n_l").alias("n_g"))
    m = (
        per.join(glob, "pos")
        .withColumn("ml_num", F.lit(2) * F.col("s_l") + F.col("n_l"))
        .withColumn("ml_den", F.lit(2) * F.col("n_l"))
        .withColumn("mg_num", F.lit(2) * F.col("s_g") + F.col("n_g"))
        .withColumn("mg_den", F.lit(2) * F.col("n_g"))
        # floor division via pmod correction: (num - pmod(num, den)) is
        # exactly divisible, so the truncating `div` equals floor —
        # half-toward-+inf mean in micro units, the kmeans convention
        .withColumn("m_l", F.expr("(ml_num - pmod(ml_num, ml_den)) div ml_den"))
        .withColumn("m_g", F.expr("(mg_num - pmod(mg_num, mg_den)) div mg_den"))
        .withColumn("delta", F.col("m_l") - F.col("m_g"))
    )
    stats = m.groupBy("label").agg(
        F.max("n_l").alias("n_vecs"),
        F.sum(F.col("delta") * F.col("delta")).alias("ssd"),  # exact int64
    )
    w = W.partitionBy("label").orderBy(F.abs(F.col("delta")).desc(), F.col("pos").asc())
    top = (
        m.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("label", F.col("pos").cast("long").alias("top_dim"), F.abs("delta").alias("top_abs"))
    )
    return (
        stats.join(top, "label")
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.round(F.sqrt(F.col("ssd").cast("double")) / KM_SCALE, 6).alias("l2_to_global"),
            "top_dim",
            F.round(F.col("top_abs").cast("double") / KM_SCALE, 6).alias("top_abs_delta"),
        )
        .orderBy("label")
    )


HYBRID_RECALL = 50   # BM25 recall set size
HYBRID_SEED = 5      # pseudo-relevance-feedback query docs
HYBRID_RRF_K = 60    # reciprocal-rank-fusion constant (Cormack 2009)
HYBRID_TOP = 15


def hybrid_search(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """Two-stage hybrid retrieval — the production RAG shape: a cheap
    lexical recall pass (BM25, :func:`..text.bm25_search`) pulls a
    bounded candidate set; an embedding cosine pass reranks it; the two
    rankings fuse by Reciprocal Rank Fusion (Cormack et al. 2009,
    ``1/(k+rank)`` — the Elasticsearch/Vespa default, rank-based so no
    score normalization is needed). The semantic query vector needs no
    query-side embedding model: it is the centroid of the top
    ``HYBRID_SEED`` BM25 hits' embeddings — classic pseudo-relevance
    feedback (Rocchio 1971).

    Output: (doc_id, bm25_rk, cos_rk, rrf_score, rk) over the top
    ``HYBRID_TOP`` fused results. Both rank lists are computed over the
    same candidate set (BM25 top-``HYBRID_RECALL`` ∩ has-embedding) so
    the fusion is well-defined when the corpus is partially embedded.

    Scale: everything corpus-sized lives inside bm25_search (term
    filter pushed to the tokenize scan, partial-agg tf, TakeOrdered
    top-k) and the one candidate×embeddings equi-join (unhinted; the
    candidate side measures ≤50 rows, AQE broadcasts it). Every window
    here ranks the ≤50-row candidate set — single-partition by design,
    bounded by HYBRID_RECALL, not by the corpus. The seed collect is 5
    rows (bounded, like the IVF training sample). Determinism: the
    seed centroid uses the clustering quantize-once grid (exact int
    sums + half-up division → micro-grid components identical in any
    engine); cosine is the shared left-to-right fold; RRF terms are
    exact reciprocals of small ints — all rounded half-up at 6."""
    import numpy as np

    from .clustering import KM_SCALE
    from .text import bm25_search

    cand = (
        bm25_search(docs, k=HYBRID_RECALL)
        .select("doc_id", F.col("score").alias("bm25_score"))
        .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
        .withColumn(
            "bm25_rk",
            F.row_number()
            .over(W.orderBy(F.col("bm25_score").desc(), F.col("doc_id").asc()))
            .cast("long"),
        )
        .localCheckpoint()  # consumed by the seed collect AND the rerank
    )
    seeds = cand.where(F.col("bm25_rk") <= HYBRID_SEED).select("doc_id", "embedding").collect()
    if not seeds:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, bm25_rk long, cos_rk long, rrf_score double, rk long"
        )
    S = np.array(
        [np.asarray(r["embedding"], dtype=np.float64) for r in sorted(seeds, key=lambda r: r["doc_id"])]
    )
    qsum = np.floor(S * KM_SCALE + 0.5).astype(np.int64).sum(axis=0)
    n = np.int64(len(S))
    qmicro = (2 * qsum + n) // (2 * n)  # half-up integer mean (micro grid)
    qcol = F.array(*[F.lit(float(v) / KM_SCALE) for v in qmicro])

    scored = cand.withColumn("cos", F.round(cosine(qcol, F.col("embedding")), 6)).withColumn(
        "cos_rk",
        F.row_number().over(W.orderBy(F.col("cos").desc(), F.col("doc_id").asc())).cast("long"),
    )
    rrf = F.round(
        1.0 / (F.lit(float(HYBRID_RRF_K)) + F.col("bm25_rk"))
        + 1.0 / (F.lit(float(HYBRID_RRF_K)) + F.col("cos_rk")),
        6,
    )
    return (
        scored.withColumn("rrf_score", rrf)
        .withColumn(
            "rk",
            F.row_number()
            .over(W.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()))
            .cast("long"),
        )
        .where(F.col("rk") <= HYBRID_TOP)
        .select("doc_id", "bm25_rk", "cos_rk", "rrf_score", "rk")
    )
