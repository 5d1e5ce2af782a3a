"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Two paths, as a 100 TB pipeline needs both:
  - ``cosine_topk``   — brute-force exact top-k: the correctness baseline.
    A bounded query set against the full corpus; the score is a pure
    fixed-order fold (no UDF), the per-query top-k is a window.
  - ``srp_lsh_*``     — signed-random-projection LSH: hash vectors to
    sign-bit buckets with deterministic LCG hyperplanes, then only compare
    within buckets. Turns O(Q*N) into O(Q*N/2^planes) per probe; at scale
    the bucket join is an equi-join Spark shuffles by bucket key.

Embedding near-duplicate detection (cosine >= threshold within LSH buckets)
reuses the same machinery — it is the `embedding-cosine near-dup` dedup
operator of BASELINE.json.

Determinism: hyperplane components come from the same LCG as the CCM
sampler, so the DuckDB oracle regenerates them exactly; cosines are rounded
before ranking with doc-id tie-breaks so both engines rank identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.rng import LCG_A, LCG_C, M31
from ccm_spark.functions.partitioning import spread

DIM = 64
SRP_PLANES = 8


def _dots(a, b) -> F.Column:
    """Sequential-fold dot product of two double arrays (fixed order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def as_double_vec(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine(a, b) -> F.Column:
    """Cosine similarity of two double arrays; 0.0 when either norm is 0.

    Pure-expression form: exactly engine-portable (fixed fold order), but
    Spark interprets higher-order lambdas per element (~25us/op — they are
    not codegen'd), so this is only for small candidate sets and tests.
    The hot paths use :func:`cosine_pandas`."""
    dot = _dots(a, b)
    na = F.sqrt(_dots(a, a))
    nb = F.sqrt(_dots(b, b))
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(dot / (na * nb))


def cosine_pandas():
    """Vectorised cosine as an Arrow-batched pandas UDF (numpy per batch).
    Same result to float ulp — the query boundary rounds to 9 decimals, so
    oracle parity is unaffected. Defined in functions.vector_udfs because
    pandas_udf cannot live under postponed annotations."""
    from ccm_spark.functions.vector_udfs import cosine_sim

    return cosine_sim


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 100, k: int = 5
) -> DataFrame:
    """Exact brute-force top-k: for vec_id < n_queries, the k most cosine-
    similar other vectors. Rank key = (round(cos, 9) desc, target id asc) so
    near-tie ordering is engine-independent."""
    import numpy as np
    import pandas as pd

    # The bounded query set (n_queries rows) is collected once and shipped
    # via SparkContext.broadcast — ONCE per executor, not re-pickled into
    # every task binary (at a production query load, 1e5 queries x 512 dims
    # is ~400 MB; closure capture would multiply that by task count). Each
    # target batch is a single matmul against it. No pair-wise array
    # materialisation — only (target, query, score) scalars leave.
    q_rows = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select("vec_id", as_double_vec("embedding").alias("v"))
        .collect()
    )
    if not q_rows:
        # no vector falls under the id cutoff (e.g. a filtered corpus
        # whose surviving ids all exceed n_queries) — empty result, not
        # a shape error in the einsum kernel
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, rank int, target_id long, cos_sim double"
        )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.v for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat))
    bc = embeddings.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))

    t = spread(embeddings, "vec_id").select(
        F.col("vec_id").alias("target_id"), as_double_vec("embedding").alias("tv")
    )

    def score(batches):
        q_ids, q_mat, q_norm = bc.value
        for pdf in batches:
            tm = np.stack(pdf["tv"].to_numpy()).astype(np.float64)
            tn = np.sqrt(np.einsum("ij,ij->i", tm, tm))
            denom = np.outer(tn, q_norm)
            cos = np.where(denom == 0.0, 0.0, (tm @ q_mat.T) / np.where(denom == 0.0, 1.0, denom))
            nt, nq = cos.shape
            yield pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, nt),
                    "target_id": np.repeat(pdf["target_id"].to_numpy(), nq),
                    # raw: rounded Spark-side below so the tie rule
                    # matches DuckDB (np.round is binary banker's)
                    "cos_sim": cos.ravel(),
                }
            )

    scored = (
        t.mapInPandas(
            score, schema="query_id long, target_id long, cos_sim double"
        )
        .withColumn("cos_sim", F.round("cos_sim", 9))
        .where(F.col("query_id") != F.col("target_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("target_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col("rk").alias("rank"), "target_id", "cos_sim")
    )


def srp_plane_values(planes: int = SRP_PLANES, dim: int = DIM, seed: int = 99) -> list[tuple[int, int, float]]:
    """(plane, dim_idx, component) — deterministic pseudo-random hyperplanes
    in [-1, 1], LCG-generated so any engine can rebuild them exactly."""
    out = []
    state = seed
    for pl in range(planes):
        for d in range(dim):
            state = (LCG_A * state + LCG_C) % M31
            out.append((pl, d, (state % 2001) / 1000.0 - 1.0))
    return out


def random_projection(
    embeddings: DataFrame, out_dim: int = 16, seed: int = 177
) -> DataFrame:
    """(vec_id, dim_idx, comp): L2-normalised embeddings projected to
    ``out_dim`` dimensions with deterministic LCG hyperplanes — the
    dimensionality-reduction step an embedding pipeline runs before
    clustering/ANN at scale (Johnson-Lindenstrauss style).

    comp_j = dot(v, plane_j) / ||v||, zero-vector guard -> 0.0. Long-form
    output (one row per component) so the cross-engine hash compares
    scalars, not array representations. JVM-side explode + sum mirrors the
    oracle's aggregation exactly; at production scale swap in a pandas-UDF
    matmul per Arrow batch (same shape as cosine_topk's kernel).
    """
    spark = embeddings.sparkSession
    plane_rows = srp_plane_values(out_dim, DIM, seed)
    planes = spark.createDataFrame(
        plane_rows, "plane int, dim_idx int, comp double"
    )
    vals = spread(embeddings, "vec_id").select(
        "vec_id", F.posexplode(as_double_vec("embedding")).alias("d", "val")
    )
    norms = vals.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm")
    )
    dots = (
        vals.join(F.broadcast(planes), vals.d == planes.dim_idx)
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("val") * F.col("comp")).alias("dot"))
    )
    return dots.join(norms, "vec_id").select(
        "vec_id",
        F.col("plane").alias("dim_idx"),
        F.when(F.col("norm") == 0.0, F.lit(0.0))
        .otherwise(F.col("dot") / F.col("norm"))
        .alias("comp"),
    )


def srp_buckets(
    embeddings: DataFrame, planes: int = SRP_PLANES, seed: int = 99
) -> DataFrame:
    """(vec_id, bucket): sign-bit bucket id from dot products with the
    hyperplanes. dot >= 0 -> bit set."""
    spark = embeddings.sparkSession
    embeddings = spread(embeddings, "vec_id")  # spread single-file inputs
    plane_rows = srp_plane_values(planes, DIM, seed)
    planes_df = spark.createDataFrame(plane_rows, "plane int, dim_idx int, comp double")
    comps = (
        embeddings.select(
            "vec_id", F.posexplode(as_double_vec("embedding")).alias("dim_idx", "v")
        )
        .join(F.broadcast(planes_df), "dim_idx")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("v") * F.col("comp")).alias("dot"))
    )
    # F.shiftleft needs a literal shift amount; the SQL form takes a column
    pw = F.expr("shiftleft(CAST(1 AS BIGINT), plane)")
    bit = F.when(F.col("dot") >= 0.0, pw).otherwise(F.lit(0).cast("long"))
    return comps.groupBy("vec_id").agg(F.sum(bit).alias("bucket"))


IVF_STRIDE = 125  # every 125th vector is a centroid (~16 cells at 2000 vecs)
IVF_NPROBE = 2


def strided_centroids(embeddings: DataFrame, stride: int = IVF_STRIDE) -> DataFrame:
    """(centroid_id, cv): the deterministic strided centroid set."""
    return embeddings.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"), as_double_vec("embedding").alias("cv")
    )


def _widen_centroids(centroids: DataFrame) -> DataFrame:
    """Accept either centroid form everywhere a quantizer can be passed
    (in-session build OR a persisted index loaded by
    ``sources.sinks.read_ivf_index``): wide ``(centroid_id, cv)`` passes
    through; long ``(centroid_id, dim_idx, comp)`` pivots to wide —
    components ordered by dim_idx (array_sort on (dim_idx, comp) structs
    sorts by the leading field). k x dim rows — tiny, one agg."""
    if "cv" in centroids.columns:
        return centroids
    return (
        centroids.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim_idx", "comp"))).alias("s"))
        .select("centroid_id", F.expr("transform(s, p -> p.comp)").alias("cv"))
    )


def ivf_assignments(
    embeddings: DataFrame,
    stride: int = IVF_STRIDE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantizer: every vector is assigned to its nearest
    centroid by rounded cosine (ties -> lowest centroid id). Centroids
    default to the deterministic strided subset (vec_id % stride == 0);
    pass ``centroids`` for a trained quantizer and nothing downstream
    changes — either wide form (centroid_id, cv: array<double>) or the
    long form :func:`ivf_kmeans_centroids` returns (centroid_id, dim_idx,
    comp), which is pivoted here (k x dim rows — tiny, one agg). Scale:
    the centroid set is tiny and broadcast; assignment is a map-side
    cross product, one rank window per vector.
    """
    vecs = spread(embeddings, "vec_id").select(
        "vec_id", as_double_vec("embedding").alias("v")
    )
    if centroids is not None:
        centroids = _widen_centroids(centroids)
    cents = centroids if centroids is not None else strided_centroids(embeddings, stride)
    cos = cosine_pandas()
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        F.round(cos(F.col("v"), F.col("cv")), 9).alias("c_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("crk", F.row_number().over(w))
        .where(F.col("crk") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_kmeans_centroids(
    embeddings: DataFrame, stride: int = IVF_STRIDE, n_iters: int = 2
) -> DataFrame:
    """(centroid_id, dim_idx, comp) as a DataFrame — see
    :func:`_kmeans_centroid_rows` for the algorithm."""
    return embeddings.sparkSession.createDataFrame(
        _kmeans_centroid_rows(embeddings, stride, n_iters),
        "centroid_id long, dim_idx int, comp double",
    )


def _kmeans_centroid_rows(
    embeddings: DataFrame, stride: int = IVF_STRIDE, n_iters: int = 2
) -> list[tuple]:
    """(centroid_id, dim_idx, comp) rows: IVF coarse centroids TRAINED with
    ``n_iters`` Lloyd iterations (spherical k-means: cosine assignment,
    per-cluster mean update) from the deterministic strided init.

    Cross-engine determinism for an iterative float algorithm: centroids
    are rounded to 6 decimals after every update, so both engines restart
    each iteration from bit-identical state and assignment (cosine rounded
    at 9, centroid-id tie-break) cannot drift. Clusters that lose all
    members drop out in both engines alike.

    Scale: vectors stay long-form (vec_id, dim, val) and partitioned by
    vec_id; the centroid relation (k x dim rows) broadcasts into the
    assignment join each iteration — the classic distributed-KMeans shape
    (per-iteration cost: one broadcast join + two keyed aggregations).
    The final centroid relation is k x dim rows BY DESIGN (tiny), so it is
    materialised on the driver and returned as plain rows — that truncates
    the iteration lineage, lets the cached vals relation be released
    instead of leaking executor cache blocks per call, and lets consumers
    (ivf_kmeans_topk) reshape without a second collect.
    """
    vals = spread(embeddings, "vec_id").select(
        "vec_id", F.posexplode(as_double_vec("embedding")).alias("d", "val")
    ).persist()
    # r15: vnorm is loop-INVARIANT but was lazily recomputed (one
    # corpus-sized aggregate over the persisted vals) inside every
    # iteration's cos join — persist it once alongside vals
    vnorm = vals.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn")
    ).persist()
    cents = vals.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"), "d", F.col("val").alias("cval")
    )
    for _ in range(n_iters):
        # r15: cut the iteration lineage at the (k x dim — tiny)
        # centroid relation. Left lazy, iteration i's cents is consumed
        # TWICE (cnorm + the dots join) and each consumer re-evaluates
        # the corpus-sized vals.join(assign) rebuild of the PREVIOUS
        # iteration, nesting geometrically with n_iters; the eager cut
        # makes each iteration exactly one broadcast-join pass + one
        # rebuild aggregate over the persisted vals.
        cents = cents.localCheckpoint(eager=True)
        cnorm = cents.groupBy("centroid_id").agg(
            F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cn")
        )
        dots = (
            vals.join(F.broadcast(cents), "d")
            .groupBy("vec_id", "centroid_id")
            .agg(F.sum(F.col("val") * F.col("cval")).alias("dot"))
        )
        cos = (
            dots.join(vnorm, "vec_id")
            .join(F.broadcast(cnorm), "centroid_id")
            .select(
                "vec_id",
                "centroid_id",
                F.round(
                    F.when((F.col("vn") == 0.0) | (F.col("cn") == 0.0), F.lit(0.0))
                    .otherwise(F.col("dot") / (F.col("vn") * F.col("cn"))),
                    9,
                ).alias("cs"),
            )
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cs").desc(), F.col("centroid_id").asc()
        )
        assign = (
            cos.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("vec_id", "centroid_id")
        )
        cents = (
            vals.join(assign, "vec_id")
            .groupBy("centroid_id", "d")
            .agg(F.round(F.avg("val"), 6).alias("cval"))
        )
    final = cents.select(
        "centroid_id", F.col("d").alias("dim_idx"), F.col("cval").alias("comp")
    )
    rows = [(r.centroid_id, r.dim_idx, r.comp) for r in final.collect()]
    vals.unpersist()
    vnorm.unpersist()
    return rows


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 100,
    k: int = 5,
    stride: int = IVF_STRIDE,
    nprobe: int = IVF_NPROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-probed approximate top-k: each query searches only the vectors
    assigned to its ``nprobe`` most-similar centroids. Approximate by
    construction (recall depends on cell structure) — the brute-force
    ``cosine_topk`` is the exact baseline. ``centroids`` swaps in a
    trained quantizer (see :func:`ivf_kmeans_topk`)."""
    from pyspark.storagelevel import StorageLevel

    cents = (
        _widen_centroids(centroids)
        if centroids is not None
        else strided_centroids(embeddings, stride)
    )
    assign = ivf_assignments(embeddings, stride, centroids=cents).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    vecs = embeddings.select("vec_id", as_double_vec("embedding").alias("v"))
    cos = cosine_pandas()
    q = vecs.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # probe list: nprobe nearest centroids per query
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "centroid_id",
            F.round(cos(F.col("qv"), F.col("cv")), 9).alias("c_sim"),
        )
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("c_sim").desc(), F.col("centroid_id").asc()
                )
            ),
        )
        .where(F.col("crk") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    # candidates: vectors in the probed cells
    cands = (
        probes.join(assign, "centroid_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(vecs, "vec_id")
        .select(
            "query_id",
            F.col("vec_id").alias("target_id"),
            F.round(cos(F.col("qv"), F.col("v")), 9).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("target_id").asc()
    )
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col("rk").cast("int").alias("rank"), "target_id", "cos_sim")
    )


def ivf_kmeans_topk(
    embeddings: DataFrame,
    n_queries: int = 100,
    k: int = 5,
    stride: int = IVF_STRIDE,
    nprobe: int = IVF_NPROBE,
    n_iters: int = 2,
) -> DataFrame:
    """End-to-end trained ANN: Lloyd-trained centroids feeding the IVF
    probe. The trained centroid relation is k x dim (tiny, already
    driver-materialised by _kmeans_centroid_rows), so reshaping long-form
    rows into array vectors happens driver-side at no meaningful cost."""
    long_rows = _kmeans_centroid_rows(embeddings, stride, n_iters)
    by_cent: dict[int, dict[int, float]] = {}
    for cid, dim_idx, comp in long_rows:
        by_cent.setdefault(cid, {})[dim_idx] = comp
    rows = [
        (cid, [comps[d] for d in sorted(comps)]) for cid, comps in sorted(by_cent.items())
    ]
    cents = embeddings.sparkSession.createDataFrame(
        rows, "centroid_id long, cv array<double>"
    )
    return ivf_topk(
        embeddings, n_queries, k, stride, nprobe, centroids=F.broadcast(cents)
    )


def ivf_recall(
    embeddings: DataFrame,
    n_queries: int = 100,
    k: int = 5,
) -> DataFrame:
    """Per-query recall@k of the trained-IVF probe against exact brute
    force — the number an ANN user actually needs before trusting the
    approximate path at scale.

    Both sides are the already-pinned query surfaces (:func:`cosine_topk`,
    :func:`ivf_kmeans_topk`), so this is a pure (query_id, target_id)
    semi-match: left join exact->approx, count hits per query. n_queries
    rows out; the join keys are (query, target) pairs bounded at
    n_queries*k rows per side, so the comparison itself is negligible next
    to the two searches."""
    exact = cosine_topk(embeddings, n_queries, k).select("query_id", "target_id")
    approx = (
        ivf_kmeans_topk(embeddings, n_queries, k)
        .select("query_id", "target_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(approx, ["query_id", "target_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            (F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(k)), 6) + F.lit(0.0)).alias("recall"),
        )
    )


def adaptive_srp_planes(n: int, target_bucket_size: int = 16) -> int:
    """Plane count sized to the corpus: ~log2(N / target_bucket) sign bits
    keep the EXPECTED bucket population near ``target_bucket_size`` however
    large N grows, so the within-bucket self-join stays ~N * target pairs
    instead of N^2 / 2^planes blowing up at a fixed plane count. Floor of
    SRP_PLANES (small corpora), cap 62 (bucket id is a 64-bit long)."""
    import math

    return min(62, max(SRP_PLANES, math.ceil(math.log2(max(1.0, n / target_bucket_size)))))


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes: int | None = None,
    seed: int = 99,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs: same SRP bucket AND exact cosine >= threshold.

    ``planes=None`` (default) derives the plane count from the corpus size
    (:func:`adaptive_srp_planes`) — pass an explicit count only when a
    fixed bucketization must be replayed (e.g. the oracle gate). Buckets
    larger than ``max_bucket_size`` are dropped from candidate generation
    (same safety valve as dedup.simhash_near_duplicates): a near-constant
    corpus collapses into one bucket and would otherwise make the
    self-join quadratic in N; the cap bounds candidates at N * cap while
    sane corpora never hit it."""
    from pyspark.storagelevel import StorageLevel

    if planes is None:
        planes = adaptive_srp_planes(embeddings.count())
    b = srp_buckets(embeddings, planes, seed)
    vecs = embeddings.select("vec_id", as_double_vec("embedding").alias("v"))
    # attach vectors ONCE, apply the bucket cap as a window count (single
    # exchange on bucket, which the self-join below reuses), and persist
    # the combined relation — it feeds both sides of the self-join
    bucket_w = Window.partitionBy("bucket")
    bv = (
        b.join(vecs, "vec_id")
        .withColumn("bucket_n", F.count("*").over(bucket_w))
        .where(F.col("bucket_n") <= max_bucket_size)
        .drop("bucket_n")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    left = bv.select(
        F.col("vec_id").alias("id_a"), F.col("bucket"), F.col("v").alias("va")
    )
    right = bv.select(
        F.col("vec_id").alias("id_b"), F.col("bucket"), F.col("v").alias("vb")
    )
    cos = cosine_pandas()
    out = (
        left.join(right, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cos(F.col("va"), F.col("vb")), 9).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    out._ccm_persisted = [bv]
    return out


# --- Product quantization (PQ): the ANN memory-compression scale path ------
#
# IVF bounds the SEARCH cost; PQ bounds the MEMORY cost. A 64-dim float64
# vector is 512 bytes; its PQ code (PQ_M subspace bytes) is PQ_M bytes — 64x
# smaller at the default m=8, which is the difference between a 100 TB
# embedding corpus fitting executor memory as codes (~1.5 TB at 1e9 docs,
# comfortably partitioned) or not fitting at all. The reference engine has
# no similarity surface (SURVEY.md §2.1); this follows Jégou et al.,
# "Product Quantization for Nearest Neighbor Search" (TPAMI 2011).

PQ_M = 8  # subspaces (must divide the embedding dim)
PQ_KSUB = 256  # codes per subspace — the standard one-byte PQ code
PQ_TRAIN_STRIDE = 1  # every vector trains by default (small fixtures)


def pq_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    n_iters: int = 5,
    train_stride: int = PQ_TRAIN_STRIDE,
) -> list:
    """Train per-subspace codebooks: a list of ``m`` float64 numpy arrays,
    each (ksub x dim/m), learned by Lloyd k-means (L2, per subspace) on
    L2-NORMALISED vectors — normalising first makes the quantised inner
    product estimate cosine, the metric every other family here uses.

    Training follows standard PQ practice (faiss trains on a bounded
    sample, not the corpus): a deterministic strided sample
    (``vec_id % train_stride == 0``) is collected driver-side — callers at
    scale set ``train_stride`` so the sample is ~100k vectors, the
    published sweet spot — and trained in numpy. Determinism across runs
    and engines: sample ordered by vec_id, centroids initialised from the
    first ksub sample rows strided across the sample, every update rounded
    to 6 decimals (same discipline as the IVF Lloyd trainer), assignment
    ties -> lowest code. Empty clusters keep their previous centroid (no
    resampling, no RNG anywhere).

    The bounded-sample assumption is ENFORCED (same guard discipline as
    decontaminate_stream): a distributed count runs before the collect,
    and a stride that would pull more than ``max_train_sample`` vectors
    to the driver raises a clear ValueError instead of failing as a
    driver OOM mid-collect.
    """
    import numpy as np

    max_train_sample = 1_000_000
    sample = embeddings.where(F.col("vec_id") % train_stride == 0)
    n_sample = sample.count()
    if n_sample > max_train_sample:
        raise ValueError(
            f"PQ training sample is {n_sample} vectors (stride {train_stride}); "
            f"raise train_stride so at most {max_train_sample} collect to the "
            "driver — PQ codebooks train on a bounded sample by design"
        )
    rows = (
        sample.select("vec_id", as_double_vec("embedding").alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    x = np.array([r.v for r in rows], dtype=np.float64)
    norms = np.sqrt(np.einsum("ij,ij->i", x, x))
    x = x / np.where(norms == 0.0, 1.0, norms)[:, None]
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    dsub = dim // m
    from ccm_spark.functions.hashing import np_round_half_up

    books = []
    for s in range(m):
        sub = x[:, s * dsub : (s + 1) * dsub]
        k = min(ksub, n)
        init_idx = [(i * n) // k for i in range(k)]
        # half-up, not np.round: a centroid component landing on a
        # decimal tie would otherwise round differently from the DuckDB
        # trainer replay and poison every code and ADC score downstream
        cents = np_round_half_up(sub[init_idx], 6)
        for _ in range(n_iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            codes = np.argmin(d2, axis=1)  # first (lowest) index on ties
            for c in range(k):
                members = sub[codes == c]
                if len(members):
                    cents[c] = np_round_half_up(members.mean(axis=0), 6)
        books.append(cents)
    return books


def pq_encode(embeddings: DataFrame, codebooks: list) -> DataFrame:
    """(vec_id, codes): every vector's PQ code — the nearest codebook row
    per subspace by L2 on the L2-normalised vector (ties -> lowest code).
    A pure narrow Arrow-batched projection of the scan: the codebooks ride
    the UDF closure (m * ksub * dsub floats — a few KB), NOTHING shuffles,
    and the output is the 64x-compressed relation a 100 TB corpus persists
    instead of raw vectors. The UDF lives in functions.vector_udfs
    (pandas_udf cannot be defined under this module's postponed
    annotations).

    Because nothing here aggregates, the same plan runs on a STREAMING
    increment unchanged (append mode, zero state) — new embeddings can be
    encoded at ingestion time against frozen codebooks, exactly like the
    streaming MinHash index probe; stream == batch is test-pinned."""
    from ccm_spark.functions.vector_udfs import pq_encode_udf

    if not embeddings.isStreaming:
        embeddings = spread(embeddings, "vec_id")
    return embeddings.select(
        "vec_id", pq_encode_udf(codebooks)(as_double_vec("embedding")).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    n_queries: int = 100,
    k: int = 5,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    n_iters: int = 5,
    train_stride: int = PQ_TRAIN_STRIDE,
    codebooks: list | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: queries stay exact,
    targets are their codes. Per query the inner product against every
    sub-centroid is precomputed as an (m x ksub) lookup table; a
    candidate's score is then m table lookups summed — independent of the
    embedding dim, over a corpus stored at 1/64th the footprint.

    Same streaming shape as :func:`cosine_topk`: the bounded query tables
    ship in the mapInPandas closure, the CODE relation streams through
    executors (one numpy gather+sum per Arrow batch), only
    (query, target, score) scalars shuffle into the top-k window. Scores
    are the cosine of the quantised target with the exact query — rounded
    at 9 like every similarity here; ranking quality vs exact search is
    measured by :func:`pq_recall`, not assumed."""
    import numpy as np
    import pandas as pd

    books = codebooks if codebooks is not None else pq_codebooks(
        embeddings, m, ksub, n_iters, train_stride
    )
    books = [np.asarray(b, dtype=np.float64) for b in books]
    m = len(books)
    dsub = books[0].shape[1]

    q_rows = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select("vec_id", as_double_vec("embedding").alias("v"))
        .collect()
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.v for r in q_rows], dtype=np.float64)
    qn = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat))
    q_mat = q_mat / np.where(qn == 0.0, 1.0, qn)[:, None]
    # tables[s]: (n_queries x ksub) inner products in subspace s — shipped
    # once per executor via SparkContext.broadcast, not once per task (same
    # fix as decontaminate_stream; at production query counts the table
    # stack is n_queries * m * ksub floats).
    tables = [
        q_mat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(m)
    ]
    bc = embeddings.sparkSession.sparkContext.broadcast((q_ids, tables))

    codes = pq_encode(embeddings, books)

    def score(batches):
        q_ids, tables = bc.value
        for pdf in batches:
            cm = np.stack(pdf["codes"].to_numpy())  # (batch x m)
            acc = tables[0][:, cm[:, 0]]  # (n_queries x batch)
            for s in range(1, m):
                acc = acc + tables[s][:, cm[:, s]]
            nq, nt = acc.shape
            yield pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, nt),
                    "target_id": np.repeat(pdf["vec_id"].to_numpy(), nq),
                    # raw: the boundary rounding happens Spark-side
                    # (F.round below) so the tie rule matches DuckDB
                    "adc_sim": acc.T.ravel(),
                }
            )

    scored = (
        codes.mapInPandas(
            score, schema="query_id long, target_id long, adc_sim double"
        )
        .withColumn("adc_sim", F.round("adc_sim", 9))
        .where(F.col("query_id") != F.col("target_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("target_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col("rk").alias("rank"), "target_id", "adc_sim")
    )


def pq_recall(
    embeddings: DataFrame,
    n_queries: int = 100,
    k: int = 5,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
) -> DataFrame:
    """Per-query recall@k of PQ-ADC search against exact brute force —
    same gate discipline as :func:`ivf_recall`: the compression path is
    only trusted at scale with its measured recall next to it."""
    exact = cosine_topk(embeddings, n_queries, k).select("query_id", "target_id")
    approx = (
        pq_topk(embeddings, n_queries, k, m, ksub)
        .select("query_id", "target_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(approx, ["query_id", "target_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
            (
                F.round(
                    F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(float(k)), 6
                )
                + F.lit(0.0)
            ).alias("recall"),
        )
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    n_queries: int = 100,
    k: int = 5,
    stride: int = IVF_STRIDE,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    n_iters: int = 5,
    train_stride: int = PQ_TRAIN_STRIDE,
) -> DataFrame:
    """The composed faiss-style index (IVF-PQ): the coarse quantizer
    bounds which vectors are LOOKED AT (nprobe cells per query), PQ
    bounds what is STORED (one-byte codes per subspace) — together the
    shape that searches 1e9+ vectors from executor memory.

    Plan: the IVF probe list and cell assignments are exactly
    :func:`ivf_topk`'s (broadcast centroids, one rank window), but
    candidates join the 64x-compressed CODE relation instead of raw
    vectors and are scored by one Arrow-batched ADC gather
    (``pq_adc_udf`` — per-candidate cost m table lookups). Raw embeddings
    are read only by training/encoding and the bounded query collect;
    the search itself never touches them. With ``nprobe`` >= the cell
    count the result is exactly :func:`pq_topk` (test-pinned); recall
    composes multiplicatively (IVF's candidate recall x PQ's ranking
    recall), so gate both halves with their recall queries before
    trusting the composition at scale."""
    import numpy as np

    from ccm_spark.functions.vector_udfs import pq_adc_udf
    from pyspark.storagelevel import StorageLevel

    books = pq_codebooks(embeddings, m, ksub, n_iters, train_stride)
    books = [np.asarray(b, dtype=np.float64) for b in books]
    dsub = books[0].shape[1]

    q_rows = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select("vec_id", as_double_vec("embedding").alias("v"))
        .collect()
    )
    q_mat = np.array([r.v for r in q_rows], dtype=np.float64)
    qn = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat))
    q_mat = q_mat / np.where(qn == 0.0, 1.0, qn)[:, None]
    q_index = {r.vec_id: i for i, r in enumerate(q_rows)}
    # (n_queries x m x ksub): per-query inner products with every codebook
    # row — broadcast once per executor (see pq_adc_udf), not closure-shipped
    tables = np.stack(
        [q_mat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(len(books))],
        axis=1,
    )
    bc_qt = embeddings.sparkSession.sparkContext.broadcast((q_index, tables))

    cents = strided_centroids(embeddings, stride)
    assign = ivf_assignments(embeddings, stride, centroids=cents).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    codes = pq_encode(embeddings, books)
    vecs = embeddings.select("vec_id", as_double_vec("embedding").alias("v"))
    cos = cosine_pandas()
    q = vecs.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "centroid_id",
            F.round(cos(F.col("qv"), F.col("cv")), 9).alias("c_sim"),
        )
        .withColumn(
            "crk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("c_sim").desc(), F.col("centroid_id").asc()
                )
            ),
        )
        .where(F.col("crk") <= nprobe)
        .select("query_id", "centroid_id")
    )
    adc = pq_adc_udf(bc_qt)
    cands = (
        probes.join(assign, "centroid_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(codes, "vec_id")
        .select(
            "query_id",
            F.col("vec_id").alias("target_id"),
            F.round(adc(F.col("query_id"), F.col("codes")), 9).alias("adc_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("target_id").asc()
    )
    out = (
        cands.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col("rk").alias("rank"), "target_id", "adc_sim")
    )
    out._ccm_persisted = [assign]
    return out


def embedding_index(
    embeddings: DataFrame, planes: int | None = None, seed: int = 99
) -> dict:
    """The corpus-side half of ingestion-time embedding near-dup — the
    vector twin of ``dedup.minhash_index`` / ``urls.url_index``:
    ``buckets`` is the (vec_id, bucket, embedding) relation (persist it
    as parquet), ``plane_values`` the SRP geometry (persist via
    ``sources.sinks.write_srp_planes`` so tomorrow's probe buckets with
    the index's OWN planes, guarded against generator drift)."""
    if planes is None:
        planes = adaptive_srp_planes(embeddings.count())
    vals = srp_plane_values(planes, DIM, seed)
    b = srp_buckets(embeddings, planes, seed)
    return {
        "buckets": embeddings.join(b, "vec_id").select(
            "vec_id", "bucket", "embedding"
        ),
        "plane_values": vals,
        "planes": planes,
        "seed": seed,
    }


def probe_embedding_index(
    increment: DataFrame,
    index_buckets: DataFrame,
    plane_values: list,
    threshold: float = 0.95,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Ingestion-time embedding near-dup: (vec_id, match_id, cos_sim)
    for every increment vector whose cosine to an indexed vector in its
    SRP bucket reaches ``threshold`` — new data probes a FROZEN index
    (never rebucketed, never shuffled by the increment).

    Plan shape: the increment buckets via a narrow Arrow kernel against
    the index's stored plane values (``srp_bucket_udf`` — no explode, no
    aggregate), then one stream-static-joinable equi-join on bucket plus
    the exact cosine verify. No aggregation anywhere, so the SAME plan
    runs on a STREAMING increment in append mode with zero state
    (stream == batch test-pinned), exactly like ``urls.probe_url_index``
    and the MinHash probe. Hot buckets in the INDEX are capped with the
    usual window count (computed on the static side only — the
    streaming side never windows).

    Recall caveat (same as every SRP family): only the increment
    vector's own bucket is probed; a true near-dup straddling a
    hyperplane is missed. Sign bits come from the same raw-vector dots
    as the explode plan; agreement is exact except for dots within one
    ulp of zero (measure-zero on real embeddings)."""
    from ccm_spark.functions.vector_udfs import srp_bucket_udf

    n_planes = 1 + max(pl for pl, _, _ in plane_values)
    dim = 1 + max(d for _, d, _ in plane_values)
    bucket = srp_bucket_udf(plane_values, n_planes, dim)
    inc = increment.select(
        "vec_id",
        bucket(as_double_vec("embedding")).alias("bucket"),
        as_double_vec("embedding").alias("v"),
    )
    w = Window.partitionBy("bucket")
    idx = (
        index_buckets.withColumn("bucket_n", F.count("*").over(w))
        .where(F.col("bucket_n") <= max_bucket_size)
        .select(
            "bucket",
            F.col("vec_id").alias("match_id"),
            as_double_vec("embedding").alias("iv"),
        )
    )
    cos = cosine_pandas()
    return (
        inc.join(idx, "bucket")
        .select(
            "vec_id",
            "match_id",
            F.round(cos(F.col("v"), F.col("iv")), 9).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def pca_fit(embeddings: DataFrame, out_dim: int = 16):
    """Fit the corpus's top-``out_dim`` principal axes — the
    variance-OPTIMAL linear reduction next to the variance-agnostic
    :func:`random_projection` (JL planes preserve distances in
    expectation; PCA concentrates them, the right call before
    clustering or IVF training when the corpus has structure).

    Returns ``(components, mean)``: a (out_dim x dim) float64 row-matrix
    (descending eigenvalue order) and the corpus mean.

    Scale shape (the trainer discipline): ONE Arrow pass emits per-batch
    flattened partial sums (n, sum_x, sum of outer products — dim^2+dim+1
    doubles per BATCH, not per row), one hash aggregate reduces them,
    and the driver sees a single (dim x dim) covariance — eigendecomposed
    locally (dim = 64 here; even 4096-dim is a driver triviality).
    Determinism: the aggregated moments round at 9 before the
    eigendecomposition, so float sum-order across partitions cannot
    reach the model; component signs are fixed (largest-|component|
    entry positive) because eigenvectors are sign-ambiguous.
    Repartition-invariance is test-pinned."""
    import numpy as np
    import pandas as pd

    if out_dim < 1:
        raise ValueError(f"pca_fit: out_dim must be >= 1, got {out_dim}")

    def partials(batches):
        for pdf in batches:
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            n, d = x.shape
            packed = np.concatenate(
                [[float(n)], x.sum(axis=0), (x.T @ x).ravel()]
            )
            yield pd.DataFrame(
                {"idx": np.arange(len(packed), dtype=np.int64), "p": packed}
            )

    base = spread(embeddings, "vec_id").select(
        as_double_vec("embedding").alias("v")
    )
    rows = (
        base.mapInPandas(partials, "idx long, p double")
        .groupBy("idx")
        .agg(F.sum("p").alias("p"))
        .collect()
    )
    if not rows:
        # zero embedding rows -> no partial frames at all; fail with the
        # same message as the n<2 path, not an opaque empty-max() error
        raise ValueError("pca_fit: need at least 2 vectors, got 0")
    packed = np.zeros(max(r.idx for r in rows) + 1)
    for r in rows:
        packed[r.idx] = r.p
    n = packed[0]
    if n < 2:
        raise ValueError(f"pca_fit: need at least 2 vectors, got {int(n)}")
    dim = int(round((-1 + np.sqrt(1 + 4 * (len(packed) - 1))) / 2))
    sum_x = np.round(packed[1 : 1 + dim], 9)
    outer = np.round(packed[1 + dim :].reshape(dim, dim), 9)
    if out_dim > dim:
        raise ValueError(f"pca_fit: out_dim {out_dim} > embedding dim {dim}")
    mu = sum_x / n
    cov = outer / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:out_dim]
    comps = vecs[:, order].T  # (out_dim, dim)
    # sign convention: the largest-|.| entry of each component positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return np.ascontiguousarray(comps), mu


def pca_transform(embeddings: DataFrame, components, mean) -> DataFrame:
    """(vec_id, projection): each vector centred and projected onto the
    fitted axes — one narrow Arrow matmul per batch against the
    broadcast model, no shuffle, so the SAME plan projects a STREAMING
    increment at ingestion time (like pq_encode / kmeans_assign)."""
    import numpy as np

    from ccm_spark.functions.vector_udfs import pca_project_udf

    bc = embeddings.sparkSession.sparkContext.broadcast(
        (
            np.ascontiguousarray(np.asarray(components, dtype=np.float64)),
            np.asarray(mean, dtype=np.float64),
        )
    )
    project = pca_project_udf(bc)
    out = embeddings
    if not embeddings.isStreaming:
        out = spread(embeddings, "vec_id")
    return out.select(
        "vec_id", project(as_double_vec("embedding")).alias("projection")
    )


def quantize_embeddings(embeddings: DataFrame, bits: int = 8) -> DataFrame:
    """Symmetric per-vector integer quantization of the embedding column
    — the STORAGE lever for a 100 TB embedding store (int8 is 4x
    smaller than float32, 8x than float64; the standard serving trick
    next to PQ's 64x): ``(vec_id, scale, codes)`` with
    ``scale = max(|v|) / (2^(bits-1) - 1)`` and
    ``codes[i] = round(v[i] / scale)`` (zero vectors get scale 0 and
    all-zero codes). Dequantize with :func:`dequantize_embeddings`;
    reconstruction error per coordinate is bounded by ``scale / 2``.

    Pure expressions (transform / array_max / round) — narrow,
    streaming-safe, no UDF; rounding at 0 decimals is engine-agreeing
    on every representable double (no multiply-first hazard), so the
    DuckDB twin ``sql_quantize_embeddings`` replays the relation
    exactly."""
    if bits < 2 or bits > 16:
        raise ValueError(f"quantize_embeddings: bits must be in [2, 16], got {bits}")
    qmax = float(2 ** (bits - 1) - 1)
    v = as_double_vec("embedding")
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(qmax)
    return embeddings.select(
        "vec_id",
        (F.round(scale, 9) + F.lit(0.0)).alias("scale"),
        F.when(
            scale == 0.0,
            F.transform(v, lambda x: F.lit(0)),
        )
        .otherwise(F.transform(v, lambda x: F.round(x / scale, 0).cast("int")))
        .alias("codes"),
    )


def dequantize_embeddings(quantized: DataFrame) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``(vec_id, embedding)``
    with ``embedding[i] = codes[i] * scale`` (double). Cosine geometry
    is scale-invariant per vector, so top-k neighbours under the
    dequantized vectors match the exact ones up to the ~1/2^(bits-1)
    per-coordinate rounding — the recall pin in tests/test_pq.py
    measures the realised floor at int8."""
    return quantized.select(
        "vec_id",
        F.transform(
            "codes", lambda q: q.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def truncate_embeddings(embeddings: DataFrame, dim: int) -> DataFrame:
    """Matryoshka-style serving lever: keep the first ``dim`` embedding
    coordinates and L2-renormalise — the "shrink the index, re-rank the
    shortlist with full vectors" trade MRL-trained models are built for
    (Kusupati et al. 2022, arXiv:2205.13147). On non-MRL embeddings the
    prefix is just a lossy projection; the recall cost is measurable
    either way, and tests pin it against exact full-dim retrieval the
    same way the int8 path is pinned (tests/test_pq.py).

    Pure codegen: slice + one aggregate for the norm, no UDF, map-only
    (the renormalisation keeps downstream dot products equal to true
    cosine over the prefix). Zero-norm prefixes keep their zeros (the
    Σw==0 guard convention) rather than dividing by zero.
    """
    if dim < 1:
        raise ValueError(f"truncate_embeddings: dim must be >= 1, got {dim}")
    # probe one row (the _pair_scorer precedent): F.slice silently caps
    # at the array length, so an oversized dim would return full-width
    # vectors while the caller sizes its serving index to dim
    probe = embeddings.select(F.size("embedding").alias("d")).first()
    if probe is not None and dim > int(probe["d"]):
        raise ValueError(
            f"truncate_embeddings: dim {dim} exceeds stored width {int(probe['d'])}"
        )
    pre = F.slice(F.col("embedding"), 1, dim)
    # norm lands in its own projection so the per-element lambda below
    # references a column, not an embedded aggregate (which would be
    # re-evaluated per element — O(dim^2) per row)
    staged = embeddings.select(
        "vec_id",
        pre.alias("_pre"),
        F.sqrt(
            F.aggregate(
                pre,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("_norm"),
    )
    return staged.select(
        "vec_id",
        F.when(
            F.col("_norm") > 0,
            F.transform(
                "_pre", lambda x: (x.cast("double") / F.col("_norm")).cast("float")
            ),
        )
        .otherwise(F.col("_pre"))
        .alias("embedding"),
    )
