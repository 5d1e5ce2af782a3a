"""Distributed embedding clustering — the corpus-curation complement to
the ANN family: assign every document's embedding to a cluster (topic
proxy), then balance/sample/cap per cluster with the existing mixing
operators (``mixing.stratified_sample`` takes any category column).

Two trainers exist in the engine, for two regimes:
  - ``similarity.ivf_kmeans_centroids`` — driver-trained on a bounded
    strided sample; the right tool when centroids feed an ANN probe.
  - :func:`kmeans_fit` (here) — fully DISTRIBUTED Lloyd: every
    iteration reads the whole corpus (assignment = one narrow Arrow
    matmul against broadcast centroids; update = one hash aggregate over
    (cluster, dim) partial sums), so training scales to corpora whose
    strided sample would miss rare modes. Iterations cost one corpus
    pass each; the driver only ever holds k x dim doubles.

Determinism discipline (the engine-wide contract): init = the first k
vectors by vec_id (no RNG), every centroid update rounded at 6 decimals
(matching the IVF/PQ trainers), assignment ties -> lowest cluster id.
Same data + same params => bit-identical centroids and assignments on
any cluster size or partitioning.

Vectors are L2-normalised before everything (assignment and update), so
squared-L2 ranking equals cosine ranking — the same geometry every other
embedding operator here uses; zero vectors normalise to themselves and
land wherever argmin puts them (deterministically).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.functions.partitioning import spread
from ccm_spark.pipeline.similarity import as_double_vec

KMEANS_ROUND = 6


def _normalized_vec(col) -> F.Column:
    v = as_double_vec(col)
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, b: a + b)
    )
    return F.when(norm == 0.0, v).otherwise(F.transform(v, lambda x: x / norm))


def kmeans_fit(
    embeddings: DataFrame, k: int = 16, n_iters: int = 5
) -> np.ndarray:
    """Train k centroids over the full corpus; returns the (k x dim)
    float64 centroid matrix (persist via
    ``sources.sinks.write_ivf_index`` in wide/long form if it feeds an
    incremental pipeline). Empty clusters keep their previous centroid
    (no resampling, no RNG — the PQ trainer's rule). Raises on a corpus
    with fewer than k vectors: silently training fewer clusters than
    asked hides a caller mistake."""
    if k < 1 or n_iters < 1:
        raise ValueError(f"kmeans_fit: k and n_iters must be >= 1 (got {k}, {n_iters})")
    init_rows = (
        embeddings.select("vec_id", _normalized_vec("embedding").alias("nv"))
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans_fit: corpus has {len(init_rows)} vectors < k={k}"
        )
    cents = np.round(np.array([r.nv for r in init_rows], dtype=np.float64), KMEANS_ROUND)
    dim = cents.shape[1]
    from pyspark.storagelevel import StorageLevel

    # every iteration reads the same normalised relation; persist so the
    # scan + normalisation run once, not once per iteration
    base = (
        spread(embeddings, "vec_id")
        .select(_normalized_vec("embedding").alias("nv"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sc = embeddings.sparkSession.sparkContext
    for _ in range(n_iters):
        from ccm_spark.functions.vector_udfs import kmeans_assign_udf

        bc = sc.broadcast(cents)
        assign = kmeans_assign_udf(bc)
        # one pass: cluster id + per-dimension partial sums, map-side
        # combined; the driver receives k x dim rows, never vectors
        sums = (
            base.select(
                assign(F.col("nv")).alias("cluster"),
                F.posexplode("nv").alias("dim_idx", "comp"),
            )
            .groupBy("cluster", "dim_idx")
            .agg(F.sum("comp").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        nxt = cents.copy()
        by_cluster: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in sums:
            by_cluster.setdefault(r.cluster, np.zeros(dim))[r.dim_idx] = r.s
            counts[r.cluster] = r.n
        for c, vec in by_cluster.items():
            nxt[c] = np.round(vec / counts[c], KMEANS_ROUND)
        bc.destroy()
        cents = nxt
    base.unpersist()
    return cents


def kmeans_assign(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cluster): nearest-centroid assignment of every vector —
    one narrow Arrow pass (broadcast centroid matrix, batch matmul, no
    shuffle), so the SAME plan runs on a STREAMING increment in append
    mode: new embeddings are cluster-tagged at ingestion time against
    frozen centroids, exactly like the PQ encode path."""
    from ccm_spark.functions.vector_udfs import kmeans_assign_udf

    bc = embeddings.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64)
    )
    assign = kmeans_assign_udf(bc)
    out = embeddings
    if not embeddings.isStreaming:
        out = spread(embeddings, "vec_id")
    return out.select(
        "vec_id", assign(_normalized_vec("embedding")).alias("cluster")
    )


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    """(cluster, n_members) — the balance report a curation pass reads
    before capping/upsampling clusters (feed the cluster column into
    ``mixing.stratified_sample`` / ``mixing.sample_mixture`` for the
    actual rebalance). One map-side-combined hash aggregate."""
    return assignments.groupBy("cluster").agg(F.count("*").alias("n_members"))
