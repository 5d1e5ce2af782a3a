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
    from ccm_spark.functions.hashing import np_round_half_up

    # half-up, not np.round: a tie-landing centroid component would
    # otherwise round differently from the DuckDB trainer replay
    cents = np_round_half_up(
        np.array([r.nv for r in init_rows], dtype=np.float64), KMEANS_ROUND
    )
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
            nxt[c] = np_round_half_up(vec / counts[c], KMEANS_ROUND)
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


def kmeans_assign_topn(
    embeddings: DataFrame, centroids: np.ndarray, n: int
) -> DataFrame:
    """(vec_id, clusters): each vector's ``n`` nearest centroids,
    ascending by squared-L2, ties -> lowest id — the multi-probe
    assignment feeding ``semantic_dedup(n_probe=...)``. Same
    broadcast-matmul no-shuffle shape as :func:`kmeans_assign`."""
    from ccm_spark.functions.vector_udfs import kmeans_assign_topn_udf

    bc = embeddings.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64)
    )
    assign = kmeans_assign_topn_udf(bc, n)
    out = embeddings
    if not embeddings.isStreaming:
        out = spread(embeddings, "vec_id")
    return out.select(
        "vec_id", assign(_normalized_vec("embedding")).alias("clusters")
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 16,
    threshold: float = 0.95,
    n_iters: int = 5,
    centroids: np.ndarray | None = None,
    max_cluster_size: int = 100_000,
    n_probe: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus embeddings with the
    distributed Lloyd trainer, then inside each cluster greedily keep
    one representative per cosine-``threshold`` ball — the
    cluster-BLOCKED variant that makes embedding dedup tractable at
    corpus scale (pairwise work is bounded per cluster, never global;
    ``k`` is the blocking knob exactly like SRP planes are for
    ``similarity.embedding_near_duplicates``).

    Returns ``(vec_id, cluster, keep)`` for every input vector — filter
    ``keep`` to materialise the deduplicated corpus, or join back on
    vec_id for audit.

    Determinism (the engine-wide contract): candidates scan in vec_id
    order inside each cluster and a vector is dropped iff its cosine to
    some ALREADY-KEPT earlier vector rounds (at 9 decimals) to >=
    threshold — a pure function of the corpus, independent of
    partitioning. (The paper orders by distance-to-centroid; any greedy
    order yields a valid epsilon-cover, and vec_id order is the one
    that is stable across engines and runs.) Cross-cluster near-dups
    are NOT examined at the default ``n_probe=1`` — the documented
    SemDeDup approximation; raise k to tighten blocks, or run
    ``embedding_near_duplicates`` for LSH-blocked pair evidence
    instead.

    ``n_probe=2`` is the boundary-recall knob (r8 advice): every
    vector is blocked into its TWO nearest cells, so a near-dup pair
    straddling a cluster boundary shares at least the cell nearest
    their common neighborhood and gets examined. The plan stays
    cluster-blocked (each vector appears in exactly ``n_probe``
    blocks — 2x pairwise work, never global); a vector's final
    ``keep`` is the AND of its blocks' greedy verdicts and its
    reported ``cluster`` is still the primary (nearest) cell.
    Approximation note, stated rather than hidden: with overlapping
    blocks the greedy witness for a drop is kept PER BLOCK, so a
    dropped vector's witness may itself be dropped by its other
    block — still an epsilon-cover per block, slightly over-dropping
    across them, while boundary-pair recall strictly improves
    (test-pinned).

    100 TB shape: one kmeans_fit (n_iters corpus passes), one narrow
    assignment, one shuffle on cluster, then per-cluster greedy whose
    memory is one cluster's vectors — skewed clusters bound the task,
    so size k to keep expected cluster size in executor memory. A
    cluster larger than ``max_cluster_size`` (a near-constant corpus
    collapsing into one cell — the same pathology as an LSH hot
    bucket) skips the within-cluster pass entirely: its members all
    keep (UNDER-dedup, never a task OOM — the `max_bucket_size` safety
    valve the SimHash/MinHash/embedding families share); raise k, or
    run exact dedup first so verbatim mass-duplicates never reach this
    stage. At ``n_probe>1`` the valve counts BLOCK size — primary plus
    boundary-visitor memberships — because the greedy pass's cost and
    memory are proportional to the block that scans, not to true
    membership; a cluster whose primaries fit the cap can therefore
    tip into keep-all when enough boundary visitors land in it
    (locally weaker dedup than n_probe=1, stated rather than hidden —
    the cap is a COST valve, so it bounds what actually runs)."""
    import pandas as pd
    from pyspark.sql import Window

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"semantic_dedup: threshold must be in (0, 1], got {threshold}")
    if max_cluster_size < 1:
        raise ValueError(
            f"semantic_dedup: max_cluster_size must be >= 1, got {max_cluster_size}"
        )
    if n_probe < 1:
        raise ValueError(f"semantic_dedup: n_probe must be >= 1, got {n_probe}")
    cents = centroids if centroids is not None else kmeans_fit(embeddings, k, n_iters)
    if n_probe > 1:
        # materialise the top-n assignment ONCE: primary-cell extraction
        # and the block votes otherwise each re-run the full-corpus
        # broadcast-matmul assignment pass (two scans of the embeddings
        # at the 100 TB design point)
        topn = kmeans_assign_topn(embeddings, cents, n_probe).localCheckpoint(
            eager=True
        )
        membership = topn.select(
            "vec_id",
            F.posexplode("clusters").alias("_slot", "cluster"),
        )
        primary = membership.where(F.col("_slot") == 0).select(
            "vec_id", F.col("cluster").alias("_primary")
        )
        assigned = membership.drop("_slot")
    else:
        assigned = kmeans_assign(embeddings, cents)
        primary = None
    nv = embeddings.select("vec_id", _normalized_vec("embedding").alias("nv"))
    # the cap filters BEFORE the grouped kernel (window count on the
    # exchange the groupBy below reuses — the LSH families' pattern):
    # an oversized cluster must never be materialised as one pandas
    # frame in a single worker, or the valve guards nothing
    rel = assigned.join(nv, "vec_id").withColumn(
        "_n", F.count("*").over(Window.partitionBy("cluster"))
    )
    big = rel.where(F.col("_n") > max_cluster_size).select(
        "vec_id", "cluster", F.lit(True).alias("keep")
    )
    small = rel.where(F.col("_n") <= max_cluster_size).drop("_n")

    def dedup_cluster(pdf):
        pdf = pdf.sort_values("vec_id")
        mat = np.stack(pdf["nv"].to_numpy()).astype(np.float64)
        n = mat.shape[0]
        keep = np.zeros(n, dtype=bool)
        kept_idx: list[int] = []
        for i in range(n):
            if kept_idx:
                sims = np.round(mat[kept_idx] @ mat[i], 9)
                if bool((sims >= threshold).any()):
                    continue
            keep[i] = True
            kept_idx.append(i)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy(),
                "cluster": pdf["cluster"].to_numpy(),
                "keep": keep,
            }
        )

    deduped = (
        spread(small, "cluster")
        .groupBy("cluster")
        .applyInPandas(dedup_cluster, "vec_id long, cluster long, keep boolean")
    )
    votes = deduped.unionByName(big)
    if n_probe == 1:
        return votes
    # multi-probe: AND the per-block verdicts (min over booleans) and
    # report the primary cell — one row per input vector, same schema
    final = votes.groupBy("vec_id").agg(F.min("keep").alias("keep"))
    return primary.join(final, "vec_id").select(
        "vec_id", F.col("_primary").alias("cluster"), "keep"
    )
