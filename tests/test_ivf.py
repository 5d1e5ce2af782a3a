"""IVF-probed ANN: structural guarantees + recall against brute force."""

from __future__ import annotations

from ccm_spark.pipeline.similarity import cosine_topk, ivf_topk
from ccm_spark.sources.tables import load_table


def test_ivf_topk_structure_and_recall(spark, sf_small):
    embs = load_table(spark, sf_small, "embeddings")
    exact = cosine_topk(embs, n_queries=30, k=5).collect()
    approx = ivf_topk(embs, n_queries=30, k=5, stride=50, nprobe=3).collect()

    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(x.rank for x in rows)
        assert ranks == list(range(1, len(ranks) + 1))
        sims = [x.cos_sim for x in sorted(rows, key=lambda x: x.rank)]
        assert sims == sorted(sims, reverse=True)

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.target_id)
    approx_sets = {q: {x.target_id for x in rows} for q, rows in by_q.items()}
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    # nprobe=3 over ~10 cells on near-random vectors: expect partial recall;
    # the point is it is far above the ~30% a random 3-of-10-cells scan gives
    assert recall > 0.2, f"recall@5 = {recall:.2f}"
    # and every reported neighbor is a genuinely computed cosine (sanity)
    assert all(-1.0 <= x.cos_sim <= 1.0 for x in approx)


def test_embedding_near_dup_hot_bucket_cap(spark):
    """Pathological near-constant corpus: every vector identical -> one SRP
    bucket holds all N rows. With the cap below N the bucket is dropped
    (candidates bounded at N * cap, here 0); with the cap at N the full
    N*(N-1)/2 pair set comes back."""
    from ccm_spark.pipeline.similarity import embedding_near_duplicates

    n = 40
    rows = [(i, [1.0] * 64) for i in range(n)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = embedding_near_duplicates(
        embs, threshold=0.5, planes=8, max_bucket_size=n - 1
    )
    assert capped.count() == 0
    full = embedding_near_duplicates(
        embs, threshold=0.5, planes=8, max_bucket_size=n
    )
    assert full.count() == n * (n - 1) // 2


def test_adaptive_srp_planes_scaling():
    """Planes grow ~log2(N/target): fixed 8 planes would leave N^2/256
    candidate growth; adaptive sizing pins expected bucket size instead."""
    from ccm_spark.pipeline.similarity import adaptive_srp_planes

    assert adaptive_srp_planes(0) == 8
    assert adaptive_srp_planes(2_000) == 8       # small corpora keep floor
    assert adaptive_srp_planes(100_000) == 13    # ceil(log2(100000/16))
    assert adaptive_srp_planes(10_000_000) == 20
    assert adaptive_srp_planes(10**20) == 62     # hard cap: 64-bit bucket id


def test_ivf_assignments_accepts_long_form_centroids(spark, sf_small):
    """ivf_assignments must consume ivf_kmeans_centroids' long-form
    (centroid_id, dim_idx, comp) output directly — pivoted internally —
    and agree with the equivalent wide-form (centroid_id, cv) input."""
    import pyspark.sql.functions as F
    from ccm_spark.pipeline.similarity import ivf_assignments, ivf_kmeans_centroids

    embs = load_table(spark, sf_small, "embeddings").limit(300)
    long_form = ivf_kmeans_centroids(embs, stride=50, n_iters=1)
    wide_form = (
        long_form.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim_idx", "comp"))).alias("s"))
        .select("centroid_id", F.expr("transform(s, p -> p.comp)").alias("cv"))
    )
    got_long = sorted(map(tuple, ivf_assignments(embs, centroids=long_form).collect()))
    got_wide = sorted(map(tuple, ivf_assignments(embs, centroids=wide_form).collect()))
    assert got_long == got_wide
    assert len(got_long) == 300


def test_probe_embedding_index_batch_and_stream(spark, sf_small, tmp_path):
    """Ingestion-time embedding near-dup: an increment that contains an
    exact copy of an indexed vector must flag it at cos ~= 1; a fresh
    orthogonal-ish vector must not match; the narrow-probe buckets agree
    with the explode-plan buckets; and the SAME plan runs on a streaming
    increment (append mode) with identical rows."""
    import pyspark.sql.functions as F

    from ccm_spark.functions.vector_udfs import srp_bucket_udf
    from ccm_spark.pipeline.similarity import (
        embedding_index,
        probe_embedding_index,
        srp_buckets,
    )

    embs = load_table(spark, sf_small, "embeddings").limit(400)
    idx = embedding_index(embs, planes=8, seed=99)
    buckets = idx["buckets"]

    # narrow-UDF buckets == explode-plan buckets on the whole corpus
    narrow = srp_bucket_udf(idx["plane_values"], idx["planes"], 64)
    got = {
        r.vec_id: r.bucket
        for r in embs.select(
            "vec_id",
            narrow(F.transform("embedding", lambda x: x.cast("double"))).alias(
                "bucket"
            ),
        ).collect()
    }
    want = {r.vec_id: r.bucket for r in srp_buckets(embs, 8, 99).collect()}
    assert got == want

    # increment: vec 100000 copies indexed vec 7; vec 100001 is novel
    copy_row = embs.where(F.col("vec_id") == 7).select(
        F.lit(100000).cast("long").alias("vec_id"), "embedding"
    )
    novel = embs.where(F.col("vec_id") == 7).select(
        F.lit(100001).cast("long").alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i % 2 == 0, x).otherwise(-x)
        ).alias("embedding"),
    )
    inc = copy_row.unionByName(novel)
    out = probe_embedding_index(inc, buckets, idx["plane_values"], threshold=0.95)
    batch = sorted((r.vec_id, r.match_id, r.cos_sim) for r in out.collect())
    assert (100000, 7, 1.0) in batch
    assert all(v != 100001 for v, _, _ in batch)

    # stream == batch
    src = tmp_path / "emb_inc"
    src.mkdir()
    inc.coalesce(1).write.parquet(str(src / "p0"))
    stream = spark.readStream.schema(inc.schema).parquet(str(src / "p0"))
    s_out = probe_embedding_index(
        stream, buckets, idx["plane_values"], threshold=0.95
    )
    assert s_out.isStreaming
    q = (
        s_out.writeStream.format("memory")
        .queryName("emb_probe_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_emb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_s = sorted(
        (r.vec_id, r.match_id, r.cos_sim)
        for r in spark.sql("select * from emb_probe_stream").collect()
    )
    assert got_s == batch


def test_pca_recovers_planted_axes_and_is_partitioning_invariant(spark):
    """PCA on anisotropic synthetic data: components align with the
    planted high-variance axes in order; projection matches the numpy
    replay; the fit is bit-identical under repartitioning; guards
    raise."""
    import numpy as np
    import pytest

    from ccm_spark.pipeline.similarity import pca_fit, pca_transform

    rng = np.random.default_rng(13)
    n, dim = 300, 64
    x = rng.normal(0, 0.05, (n, dim))
    x[:, 5] += rng.normal(0, 3.0, n)   # dominant axis
    x[:, 20] += rng.normal(0, 1.5, n)  # second axis
    x += rng.normal(0.7, 0.01, dim)    # nonzero mean
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    comps, mu = pca_fit(df, out_dim=4)
    assert comps.shape == (4, dim)
    # top components point (almost) exactly along the planted axes
    assert abs(comps[0][5]) > 0.99
    assert abs(comps[1][20]) > 0.99
    # sign convention: dominant entry positive
    assert comps[0][5] > 0 and comps[1][20] > 0

    got = {r.vec_id: np.array(r.projection) for r in pca_transform(df, comps, mu).collect()}
    want = (x - mu) @ comps.T
    for i in range(n):
        np.testing.assert_allclose(got[i], want[i], rtol=0, atol=1e-9)

    comps2, mu2 = pca_fit(df.repartition(11), out_dim=4)
    assert (comps2 == comps).all() and (mu2 == mu).all()

    with pytest.raises(ValueError, match="out_dim"):
        pca_fit(df, out_dim=100)
    with pytest.raises(ValueError, match="out_dim"):
        pca_fit(df, out_dim=0)
