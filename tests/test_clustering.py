"""Distributed Lloyd k-means: recovers planted structure, deterministic
under repartitioning, guards degenerate inputs, streams the assignment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _blob_corpus(spark, n_per=40, dim=64, seed=11):
    """Three well-separated blobs in 64-dim (unit-ish directions)."""
    rng = np.random.default_rng(seed)
    centers = np.zeros((3, dim))
    centers[0, 0] = 1.0
    centers[1, 1] = 1.0
    centers[2, 2] = 1.0
    rows = []
    truth = {}
    vid = 0
    for b in range(3):
        for _ in range(n_per):
            v = centers[b] + rng.normal(0, 0.05, dim)
            rows.append((vid, [float(x) for x in v]))
            truth[vid] = b
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, truth


def test_kmeans_recovers_blobs_and_is_partitioning_invariant(spark):
    from ccm_spark.pipeline.clustering import cluster_sizes, kmeans_assign, kmeans_fit

    df, truth = _blob_corpus(spark)
    cents = kmeans_fit(df, k=3, n_iters=5)
    assert cents.shape == (3, 64)
    got = {r.vec_id: r.cluster for r in kmeans_assign(df, cents).collect()}
    # every blob lands in ONE cluster, and different blobs in different ones
    blob_to_cluster = {}
    for vid, b in truth.items():
        blob_to_cluster.setdefault(b, set()).add(got[vid])
    assert all(len(cs) == 1 for cs in blob_to_cluster.values())
    assert len({next(iter(cs)) for cs in blob_to_cluster.values()}) == 3
    sizes = {r.cluster: r.n_members for r in cluster_sizes(kmeans_assign(df, cents)).collect()}
    assert sorted(sizes.values()) == [40, 40, 40]
    # bit-identical training on a repartitioned input
    cents2 = kmeans_fit(df.repartition(13), k=3, n_iters=5)
    assert (cents == cents2).all()


def test_kmeans_guards(spark):
    from ccm_spark.pipeline.clustering import kmeans_fit

    df, _ = _blob_corpus(spark, n_per=1)  # 3 vectors total
    with pytest.raises(ValueError, match="< k"):
        kmeans_fit(df, k=10)
    with pytest.raises(ValueError, match=">= 1"):
        kmeans_fit(df, k=0)


def test_kmeans_assign_stream_equals_batch(spark, tmp_path):
    from ccm_spark.pipeline.clustering import kmeans_assign, kmeans_fit

    df, _ = _blob_corpus(spark, n_per=20)
    cents = kmeans_fit(df, k=3, n_iters=3)
    batch = {r.vec_id: r.cluster for r in kmeans_assign(df, cents).collect()}
    src = tmp_path / "km_src"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "p0"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "p0"))
    out = kmeans_assign(stream, cents)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("km_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_km"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.vec_id: r.cluster for r in spark.sql("select * from km_stream").collect()
    }
    assert got == batch


def test_cluster_balanced_curation_composes_with_mixing(spark):
    """The advertised curation flow: cluster-tag the corpus, then draw an
    exact per-cluster sample with mixing.stratified_sample (group_col =
    cluster) — balanced topic representation from two existing ops."""
    from ccm_spark.pipeline.clustering import kmeans_assign, kmeans_fit
    from ccm_spark.pipeline.mixing import stratified_sample

    df, _ = _blob_corpus(spark, n_per=30)
    cents = kmeans_fit(df, k=3, n_iters=3)
    tagged = df.join(kmeans_assign(df, cents), "vec_id").withColumnRenamed(
        "vec_id", "doc_id"
    )
    picked = stratified_sample(tagged, 10, group_col="cluster")
    from collections import Counter

    counts = Counter(r.cluster for r in picked.collect())
    assert sorted(counts.values()) == [10, 10, 10]
    # deterministic: same members on a repartitioned input
    again = stratified_sample(tagged.repartition(7), 10, group_col="cluster")
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in picked.collect()
    )


def test_semantic_dedup_greedy_cover(spark):
    """Cluster-blocked SemDeDup: exact duplicates collapse to the
    lowest-vec_id representative, near-but-below-threshold vectors all
    survive, and the verdict is deterministic across partitionings."""
    import numpy as np

    from ccm_spark.pipeline.clustering import semantic_dedup

    a = np.zeros(64); a[0] = 1.0
    b = np.zeros(64); b[1] = 1.0
    ab = np.zeros(64); ab[0] = ab[1] = 1.0  # 45 deg from both
    vecs = [a, a * 2.0, b, a, ab, b * 0.5]  # ids 0..5; 1,3 dup 0; 5 dups 2
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, k=2, threshold=0.95, n_iters=2)
    got = {r.vec_id: r.keep for r in out.collect()}
    assert got == {0: True, 1: False, 2: True, 3: False, 4: True, 5: False}

    # partitioning-independent
    out2 = semantic_dedup(df.repartition(7), k=2, threshold=0.95, n_iters=2)
    assert {r.vec_id: r.keep for r in out2.collect()} == got

    # threshold edge: cosine(a, ab) = 1/sqrt(2) ~ 0.7071 -> dropped at 0.7
    out3 = semantic_dedup(df, k=1, threshold=0.7, n_iters=1)
    got3 = {r.vec_id: r.keep for r in out3.collect()}
    assert got3[4] is False  # ab ducks under the kept a at 0.7
    assert got3[2] is True   # b is orthogonal to a: kept

    import pytest

    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(df, threshold=0.0)


def test_semantic_dedup_oversized_cluster_keeps_all(spark):
    """The hot-cluster safety valve: a cluster past max_cluster_size
    skips within-cluster dedup (everything keeps — under-dedup, never a
    quadratic task), like the LSH families' bucket caps."""
    import numpy as np

    from ccm_spark.pipeline.clustering import semantic_dedup

    a = np.zeros(64); a[0] = 1.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in a]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    capped = semantic_dedup(df, k=1, threshold=0.95, n_iters=1, max_cluster_size=3)
    assert all(r.keep for r in capped.collect())
    uncapped = semantic_dedup(df, k=1, threshold=0.95, n_iters=1)
    assert sum(1 for r in uncapped.collect() if r.keep) == 1


def test_semantic_dedup_boundary_pair_caught_with_n_probe_2(spark):
    """The r8 boundary-recall knob: a near-dup pair straddling a
    cluster boundary (primary cells differ; cosine ~0.9991 >= 0.95) is
    INVISIBLE at n_probe=1 (the documented SemDeDup approximation) and
    caught at n_probe=2 — each member blocks into both nearest cells,
    so they meet. Core members stay untouched, output is one row per
    vector with the primary cell, the plan stays cluster-blocked (no
    cartesian), and the verdict is partitioning-independent."""
    import io
    from contextlib import redirect_stdout

    import numpy as np
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.clustering import semantic_dedup

    cents = np.zeros((2, 4)); cents[0, 0] = 1.0; cents[1, 1] = 1.0
    rows = [
        (0, [1.0, 0.05, 0.0, 0.0]),   # core of cluster 0
        (1, [0.05, 1.0, 0.0, 0.0]),   # core of cluster 1
        (2, [0.72, 0.69, 0.0, 0.0]),  # boundary, primary cell 0
        (3, [0.69, 0.72, 0.0, 0.0]),  # boundary, primary cell 1, ~dup of 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    base = semantic_dedup(df, threshold=0.95, centroids=cents)
    assert {r.vec_id: (r.cluster, r.keep) for r in base.collect()} == {
        0: (0, True), 1: (1, True), 2: (0, True), 3: (1, True)  # pair missed
    }
    knob = semantic_dedup(df, threshold=0.95, centroids=cents, n_probe=2)
    got = {r.vec_id: (r.cluster, r.keep) for r in knob.collect()}
    assert got == {
        0: (0, True), 1: (1, True), 2: (0, True), 3: (1, False)  # pair caught
    }
    # partitioning-independent
    again = semantic_dedup(
        df.repartition(5), threshold=0.95, centroids=cents, n_probe=2
    )
    assert {r.vec_id: (r.cluster, r.keep) for r in again.collect()} == got
    # still cluster-blocked: no cartesian/nested-loop join anywhere
    buf = io.StringIO()
    with redirect_stdout(buf):
        semantic_dedup(
            df, threshold=0.95, centroids=cents, n_probe=2
        ).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    import pytest

    with pytest.raises(ValueError, match="n_probe"):
        semantic_dedup(df, centroids=cents, n_probe=0)


def test_semantic_dedup_matches_duckdb_twin(spark, sf_small):
    """The ENTIRE SemDeDup chain replayed in DuckDB — Lloyd trainer +
    assignment (the gated kmeans twin nested verbatim) and the
    within-cluster greedy epsilon-cover as a recursive CTE carrying
    the kept-vector list as row state. Gate threshold 0.2: the
    isotropic corpus has no 0.95-near-dups, so the low threshold makes
    the greedy do real work (127/500 kept) — the r11 gate candidate's
    evidence (QUERIES.md)."""
    import duckdb

    from ccm_spark.pipeline.clustering import semantic_dedup
    from ccm_spark.plans.oracle_sql_ext import (
        SEMDEDUP_GATE_THRESHOLD,
        sql_semantic_dedup,
    )

    embs = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    out = semantic_dedup(
        embs, k=8, threshold=SEMDEDUP_GATE_THRESHOLD, n_iters=2
    )
    got = sorted((r.vec_id, r.cluster, r.keep) for r in out.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    want = sorted(
        (int(v), int(c), bool(kp))
        for v, c, kp in con.sql(sql_semantic_dedup()).fetchall()
    )
    assert len(got) == len(want) == 500
    mism = [(a, b) for a, b in zip(got, want) if a != b]
    assert not mism, mism[:5]
    # the low threshold made the greedy do real work on both sides
    n_kept = sum(1 for _, _, kp in got if kp)
    assert 0 < n_kept < 500
