"""NN-descent k-NN graph: recall vs the exact graph, round-over-round
improvement, determinism under repartitioning, coverage, and the
no-all-pairs plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from ccm_spark.pipeline.ann_graph import (
    capped_adjacency,
    knn_graph_descent,
    knn_graph_recall,
)
from ccm_spark.pipeline.similarity import cosine_topk


def _embs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


def test_descent_recall_improves_and_clears_floor(spark, sf_small):
    """Recall vs the exact graph must improve with rounds and clear a
    measured floor. The synthetic corpus is ISOTROPIC random vectors —
    NN-descent's documented worst case (no manifold locality for the
    two-hop rule to exploit; real embedding corpora cluster and converge
    faster) — so the floor is deliberately the worst-case one: the seed
    graph alone sits under 0.1, five rounds reach ~0.8."""
    embs = _embs(spark, sf_small)
    n = embs.count()
    exact = cosine_topk(embs, n_queries=n, k=10).localCheckpoint(eager=True)

    def mean_recall(rounds: int) -> float:
        g = knn_graph_descent(embs, k=10, n_rounds=rounds)
        return knn_graph_recall(g, exact, k=10).agg(F.avg("recall")).first()[0]

    r0 = mean_recall(0)
    r2 = mean_recall(2)
    r5 = mean_recall(5)
    assert r0 < r2 < r5, (r0, r2, r5)
    assert r5 >= 0.7, r5


def test_descent_graph_shape_and_coverage(spark, sf_small):
    """Every covered node carries contiguously-ranked edges 1..m with
    m <= k (a node whose whole candidate pool across seeding + rounds
    is smaller than k honestly carries fewer — no manufactured edges),
    at least 99% of covered nodes carry the full k, scores are
    non-increasing, there are no self-loops, and multi-table seeding
    covers (nearly) the whole corpus — singleton-in-every-table is the
    only way to be missed."""
    embs = _embs(spark, sf_small)
    n = embs.count()
    g = knn_graph_descent(embs, k=5, n_rounds=2).localCheckpoint(eager=True)
    assert g.where(F.col("src") == F.col("dst")).count() == 0
    per = g.groupBy("src").agg(
        F.count("*").alias("m"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    )
    bad = per.where(
        (F.col("m") > 5) | (F.col("lo") != 1) | (F.col("hi") != F.col("m"))
    ).count()
    assert bad == 0
    n_cov = per.count()
    assert per.where(F.col("m") == 5).count() >= 0.99 * n_cov
    # scores non-increasing along rank within each src
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy("rank")
    dec = g.withColumn("_prev", F.lag("cos_sim").over(w)).where(
        F.col("_prev").isNotNull() & (F.col("cos_sim") > F.col("_prev"))
    )
    assert dec.count() == 0
    assert g.select("src").distinct().count() >= 0.99 * n


def test_descent_is_deterministic_under_repartitioning(spark, sf_small):
    """Seeded planes + rounded scores + total tie order: the graph is a
    pure function of (corpus, k, rounds, seed) on any partitioning."""
    embs = _embs(spark, sf_small)
    a = {
        (r.src, r.rank): (r.dst, r.cos_sim)
        for r in knn_graph_descent(embs, k=5, n_rounds=2).collect()
    }
    b = {
        (r.src, r.rank): (r.dst, r.cos_sim)
        for r in knn_graph_descent(embs.repartition(13), k=5, n_rounds=2).collect()
    }
    assert a == b


def test_rho_sampling_bounds_hub_candidate_volume(spark):
    """The r09 verdict's hub hazard, pinned on the worst case: a star
    graph whose hub sits in 2000 vectors' top-k. The capped adjacency
    bounds every node at k + ⌈ρk⌉ rows, so the round's pair join emits
    ≤ (k(1+ρ))² candidates per node — the old mid-vertex join emitted
    in-degree² ≈ 4M pairs at the hub; the capped one stays < 0.2% of
    that."""
    n, k = 2000, 10
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n + 1)], "src long, dst long"
    )
    adj = capped_adjacency(edges, k=k, rho=1.0)
    per = adj.groupBy("src").count()
    assert per.agg(F.max("count")).first()[0] <= 2 * k
    # the hub's 2000 reverse neighbors sampled down to exactly rho*k
    assert adj.where(F.col("src") == 0).count() == k
    cand = (
        adj.alias("l")
        .join(adj.alias("r"), F.col("l.src") == F.col("r.src"))
        .where(F.col("l.dst") != F.col("r.dst"))
        .count()
    )
    assert cand <= (n + 1) * (2 * k) ** 2
    assert cand < 8000  # vs ~4M from an uncapped in-degree² blowup


def test_rho_capped_recall_within_epsilon_of_uncapped(spark, sf_small):
    """ρ-sampling must not cost material recall: the default-ρ graph
    (1.5 — measured gap ~0.01) lands within 0.05 mean recall of an
    effectively-uncapped run (rev_cap ≥ corpus size) on the isotropic
    worst-case corpus."""
    embs = _embs(spark, sf_small)
    n = embs.count()
    exact = cosine_topk(embs, n_queries=n, k=10).localCheckpoint(eager=True)

    def mean_recall(**kw) -> float:
        g = knn_graph_descent(embs, k=10, n_rounds=3, **kw)
        return knn_graph_recall(g, exact, k=10).agg(F.avg("recall")).first()[0]

    capped = mean_recall()  # the DEFAULT rho — what users get
    uncapped = mean_recall(rho=float(n))  # rev_cap >= n: nothing sampled
    assert uncapped - capped <= 0.05, (capped, uncapped)


def test_seed_bucket_valve_drops_mega_block(spark, sf_small):
    """A duplicate-heavy corpus (200 identical vectors) collapses into
    one SRP bucket in EVERY seed table; with the valve engaged the
    block is dropped before the |bucket|² self-join (absent from the
    output — the near-dup families' valve contract) while the sane
    part of the corpus keeps its full graph; with the valve open the
    block floods back in."""
    import pyspark.sql.functions as SF

    embs = _embs(spark, sf_small).limit(100)
    dim = len(embs.select("embedding").first()[0])
    dup = spark.range(10_000, 10_200).select(
        F.col("id").alias("vec_id"),
        F.array([F.lit(1.0)] + [F.lit(0.0)] * (dim - 1)).alias("embedding"),
    )
    corpus = embs.select("vec_id", "embedding").unionByName(dup)
    g = knn_graph_descent(
        corpus, k=5, n_rounds=1, max_bucket_size=50
    ).localCheckpoint(eager=True)
    covered = {r.vec_id for r in g.select(SF.col("src").alias("vec_id")).collect()}
    assert not any(v >= 10_000 for v in covered)  # mega-block valved out
    # the sane part keeps (at least) the coverage it would have alone —
    # the valve removes the block, it does not degrade the rest
    g_alone = knn_graph_descent(embs, k=5, n_rounds=1, max_bucket_size=50)
    alone_covered = {r.src for r in g_alone.select("src").collect()}
    sane = {r.vec_id for r in embs.select("vec_id").collect()}
    assert len(covered & sane) >= 0.9 * len(alone_covered)
    g_open = knn_graph_descent(
        corpus, k=5, n_rounds=1, max_bucket_size=10_000
    )
    open_covered = {r.src for r in g_open.select("src").collect()}
    assert any(v >= 10_000 for v in open_covered)


def test_descent_plan_has_no_cartesian_product(spark, sf_small):
    """All joins are equi-joins (bucket ids / vec ids) — the plan must
    contain no CartesianProduct / BroadcastNestedLoopJoin anywhere, the
    structural no-all-pairs guarantee."""
    import io
    from contextlib import redirect_stdout

    g = knn_graph_descent(_embs(spark, sf_small), k=5, n_rounds=1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        g.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_graph_components_recover_planted_dup_groups(spark, sf_small):
    """The graph CONSUMER (r10): thresholded components over the ranked
    neighbor graph recover planted near-duplicate groups — two groups
    of jittered copies collapse to their min-vec_id label, background
    vectors stay singletons, and the representative set (vec_id ==
    component) shrinks the corpus by exactly the planted redundancy."""
    import numpy as np

    from ccm_spark.pipeline.ann_graph import knn_graph_components

    rng = np.random.default_rng(7)
    dim = 16
    base = rng.normal(size=(40, dim))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant two dup groups: jittered copies of vectors 0 and 1
    for g, src in ((0, 0), (1, 1)):
        for j in range(3):
            v = base[src] + rng.normal(scale=1e-3, size=dim)
            rows.append((100 + 10 * g + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = knn_graph_descent(df, k=5, n_rounds=2).localCheckpoint(eager=True)
    comp = {
        r.vec_id: r.component
        for r in knn_graph_components(g, threshold=0.999).collect()
    }
    graph_nodes = {r.src for r in g.select("src").distinct().collect()}
    assert set(comp) == graph_nodes  # every GRAPH node present
    # planted dup members have close neighbors, so they are always
    # covered; each group collapses to its min-vec_id label
    assert {0, 1, 100, 101, 102, 110, 111, 112} <= graph_nodes
    assert comp[100] == comp[101] == comp[102] == comp[0] == 0
    assert comp[110] == comp[111] == comp[112] == comp[1] == 1
    # covered background vectors stay singletons at this threshold
    others = {k: v for k, v in comp.items() if 2 <= k < 100}
    assert others == {k: k for k in others}
    reps = [k for k, v in comp.items() if k == v]
    assert len(reps) == len(comp) - 6  # exactly the planted redundancy


def test_knn_graph_matches_duckdb_twin(spark, sf_small):
    """The whole NN-descent graph replayed declaratively in DuckDB at
    the gate geometry (k=5, 1 round, 2 seed tables, fixed SRP planes)
    — seeding valve + per-table cap, canonicalised round-9 cosine,
    md5-rank rho-sampled reverse adjacency, owner-join two-hop,
    rescore. Exact equality incl. the cosine doubles — the r11 gate
    candidate's evidence (QUERIES.md)."""
    import duckdb

    from ccm_spark.pipeline.similarity import SRP_PLANES
    from ccm_spark.plans.oracle_sql_ext import (
        KNN_GRAPH_K,
        KNN_GRAPH_ROUNDS,
        KNN_GRAPH_SEED,
        KNN_GRAPH_TABLES,
        sql_knn_graph,
    )

    embs = _embs(spark, sf_small)
    g = knn_graph_descent(
        embs,
        k=KNN_GRAPH_K,
        n_rounds=KNN_GRAPH_ROUNDS,
        seed=KNN_GRAPH_SEED,
        planes=SRP_PLANES,
        n_seed_tables=KNN_GRAPH_TABLES,
    )
    got = sorted((r.src, r.dst, r.cos_sim, r.rank) for r in g.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    want = sorted(
        (int(s), int(d), float(c), int(rk))
        for s, d, c, rk in con.sql(sql_knn_graph()).fetchall()
    )
    assert len(got) == len(want) > 0
    mism = [(a, b) for a, b in zip(got, want) if a != b]
    assert not mism, mism[:5]


def test_graph_diversity_sample_independent_set(spark, sf_small):
    """The second graph CONSUMER (r10): the kept set is an independent
    set of the thresholded graph (no two kept vectors are
    above-threshold neighbors), each planted duplicate clique keeps
    EXACTLY one member, isolated vectors always survive, and the
    verdict is deterministic under repartitioning."""
    import numpy as np

    from ccm_spark.pipeline.ann_graph import graph_diversity_sample

    rng = np.random.default_rng(11)
    dim = 16
    base = rng.normal(size=(30, dim))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for g, src in ((0, 0), (1, 1)):
        for j in range(3):
            v = base[src] + rng.normal(scale=1e-3, size=dim)
            rows.append((100 + 10 * g + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = knn_graph_descent(df, k=5, n_rounds=2).localCheckpoint(eager=True)
    out = graph_diversity_sample(g, threshold=0.999)
    kept = {r.vec_id for r in out.collect() if r.keep}
    all_nodes = {r.vec_id for r in out.collect()}
    assert all_nodes == {r.src for r in g.select("src").distinct().collect()}
    # independence: no above-threshold edge joins two kept nodes
    strong = [
        (r.src, r.dst)
        for r in g.where(F.col("cos_sim") >= 0.999).collect()
    ]
    assert not any(a in kept and b in kept for a, b in strong)
    # each planted clique keeps exactly one member
    for members in ({0, 100, 101, 102}, {1, 110, 111, 112}):
        assert len(kept & members) == 1, (members, kept & members)
    # isolated background vectors (no strong edges) always survive
    touched = {x for ab in strong for x in ab}
    background = all_nodes - touched
    assert background <= kept
    # deterministic under repartitioning
    out2 = graph_diversity_sample(
        knn_graph_descent(df.repartition(7), k=5, n_rounds=2), threshold=0.999
    )
    assert {r.vec_id: r.keep for r in out2.collect()} == {
        r.vec_id: r.keep for r in out.collect()
    }


def test_graph_diversity_matches_duckdb_twin(spark, sf_small):
    """graph_diversity_sample over the gate-geometry graph replayed in
    DuckDB (sql_knn_graph nested verbatim + the one-round Luby rule
    with the md5 priority) — exact keep-for-keep equality at the gate
    threshold (0.2: real edges on the isotropic corpus, ~40% thinned).
    The r11 gate candidate's evidence (QUERIES.md)."""
    import duckdb

    from ccm_spark.pipeline.ann_graph import graph_diversity_sample
    from ccm_spark.pipeline.similarity import SRP_PLANES
    from ccm_spark.plans.oracle_sql_ext import (
        DIVERSITY_GATE_THRESHOLD,
        KNN_GRAPH_K,
        KNN_GRAPH_ROUNDS,
        KNN_GRAPH_SEED,
        KNN_GRAPH_TABLES,
        sql_graph_diversity,
    )

    g = knn_graph_descent(
        _embs(spark, sf_small),
        k=KNN_GRAPH_K,
        n_rounds=KNN_GRAPH_ROUNDS,
        seed=KNN_GRAPH_SEED,
        planes=SRP_PLANES,
        n_seed_tables=KNN_GRAPH_TABLES,
    )
    out = graph_diversity_sample(g, threshold=DIVERSITY_GATE_THRESHOLD)
    got = sorted((r.vec_id, r.keep) for r in out.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    want = sorted(
        (int(v), bool(k)) for v, k in con.sql(sql_graph_diversity()).fetchall()
    )
    assert len(got) == len(want) > 0
    assert got == want
    n_kept = sum(1 for _, k in got if k)
    assert 0 < n_kept < len(got)  # the rule did real work


def test_knn_graph_insert_incremental_contract(spark, sf_small):
    """Incremental insert (r10): 20% of the corpus arrives as an
    increment against a graph served over the other 80%. Pins the
    contract: (a) untouched existing rows pass through BYTE-IDENTICAL
    (the in-place-overwrite guarantee), and every changed existing row
    belongs to a src that gained an edge to a new node; (b) new nodes
    carry ≤ k contiguously-ranked edges and their recall vs the exact
    graph beats the seed-only (0-round) rebuild baseline — the served
    graph's quality substitutes for descent; (c) deterministic under
    repartitioning."""
    from ccm_spark.pipeline.ann_graph import knn_graph_insert

    embs = _embs(spark, sf_small)
    old = embs.where(F.col("vec_id") % 5 != 0)
    new = embs.where(F.col("vec_id") % 5 == 0)
    new_set = {r.vec_id for r in new.select("vec_id").collect()}
    g_old = knn_graph_descent(old, k=10, n_rounds=3).localCheckpoint(eager=True)
    upd = knn_graph_insert(
        embs, g_old, new.select("vec_id"), k=10
    ).localCheckpoint(eager=True)

    # (a) untouched rows byte-identical; changed srcs show new-node edges
    old_rows = {(r.src, r.rank): (r.dst, r.cos_sim) for r in g_old.collect()}
    upd_rows = {(r.src, r.rank): (r.dst, r.cos_sim) for r in upd.collect()}
    changed_srcs = {
        s
        for (s, rk), v in old_rows.items()
        if s not in new_set and upd_rows.get((s, rk)) != v
    }
    src_to_new_dst = {
        r.src for r in upd.collect() if r.dst in new_set and r.src not in new_set
    }
    assert changed_srcs <= src_to_new_dst, changed_srcs - src_to_new_dst
    untouched = {s for (s, _) in old_rows} - src_to_new_dst
    for (s, rk), v in old_rows.items():
        if s in untouched:
            assert upd_rows[(s, rk)] == v

    # (b) new-node shape + recall beats the seed-only rebuild baseline
    per = (
        upd.where(F.col("src").isin([int(v) for v in new_set]))
        .groupBy("src")
        .agg(F.count("*").alias("m"), F.min("rank").alias("lo"),
             F.max("rank").alias("hi"))
    )
    assert per.where(
        (F.col("m") > 10) | (F.col("lo") != 1) | (F.col("hi") != F.col("m"))
    ).count() == 0
    n = embs.count()
    exact = cosine_topk(embs, n_queries=n, k=10).localCheckpoint(eager=True)

    def new_recall(g):
        rec = knn_graph_recall(g, exact, k=10)
        return (
            rec.where(F.col("src").isin([int(v) for v in new_set]))
            .agg(F.avg("recall"))
            .first()[0]
        )

    seed_only = knn_graph_descent(embs, k=10, n_rounds=0)
    assert new_recall(upd) > new_recall(seed_only)

    # (c) deterministic under repartitioning
    upd2 = knn_graph_insert(
        embs.repartition(13), g_old, new.select("vec_id"), k=10
    )
    assert {
        (r.src, r.rank): (r.dst, r.cos_sim) for r in upd2.collect()
    } == upd_rows


def test_broadcast_and_join_scoring_paths_bit_identical(spark, sf_small):
    """The two scoring paths (broadcast corpus matrix vs vector
    equi-joins) must be BIT-interchangeable: same gathered float64
    rows, same einsum, same boundary rounding — so the path dispatch
    threshold can never change results, only cost."""
    embs = _embs(spark, sf_small)
    bcast = {
        (r.src, r.rank): (r.dst, r.cos_sim)
        for r in knn_graph_descent(embs, k=5, n_rounds=1).collect()
    }
    joined = {
        (r.src, r.rank): (r.dst, r.cos_sim)
        for r in knn_graph_descent(
            embs, k=5, n_rounds=1, broadcast_threshold=0
        ).collect()
    }
    assert bcast == joined


def test_broadcast_path_drops_unknown_ids_like_join_path(spark):
    """r10 advice: an id absent from the broadcast index used to raise
    an executor-side KeyError while the join path silently dropped the
    pair — the 'bit-interchangeable' paths diverged on dirty input
    (e.g. a served graph referencing vectors no longer in embeddings).
    The UDF now scores unknown ids NaN and _score_pairs filters them,
    so both paths DROP such pairs identically."""
    import numpy as np

    from ccm_spark.pipeline.ann_graph import _pair_scorer, _score_pairs
    from ccm_spark.pipeline.similarity import cosine_pandas

    rng = np.random.default_rng(3)
    embs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    # pair (0,1) is clean; (2,999) and (998, 997) reference ids with no
    # embedding row
    pairs = spark.createDataFrame(
        [(0, 1), (2, 999), (998, 997)], "src long, dst long"
    )
    cos = cosine_pandas()
    vecs_b, pair_cos = _pair_scorer(embs, 6, broadcast_threshold=100)
    assert pair_cos is not None  # broadcast path selected
    got_b = sorted(
        (r.src, r.dst, r.cos_sim)
        for r in _score_pairs(vecs_b, cos, pairs, pair_cos).collect()
    )
    vecs_j, none_cos = _pair_scorer(embs, 6, broadcast_threshold=0)
    assert none_cos is None  # join path selected
    got_j = sorted(
        (r.src, r.dst, r.cos_sim)
        for r in _score_pairs(vecs_j, cos, pairs, None).collect()
    )
    vecs_j.unpersist()
    assert got_b == got_j  # identical drop behavior AND identical scores
    assert {(s, d) for s, d, _ in got_b} == {(0, 1), (1, 0)}


def test_broadcast_dispatch_bounded_by_bytes_not_rows(spark, monkeypatch):
    """r10 advice: the dispatch was row-count-only, so a 100k-row
    corpus of high-dim embeddings could collect GBs to the driver. The
    dispatch now probes one row's dim and falls back to the join path
    when n * dim * 8 exceeds KNN_GRAPH_BROADCAST_MAX_BYTES."""
    import numpy as np

    from ccm_spark.pipeline import ann_graph

    rng = np.random.default_rng(5)
    embs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    # 10 rows x 16 dim x 8 B = 1280 B: under the real cap -> broadcast
    vecs, pair_cos = ann_graph._pair_scorer(embs, 10, broadcast_threshold=100)
    assert vecs is None and pair_cos is not None
    # shrink the byte cap below the matrix size -> join path despite
    # n <= broadcast_threshold
    monkeypatch.setattr(ann_graph, "KNN_GRAPH_BROADCAST_MAX_BYTES", 1024)
    vecs2, pair_cos2 = ann_graph._pair_scorer(embs, 10, broadcast_threshold=100)
    assert pair_cos2 is None and vecs2 is not None
    vecs2.unpersist()


def test_knn_graph_insert_rejects_reinserted_ids(spark):
    """r10 advice: re-inserting an id already in the served graph would
    mirror edges onto incumbent (src, dst) rows and let one neighbor
    hold two top-k ranks. The insert now fails fast with a clear error
    (one left-semi count) instead of silently corrupting ranks."""
    import numpy as np
    import pytest

    from ccm_spark.pipeline.ann_graph import knn_graph_descent, knn_graph_insert

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = embs.where(F.col("vec_id") < 30)
    g = knn_graph_descent(base, k=3, n_rounds=1, planes=3).localCheckpoint(
        eager=True
    )
    # an increment that includes id 0 — already a graph node
    bad_new = spark.createDataFrame([(0,), (35,)], "vec_id long")
    with pytest.raises(ValueError, match="already exist in the served graph"):
        knn_graph_insert(embs, g, bad_new, k=3, planes=3)
    # the clean increment still works
    ok_new = spark.createDataFrame([(35,), (36,)], "vec_id long")
    out = knn_graph_insert(embs, g, ok_new, k=3, planes=3)
    assert out.count() > 0


def test_knn_graph_insert_matches_duckdb_twin(spark, sf_small):
    """The whole incremental-insert chain replayed declaratively in
    DuckDB at the gate geometry (r12 gate candidate, QUERIES.md): the
    served graph is sql_knn_graph over the pre-insert 80% nested via
    the source hook, then full-corpus bucketization with increment-side
    pairs, one hop through the served graph, shared canonical scoring,
    and the three-way merge (new top-k / touched re-rank / untouched
    byte-identical). Exact equality incl. the cosine doubles and every
    preserved rank."""
    import duckdb

    from ccm_spark.pipeline.ann_graph import knn_graph_insert
    from ccm_spark.pipeline.similarity import SRP_PLANES
    from ccm_spark.plans.oracle_sql_ext import (
        KNN_GRAPH_K,
        KNN_GRAPH_SEED,
        KNN_GRAPH_TABLES,
        KNN_INSERT_MOD,
        sql_knn_graph_insert,
    )

    embs = _embs(spark, sf_small)
    base = embs.where(F.col("vec_id") % KNN_INSERT_MOD != 0)
    new_ids = embs.where(F.col("vec_id") % KNN_INSERT_MOD == 0).select("vec_id")
    g = knn_graph_descent(
        base,
        k=KNN_GRAPH_K,
        n_rounds=1,
        seed=KNN_GRAPH_SEED,
        planes=SRP_PLANES,
        n_seed_tables=KNN_GRAPH_TABLES,
    ).localCheckpoint(eager=True)
    out = knn_graph_insert(
        embs,
        g,
        new_ids,
        k=KNN_GRAPH_K,
        seed=KNN_GRAPH_SEED,
        planes=SRP_PLANES,
        n_seed_tables=KNN_GRAPH_TABLES,
    )
    got = sorted((r.src, r.dst, r.cos_sim, r.rank) for r in out.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    want = sorted(
        (int(s), int(d), float(c), int(rk))
        for s, d, c, rk in con.sql(sql_knn_graph_insert()).fetchall()
    )
    assert len(got) == len(want) > 0
    mism = [(a, b) for a, b in zip(got, want) if a != b]
    assert not mism, mism[:5]
    # the increment did real work on both sides: new nodes present
    assert any(s % KNN_INSERT_MOD == 0 for s, _, _, _ in got)


def _py_graph_search(edges, vec, qvec, k, beam, n_hops, n_seeds):
    """Pure-Python best-first replay of knn_graph_search — same seeds,
    same round9 scores, same (cos desc, id asc) order, same
    expand-the-beam / never-rescore discipline."""
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 0.0 if na == 0 or nb == 0 else dot / (na * nb)

    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    seeds = sorted(adj)[:n_seeds]
    out = {}
    for qid, qv in qvec.items():
        visited = {n: round(cos(qv, vec[n]), 9) + 0.0 for n in seeds}
        for _ in range(n_hops):
            frontier = sorted(visited, key=lambda n: (-visited[n], n))[:beam]
            cand = {
                d for n in frontier for d in adj.get(n, ()) if d not in visited
            }
            for n in cand:
                visited[n] = round(cos(qv, vec[n]), 9) + 0.0
        ranked = sorted(visited, key=lambda n: (-visited[n], n))[:k]
        out[qid] = [(r + 1, n, visited[n]) for r, n in enumerate(ranked)]
    return out


def test_knn_graph_search_matches_python_replay(spark, sf_small):
    from ccm_spark.pipeline.ann_graph import knn_graph_descent, knn_graph_search

    embs = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    graph = knn_graph_descent(embs, k=6, n_rounds=2, planes=5).localCheckpoint(
        eager=True
    )
    queries = embs.where("vec_id % 50 = 7").selectExpr(
        "vec_id as query_id", "embedding"
    )
    got = {}
    res = knn_graph_search(
        graph, embs, queries, k=5, beam=16, n_hops=3, n_seeds=8
    )
    for r in res.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.target_id, r.cos_sim))
    for qid in got:
        got[qid].sort()

    edges = [(r.src, r.dst) for r in graph.select("src", "dst").collect()]
    vec = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in embs.collect()
    }
    qvec = {
        r.query_id: [float(x) for x in r.embedding]
        for r in queries.collect()
    }
    want = _py_graph_search(edges, vec, qvec, k=5, beam=16, n_hops=3, n_seeds=8)
    assert set(got) == set(want)
    mism = [(q, got[q], want[q]) for q in want if got[q] != want[q]]
    assert not mism, mism[:2]


def test_knn_graph_search_matches_duckdb_twin(spark, sf_small):
    """The whole beam walk replayed declaratively in DuckDB at the gate
    geometry (r13 gate candidate, QUERIES.md): the served graph is
    sql_knn_graph nested verbatim, the walk unrolled hop-by-hop with
    NOT EXISTS standing in for the Spark side's left_anti visited
    check. Exact equality including the cosine doubles and every
    rank — the evidence tier the other graph-family operators carry."""
    import duckdb

    from ccm_spark.pipeline.ann_graph import knn_graph_descent, knn_graph_search
    from ccm_spark.pipeline.similarity import SRP_PLANES
    from ccm_spark.plans.oracle_sql_ext import (
        KNN_GRAPH_K,
        KNN_GRAPH_ROUNDS,
        KNN_GRAPH_SEED,
        KNN_GRAPH_TABLES,
        SEARCH_BEAM,
        SEARCH_GATE_PRED,
        SEARCH_HOPS,
        SEARCH_K,
        SEARCH_SEEDS,
        sql_knn_graph_search,
    )

    embs = _embs(spark, sf_small)
    graph = knn_graph_descent(
        embs,
        k=KNN_GRAPH_K,
        n_rounds=KNN_GRAPH_ROUNDS,
        seed=KNN_GRAPH_SEED,
        planes=SRP_PLANES,
        n_seed_tables=KNN_GRAPH_TABLES,
    ).localCheckpoint(eager=True)
    queries = embs.where(SEARCH_GATE_PRED).selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = knn_graph_search(
        graph,
        embs,
        queries,
        k=SEARCH_K,
        beam=SEARCH_BEAM,
        n_hops=SEARCH_HOPS,
        n_seeds=SEARCH_SEEDS,
    )
    got = sorted(
        (r.query_id, r.rank, r.target_id, r.cos_sim) for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_small}/embeddings.parquet')"
    )
    want = sorted(
        (int(q), int(rk), int(t), float(c))
        for q, rk, t, c in con.sql(sql_knn_graph_search()).fetchall()
    )
    assert len(got) == len(want) > 0
    mism = [(a, b) for a, b in zip(got, want) if a != b]
    assert not mism, mism[:5]
    # every query produced a full top-k (the walk visited >= k nodes)
    from collections import Counter

    per_q = Counter(q for q, _, _, _ in got)
    assert per_q and all(v == SEARCH_K for v in per_q.values())


def test_knn_graph_search_recall_vs_exact(spark, sf_small):
    """The walk must beat chance by a wide margin on the isotropic
    corpus: recall@5 vs brute force, pinned well above the random floor
    (5/500 = 0.01) — and visiting strictly fewer nodes than the corpus
    (the point of the graph walk)."""
    from ccm_spark.pipeline.ann_graph import knn_graph_descent, knn_graph_search
    from ccm_spark.pipeline.similarity import cosine_topk

    embs = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    graph = knn_graph_descent(embs, k=8, n_rounds=3, planes=5).localCheckpoint(
        eager=True
    )
    queries = embs.where("vec_id < 20").selectExpr(
        "vec_id as query_id", "embedding"
    )
    exact = {
        (r.query_id, r.target_id)
        for r in cosine_topk(embs, n_queries=20, k=5).collect()
    }
    # exact top-k EXCLUDES self; the graph walk may visit the query's own
    # node (queries are corpus members here), so over-fetch and drop self
    served_rows = knn_graph_search(
        graph, embs, queries, k=6, beam=32, n_hops=4, n_seeds=16
    ).collect()
    served = {
        (r.query_id, r.target_id)
        for r in served_rows
        if r.target_id != r.query_id
    }
    recall = len(exact & served) / len(exact)
    assert recall >= 0.35, f"graph-walk recall@5 = {recall:.2f}"


def test_knn_graph_search_dangling_nodes(spark):
    """A served graph can reference vectors since deleted
    (the knn_graph_insert scenario): dangling dst ids must be marked
    visited-but-unscorable — never output, never re-proposed, never
    expanded — so the walk over a graph WITH dangling edges returns
    exactly the walk over the same graph with them pruned."""
    import random

    from ccm_spark.pipeline.ann_graph import knn_graph_search

    rng = random.Random(7)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(12)]
    embs = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    live = [(i, (i + 1) % 12) for i in range(12)] + [
        (i, (i + 5) % 12) for i in range(12)
    ]
    dangling = [(i, 99) for i in range(0, 12, 3)] + [(4, 101), (7, 101)]
    g_live = spark.createDataFrame(live, "src long, dst long")
    g_full = spark.createDataFrame(live + dangling, "src long, dst long")
    queries = spark.createDataFrame(
        [(0, vecs[3][1]), (1, vecs[8][1])],
        "query_id long, embedding array<double>",
    )
    kw = dict(k=4, beam=4, n_hops=3, n_seeds=2)
    got = sorted(
        (r.query_id, r.rank, r.target_id, r.cos_sim)
        for r in knn_graph_search(g_full, embs, queries, **kw).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.target_id, r.cos_sim)
        for r in knn_graph_search(g_live, embs, queries, **kw).collect()
    )
    assert got == want and got
    assert all(t not in (99, 101) for _, _, t, _ in got)
