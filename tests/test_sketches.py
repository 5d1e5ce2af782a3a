"""Mergeable corpus sketches (extension surface — the reference has no
sketch layer, SURVEY.md §2.1).

Pins: HLL estimates vs exact distinct counts, sketch-merge ==
whole-corpus build (the incremental contract), CMS increment-merge
bit-equal to union-build (exact integer sums), CMS lookups never
under-counting and exact in the collision-free regime."""

from __future__ import annotations

import pytest

from ccm_spark.pipeline.sketches import (
    cms_build,
    cms_lookup,
    cms_merge,
    hll_merge,
    token_hll,
)


def _docs(spark):
    rows = []
    for i in range(60):
        src = ["web", "books"][i % 2]
        # deterministic word soup with a known heavy hitter
        words = ["alpha"] * 5 + [f"w{i}", f"w{i % 7}", "beta"]
        rows.append((i, " ".join(words), src))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hll_estimates_track_exact_counts(spark):
    import pyspark.sql.functions as F

    from ccm_spark.functions.hashing import tokens_col

    docs = _docs(spark)
    got = {r.source: r for r in token_hll(docs, by="source").collect()}
    exact = {
        r.source: (r.toks, r.docs)
        for r in docs.select(
            "source", "doc_id", F.explode(tokens_col("text")).alias("tok")
        )
        .groupBy("source")
        .agg(
            F.countDistinct("tok").alias("toks"),
            F.countDistinct("doc_id").alias("docs"),
        )
        .collect()
    }
    assert set(got) == {"web", "books"}
    for src, (toks, docs_n) in exact.items():
        assert got[src].distinct_tokens_est == pytest.approx(toks, rel=0.05)
        assert got[src].distinct_docs_est == pytest.approx(docs_n, rel=0.05)


def test_hll_merge_equals_whole_corpus_build(spark):
    """The incremental contract: per-increment sketches folded with
    hll_merge estimate the same as one build over the union corpus."""
    docs = _docs(spark)
    parts = [docs.filter(f"doc_id % 3 = {k}") for k in range(3)]
    inc = [token_hll(p, by=None) for p in parts]
    folded = hll_merge(inc[0].unionByName(inc[1]).unionByName(inc[2])).collect()[0]
    whole = token_hll(docs, by=None).collect()[0]
    assert folded.distinct_tokens_est == pytest.approx(
        whole.distinct_tokens_est, rel=1e-9
    )
    assert folded.distinct_docs_est == pytest.approx(
        whole.distinct_docs_est, rel=1e-9
    )


def _cms_rows(df):
    # r["count"]: attribute access would return Row's tuple .count method
    return sorted((r.row_idx, r.col_idx, r["count"]) for r in df.collect())


def test_cms_increment_merge_bit_equals_union_build(spark):
    docs = _docs(spark)
    yesterday = docs.filter("doc_id < 40")
    today = docs.filter("doc_id >= 40")
    merged = cms_merge(cms_build(yesterday), cms_build(today))
    whole = cms_build(docs)
    assert _cms_rows(merged) == _cms_rows(whole)  # exact integer sums
    # and partitioning cannot matter for integer counts
    assert _cms_rows(cms_build(docs.repartition(7))) == _cms_rows(whole)


def test_cms_lookup_never_undercounts_and_is_exact_when_sparse(spark):
    import pyspark.sql.functions as F

    from ccm_spark.functions.hashing import tokens_col

    docs = _docs(spark)
    sketch = cms_build(docs).persist()
    truth = {
        r.tok: r.n
        for r in docs.select(F.explode(tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    est = {
        r.token: r.count_est
        for r in cms_lookup(sketch, ["alpha", "beta", "w3", "nosuchtoken"]).collect()
    }
    assert est["alpha"] >= truth["alpha"] and est["beta"] >= truth["beta"]
    # ~70 distinct tokens in 4x2048 counters: collision-free regime
    assert est["alpha"] == truth["alpha"] == 300  # 5 x 60 docs
    assert est["beta"] == truth["beta"] == 60
    assert est["w3"] == truth["w3"]
    assert est["nosuchtoken"] == 0
    sketch.unpersist()


def test_cms_merge_rejects_empty(spark):
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_cms_build_matches_duckdb_replay(spark):
    """The sketch docstring's portability claim, proven: DuckDB
    re-derives the ENTIRE counter relation from the same md5 hash
    construction, row for row."""
    import duckdb
    import pandas as pd

    from ccm_spark.functions.hashing import sql_md5_long, sql_tokens
    from ccm_spark.pipeline.sketches import CMS_DEPTH, CMS_WIDTH

    docs = _docs(spark)
    got = _cms_rows(cms_build(docs))
    pdf = docs.select("doc_id", "text").toPandas()
    duckdb.register("cms_fixture", pd.DataFrame(pdf))
    hash_expr = sql_md5_long("'cms' || r || ':' || tok")
    want = sorted(
        (int(a), int(b), int(c))
        for a, b, c in duckdb.sql(
            f"""
            WITH toks AS (
              SELECT unnest({sql_tokens('text')}) AS tok FROM cms_fixture
            ),
            cells AS (
              SELECT CAST(v.r AS INT) AS row_idx,
                     ({hash_expr} % {CMS_WIDTH}) AS col_idx
              FROM toks CROSS JOIN (VALUES (0), (1), (2), (3)) v(r)
            )
            SELECT row_idx, col_idx, COUNT(*) AS cnt
            FROM cells GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert len(want) > 0 and CMS_DEPTH == 4  # VALUES list matches depth
    assert got == want


def test_cms_and_hll_build_from_a_stream(spark, tmp_path):
    """Both sketch builds are plain aggregations with BOUNDED state
    (<= depth x width counters / one HLL register set), so the same code
    runs as a streaming aggregation in complete mode — continuous corpus
    monitoring. Final streamed state must equal the batch sketch: CMS
    bit-for-bit, HLL estimate-for-estimate."""
    docs = _docs(spark)
    jdir = str(tmp_path / "docs")
    docs.coalesce(2).write.json(jdir)
    stream = spark.readStream.schema(
        "doc_id long, text string, source string"
    ).json(jdir)

    q = (
        cms_build(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.row_idx, r.col_idx, r["count"])
        for r in spark.sql("select * from cms_stream").collect()
    )
    assert got == _cms_rows(cms_build(docs))

    q2 = (
        token_hll(stream, by="source")
        .drop("token_hll", "doc_hll")
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got_h = {
        r.source: (r.distinct_tokens_est, r.distinct_docs_est)
        for r in spark.sql("select * from hll_stream").collect()
    }
    want_h = {
        r.source: (r.distinct_tokens_est, r.distinct_docs_est)
        for r in token_hll(docs, by="source").collect()
    }
    assert got_h == want_h


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch
# ---------------------------------------------------------------------------


def _py_bk_hash(key) -> int:
    """Independent python oracle for the sketch hash: 60-bit md5 of
    'bk:<key>' — NOT derived from the Spark expression under test."""
    import hashlib

    return int(hashlib.md5(f"bk:{key}".encode()).hexdigest()[:15], 16)


def _val_docs(spark, n=5000, src_mod=None):
    rows = []
    for i in range(n):
        src = ["web", "books"][i % 2] if src_mod else "web"
        rows.append((i, float((i * 37) % 1000) / 1000.0, src))
    return spark.createDataFrame(rows, "doc_id long, value double, source string")


def test_bottomk_build_matches_python_oracle(spark):
    """The thresholded two-pass build returns EXACTLY the k smallest
    hashes (n=5000 > 4k=1024, so the Chernoff filter path is the one
    exercised), pinned against an independent hashlib replay."""
    from ccm_spark.pipeline.sketches import bottomk_build

    docs = _val_docs(spark)
    got = sorted(
        (r.h, r.value) for r in bottomk_build(docs, "value", k=256).collect()
    )
    want = sorted(
        (_py_bk_hash(i), float((i * 37) % 1000) / 1000.0) for i in range(5000)
    )[:256]
    assert got == want


def test_bottomk_merge_bitexact_vs_union_build(spark):
    """The incremental contract: per-half sketches folded with
    bottomk_merge equal the union-corpus build bit for bit."""
    from ccm_spark.pipeline.sketches import bottomk_build, bottomk_merge

    docs = _val_docs(spark)
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    merged = sorted(
        (r.h, r.value)
        for r in bottomk_merge(
            bottomk_build(a, "value", k=128), bottomk_build(b, "value", k=128)
        ).collect()
    )
    union = sorted(
        (r.h, r.value) for r in bottomk_build(docs, "value", k=128).collect()
    )
    assert merged == union


def test_bottomk_partitioning_invariance(spark):
    from ccm_spark.pipeline.sketches import bottomk_build

    docs = _val_docs(spark, n=2000)
    one = sorted((r.h, r.value) for r in bottomk_build(docs, "value").collect())
    many = sorted(
        (r.h, r.value) for r in bottomk_build(docs.repartition(7), "value").collect()
    )
    assert one == many


def test_bottomk_quantiles_accuracy(spark):
    """k=256 over 5000 near-uniform values: rank error ~1/sqrt(k), so
    estimates land within 0.1 of the true quantile value."""
    from ccm_spark.pipeline.sketches import bottomk_build, bottomk_quantiles

    docs = _val_docs(spark)
    sk = bottomk_build(docs, "value", k=256)
    got = {r.prob: r.value_est for r in bottomk_quantiles(sk, [0.1, 0.5, 0.9]).collect()}
    assert set(got) == {0.1, 0.5, 0.9}
    for p, est in got.items():
        assert abs(est - p) < 0.1  # true q(p) ~= p for this distribution


def test_bottomk_small_group_is_exact(spark):
    """n <= k keeps every row, so quantiles are the exact percentiles."""
    import numpy as np

    from ccm_spark.pipeline.sketches import bottomk_build, bottomk_quantiles

    docs = _val_docs(spark, n=100)
    sk = bottomk_build(docs, "value", k=256)
    assert sk.count() == 100
    vals = np.array([float((i * 37) % 1000) / 1000.0 for i in range(100)])
    got = {r.prob: r.value_est for r in bottomk_quantiles(sk, [0.25, 0.75]).collect()}
    for p, est in got.items():
        assert est == pytest.approx(
            float(np.percentile(vals, 100 * p, method="linear")), abs=1e-9
        )


def test_bottomk_grouped_and_count_est(spark):
    from ccm_spark.pipeline.sketches import (
        bottomk_build,
        bottomk_count_est,
        bottomk_quantiles,
    )

    docs = _val_docs(spark, src_mod=2)
    sk = bottomk_build(docs, "value", by="source", k=256)
    qs = bottomk_quantiles(sk, [0.5], by="source")
    assert {r.source for r in qs.collect()} == {"web", "books"}
    est = {r.source: r.rows_est for r in bottomk_count_est(sk, by="source").collect()}
    for src in ("web", "books"):
        assert est[src] == pytest.approx(2500, rel=0.25)


def test_bottomk_guards(spark):
    from ccm_spark.pipeline.sketches import (
        bottomk_build,
        bottomk_merge,
        bottomk_quantiles,
    )

    docs = _val_docs(spark, n=10)
    with pytest.raises(ValueError, match="k must be >= 32"):
        bottomk_build(docs, "value", k=8)
    with pytest.raises(ValueError, match="at least one"):
        bottomk_merge()
    sk = bottomk_build(docs, "value")
    with pytest.raises(ValueError, match="at least one"):
        bottomk_quantiles(sk, [])
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        bottomk_quantiles(sk, [1.5])


def test_bottomk_build_matches_duckdb_replay(spark):
    """Engine portability: DuckDB re-derives the sketch relation from
    the same md5 construction via QUALIFY row_number."""
    import duckdb
    import pandas as pd

    from ccm_spark.functions.hashing import sql_md5_long
    from ccm_spark.pipeline.sketches import bottomk_build

    docs = _val_docs(spark, n=1500)
    got = sorted(
        (r.h, r.value) for r in bottomk_build(docs, "value", k=64).collect()
    )
    duckdb.register(
        "bk_fixture", pd.DataFrame(docs.select("doc_id", "value").toPandas())
    )
    hash_expr = sql_md5_long("'bk:' || CAST(doc_id AS VARCHAR)")
    want = sorted(
        (int(h), float(v))
        for h, v in duckdb.sql(
            f"""
            SELECT {hash_expr} AS h, value
            FROM bk_fixture
            QUALIFY row_number() OVER (ORDER BY h, value) <= 64
            """
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Snapshot drift readouts
# ---------------------------------------------------------------------------


def test_hll_growth_tracks_novel_tokens(spark):
    """new_tokens_est ≈ the true count of tokens in the new snapshot
    absent from the old one (inclusion-exclusion over the union
    sketch); groups present in only one snapshot still report."""
    from ccm_spark.pipeline.sketches import hll_growth, token_hll

    old_docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(50)), "web") for i in range(5)],
        "doc_id long, text string, source string",
    )
    new_docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(40, 90)), "web") for i in range(5)]
        + [(99, "only new source tokens here", "books")],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: r
        for r in hll_growth(
            token_hll(old_docs, by="source"), token_hll(new_docs, by="source"),
            by="source",
        ).collect()
    }
    # web: old w0..w49, new w40..w89 -> 40 novel
    assert got["web"].new_tokens_est == pytest.approx(40, rel=0.1)
    assert got["web"].tokens_old_est == pytest.approx(50, rel=0.05)
    # books exists only in new: everything novel, old side 0
    assert got["books"].tokens_old_est == 0.0
    assert got["books"].new_tokens_est == pytest.approx(5, rel=0.1)


def test_cms_delta_flags_frequency_jump(spark):
    from ccm_spark.pipeline.sketches import cms_build, cms_delta

    old_docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)], "doc_id long, text string"
    )
    new_docs = spark.createDataFrame(
        [(i, "alpha " + "spam " * 20) for i in range(10)],
        "doc_id long, text string",
    )
    got = {
        r.token: (r.old_est, r.new_est, r.delta)
        for r in cms_delta(
            cms_build(old_docs), cms_build(new_docs), ["alpha", "beta", "spam"]
        ).collect()
    }
    assert got["alpha"] == (10, 10, 0)
    assert got["beta"] == (10, 0, -10)
    assert got["spam"] == (0, 200, 200)


def test_bottomk_drift_sees_median_shift(spark):
    from ccm_spark.pipeline.sketches import bottomk_build, bottomk_drift

    old = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(2000)], "doc_id long, value double"
    )
    new = spark.createDataFrame(
        [(i, float(i % 100) / 2.0) for i in range(2000)],
        "doc_id long, value double",
    )
    got = {
        r.prob: r
        for r in bottomk_drift(
            bottomk_build(old, "value"), bottomk_build(new, "value"), [0.5]
        ).collect()
    }
    r = got[0.5]
    assert r.old_est == pytest.approx(50, abs=10)
    assert r.new_est == pytest.approx(25, abs=5)
    assert r.shift == pytest.approx(-25, abs=12)


def test_token_hll_counts_tokenless_docs(spark):
    """A doc whose text tokenises to nothing must still count in
    distinct_docs_est, and a group of only token-less docs must still
    appear (the regression dropped both via the inner explode)."""
    from ccm_spark.pipeline.sketches import token_hll

    docs = spark.createDataFrame(
        [(0, "alpha beta", "web"), (1, "", "web"), (2, None, "web"),
         (3, "   ", "scan"), (4, "", "scan")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in token_hll(docs, by="source").collect()}
    assert set(got) == {"web", "scan"}
    assert got["web"].distinct_docs_est == pytest.approx(3, rel=0.05)
    assert got["web"].distinct_tokens_est == pytest.approx(2, rel=0.05)
    assert got["scan"].distinct_docs_est == pytest.approx(2, rel=0.05)
    assert (got["scan"].distinct_tokens_est or 0.0) == pytest.approx(0, abs=0.5)


def test_bottomk_null_semantics_and_k_mismatch_merge(spark):
    """NULL by-groups are kept (null-safe count join); NULL key/value
    rows are excluded up front; merging mismatched ks yields a VALID
    min-k sketch of the union, bit-equal to a min-k build."""
    from ccm_spark.pipeline.sketches import (
        bottomk_build,
        bottomk_count_est,
        bottomk_merge,
    )

    rows = (
        [(i, float(i), "web") for i in range(200)]
        + [(1000 + i, float(i), None) for i in range(150)]  # NULL group
        + [(None, 7.0, "web"), (2000, None, "web")]  # NULL key / value
    )
    docs = spark.createDataFrame(rows, "doc_id long, value double, source string")
    sk = bottomk_build(docs, "value", by="source", k=64)
    per_group = {r[0]: r[1] for r in sk.groupBy("source").count().collect()}
    assert per_group["web"] == 64  # the 2 NULL-key/value rows never sampled
    assert per_group[None] == 64  # NULL group present, not dropped

    # k-mismatch merge: effective k = min(64, 128), equal to a k=64 build
    half_a = docs.filter("doc_id % 2 = 0")
    half_b = docs.filter("doc_id % 2 = 1")
    merged = bottomk_merge(
        bottomk_build(half_a, "value", by="source", k=64),
        bottomk_build(half_b, "value", by="source", k=128),
        by="source",
    )
    want = bottomk_build(docs, "value", by="source", k=64)
    def rows(df):
        return sorted(
            ((r.source or "", r.h, r.value, r.k) for r in df.collect())
        )

    assert rows(merged) == rows(want)
    assert merged.select("k").distinct().collect()[0].k == 64
    # count_est reads k off the sketch itself
    est = {
        r.source: r.rows_est
        for r in bottomk_count_est(merged, by="source").collect()
    }
    assert est["web"] == pytest.approx(200, rel=0.35)


def test_hll_growth_default_folds_grouped_inputs(spark):
    """by=None over per-group sketch relations must fold each side to
    the union corpus first — not cartesian-pair mismatched groups."""
    from ccm_spark.pipeline.sketches import hll_growth, token_hll

    docs = spark.createDataFrame(
        [(i, f"tok{i}", ["web", "books"][i % 2]) for i in range(40)],
        "doc_id long, text string, source string",
    )
    grouped = token_hll(docs, by="source")  # TWO rows per side
    out = hll_growth(grouped, grouped)
    rows = out.collect()
    assert len(rows) == 1  # folded, not 2x2 cartesian
    assert rows[0].tokens_old_est == pytest.approx(40, rel=0.1)
    assert rows[0].new_tokens_est == pytest.approx(0, abs=1.0)


def test_hll_registers_merge_estimate_and_duckdb_replay(spark, sf_small):
    """The relation-form HLL: increment-merge == union-build bit-for-bit
    (groupBy-MAX), the estimator lands within sketch error of the exact
    distinct-token count, and DuckDB re-derives every register from the
    same md5 toolkit (the cross-engine pin the DataSketches binaries
    cannot give)."""
    import duckdb
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.sketches import (
        hll_registers,
        hll_registers_estimate,
        hll_registers_merge,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")

    # corpus-level build == merge of two disjoint half-corpus builds
    whole = hll_registers(docs, by=None)
    a = hll_registers(docs.where(F.col("doc_id") % 2 == 0), by=None)
    b = hll_registers(docs.where(F.col("doc_id") % 2 == 1), by=None)
    merged = hll_registers_merge(a, b)
    w = {(r.register_idx, r.rho_max) for r in whole.collect()}
    m = {(r.register_idx, r.rho_max) for r in merged.collect()}
    assert w == m

    # estimate within sketch error (~1.6% at p=12; allow 5%)
    exact = (
        docs.select(F.explode(F.expr(
            "filter(split(lower(text), '[ \\t\\n\\x0b\\f\\r]+'), t -> t != '')"
        )).alias("tok")).select("tok").distinct().count()
    )
    est = hll_registers_estimate(whole).collect()[0].distinct_est
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # cross-engine register replay
    from ccm_spark.plans.oracle_sql_ext import sql_hll_registers

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = {(int(r), int(x)) for r, x in con.sql(sql_hll_registers()).fetchall()}
    assert w == want

    # per-group build keeps one sketch per source
    by_src = hll_registers(docs, by="source")
    assert by_src.select("source").distinct().count() > 1


def test_bottomk_quantiles_match_duckdb_twin(spark, sf_small):
    """bottomk_build + bottomk_quantiles over doc_len replayed in
    DuckDB (the sketch IS the k smallest md5 hashes; quantile_cont ==
    Spark percentile), rounded 6 at the boundary — the r11 gate
    candidate's evidence (QUERIES.md)."""
    import duckdb
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.sketches import bottomk_build, bottomk_quantiles
    from ccm_spark.plans.oracle_sql_ext import BK_GATE_PROBS, sql_bottomk_quantiles

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", F.length("text").alias("doc_len")
    )
    sk = bottomk_build(docs, "doc_len", k=256)
    out = bottomk_quantiles(sk, list(BK_GATE_PROBS)).select(
        "prob", (F.round("value_est", 6) + F.lit(0.0)).alias("value_est")
    )
    got = sorted((r.prob, r.value_est) for r in out.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (float(p), float(v)) for p, v in con.sql(sql_bottomk_quantiles()).fetchall()
    )
    assert got == want


def test_heavy_hitters_exact_regime_and_guarantee(spark):
    """Skewed synthetic with cardinality ABOVE capacity: the known
    heavy values must be recovered with exact counts and ranks, and
    every emitted row above the guarantee bound must be a true top
    value."""
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.sketches import heavy_hitters

    # 4000 'hot' + 1500 'warm' + 3000 singletons (cardinality 3002)
    df = (
        spark.range(0, 4000).select(F.lit("hot").alias("v"))
        .unionAll(spark.range(0, 1500).select(F.lit("warm").alias("v")))
        .unionAll(
            spark.range(0, 3000).select(
                F.concat(F.lit("u"), F.col("id")).alias("v")
            )
        )
    )
    out = heavy_hitters(df.repartition(13), "v", k=3, capacity=16)
    rows = {r.rank: r for r in out.collect()}
    assert (rows[1].value, rows[1].cnt) == ("hot", 4000)
    assert (rows[2].value, rows[2].cnt) == ("warm", 1500)
    assert rows[1].total_rows == 8500
    # the MG membership guarantee: both true heavies clear the bound
    assert rows[1].cnt > rows[1].guarantee_min
    assert rows[2].cnt > rows[2].guarantee_min


def test_heavy_hitters_exact_when_cardinality_fits(spark, sf_small):
    """Cardinality <= capacity retains everything: the result is the
    plain exact top-k, invariant to partition layout."""
    from ccm_spark.pipeline.sketches import heavy_hitters

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    a = sorted(
        tuple(r) for r in heavy_hitters(docs, "lang", k=5).collect()
    )
    b = sorted(
        tuple(r)
        for r in heavy_hitters(docs.repartition(29), "lang", k=5).collect()
    )
    exact = {
        (r["lang"] or "<NULL>"): r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    assert a == b and len(a) == 5
    assert {t[1]: t[2] for t in a} == exact


def test_heavy_hitters_matches_duckdb_twin(spark, sf_small):
    """Staged gate-candidate pin: the lang top-5 in the exact regime
    hash-matches the plain DuckDB GROUP BY statement (oracle stated
    without the sketch machinery)."""
    import duckdb

    from ccm_spark.pipeline.sketches import heavy_hitters
    from ccm_spark.plans.oracle_sql_ext import sql_heavy_hitters

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(
        tuple(r) for r in heavy_hitters(docs, "lang", k=5).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), str(b), int(c), int(d), int(e))
        for a, b, c, d, e in con.sql(sql_heavy_hitters()).fetchall()
    )
    assert len(got) == len(want) == 5
    assert got == want


def test_heavy_hitters_rejects_bad_params(spark, sf_small):
    import pytest

    from ccm_spark.pipeline.sketches import heavy_hitters

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(docs, "lang", k=0)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(docs, "lang", capacity=0)
