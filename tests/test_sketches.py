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
