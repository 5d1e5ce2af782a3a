"""BM25 lexical search: integer relations pinned exactly vs DuckDB,
scores pinned to 1e-9 vs an independent Python replay (ln may differ in
the last ulp across engines), ranking semantics hand-checked."""

from __future__ import annotations

import math

import duckdb
import pytest

from ccm_spark.functions.hashing import py_tokens, sql_tokens
from ccm_spark.pipeline.search import bm25_index, bm25_topk
from ccm_spark.sources.tables import load_table


def test_bm25_index_relations_match_duckdb(spark, sf_small):
    idx = bm25_index(load_table(spark, sf_small, "documents"))
    got_post = sorted(
        (r.term, r.doc_id, r.tf) for r in idx["postings"].collect()
    )
    got_lens = sorted((r.doc_id, r.dl) for r in idx["doc_lens"].collect())
    want_post = sorted(
        (t, int(d), int(n))
        for t, d, n in duckdb.sql(
            f"""
WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks
           FROM read_parquet('{sf_small}/documents.parquet')),
u AS (SELECT unnest(toks) AS term, doc_id FROM t)
SELECT term, doc_id, count(*) FROM u GROUP BY 1, 2"""
        ).fetchall()
    )
    want_lens = sorted(
        (int(d), int(n))
        for d, n in duckdb.sql(
            f"""
WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks
           FROM read_parquet('{sf_small}/documents.parquet'))
SELECT doc_id, len(toks) FROM t WHERE len(toks) > 0"""
        ).fetchall()
    )
    assert got_post == want_post
    assert got_lens == want_lens
    # dl is denormalised into every posting (serving never joins lengths)
    lens = dict(got_lens)
    assert all(r.dl == lens[r.doc_id] for r in idx["postings"].collect())
    assert idx["n_docs"] == len(want_lens)
    assert idx["avgdl"] == pytest.approx(
        sum(n for _, n in want_lens) / len(want_lens)
    )


def _py_bm25(texts: dict, query: str, k1=1.2, b=0.75):
    """Independent driver replay of the scoring formula."""
    toks = {d: py_tokens(t) for d, t in texts.items()}
    toks = {d: ts for d, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    scores = {}
    for term in sorted(set(py_tokens(query))):
        df = sum(1 for ts in toks.values() if term in ts)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, ts in toks.items():
            tf = ts.count(term)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * len(ts) / avgdl)
            scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / denom
    return scores


def test_bm25_scores_match_python_replay(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    queries = ["spark shuffle partition", "the data", "zzz-nowhere"]
    out = bm25_topk(docs, queries, k=8).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, query in enumerate(queries):
        want = _py_bm25(texts, query)
        got = by_q.get(qid, [])
        # the k returned docs are the k best by (score desc, doc_id asc)
        want_rank = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
        assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == [
            d for d, _ in want_rank
        ]
        for r in got:
            assert r.score == pytest.approx(want[r.doc_id], abs=1e-6)
    assert len(by_q.get(2, [])) == 0  # no-match query returns no rows


def test_bm25_ranking_semantics(spark):
    """Hand-built corpus: rarity wins (idf), repetition saturates (k1),
    and length normalisation (b) demotes padded documents."""
    docs = spark.createDataFrame(
        [
            (1, "rareword alpha beta"),
            (2, "common common common alpha beta"),
            (3, "common " + " ".join(f"pad{i}" for i in range(50))),
            (4, "common alpha"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.query_id, r.rank): r
        for r in bm25_topk(docs, ["rareword", "common"], k=4).collect()
    }
    # the rare term hits exactly its one doc
    assert out[(0, 1)].doc_id == 1 and (0, 2) not in out
    # for "common": tf=3 in a short doc beats tf=1; the padded doc ranks
    # below the short tf=1 doc despite equal tf (length normalisation)
    ranks = [out[(1, i)].doc_id for i in range(1, 4)]
    assert ranks[0] == 2
    assert ranks.index(4) < ranks.index(3)
    # reuse a prebuilt index: identical output
    idx = bm25_index(docs)
    again = {
        (r.query_id, r.rank): r.doc_id
        for r in bm25_topk(idx, ["rareword", "common"], k=4).collect()
    }
    assert again == {k: v.doc_id for k, v in out.items()}


def test_rrf_fusion_matches_duckdb_and_hybrid_semantics(spark):
    """RRF of a lexical and a 'vector' ranking: contribution formula and
    tie-breaks pinned vs a DuckDB replay; an id ranked well by BOTH
    systems outranks one ranked well by only one."""
    import duckdb
    import pandas as pd

    from ccm_spark.pipeline.search import rrf_fuse

    lex = pd.DataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12), (1, 1, 20)],
        columns=["query_id", "rank", "doc_id"],
    )
    vec = pd.DataFrame(
        [(0, 1, 11), (0, 2, 13), (0, 3, 10), (1, 1, 21)],
        columns=["query_id", "rank", "doc_id"],
    )
    a = spark.createDataFrame(lex, "query_id long, rank int, doc_id long")
    b = spark.createDataFrame(vec, "query_id long, rank int, doc_id long")
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.rrf_score)
        for r in rrf_fuse([a, b], k=60, top_k=5).collect()
    )
    duckdb.register("rrf_lex", lex)
    duckdb.register("rrf_vec", vec)
    want = sorted(
        (int(q), int(rk), int(d), float(s))
        for q, rk, d, s in duckdb.sql(
            """
WITH u AS (
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c FROM rrf_lex
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS c FROM rrf_vec
),
f AS (
  SELECT query_id, doc_id, round(sum(c), 9) AS s FROM u GROUP BY 1, 2
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rk,
       doc_id, s
FROM f QUALIFY rk <= 5
"""
        ).fetchall()
    )
    assert got == want
    # doc 11 (ranks 2+1) beats doc 10 (rank 1 lexical only) for query 0
    by_rank = {r[1]: r[2] for r in got if r[0] == 0}
    assert by_rank[1] == 11


def test_hybrid_search_rrf_matches_duckdb_twin(spark, sf_small):
    """End-to-end hybrid retrieval (r14-staged candidate, QUERIES.md):
    bm25 over each query doc's leading tokens + cosine over its
    embedding (doc_id == vec_id), fused by RRF — the twin nests BOTH
    ranker chains verbatim (the bm25 chain through its new query-source
    hook) and re-derives the fusion; non-vacuity pins that the fusion
    actually mixes the two sources rather than echoing either."""
    import duckdb

    from ccm_spark.pipeline.search import bm25_topk, hybrid_search_rrf
    from ccm_spark.plans.oracle_sql_ext import sql_hybrid_search_rrf

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    embs = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    out = hybrid_search_rrf(docs, embs, n_queries=20, k_each=10, top_k=10)
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.rrf_score) for r in out.collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_small}/{t}.parquet')"
        )
    want = sorted(
        (int(a), int(b), int(c), float(d))
        for a, b, c, d in con.sql(
            sql_hybrid_search_rrf(n_queries=20, k_each=10, top_k=10)
        ).fetchall()
    )
    assert len(got) == len(want) > 0
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:5]
    # non-vacuity: the fused list is a real MIX — some fused hit has
    # two contributions (appears in both rankers' top-k), and some has
    # exactly one (each source surfaces docs the other misses)
    two = [r for r in got if r[3] > 1.0 / 61.0 + 1e-12]
    one = [r for r in got if r[3] <= 1.0 / (60.0 + 1.0)]
    assert two and one
    # and the fusion is not just bm25 re-emitted: for at least one
    # query the fused top-1 differs from the lexical top-1
    from ccm_spark.functions.hashing import tokens_col
    from pyspark.sql import functions as F

    qdf = docs.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens_col("text"), 1, 8), " ").alias("text"),
    )
    lex_rows = bm25_topk(docs, qdf, k=3).where("doc_id != query_id").collect()
    lex1: dict = {}
    for r in sorted(lex_rows, key=lambda r: (r.query_id, r.rank)):
        lex1.setdefault(r.query_id, r.doc_id)  # best surviving lexical hit
    fused1 = {r[0]: r[2] for r in got if r[1] == 1}
    assert any(fused1[q] != lex1.get(q) for q in fused1)


def test_hybrid_search_rrf_plan_shape(spark, sf_small):
    """Every join in the hybrid plan is a broadcast hash join (the tiny
    query relations into the corpus-sized postings), and nothing plans
    a cartesian / nested-loop / sort-merge join — the shapes that would
    not survive a 100 TB corpus."""
    from ccm_spark.pipeline.search import hybrid_search_rrf

    out = hybrid_search_rrf(
        spark.read.parquet(f"{sf_small}/documents.parquet"),
        spark.read.parquet(f"{sf_small}/embeddings.parquet"),
        n_queries=20,
        k_each=10,
        top_k=10,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for bad in ("CartesianProduct", "SortMergeJoin", "BroadcastNestedLoop"):
        assert bad not in plan, bad
