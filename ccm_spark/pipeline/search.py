"""Lexical (BM25) search over the document corpus — the keyword-side
complement to the embedding ANN family in :mod:`pipeline.similarity`.

A training-data pipeline needs lexical retrieval wherever embeddings are
unavailable or wrong for the job: eval-set leakage hunts beyond exact
n-grams ("find every document that looks like this benchmark question"),
targeted corpus audits, and hybrid (lexical + vector) retrieval for data
curation. No reference analogue (SURVEY.md §2.1 — the reference has no
text surface); part of the driver-mandated extension.

Scoring is Robertson/Sparck-Jones BM25:
    score(q, d) = sum_{t in q} idf(t) * tf * (k1 + 1)
                                / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)     [always > 0]

Scale shape: the inverted-index relation (term, doc_id, tf) comes from
one explode + one map-side-combined aggregate (term skew absorbed by the
per-(doc, term) pre-aggregate, exactly like ``text.vocab_topk``); the
query relation is tiny and BROADCAST into the postings join, so the only
corpus-sized shuffles are the index build itself; per-query top-k uses
the two-phase local-then-global rank so a stopword-laden query matching
half the corpus never lands on one task. All heavy arithmetic is
JVM-side codegen (no UDFs); scores round at 6. Spark's ``ln`` and a
reference replay can differ in the last ulp, so tests pin scores to 1e-9
tolerance and everything integer (tf, df, dl, ranks) exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.functions.hashing import tokens_col
from ccm_spark.functions.partitioning import spread


def bm25_index(docs: DataFrame) -> dict:
    """Build the BM25 relations once for many queries:
    ``postings`` (term, doc_id, tf, dl) — the document length is
    DENORMALISED into every posting at build time; ``doc_lens``
    (doc_id, dl) is still returned for callers that want it, plus the
    corpus scalars N and avgdl (two driver doubles — the only collect).
    The returned dict feeds :func:`bm25_topk`; persist ``postings``
    yourself if you will issue many query batches.

    r15 plan shape: ``dl`` is computed as ``size(tokens)`` BEFORE the
    explode and carried through the tf aggregate as a grouping column
    (functionally dependent on doc_id, so the grouping is unchanged) —
    identical values to counting exploded rows, but the per-doc length
    aggregate and the corpus-sized doc_id join the r14 plan paid are
    gone: one explode pass builds the whole postings relation. The
    N/avgdl scalars likewise come from a map-only ``size(tokens)``
    projection (docs with zero tokens excluded, matching the explode
    semantics), not from re-exploding the corpus."""
    # tokenize BELOW the spread exchange so the array is a materialized
    # column above it — size() and explode() then read the same array
    # instead of each re-running the regex split over the text
    d = spread(docs.select("doc_id", tokens_col("text").alias("toks")), "doc_id")
    occ = d.select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    postings = occ.groupBy("term", "doc_id", "dl").agg(
        F.count("*").alias("tf")
    )
    doc_lens = docs.select(
        "doc_id", F.size(tokens_col("text")).alias("dl")
    ).where(F.col("dl") > 0)
    row = doc_lens.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    if row.n == 0:
        raise ValueError("bm25_index: corpus has no tokenized documents")
    return {
        "postings": postings,
        "doc_lens": doc_lens,
        "n_docs": int(row.n),
        "avgdl": float(row.avgdl),
    }


def bm25_topk(
    docs_or_index,
    queries: list[str] | DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query by BM25: (query_id, rank, doc_id,
    score). ``queries`` is a list of query strings (query_id = list
    position) or a (query_id, text) DataFrame; duplicate terms within a
    query count once (the standard bag-of-distinct-terms form).
    ``docs_or_index`` is either the documents DataFrame or a prebuilt
    :func:`bm25_index` dict. Ties rank by doc_id asc; scores round at 6.
    """
    if isinstance(docs_or_index, dict):
        idx = docs_or_index
        postings = idx["postings"]
        n_docs, avgdl = idx["n_docs"], idx["avgdl"]
        spark = postings.sparkSession
    else:
        docs = docs_or_index
        spark = docs.sparkSession
        postings = None
    if isinstance(queries, list):
        qdf = spark.createDataFrame(
            list(enumerate(queries)), "query_id long, text string"
        )
    else:
        qdf = queries
    q_terms = qdf.select(
        "query_id", F.explode(tokens_col("text")).alias("term")
    ).distinct()
    uniq_terms = q_terms.select("term").distinct()

    if postings is None:
        # inline build (r15 plan shape): the corpus scalars come from a
        # map-only size(tokens) pass, and the query-term semi-join is
        # pushed BELOW the tf aggregate — only postings of query terms
        # are ever aggregated, so serving is ONE explode pass over the
        # corpus instead of the r14 plan's four (postings, doc_lens,
        # and both again for the df branch). tf/dl/df values are
        # unchanged: filtering by term before the (term, doc) count
        # drops whole groups, never rows within a kept group.
        doc_lens = docs.select(
            "doc_id", F.size(tokens_col("text")).alias("dl")
        ).where(F.col("dl") > 0)
        row = doc_lens.agg(
            F.count("*").alias("n"), F.avg("dl").alias("avgdl")
        ).collect()[0]
        if row.n == 0:
            raise ValueError("bm25_topk: corpus has no tokenized documents")
        n_docs, avgdl = int(row.n), float(row.avgdl)
        d = spread(
            docs.select("doc_id", tokens_col("text").alias("toks")), "doc_id"
        )
        occ = d.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        postings = (
            occ.join(F.broadcast(uniq_terms), "term", "left_semi")
            .groupBy("term", "doc_id", "dl")
            .agg(F.count("*").alias("tf"))
        )
    else:
        postings = postings.join(F.broadcast(uniq_terms), "term", "left_semi")

    # df for the query terms from the relation already in hand: a
    # map-side-combined groupBy over the (already term-filtered)
    # postings, broadcast back on — query-vocabulary-bounded. The r15
    # window form (count over Window.partitionBy(term)) buffered every
    # posting of a term in ONE task: for a stopword query term against
    # a 100 TB index that is a single-task skew/memory hotspot (ADVICE
    # r15 #1); the groupBy keeps partial aggregation and ALSO drops the
    # hash(term) exchange of the matched postings the window forced.
    # The df branch re-reads the postings aggregate's shuffle
    # (ReusedExchange — canonically the same subtree), so the corpus is
    # still tokenized once; values unchanged: postings holds one row
    # per (term, doc), so count(*) per term IS the document frequency.
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    matched = postings.join(F.broadcast(dfreq), "term").join(
        F.broadcast(q_terms), "term"
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(contrib), 6).alias("score")
    )
    # two-phase top-k: a stopword query matches most of the corpus, so
    # prune each partition to its local k before the per-query rank
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    local_w = Window.partitionBy("split_id", "query_id").orderBy(*order)
    survivors = (
        scored.withColumn("split_id", F.spark_partition_id())
        .withColumn("lr", F.row_number().over(local_w))
        .where(F.col("lr") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"), "doc_id", "score"
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of several per-query
    rankings — the standard HYBRID retrieval combiner (e.g.
    :func:`bm25_topk` + an ANN top-k over the same ids): each input
    contributes ``1 / (k + rank)`` per (query, id), summed scores
    re-rank. Rank-based, so incomparable score scales (BM25 vs cosine)
    fuse without calibration; k=60 is the paper's default damping.

    Inputs are (query_id, rank, <id_col>, ...) relations; an id missing
    from one ranking simply contributes nothing (no outer-join NULL
    handling needed — union semantics). Ties break by id asc. All
    JVM-side: one union, one sum aggregate, one per-query rank window
    over at most ``sum(len(inputs))`` rows per query — the inputs are
    already top-k-bounded, so this never touches corpus-sized data."""
    if not rankings:
        raise ValueError("rrf_fuse: at least one ranking required")
    parts = [
        r.select(
            "query_id",
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("contrib"),
        )
        for r in rankings
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    fused = allp.groupBy("query_id", id_col).agg(
        F.round(F.sum("contrib"), 9).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), id_col, "rrf_score")
    )


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    n_queries: int = 20,
    k_each: int = 10,
    top_k: int = 10,
    q_tokens: int = 8,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """End-to-end HYBRID retrieval — the more-like-this audit query a
    curation pipeline runs per seed document ("find everything that
    resembles this benchmark item / this flagged doc"): for every query
    doc (id < ``n_queries``, the corpus convention ``doc_id == vec_id``
    pairing each document with its embedding row), fuse

    - a LEXICAL ranking — :func:`bm25_topk` over the full corpus with
      the query doc's leading ``q_tokens`` tokens as the query (the
      shared whitespace tokenizer, so both engines derive the same
      query string), self-hit rows dropped AFTER ranking (other docs'
      ranks keep their bm25_topk values); and
    - a VECTOR ranking — :func:`~ccm_spark.pipeline.similarity.
      cosine_topk` over the embeddings (self-excluded by construction),

    with :func:`rrf_fuse` (k=60): rank-based fusion needs no score
    calibration between BM25 and cosine scales. Per (query, doc) at
    most TWO contributions sum — a single IEEE addition, so the fused
    score is bit-identical across engines before its round-9 (the
    associativity caveat starts at three sources).

    100 TB shape: the corpus-sized work is exactly the two rankers'
    (each already bounded — broadcast queries into the postings join,
    one matmul pass over the embeddings); the fusion itself touches
    only their top-k outputs: ≤ 2 · n_queries · k_each rows.
    """
    from ccm_spark.functions.hashing import tokens_col
    from ccm_spark.pipeline.similarity import cosine_topk

    if n_queries < 1 or k_each < 1 or top_k < 1 or q_tokens < 1:
        raise ValueError("hybrid_search_rrf: all geometry params must be >= 1")
    qdf = docs.where(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens_col("text"), 1, q_tokens), " ").alias(
            "text"
        ),
    )
    lex = bm25_topk(docs, qdf, k=k_each, k1=k1, b=b).where(
        F.col("doc_id") != F.col("query_id")
    )
    vec = cosine_topk(embeddings, n_queries=n_queries, k=k_each).select(
        "query_id", "rank", F.col("target_id").alias("doc_id")
    )
    return rrf_fuse([lex, vec], top_k=top_k)
