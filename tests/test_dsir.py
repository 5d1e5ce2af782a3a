"""DSIR-style data selection (pipeline/dsir.py) — extension surface
(the reference has no text layer, SURVEY.md §2.1).

Pins: n-gram count semantics (multiplicity, short-doc empties), the
target-likeness direction of the weights, Gumbel top-k determinism,
partitioning invariance, and the DuckDB replay of the whole weight
chain at sf0.001."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from ccm_spark.pipeline.dsir import (
    dsir_log_weights,
    dsir_resample,
    ngram_feature_counts,
)


def test_ngram_counts_multiplicity_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b a"), (1, "solo"), (2, "")],
        "doc_id long, text string",
    )
    rows = ngram_feature_counts(docs, n=2).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.cnt)
    # doc 0 grams: 'a b','b a','a b','b a' -> two features, count 2 each
    assert sorted(by_doc[0]) == [2, 2]
    # < n tokens -> no rows, not a crash
    assert 1 not in by_doc and 2 not in by_doc


def test_dsir_weights_prefer_target_like_docs(spark):
    target = spark.createDataFrame(
        [(100 + i, "physics equations and quantum theory papers") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (0, "physics equations and quantum theory notes"),   # target-like
            (1, "cheap shoes cheap shoes buy now buy now"),      # not
            (2, "quantum theory papers on physics equations"),   # target-like
            (3, "yy"),                                           # featureless
        ],
        "doc_id long, text string",
    )
    w = {r.doc_id: r.log_w for r in dsir_log_weights(raw, target).collect()}
    assert w[0] > w[1] and w[2] > w[1]
    assert w[3] == 0.0
    # partitioning invariance (round-6 boundary discipline)
    w2 = {
        r.doc_id: r.log_w
        for r in dsir_log_weights(raw.repartition(5), target.repartition(3)).collect()
    }
    assert w2 == w

    # Gumbel top-k: deterministic, sized, and favoring heavy weights
    sel = dsir_resample(dsir_log_weights(raw, target), k=2, seed=7)
    ids = {r.doc_id for r in sel.collect()}
    assert len(ids) == 2 and 1 not in ids
    ids2 = {r.doc_id for r in dsir_resample(dsir_log_weights(raw, target), k=2, seed=7).collect()}
    assert ids2 == ids
    with pytest.raises(ValueError, match="k must be"):
        dsir_resample(dsir_log_weights(raw, target), k=0)


def test_dsir_weights_match_duckdb_replay(spark, sf_small):
    """The whole weight chain replayed in SQL on the sf0.001 documents
    table (target = doc_id % 10 == 0): hashed n-gram histograms,
    smoothed log-ratios, per-doc dot products — the twin a future gate
    rotation would use."""
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_dsir_log_weights

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    target = docs.where(F.col("doc_id") % 10 == 0)
    raw = docs.where(F.col("doc_id") % 10 != 0)
    got = {r.doc_id: r.log_w for r in dsir_log_weights(raw, target).collect()}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = {int(d): float(v) for d, v in con.sql(sql_dsir_log_weights()).fetchall()}
    assert len(got) == len(want) == 450
    mism = {d: (got[d], want[d]) for d in got if got[d] != want[d]}
    assert not mism, dict(list(mism.items())[:5])


# ------------------------------------------------------ corpus divergence


def test_corpus_divergence_identical_corpora_is_zero(spark):
    from ccm_spark.pipeline.dsir import corpus_divergence

    d = spark.createDataFrame(
        [(0, "a b c a"), (1, "c b a")], "doc_id long, text string"
    )
    r = corpus_divergence(d, d).collect()[0]
    assert r.kl_ab_bits == 0.0 and r.kl_ba_bits == 0.0 and r.js_bits == 0.0
    assert r.vocab_shared == r.vocab_union == 3
    assert r.n_tokens_a == r.n_tokens_b == 7


def test_corpus_divergence_matches_python_replay(spark):
    """Exact replay of the smoothed KL/JS arithmetic on a corpus pair
    with partial vocabulary overlap."""
    import math

    from ccm_spark.pipeline.dsir import corpus_divergence

    a_texts = ["x x y z", "x y"]
    b_texts = ["y z z w", "w w w"]
    da = spark.createDataFrame(
        [(i, t) for i, t in enumerate(a_texts)], "doc_id long, text string"
    )
    db = spark.createDataFrame(
        [(i, t) for i, t in enumerate(b_texts)], "doc_id long, text string"
    )
    r = corpus_divergence(da, db, alpha=0.5).collect()[0]

    from collections import Counter

    ca = Counter(" ".join(a_texts).split())
    cb = Counter(" ".join(b_texts).split())
    vocab = sorted(set(ca) | set(cb))
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    pa = {t: (ca[t] + 0.5) / (na + 0.5 * v) for t in vocab}
    pb = {t: (cb[t] + 0.5) / (nb + 0.5 * v) for t in vocab}
    kl_ab = sum(pa[t] * math.log2(pa[t] / pb[t]) for t in vocab)
    kl_ba = sum(pb[t] * math.log2(pb[t] / pa[t]) for t in vocab)
    js = sum(
        0.5 * pa[t] * math.log2(pa[t] / ((pa[t] + pb[t]) / 2))
        + 0.5 * pb[t] * math.log2(pb[t] / ((pa[t] + pb[t]) / 2))
        for t in vocab
    )
    assert r.n_tokens_a == na and r.n_tokens_b == nb
    assert r.vocab_union == v and r.vocab_shared == len(set(ca) & set(cb))
    assert abs(r.kl_ab_bits - kl_ab) < 1e-6
    assert abs(r.kl_ba_bits - kl_ba) < 1e-6
    assert abs(r.js_bits - js) < 1e-6
    # KL is asymmetric on asymmetric corpora; JS is bounded by 1 bit
    assert r.kl_ab_bits != r.kl_ba_bits
    assert 0.0 < r.js_bits < 1.0


def test_corpus_divergence_matches_duckdb_twin(spark, sf_small):
    """Cross-engine pin on the parity-split fixture (the r12 gate
    candidate's evidence, QUERIES.md)."""
    import duckdb

    from ccm_spark.pipeline.dsir import corpus_divergence
    from ccm_spark.plans.oracle_sql_ext import sql_corpus_divergence

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    r = corpus_divergence(
        docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    ).collect()[0]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    w = con.sql(sql_corpus_divergence()).fetchall()[0]
    got = (
        r.n_tokens_a, r.n_tokens_b, r.vocab_a, r.vocab_b,
        r.vocab_shared, r.vocab_union,
        r.kl_ab_bits, r.kl_ba_bits, r.js_bits,
    )
    want = (
        int(w[0]), int(w[1]), int(w[2]), int(w[3]), int(w[4]), int(w[5]),
        float(w[6]), float(w[7]), float(w[8]),
    )
    assert got == want
    # same-generator halves: tiny but nonzero drift
    assert 0.0 < r.js_bits < 0.2
