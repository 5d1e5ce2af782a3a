"""Bigram-LM perplexity scoring: counts pinned vs DuckDB, the
distributed score pinned bit-exact vs the shared Python kernel, plus the
statistical sanity CCNet-style filtering stands on (fluent text scores
far below gibberish under a reference-trained model)."""

from __future__ import annotations

import duckdb
import pytest

from ccm_spark.functions.hashing import py_tokens, sql_tokens
from ccm_spark.pipeline.lm import (
    perplexity,
    perplexity_buckets,
    score_model,
    train_bigram_lm,
)
from ccm_spark.sources.tables import load_table


def test_ngram_counts_match_duckdb(spark, sf_small):
    from ccm_spark.pipeline.lm import ngram_counts

    docs = load_table(spark, sf_small, "documents")
    uni, bi = ngram_counts(docs)
    got_uni = sorted((r.token, r.n) for r in uni.collect())
    got_bi = sorted((r.w1, r.w2, r.n) for r in bi.collect())
    want_uni = sorted(
        (t, int(n))
        for t, n in duckdb.sql(
            f"""
WITH t AS (SELECT {sql_tokens('text')} AS toks
           FROM read_parquet('{sf_small}/documents.parquet')),
u AS (SELECT unnest(toks) AS token FROM t WHERE len(toks) > 0)
SELECT token, count(*) FROM u GROUP BY 1"""
        ).fetchall()
    )
    want_bi = sorted(
        (a, b, int(n))
        for a, b, n in duckdb.sql(
            f"""
WITH t AS (SELECT {sql_tokens('text')} AS toks
           FROM read_parquet('{sf_small}/documents.parquet')),
p AS (SELECT list_extract(toks, i) AS w1, list_extract(toks, i + 1) AS w2
      FROM (SELECT toks, unnest(range(1, len(toks))) AS i
            FROM t WHERE len(toks) > 1))
SELECT w1, w2, count(*) FROM p GROUP BY 1, 2"""
        ).fetchall()
    )
    assert got_uni == want_uni
    assert got_bi == want_bi


def test_perplexity_matches_python_replay(spark, sf_small):
    """The distributed Arrow pass must reproduce the shared score_model
    kernel bit-for-bit on every doc — including the vocab/bigram caps'
    deterministic tie-breaks (small caps force real <unk> folding and
    real bigram-table misses)."""
    docs = load_table(spark, sf_small, "documents")
    # the synthetic sf0.001 corpus draws from a ~31-token vocabulary, so
    # caps below that force real <unk> folding and bigram-table misses
    model = train_bigram_lm(docs, vocab_size=20, max_bigrams=150)
    # training is deterministic end to end
    again = train_bigram_lm(docs, vocab_size=20, max_bigrams=150)
    assert model == again
    assert len(model["vocab"]) == 20 and len(model["bigrams"]) == 150
    assert model["unk_count"] > 0  # caps actually bind on this corpus

    got = {
        r.doc_id: (r.n_scored, r.cross_entropy, r.perplexity)
        for r in perplexity(docs, model).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(rows)
    for r in rows:
        n, h, ppl = score_model(model, py_tokens(r.text))
        want = (0, None, None) if n == 0 else (n, round(h, 6), round(ppl, 6))
        assert got[r.doc_id] == want, r.doc_id


def test_reference_like_text_beats_gibberish(spark):
    """The point of the filter: a document drawn from the reference
    distribution scores an order of magnitude lower perplexity than
    shuffled-alphabet gibberish under the reference-trained model."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps near the warm fire and the dog watches the road "
    )
    ref = [(i, base * 5) for i in range(20)]
    docs = spark.createDataFrame(ref, "doc_id long, text string")
    model = train_bigram_lm(docs, vocab_size=100, max_bigrams=1_000)
    probe = spark.createDataFrame(
        [
            (0, base),
            (1, "zxq vbnk wpl qrtd mnzx bvkq plwz dtrq xkzn qvbm wlpz"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in perplexity(probe, model).collect()}
    assert out[0].perplexity * 10 < out[1].perplexity
    assert out[2].perplexity is None and out[2].n_scored == 0


def test_perplexity_buckets_partition_and_order(spark, sf_small):
    """head/middle/tail: ~1/3 each within histogram-bin granularity,
    ordered by score, deterministic, NULL-scored docs get NULL bucket,
    and membership is partitioning-invariant."""
    docs = load_table(spark, sf_small, "documents")
    model = train_bigram_lm(docs, vocab_size=20, max_bigrams=150)
    scored = perplexity(docs, model)
    out = perplexity_buckets(scored).collect()
    n = len(out)
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for b in ("head", "middle", "tail"):
        assert 0.2 * n < len(by_bucket[b]) < 0.5 * n, (b, len(by_bucket[b]))
    assert max(r.cross_entropy for r in by_bucket["head"]) <= min(
        r.cross_entropy for r in by_bucket["middle"]
    ) + 10 ** -2  # boundary granularity = rounding step
    assert max(r.cross_entropy for r in by_bucket["middle"]) <= min(
        r.cross_entropy for r in by_bucket["tail"]
    ) + 10 ** -2
    alt = {
        r.doc_id: r.bucket
        for r in perplexity_buckets(
            perplexity(docs.repartition(7), model)
        ).collect()
    }
    assert alt == {r.doc_id: r.bucket for r in out}
    with pytest.raises(ValueError, match="fractions"):
        perplexity_buckets(scored, head_frac=0.7, middle_frac=0.5)


def test_perplexity_stream_equals_batch(spark, sf_small, tmp_path):
    """Scoring is a narrow pass, so a streaming source must score to
    exactly the batch rows — crawl shards scored at ingestion time."""
    import shutil

    docs = load_table(spark, sf_small, "documents")
    model = train_bigram_lm(docs, vocab_size=200, max_bigrams=1_000)
    batch = {
        r.doc_id: (r.n_scored, r.cross_entropy, r.perplexity)
        for r in perplexity(docs, model).collect()
    }
    src = tmp_path / "lm_stream_src"
    src.mkdir()
    shutil.copy(f"{sf_small}/documents.parquet", src / "part-0.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    out = perplexity(stream, model)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("lm_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_lm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_scored, r.cross_entropy, r.perplexity)
        for r in spark.sql("select * from lm_stream").collect()
    }
    assert got == batch


def test_train_rejects_unsmoothed_alpha(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    with pytest.raises(ValueError, match="alpha"):
        train_bigram_lm(docs, alpha=0.0)


def test_train_rejects_degenerate_caps(spark, sf_small):
    """r6 advice: max_bigrams=0 silently trained a bigram-free model —
    the guard's accepted domain must match its message (both caps >= 1)."""
    docs = load_table(spark, sf_small, "documents")
    with pytest.raises(ValueError, match="max_bigrams"):
        train_bigram_lm(docs, vocab_size=20, max_bigrams=0)
    with pytest.raises(ValueError, match="vocab_size"):
        train_bigram_lm(docs, vocab_size=0, max_bigrams=100)


def test_kn_perplexity_matches_duckdb_replay(spark, sf_small):
    """Interpolated Kneser-Ney end-to-end (train_kn_bigram_lm +
    perplexity) replayed in SQL at the gate geometry (vocab 1000 /
    bigrams 5000 / d=0.75) — the r10 gate candidate's evidence, pinned
    now at sf0.001. Exact float equality: the kernel's expression
    shapes mirror the twin term for term."""
    from ccm_spark.pipeline.lm import train_kn_bigram_lm
    from ccm_spark.plans.oracle_sql_ext import (
        LM_KN_DISCOUNT,
        LM_MAX_BIGRAMS,
        LM_VOCAB_SIZE,
        sql_lm_perplexity_kn,
    )

    docs = load_table(spark, sf_small, "documents")
    model = train_kn_bigram_lm(
        docs,
        vocab_size=LM_VOCAB_SIZE,
        max_bigrams=LM_MAX_BIGRAMS,
        discount=LM_KN_DISCOUNT,
    )
    got = {
        r.doc_id: (r.n_scored, r.cross_entropy, r.perplexity)
        for r in perplexity(docs, model).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = {
        int(d): (int(n), h if h is None else float(h), p if p is None else float(p))
        for d, n, h, p in con.sql(sql_lm_perplexity_kn()).fetchall()
    }
    assert len(got) == len(want) == 500
    mism = {d: (got[d], want[d]) for d in got if got[d] != want[d]}
    assert not mism, dict(list(mism.items())[:5])


def test_kn_fixes_the_san_francisco_effect(spark):
    """The reason KN exists: 'francisco' is MORE frequent than 'city'
    in unigrams but follows only one predecessor ('san'), so add-alpha
    (count-driven) scores it the more likely standalone token while
    KN's continuation distribution (diversity-driven) scores it the
    LESS likely one — the canonical reversal. Fluent text still beats
    gibberish under KN."""
    import math

    from ccm_spark.pipeline.lm import train_kn_bigram_lm

    rows = []
    for i in range(300):
        rows.append((i, "san francisco is nice"))
    for i in range(300, 400):
        rows.append((i, "the city is nice"))
    for i in range(400, 500):
        rows.append((i, "a city is nice"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kn = train_kn_bigram_lm(docs, vocab_size=100, max_bigrams=1000)
    aa = train_bigram_lm(docs, vocab_size=100, max_bigrams=1000, alpha=0.1)

    # counts: francisco 300 > city 200; predecessors: francisco {san},
    # city {the, a}
    assert kn["vocab"]["francisco"] > kn["vocab"]["city"]
    assert kn["n1p_bwd"]["francisco"] == 1 and kn["n1p_bwd"]["city"] == 2

    def h1(model, w):
        _, h, _ = score_model(model, [w])
        return h

    # add-alpha (unigram counts): francisco the more likely first token;
    # KN (continuation counts): city the more likely first token
    assert h1(aa, "francisco") < h1(aa, "city")
    assert h1(kn, "francisco") > h1(kn, "city")

    # fluent vs gibberish separation still holds under KN (the 8-word
    # toy vocab keeps the <unk> continuation floor high, so the margin
    # is smaller than the sf-corpus models'; ~2.9 bits/token here)
    _, h_fluent, _ = score_model(kn, py_tokens("the city is nice"))
    _, h_gib, _ = score_model(kn, py_tokens("zxq vprt qqj mlk wzzt"))
    assert math.isfinite(h_fluent) and h_gib - h_fluent > 2.5


def test_kn_model_sink_round_trip_scores_identically(spark, sf_small, tmp_path):
    """write_bigram_lm/read_bigram_lm on a KN model: the derived integer
    tables are recomputed at read from the lossless bigram table, so the
    loaded model scores bit-identically."""
    from ccm_spark.pipeline.lm import train_kn_bigram_lm
    from ccm_spark.sources.sinks import read_bigram_lm, write_bigram_lm

    docs = load_table(spark, sf_small, "documents")
    model = train_kn_bigram_lm(docs, vocab_size=200, max_bigrams=2000)
    write_bigram_lm(model, str(tmp_path / "kn_lm"))
    loaded = read_bigram_lm(spark, str(tmp_path / "kn_lm"))
    assert loaded["smoothing"] == "kn" and loaded["discount"] == model["discount"]
    a = {r.doc_id: (r.cross_entropy, r.perplexity)
         for r in perplexity(docs, model).collect()}
    b = {r.doc_id: (r.cross_entropy, r.perplexity)
         for r in perplexity(docs, loaded).collect()}
    assert a == b


def test_kn_conditional_distribution_sums_to_one_exactly(spark):
    """The KN identity the smoothing is built on: with the add-one
    continuation distribution, sum_w p(w | prev) over the full class
    space (vocab + <unk>) is EXACTLY 1 for every context — the
    discounted mass d*N1+(prev,.)/c_out(prev) re-enters through a
    continuation distribution that itself normalizes (each capped
    bigram type contributes to exactly one w2 class). Checked for every
    context with out-mass AND for the pure-backoff (dangling) case."""
    from ccm_spark.pipeline.lm import UNK, _score_kn, train_kn_bigram_lm

    rows = [(i, "the quick brown fox jumps over the lazy dog " * 2) for i in range(30)]
    rows += [(100 + i, "pack my box with five dozen liquor jugs") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kn = train_kn_bigram_lm(docs, vocab_size=50, max_bigrams=500)
    classes = list(kn["vocab"]) + [UNK]
    assert len(classes) == kn["n_classes"]

    def p(prev, w):
        return 2.0 ** -(_score_kn(kn, [prev, w]) - _score_kn(kn, [prev]))

    contexts = [c for c in classes if kn["c_out"].get(c)][:8]
    contexts.append("dog")  # sentence-final: no out-mass -> pure backoff
    for prev in contexts:
        total = sum(p(prev, w) for w in classes)
        assert abs(total - 1.0) < 1e-9, (prev, total)
