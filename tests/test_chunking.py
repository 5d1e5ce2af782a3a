"""Sliding-window chunking + winnowing fingerprints (pipeline/chunking.py)."""

import hashlib

import pyspark.sql.functions as F
import pytest

from ccm_spark.pipeline.chunking import (
    chunk_documents,
    winnow_fingerprints,
    winnow_matches,
)


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ------------------------------------------------------------- chunking


def test_chunk_documents_hand_built(spark):
    toks = [f"t{i}" for i in range(11)]
    d = docs_df(spark, [" ".join(toks), "short doc", ""])
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_documents(d, max_tokens=4, stride=3).collect()
    )
    # doc 0: n=11 -> ceil((11-4)/3)=3 -> chunks at 0,3,6,9 (last short)
    want0 = [
        (0, 0, 0, 4, "t0 t1 t2 t3"),
        (0, 1, 3, 4, "t3 t4 t5 t6"),
        (0, 2, 6, 4, "t6 t7 t8 t9"),
        (0, 3, 9, 2, "t9 t10"),
    ]
    assert [r for r in rows if r[0] == 0] == want0
    # doc 1 fits one window; doc 2 (empty) emits nothing
    assert [r for r in rows if r[0] == 1] == [(1, 0, 0, 2, "short doc")]
    assert not [r for r in rows if r[0] == 2]


def test_chunk_documents_covers_every_token(spark, sf_small):
    """Union of [start, start+len) must be exactly [0, n) per doc —
    no token dropped, no chunk past the end."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=32, stride=24)
    from ccm_spark.functions.hashing import tokens_col

    per_doc = chunks.groupBy("doc_id").agg(
        F.min("start_tok").alias("lo"),
        F.max(F.col("start_tok") + F.col("n_tokens")).alias("hi"),
        F.count("*").alias("n_chunks"),
        F.sum(
            F.when(F.col("n_tokens") <= 0, 1).otherwise(0)
        ).alias("bad_len"),
    )
    n_tok = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n")
    ).where(F.col("n") > 0)
    j = per_doc.join(n_tok, "doc_id")
    bad = j.where(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n")) | (F.col("bad_len") > 0)
    ).count()
    assert bad == 0
    assert j.count() == n_tok.count()
    # stride < max_tokens -> consecutive chunks overlap (non-vacuous)
    assert chunks.where("chunk_idx = 1").count() > 0


def test_chunk_documents_matches_duckdb_twin(spark, sf_small):
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_chunk_documents

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, max_tokens=32, stride=24).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(c), int(d), e)
        for a, b, c, d, e in con.sql(
            sql_chunk_documents(max_tokens=32, stride=24)
        ).fetchall()
    )
    assert len(got) == len(want)
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:3]


def test_chunk_documents_validates_params(spark):
    d = docs_df(spark, ["a b c"])
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, max_tokens=4, stride=5)
    with pytest.raises(ValueError, match=">= 1"):
        chunk_documents(d, max_tokens=0, stride=1)


def test_chunk_documents_rejects_dense_stride(spark):
    """stride << max_tokens inflates per-doc transient memory (every
    chunk string is built in one array before the generate) — the
    valve fails loudly below max_tokens/8 and admits exactly 8x."""
    d = docs_df(spark, ["a b c"])
    with pytest.raises(ValueError, match="transient memory"):
        chunk_documents(d, max_tokens=64, stride=7)
    # boundary: 8x overlap is still accepted (64/8 = 8 == stride)
    chunk_documents(d, max_tokens=64, stride=8).collect()


# ------------------------------------------------- sentence-bounded chunks


def test_chunk_by_sentences_hand_built(spark):
    """Prefix-bucket packing semantics: sentences stay whole, a chunk
    holds the sentences whose cumulative-before count lands in its
    bucket (overage bounded by the last sentence), an over-long
    sentence gets a bucket of its own and chunk_idx may skip."""
    from ccm_spark.pipeline.chunking import chunk_by_sentences
    from ccm_spark.pipeline.text import split_sentences

    d = docs_df(spark, ["a b c. d e. f g h i j k l m n o. p q."])
    rows = {
        r.chunk_idx: r for r in chunk_by_sentences(
            split_sentences(d), max_tokens=4
        ).collect()
    }
    # cum_before: s0=0 -> b0; s1=3 -> b0; s2=5 -> b1; s3=15 -> b3
    assert sorted(rows) == [0, 1, 3]  # bucket 2 skipped (long sentence)
    assert rows[0].chunk_text == "a b c. d e."
    assert (rows[0].n_sentences, rows[0].n_tokens) == (2, 5)
    assert rows[1].chunk_text == "f g h i j k l m n o."
    assert (rows[1].n_sentences, rows[1].n_tokens) == (1, 10)
    assert rows[3].chunk_text == "p q."
    assert (rows[3].n_sentences, rows[3].n_tokens) == (1, 2)


def test_chunk_by_sentences_validates_params(spark):
    import pytest

    from ccm_spark.pipeline.chunking import chunk_by_sentences
    from ccm_spark.pipeline.text import split_sentences

    d = docs_df(spark, ["a b."])
    with pytest.raises(ValueError, match=">= 1"):
        chunk_by_sentences(split_sentences(d), max_tokens=0)


def test_chunk_by_sentences_matches_duckdb_twin(spark, sf_small):
    """Full-chain twin (r14 rotation candidate, QUERIES.md): the shared
    SENT_INJECT_RE punctuation injection, sql_split_sentences nested
    via its source hook, same window/bucket arithmetic, sentences
    re-joined in sent_idx order — exact equality."""
    import duckdb

    from ccm_spark.pipeline.chunking import chunk_by_sentences
    from ccm_spark.pipeline.text import SENT_INJECT_RE, split_sentences
    from ccm_spark.plans.oracle_sql_ext import sql_chunk_by_sentences

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    sent_docs = docs.select(
        "doc_id",
        F.regexp_replace("text", SENT_INJECT_RE, r"$1. ").alias("text"),
    )
    out = chunk_by_sentences(split_sentences(sent_docs), max_tokens=32)
    got = sorted(
        (r.doc_id, r.chunk_idx, r.n_sentences, r.n_tokens, r.chunk_text)
        for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(c), int(d), e)
        for a, b, c, d, e in con.sql(
            sql_chunk_by_sentences(max_tokens=32)
        ).fetchall()
    )
    assert len(got) == len(want) > 0
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:3]
    # non-vacuous packing: some chunk holds >= 2 sentences AND some doc
    # produced >= 2 chunks
    assert any(r[2] >= 2 for r in got)
    from collections import Counter

    per_doc = Counter(r[0] for r in got)
    assert max(per_doc.values()) >= 2


def test_chunk_by_sentences_plan_shape(spark):
    """One shuffle for the per-doc running sum; the (doc_id, chunk)
    aggregate must REUSE the window's hash(doc_id) clustering — no
    second exchange between Window and HashAggregate."""
    from ccm_spark.pipeline.chunking import chunk_by_sentences
    from ccm_spark.pipeline.text import split_sentences

    d = docs_df(spark, ["a b. c d.", "e f. g h."])
    plan = (
        chunk_by_sentences(split_sentences(d), max_tokens=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # spread()'s explicit respread + the window's doc_id exchange; the
    # final aggregate adds none
    assert plan.count("Exchange") <= 2, plan


# ------------------------------------------------------------ winnowing


def py_winnow(tokens, k, w):
    """Driver-side replay of the winnowing selection (Schleimer et al.
    2003): min per w-window of 30-bit k-gram hashes, rightmost on ties."""
    grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    if len(tokens) < k:
        return set()
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % (1 << 30)
        for g in grams
    ]
    n = len(hs)
    sel = set()
    for j in range(max(0, n - w) + 1):
        win = hs[j : j + w]
        m = min(win)
        pos = max(i for i in range(j, min(j + w, n)) if hs[i] == m)
        sel.add((pos, hs[pos]))
    return sel


def test_winnow_matches_python_replay(spark):
    from ccm_spark.functions.hashing import py_tokens

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b c d e f g h i j k l m n o p",
        "one two three",  # fewer grams than w -> single short window
        "x",              # fewer tokens than k -> nothing
        "w w w w w w w w",  # constant grams -> tie rule exercised
    ]
    d = docs_df(spark, texts)
    got = {}
    for r in winnow_fingerprints(d, k=3, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    want = {
        i: py_winnow(py_tokens(t), 3, 4)
        for i, t in enumerate(texts)
        if py_winnow(py_tokens(t), 3, 4)
    }
    assert got == want


def test_winnow_guarantee_shared_run(spark):
    """The MOSS guarantee: two docs sharing a token run of length
    >= w + k - 1 must share at least one fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= 4+5-1
    d = docs_df(
        spark,
        [
            f"unrelated prefix words here {shared} and a suffix",
            f"{shared} entirely different tail content follows now",
        ],
    )
    fps = winnow_fingerprints(d, k=5, w=4)
    a = {r.gram_hash for r in fps.where("doc_id = 0").collect()}
    b = {r.gram_hash for r in fps.where("doc_id = 1").collect()}
    assert a & b


def test_winnow_fingerprints_matches_duckdb_twin(spark, sf_small):
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_winnow_fingerprints

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(
        (r.doc_id, r.pos, r.gram_hash)
        for r in winnow_fingerprints(docs, k=5, w=4).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(c))
        for a, b, c in con.sql(sql_winnow_fingerprints(k=5, w=4)).fetchall()
    )
    assert len(got) == len(want) and got == want


def test_winnow_matches_finds_planted_overlap(spark):
    """winnow_matches flags the planted pair and the boilerplate valve
    suppresses a fingerprint shared by every doc."""
    shared = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    boiler = "standard footer text appears in every single document here"
    texts = [f"doc {i} unique words number{i} {boiler}" for i in range(6)]
    texts.append(f"first plagiarised copy starts {shared} then diverges one way")
    texts.append(f"second plagiarised copy has {shared} and its own ending too")
    d = docs_df(spark, texts)
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_matches(
            d, k=5, w=4, min_shared=1, max_df=3
        ).collect()
    }
    assert (6, 7) in pairs
    # the footer is in all 6 boilerplate docs > max_df -> no pair among them
    assert not any(a < 6 and b < 6 for a, b in pairs)


def test_winnow_matches_plan_cuts_fingerprint_fanout(spark):
    """The fingerprint relation feeds four subtrees (df_counts + both
    self-join sides); the localCheckpoint must cut the tokenize ->
    gram-explode -> rolling-window lineage so it materialises ONCE per
    action: the executed plan scans a checkpointed RDD and contains no
    copy of the window/generate chain (r12 advice — the filters.py
    anchor-relation fix applied here)."""
    d = docs_df(spark, [f"w{i} " * 20 for i in range(4)])
    plan = (
        winnow_matches(d, k=3, w=4, min_shared=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan ExistingRDD" in plan
    # the rolling-min window and the gram explode live ABOVE the cut only
    assert "Window" not in plan
    assert "Generate" not in plan


# ------------------------------------------------- property tests (pure py)


from hypothesis import given, settings
from hypothesis import strategies as st


def _chunk_layout(n, max_tokens, stride):
    """Pure-Python replica of the chunk-count/start/length arithmetic
    (the Spark expression and the DuckDB twin both implement exactly
    this; the twin-parity test pins them to each other, this pins the
    arithmetic itself)."""
    if n <= 0:
        return []
    k_last = 0 if n <= max_tokens else (n - max_tokens + stride - 1) // stride
    return [
        (k, k * stride, min(max_tokens, n - k * stride)) for k in range(k_last + 1)
    ]


@given(
    n=st.integers(min_value=0, max_value=5_000),
    max_tokens=st.integers(min_value=1, max_value=512),
    frac=st.integers(min_value=1, max_value=512),
)
@settings(max_examples=300, deadline=None)
def test_chunk_layout_properties(n, max_tokens, frac):
    stride = max(1, min(max_tokens, frac))
    chunks = _chunk_layout(n, max_tokens, stride)
    if n == 0:
        assert chunks == []
        return
    # every token covered, no chunk empty or past the end, starts strided
    assert chunks[0][1] == 0
    assert all(length >= 1 for _, _, length in chunks)
    assert all(start + length <= n for _, start, length in chunks)
    covered = set()
    for _, start, length in chunks:
        covered.update(range(start, start + length))
    assert covered == set(range(n))
    # consecutive chunks overlap by exactly max_tokens - stride (except
    # possibly the short last chunk, which still starts on the stride)
    assert all(
        chunks[i + 1][1] - chunks[i][1] == stride for i in range(len(chunks) - 1)
    )


@given(
    data=st.data(),
    k=st.integers(min_value=1, max_value=4),
    w=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=150, deadline=None)
def test_winnow_guarantee_property(data, k, w):
    """The winnowing guarantee, property-tested on the driver-side
    replay kernel (which the DuckDB twin-parity test pins to the
    engine): any shared token run of length >= w + k - 1 yields a
    shared fingerprint."""
    vocab = [f"v{i}" for i in range(12)]
    run_len = w + k - 1
    shared = data.draw(
        st.lists(st.sampled_from(vocab), min_size=run_len, max_size=run_len + 4)
    )
    pre_a = data.draw(st.lists(st.sampled_from(vocab), max_size=8))
    suf_a = data.draw(st.lists(st.sampled_from(vocab), max_size=8))
    pre_b = data.draw(st.lists(st.sampled_from(vocab), max_size=8))
    suf_b = data.draw(st.lists(st.sampled_from(vocab), max_size=8))
    a = {h for _, h in py_winnow(pre_a + shared + suf_a, k, w)}
    b = {h for _, h in py_winnow(pre_b + shared + suf_b, k, w)}
    assert a & b


def test_winnow_matches_matches_duckdb_twin(spark, sf_small):
    """Full-chain twin: fingerprints nested verbatim, same df valve,
    same pair rule — min_shared=1 so the synthetic corpus (low natural
    overlap) still yields a non-vacuous pair set."""
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_winnow_matches

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(
        (r.doc_a, r.doc_b, r.n_shared)
        for r in winnow_matches(
            docs, k=3, w=4, min_shared=1, max_df=50
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(c))
        for a, b, c in con.sql(
            sql_winnow_matches(k=3, w=4, min_shared=1, max_df=50)
        ).fetchall()
    )
    assert got == want
    assert got, "fixture yielded no shared fingerprints — vacuous twin"


def _sentence_pack(token_counts, max_tokens):
    """Pure-Python replica of chunk_by_sentences' prefix-bucket rule:
    sentence i goes to bucket cum_before // max_tokens."""
    out, cum = [], 0
    for n in token_counts:
        out.append(cum // max_tokens)
        cum += n
    return out


@given(
    counts=st.lists(st.integers(min_value=1, max_value=64), max_size=200),
    max_tokens=st.integers(min_value=1, max_value=128),
)
@settings(max_examples=300, deadline=None)
def test_sentence_pack_properties(counts, max_tokens):
    """The prefix-bucket invariants the operator's docstring promises:
    buckets are non-decreasing (sentence order preserved), every
    sentence is assigned exactly once, each bucket's total stays under
    max_tokens + its LAST sentence's length, and a bucket is skipped
    only when an over-long sentence jumps the cursor past it."""
    b = _sentence_pack(counts, max_tokens)
    assert len(b) == len(counts)
    assert all(x <= y for x, y in zip(b, b[1:]))  # non-decreasing
    totals, last = {}, {}
    for n, k in zip(counts, b):
        totals[k] = totals.get(k, 0) + n
        last[k] = n
    for k, tot in totals.items():
        assert tot < max_tokens + last[k]
    # gap rule: a skipped bucket implies the previous sentence overshot
    ks = sorted(totals)
    for a, c in zip(ks, ks[1:]):
        if c > a + 1:
            assert totals[a] > max_tokens * (c - a - 1)
