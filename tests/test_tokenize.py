"""Wordpiece tokenization: greedy semantics, corpus-scale replay, vocab
determinism."""

from __future__ import annotations

import pytest

from ccm_spark.functions.hashing import py_tokens, py_wordpiece
from ccm_spark.pipeline.tokenize import (
    UNK_ID,
    build_wordpiece_vocab,
    tokenize_docs,
)
from ccm_spark.sources.tables import load_table


def test_py_wordpiece_greedy_semantics():
    v = {"un": 1, "##aff": 2, "##able": 3, "##a": 4, "##f": 5, "the": 6}
    assert py_wordpiece("unaffable", v) == [1, 2, 3]
    # greedy longest-first backs off per position
    assert py_wordpiece("unafable", v) == [1, 4, 5, 3]
    assert py_wordpiece("the", v) == [6]
    # any position without a match collapses the WHOLE word to unk
    assert py_wordpiece("zzz", v) == [UNK_ID]
    assert py_wordpiece("thez", v) == [UNK_ID]


def test_tokenize_docs_matches_python_replay(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").where("doc_id % 7 = 0")
    vocab = build_wordpiece_vocab(docs, size=300)
    out = {r.doc_id: r for r in tokenize_docs(docs, vocab).collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(out) == set(texts)
    n_checked_pieces = 0
    for doc_id, text in texts.items():
        words = py_tokens(text)
        want_ids: list[int] = []
        n_oov = 0
        for w in words:
            pid = py_wordpiece(w, vocab, UNK_ID)
            if pid == [UNK_ID]:
                n_oov += 1
            want_ids.extend(pid)
        r = out[doc_id]
        assert list(r.token_ids) == want_ids
        assert (r.n_words, r.n_pieces) == (len(words), len(want_ids))
        assert abs(r.oov_frac - (round(n_oov / len(words), 6) if words else 0.0)) < 1e-12
        n_checked_pieces += len(want_ids)
    assert n_checked_pieces > 3_000  # the replay actually covered content
    # charset fallback: in-charset words never go unk, so corpus oov ~ 0
    assert sum(r.oov_frac for r in out.values()) / len(out) < 0.05


def test_vocab_is_deterministic_and_partitioning_invariant(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    a = build_wordpiece_vocab(docs, size=100)
    b = build_wordpiece_vocab(docs.repartition(7), size=100)
    assert a == b
    # ids are dense from 1 with 0 reserved for unk
    assert sorted(a.values()) == list(range(1, len(a) + 1))


def test_tokenize_streaming_matches_batch(spark, sf_small, tmp_path):
    """tokenize_docs is a narrow Arrow pass, so it runs unchanged on a
    streaming source and emits the batch segmentation."""
    from ccm_spark.sources.jsonl import (
        documents_jsonl_stream,
        write_documents_jsonl,
    )

    docs = load_table(spark, sf_small, "documents").where("doc_id % 13 = 0")
    vocab = build_wordpiece_vocab(docs, size=200)
    expected = {
        (r.doc_id, tuple(r.token_ids), r.n_words, r.n_pieces, r.oov_frac)
        for r in tokenize_docs(docs, vocab).collect()
    }
    path = str(tmp_path / "tok_jsonl")
    write_documents_jsonl(docs, path, n_files=2)
    stream = documents_jsonl_stream(spark, path)
    toks = tokenize_docs(stream, vocab)
    assert toks.isStreaming
    q = (
        toks.writeStream.format("memory")
        .queryName("tok_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tok"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, tuple(r.token_ids), r.n_words, r.n_pieces, r.oov_frac)
        for r in spark.sql("SELECT * FROM tok_stream").collect()
    }
    assert got == expected


def test_chunk_docs_invariants_and_replay(spark, sf_small):
    """Chunks tile each doc with the configured stride, slice the
    ORIGINAL text byte-faithfully, and match a driver-side replay."""
    import pytest

    from ccm_spark.functions.hashing import py_token_spans, py_tokens
    from ccm_spark.pipeline.tokenize import chunk_docs

    docs = load_table(spark, sf_small, "documents").where("doc_id % 9 = 0")
    max_tokens, overlap = 40, 10
    out = chunk_docs(docs, max_tokens=max_tokens, overlap=overlap).collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc with tokens chunked; multi-chunk docs exist in the corpus
    assert set(by_doc) == {d for d, t in texts.items() if py_tokens(t)}
    assert any(len(v) > 1 for v in by_doc.values())
    for doc_id, chunks in by_doc.items():
        text = texts[doc_id]
        spans = py_token_spans(text)
        n = len(spans)
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        stride = max_tokens - overlap
        for i, c in enumerate(chunks):
            start_tok = i * stride
            end_tok = min(n, start_tok + max_tokens)
            assert c.n_tokens == end_tok - start_tok
            assert c.char_start == spans[start_tok][0]
            assert c.char_end == spans[end_tok - 1][1]
            # byte-faithful: the chunk is literally text[start:end]
            assert c.chunk_text == text[c.char_start : c.char_end]
        # the last chunk reaches the last token
        assert chunks[-1].char_end == spans[-1][1]
        # consecutive chunks overlap by `overlap` tokens (unless the tail
        # chunk is shorter than the overlap itself)
        for a, b in zip(chunks, chunks[1:]):
            assert b.char_start <= a.char_end
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_docs(docs, max_tokens=10, overlap=10)


def test_detokenize_round_trips_in_charset_docs(spark):
    """For zero-OOV docs, detokenize(tokenize(doc)) == the
    whitespace-normalised lowercase text — the per-shard audit check.
    OOV words render [UNK]."""
    from ccm_spark.pipeline.tokenize import (
        build_wordpiece_vocab,
        detokenize_docs,
        tokenize_docs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick   brown fox\njumps"),
            (2, "Mixed CASE and  numbers 42"),
        ],
        "doc_id long, text string",
    )
    # vocab from the clean docs only, so the out-of-charset probe word
    # below is genuinely absent from it
    vocab = build_wordpiece_vocab(docs, size=50)
    probe = spark.createDataFrame(
        [(3, "emoji ☃ word")], "doc_id long, text string"
    )
    toks = tokenize_docs(docs.unionByName(probe), vocab)
    back = {r.doc_id: r.text for r in detokenize_docs(toks, vocab).collect()}
    oov = {r.doc_id: r.oov_frac for r in toks.collect()}
    assert oov[1] == 0.0 and back[1] == "the quick brown fox jumps"
    assert oov[2] == 0.0 and back[2] == "mixed case and numbers 42"
    assert "[UNK]" in back[3] and back[3].endswith("word")


def test_train_bpe_learns_expected_merges_and_roundtrips(spark):
    """BPE on a hand-sized corpus: the first merges are the dominant
    pairs (hand-checkable), frequent words collapse to single pieces,
    every encoding concatenates back to word + end marker, and training
    is partitioning-invariant (the histogram is exact)."""
    from ccm_spark.pipeline.tokenize import bpe_encode, py_bpe_encode, train_bpe

    texts = ["low low low lower lower newest newest newest newest widest"]
    docs = spark.createDataFrame(
        [(0, texts[0])], "doc_id long, text string"
    )
    model = train_bpe(docs, n_merges=50)
    # 'newest' (4x) dominates: its pairs merge first; 'es' or 'st</w>'
    # family leads depending on counts — check the hand-computable first
    # merge: pair counts: ('e','s') appears in newest(4)+widest(1)=5,
    # ('s','t') 5, ('t','</w>') 5, ('w','e') in newest+widest... 'we' in
    # lower? l-o-w-e-r yes: 2 + newest 4 + widest 1 = 7 -> ('w','e') wins
    assert model["merges"][0] == ("w", "e")
    # frequent training words become one piece under the trained table
    rank = {tuple(m): i for i, m in enumerate(model["merges"])}
    assert py_bpe_encode("newest", rank, model["end_marker"]) == ["newest</w>"]
    assert py_bpe_encode("low", rank, model["end_marker"]) == ["low</w>"]

    out = {r.doc_id: r.pieces for r in bpe_encode(docs, model).collect()}
    joined = "".join(out[0])
    assert joined == "".join(
        w + model["end_marker"] for w in texts[0].split()
    )

    model2 = train_bpe(docs.repartition(5), n_merges=50)
    assert model2["merges"] == model["merges"]
    assert model2["vocab"] == model["vocab"]


def test_train_bpe_guards_and_unseen_words(spark):
    import pytest

    from ccm_spark.pipeline.tokenize import bpe_encode, train_bpe

    docs = spark.createDataFrame(
        [(0, "aaa bbb aaa"), (1, "aaa ccc")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(docs, n_merges=0)
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(docs, max_words=1)
    with pytest.raises(ValueError, match="overflow"):
        train_bpe(docs, overflow="maybe")
    model = train_bpe(docs, n_merges=10)
    assert model["coverage"] == 1.0
    # an UNSEEN word degrades gracefully to whatever merges apply
    unseen = spark.createDataFrame([(9, "aab zzz")], "doc_id long, text string")
    out = {r.doc_id: r.pieces for r in bpe_encode(unseen, model).collect()}
    assert "".join(out[9]) == "aab" + model["end_marker"] + "zzz" + model["end_marker"]


def test_train_bpe_truncate_is_a_frequency_floor(spark):
    """The 100 TB path: overflow='truncate' keeps the top-max_words
    words by (count desc, word asc) via a distributed TakeOrdered —
    every dropped word is rarer than every kept word — reports the kept
    token-mass fraction, and trains the same merges as an error-mode
    run on the pre-truncated corpus."""
    from ccm_spark.pipeline.tokenize import train_bpe

    # counts: 'aa'x4, 'ab'x3, 'ba'x2, 'zz'x1 -> cap 2 keeps aa+ab (7/10)
    docs = spark.createDataFrame(
        [(0, "aa aa ab ba"), (1, "aa ab zz"), (2, "aa ab ba")],
        "doc_id long, text string",
    )
    m = train_bpe(docs, n_merges=5, max_words=2, overflow="truncate")
    assert m["coverage"] == 7 / 10
    kept_only = spark.createDataFrame(
        [(0, "aa aa ab"), (1, "aa ab"), (2, "aa ab")], "doc_id long, text string"
    )
    m_ref = train_bpe(kept_only, n_merges=5)
    assert m["merges"] == m_ref["merges"]
    assert m["vocab"] == m_ref["vocab"]
    # under the cap, truncate mode is a no-op (coverage 1.0, same model)
    m_full = train_bpe(docs, n_merges=5, max_words=100, overflow="truncate")
    assert m_full["coverage"] == 1.0
    assert m_full["merges"] == train_bpe(docs, n_merges=5)["merges"]


def test_bpe_encode_stream_equals_batch(spark, sf_small, tmp_path):
    from ccm_spark.pipeline.tokenize import bpe_encode, train_bpe
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(80)
    model = train_bpe(docs, n_merges=200)
    batch = {
        r.doc_id: (tuple(r.pieces), r.n_pieces)
        for r in bpe_encode(docs, model).collect()
    }
    src = tmp_path / "bpe_src"
    src.mkdir()
    docs.select("doc_id", "text").coalesce(1).write.parquet(str(src / "p0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src / "p0"))
    out = bpe_encode(stream, model)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("bpe_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bpe"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (tuple(r.pieces), r.n_pieces)
        for r in spark.sql("select * from bpe_stream").collect()
    }
    assert got == batch


# ---------------------------------------------------- unigram LM (r07)


def test_unigram_forward_backward_matches_hand_lattice():
    """Two-piece lattice computed by hand: word "ab" with pieces
    {a, b, ab} at equal prob p: Z = p^2 + p; E[ab] = p/(p^2+p) =
    1/(p+1), E[a] = E[b] = p^2/(p^2+p) = p/(p+1)."""
    import math

    from ccm_spark.pipeline.tokenize import py_unigram_expected_counts

    p = 0.2
    logp = {k: math.log(p) for k in ("a", "b", "ab")}
    ec, ll = py_unigram_expected_counts("ab", 1, logp, 8)
    assert ec["ab"] == pytest.approx(1 / (p + 1))
    assert ec["a"] == pytest.approx(p / (p + 1))
    assert ec["b"] == pytest.approx(p / (p + 1))
    assert ll == pytest.approx(math.log(p * p + p))
    # frequency scales linearly
    ec5, ll5 = py_unigram_expected_counts("ab", 5, logp, 8)
    assert ec5["ab"] == pytest.approx(5 * ec["ab"]) and ll5 == pytest.approx(5 * ll)
    # uncovered character -> no contribution, not a crash
    assert py_unigram_expected_counts("axb", 1, logp, 8) == ({}, 0.0)


def _unigram_corpus(spark):
    rows = [(i, "abab abab ababab xy") for i in range(30)] + [
        (100, "abab zq abab"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_unigram_learns_the_repeated_piece(spark):
    """A corpus dominated by 'ab' repeats must keep 'ab' (or a longer
    multiple) as a high-probability piece and segment new 'ab' text
    without falling back to characters."""
    from ccm_spark.pipeline.tokenize import train_unigram, unigram_encode

    model = train_unigram(_unigram_corpus(spark), vocab_size=8, n_em_iters=3)
    pieces = model["pieces"]
    assert len(pieces) == 8
    assert {"a", "b", "x", "y", "z", "q"} <= set(pieces)  # chars never pruned
    multis = [p for p in pieces if len(p) > 1]
    assert multis and all(set(m) <= {"a", "b"} for m in multis)
    # ids dense from 1, 0 reserved for <unk>
    ids = sorted(v[0] for v in pieces.values())
    assert ids == list(range(1, len(pieces) + 1))

    enc = unigram_encode(
        spark.createDataFrame([(0, "abababab kq")], "doc_id long, text string"),
        model,
    ).collect()[0]
    # the repeated word segments into multi-char pieces, never chars
    word_pieces = enc.pieces[: -2 if "k" in enc.pieces else None]
    assert all(len(p) > 1 for p in enc.pieces if set(p) <= {"a", "b"})
    # unseen char 'k' falls back to a single-char <unk> piece
    ki = enc.pieces.index("k")
    assert enc.piece_ids[ki] == 0
    # seen char 'q' resolves to its trained id
    qi = enc.pieces.index("q")
    assert enc.piece_ids[qi] == model["pieces"]["q"][0]


def test_train_unigram_partitioning_invariant(spark):
    from ccm_spark.pipeline.tokenize import train_unigram

    base = train_unigram(_unigram_corpus(spark), vocab_size=8, n_em_iters=2)
    rep = train_unigram(
        _unigram_corpus(spark).repartition(7), vocab_size=8, n_em_iters=2
    )
    assert base["pieces"] == rep["pieces"]
    assert base["ll_history"] == pytest.approx(rep["ll_history"], abs=1e-6)


def test_unigram_encode_matches_driver_replay(spark, sf_small):
    """The Arrow kernel and the pure-Python Viterbi must agree
    token-for-token on real corpus text."""
    from ccm_spark.functions.hashing import py_tokens
    from ccm_spark.pipeline.tokenize import (
        py_unigram_encode,
        train_unigram,
        unigram_encode,
    )
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(40)
    model = train_unigram(docs, vocab_size=120, n_em_iters=2)
    got = {r.doc_id: list(r.pieces) for r in unigram_encode(docs, model).collect()}
    for r in docs.select("doc_id", "text").collect():
        want = []
        for w in py_tokens(r.text):
            want.extend(py_unigram_encode(w, model["pieces"], model["max_piece_len"]))
        assert got[r.doc_id] == want
    # concatenating a word's pieces reconstructs the word (lossless
    # segmentation — unigram has no end marker to strip)
    sample = py_tokens(docs.first().text)[:5]
    for w in sample:
        assert "".join(py_unigram_encode(w, model["pieces"], model["max_piece_len"])) == w


def test_train_unigram_rejects_bad_params(spark):
    from ccm_spark.pipeline.tokenize import train_unigram

    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram(_unigram_corpus(spark), vocab_size=0)
    with pytest.raises(ValueError, match="no tokens"):
        train_unigram(
            spark.createDataFrame([(0, "   ")], "doc_id long, text string")
        )


def test_bpe_merge_loop_matches_naive_rescan_oracle():
    """The lazy-invalidation heap must reproduce the documented
    (count desc, pair asc) merge rule EXACTLY. The regression this
    pins: a pair whose count only ever decreased (retracted from a
    rewritten word, never re-added) left the heap with stale entries
    only, making it unselectable — merges then diverged from the rule
    or stopped early. The oracle recomputes the full pair histogram
    from scratch every round."""
    import random

    from ccm_spark.pipeline.tokenize import _train_merges

    def naive(words, n_merges):
        words = dict(words)
        merges = []
        for _ in range(n_merges):
            stats = {}
            for syms, n in words.values():
                for p in zip(syms, syms[1:]):
                    stats[p] = stats.get(p, 0) + n
            live = [(c, p) for p, c in stats.items() if c >= 2]
            if not live:
                break
            best = sorted(live, key=lambda cp: (-cp[0],) + (cp[1],))[0][1]
            merges.append(best)
            ns = best[0] + best[1]
            for wid, (syms, n) in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                        out.append(ns)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[wid] = (tuple(out), n)
        return merges

    rng = random.Random(7)
    for _ in range(800):
        words = {
            i: (
                tuple("".join(rng.choice("abcd") for _ in range(rng.randint(1, 5))))
                + ("</w>",),
                rng.randint(1, 5),
            )
            for i in range(rng.randint(1, 6))
        }
        n_merges = rng.randint(1, 8)
        assert _train_merges(dict(words), n_merges) == naive(words, n_merges)


def test_wordpiece_encode_matches_duckdb_replay(spark, sf_small):
    """The greedy longest-match wordpiece APPLY kernel replayed in SQL
    (recursive-CTE cursor + lateral longest-piece lookup) with the
    fixed gate vocabulary — digits are absent from the vocab so numeric
    tokens exercise the whole-word-UNK path. An r09 gate candidate's
    evidence, pinned now at sf0.001."""
    import duckdb

    import pyspark.sql.functions as F

    from ccm_spark.pipeline.tokenize import tokenize_docs
    from ccm_spark.plans.oracle_sql_ext import (
        sql_wordpiece_encode,
        wordpiece_gate_vocab,
    )
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    out = tokenize_docs(docs, wordpiece_gate_vocab())
    got = {
        r.doc_id: (r.ids, r.n_pieces)
        for r in out.select(
            "doc_id", F.array_join("token_ids", ",").alias("ids"), "n_pieces"
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = {
        int(d): (i, int(n))
        for d, i, n in con.sql(sql_wordpiece_encode()).fetchall()
    }
    assert len(got) == len(want) == 500
    mism = {d: (got[d], want[d]) for d in got if got[d] != want[d]}
    assert not mism, dict(list(mism.items())[:3])


def test_fertility_report_matches_duckdb_replay(spark, sf_small):
    """Corpus fertility report (pieces/word, bytes/piece, OOV fraction)
    with the gate vocabulary, replayed in SQL (the wordpiece encode
    chain nested as a CTE); plus per-source grouping sums to the
    corpus totals."""
    import duckdb

    from ccm_spark.pipeline.tokenize import fertility_report
    from ccm_spark.plans.oracle_sql_ext import (
        sql_tokenizer_fertility,
        wordpiece_gate_vocab,
    )
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    vocab = wordpiece_gate_vocab()
    row = fertility_report(docs, vocab).collect()[0]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = con.sql(sql_tokenizer_fertility()).fetchall()[0]
    got = (row.n_docs, row.n_words, row.n_pieces,
           row.fertility, row.bytes_per_piece, row.oov_word_frac)
    assert got == (int(want[0]), int(want[1]), int(want[2]),
                   float(want[3]), float(want[4]), float(want[5]))
    assert row.fertility >= 1.0  # every word is at least one piece
    assert 0.0 <= row.oov_word_frac < 1.0

    by_src = fertility_report(docs, vocab, by="source").collect()
    assert len(by_src) > 1
    assert sum(r.n_docs for r in by_src) == row.n_docs
    assert sum(r.n_pieces for r in by_src) == row.n_pieces


def test_train_unigram_seed_overflow_truncate_path(spark):
    """train_bpe's bounded-artifact contract, mirrored (r8 advice #9):
    a seed relation past max_seed_pieces raises by default with the
    fix, and overflow='truncate' keeps the frequency-floor
    top-max_seed_pieces seed — reported via seed_coverage < 1, kept
    set a pure function of the corpus (partitioning-invariant), and a
    floor-dropped rare character encodes as <unk> downstream."""
    import pytest

    from ccm_spark.pipeline.tokenize import train_unigram, unigram_encode

    # 'ab' mass dominates; 'q'/'z' appear once inside rare words, so
    # their pieces sit at the frequency floor
    corpus = spark.createDataFrame(
        [(0, "ab ab ab ab ab ab ab ab"), (1, "ab ab ab ab qz")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_seed_pieces"):
        train_unigram(corpus, vocab_size=2, max_piece_len=2, max_seed_pieces=3)
    with pytest.raises(ValueError, match="overflow"):
        train_unigram(corpus, vocab_size=2, overflow="maybe")
    with pytest.raises(ValueError, match="must be >="):
        train_unigram(corpus, vocab_size=5, max_seed_pieces=3)

    model = train_unigram(
        corpus,
        vocab_size=3,
        max_piece_len=2,
        max_seed_pieces=3,
        overflow="truncate",
    )
    assert 0.0 < model["seed_coverage"] < 1.0
    # the dominant pieces survive the floor; the rare chars fell below it
    assert "ab" in model["pieces"]
    assert "q" not in model["pieces"] and "z" not in model["pieces"]
    # pure function of the corpus: same model on any partitioning
    again = train_unigram(
        corpus.repartition(5),
        vocab_size=3,
        max_piece_len=2,
        max_seed_pieces=3,
        overflow="truncate",
    )
    assert again["pieces"] == model["pieces"]
    assert again["seed_coverage"] == model["seed_coverage"]
    # floor-dropped char -> single-char <unk> piece at encode time
    enc = unigram_encode(
        spark.createDataFrame([(0, "ab qz")], "doc_id long, text string"),
        model,
    ).collect()[0]
    qi = enc.pieces.index("q")
    assert enc.piece_ids[qi] == 0
    # the un-truncated path reports full coverage
    full = train_unigram(corpus, vocab_size=3, max_piece_len=2)
    assert full["seed_coverage"] == 1.0
