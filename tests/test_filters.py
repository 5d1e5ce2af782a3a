"""Phrase-blocklist + information-density signals (pipeline/filters.py):
hand-computable literal corpora, the DuckDB twins on real testdata (the
r12 gate-candidate evidence, QUERIES.md), and the zlib replay pin."""

from __future__ import annotations

import math
import zlib

import pytest
import pyspark.sql.functions as F

from ccm_spark.pipeline.filters import (
    BLOCKLIST_GATE_PHRASES,
    ZLIB_LEVEL,
    blocklist_filter,
    char_entropy_signals,
    compression_signals,
    normalize_phrases,
    phrase_blocklist_matches,
    py_compression_ratio,
)


def docs_df(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t, "xx", f"src{i}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


# ------------------------------------------------------------- normalize


def test_normalize_phrases_dedup_and_reject():
    assert normalize_phrases(["Fast  Table", "fast table", "a b c"]) == [
        ["fast", "table"],
        ["a", "b", "c"],
    ]
    with pytest.raises(ValueError):
        normalize_phrases(["ok phrase", "   "])
    with pytest.raises(ValueError):
        normalize_phrases([])


# ------------------------------------------------------- blocklist report


def test_phrase_matches_hand_built(spark):
    d = docs_df(
        spark,
        [
            "the fast table wins",          # 1x "fast table"
            "fast table fast table",        # 2x, non-overlapping
            "table table table",            # "table table" overlaps: 2 matches
            "fast",                         # anchor present, phrase incomplete
            "nothing here",                 # no anchors
            "big sort table window end",    # 3-token phrase
            "fast table and table table",   # two distinct phrases
            "",                             # empty doc
        ],
    )
    phrases = ["fast table", "table table", "sort table window", "never seen"]
    rows = {
        r.doc_id: r
        for r in phrase_blocklist_matches(d, phrases).collect()
    }
    assert len(rows) == 8  # every input doc has a row
    assert (rows[0].n_matches, rows[0].n_phrases) == (1, 1)
    assert rows[0].phrases_hit == "fast table" and rows[0].blocked
    assert rows[1].n_matches == 2 and rows[1].n_phrases == 1
    # overlap semantics: positions 0 and 1 both match "table table"
    assert rows[2].n_matches == 2 and rows[2].phrases_hit == "table table"
    # anchor hit but phrase runs past end-of-doc -> no match
    assert rows[3].n_matches == 0 and not rows[3].blocked
    assert rows[4].n_matches == 0
    assert rows[5].phrases_hit == "sort table window"
    # sorted distinct phrase list, '|' joined
    assert rows[6].phrases_hit == "fast table|table table"
    assert rows[6].n_matches == 2 and rows[6].n_phrases == 2
    assert rows[7].n_matches == 0 and rows[7].phrases_hit == ""


def test_phrase_matches_tokenizer_exactness(spark):
    """Token-exact semantics: punctuation glues to tokens, case folds."""
    d = docs_df(spark, ["Fast Table here", "fast table. here"])
    rows = {
        r.doc_id: r
        for r in phrase_blocklist_matches(d, ["fast table"]).collect()
    }
    assert rows[0].blocked            # case-folded match
    assert not rows[1].blocked        # "table." is a different token


def test_blocklist_filter_keeps_schema_and_drops_blocked(spark):
    d = docs_df(spark, ["fast table", "clean doc", "key scan here"])
    out = blocklist_filter(d, ["fast table", "key scan"])
    assert out.columns == d.columns
    assert [r.doc_id for r in out.collect()] == [1]


def test_phrase_matches_duckdb_twin(spark, sf_small):
    """Full cross-engine pin on real testdata with the gate fixture
    blocklist — the r12 rotation candidate's evidence."""
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_phrase_blocklist

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = phrase_blocklist_matches(docs, BLOCKLIST_GATE_PHRASES)
    got = sorted(
        (r.doc_id, r.n_matches, r.n_phrases, r.phrases_hit, r.blocked)
        for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(c), str(d), bool(e))
        for a, b, c, d, e in con.sql(sql_phrase_blocklist()).fetchall()
    )
    assert len(got) == len(want) == docs.count()
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:5]
    # fixture does real work: some blocked, some not, and the 3-token
    # and repeated-token phrases each hit at least once
    n_blocked = sum(1 for _, _, _, _, b in got if b)
    assert 0 < n_blocked < len(got)
    allhits = "|".join(p for _, _, _, p, _ in got)
    assert "table table" in allhits and "small query line" in allhits
    assert "quantum flux" not in allhits


# ------------------------------------------------------------- entropy


def test_char_entropy_hand_built(spark):
    d = docs_df(spark, ["aaaa", "ab", "", "abab"])
    rows = {r.doc_id: r for r in char_entropy_signals(d).collect()}
    assert rows[0].n_chars == 4 and rows[0].n_distinct_chars == 1
    assert rows[0].entropy_bits == pytest.approx(0.0)
    assert rows[1].entropy_bits == pytest.approx(1.0)
    assert rows[2].n_chars == 0 and rows[2].entropy_bits == 0.0
    assert rows[3].entropy_bits == pytest.approx(1.0)  # 2x2 uniform


def test_char_entropy_counts_whitespace(spark):
    """Spaces are characters: 'a a' has alphabet {a, ' '} sized 2."""
    d = docs_df(spark, ["a a"])
    r = char_entropy_signals(d).collect()[0]
    assert r.n_chars == 3 and r.n_distinct_chars == 2
    # p = (2/3, 1/3)
    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert r.entropy_bits == pytest.approx(want)


def test_char_entropy_duckdb_twin(spark, sf_small):
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_char_entropy

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = char_entropy_signals(docs).select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        (F.round("entropy_bits", 6) + F.lit(0.0)).alias("entropy_bits"),
    )
    got = sorted(
        (r.doc_id, r.n_chars, r.n_distinct_chars, r.entropy_bits)
        for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(c), float(d))
        for a, b, c, d in con.sql(sql_char_entropy()).fetchall()
    )
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert len(got) == len(want) and not mism, mism[:5]


def test_char_entropy_duckdb_twin_non_bmp(spark):
    """Cross-engine exactness BEYOND the BMP: Spark's split('') emits
    codepoints (zero-width regex matches never split a surrogate pair),
    the same unit as DuckDB's substr — so emoji/astral text hashes
    identically, not just the ASCII testdata. Rotation-safety pin for
    the char_entropy gate candidate."""
    import duckdb
    import pandas as pd

    from ccm_spark.plans.oracle_sql_ext import sql_char_entropy

    texts = [
        "a\U0001F600b\U0001F600",      # 4 codepoints (6 UTF-16 units)
        "\U0001D54F\U0001D550 plain",  # math alphanumerics + ASCII
        "café ☕ \U0001F600\U0001F600\U0001F600",
        "",
    ]
    d = docs_df(spark, texts)
    out = char_entropy_signals(d).select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        (F.round("entropy_bits", 6) + F.lit(0.0)).alias("entropy_bits"),
    )
    got = sorted(
        (r.doc_id, r.n_chars, r.n_distinct_chars, r.entropy_bits)
        for r in out.collect()
    )
    # codepoint counts, not UTF-16 units: doc 0 is 4 chars, not 6
    assert got[0][1] == 4 and got[0][2] == 3
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    want = sorted(
        (int(a), int(b), int(c), float(x))
        for a, b, c, x in con.sql(sql_char_entropy()).fetchall()
    )
    assert got == want, [(g, w) for g, w in zip(got, want) if g != w][:5]


# ----------------------------------------------------------- compression


def test_compression_replay_pin(spark, sf_small):
    """Distributed zlib kernel == driver-side replay, byte-for-byte, on
    real testdata — the honest stand-in for a cross-engine twin (no SQL
    zlib exists)."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = {
        r.doc_id: (r.n_bytes, r.n_compressed, r.compression_ratio)
        for r in compression_signals(docs).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        assert got[row.doc_id] == py_compression_ratio(row.text)


def test_compression_signals_hand_built(spark):
    d = docs_df(spark, ["a" * 1000, "", "xyz"])
    rows = {r.doc_id: r for r in compression_signals(d).collect()}
    # long single-char run compresses hard
    assert rows[0].n_bytes == 1000 and rows[0].compression_ratio < 0.05
    # empty doc: guarded ratio 0.0
    assert rows[1].n_bytes == 0 and rows[1].compression_ratio == 0.0
    # tiny doc: zlib header overhead dominates -> ratio > 1
    assert rows[2].compression_ratio > 1.0
    # kernel agrees with stdlib directly
    assert rows[0].n_compressed == len(zlib.compress(b"a" * 1000, ZLIB_LEVEL))


# ------------------------------------------------- randomized scan oracle


def _py_scan(tokens: list[str], plist: list[list[str]]):
    """Brute-force overlap-counting scan — the semantics contract."""
    n_matches = 0
    hit: set[str] = set()
    for p in plist:
        for i in range(len(tokens) - len(p) + 1):
            if tokens[i : i + len(p)] == p:
                n_matches += 1
                hit.add(" ".join(p))
    return n_matches, hit


def test_phrase_matches_randomized_vs_python_scan(spark):
    """200 seeded random docs over a tiny vocab (dense accidental
    matches, heavy overlaps) vs the brute-force Python scan — one Spark
    job, full-output comparison."""
    import random

    rng = random.Random(1711)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25)))
        for _ in range(200)
    ]
    phrases = [["aa", "bb"], ["bb", "bb"], ["cc", "dd", "aa"], ["dd"]]
    d = docs_df(spark, texts)
    got = {
        r.doc_id: (r.n_matches, r.n_phrases, r.phrases_hit)
        for r in phrase_blocklist_matches(
            d, [" ".join(p) for p in phrases]
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split()
        n, hit = _py_scan(toks, phrases)
        assert got[i] == (n, len(hit), "|".join(sorted(hit))), (i, t)


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_phrase_matches_plan_no_cartesian_anchors_broadcast(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = _formatted_plan(phrase_blocklist_matches(docs, BLOCKLIST_GATE_PHRASES))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the blocklist-derived relations (anchors, needs) reach the plan as
    # broadcasts; the corpus never does at static planning time
    assert plan.count("BroadcastExchange") >= 2


def test_compression_signals_streaming_matches_batch(spark, sf_small, tmp_path):
    """compression_signals is a map-only mapInPandas kernel, so it runs
    unchanged on a streaming source and emits the batch rows."""
    from ccm_spark.sources.jsonl import (
        documents_jsonl_stream,
        write_documents_jsonl,
    )
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").where("doc_id % 13 = 0")
    expected = {
        (r.doc_id, r.n_bytes, r.n_compressed, r.compression_ratio)
        for r in compression_signals(docs).collect()
    }
    path = str(tmp_path / "docs_jsonl_z")
    write_documents_jsonl(docs, path, n_files=2)
    sig = compression_signals(documents_jsonl_stream(spark, path))
    assert sig.isStreaming
    q = (
        sig.writeStream.format("memory")
        .queryName("zlib_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_zlib"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_bytes, r.n_compressed, r.compression_ratio)
        for r in spark.sql("SELECT * FROM zlib_stream").collect()
    }
    assert got == expected


def test_phrase_matches_pathological_overlap_run(spark):
    """A hot-anchor doc: 'fast' x 400 with phrase 'fast fast' must yield
    exactly 399 overlapping matches (every position), and a long doc
    where the anchor is ALSO every verify cell stays correct — the
    worst case for the candidate relation (doc_len x plen cells)."""
    n = 400
    d = docs_df(spark, [" ".join(["fast"] * n), "fast table " * 50])
    rows = {
        r.doc_id: r
        for r in phrase_blocklist_matches(
            d, ["fast fast", "fast table"]
        ).collect()
    }
    assert rows[0].n_matches == n - 1 and rows[0].n_phrases == 1
    # doc 1: "fast table fast table ...": 50 "fast table" matches and
    # zero "fast fast" (no two adjacent fasts)
    assert rows[1].n_matches == 50
    assert rows[1].phrases_hit == "fast table"
