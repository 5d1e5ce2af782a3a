"""Phrase-blocklist filtering and information-density signals.

Training-data pipelines drop documents containing blocked multi-token
phrases (the C4 "bad words" pass) and score documents by information
density (compression ratio / character entropy — the Gopher-style
repetitiousness signals). The reference engine has no string surface at
all (SURVEY.md §2.1); these extend the documents-table family in
``pipeline/text.py``.

Scale shapes
------------
``phrase_blocklist_matches`` is pure relational algebra — NO regex union
over the blocklist (a 10k-phrase regex alternation is a scan-time
disaster) and NO token-array carried through an explode (that copies the
whole array per emitted row, O(len²) bytes per doc in the generate
output):

1. explode docs to ``(doc_id, pos, tok)`` — map-side, linear;
2. broadcast-join the tiny anchor relation (first token of each phrase)
   → sparse candidate starts;
3. left-semi restrict the DOCS to candidate docs and re-tokenize only
   those (pigeonhole: a doc with no anchor token can never match, so
   the verify side never even explodes a clean doc; the full-corpus
   explode runs exactly once, cut by a localCheckpoint on the sparse
   anchor-hit relation) and equi-join each candidate's required
   ``(pos, tok)`` cells
   — a match is a candidate whose per-position hit count equals the
   phrase length.

The one large shuffle is the verify join, and it only carries tokens of
docs that contain at least one anchor. Overlapping occurrences count
separately (true scan semantics; e.g. ``"fast fast fast"`` matches
``"fast fast"`` twice).

``char_entropy_signals`` shuffles only ``(doc_id, ch)`` partial counts —
map-side combine collapses a document to at most |alphabet| rows before
the exchange. ``compression_signals`` is a mapInPandas byte kernel
(zlib is CPython stdlib; no cross-engine twin exists, so it is pinned
against a Python replay rather than DuckDB — see tests/test_filters.py).

Unicode: Spark's ``split(text, '')`` yields CODEPOINTS (Java regex
zero-width matches never land inside a surrogate pair), the same unit
as DuckDB's codepoint-based substr — the entropy operator is exact
beyond the BMP too, pinned by a non-BMP twin test
(tests/test_filters.py::test_char_entropy_duckdb_twin_non_bmp).
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.functions.hashing import py_tokens, tokens_col
from ccm_spark.functions.partitioning import spread

__all__ = [
    "normalize_phrases",
    "phrase_blocklist_matches",
    "blocklist_filter",
    "char_entropy_signals",
    "compression_signals",
]


#: Gate/twin fixture blocklist over the synthetic documents vocabulary —
#: exercises a 2-token phrase, a repeated-token phrase (overlap
#: semantics), a 3-token phrase, and one phrase that never occurs.
BLOCKLIST_GATE_PHRASES: tuple[str, ...] = (
    "fast table",
    "key scan",
    "table table",
    "small query line",
    "quantum flux",
)


def normalize_phrases(phrases: Iterable[str]) -> list[list[str]]:
    """Tokenize each phrase with THE shared tokenizer (:func:`py_tokens`),
    drop exact duplicates (first occurrence wins), reject empties.

    The blocklist is driver-side by contract: it is configuration, not
    data (thousands of rows at most), and both the anchor and the
    required-cell relations derive from it and broadcast."""
    seen: set[str] = set()
    out: list[list[str]] = []
    for p in phrases:
        toks = py_tokens(p)
        if not toks:
            raise ValueError(f"blocklist phrase tokenizes to nothing: {p!r}")
        key = " ".join(toks)
        if key in seen:
            continue
        seen.add(key)
        out.append(toks)
    if not out:
        raise ValueError("empty blocklist")
    return out


def _token_relation(docs: DataFrame, text_col: str) -> DataFrame:
    # spread first: a small-by-bytes single-file corpus coalesces to ONE
    # task and serialises the CPU-bound explode (functions/partitioning.py)
    return spread(docs, "doc_id").select(
        "doc_id", F.posexplode(tokens_col(text_col)).alias("pos", "tok")
    )


def _verified_matches(
    docs: DataFrame, plist: list[list[str]], text_col: str
) -> DataFrame:
    """The shared matching pipeline (one definition — the report and
    filter paths must never drift): anchor broadcast join → pigeonhole
    left-semi restriction → required-cell equi-join → HAVING count =
    phrase length. Returns one row per verified occurrence:
    ``(doc_id, phrase, match_pos, plen)``."""
    spark = docs.sparkSession
    anchors = spark.createDataFrame(
        [(" ".join(t), t[0], len(t)) for t in plist],
        "phrase string, anchor string, plen int",
    )
    needs = spark.createDataFrame(
        [(" ".join(t), off, tok) for t in plist for off, tok in enumerate(t)],
        "phrase string, off int, need_tok string",
    )
    toks_rel = _token_relation(docs, text_col)
    # cand is the SPARSE anchor-hit relation; localCheckpoint it (the
    # collocations_pmi/corpus_divergence discipline) so the full-corpus
    # tokenize+posexplode above runs exactly ONCE per action — cand
    # feeds both the pigeonhole doc set and the required-cell join, and
    # without the cut the explode would replay per consumer. Nothing
    # corpus-sized is ever persisted: only anchor occurrences.
    cand = (
        toks_rel.join(F.broadcast(anchors), toks_rel.tok == anchors.anchor)
        .select("doc_id", F.col("pos").alias("match_pos"), "phrase", "plen")
        .localCheckpoint(eager=True)
    )
    # Pigeonhole restriction BEFORE the second explode: re-tokenize only
    # the docs holding >= 1 anchor (a doc with no anchor token can never
    # match), so the verify side never materialises tokens of clean docs.
    cand_docs = cand.select("doc_id").distinct()
    dtoks = _token_relation(docs.join(cand_docs, "doc_id", "left_semi"), text_col)
    cells = cand.join(F.broadcast(needs), "phrase").select(
        "doc_id",
        "phrase",
        "match_pos",
        "plen",
        (F.col("match_pos") + F.col("off")).alias("pos"),
        "need_tok",
    )
    return (
        cells.join(dtoks, ["doc_id", "pos"])
        .where(F.col("tok") == F.col("need_tok"))
        .groupBy("doc_id", "phrase", "match_pos", "plen")
        .agg(F.count("*").alias("_hits"))
        .where(F.col("_hits") == F.col("plen"))
        .select("doc_id", "phrase", "match_pos", "plen")
    )


def phrase_blocklist_matches(
    docs: DataFrame,
    phrases: Iterable[str],
    text_col: str = "text",
) -> DataFrame:
    """Per-doc blocklist report: every occurrence of every phrase.

    Returns one row per input doc: ``(doc_id, n_matches, n_phrases,
    phrases_hit, blocked)`` where ``n_matches`` counts occurrences
    (overlaps included), ``n_phrases`` counts distinct phrases hit, and
    ``phrases_hit`` is the sorted ``|``-joined distinct normalized
    phrases (scalar string — gate-hashable).

    Matching is token-exact under the shared tokenizer: lowercased
    whitespace tokens, so "Fast Table." does NOT match "fast table"
    (the period sticks to the token) — punctuation stripping is
    :func:`ccm_spark.pipeline.text.normalize_unicode`'s job, upstream.
    """
    verified = _verified_matches(docs, normalize_phrases(phrases), text_col)
    per_doc = verified.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"),
        F.countDistinct("phrase").alias("n_phrases"),
        F.array_join(F.sort_array(F.collect_set("phrase")), "|").alias(
            "phrases_hit"
        ),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            F.coalesce("n_phrases", F.lit(0)).alias("n_phrases"),
            F.coalesce("phrases_hit", F.lit("")).alias("phrases_hit"),
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("blocked"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    phrases: Iterable[str],
    text_col: str = "text",
) -> DataFrame:
    """Documents surviving the blocklist — full input schema, blocked
    docs anti-joined away. Shares :func:`_verified_matches` with the
    report path (one matching definition); only the verified-match
    doc_ids reach the anti join (small relation)."""
    blocked = (
        _verified_matches(docs, normalize_phrases(phrases), text_col)
        .select("doc_id")
        .distinct()
    )
    return docs.join(blocked, "doc_id", "left_anti")


def char_entropy_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc character-level Shannon entropy in bits/char, with the
    distinct-character count and total length.

    Low entropy flags repetitive/boilerplate text the token-level
    signals (``repetition_signals``) can miss — single-char runs,
    padded whitespace, base64 blobs sit at the extremes. The plan is
    two hash aggregates; the explode never reaches the exchange because
    map-side combine collapses a doc to <= |alphabet| partial rows.
    """
    chars = spread(docs, "doc_id").select(
        "doc_id", F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.count("*").alias("n_distinct_chars"),
        # H = log2(N) - (1/N) * sum(c * log2(c)) — one pass, no p column
        (
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("entropy_bits"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
            F.coalesce("n_distinct_chars", F.lit(0)).alias("n_distinct_chars"),
            (F.coalesce("entropy_bits", F.lit(0.0)) + F.lit(0.0)).alias(
                "entropy_bits"
            ),
        )
    )


#: zlib level for :func:`compression_signals` — fixed so the ratio is a
#: stable corpus statistic, not a function of whoever ran the job.
ZLIB_LEVEL = 6


def py_compression_ratio(text: str | None, level: int = ZLIB_LEVEL):
    """Driver-side replay kernel: (n_bytes, n_compressed, ratio).

    The distributed path (:func:`compression_signals`) must agree
    byte-for-byte — tests pin them equal. Empty text → ratio 0.0 (the
    Σw==0-style guard convention used across the repo)."""
    b = (text or "").encode("utf-8")
    if not b:
        return 0, len(zlib.compress(b, level)), 0.0
    comp = zlib.compress(b, level)
    return len(b), len(comp), len(comp) / len(b)


def compression_signals(
    docs: DataFrame, text_col: str = "text", level: int = ZLIB_LEVEL
) -> DataFrame:
    """Per-doc zlib compression ratio — the Gopher-family information
    density signal (ratio near 0 = highly repetitive, near/above 1 =
    high-entropy or already-compressed payload).

    mapInPandas byte kernel: Arrow batches in, one zlib pass per doc,
    no Python row loop at the DataFrame layer. zlib with a fixed level
    is deterministic for a fixed library build, so the output is
    replay-pinned (tests/test_filters.py) rather than DuckDB-twinned —
    there is no SQL zlib. At 100 TB this is a map-only pass: no shuffle,
    CPU-bound, scales with executor cores.
    """
    out_schema = (
        "doc_id long, n_bytes int, n_compressed int, compression_ratio double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(d), *py_compression_ratio(t, level))
                for d, t in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "n_compressed",
                    "compression_ratio",
                ],
            )

    # zlib is CPU-bound per row; spread so the kernel parallelises even
    # when the input is one small parquet file
    return spread(docs.select("doc_id", text_col), "doc_id").mapInPandas(
        kernel, out_schema
    )
