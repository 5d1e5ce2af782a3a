"""Context-window preparation and winnowing fingerprints.

Two training-data operators the reference engine has no analogue for
(SURVEY.md §2.1 — no string surface):

- :func:`chunk_documents` — sliding-window token chunking, the step that
  turns a cleaned corpus into model-context-sized training rows (every
  LM data pipeline runs it between curation and packing; overlap keeps
  boundary-spanning context learnable).
- :func:`chunk_by_sentences` — sentence-BOUNDED chunk packing over the
  ``split_sentences`` relation (a chunk never splits a sentence; the
  relational prefix-bucket rule, one exchange total).
- :func:`winnow_fingerprints` / :func:`winnow_matches` — winnowing
  document fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing: Local
  Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  algorithm): position-robust near-dup/overlap detection with a
  GUARANTEE the repo's simhash/minhash family lacks — any shared run of
  at least w+k-1 tokens is detected, because each window of w
  consecutive k-gram hashes contributes its minimum to the fingerprint
  set.

Scale shapes
------------
``chunk_documents`` is a single projection: the token array is consumed
by a ``transform`` over the chunk-index sequence BEFORE the generate, so
nothing array-valued is duplicated per output row (the O(len²)
explode-carry trap, see pipeline/filters.py) and the whole plan stays in
whole-stage codegen. The only exchange is the explicit ``spread``
respread (a near-no-op on a real multi-split cluster read, pinned as the
plan's ONLY exchange in tests/test_plan_shapes.py) — at 100 TB chunking
is a map-only corpus rewrite, exactly as wide as its output.

``winnow_fingerprints`` shuffles once (the doc-partitioned rolling-min
window); grams never leave their document. The rolling argmin is encoded
as integer ``min`` over ``hash·2³² + (2³²−1−pos)`` so the
rightmost-minimum tie rule is pure int arithmetic, bit-identical in any
engine (no engine-specific ``min_by`` tie behavior). ``winnow_matches``
joins docs on shared fingerprints with a document-frequency valve
(fingerprints in more than ``max_df`` docs are boilerplate, dropped
before the join) — the same bucket-valve discipline as the LSH dedup
path, so no hot hash can quadratic-blow the pair relation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.functions.hashing import md5_long, tokens_col
from ccm_spark.functions.partitioning import spread

__all__ = [
    "chunk_documents",
    "chunk_by_sentences",
    "winnow_fingerprints",
    "winnow_matches",
]

#: winnowing hash width: 30 bits so hash·2³² + pos-complement packs into
#: a 62-bit non-negative BIGINT (winnowing cares about hash ORDER within
#: a w-window, not collision resistance — 2³⁰ over ≤2³² positions is
#: far below birthday territory per window)
_WINNOW_HASH_BITS = 30
_POS_BITS = 32


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into sliding token windows of ``max_tokens``
    with step ``stride`` (overlap = ``max_tokens - stride``): one row
    per chunk, ``(doc_id, chunk_idx, start_tok, n_tokens, chunk_text)``.

    Token-space chunking under THE shared whitespace tokenizer
    (hashing.tokens_col): ``chunk_text`` re-joins tokens with single
    spaces, so original inter-token whitespace is normalized — the
    contract every downstream tokenize/pack stage here already assumes.
    Every token appears in at least one chunk (the last window is short
    rather than dropped); token-less docs emit nothing (parity with
    ``fingerprint``'s explode semantics). Deterministic: chunk layout
    is a pure function of the token count.
    """
    if max_tokens < 1 or stride < 1:
        raise ValueError(
            f"chunk_documents: max_tokens/stride must be >= 1, "
            f"got {max_tokens}/{stride}"
        )
    if stride > max_tokens:
        raise ValueError(
            f"chunk_documents: stride {stride} > max_tokens {max_tokens} "
            "would skip tokens between consecutive chunks"
        )
    # Transient-memory valve: the transform materialises ALL of a doc's
    # chunk strings in one array before the generate, so per-row text
    # inflates by ~max_tokens/stride (1.33x at the 128/96 default). A
    # miscalled stride << max_tokens turns a 100 TB corpus rewrite into
    # an 8x+ per-row blow-up silently — fail loudly instead (an
    # intentional dense sweep can explode chunk INDICES first and slice
    # per row).
    if stride * 8 < max_tokens:
        raise ValueError(
            f"chunk_documents: stride {stride} < max_tokens/8 "
            f"({max_tokens}/8) inflates per-doc transient memory "
            f"~{max_tokens / stride:.0f}x (all chunk strings are built "
            "in one array per doc before the generate); use a coarser "
            "stride or chunk in index space"
        )
    base = (
        spread(docs, "doc_id")
        .select("doc_id", tokens_col(text_col).alias("_toks"))
        .withColumn("_n", F.size("_toks").cast("long"))
        .where(F.col("_n") > 0)
        # last chunk index: 0 when the doc fits one window, else
        # ceil((n - max)/stride) via integer DIV (the repo's bucketing
        # convention — bit-identical to the twin's `//`)
        .withColumn(
            "_k_last",
            F.when(F.col("_n") <= max_tokens, F.lit(0).cast("long")).otherwise(
                F.expr(
                    f"(_n - {max_tokens} + {stride} - 1) DIV {stride}"
                )
            ),
        )
    )
    # transform() consumes the token array BEFORE the generate: the
    # exploded rows carry only scalars + their own chunk text
    chunk_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), F.col("_k_last")),
        lambda k: F.array_join(
            F.slice(F.col("_toks"), (k * stride + 1).cast("int"), max_tokens),
            " ",
        ),
    )
    return base.select(
        "doc_id",
        "_n",
        F.posexplode(chunk_arr).alias("chunk_idx", "chunk_text"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("int").alias("start_tok"),
        F.least(
            F.lit(max_tokens).cast("long"),
            F.col("_n") - F.col("chunk_idx") * stride,
        )
        .cast("int")
        .alias("n_tokens"),
        "chunk_text",
    )


def chunk_by_sentences(
    sentences: DataFrame,
    max_tokens: int = 128,
) -> DataFrame:
    """Pack consecutive SENTENCES into chunks of roughly ``max_tokens``
    whitespace tokens without ever splitting a sentence — the
    sentence-bounded complement of :func:`chunk_documents` (raw token
    windows straddle sentence boundaries; a curator preparing
    instruction/eval data usually wants whole sentences per row).

    Input is the :func:`ccm_spark.pipeline.text.split_sentences`
    relation ``(doc_id, sent_idx, sentence)``; output one row per
    chunk: ``(doc_id, chunk_idx, n_sentences, n_tokens, chunk_text)``
    with sentences re-joined by single spaces in ``sent_idx`` order.

    Assignment is the RELATIONAL prefix rule, not sequential greedy: a
    sentence belongs to bucket ``cum_tokens_before DIV max_tokens``
    (cumulative token count of the doc's EARLIER sentences). Chunks
    therefore hold < ``max_tokens`` + (their last sentence's length)
    tokens — overage is bounded by the longest single sentence, the
    standard streaming-pack approximation — and a sentence longer than
    ``max_tokens`` gets a bucket of its own (``chunk_idx`` then skips
    indices: the raw bucket number is kept so layout is a pure
    function of the token counts, twin-replayable).

    100 TB shape: the sentence relation shuffles ONCE on ``doc_id``
    for the running-sum window, and the chunk aggregation reuses that
    partitioning (grouping keys (doc_id, chunk_idx) are clustered by
    the window's hash(doc_id) exchange — Catalyst plans no second
    exchange). Everything else is codegen; no arrays are carried
    beyond each chunk's own sentence list inside the final aggregate.
    """
    if max_tokens < 1:
        raise ValueError(
            f"chunk_by_sentences: max_tokens must be >= 1, got {max_tokens}"
        )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = (
        sentences.select(
            "doc_id",
            "sent_idx",
            "sentence",
            F.size(tokens_col("sentence")).cast("long").alias("_n_tok"),
        )
        .withColumn(
            "_cum_before",
            F.coalesce(F.sum("_n_tok").over(w), F.lit(0).cast("long")),
        )
        # integer DIV (the repo bucketing convention — twin uses `//`)
        .withColumn("_chunk", F.expr(f"_cum_before DIV {max_tokens}"))
    )
    return (
        s.groupBy("doc_id", F.col("_chunk").alias("chunk_idx"))
        .agg(
            F.count("*").cast("int").alias("n_sentences"),
            F.sum("_n_tok").cast("int").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sent_idx", "sentence"))
                    ),
                    lambda x: x["sentence"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "n_sentences",
            "n_tokens",
            "chunk_text",
        )
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing fingerprint set per document (Schleimer et al. 2003):
    hash every token ``k``-gram, slide a window of ``w`` consecutive
    hashes, keep each window's minimum (rightmost on ties), emit the
    DISTINCT selected ``(doc_id, pos, gram_hash)`` rows.

    Guarantee: two documents sharing any token run of length
    ``>= w + k - 1`` share at least one fingerprint. Density: ~2/(w+1)
    of grams are selected, so the fingerprint relation is a fraction of
    the token relation. Documents with fewer than ``k`` tokens emit
    nothing; documents with fewer than ``w`` grams emit the minimum of
    the single short window (MOSS's every-doc-fingerprinted rule).

    Cross-engine determinism: the rolling argmin is ``min`` over the
    packed integer ``hash·2³² + (2³² − 1 − pos)`` — hash ascending,
    position descending — decoded after the window, so both engines
    resolve ties identically with plain BIGINT arithmetic.
    """
    if k < 1 or w < 1:
        raise ValueError(f"winnow_fingerprints: k/w must be >= 1, got {k}/{w}")
    two32 = F.lit(1 << _POS_BITS).cast("long")
    base = (
        spread(docs, "doc_id")
        .select("doc_id", tokens_col(text_col).alias("_toks"))
        .withColumn("_n", F.size("_toks").cast("long"))
        .where(F.col("_n") >= k)
    )
    # gram hashes: transform over gram starts (consumes the array before
    # the generate, same discipline as chunk_documents), 30-bit md5
    grams = base.select(
        "doc_id",
        "_n",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"), F.col("_n") - F.lit(k).cast("long")
                ),
                lambda i: F.pmod(
                    md5_long(
                        F.array_join(
                            F.slice(F.col("_toks"), (i + 1).cast("int"), k), " "
                        )
                    ),
                    F.lit(1 << _WINNOW_HASH_BITS).cast("long"),
                ),
            )
        ).alias("pos", "gh"),
    ).select(
        "doc_id",
        (F.col("_n") - F.lit(k).cast("long") + F.lit(1)).alias("_n_grams"),
        F.col("pos").cast("long").alias("pos"),
        "gh",
    )
    key = F.col("gh") * two32 + (two32 - F.lit(1) - F.col("pos"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    starts = grams.withColumn("_wmin", F.min(key).over(win)).where(
        # one window per valid start; a doc with < w grams keeps its
        # single (short) window at start 0
        F.col("pos") <= F.greatest(F.lit(0).cast("long"), F.col("_n_grams") - w)
    )
    return (
        starts.select(
            "doc_id",
            (two32 - F.lit(1) - F.pmod(F.col("_wmin"), two32)).alias("pos"),
            # integer DIV, not `/`: the packed key is up to 62 bits and a
            # double division would shave mantissa bits above 2^53
            F.expr(f"_wmin DIV {1 << _POS_BITS}").alias("gram_hash"),
        )
        .distinct()
    )


def winnow_matches(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing winnowing fingerprints — the MOSS match
    report: ``(doc_a, doc_b, n_shared)`` with ``doc_a < doc_b`` and
    ``n_shared >= min_shared`` distinct shared fingerprint hashes.

    Fingerprint hashes present in more than ``max_df`` documents are
    boilerplate (shared headers, license blocks) and are dropped BEFORE
    the self-join — the document-frequency valve that bounds the pair
    blow-up at C·max_df² per hot hash, the same discipline as the LSH
    band valve in pipeline/dedup.py.

    The fingerprint relation feeds FOUR plan subtrees (df_counts + both
    self-join sides through ``kept``), so it is localCheckpointed: the
    tokenize → gram-explode → rolling-min-window lineage would otherwise
    replay per consumer (the filters.py anchor-relation fix, r11/r12
    advice). Fingerprints are SPARSE — density ~2/(w+1) of the token
    relation — so the cut is cheap to materialize.
    """
    fps = (
        winnow_fingerprints(docs, k=k, w=w, text_col=text_col)
        .select("doc_id", "gram_hash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    df_counts = fps.groupBy("gram_hash").agg(F.count("*").alias("_df"))
    kept = fps.join(
        df_counts.where(F.col("_df") <= max_df).select("gram_hash"), "gram_hash"
    )
    a = kept.select(F.col("gram_hash"), F.col("doc_id").alias("doc_a"))
    b = kept.select(F.col("gram_hash"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "gram_hash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
