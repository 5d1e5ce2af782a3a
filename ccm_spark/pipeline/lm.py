"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): train a small LM on a trusted reference
corpus, score every crawl document by cross-entropy under it, and keep /
bucket documents by how "reference-like" they read. Complements the
rule-based ``text.quality_filter`` (surface statistics) and the hashed
linear head ``text.classifier_score`` (supervised serving path) with the
third standard filter family: likelihood under a reference distribution.

The reference repo has no text surface at all (SURVEY.md §2.1); this is
part of the driver-mandated corpus-pipeline extension.

Model: an add-alpha smoothed bigram LM with an explicit ``<unk>`` class.
Deliberately NOT KenLM's 5-gram Kneser-Ney — the engine's contract is
deterministic, replayable arithmetic (the whole model is exact integer
counts + one smoothing formula, bit-reproducible on any cluster), and a
bigram with capped tables already separates fluent text from gibberish /
boilerplate by orders of magnitude, which is all bucketing needs. The
tables are BOUNDED by construction (top-``vocab_size`` unigrams,
top-``max_bigrams`` bigrams, both with deterministic tie-breaks), so the
model broadcasts to executors at a few MB regardless of corpus size —
training reads 100 TB, the artifact stays launchable.

Scale shape:
  - training: one explode + hash-aggregate for unigram counts, one
    adjacent-pair explode + hash-aggregate for bigrams (both map-side
    combined), vocab via distributed TakeOrdered (``orderBy().limit``) —
    the driver receives exactly vocab_size + max_bigrams bounded rows,
    never the corpus;
  - scoring: the model ships once per executor via
    ``SparkContext.broadcast``; scoring is one narrow Arrow pass (no
    join, no shuffle) and therefore runs unchanged on a STREAMING
    source — new crawl shards are scored at ingestion time;
  - bucketing: cutoffs from a rounded-value histogram (bounded driver
    rows, the ``budget_select`` pattern), assignment is a narrow
    comparison — no global sort, no per-corpus window.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.functions.hashing import tokens_col
from ccm_spark.functions.partitioning import spread

UNK = "<unk>"


def ngram_counts(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(unigram, bigram) count relations over the tokenized corpus —
    ``(token, n)`` and ``(w1, w2, n)``. Both are single map-side-combined
    hash aggregates; the bigram relation zips each token array with its
    own tail (an index-lambda ``transform``), so no self-join ever
    happens."""
    toks = docs.select(tokens_col("text").alias("toks")).where(F.size("toks") > 0)
    uni = (
        toks.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    pairs = toks.where(F.size("toks") > 1).select(
        F.explode(
            F.transform(
                F.slice("toks", 1, F.size("toks") - 1),
                lambda x, i: F.struct(
                    x.alias("w1"),
                    F.element_at(F.col("toks"), i + 2).alias("w2"),  # 1-based
                ),
            )
        ).alias("bg")
    )
    bi = (
        pairs.select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
    )
    return uni, bi


def train_bigram_lm(
    docs: DataFrame,
    vocab_size: int = 20_000,
    max_bigrams: int = 500_000,
    alpha: float = 0.1,
) -> dict:
    """Train the bounded bigram LM on a REFERENCE corpus (the trusted
    text whose distribution defines "high quality"). Returns a plain
    model dict — broadcastable, picklable, replayable:

    - ``vocab``: the top-``vocab_size`` tokens by (count desc, token asc)
      with their exact counts; everything else folds into ``<unk>``
      (``unk_count`` = total - in-vocab mass), so probability mass is
      conserved exactly.
    - ``bigrams``: the top-``max_bigrams`` VOCAB-MAPPED bigrams by
      (count desc, w1 asc, w2 asc). Dropped rare bigrams score as count
      0 under smoothing — a deterministic approximation whose effect
      vanishes as the cap grows (raise it until the artifact no longer
      fits your broadcast budget).

    Both collects are bounded by the caps via distributed TakeOrdered,
    never by corpus size. Token-less corpora raise.
    """
    if vocab_size < 1 or max_bigrams < 1:
        raise ValueError(
            f"train_bigram_lm: vocab_size and max_bigrams must be >= 1 "
            f"(got vocab_size={vocab_size}, max_bigrams={max_bigrams}) — a "
            "bigram-free model scores pure smoothed unigram counts, which "
            "is never what a perplexity filter wants"
        )
    if alpha <= 0:
        raise ValueError(
            f"train_bigram_lm: alpha must be > 0 (got {alpha}) — unsmoothed "
            "models divide by zero on any unseen bigram"
        )
    uni, bi = ngram_counts(docs)
    # two driver collects read `uni` (the vocab top-k and the total-mass
    # scalar); persist the vocab-sized relation so the corpus
    # tokenize+explode+aggregate pass behind it runs once, not twice
    from pyspark.storagelevel import StorageLevel

    uni = uni.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        vocab_rows = (
            uni.orderBy(F.col("n").desc(), F.col("token").asc())
            .limit(vocab_size)
            .collect()
        )
        if not vocab_rows:
            raise ValueError("train_bigram_lm: reference corpus has no tokens")
        vocab = {r.token: int(r.n) for r in vocab_rows}
        total = uni.agg(F.sum("n")).collect()[0][0]
    finally:
        uni.unpersist()
    unk_count = int(total) - sum(vocab.values())
    spark = docs.sparkSession
    vdf = spark.createDataFrame([(t,) for t in vocab], "token string")

    def fold_oov(df: DataFrame, col: str) -> DataFrame:
        """Replace out-of-vocab values of ``col`` with <unk> via ONE
        broadcast left join (the vocab is cap-bounded; an isin() against
        a 20k-element literal list would bloat the plan instead)."""
        marker = F.broadcast(
            vdf.select(F.col("token").alias(col), F.lit(True).alias("_inv"))
        )
        return (
            df.join(marker, col, "left")
            .withColumn(
                col, F.when(F.col("_inv").isNull(), F.lit(UNK)).otherwise(F.col(col))
            )
            .drop("_inv")
        )

    mapped = (
        fold_oov(fold_oov(bi, "w1"), "w2")
        .groupBy("w1", "w2")
        .agg(F.sum("n").alias("n"))
    )
    bigram_rows = (
        mapped.orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(max_bigrams)
        .collect()
    )
    return {
        "alpha": float(alpha),
        "vocab": vocab,
        "unk_count": unk_count,
        "total": int(total),
        "n_classes": len(vocab) + 1,  # vocab + <unk>
        "bigrams": {(r.w1, r.w2): int(r.n) for r in bigram_rows},
        "vocab_size": vocab_size,
        "max_bigrams": max_bigrams,
    }


def train_kn_bigram_lm(
    docs: DataFrame,
    vocab_size: int = 20_000,
    max_bigrams: int = 500_000,
    discount: float = 0.75,
) -> dict:
    """Interpolated Kneser-Ney bigram LM over the SAME bounded tables as
    :func:`train_bigram_lm` — the smoothing family KenLM (and therefore
    CCNet's actual filter) uses. Add-alpha systematically over-scores
    continuations of frequent unigrams (the "San Francisco" effect:
    'francisco' is frequent but follows almost nothing except 'san');
    absolute discounting + the CONTINUATION distribution fixes exactly
    that, so head/tail perplexity bucketing separates template-heavy
    boilerplate from fluent prose more sharply.

    Everything stays in the engine's replayable-arithmetic contract:
    the extra KN tables are EXACT INTEGER aggregates of the capped
    bigram table — out-mass ``c_out(w1)``, distinct-successor counts
    ``N1+(w1,·)``, distinct-predecessor (continuation) counts
    ``N1+(·,w2)``, and the capped bigram type count — so a DuckDB twin
    (``sql_lm_perplexity_kn``) re-derives the whole model. The
    continuation distribution is add-one smoothed over the K classes so
    every token keeps positive mass:

        pc(w)      = (N1+(·,w) + 1) / (N1+(·,·) + K)
        p(w | w')  = max(c(w',w) - d, 0)/c_out(w') +
                     d · N1+(w',·)/c_out(w') · pc(w)      if c_out(w') > 0
                   = pc(w)                                 otherwise
        p(first)   = pc(first)   (the bounded form has no separate
                                  start distribution; the continuation
                                  distribution is the standard stand-in)

    Derived from the CAPPED table (cap first, derive after), so the cap
    is part of the deterministic model definition, exactly like
    train_bigram_lm's dropped-rare-bigram semantics."""
    if not 0.0 < discount < 1.0:
        raise ValueError(
            f"train_kn_bigram_lm: discount must be in (0, 1) (got {discount})"
        )
    base = train_bigram_lm(docs, vocab_size, max_bigrams, alpha=1.0)
    del base["alpha"]  # add-alpha's knob — not part of a KN model
    c_out: dict[str, int] = {}
    n1p_fwd: dict[str, int] = {}
    n1p_bwd: dict[str, int] = {}
    for (w1, w2), n in base["bigrams"].items():
        c_out[w1] = c_out.get(w1, 0) + n
        n1p_fwd[w1] = n1p_fwd.get(w1, 0) + 1
        n1p_bwd[w2] = n1p_bwd.get(w2, 0) + 1
    return {
        **base,
        "smoothing": "kn",
        "discount": float(discount),
        "c_out": c_out,
        "n1p_fwd": n1p_fwd,
        "n1p_bwd": n1p_bwd,
        "n1p_total": len(base["bigrams"]),
    }


def _score_kn(model: dict, mapped: list[str]) -> float:
    """Sum of -log2 p over an OOV-folded token sequence under the KN
    model — expression shapes mirror sql_lm_perplexity_kn term for term
    (same division order), so both engines compute identical doubles."""
    bigrams = model["bigrams"]
    c_out = model["c_out"]
    n1p_fwd = model["n1p_fwd"]
    n1p_bwd = model["n1p_bwd"]
    d = model["discount"]
    denom = model["n1p_total"] + model["n_classes"]

    def pc(w: str) -> float:
        return (n1p_bwd.get(w, 0) + 1) / denom

    bits = -math.log2(pc(mapped[0]))
    for prev, w in zip(mapped, mapped[1:]):
        c1 = c_out.get(prev)
        if c1:
            p = (
                max(bigrams.get((prev, w), 0) - d, 0.0) / c1
                + d * n1p_fwd[prev] / c1 * pc(w)
            )
        else:
            p = pc(w)
        bits -= math.log2(p)
    return bits


def score_model(model: dict, tokens: list[str]) -> tuple[int, float, float]:
    """Pure-Python scoring kernel — (n_scored, cross_entropy_bits,
    perplexity) of one token sequence under the model. Shared by the
    distributed Arrow pass AND the tests' driver replay, so the two are
    bit-identical by construction (same dict lookups, same math.log2).
    Dispatches on ``model["smoothing"]`` — "kn" scores via
    :func:`_score_kn`, otherwise add-alpha:

    First token scores under the smoothed unigram; every next token under
    the smoothed bigram conditioned on its predecessor:
        p(w)        = (c(w) + a) / (total + a*K)
        p(w | w')   = (c(w', w) + a) / (c(w') + a*K)
    with K = vocab size + 1 (the ``<unk>`` class) and OOV tokens mapped
    to ``<unk>`` on BOTH sides of the conditional."""
    if model.get("smoothing") == "kn":
        if not tokens:
            return 0, float("nan"), float("nan")
        mapped = [t if t in model["vocab"] else UNK for t in tokens]
        h = _score_kn(model, mapped) / len(mapped)
        return len(mapped), h, 2.0**h
    vocab = model["vocab"]
    bigrams = model["bigrams"]
    a = model["alpha"]
    k = model["n_classes"]
    unk_count = model["unk_count"]
    if not tokens:
        return 0, float("nan"), float("nan")
    mapped = [t if t in vocab else UNK for t in tokens]

    def c_uni(w: str) -> int:
        return unk_count if w == UNK else vocab[w]

    log2_sum = -math.log2(
        (c_uni(mapped[0]) + a) / (model["total"] + a * k)
    )
    for prev, w in zip(mapped, mapped[1:]):
        p = (bigrams.get((prev, w), 0) + a) / (c_uni(prev) + a * k)
        log2_sum -= math.log2(p)
    h = log2_sum / len(mapped)
    return len(mapped), h, 2.0**h


def perplexity(docs: DataFrame, model: dict) -> DataFrame:
    """(doc_id, n_scored, cross_entropy, perplexity) per document under a
    :func:`train_bigram_lm` model — cross_entropy in bits/token, rounded
    at 6 like every scored double in the engine. Token-less docs emit
    NULL scores (they are unknowable, not infinitely bad). The model
    broadcasts once per executor; the pass is narrow and streaming-safe.
    """
    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast(model)

    def run(batches):
        from ccm_spark.functions.hashing import py_tokens
        from ccm_spark.pipeline.lm import score_model

        m = bc.value
        for pdf in batches:
            n_out, h_out, p_out = [], [], []
            for text in pdf["text"]:
                n, h, ppl = score_model(m, py_tokens(text))
                if n == 0:
                    n_out.append(0)
                    h_out.append(None)
                    p_out.append(None)
                else:
                    n_out.append(n)
                    h_out.append(round(h, 6))
                    p_out.append(round(ppl, 6))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_scored": pd.Series(n_out, dtype="int64"),
                    "cross_entropy": pd.Series(h_out, dtype="float64"),
                    "perplexity": pd.Series(p_out, dtype="float64"),
                }
            )

    out = docs.select("doc_id", "text")
    if not docs.isStreaming:
        out = spread(out, "doc_id")
    return out.mapInPandas(
        run,
        "doc_id long, n_scored long, cross_entropy double, perplexity double",
    )


def perplexity_buckets(
    scored: DataFrame,
    head_frac: float = 1.0 / 3.0,
    middle_frac: float = 1.0 / 3.0,
    precision: int = 2,
) -> DataFrame:
    """CCNet's head/middle/tail split: documents bucketed by
    cross-entropy percentile — ``head`` is the most reference-like
    ``head_frac`` of scored docs, ``tail`` the least. Adds ``bucket``;
    NULL-scored (token-less) docs get NULL bucket.

    No global sort: cutoffs come from a histogram of cross-entropy
    ROUNDED at ``precision`` decimals (one hash-aggregate; the driver
    sees one row per distinct rounded value — bounded by the score
    range, thousands not billions), then assignment is a narrow
    comparison against the two broadcast cutoffs. Boundary granularity
    is the rounding step: every doc sharing a rounded value lands in ONE
    bucket, so realized fractions are exact to within the largest
    histogram bin (raise ``precision`` to tighten — the driver row count
    scales by 10x per decimal). Deterministic and
    partitioning-independent."""
    if not 0 < head_frac < 1 or not 0 < middle_frac < 1 or head_frac + middle_frac >= 1:
        raise ValueError("perplexity_buckets: fractions must partition (0, 1)")
    key = F.round(F.col("cross_entropy"), precision)
    hist = (
        scored.where(F.col("cross_entropy").isNotNull())
        .groupBy(key.alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    n_scored = sum(r.n for r in hist)
    if n_scored == 0:
        return scored.withColumn("bucket", F.lit(None).cast("string"))
    head_cut = tail_cut = None
    acc = 0
    for r in sorted(hist, key=lambda r: r.h):
        acc += r.n
        if head_cut is None and acc >= head_frac * n_scored:
            head_cut = r.h
        if tail_cut is None and acc >= (head_frac + middle_frac) * n_scored:
            tail_cut = r.h
            break
    if tail_cut is None:
        tail_cut = max(r.h for r in hist)
    return scored.withColumn(
        "bucket",
        F.when(F.col("cross_entropy").isNull(), F.lit(None).cast("string"))
        .when(key <= F.lit(head_cut), F.lit("head"))
        .when(key <= F.lit(tail_cut), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
