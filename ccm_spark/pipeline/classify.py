"""Trainable document-quality classifier — hashed-feature logistic
regression, the fasttext-style "model-based quality filter" stage of a
training-data pipeline (CCNet / GPT-3 / LLaMA data work all gate on one),
next to the rule-based ``text.quality_filter``.

TWO classifier variants exist in the engine, for two regimes (the same
split as the two k-means trainers in similarity/clustering):

  - ``text.train_classifier`` / ``text.classifier_score`` — the
    PRODUCTION shape: 2^18 mean-pooled unigram+bigram hashed features,
    L2 regularisation, kernel-side gradients; pinned by
    ``tests/test_corpus_quality.py`` and used by the streaming example.
  - THIS module — the ORACLE-GRADE shape: count-ratio unigram features
    over a bounded dim, fully relational training, and exact-fixed-point
    serving, designed so EVERY step has a DuckDB twin
    (``plans.oracle_sql_ext.sql_quality_classifier_scores`` replays the
    whole trainer + serving hash-exactly) — the correctness-evidence
    path a driver gate rotation would use, and the variant that
    surfaced the engine-wide decimal-tie rounding hazards documented in
    SCALE.md.

The reference has no classifier surface (SURVEY.md §2.1); this is
extension surface. Design goals, in the engine's house style:

  - **Distributed full-batch training, bounded driver artifact.** The
    hashed feature relation (hashing trick: md5(token) % dim) is built
    once and persisted; every gradient-descent iteration is two hash
    aggregates over it (margins per doc, gradient per feature) with the
    current weights riding a broadcast join — the driver only ever
    holds ``dim + 1`` doubles, never documents. Same reduction shape as
    the unigram-LM EM loop.
  - **Deterministic.** Exact integer token counts; per-doc feature
    values are count ratios; every weight update rounds at
    ``W_ROUND`` decimals AFTER the global gradient sum (the
    kmeans/PQ/unigram discipline — partition-order float drift is
    absorbed before it can compound across iterations). Same corpus +
    labels + params => bit-identical model on any partitioning
    (test-pinned).
  - **Serving is one narrow Arrow pass.** ``score_quality`` re-derives
    the hashed features inside the kernel from the frozen model in the
    closure (hashlib md5 == the engine's md5_long by construction,
    pinned) — no shuffle, streaming-safe, the same shape as
    ``lm.perplexity`` and ``tokenize.tokenize_docs``.

100 TB: training cost is n_iters corpus passes over the persisted
feature relation (map-side combined aggregates, keys bounded by doc
count and by ``dim``); serving is embarrassingly parallel. ``dim`` is
the usual hashing-trick knob — collisions trade accuracy for a fixed
model size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.functions.hashing import md5_long, tokens_col
from ccm_spark.functions.partitioning import spread

#: default hashed-feature dimensionality (fasttext-style buckets)
FEAT_DIM = 256
#: weight/bias rounding after each global gradient sum
W_ROUND = 6
#: serving-score rounding. Margins are sums of 6-decimal weights times
#: short-decimal count ratios and can land EXACTLY on decimal rounding
#: ties at any precision — so the kernel rounds with
#: hashing.py_round_half_up (the shortest-decimal HALF_UP rule Spark's
#: F.round and DuckDB's round share), never the builtin binary-banker's
#: round; the SQL training-replay pin in tests/test_classify.py is
#: exact because of it
SCORE_ROUND = 9
#: feature-hash salt — shared with the serving kernel and any SQL twin
_FEAT_SALT = "qf:"


def hashed_features(docs: DataFrame, dim: int = FEAT_DIM) -> DataFrame:
    """(doc_id, feat_idx, x): hashing-trick bag of words. ``x`` is the
    token-count RATIO within the document (so margins are scale-free in
    document length); one codegen explode + one map-side-combined
    aggregate, no UDF. The per-doc total is the token COUNT computed at
    the scan (size of the token array, carried through the explode as a
    constant-per-doc column) — a window over doc_id would cost a second
    exchange, since the aggregate's (doc_id, feat_idx) partitioning
    does not co-locate doc_id alone."""
    toks = tokens_col("text")
    tok = docs.select(
        "doc_id",
        F.size(toks).alias("_t"),
        F.explode(toks).alias("tok"),
    )
    return (
        tok.select(
            "doc_id",
            "_t",
            (md5_long(F.concat(F.lit(_FEAT_SALT), F.col("tok"))) % dim).alias(
                "feat_idx"
            ),
        )
        .groupBy("doc_id", "feat_idx")
        .agg(F.count("*").alias("cnt"), F.first("_t").alias("_t"))
        .select(
            "doc_id",
            "feat_idx",
            (F.col("cnt").cast("double") / F.col("_t")).alias("x"),
        )
    )


def train_quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    dim: int = FEAT_DIM,
    n_iters: int = 30,
    lr: float = 2.0,
) -> dict:
    """Full-batch logistic regression on hashed features.

    ``labels`` is ``(doc_id, label)`` with label in {0, 1} (double or
    int); docs without a label row are EXCLUDED from training (inner
    join) — score them afterwards with :func:`score_quality`. Returns
    ``{"weights": {feat_idx: w}, "bias": b, "dim": dim,
    "loss_history": [...]}``.

    Per iteration (ONE job since r15): margins per labelled doc = one
    broadcast join of the dim-row weight relation + one hash aggregate
    on doc_id; the per-feature gradient is one hash aggregate on
    feat_idx, rounded at ``W_ROUND`` after the global sum, with a
    sentinel bias feature row (feat_idx = -1, x = 1) per doc carrying
    the bias gradient and the loss in the same aggregate. The driver
    applies the update to its dim-sized vector; no per-doc data ever
    reaches the driver."""
    if n_iters < 1 or dim < 1:
        raise ValueError(
            f"train_quality_classifier: n_iters and dim must be >= 1 "
            f"(got {n_iters}, {dim})"
        )
    from pyspark.storagelevel import StorageLevel

    spark = docs.sparkSession
    lab = labels.select("doc_id", F.col("label").cast("double").alias("y"))
    feats = (
        hashed_features(spread(docs, "doc_id"), dim)
        .join(lab, "doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # r15: one sentinel BIAS row per trained doc (feat_idx = -1, x = 1)
    # rides the same relation, so each iteration's single feat_idx
    # aggregate also yields the bias gradient and the loss — the r14
    # loop ran a second job (scored.agg) and re-read the persisted
    # margin relation for them. Derived from the CACHED feats (docs
    # with no token rows stay excluded — bias rows exist only for docs
    # already in the relation, training membership unchanged); margins
    # are unaffected because w never contains feat_idx -1, so the bias
    # row contributes x * 0.0.
    bias_rows = feats.groupBy("doc_id").agg(F.first("y").alias("y")).select(
        "doc_id", F.lit(-1).cast("long").alias("feat_idx"), F.lit(1.0).alias("x"), "y"
    )
    n_docs = bias_rows.count()
    if n_docs == 0:
        feats.unpersist()
        raise ValueError("train_quality_classifier: no labelled documents")
    train_rel = feats.select("doc_id", "feat_idx", "x", "y").unionByName(bias_rows)

    w: dict[int, float] = {}
    b = 0.0
    loss_history: list[float] = []
    for _ in range(n_iters):
        w_df = spark.createDataFrame(
            [(int(i), float(v)) for i, v in w.items()] or [(0, 0.0)],
            "feat_idx long, w double",
        )
        scored = (
            train_rel.join(F.broadcast(w_df), "feat_idx", "left")
            .groupBy("doc_id")
            .agg(
                (
                    F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0)))
                    + F.lit(b)
                ).alias("m"),
                F.first("y").alias("y"),
            )
            .select(
                "doc_id",
                "y",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))).alias("p"),
            )
        )
        # ONE aggregate job per iteration: the sentinel bias rows make
        # the feat_idx -1 group's g the bias gradient, and the loss sum
        # restricted to those rows (one term per doc) rides as a second
        # agg column — only the -1 group's value is read
        grad_and_loss = (
            train_rel.select("doc_id", "feat_idx", "x")
            .join(scored.select("doc_id", "y", "p"), "doc_id")
            .groupBy("feat_idx")
            .agg(
                F.round(
                    F.sum(F.col("x") * (F.col("p") - F.col("y"))), W_ROUND
                ).alias("g"),
                F.round(
                    -F.sum(
                        F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-15)))
                        + (1.0 - F.col("y"))
                        * F.log(F.greatest(1.0 - F.col("p"), F.lit(1e-15)))
                    ),
                    W_ROUND,
                ).alias("loss"),
            )
            .collect()
        )
        gl = next(r for r in grad_and_loss if r.feat_idx == -1)
        grad_and_loss = [r for r in grad_and_loss if r.feat_idx != -1]
        # the update rounding must be the SAME shortest-decimal HALF_UP
        # rule the DuckDB twin applies — lr * g / n_docs IS a short
        # decimal (g has 6 decimals), so builtin banker's rounding can
        # land on a genuine tie and diverge (e.g. g=0.000125, n=500:
        # Python round(5e-7, 6) = 0.0, DuckDB round = 1e-6)
        from ccm_spark.functions.hashing import py_round_half_up

        for r in grad_and_loss:
            nw = py_round_half_up(w.get(r.feat_idx, 0.0) - lr * r.g / n_docs, W_ROUND)
            if nw == 0.0:
                w.pop(r.feat_idx, None)
            else:
                w[r.feat_idx] = nw
        b = py_round_half_up(b - lr * gl.g / n_docs, W_ROUND)
        loss_history.append(float(gl.loss) / n_docs)
    feats.unpersist()
    return {
        "weights": {int(i): float(v) for i, v in w.items()},
        "bias": float(b),
        "dim": int(dim),
        "loss_history": loss_history,
    }


def score_quality(docs: DataFrame, model: dict) -> DataFrame:
    """(doc_id, score, prob): the frozen model applied in ONE narrow
    Arrow pass — features re-derived in-kernel (hashlib md5 ==
    md5_long, test-pinned), weights in the closure (dim doubles),
    no shuffle, streaming-safe. Token-less docs score the bias.

    The margin is computed AND ROUNDED in exact fixed-point: weights
    and bias are 6-decimal values, so ``w * 1e6`` / ``b * 1e6`` are
    exact integers, the dot product numerator ``S = sum(w_int *
    count)`` is an order-free integer sum, and the margin is the exact
    rational ``(S + b_int * n_tokens) / (n_tokens * 1e6)``. The
    9-decimal rounding is then INTEGER HALF_UP on that rational
    (``(2*|numer| + den) // (2*den)`` at the 1e9 scale) — never a
    float-then-round: a float margin lands on true decimal TIES here
    (6-decimal weights x power-of-two count ratios), where both
    summation order (observed as 1-in-250 score mismatches before the
    integer dot product) and the ROUNDING RULE ITSELF (observed at
    sf0.01: py_round_half_up rounds the double's shortest repr while
    DuckDB's round multiplies by 1e9 first — a margin one ulp below a
    .5 boundary splits the engines) decide the output. The SQL training
    replay in tests/test_classify.py and the gated
    quality_classifier_scores row are exact because of it."""
    import pandas as pd

    w_int = {
        int(i): int(round(float(v) * 1_000_000))
        for i, v in model["weights"].items()
    }
    b_int = int(round(float(model["bias"]) * 1_000_000))
    dim = int(model["dim"])
    bc = docs.sparkSession.sparkContext.broadcast((w_int, b_int, dim))

    # margin * 10^SCORE_ROUND = (S + b_int*t) * 10^(SCORE_ROUND-6) / t —
    # exact integers (weights/bias carry 6 decimals)
    scale_num = 10 ** (SCORE_ROUND - 6)
    inv_scale = float(10**SCORE_ROUND)

    def run(batches):
        import hashlib

        import numpy as np

        from ccm_spark.functions.hashing import py_tokens

        wts, bi, d = bc.value
        for pdf in batches:
            scores = []
            for text in pdf["text"]:
                counts: dict[int, int] = {}
                toks = py_tokens(text)
                for t in toks:
                    h = int(
                        hashlib.md5((_FEAT_SALT + t).encode("utf-8")).hexdigest()[:15],
                        16,
                    ) % d
                    counts[h] = counts.get(h, 0) + 1
                s_int = 0
                for idx, c in counts.items():
                    wv = wts.get(idx)
                    if wv is not None:
                        s_int += wv * c
                den = len(toks) or 1  # token-less docs score the bias
                numer = (s_int + bi * den) * scale_num
                # integer HALF_UP (away from zero) of the exact rational
                # numer/den at the 1e9 scale, then ONE float division —
                # identical integer in every engine, identical double out
                q9, r9 = divmod(abs(numer), den)
                n9 = q9 + (1 if 2 * r9 >= den else 0)
                scores.append((n9 if numer >= 0 else -n9) / inv_scale)
            s = pd.Series(scores, dtype="float64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "score": s,
                    # np.exp, not math.exp: a margin below ~-709 must
                    # saturate to prob 0.0 (exp -> inf -> 1/inf), where
                    # math.exp raises OverflowError and kills the task
                    "prob": 1.0 / (1.0 + np.exp(-s.to_numpy())),
                }
            )

    out = docs.select("doc_id", "text")
    if not docs.isStreaming:
        out = spread(out, "doc_id")
    return out.mapInPandas(run, "doc_id long, score double, prob double")
