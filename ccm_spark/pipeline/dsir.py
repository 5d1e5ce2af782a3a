"""DSIR-style data selection — importance resampling toward a target
distribution (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169).

The pipeline stage the other text operators don't cover: given a RAW
corpus and a small TARGET corpus (the domain you want more of), weight
every raw document by how target-like it is under hashed-n-gram bag
models, then resample the raw corpus toward the target distribution.
The reference engine has no text surface at all (SURVEY.md §2.1); this
is extension surface in the engine's house style:

  - **Everything is relational** — hashed n-gram features are a codegen
    explode (no UDF), the two corpus histograms are dim-bounded hash
    aggregates, the per-document log-weight is one join + one grouped
    sum, and resampling is a Gumbel top-k whose "randomness" is the
    engine-portable md5 uniform. A DuckDB twin replays the whole chain
    (test-pinned).
  - **Deterministic.** Exact integer feature counts; smoothed log
    probabilities derive from those integers; the Gumbel perturbation
    is a pure function of (doc_id, seed). Same inputs => same selected
    set on any partitioning.

100 TB shape: the raw corpus is touched twice (feature explode + the
weight join) and shuffled on bounded keys only — feat_idx (<= dim) and
doc_id; the ratio relation is dim rows (KBs) and broadcasts. The target
corpus is small by definition. Resampling's top-k is the engine's
standard two-phase rank.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.functions.hashing import md5_long, tokens_col

#: hashed feature space for the n-gram bag models (Xie et al. use 10k)
DSIR_DIM = 10_000
#: word-n-gram order (bigrams: the paper's default for quality/domain)
DSIR_N = 2
#: add-alpha smoothing for both corpus histograms
DSIR_ALPHA = 0.5
#: md5_long's range — the uniform's denominator
_H_SPACE = float(1 << 60)


def ngram_feature_counts(
    docs: DataFrame, n: int = DSIR_N, dim: int = DSIR_DIM
) -> DataFrame:
    """(doc_id, feat_idx, cnt): hashed word-n-gram counts WITH
    multiplicity (unlike the dedup family's distinct shingles — bag
    models need the counts). Documents with fewer than ``n`` tokens
    contribute nothing. Pure codegen: tokens → sliced n-grams →
    md5 % dim → counted."""
    if n < 1 or dim < 1:
        raise ValueError(f"ngram_feature_counts: n and dim must be >= 1 (got {n}, {dim})")
    from ccm_spark.functions.partitioning import spread

    # r16: spread single-file inputs BEFORE the gram build — the n-gram
    # transform + per-gram md5 are interpreted higher-order functions
    # (CPU-bound per ROW), and a byte-small parquet input otherwise runs
    # the whole pass on one or two scan partitions (profiled: the raw
    # feats pass was ~4.7 s warm at sf0.1, the dominant dsir cost). The
    # engine-wide spread() rule, same as corpus_divergence's counts().
    docs = spread(docs, "doc_id")
    toks = tokens_col("text")
    # guarded: sequence(0, -1) would be a DESCENDING sequence in Spark,
    # not an empty one — short docs must yield an empty gram array
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .select(
            "doc_id",
            (md5_long(F.concat(F.lit("dsir:"), F.col("gram"))) % dim).alias(
                "feat_idx"
            ),
        )
        .groupBy("doc_id", "feat_idx")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_ratios(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    n: int = DSIR_N,
    dim: int = DSIR_DIM,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """(feat_idx, log_ratio): the per-feature importance term
    ``log p_target(f) - log p_raw(f)`` under add-``alpha`` smoothed
    hashed-n-gram bag models of the two corpora. At most ``dim`` rows —
    the broadcastable model artifact.

    EAGER: constructing this relation runs Spark jobs immediately (the
    dim-bounded joined counts are localCheckpoint'ed so downstream
    consumers stop replaying the corpus-sized aggregate subtrees — the
    ``corpus_divergence`` precedent; ADVICE r15 #2 asked for the
    laziness-contract change to be documented). The checkpointed blocks
    are freed when the intermediate DataFrame is garbage-collected."""
    t = (
        ngram_feature_counts(target_docs, n, dim)
        .groupBy("feat_idx")
        .agg(F.sum("cnt").alias("tc"))
    )
    r = (
        ngram_feature_counts(raw_docs, n, dim)
        .groupBy("feat_idx")
        .agg(F.sum("cnt").alias("rc"))
    )
    return _log_ratio_rel(t, r, dim, alpha)


def _log_ratio_rel(t: DataFrame, r: DataFrame, dim: int, alpha: float) -> DataFrame:
    """(feat_idx, log_ratio) from the two aggregated count relations.

    The dim-bounded joined counts are eagerly localCheckpoint'ed (the
    corpus_divergence precedent): `tot` and the final projection both
    consume them, and without the cut each consumer would replay the
    corpus-sized tokenize+aggregate subtrees — the r14 dsir_weights plan
    scanned the documents parquet 6 times for exactly this reason."""
    # full outer on the bounded feature space: a feature seen in only
    # one corpus still gets its smoothed term
    joined = t.join(r, "feat_idx", "outer").select(
        "feat_idx",
        F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
        F.coalesce(F.col("rc"), F.lit(0)).alias("rc"),
    ).localCheckpoint(eager=True)
    tot = joined.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )
    return joined.crossJoin(F.broadcast(tot)).select(
        "feat_idx",
        (
            F.log((F.col("tc") + alpha) / (F.col("tt") + alpha * dim))
            - F.log((F.col("rc") + alpha) / (F.col("rt") + alpha * dim))
        ).alias("log_ratio"),
    )


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n: int = DSIR_N,
    dim: int = DSIR_DIM,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """(doc_id, log_w): every raw document's importance log-weight —
    its feature counts dotted with the log-ratio relation, rounded at 6
    after the grouped sum (the engine-wide boundary discipline).
    Documents with no features (< n tokens) weigh 0.0 (neutral).

    Plan: one broadcast join of the dim-row ratio relation onto the raw
    feature counts + one hash aggregate on doc_id; the raw corpus never
    joins the target corpus directly.

    r15 plan shape: the raw feature counts are computed ONCE and
    persisted — the ratio model's raw histogram is their feat_idx
    rollup (identical integer sums), and the scoring join reuses the
    same relation, so the raw corpus is tokenized/exploded once instead
    of the r14 plan's three times. The cached subtree is attached as
    ``_ccm_persisted`` for ``plans.cross_map.release_cached``."""
    from pyspark.storagelevel import StorageLevel

    feats = ngram_feature_counts(raw_docs, n, dim).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    t = (
        ngram_feature_counts(target_docs, n, dim)
        .groupBy("feat_idx")
        .agg(F.sum("cnt").alias("tc"))
    )
    r = feats.groupBy("feat_idx").agg(F.sum("cnt").alias("rc"))
    ratios = _log_ratio_rel(t, r, dim, alpha)
    scored = (
        feats.join(F.broadcast(ratios), "feat_idx")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 6).alias("log_w"))
    )
    out = raw_docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("log_w"), F.lit(0.0)).alias("log_w")
    )
    out._ccm_persisted = [feats]
    return out


def dsir_resample(
    weights: DataFrame, k: int, seed: int = 7
) -> DataFrame:
    """(doc_id, log_w, gumbel_key) for the ``k`` selected documents —
    Gumbel top-k sampling WITHOUT replacement from the softmax of the
    log-weights (the Gumbel-max trick: top-k of ``log_w + G_i`` is a
    draw from the importance distribution), with the Gumbel noise
    derived from the engine-portable md5 uniform of (doc_id, seed) — a
    pure function of the input, so the selected set is deterministic
    and SQL-replayable while still being a faithful sample.

    Ties (astronomically unlikely at 60 hash bits) break on doc_id.
    Top-k runs two-phase (the vocab_topk / events_pair_series trick):
    each partition prunes to its local top-k first, so the single-task
    global rank only ever sees ``k x n_partitions`` survivors — never
    the whole corpus."""
    if k < 1:
        raise ValueError(f"dsir_resample: k must be >= 1, got {k}")
    u = (
        md5_long(
            F.concat(
                F.lit("dsirg:"),
                F.col("doc_id").cast("string"),
                F.lit(f":{seed}"),
            )
        ).cast("double")
        + 1.0
    ) / (_H_SPACE + 2.0)  # u in (0, 1) strictly — both log() calls finite
    key = F.col("log_w") - F.log(-F.log(u))
    keyed = weights.select("doc_id", "log_w", key.alias("gumbel_key"))
    order = [F.col("gumbel_key").desc(), F.col("doc_id").asc()]
    local_w = Window.partitionBy("_split").orderBy(*order)
    survivors = (
        keyed.withColumn("_split", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(local_w))
        .where(F.col("_lr") <= k)
    )
    w = Window.orderBy(*order)
    return (
        survivors.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("doc_id", "log_w", "gumbel_key")
    )


def corpus_divergence(
    docs_a: DataFrame,
    docs_b: DataFrame,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Corpus-level distribution drift: smoothed unigram KL (both
    directions) and Jensen-Shannon divergence between two corpora, plus
    vocabulary overlap — the one-number answers to "how different is
    this source/shard/snapshot from the reference?" that gate a mixing
    or curriculum decision (DSIR weights individual docs; this compares
    whole corpora).

    Add-alpha smoothing over the UNION vocabulary keeps every log
    finite: p(t) = (c(t) + alpha) / (N + alpha·V). JS is computed
    against the pointwise mixture m = (p_a + p_b)/2, so it is symmetric
    and bounded by 1 bit.

    Plan shape: two map-side-combined unigram aggregates, one
    vocab-sized full-outer join, totals as a broadcast 1-row cross join
    (never collected), one final aggregate. Nothing is per-occurrence
    past the first combine; skew-free (keys are tokens). Returns ONE
    row: (n_tokens_a, n_tokens_b, vocab_a, vocab_b, vocab_shared,
    vocab_union, kl_ab_bits, kl_ba_bits, js_bits), divergences rounded
    at the boundary.
    """

    def counts(docs: DataFrame, name: str) -> DataFrame:
        from ccm_spark.functions.partitioning import spread

        return (
            spread(docs, "doc_id")
            .select(F.explode(tokens_col("text")).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias(name))
        )

    # materialise the vocab-sized joined counts ONCE (the collocations
    # localCheckpoint precedent): `tot`, `sums`, and the final cross
    # join would otherwise each replay both corpus tokenize+aggregate
    # passes — 6 corpus scans instead of 2
    j = (
        counts(docs_a, "ca")
        .join(counts(docs_b, "cb"), "token", "full_outer")
        .select(
            F.coalesce("ca", F.lit(0)).cast("double").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("double").alias("cb"),
        )
        .localCheckpoint(eager=True)
    )
    tot = j.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count("*").cast("double").alias("v"),
        F.sum((F.col("ca") > 0).cast("long")).alias("vocab_a"),
        F.sum((F.col("cb") > 0).cast("long")).alias("vocab_b"),
        F.sum(((F.col("ca") > 0) & (F.col("cb") > 0)).cast("long")).alias(
            "vocab_shared"
        ),
        F.count("*").alias("vocab_union"),
    )
    pa = (F.col("ca") + F.lit(alpha)) / (F.col("na") + F.lit(alpha) * F.col("v"))
    pb = (F.col("cb") + F.lit(alpha)) / (F.col("nb") + F.lit(alpha) * F.col("v"))
    m = (pa + pb) / F.lit(2.0)
    sums = (
        j.crossJoin(F.broadcast(tot.select("na", "nb", "v")))
        .select(
            (pa * F.log2(pa / pb)).alias("t_ab"),
            (pb * F.log2(pb / pa)).alias("t_ba"),
            (
                F.lit(0.5) * pa * F.log2(pa / m)
                + F.lit(0.5) * pb * F.log2(pb / m)
            ).alias("t_js"),
        )
        .agg(
            F.sum("t_ab").alias("kl_ab"),
            F.sum("t_ba").alias("kl_ba"),
            F.sum("t_js").alias("js"),
        )
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)
    return sums.crossJoin(F.broadcast(tot)).select(
        F.col("na").cast("long").alias("n_tokens_a"),
        F.col("nb").cast("long").alias("n_tokens_b"),
        "vocab_a",
        "vocab_b",
        "vocab_shared",
        "vocab_union",
        r6(F.col("kl_ab")).alias("kl_ab_bits"),
        r6(F.col("kl_ba")).alias("kl_ba_bits"),
        r6(F.col("js")).alias("js_bits"),
    )
