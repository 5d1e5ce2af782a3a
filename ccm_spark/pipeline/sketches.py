"""Mergeable corpus-statistics sketches — the incremental-pipeline
answer to "how many distinct tokens / how often does this token occur"
at 100 TB.

The reference has no sketch surface (SURVEY.md §2.1); this is extension
surface for corpus curation at scale, where exact global statistics are
either a full shuffle (distinct counts) or an unbounded-state stream
(frequencies). Both families here are MERGEABLE: yesterday's persisted
sketch plus today's increment equals the sketch of the union corpus —
the property that makes per-day artifacts composable without re-reading
history.

  - **HLL distinct sketches** (`token_hll`, `hll_merge`) use Spark's
    built-in Apache DataSketches HllSketch aggregates — JVM-side,
    whole-stage-codegen'd, binary-mergeable across relations and days.
  - **Count-min frequency sketches** (`cms_build`, `cms_merge`,
    `cms_lookup`) are implemented as a RELATION (depth x width counter
    rows) rather than an opaque binary: merge = groupBy-sum (exact
    integer commutativity => increment-merge equals union-build
    BIT-FOR-BIT, which the tests pin), lookup = one broadcast join +
    min, and the md5-derived row hashes are the engine-portable kind
    every other operator family here uses — so a DuckDB replay can
    re-derive the whole sketch.

100 TB design: both sketches reduce a corpus pass to a KB-to-MB-scale
artifact with one map-side-combined aggregation; no driver collect
anywhere in the build; per-group sketches shuffle on the group key
only. CMS width/depth are the accuracy knobs (error <= e*N/width with
probability 1 - (1/2)^depth on standard bounds).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.functions.hashing import md5_long, tokens_col

#: default CMS geometry: 4 rows x 2048 counters = 64 KiB of longs
CMS_DEPTH = 4
CMS_WIDTH = 2048
#: default HLL precision (Spark's default lgConfigK): ~1.6% rel. error
HLL_LGK = 12


def token_hll(
    docs: DataFrame, by: str | None = "source", lgk: int = HLL_LGK
) -> DataFrame:
    """One row per group: DataSketches HLL sketch binaries + estimates
    for distinct tokens and distinct documents. ``by=None`` gives one
    corpus-level row. The sketch columns are the PERSISTABLE artifact —
    write them per shard/day and fold with :func:`hll_merge` later."""
    # explode_OUTER: a token-less doc keeps one row with tok=NULL so the
    # doc sketch still counts it (hll_sketch_agg ignores NULLs, so the
    # token sketch is unaffected) — plain explode dropped empty docs
    # from distinct_docs_est and vanished all-empty groups entirely,
    # misreporting exactly the degraded-extraction drift scenario
    toks = docs.select(
        *( [F.col(by)] if by else [] ),
        F.col("doc_id"),
        F.explode_outer(tokens_col("text")).alias("tok"),
    )
    keys = [by] if by else []
    out = toks.groupBy(*keys).agg(
        F.hll_sketch_agg("tok", F.lit(lgk)).alias("token_hll"),
        F.hll_sketch_agg("doc_id", F.lit(lgk)).alias("doc_hll"),
    )
    return out.select(
        *keys,
        "token_hll",
        "doc_hll",
        F.hll_sketch_estimate("token_hll").alias("distinct_tokens_est"),
        F.hll_sketch_estimate("doc_hll").alias("distinct_docs_est"),
    )


def hll_merge(sketches: DataFrame, by: str | None = None) -> DataFrame:
    """Fold sketch rows (any number of shards/days/groups) into one
    sketch per ``by`` group (or one total row): the union sketch of the
    union corpus, without touching the corpus again."""
    keys = [by] if by else []
    out = sketches.groupBy(*keys).agg(
        F.hll_union_agg("token_hll").alias("token_hll"),
        F.hll_union_agg("doc_hll").alias("doc_hll"),
    )
    return out.select(
        *keys,
        "token_hll",
        "doc_hll",
        F.hll_sketch_estimate("token_hll").alias("distinct_tokens_est"),
        F.hll_sketch_estimate("doc_hll").alias("distinct_docs_est"),
    )


def _cms_cols(tok, depth: int, width: int) -> list:
    """depth (row, col) pairs per token: engine-portable md5-derived
    hashes, seeded per row — the same determinism toolkit as MinHash."""
    return [
        F.struct(
            F.lit(r).alias("row_idx"),
            (md5_long(F.concat(F.lit(f"cms{r}:"), tok)) % width).alias("col_idx"),
        )
        for r in range(depth)
    ]


def cms_build(
    docs: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of token occurrences as a (row_idx, col_idx,
    count) relation — one explode + one map-side-combined hash
    aggregate over at most depth x width keys. The relation IS the
    artifact: write it as parquet, fold increments with
    :func:`cms_merge` (exact integer sums, so increment-merge equals
    union-build bit-for-bit)."""
    tok = F.explode(tokens_col("text")).alias("tok")
    cells = docs.select(tok).select(
        F.explode(F.array(*_cms_cols(F.col("tok"), depth, width))).alias("cell")
    )
    return (
        cells.select("cell.row_idx", "cell.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.count("*").alias("count"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum any number of CMS relations with identical geometry."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row_idx", "col_idx").agg(F.sum("count").alias("count"))


def cms_lookup(
    sketch: DataFrame,
    tokens: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(token, count_est) for a bounded query list: estimate = min over
    the depth counters. The sketch side broadcasts — it is AT MOST
    depth x width rows by construction (64 KiB of longs at the default
    geometry) no matter how large the corpus was — so the lookup is one
    shuffle-free broadcast join however the query relation arrives.
    Standard CMS guarantee: never under-counts, over-counts by <= e*N/width
    with prob. 1 - 2^-depth. Tokens are matched post-lowercasing (the
    build tokenises with the engine-wide lowercased splitter)."""
    spark = sketch.sparkSession
    q = spark.createDataFrame([(t.lower(),) for t in tokens], "token string")
    cells = q.select(
        "token",
        F.explode(F.array(*_cms_cols(F.col("token"), depth, width))).alias("cell"),
    ).select("token", "cell.row_idx", "cell.col_idx")
    # broadcast the RIGHT side: a left join can only broadcast its
    # non-preserved side, and the sketch is the bounded one anyway
    joined = cells.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
    return joined.groupBy("token").agg(
        F.min(F.coalesce(F.col("count"), F.lit(0))).alias("count_est")
    )


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch (KMV sampling)
# ---------------------------------------------------------------------------

#: default bottom-k sample size: rank error ~ O(1/sqrt(k)) => ~6% at 256
BK_K = 256
#: md5_long's range — 15 hex digits = 60 bits
_BK_HSPACE = float(1 << 60)
#: build oversampling: expect 4k survivors of the hash-threshold filter
_BK_OVERSAMPLE = 4


def bottomk_build(
    df: DataFrame,
    value_col: str,
    key_col: str = "doc_id",
    by: str | None = None,
    k: int = BK_K,
) -> DataFrame:
    """Bottom-k quantile sketch: the ``k`` rows whose md5-derived key
    hash is smallest, per ``by`` group — a deterministic uniform row
    sample, as a ``(group?, h, value, k)`` relation (``k`` rides along
    so merge/count readers can never mis-assume it). Mergeable exactly:
    the k smallest hashes of a union are among the per-part k smallest,
    so :func:`bottomk_merge` of per-shard/per-day sketches is
    BIT-FOR-BIT the sketch of the union corpus (the same incremental
    contract as ``cms_merge``, and the tests pin it). ``key_col`` must
    be row-unique across every relation the sketches will ever be
    merged over (doc_id); duplicated keys bias the sample. Rows with a
    NULL key or NULL value are EXCLUDED up front (documented domain:
    the sketch samples rows with both present — a NULL key would
    silently fall out of the hash filter anyway, and a NULL value
    would occupy a sample slot that percentile then ignores, degrading
    rank error invisibly). A NULL ``by`` group is kept, like every
    other sketch builder here (null-safe group join).

    100 TB design: NOT a window rank over the full relation (that
    shuffles every row). Two narrow passes instead — (1) a map-side-
    combined per-group count, (2) a scan keeping only rows with
    h <= threshold, sized so ~4k survive per group, then an exact rank
    on the tiny survivor set. P(fewer than k survive) <= exp(-9k/8) by
    Chernoff (< 1e-15 at the enforced k >= 32), and groups with
    n <= 4k skip the filter entirely. The group-count side is one row
    per group (domains/days scale) and broadcasts."""
    if k < 32:
        raise ValueError("bottomk_build: k must be >= 32 (Chernoff safety floor)")
    keys = [by] if by else []
    h = md5_long(F.concat(F.lit("bk:"), F.col(key_col).cast("string")))
    rows = df.filter(
        F.col(key_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *keys, h.alias("h"), F.col(value_col).cast("double").alias("value")
    )
    m = float(_BK_OVERSAMPLE * k)
    counts = rows.groupBy(*keys).agg(F.count("*").alias("_n")).select(
        *[F.col(c).alias(f"_g_{c}") for c in keys],
        F.when(F.col("_n") <= F.lit(int(m)), F.lit((1 << 60) - 1))
        .otherwise((F.lit(_BK_HSPACE * m) / F.col("_n")).cast("long") + 1)
        .alias("_thresh"),
    )
    if keys:
        # null-safe equality: a NULL group must meet ITS OWN count row,
        # not vanish through an inner equi-join
        cond = F.col(keys[0]).eqNullSafe(F.col(f"_g_{keys[0]}"))
        surv = rows.join(F.broadcast(counts), cond).drop(f"_g_{keys[0]}")
    else:
        surv = rows.crossJoin(F.broadcast(counts))
    surv = surv.filter(F.col("h") <= F.col("_thresh")).drop("_thresh")

    from pyspark.sql import Window

    w = Window.partitionBy(*(keys or [F.lit(0)])).orderBy("h", "value")
    return (
        surv.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(*keys, "h", "value", F.lit(k).alias("k"))
    )


def _require_k_column(sketch: DataFrame, op: str) -> None:
    """Loud failure for a sketch relation without the ``k`` column (a
    pre-carried-k artifact): guessing a default k could silently corrupt
    the merge/count semantics, so the caller must restate it."""
    if "k" not in sketch.columns:
        raise ValueError(
            f"{op}: sketch has no 'k' column (columns: {sketch.columns}) — "
            "an artifact written before k was carried in the relation; "
            "re-build it, or restore the column with "
            ".withColumn('k', F.lit(<the k it was built with>))"
        )


def bottomk_merge(*sketches: DataFrame, by: str | None = None) -> DataFrame:
    """Fold bottom-k sketches (same ``by``) into the sketch of the
    union corpus: union the relations, keep the smallest hashes per
    group. The effective sample size is ``min(k)`` over the inputs,
    read from the sketches' own ``k`` column — merging a k=128 and a
    k=256 sketch yields a VALID k=128 sketch of the union (ranks past
    the smaller k are not a uniform sample of anything, so they are
    dropped), never a silently invalid one. With equal ks this is
    bit-for-bit the union-corpus build. Exact — no approximation is
    introduced by merging, only by the original sampling."""
    if not sketches:
        raise ValueError("bottomk_merge: need at least one sketch")
    for s in sketches:
        _require_k_column(s, "bottomk_merge")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    keys = [by] if by else []

    from pyspark.sql import Window

    grp = Window.partitionBy(*(keys or [F.lit(0)]))
    w = grp.orderBy("h", "value")
    return (
        u.withColumn("_keff", F.min("k").over(grp))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_keff"))
        .select(*keys, "h", "value", F.col("_keff").alias("k"))
    )


# ---------------------------------------------------------------------------
# Engine-portable HLL (register relation)
# ---------------------------------------------------------------------------

#: register-index bits for the relation-form HLL: 2^12 = 4096 registers,
#: ~1.6% relative error — the same operating point as the DataSketches
#: default above
HLL_REG_P = 12


def hll_registers(
    docs: DataFrame, by: str | None = "source", p: int = HLL_REG_P
) -> DataFrame:
    """Engine-portable HLL distinct-token sketch as a RELATION
    ``(group?, register_idx, rho_max)`` — the md5-derived twin of
    :func:`token_hll`'s opaque DataSketches binaries, built from the
    same determinism toolkit as the CMS relation so a DuckDB replay can
    re-derive every register (``tests`` pin it): register = top ``p``
    bits of the 60-bit token hash, rho = leading-zero count of the
    remaining bits + 1, one MAX per register.

    Exact-integer mergeability: :func:`hll_registers_merge` is a
    groupBy-MAX, so increment-merge equals union-build BIT-FOR-BIT
    (max is idempotent/commutative/associative — the same contract as
    ``cms_merge``'s integer sums). Only registers that were ever hit
    hold rows; absent registers are rank 0 by convention and the
    estimator accounts for them.

    100 TB shape: one explode + one map-side-combined aggregate over at
    most 2^p keys per group — the KB-scale artifact a daily corpus pass
    persists. The leading-zero rank is computed with integer/string
    codegen (``bin()`` length), never floating log2 — a float rounding
    flip at a power-of-two boundary would silently corrupt a register
    cross-engine."""
    if not 4 <= p <= 18:
        raise ValueError(f"hll_registers: p must be in [4, 18], got {p}")
    rest_bits = 60 - p
    keys = [by] if by else []
    h = md5_long(F.concat(F.lit("hll:"), F.col("tok")))
    toks = docs.select(
        *([F.col(by)] if by else []),
        F.explode(tokens_col("text")).alias("tok"),
    )
    hashed = toks.select(
        *keys,
        h.alias("_h"),  # md5_long is 15 hex digits = exactly 60 bits
    ).select(
        *keys,
        F.expr(f"_h DIV {1 << rest_bits}").alias("register_idx"),
        F.expr(f"_h % {1 << rest_bits}").alias("_rest"),
    )
    # rho = leading zeros of the rest-bit field + 1
    #     = rest_bits - (bit length of rest) + 1; rest == 0 -> rest_bits + 1
    rho = F.when(F.col("_rest") == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.expr("bin(_rest)")) + 1
    )
    return (
        hashed.select(*keys, "register_idx", rho.alias("rho"))
        .groupBy(*keys, "register_idx")
        .agg(F.max("rho").cast("int").alias("rho_max"))
    )


def hll_registers_merge(
    *sketches: DataFrame, by: str | None = None
) -> DataFrame:
    """Fold register relations (same ``p``) into the union sketch:
    groupBy-MAX, bit-for-bit the union-corpus build."""
    if not sketches:
        raise ValueError("hll_registers_merge: need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    keys = [by] if by else []
    return u.groupBy(*keys, "register_idx").agg(
        F.max("rho_max").cast("int").alias("rho_max")
    )


def hll_registers_estimate(
    registers: DataFrame, by: str | None = None, p: int = HLL_REG_P
) -> DataFrame:
    """Distinct-count estimate per group from a register relation —
    the standard HyperLogLog estimator (Flajolet et al. 2007): raw =
    alpha_m * m^2 / sum(2^-rho) with absent registers contributing
    2^0, switching to linear counting (m * ln(m / zeros)) in the small
    range (raw <= 2.5m with empty registers). One group-by aggregate;
    the float sum is estimation-only (the mergeable artifact stays the
    exact-integer register relation)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    keys = [by] if by else []
    agg = registers.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho_max"))).alias("_s"),
        F.count("*").alias("_hit"),
    )
    zeros = F.lit(m) - F.col("_hit")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*keys, F.round(est, 3).alias("distinct_est"))


def bottomk_quantiles(
    sketch: DataFrame, probs: list[float], by: str | None = None
) -> DataFrame:
    """Quantile estimates from a bottom-k sketch:
    ``(group?, prob, value_est)``, one row per requested probability.
    The estimate is the EXACT percentile of the uniform sample, so rank
    error is the sampling error: ~ +/- 1.6/sqrt(k) rank mass at 90%
    confidence (+/- 6% at the default k=256). The sketch is at most
    k rows per group, so this aggregates a bounded relation."""
    if not probs:
        raise ValueError("bottomk_quantiles: need at least one probability")
    if any(p < 0.0 or p > 1.0 for p in probs):
        raise ValueError("bottomk_quantiles: probabilities must be in [0, 1]")
    keys = [by] if by else []
    parr = F.array(*[F.lit(float(p)) for p in probs])
    agg = sketch.groupBy(*keys).agg(F.percentile("value", parr).alias("_qs"))
    return agg.select(
        *keys,
        F.posexplode("_qs").alias("_i", "value_est"),
    ).select(
        *keys,
        F.element_at(parr, F.col("_i") + 1).alias("prob"),
        "value_est",
    )


def bottomk_count_est(sketch: DataFrame, by: str | None = None) -> DataFrame:
    """KMV row-count estimate from the sketch alone: with k row-unique
    keys sampled, n_hat = (k - 1) * H / h_(k) where h_(k) is the k-th
    smallest hash and H the hash space — the classic bottom-k distinct
    estimator (rel. error ~ 1/sqrt(k - 2)). ``k`` is read from the
    sketch's own column (so a merged sketch's effective k is always the
    one actually used); groups that kept fewer than k rows (n < k)
    report their exact count (a group holding exactly k rows is
    indistinguishable from a truncated one, so it takes the estimator)."""
    _require_k_column(sketch, "bottomk_count_est")
    keys = [by] if by else []
    return sketch.groupBy(*keys).agg(
        F.when(
            F.count("*") < F.min("k"),
            F.count("*").cast("double"),
        )
        .otherwise(
            (F.count("*") - 1).cast("double") * F.lit(_BK_HSPACE) / F.max("h")
        )
        .alias("rows_est")
    )


# ---------------------------------------------------------------------------
# Snapshot drift readouts — compare two snapshots' sketches without
# touching either corpus again (the monitoring half of the mergeable
# contract: build per-day, DIFF across days)
# ---------------------------------------------------------------------------


def hll_growth(old: DataFrame, new: DataFrame, by: str | None = None) -> DataFrame:
    """Distinct-token/doc growth between two snapshots' HLL sketch
    relations (as built by :func:`token_hll`): per group, the old/new
    estimates plus ``new_tokens_est`` = estimate(old ∪ new) -
    estimate(old) — the inclusion-exclusion novel-mass readout HLL
    supports without any raw data. Full outer on the group key, so a
    group present in only one snapshot still reports (its other side
    estimating 0). With ``by=None`` each side is FOLDED to one row via
    :func:`hll_merge` first — handing in per-group sketch relations
    without the matching ``by`` then reads as corpus-level growth of
    the union, never a silent cartesian pairing of mismatched groups.
    Sketch relations are group-cardinality: this is driver-free
    arithmetic over KB-scale inputs."""
    keys = [by] if by else []
    if not keys:
        old = hll_merge(old)
        new = hll_merge(new)
    o = old.select(*keys, F.col("token_hll").alias("_o_tok"),
                   F.col("doc_hll").alias("_o_doc"))
    n = new.select(*keys, F.col("token_hll").alias("_n_tok"),
                   F.col("doc_hll").alias("_n_doc"))
    joined = o.join(n, keys, "full_outer") if keys else o.crossJoin(n)
    est = F.hll_sketch_estimate
    tok_old = F.when(F.col("_o_tok").isNull(), F.lit(0.0)).otherwise(est("_o_tok"))
    tok_new = F.when(F.col("_n_tok").isNull(), F.lit(0.0)).otherwise(est("_n_tok"))
    tok_union = (
        F.when(F.col("_o_tok").isNull(), tok_new)
        .when(F.col("_n_tok").isNull(), tok_old)
        .otherwise(est(F.hll_union("_o_tok", "_n_tok")))
    )
    doc_old = F.when(F.col("_o_doc").isNull(), F.lit(0.0)).otherwise(est("_o_doc"))
    doc_new = F.when(F.col("_n_doc").isNull(), F.lit(0.0)).otherwise(est("_n_doc"))
    return joined.select(
        *keys,
        tok_old.alias("tokens_old_est"),
        tok_new.alias("tokens_new_est"),
        F.greatest(tok_union - tok_old, F.lit(0.0)).alias("new_tokens_est"),
        doc_old.alias("docs_old_est"),
        doc_new.alias("docs_new_est"),
    )


def cms_delta(
    old: DataFrame,
    new: DataFrame,
    tokens: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Per-token frequency movement between two snapshots' count-min
    relations (same geometry): ``(token, old_est, new_est, delta)``
    for a bounded watchlist — the boilerplate/contamination tripwire
    (a phrase whose count jumps 100x between crawls is a template or
    an injection, not language drift). Both sketch sides broadcast;
    estimates inherit the CMS never-under-count guarantee, so a LARGE
    positive delta is trustworthy while a small one may be noise at
    the geometry's error level."""
    o = cms_lookup(old, tokens, depth, width).withColumnRenamed(
        "count_est", "old_est"
    )
    n = cms_lookup(new, tokens, depth, width).withColumnRenamed(
        "count_est", "new_est"
    )
    return o.join(n, "token").select(
        "token",
        "old_est",
        "new_est",
        (F.col("new_est") - F.col("old_est")).alias("delta"),
    )


def bottomk_drift(
    old: DataFrame,
    new: DataFrame,
    probs: list[float],
    by: str | None = None,
) -> DataFrame:
    """Quantile movement between two snapshots' bottom-k sketches:
    ``(group?, prob, old_est, new_est, shift)`` — the doc-length /
    quality-score distribution tripwire (a median length that halves
    between crawls means the extractor or a filter changed, long
    before any aggregate count does). Inner join on (group, prob):
    drift is only defined where both snapshots have the group."""
    keys = [by] if by else []
    o = bottomk_quantiles(old, probs, by).withColumnRenamed("value_est", "old_est")
    n = bottomk_quantiles(new, probs, by).withColumnRenamed("value_est", "new_est")
    return o.join(n, keys + ["prob"]).select(
        *keys,
        "prob",
        "old_est",
        "new_est",
        (F.col("new_est") - F.col("old_est")).alias("shift"),
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int = 64
) -> DataFrame:
    """Top-``k`` heaviest values of ``col`` WITHOUT a per-distinct-value
    shuffle — the 100 TB answer to "what dominates this column?" when
    the column's cardinality makes the exact report
    (``skew.key_skew_report``, one (key, count) exchange of n_distinct
    rows) the bottleneck, and the honest counterpart to
    ``profile.profile_columns_fast``'s NULL ``top_value``.

    Two passes, neither wide: (1) each scan partition folds a
    Misra–Gries summary of at most ``capacity`` counters (batched with
    the mergeable-summaries rule — add the batch's counts, subtract the
    (capacity+1)-th largest, keep positives; Agarwal et al. 2012,
    "Mergeable Summaries"), emitting only its surviving VALUES — KBs
    per partition; (2) the unioned candidate set (≤ capacity ×
    n_partitions rows) broadcast-filters a recount scan whose map-side
    combine collapses to ≤ |candidates| rows before one tiny exchange.
    The output therefore carries EXACT counts, and the MG bound makes
    membership safe: any value with true count > n/(capacity+1) is
    guaranteed to survive pass 1 on some partition (summed per-partition
    error ≤ n/(capacity+1)), so every row of the output with
    ``cnt > guarantee_min`` is guaranteed-complete top-k membership;
    entries at or below it are best-effort (emitted with the bound so
    the reader can tell which regime they are in). When the column's
    true cardinality ≤ capacity, pass 1 retains everything and the
    result is simply exact — the gate fixture's regime, which is what
    lets a plain GROUP BY twin hash-check it.

    NULLs count as the real (often hottest) value '<NULL>', the
    key_skew_report convention. Output: ``(rank, value, cnt,
    total_rows, guarantee_min)``, rank by (cnt DESC, value ASC).
    Determinism: exact counts make the above-guarantee prefix a pure
    function of the data; the below-guarantee tail additionally
    depends on the scan's partition layout (documented, and pinned
    only in the exact regime).
    """
    if k < 1:
        raise ValueError(f"heavy_hitters: k must be >= 1, got {k}")
    if capacity < 1:
        raise ValueError(
            f"heavy_hitters: capacity must be >= 1, got {capacity}"
        )
    from pyspark.sql import Window

    vals = df.select(
        F.coalesce(F.col(col).cast("string"), F.lit("<NULL>")).alias("value")
    )
    cap = int(capacity)

    def mg(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["value"].value_counts()
            merged = (
                pd.concat([counters, vc]).groupby(level=0).sum()
                if len(counters)
                else vc
            )
            if len(merged) > cap:
                thresh = merged.nlargest(cap + 1).iloc[-1]
                merged = merged - thresh
                merged = merged[merged > 0]
            counters = merged
        if len(counters):
            yield pd.DataFrame({"value": counters.index.astype(str)})

    candidates = (
        vals.mapInPandas(mg, "value string")
        .distinct()
        .localCheckpoint(eager=True)
    )
    counts = (
        vals.join(F.broadcast(candidates), "value")
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
    )
    total = vals.count()
    w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "rank",
            "value",
            "cnt",
            F.lit(total).cast("long").alias("total_rows"),
            F.lit(total // (cap + 1) + 1).cast("long").alias(
                "guarantee_min"
            ),
        )
    )
