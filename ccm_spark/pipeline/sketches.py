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
    toks = docs.select(
        *( [F.col(by)] if by else [] ),
        F.col("doc_id"),
        F.explode(tokens_col("text")).alias("tok"),
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
