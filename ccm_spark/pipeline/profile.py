"""Table profiling — the per-column data-quality report a pipeline runs
before training on a new corpus drop.

One relation answers the first questions about an unfamiliar 100 TB
table: how null is each column, how many distinct values, what
dominates, what are the extremes. The report is what decides the next
move — a 40%-null quality score means the scorer crashed mid-backfill;
a ``lang`` column whose top value holds 90% share means the skew
toolkit (``pipeline/skew.py``) is needed before any groupBy on it.

:func:`profile_columns` emits one row per profiled column:
``(col_name, n_rows, n_nulls, n_distinct, top_value, top_count,
min_value, max_value)``. Values are profiled as strings (caller casts
anything whose string form is engine-ambiguous — floats, timestamps —
before calling; int/string columns are safe as-is, which is why the
gate fixture profiles only those).

Scale shape: the table is scanned ONCE and stacked to (col_name,
value) — an n_cols× row inflation of two narrow columns, NOT of the
table (only profiled columns are read, and the generate happens after
column pruning). The stacked relation collapses to per-(column,
distinct value) counts in the map-side combine, so the one full
exchange carries ~Σ distinct values, not rows. Everything after is
distinct-value-sized. The counts relation feeds TWO subtrees (the
per-column aggregate and the top-value rank), so it is
localCheckpointed — the winnow_matches/filters.py fan-out rule.
A column that is distinct-heavy (a doc_id) costs its cardinality in
the exchange; profile a sample, or drop it from ``cols``, when that
dominates.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import NumericType

__all__ = ["profile_columns", "profile_columns_fast", "profile_documents_gate"]


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """Per-column profile over ``cols`` (default: every column) —
    see the module docstring for the output relation and scale shape.

    Semantics: ``n_distinct``/``top_*``/``min_value``/``max_value``
    are over NON-NULL values (an all-null column profiles as
    ``n_distinct 0, top_value NULL, top_count 0, min/max NULL``);
    ``top_value`` ties break to the smallest value at the top count,
    so the report is a pure function of the data. Ordering is
    VALUE-AWARE per the source column's type: a numeric column's
    extremes and tiebreaks compare numerically (via try_cast of the
    canonical string form back to double — '9' < '10', so n_chars
    extremes are real extremes, not codepoint accidents), string
    columns compare binary/codepoint (ASCII-safe; profile a
    normalised projection if exotic collation matters). Callers
    pre-cast float/timestamp columns (module docstring) — their
    string forms are engine-ambiguous, the integer family is not.
    """
    if cols is None:
        cols = df.columns
    cols = list(cols)
    if not cols:
        raise ValueError("profile_columns: cols must be non-empty")
    numeric = {
        c for c in cols if isinstance(df.schema[c].dataType, NumericType)
    }
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                        F.lit(c in numeric).alias("is_num"),
                    )
                    for c in cols
                ]
            )
        ).alias("cv")
    ).select("cv.col_name", "cv.value", "cv.is_num")
    counts = (
        stacked.groupBy("col_name", "value")
        .agg(F.count("*").alias("cnt"), F.first("is_num").alias("is_num"))
        .localCheckpoint(eager=True)
    )
    # numeric ordering key: the canonical numeric string cast back —
    # try_cast, because BOTH when() branches evaluate for every group
    # and ANSI cast would throw on a string column's values; for a
    # numeric column it never returns NULL, so min_by/max_by skip
    # nothing. Distinct grouped values cannot tie on it (canonical
    # integer-family forms are injective into double)
    ord_ = F.when(F.col("is_num"), F.col("value").try_cast("double"))
    base = counts.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_nulls"),
        F.sum(
            F.when(F.col("value").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_distinct"),
        F.when(F.first("is_num"), F.min_by("value", ord_))
        .otherwise(F.min("value"))
        .alias("min_value"),
        F.when(F.first("is_num"), F.max_by("value", ord_))
        .otherwise(F.max("value"))
        .alias("max_value"),
    )
    # ord_ is constant-NULL inside a string column's partition, so its
    # engine-specific NULL placement can never reorder anything there
    wtop = Window.partitionBy("col_name").orderBy(
        F.col("cnt").desc(), ord_.asc(), F.col("value").asc()
    )
    top = (
        counts.where(F.col("value").isNotNull())
        .withColumn("_rn", F.row_number().over(wtop))
        .where(F.col("_rn") == 1)
        .select(
            "col_name",
            F.col("value").alias("top_value"),
            F.col("cnt").alias("top_count"),
        )
    )
    return base.join(top, "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "top_value",
        F.coalesce("top_count", F.lit(0)).alias("top_count"),
        "min_value",
        "max_value",
    )


def profile_documents_gate(docs: DataFrame) -> DataFrame:
    """Gate-shaped exercise of :func:`profile_columns` (staged gate
    candidate, QUERIES.md): profile the int/string columns of
    ``documents`` plus one deliberately null-bearing derived column —
    ``sig = NULL when doc_id % 11 == 0 else source`` — so the
    null-path arms (n_nulls, null-excluded distinct/top/min/max) are
    exercised every round, not just on pathological inputs. The long
    ``text`` column is left out: its profile is legal but its min/max
    would drag multi-KB strings through the gate hash for no extra
    evidence.
    """
    src = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("source"))
        .alias("sig"),
    )
    return profile_columns(
        src, ["doc_id", "lang", "source", "n_chars", "sig"]
    )


def profile_columns_fast(
    df: DataFrame, cols: Sequence[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """The at-scale profile: same relation as :func:`profile_columns`
    minus the top-value pair, computed WITHOUT the stacked explode or
    any per-distinct-value exchange — ``n_distinct`` goes through
    ``approx_count_distinct`` (HyperLogLog++, ``rsd`` relative error),
    everything else is an exact single-pass aggregate.

    This is the shape to run first on an unfamiliar 100 TB table: one
    scan, n_cols × 4 mergeable aggregates folded map-side, ONE
    single-row reduce — no explode row inflation, and a doc_id-like
    column costs a few KB of HLL sketch instead of its cardinality in
    a shuffle. When the fast report flags a column worth exact
    treatment (suspicious distinct count, skew candidate), follow up
    with :func:`profile_columns` on just that column — the pair is
    the diagnose/confirm workflow. ``top_value``/``top_count`` are
    emitted as NULL/0: a true heavy-hitter needs per-value state (the
    exact path's counts relation, or a CMS sketch —
    ``pipeline/sketches.py``); approximating it silently here would
    invite trusting a number this pass cannot defend.

    Not twin-checkable by construction (HLL estimates are
    engine-specific); evidence tier is the exact-vs-fast agreement
    pin in ``tests/test_profile.py``.
    """
    if cols is None:
        cols = df.columns
    cols = list(cols)
    if not cols:
        raise ValueError("profile_columns_fast: cols must be non-empty")
    n_rows = F.count(F.lit(1))
    aggs = []
    for c in cols:
        v = F.col(c).cast("string")
        # numeric columns take typed min/max (then cast the scalar) so
        # the extremes agree with the exact path's value-aware ordering
        # instead of reporting codepoint accidents
        typed = isinstance(df.schema[c].dataType, NumericType)
        mn = F.min(F.col(c)).cast("string") if typed else F.min(v)
        mx = F.max(F.col(c)).cast("string") if typed else F.max(v)
        aggs += [
            n_rows.alias(f"{c}__n_rows"),
            F.sum(F.when(v.isNull(), 1).otherwise(0)).alias(f"{c}__n_nulls"),
            F.approx_count_distinct(v, rsd).alias(f"{c}__n_distinct"),
            mn.alias(f"{c}__min"),
            mx.alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    # unpivot the single wide row back to one row per column — the
    # stack happens on ONE row, not on the table
    out = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"{c}__n_rows").alias("n_rows"),
                        F.col(f"{c}__n_nulls").cast("long").alias("n_nulls"),
                        F.col(f"{c}__n_distinct").alias("n_distinct"),
                        F.lit(None).cast("string").alias("top_value"),
                        F.lit(0).cast("long").alias("top_count"),
                        F.col(f"{c}__min").alias("min_value"),
                        F.col(f"{c}__max").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    return out
