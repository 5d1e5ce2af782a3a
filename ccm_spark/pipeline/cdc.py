"""Incremental snapshot maintenance — the merge/diff pair a continuously
re-crawled corpus needs.

A 100 TB training corpus is not written once: crawls re-fetch URLs,
licensing takedowns delete documents, and quality re-scores rewrite
columns. The lakehouse answer is a periodic MERGE of a (much smaller)
change delta into the base snapshot, plus a DIFF that audits what a
merge actually changed. Both are pure relations here — no table-format
dependency — so they run on plain parquet and compose with the layout
operators (``write_partitioned``, ``plan_compaction``) for the physical
rewrite.

- :func:`merge_upsert` — latest-record-wins merge of a change delta
  into a base snapshot, with optional tombstones (deletes). One hash
  exchange on the merge keys; bucket both sides by the keys and the
  exchange disappears.
- :func:`snapshot_diff` — the audit relation between two snapshots:
  one row per key that was ``added``, ``removed``, or ``changed``.
  One co-partitioned full-outer join; same bucketing note.

Scale shapes: the merge's window ranks each key's (tiny) version group
after map-side-combinable narrowing is impossible (every row is a
candidate), so the exchange carries base+delta once — the unavoidable
minimum for a logical merge; at 100 TB the practical win is partition
pruning upstream (join the delta's distinct partition keys against the
base scan) which composes with this relation unchanged. The diff
prunes identical rows with a cheap per-side content hash computed
BEFORE the join, so the full-outer only carries keys + two longs +
the change columns needed for output.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["merge_upsert", "snapshot_diff", "merge_upsert_gate"]


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Latest-record-wins merge: for every key, keep the row with the
    highest ``version_col``; at equal version the DELTA row wins (the
    change stream is newer than the snapshot it amends, whatever the
    version stamps say). If ``tombstone_col`` names a boolean column
    (present at least on the delta; absent base side is filled false),
    a winning tombstone DELETES the key from the merged snapshot.

    Output columns = base's columns (tombstone column dropped after it
    has decided). Determinism contract: within each input, (keys,
    version) identifies at most one row — then the merged snapshot is
    a pure function of the inputs, independent of partitioning. The
    operator does not scan for violations (that would cost an extra
    aggregate at 100 TB); :func:`snapshot_diff` against expectations or
    an upstream uniqueness check is the audit tool.

    The tombstone filter runs AFTER the rank, never before: filtering
    deletes first would let the stale base row win and silently
    resurrect the key — the canonical CDC merge bug (pinned in
    ``tests/test_cdc.py::test_tombstone_does_not_resurrect_base``).

    100 TB shape: one hash exchange on ``keys`` (the rank window);
    per-key groups are version-deep (a handful of rows), so no skew
    concern beyond the keys' own distribution. With base and delta
    bucketed by ``keys`` the exchange vanishes; with a partitioned
    base, prune to the delta's touched partitions before calling.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("merge_upsert: keys must be non-empty")
    for c in ("_src", "_rn"):
        if c in base.columns or c in delta.columns:
            raise ValueError(
                f"merge_upsert: input already carries a {c!r} column; "
                "rename it first"
            )
    b = base
    if tombstone_col is not None and tombstone_col not in b.columns:
        b = b.withColumn(tombstone_col, F.lit(False))
    b = b.withColumn("_src", F.lit(0))
    d = delta.withColumn("_src", F.lit(1))
    if set(b.columns) != set(d.columns):
        raise ValueError(
            "merge_upsert: base/delta schemas differ beyond the "
            f"tombstone column: {sorted(set(b.columns) ^ set(d.columns))}"
        )
    u = b.unionByName(d)
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    out = (
        u.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    if tombstone_col is not None:
        out = out.where(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        )
        if tombstone_col not in base.columns:
            out = out.drop(tombstone_col)
    return out.select(*base.columns)


def merge_upsert_gate(docs: DataFrame) -> DataFrame:
    """Gate-shaped exercise of :func:`merge_upsert` (staged gate
    candidate, QUERIES.md): a deterministic re-crawl delta derived
    from ``documents`` itself, so the DuckDB twin
    (``oracle_sql_ext.sql_merge_upsert``) can restate the merge as a
    plain ranked CTE with no Spark machinery.

    Fixture — base is every document at version 0; the delta carries
    all three merge behaviours: ``doc_id % 7 == 3`` re-crawled at
    version 1 (text gains ``' [v1]'``, n_chars += 5), ``doc_id % 7 ==
    5`` tombstoned at version 1 (takedown — the key must VANISH),
    ``doc_id % 7 == 1`` amended at the SAME version 0 (the
    delta-wins-ties rule is what keeps it, text gains ``' [dup]'``,
    n_chars += 6). Output: ``(doc_id, version, lang, source, n_chars,
    text_md5)`` — string-free of the long text, hash-stable.
    """
    v = lambda n: F.lit(n).cast("long")
    base = docs.select(
        "doc_id", "text", "lang", "source", "n_chars",
        v(0).alias("version"), F.lit(False).alias("deleted"),
    )
    recrawl = docs.where(F.col("doc_id") % 7 == 3).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" [v1]")).alias("text"),
        "lang", "source",
        (F.col("n_chars") + 5).alias("n_chars"),
        v(1).alias("version"), F.lit(False).alias("deleted"),
    )
    takedown = docs.where(F.col("doc_id") % 7 == 5).select(
        "doc_id", "text", "lang", "source", "n_chars",
        v(1).alias("version"), F.lit(True).alias("deleted"),
    )
    tie = docs.where(F.col("doc_id") % 7 == 1).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" [dup]")).alias("text"),
        "lang", "source",
        (F.col("n_chars") + 6).alias("n_chars"),
        v(0).alias("version"), F.lit(False).alias("deleted"),
    )
    delta = recrawl.unionByName(takedown).unionByName(tie)
    merged = merge_upsert(
        base, delta, keys=["doc_id"], version_col="version",
        tombstone_col="deleted",
    )
    return merged.select(
        "doc_id", "version", "lang", "source", "n_chars",
        F.md5(
            F.coalesce(F.col("text"), F.lit("")).cast("binary")
        ).alias("text_md5"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Audit relation between two snapshots of the same schema: one row
    per key whose membership or content changed —
    ``(keys..., change)`` with ``change`` in ``('added', 'removed',
    'changed')``. Keys present in both with identical ``compare_cols``
    (default: every non-key column) emit nothing, so the output is
    delta-sized, not corpus-sized.

    Content equality is decided by ``xxhash64`` over the compare
    columns computed per side BEFORE the join — the full-outer then
    carries only keys + one long per side instead of two full row
    payloads. The hash input appends one ``isNull`` boolean per
    compare column: Spark's hash fold SKIPS null inputs, so without
    the bitmap ``('a', NULL)`` and ``(NULL, 'a')`` would hash equal
    and a value moving between columns would be reported unchanged;
    the always-non-null booleans pin every column position.

    NULL merge keys are matched NULL-safely (``eqNullSafe``), so an
    unchanged null-key row emits nothing instead of phantom
    added+removed pairs — consistent with :func:`merge_upsert`, whose
    window groups NULL keys as a real group.

    100 TB shape: one co-partitioned full-outer join on ``keys``
    (bucket both sides to eliminate the exchange); projection to
    (keys, hash) happens under the scan, so each side ships ~16 B +
    key width per row.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("snapshot_diff: keys must be non-empty")
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    compare_cols = list(compare_cols)
    if not compare_cols:
        raise ValueError("snapshot_diff: compare_cols must be non-empty")

    def side(df: DataFrame, tag: str) -> DataFrame:
        # null-bitmap appended: the hash fold skips NULLs, so the
        # booleans are what make column POSITION part of the hash
        return df.select(
            *keys,
            F.xxhash64(
                *[F.col(c) for c in compare_cols],
                *[F.col(c).isNull() for c in compare_cols],
            ).alias(f"_h_{tag}"),
            F.lit(1).alias(f"_p_{tag}"),
        )

    # dataframe aliases, because old and new often share lineage
    # (diff(base, merge(base, delta)) is the canonical call) and an
    # explicit join condition on same-lineage attributes is ambiguous
    o = side(old, "old").alias("_sd_o")
    n = side(new, "new").alias("_sd_n")
    ok = lambda k: F.col(f"_sd_o.{k}")
    nk = lambda k: F.col(f"_sd_n.{k}")
    # null-SAFE key equality: a plain equi-join never matches NULL
    # keys, which would misreport an unchanged null-key row as one
    # 'removed' plus one 'added'
    cond = None
    for k in keys:
        c = ok(k).eqNullSafe(nk(k))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    return (
        j.select(
            *[F.coalesce(ok(k), nk(k)).alias(k) for k in keys],
            F.when(F.col("_p_old").isNull(), F.lit("added"))
            .when(F.col("_p_new").isNull(), F.lit("removed"))
            .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
            .alias("change"),
        )
        .where(F.col("change").isNotNull())
    )
