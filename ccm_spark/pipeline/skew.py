"""Key-skew diagnosis and skew-proof joins — the shuffle-health toolkit.

At 100 TB every ``groupBy``/``join`` hashes rows to reducers by key; one
hot key (a null sentinel, a default user_id, ``en`` in a language
column) lands its entire row mass on ONE task and the stage runs at the
speed of that straggler. The two operators here are the diagnose/fix
pair a pipeline runs BEFORE committing to a join strategy:

- :func:`key_skew_report` — the per-key mass profile: top-N heavy keys
  with shares and cumulative shares, plus corpus-level skew signals
  (distinct keys, max share, Shannon entropy of the key distribution in
  bits vs its uniform ceiling). Reading it answers "salt or broadcast?":
  a top-1 share near 1/partitions is harmless; a 30% key needs salting
  (or AQE skew-join splitting, which only helps sort-merge joins).
- :func:`salted_join` — the fix when BOTH sides are too big to
  broadcast and the skew lives in the big probe side: probe rows take a
  deterministic salt in ``[0, n_salts)``, the build side replicates
  ``n_salts``×, and the equi-join runs on ``(key, salt)`` — the hot
  key's mass spreads over ``n_salts`` reducers at the bounded cost of
  replicating the SMALLER side. Result is row-for-row the plain join
  (pinned), layout-independent.

Scale shapes: the report is two map-side-combined aggregates over the
(key) relation — rows collapse to distinct keys before any exchange —
plus a two-phase top-N (the boilerplate_ngrams pattern, never a global
sort). The salted join adds one narrow column to the probe side and an
``explode(sequence(...))`` to the build side; both stay in codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["key_skew_report", "salted_join"]


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Top-``top_n`` heaviest keys with corpus-level skew signals —
    one row per heavy key: ``(rank, key, n_rows, share, cum_share)``
    plus the constant summary columns ``(total_rows, n_keys,
    entropy_bits, uniform_bits)`` denormalised onto every row (the
    relation stays flat/scalar for cross-engine hashing).

    NULL keys count as a real (and frequently the hottest) key: they
    surface as key = '<NULL>' rather than vanishing into a dropped
    group. ``entropy_bits`` uses the one-pass identity
    H = log2(N) − Σc·log2(c)/N: the COUNTS feeding it are exact
    integers (the char_entropy discipline), and the Σc·log2(c)
    reduction is ORDER-DETERMINISTIC — the per-key double terms are
    gathered, value-sorted, and left-folded from 0.0
    (``aggregate(sort_array(collect_list(...)))``), so the result is
    independent of partitioning/run and bit-identical to the DuckDB
    twin's ``list_reduce(list_prepend(0.0, list_sort(list(...))))``
    (a plain float SUM accumulates in partition/engine-dependent
    order — the hazard this fold removes). Determinism price: the
    summary reducer materialises one double per distinct key (~8 B ×
    n_keys — fine to ~10⁸ keys; a corpus beyond that needs a
    two-level bucketed fold, same trick applied per hash bucket then
    across sorted bucket sums). ``uniform_bits = log2(n_keys)`` is
    the ceiling — the gap between them IS the skew (0 gap = perfectly
    uniform keys; a hot key drags entropy far below the ceiling).

    Ranking is deterministic: (count DESC, key ASC). Shares round to 6.
    100 TB shape: rows collapse to one row per distinct key in the
    map-side combine; the only full exchange carries (key, count). The
    count relation feeds TWO subtrees (the summary aggregate and the
    top-N), so it is localCheckpointed — without the cut the source
    relation scans once per consumer (the winnow_matches/filters.py
    fan-out rule); the materialized relation is distinct-key-sized.
    """
    if top_n < 1:
        raise ValueError(f"key_skew_report: top_n must be >= 1, got {top_n}")
    keyed = df.select(
        F.coalesce(F.col(key_col).cast("string"), F.lit("<NULL>")).alias("key")
    )
    counts = (
        keyed.groupBy("key")
        .agg(F.count("*").alias("n_rows"))
        .localCheckpoint(eager=True)
    )
    summary = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count("*").alias("n_keys"),
        # H = log2(N) - sum(c*log2 c)/N over exact integer counts;
        # the float sum folds a value-sorted term array from 0.0 so
        # its accumulation order is deterministic (see docstring)
        (
            F.log2(F.sum("n_rows"))
            - F.aggregate(
                F.sort_array(
                    F.collect_list(F.col("n_rows") * F.log2("n_rows"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.sum("n_rows")
        ).alias("_h"),
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    # two-phase top-N: per-partition candidates first, so the global
    # rank window only ever sees top_n * n_partitions rows
    wp = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("n_rows").desc(), F.col("key").asc()
    )
    cand = counts.withColumn("_pr", F.row_number().over(wp)).where(
        F.col("_pr") <= top_n
    )
    top = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .drop("_pr")
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)
    wc = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(summary))
        .select(
            "rank",
            "key",
            "n_rows",
            r6(F.col("n_rows") / F.col("total_rows")).alias("share"),
            r6(F.sum("n_rows").over(wc) / F.col("total_rows")).alias(
                "cum_share"
            ),
            "total_rows",
            "n_keys",
            r6(F.col("_h")).alias("entropy_bits"),
            r6(F.log2("n_keys")).alias("uniform_bits"),
        )
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: identical rows to ``probe.join(build, on,
    how)`` (pinned), but a hot join key's probe mass spreads over
    ``n_salts`` reducers instead of one straggler task.

    Probe rows take ``salt = pmod(xxhash64(key, <all probe columns>),
    n_salts)`` — deterministic (re-runs salt identically, no RNG in
    the plan) and row-content-spread, so even a single-key relation
    fans out; duplicate FULL rows share a salt (documented: a corpus
    that is one row repeated 10⁹ times stays hot — dedup first). The
    build side replicates each row ``n_salts``× via
    ``explode(sequence())``, and the join runs on ``(key, salt)``.
    Replication costs ``n_salts × |build|`` shuffle rows — use when
    build is far smaller than probe yet too big to broadcast
    (broadcast beats salting whenever it fits; AQE's skew-join only
    splits sort-merge partitions and cannot help a hash-aggregated
    hot key upstream).

    ``how`` supports 'inner' and 'left' (probe-preserving: every probe
    row keeps exactly its plain-join multiplicity because its single
    salt meets every build copy of its key exactly once per build
    row). Right/full joins would need build-side salting instead —
    rejected loudly rather than silently wrong.
    """
    if n_salts < 1:
        raise ValueError(f"salted_join: n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join: how={how!r} not supported (probe-side salting "
            "preserves inner/left semantics only; salt the other side "
            "for right/full)"
        )
    # a pre-existing '_salt' column would be silently overwritten on
    # the way in and dropped on the way out, breaking the row-identity
    # contract — refuse loudly instead
    if "_salt" in probe.columns or "_salt" in build.columns:
        raise ValueError(
            "salted_join: input already carries a '_salt' column; "
            "rename it first (the operator claims row-identity with the "
            "plain join and cannot preserve a caller's '_salt')"
        )
    p = probe.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts)),
    )
    b = build.withColumn(
        "_salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long")
            )
        ),
    )
    out = p.join(b, [on, "_salt"], how)
    return out.drop("_salt")
