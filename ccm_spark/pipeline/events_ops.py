"""Event-stream operators — as-of join, sessionization, quantiles.

Time-series alignment primitives a training-data/feature pipeline needs and
Spark lacks as built-ins. Both are expressed as window compositions (no
UDFs, no per-row subqueries):

  - As-of join via the union-tag trick: tag both sides, sort one combined
    window per user by time, carry the last right-side value forward with
    ``last(..., ignorenulls)``. One shuffle on user_id, linear work —
    the classic scalable formulation (a per-left-row subquery would be
    quadratic; a range join would need binning).
  - Sessionization via gap detection: lag + cumulative sum of
    session-start flags over the same per-user window.

Timestamps are compared at microsecond resolution whatever the parquet
physical type of ``ts`` (int64 nanos, TIMESTAMP, or TIMESTAMP_NTZ) —
``sources.tables.ts_micros`` dispatches on the actual dtype, matching
DuckDB's ``epoch_us(ts)`` on the same file.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.sources.tables import ts_micros


def asof_join_events(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "view",
) -> DataFrame:
    """For every ``left_type`` event: the value of the user's most recent
    strictly-earlier ``right_type`` event (NULL if none).

    Strictness at equal microseconds: left rows sort before right rows, so
    a simultaneous right event is NOT visible to the left row.
    """
    tagged = (
        events.where(F.col("event_type").isin([left_type, right_type]))
        .select(
            "event_id",
            "user_id",
            ts_micros(events).alias("ts_us"),
            (F.col("event_type") == left_type).alias("is_left"),
            "value",
        )
    )
    # sort: time, then left-before-right (strict as-of), then event_id
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(),
        F.when(F.col("is_left"), 0).otherwise(1).asc(),
        F.col("event_id").asc(),
    )
    carried = tagged.withColumn(
        "asof_value",
        F.last(F.when(~F.col("is_left"), F.col("value")), ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return carried.where(F.col("is_left")).select(
        "event_id", "user_id", "ts_us", F.col("value").alias("left_value"), "asof_value"
    )


def asof_join_tolerance(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "view",
    tolerance_minutes: int = 60,
) -> DataFrame:
    """As-of join with a staleness bound: the carried right-side value is
    NULLed when it is older than ``tolerance_minutes`` — the standard
    feature-freshness rule (a day-old 'view' should not feature a 'click').

    Same single-window formulation as :func:`asof_join_events`, carrying
    (value, timestamp) together so the tolerance check is a projection —
    no second window, no range join.
    """
    tol_us = tolerance_minutes * 60_000_000
    tagged = (
        events.where(F.col("event_type").isin([left_type, right_type]))
        .select(
            "event_id",
            "user_id",
            ts_micros(events).alias("ts_us"),
            (F.col("event_type") == left_type).alias("is_left"),
            "value",
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(),
        F.when(F.col("is_left"), 0).otherwise(1).asc(),
        F.col("event_id").asc(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    right_val = F.when(~F.col("is_left"), F.col("value"))
    right_ts = F.when(~F.col("is_left"), F.col("ts_us"))
    carried = tagged.withColumn(
        "asof_value", F.last(right_val, ignorenulls=True).over(w)
    ).withColumn("asof_ts", F.last(right_ts, ignorenulls=True).over(w))
    fresh = F.col("asof_ts").isNotNull() & (
        (F.col("ts_us") - F.col("asof_ts")) <= tol_us
    )
    return carried.where(F.col("is_left")).select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("value").alias("left_value"),
        F.when(fresh, F.col("asof_value")).alias("asof_value"),
    )


def resample_ffill(
    events: DataFrame,
    step_us: int,
    key_col: str = "user_id",
    max_grid_per_key: int = 1_000_000,
) -> DataFrame:
    """Irregular observations -> a REGULAR per-key grid with
    last-observation-carried-forward values: (key, t_idx, grid_ts,
    value) where ``grid_ts = key_min_ts + t_idx * step_us`` and
    ``value`` is the latest observation at or before the grid point —
    the resampling every EDM/forecasting operator here assumes (their
    ``t`` is a uniform index; real sensors are not).

    Semantics: each key's grid spans [min ts, max ts] inclusive of the
    last full step; observation ties at one microsecond resolve to the
    LAST by event_id (the newest write wins); grid points never precede
    the first observation, so no leading NULLs exist.

    Plan: per-key bounds are one aggregate; the grid is a generator
    explode of ``sequence`` (bounded per key by span/step — the
    ``max_grid_per_key`` guard fails fast on a step that would explode
    a key into millions of rows); carrying values is the SAME
    union-tag + single-window as-of used by :func:`asof_join_events`
    (grid rows sort after observations at equal ts: at-or-before
    semantics), so the whole op is one explode + one window on the key
    — no range join, no per-key driver work."""
    tagged = _tagged_resample_grid(
        events, step_us, key_col, max_grid_per_key, "resample_ffill"
    )
    # observations before grid rows at equal ts (at-or-before); ties
    # among observations resolve to the newest event_id
    w = Window.partitionBy("key").orderBy(
        F.col("ts_us").asc(),
        F.col("is_grid").cast("int").asc(),
        F.col("event_id").asc_nulls_last(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = tagged.withColumn(
        "ffill", F.last(F.when(~F.col("is_grid"), F.col("value")), ignorenulls=True).over(w)
    )
    return carried.where(F.col("is_grid")).select(
        F.col("key").alias(key_col),
        "t_idx",
        F.col("ts_us").alias("grid_ts"),
        F.col("ffill").alias("value"),
    )


def _tagged_resample_grid(
    events: DataFrame,
    step_us: int,
    key_col: str,
    max_grid_per_key: int,
    op: str,
) -> DataFrame:
    """Shared grid scaffolding for the resamplers: per-key [min, max]
    bounds (one aggregate), the distributed fail-fast guard on grid
    explosion, the sequence-explode grid, and the observation/grid
    union-tag relation the value-carrying windows run over."""
    if step_us < 1:
        raise ValueError(f"{op}: step_us must be >= 1, got {step_us}")
    obs = events.select(
        F.col(key_col).alias("key"),
        ts_micros(events).alias("ts_us"),
        "event_id",
        "value",
    )
    bounds = obs.groupBy("key").agg(
        F.min("ts_us").alias("t0"), F.max("ts_us").alias("t1")
    )
    n_steps = ((F.col("t1") - F.col("t0")) / F.lit(step_us)).cast("long")
    guarded = bounds.withColumn("n_steps", n_steps)
    # fail fast, distributedly, on grids that would explode a key
    too_big = guarded.where(F.col("n_steps") > max_grid_per_key).limit(1).collect()
    if too_big:
        r = too_big[0]
        raise ValueError(
            f"{op}: key {r.key!r} spans {int(r.n_steps)} grid steps "
            f"(> max_grid_per_key={max_grid_per_key}); raise step_us or the guard"
        )
    grid = guarded.select(
        "key",
        "t0",
        F.explode(F.sequence(F.lit(0), F.col("n_steps"))).alias("t_idx"),
    ).select(
        "key",
        "t_idx",
        (F.col("t0") + F.col("t_idx") * F.lit(step_us)).alias("ts_us"),
    )
    return obs.select(
        "key", "ts_us", F.lit(False).alias("is_grid"),
        F.lit(None).cast("long").alias("t_idx"), "event_id", "value",
    ).unionByName(
        grid.select(
            "key", "ts_us", F.lit(True).alias("is_grid"),
            "t_idx", F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast(obs.schema["value"].dataType).alias("value"),
        )
    )


def resample_interpolate(
    events: DataFrame,
    step_us: int,
    key_col: str = "user_id",
    max_grid_per_key: int = 1_000_000,
) -> DataFrame:
    """Irregular observations -> a regular per-key grid with LINEAR
    INTERPOLATION between the bracketing observations — the smoother
    events-to-EDM-series bridge for continuous signals, where
    :func:`resample_ffill`'s step function would inject artificial
    flat segments into an attractor reconstruction.

    value(grid_ts) = prev + (next - prev) * (grid_ts - prev_ts)
                                          / (next_ts - prev_ts)
    where prev is the newest observation at-or-before and next the
    newest observation at-or-after the grid point; a grid point sitting
    exactly on an observation takes that observation; trailing grid
    points past the last observation carry it forward (degenerating to
    ffill — no extrapolation is invented). Same guard, grid, and
    union-tag machinery as resample_ffill: one aggregate, one guarded
    explode, and two windows over the key — no range join.
    """
    tagged = _tagged_resample_grid(
        events, step_us, key_col, max_grid_per_key, "resample_interpolate"
    )
    obs_val = F.when(~F.col("is_grid"), F.col("value"))
    # the bracket TIMESTAMP must come from the same observation as the
    # bracket VALUE: a NULL-valued observation is skipped by the
    # ignorenulls value carry, so its ts must be skipped too — pairing
    # pv from one row with pt from another slants every interpolation
    # across the NULL and fakes an 'exact hit' at its timestamp
    obs_ts = F.when(
        ~F.col("is_grid") & F.col("value").isNotNull(), F.col("ts_us")
    )
    back = Window.partitionBy("key").orderBy(
        F.col("ts_us").asc(),
        F.col("is_grid").cast("int").asc(),
        F.col("event_id").asc_nulls_last(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # forward frame: grid BEFORE observations at equal ts (at-or-after),
    # ties among observations at one ts resolve to the newest event_id
    fwd = Window.partitionBy("key").orderBy(
        F.col("ts_us").asc(),
        F.col("is_grid").cast("int").desc(),
        F.col("event_id").desc_nulls_last(),
    ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    carried = (
        tagged.withColumn("pv", F.last(obs_val, ignorenulls=True).over(back))
        .withColumn("pt", F.last(obs_ts, ignorenulls=True).over(back))
        .withColumn("nv", F.first(obs_val, ignorenulls=True).over(fwd))
        .withColumn("nt", F.first(obs_ts, ignorenulls=True).over(fwd))
    )
    interp = F.when(
        F.col("nt").isNull() | (F.col("nt") == F.col("pt")), F.col("pv")
    ).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("ts_us") - F.col("pt"))
        / (F.col("nt") - F.col("pt"))
    )
    return carried.where(F.col("is_grid")).select(
        F.col("key").alias(key_col),
        "t_idx",
        F.col("ts_us").alias("grid_ts"),
        interp.alias("value"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions split on inactivity gaps: one row per session with
    (user_id, session_idx, n_events, start_us, end_us, sum_value)."""
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us").asc(), F.col("event_id").asc())
    marked = (
        events.select("event_id", "user_id", ts_micros(events).alias("ts_us"), "value")
        .withColumn("prev_ts", F.lag("ts_us").over(w))
        .withColumn(
            "new_session",
            (F.col("prev_ts").isNull() | ((F.col("ts_us") - F.col("prev_ts")) > gap_us)).cast("int"),
        )
        .withColumn(
            "session_idx",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.sum("value").alias("sum_value"),
    )


def value_quantiles(events: DataFrame) -> DataFrame:
    """Exact per-type value quantiles (linear interpolation — matches
    quantile_cont in any ANSI engine). Exact quantiles shuffle all values
    per group; at 100 TB swap in approx_percentile (t-digest) — kept exact
    here because the oracle gate compares values."""
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    aggs = [
        F.expr(f"percentile_cont({q}) WITHIN GROUP (ORDER BY value)").alias(name)
        for name, q in qs.items()
    ]
    return events.groupBy("event_type").agg(*aggs)


def value_quantiles_approx(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """The 100 TB twin of :func:`value_quantiles`: `approx_percentile`
    (Greenwald-Khanna sketch, JVM-side, mergeable map-side partials), so
    per-group state is O(accuracy) instead of every value shuffling to one
    reducer task. Guaranteed rank error <= n/accuracy per quantile —
    pinned against the exact path in tests/test_events_ops.py. Same output
    schema as the exact path so callers can swap freely; not oracle-gated
    (sketch internals are engine-specific), the exact path is."""
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    aggs = [
        F.percentile_approx("value", q, accuracy).alias(name) for name, q in qs.items()
    ]
    return events.groupBy("event_type").agg(*aggs)


def _with_hour_idx(events: DataFrame, *cols: str) -> DataFrame:
    """(cols..., hour_idx) via integer ``DIV`` on the µs epoch — the repo
    bucketing convention (entry.py: ``ts_us DIV 3600000000``), bit-identical
    to the DuckDB twins' ``//``. The double-division-then-floor form this
    replaces is exact for realistic epochs but one rounding quirk away
    from a boundary flip, so the invariant is pinned here instead."""
    return events.select(*cols, ts_micros(events).alias("_ts_us")).select(
        *cols, F.expr("_ts_us DIV 3600000000").alias("hour_idx")
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Multi-level rollup — (event_type, hour) cells, per-event_type
    totals, and the grand total in ONE aggregation pass, the grouping-sets
    family the reference has no analogue for (SURVEY.md §2.1: "no
    distinct, grouping sets, cube, rollup").

    Expressed as Spark's native ``rollup`` so Catalyst plans a single
    Expand + hash-aggregate with map-side partial aggregation — the
    scalable form (three separate groupBys would scan and shuffle the
    fact relation three times; the Expand multiplies rows by the number
    of grouping sets BEFORE the partial agg, which combines them
    map-side, so the exchange still carries only aggregated cells).
    ``grouping_id`` disambiguates subtotal rows from genuine NULL keys.
    Hour is derived from the µs-resolution dispatcher (ts dtype-robust).
    """
    return (
        _with_hour_idx(events, "event_type", "value")
        .rollup("event_type", "hour_idx")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def hourly_anomalies(
    events: DataFrame,
    window_hours: int = 24,
    min_hours: int = 6,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Volume-anomaly detection per event type: each observed hour's
    event count scored against the trailing ``window_hours`` OBSERVED
    hours (z-score over a rows-window ending at the previous hour — the
    current hour never contaminates its own baseline).

    Rows-based, not wall-clock-based: hours with zero events are absent
    from the hourly relation, so on sparse streams the baseline spans
    more wall time (densify with ``resample_ffill`` first for strict
    wall-clock windows). Hours with fewer than ``min_hours`` observed
    predecessors are emitted unscored (zscore 0.0, not anomalous) —
    the warm-up guard. A zero-variance baseline scores 0.0 and never
    flags (the repo's Σw==0-style conservative guard; a constant
    baseline with a jump is caught one hour later when variance
    appears).

    100 TB shape: one map-side-combined hourly aggregate (the fact
    relation collapses to (type, hour) cells before any window), then
    one window over the tiny hourly relation partitioned by event_type
    — no shuffle ever carries raw events past the first combine.
    """
    hourly = (
        _with_hour_idx(events, "event_type")
        .groupBy("event_type", "hour_idx")
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(-window_hours, -1)
    )
    # Mean/std from EXACT integer window sums (count, Σn, Σn²) with one
    # shared expression tree, not avg/stddev_pop: the built-in stddev's
    # accumulation order differs across engines (Welford vs naive), and
    # at window_hours=24 the last-bit drift survives round6 — integer
    # sums are exact, and the identical double tree is then
    # bit-deterministic in both engines (IEEE ops incl. sqrt are
    # correctly rounded). The exactness claim is GUARDED, not assumed:
    # n_events² and its window sum live in LONG, so any (event_type,
    # hour) cell above floor(sqrt((2^63−1)/window_hours)) — ~6.2e8
    # events/hour at the default 24h window — would overflow; Spark
    # wraps LONG silently, so the squaring raises loudly past the
    # bound instead (one codegen comparison on the tiny hourly
    # relation; the DuckDB twin needs no guard — its BIGINT arithmetic
    # is natively overflow-checked). Past the bound: pre-aggregate to
    # finer cells or widen to decimal.
    n_cap = math.isqrt((2**63 - 1) // max(window_hours, 1))
    sq = F.when(
        F.col("n_events") > F.lit(n_cap),
        F.raise_error(
            F.format_string(
                "hourly_anomalies: n_events=%s exceeds the LONG-exact "
                f"bound {n_cap} at window_hours={window_hours}; "
                "pre-aggregate to finer cells or widen to decimal",
                F.col("n_events"),
            )
        ).cast("long"),
    ).otherwise(F.col("n_events") * F.col("n_events"))
    base = hourly.select(
        "event_type",
        "hour_idx",
        "n_events",
        F.count("*").over(w).alias("_n_base"),
        F.sum("n_events").over(w).alias("_s1"),
        F.sum(sq).over(w).alias("_s2"),
    )
    mean = F.col("_s1") / F.col("_n_base")
    var = F.greatest(
        F.col("_s2") / F.col("_n_base") - mean * mean, F.lit(0.0)
    )
    std = F.sqrt(var)
    scored = (F.col("_n_base") >= min_hours) & (std > 0)
    z = F.when(scored, (F.col("n_events") - mean) / std).otherwise(F.lit(0.0))
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)
    return base.select(
        "event_type",
        "hour_idx",
        "n_events",
        r6(F.coalesce(mean, F.lit(0.0))).alias("baseline_mean"),
        r6(F.coalesce(std, F.lit(0.0))).alias("baseline_std"),
        r6(z).alias("zscore"),
        (scored & (F.abs(z) >= F.lit(z_threshold))).alias("anomaly"),
    )


def detect_gaps(
    events: DataFrame,
    min_gap_us: int = 3_600_000_000,
    key_col: str = "event_type",
) -> DataFrame:
    """Outage/silence detection per stream key: every consecutive-event
    gap of at least ``min_gap_us`` microseconds —
    ``(key, gap_start_us, gap_end_us, gap_us)`` where ``gap_start_us``
    is the last event BEFORE the silence and ``gap_end_us`` the first
    after. The monitoring complement of :func:`hourly_anomalies`
    (volume spikes) — a feed that stops entirely produces no hourly
    cells at all, so only a gap scan sees it.

    Ties on the timestamp break on ``event_id`` (the repo's µs +
    event_id ordering convention), so the lag is deterministic under
    duplicate timestamps. A key with one event yields no rows; the
    trailing open silence (last event → now) is a STREAMING concern —
    batch reports only closed gaps, deliberately. The streaming half
    is :func:`ccm_spark.streaming.stateful.streaming_detect_gaps`,
    whose closed rows converge to exactly this relation cut at the
    watermark (pinned) and whose open markers page on the silence this
    operator cannot see.

    100 TB shape: one narrow (key, ts, id) projection, one exchange on
    the key for the lag window, then a filter — nothing else moves.
    """
    if min_gap_us < 1:
        raise ValueError(f"detect_gaps: min_gap_us must be >= 1, got {min_gap_us}")
    w = Window.partitionBy("key").orderBy("ts_us", "event_id")
    slim = events.select(
        F.col(key_col).alias("key"),
        ts_micros(events).alias("ts_us"),
        "event_id",
    )
    return (
        slim.withColumn("_prev", F.lag("ts_us").over(w))
        .where(F.col("ts_us") - F.col("_prev") >= min_gap_us)
        .select(
            "key",
            F.col("_prev").alias("gap_start_us"),
            F.col("ts_us").alias("gap_end_us"),
            (F.col("ts_us") - F.col("_prev")).alias("gap_us"),
        )
    )


def interval_join(
    intervals: DataFrame,
    events: DataFrame,
    bucket_us: int = 3_600_000_000,
    id_col: str = "interval_id",
    lo_col: str = "lo_us",
    hi_col: str = "hi_us",
) -> DataFrame:
    """Containment join: every (interval, event) pair with
    ``lo_us <= ts_us <= hi_us`` — maintenance windows × events,
    experiment cohorts × impressions, outage spans × errors. The
    primitive Spark has no native operator for (a raw theta join plans
    BroadcastNestedLoopJoin — a cartesian scan that dies at scale).

    The bucketed range-join pattern: each interval EXPLODES to the
    ``bucket_us``-wide time buckets it covers (one row per covered
    bucket), each event maps to exactly ONE bucket, and the pair space
    is an equi-join on the bucket key with the range predicate as a
    post-filter. No duplicate elimination is needed — an event lives
    in one bucket, so a qualifying pair is produced exactly once.

    Scale: the shuffle is hash(bucket), cost O(|intervals|·span/bucket
    + |events|); pick ``bucket_us`` near the TYPICAL interval span so
    most intervals explode to 1-2 rows (a bucket much smaller than the
    spans multiplies the interval relation; much larger, and each
    bucket pairs events with intervals it can't match, inflating the
    post-filter). Long-tail spans cost rows, never correctness — but a
    span/bucket ratio past ``max_buckets_per_interval`` fails fast
    (distributedly, one limit-1 probe) instead of silently exploding
    the interval relation, the ``resample_ffill`` guard discipline.
    Inverted intervals (``lo_us > hi_us``) fail the same probe — a
    data bug in the interval relation must not silently shrink the
    result (r12 advice; the fail-loudly discipline the span guard
    already follows). Returns
    ``(interval_id, lo_us, hi_us, event_id, ts_us)``.

    Determinism contract (r12 advice): the guard probe runs EAGERLY at
    plan-construction time — constructing this DataFrame triggers one
    Spark job, and the intervals lineage is evaluated twice (probe +
    join). A NONDETERMINISTIC upstream could therefore pass the probe
    yet materialise a different interval in the join; feed the guard
    deterministic lineage (or localCheckpoint upstream) if your
    interval relation is derived from sampling/shuffling operators.
    """
    max_buckets_per_interval = 1_000_000
    if bucket_us < 1:
        raise ValueError(f"interval_join: bucket_us must be >= 1, got {bucket_us}")
    iv = intervals.select(
        F.col(id_col).alias("interval_id"),
        F.col(lo_col).cast("long").alias("lo_us"),
        F.col(hi_col).cast("long").alias("hi_us"),
    )
    bad = (
        iv.where(
            (F.col("lo_us") > F.col("hi_us"))
            | (
                (F.col("hi_us") - F.col("lo_us")) / F.lit(bucket_us)
                > max_buckets_per_interval
            )
        )
        .limit(1)
        .collect()
    )
    if bad:
        r = bad[0]
        if r.lo_us > r.hi_us:
            raise ValueError(
                f"interval_join: interval {r.interval_id!r} is inverted "
                f"(lo_us {r.lo_us} > hi_us {r.hi_us}) — repair the "
                "interval relation"
            )
        raise ValueError(
            f"interval_join: interval {r.interval_id!r} spans "
            f"{(r.hi_us - r.lo_us) // bucket_us} buckets at bucket_us="
            f"{bucket_us} (cap {max_buckets_per_interval}) — raise bucket_us"
        )
    iv_b = iv.select(
        "interval_id",
        "lo_us",
        "hi_us",
        F.explode(
            F.sequence(
                F.expr(f"lo_us DIV {bucket_us}"), F.expr(f"hi_us DIV {bucket_us}")
            )
        ).alias("_bucket"),
    )
    ev = events.select(
        "event_id", ts_micros(events).alias("ts_us")
    ).withColumn("_bucket", F.expr(f"ts_us DIV {bucket_us}"))
    return (
        ev.join(iv_b, "_bucket")
        .where((F.col("ts_us") >= F.col("lo_us")) & (F.col("ts_us") <= F.col("hi_us")))
        .select("interval_id", "lo_us", "hi_us", "event_id", "ts_us")
    )
