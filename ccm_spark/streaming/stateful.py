"""Custom stateful streaming — per-key running statistics with
``applyInPandasWithState``.

Extension surface (the reference has no streaming, SURVEY.md §2.1): a
continuously-updated per-event-type mean/variance (Welford update) that a
quality-monitoring pipeline keeps over an unbounded event stream. State is
one tiny tuple per key, so at scale memory is bounded by key cardinality,
not stream length; the shuffle keys on event_type.

Batch equivalence: ``running_stats_batch`` computes the same quantities
with plain aggregations — the streaming test asserts the final state
matches it.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, n bigint, mean double, m2 double"
STATE_SCHEMA = "n bigint, mean double, m2 double"


def _trunc_div(x, d: int):
    """Truncation-toward-zero integer division (SQL ``DIV`` / DuckDB
    ``//``) for int scalars or pandas Series — THE repo hour-bucket
    convention (events_ops._with_hour_idx, entry.py). Python's ``//``
    floors, which diverges from the batch twins one bucket on any
    pre-1970 timestamp; bucket with this so streaming==batch holds on
    the whole int64 domain, not just positive epochs."""
    q = x // d
    r = x - q * d
    return q + ((q < 0) & (r != 0))


def _pdf_ts_us(ts: pd.Series) -> pd.Series:
    """Pandas-side twin of sources.tables.ts_micros: epoch micros from
    whatever dtype Arrow delivered — datetime64 (TIMESTAMP[_NTZ] parquet)
    or int64 nanos (legacy nanosAsLong reads)."""
    if pd.api.types.is_datetime64_any_dtype(ts):
        return ts.astype("datetime64[us]").astype("int64")
    return ts.astype("int64") // 1000


def _welford_merge(n, mean, m2, values: pd.Series):
    for v in values:
        if v != v:  # NULL -> NaN here; batch avg/stddev skip nulls
            continue
        n += 1
        delta = v - mean
        mean += delta / n
        m2 += delta * (v - mean)
    return n, mean, m2


def running_value_stats(events: DataFrame) -> DataFrame:
    """Streaming: per-event-type running (n, mean, m2) via flatMapGroupsWithState."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            n, mean, m2 = _welford_merge(n, mean, m2, pdf["value"].astype(float))
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "mean": [mean], "m2": [m2]}
        )

    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_stats_batch(events: DataFrame) -> DataFrame:
    """Batch ground truth for the same statistics."""
    return events.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.avg("value").alias("mean"),
        (F.var_pop("value") * F.count("value")).alias("m2"),
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_idx bigint, n_events bigint, "
    "start_us bigint, end_us bigint, sum_value double"
)
SESSION_STATE_SCHEMA = (
    "session_idx bigint, start_us bigint, last_us bigint, n bigint, sum_value double"
)


def streaming_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming twin of ``events_ops.sessionize``: per-user gap-split
    sessions over an unbounded stream via ``applyInPandasWithState``.

    State per user is ONE open-session tuple (idx, start, last, n, sum), so
    the state store is bounded by user cardinality, not stream length. Each
    micro-batch emits closed sessions plus an update-mode snapshot of the
    still-open session; the last row per (user, session_idx) is the final
    answer, converging to the batch operator on any TIME-ORDERED batch
    split (events within a batch are processed in (ts, event_id) order,
    and the open session carries across batches).

    Precondition: a user's events must not regress in time across
    micro-batches (true when files/offsets are discovered in time order).
    A regressing event would silently merge into the newer session, so it
    fails the query instead; out-of-order sources need a watermark-
    buffered variant.
    """
    gap_us = gap_minutes * 60_000_000

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            idx, start, last, n, sv = state.get
        else:
            idx, start, last, n, sv = 0, 0, None, 0, 0.0
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts)
        pdf = pdf.assign(ts_us=_pdf_ts_us(pdf["ts"])).sort_values(
            ["ts_us", "event_id"]
        )
        if last is not None and int(pdf["ts_us"].iloc[0]) < last:
            raise ValueError(
                "streaming_sessionize: event time regressed across "
                f"micro-batches for user {key[0]} ({int(pdf['ts_us'].iloc[0])} "
                f"< open-session end {last}) — input files/offsets must be "
                "discovered in time order"
            )
        rows = []
        for ts_us, value in zip(pdf["ts_us"], pdf["value"].astype(float)):
            ts_us = int(ts_us)
            if last is None or ts_us - last > gap_us:
                if last is not None:
                    rows.append((key[0], idx, n, start, last, sv))
                idx += 1
                start, n, sv = ts_us, 0, 0.0
            n += 1
            if value == value:  # NULL -> NaN here; F.sum skips nulls
                sv += value
            last = ts_us
        rows.append((key[0], idx, n, start, last, sv))  # open-session snapshot
        state.update((idx, start, last, n, sv))
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_idx", "n_events", "start_us", "end_us", "sum_value"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_updates_replay(
    spark, sf_dir: str, n_batches: int = 3, query_name: str = "sess_updates_replay"
) -> "DataFrame":
    """Deterministic micro-batch replay of :func:`streaming_sessionize`
    that returns the FULL update-mode emission stream — every closed
    session and every per-batch open-session snapshot, not just the
    converged final state (which the batch twin already pins). This is
    the applyInPandasWithState EMISSION-semantics gate candidate: the
    DuckDB twin (``oracle_sql_ext.sql_sessionize_updates``) re-derives,
    for the same time-tercile batch split, exactly which rows each
    micro-batch must emit —

    - a session CLOSES in batch k when the first event of the user's
      next session arrives in k (all of its own events arrived earlier:
      batches are time-ordered), emitting its full final stats;
    - every user with input in batch k also emits a SNAPSHOT of its
      open session: stats over that session's events in batches <= k
      (a session may span batch boundaries, so a snapshot can be a
      strict prefix of the final session) —

    so a snapshot emitted twice (no growth between batches is
    impossible — a group only runs with input — but snapshot == later
    closed row is) appears twice in the multiset on BOTH engines.

    Events split into ``n_batches`` single-file shards by GLOBAL
    time-range terciles ``least(n-1, (ts - min) * n div (max - min +
    1))`` — time-ordered across batches by construction, satisfying the
    sessionizer's no-regression precondition."""

    def assign_batch(ev, lo, hi):
        # exact INTEGER division (SQL DIV), never float `/` + cast: a
        # float quotient one ulp above a batch boundary would split
        # the engines
        return F.least(
            F.lit(n_batches - 1),
            F.expr(f"(_ts_us - {lo}L) * {n_batches} DIV {hi - lo + 1}L"),
        )

    emitted = _tercile_shard_replay(
        spark,
        sf_dir,
        n_batches,
        assign_batch,
        streaming_sessionize,
        query_name,
        "ccm_sess_updates_",
        output_mode="update",
    )
    return emitted.select(
        "user_id",
        "session_idx",
        "n_events",
        "start_us",
        "end_us",
        (F.round("sum_value", 6) + F.lit(0.0)).alias("sum_value"),
    )


ANOM_OUTPUT_SCHEMA = (
    "event_type string, hour_idx bigint, n_events bigint, "
    "baseline_mean double, baseline_std double, zscore double, anomaly boolean"
)
#: state = the retained trailing (hour_idx, count) pairs, flattened to
#: two parallel arrays (the state-store schema has no map type)
ANOM_STATE_SCHEMA = "hours array<bigint>, counts array<bigint>"


def _score_hour_range(
    hours: list,
    counts: list,
    lo: int,
    hi: int | None,
    window_hours: int,
    min_hours: int,
    z_threshold: float,
) -> list:
    """Shared z-scoring kernel over the merged per-key (hour, count)
    list: emit rows for observed hours ``lo <= h`` (``< hi`` when hi is
    set), each scored against its trailing ``window_hours`` observed
    predecessors — the same rows-window semantics as the batch
    ``events_ops.hourly_anomalies``. Warm-up (< min_hours baselines)
    and zero-variance baselines score 0.0 and never flag.

    Mean/std come from the EXACT integer sums (n, Σc, Σc²) through the
    SAME double expression tree as the batch operator and its DuckDB
    twin — sqrt(max(s2/n − (s1/n)², 0)) — so the convergence pin's
    bit-identity holds by construction, not by fixture luck (a centered
    two-pass std differs in the last bits for some count vectors)."""
    import math

    from ccm_spark.functions.hashing import py_round_half_up

    rows = []
    for i, h in enumerate(hours):
        if h < lo or (hi is not None and h >= hi):
            continue
        base = counts[max(0, i - window_hours) : i]
        n_base = len(base)
        if n_base:
            s1 = sum(base)  # exact: python ints
            s2 = sum(c * c for c in base)
            mean = s1 / n_base
            std = math.sqrt(max(s2 / n_base - (s1 / n_base) * (s1 / n_base), 0.0))
        else:
            mean = std = 0.0
        scored = n_base >= min_hours and std > 0
        z = (counts[i] - mean) / std if scored else 0.0
        # py_round_half_up, not the builtin: the batch twin rounds
        # via F.round (HALF_UP on the shortest decimal repr) and the
        # convergence pin compares rounded values — banker's
        # rounding diverges on exact dyadic ties (hashing.py)
        rows.append(
            (
                h,
                counts[i],
                py_round_half_up(mean, 6) + 0.0,
                py_round_half_up(std, 6) + 0.0,
                py_round_half_up(z, 6) + 0.0,
                bool(scored and abs(z) >= z_threshold),
            )
        )
    return rows


def streaming_hourly_anomalies(
    events: DataFrame,
    window_hours: int = 24,
    min_hours: int = 6,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of ``events_ops.hourly_anomalies``: per-type
    hourly volume z-scores over an unbounded stream via
    ``applyInPandasWithState`` — the pager feed computed as events
    arrive instead of in a nightly batch.

    State per event_type is the trailing ``4 * window_hours`` OBSERVED
    (hour, count) pairs — bounded by key cardinality × window, not
    stream length; retired hours can never again be touched (monotone
    precondition below) nor serve as a newly-touched hour's baseline.
    Each micro-batch scores the full merged hour list from the earliest
    hour it touched onward (a touched hour's count shifts later hours'
    baselines) and emits update-mode rows; the LAST row per
    (event_type, hour_idx) converges to the batch operator on any
    time-ordered batch split — pinned in
    tests/test_stateful_streaming.py.

    Precondition (same as ``streaming_sessionize``): a batch touching
    an hour OLDER than the key's newest already-seen hour fails the
    query loudly rather than silently scoring against a retired
    baseline; out-of-order sources need a watermark-buffered variant.
    """
    #: retained OBSERVED hours per key (positions, not wall span): any
    #: newly-touched hour's baseline needs window_hours observed
    #: predecessors, kept with generous slack
    keep_n = 4 * window_hours

    def _score(hours: list, counts: list, from_hour: int) -> list:
        return _score_hour_range(
            hours, counts, from_hour, None, window_hours, min_hours, z_threshold
        )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hours, counts = ([], []) if not state.exists else [list(x) for x in state.get]
        held = dict(zip(hours, counts))
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts)
        hr = _trunc_div(_pdf_ts_us(pdf["ts"]), 3_600_000_000)
        batch_counts = hr.value_counts()
        touched_min = int(batch_counts.index.min())
        prev_newest = int(hours[-1]) if hours else None
        if prev_newest is not None and touched_min < prev_newest:
            raise ValueError(
                "streaming_hourly_anomalies: event hour regressed "
                f"{prev_newest - touched_min} hours for type {key[0]} — "
                "input files/offsets must be discovered in time order"
            )
        for h, c in batch_counts.items():
            held[int(h)] = held.get(int(h), 0) + int(c)
        hours = sorted(held)
        counts = [held[h] for h in hours]
        # score on the FULL merged list (evicting first would silently
        # drop batch hours older than the horizon), then retire hours
        # that can never again be touched (monotone guard above) or
        # serve as a newly-touched hour's baseline
        rows = _score(hours, counts, touched_min)
        state.update((hours[-keep_n:], counts[-keep_n:]))
        if not rows:
            return
        out = pd.DataFrame(
            rows,
            columns=[
                "hour_idx",
                "n_events",
                "baseline_mean",
                "baseline_std",
                "zscore",
                "anomaly",
            ],
        )
        out.insert(0, "event_type", key[0])
        yield out

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=ANOM_OUTPUT_SCHEMA,
        stateStructType=ANOM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: state for the watermark-buffered variant: the retained (hour, count)
#: pairs PLUS the key's max event time and the next hour to emit
ANOM_WM_STATE_SCHEMA = (
    "hours array<bigint>, counts array<bigint>, "
    "max_ts_us bigint, next_emit_hour bigint"
)

_HOUR_US = 3_600_000_000


def streaming_hourly_anomalies_watermarked(
    events: DataFrame,
    window_hours: int = 24,
    min_hours: int = 6,
    z_threshold: float = 3.0,
    late_hours: int = 2,
) -> DataFrame:
    """Out-of-order tolerant variant of ``streaming_hourly_anomalies``
    (VERDICT r11 #8): instead of failing on any hour regression, each
    hour is held OPEN until the per-key event-time watermark
    (``max seen ts − late_hours``) passes its end, then scored against
    its (now final) trailing baseline and emitted exactly once —
    append semantics per (event_type, hour_idx), no update-mode
    re-emission, because a closed hour's count AND baseline can never
    change again.

    Within-batch and cross-batch reordering up to ``late_hours`` is
    absorbed by the buffer; an event OLDER than the key's watermark
    (late beyond the declared bound) still fails the query loudly —
    the repo's honesty discipline, a strict generalization of the
    in-order operator's precondition (which is this with a zero-width
    buffer). Spark's built-in watermark would silently drop such rows;
    a pager feed must not silently under-count an hour.

    Emitted rows are bit-identical to the batch
    ``events_ops.hourly_anomalies`` rows for every hour below the
    key's final watermark (the convergence pin shuffles the fixture
    before splitting it into micro-batches); hours at/above the
    watermark remain buffered in state awaiting later events.

    State per key stays bounded: every OPEN hour (at most
    ``late_hours + in-flight``) plus the ``window_hours`` most recent
    closed hours (future closures' baselines) and two scalars — key
    cardinality × (lateness + window), not stream length.
    """
    late_us = int(late_hours) * _HOUR_US

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_hours, s_counts, max_ts, next_emit = state.get
            held = dict(zip([int(h) for h in s_hours], [int(c) for c in s_counts]))
        else:
            held, max_ts, next_emit = {}, None, None
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts)
        us = _pdf_ts_us(pdf["ts"])
        # lateness gate against the PRIOR watermark (the batch's own
        # events advance it only after the batch, Spark's own rule):
        # an event in an hour the watermark already closed would mutate
        # an emitted, finalized count
        if max_ts is not None:
            prior_closed_before = _trunc_div(int(max_ts) - late_us, _HOUR_US)
            batch_min_hour = _trunc_div(int(us.min()), _HOUR_US)
            if batch_min_hour < prior_closed_before:
                raise ValueError(
                    "streaming_hourly_anomalies_watermarked: event "
                    f"{prior_closed_before - batch_min_hour} hours older than "
                    f"the allowed lateness ({late_hours}h) for type {key[0]} — "
                    "raise late_hours or repair the source ordering"
                )
        for h, c in _trunc_div(us, _HOUR_US).value_counts().items():
            held[int(h)] = held.get(int(h), 0) + int(c)
        max_ts = int(us.max()) if max_ts is None else max(int(max_ts), int(us.max()))
        closed_before = _trunc_div(max_ts - late_us, _HOUR_US)
        hours = sorted(held)
        counts = [held[h] for h in hours]
        lo = int(next_emit) if next_emit is not None else hours[0]
        rows = _score_hour_range(
            hours, counts, lo, closed_before,
            window_hours, min_hours, z_threshold,
        )
        # the emit cursor is the WATERMARK, never max(lo, ...): on a
        # key whose first observed hour sits above its own watermark,
        # max() would over-advance the cursor and silently skip an
        # in-bound late hour (>= the watermark, < the first observed)
        # arriving in a later batch — the cursor must track only what
        # the watermark has actually certified closed
        # retire hours that can never again be touched (below the
        # watermark) nor serve as a future closure's baseline: keep
        # every OPEN hour plus the window_hours most recent closed ones
        # (a fixed 4*window cap under-retains when late_hours spans
        # more open hours than the cap)
        import bisect

        cut = bisect.bisect_left(hours, closed_before)
        keep_from = max(0, cut - window_hours)
        state.update(
            (hours[keep_from:], counts[keep_from:], max_ts, closed_before)
        )
        if not rows:
            return
        out = pd.DataFrame(
            rows,
            columns=[
                "hour_idx",
                "n_events",
                "baseline_mean",
                "baseline_std",
                "zscore",
                "anomaly",
            ],
        )
        out.insert(0, "event_type", key[0])
        yield out

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=ANOM_OUTPUT_SCHEMA,
        stateStructType=ANOM_WM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hourly_anomalies_watermarked_replay(
    spark,
    sf_dir: str,
    n_batches: int = 3,
    window_hours: int = 24,
    min_hours: int = 6,
    late_hours: int = 2,
    query_name: str = "wm_anom_replay",
) -> "DataFrame":
    """Deterministic micro-batch replay of
    :func:`streaming_hourly_anomalies_watermarked` over the events
    table — the APPEND-mode watermark-buffer gate candidate (r13,
    QUERIES.md), the ``sessionize_updates_replay`` pattern.

    Events split into ``n_batches`` single-file shards by global
    time-range terciles, then deterministic CROSS-BATCH DISORDER is
    injected inside the lateness bound: an even-``event_id`` event
    whose timestamp sits within ``late_us/2`` of its tercile's upper
    edge (detected purely with integers — bucketing ``ts + late_us/2``
    lands in a later tercile) arrives one batch LATE. The buffer must
    absorb it; the in-order operator would fail loudly on the same
    shards (regression bounded by construction: the mover's hour is
    at most one hour below the prior batch's max, and the gate allows
    ``late_hours`` ≥ 2).

    The emission MULTISET is split-invariant by append-exactly-once
    semantics — each (event_type, hour) below the key's FINAL
    watermark emits exactly once, scored against its final trailing
    baseline — so the DuckDB twin
    (``oracle_sql_ext.sql_hourly_anomalies_watermarked``) never needs
    the split arithmetic: it is the batch anomalies relation
    restricted to ``hour_idx < (max_ts(key) − late_us) DIV hour`` —
    which is exactly what makes this gate STRONG evidence: the stream
    runs with real disorder, the oracle states the physics-level
    answer independently of the schedule."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyspark.sql.functions as F

    from ccm_spark.sources.tables import load_table, ts_micros
    from ccm_spark.streaming.windows import event_stream

    late_us = int(late_hours) * _HOUR_US

    def assign_batch(ev, lo, hi):
        span = hi - lo + 1

        def tercile(col):
            return F.least(
                F.lit(n_batches - 1),
                F.expr(f"({col} - {lo}L) * {n_batches} DIV {span}L"),
            )

        b0 = tercile("_ts_us")
        # an event "arrives late" (next batch) when shifting its ts by
        # late_us/2 crosses a tercile edge — all-integer,
        # twin-re-derivable
        near_edge = tercile(f"_ts_us + {late_us // 2}L") > b0
        return F.least(
            F.lit(n_batches - 1),
            b0 + ((F.col("event_id") % 2 == 0) & near_edge).cast("long"),
        )

    return _tercile_shard_replay(
        spark,
        sf_dir,
        n_batches,
        assign_batch,
        lambda stream: streaming_hourly_anomalies_watermarked(
            stream,
            window_hours=window_hours,
            min_hours=min_hours,
            late_hours=late_hours,
        ),
        query_name,
        "ccm_wm_anom_",
    )


def _tercile_shard_replay(
    spark,
    sf_dir: str,
    n_batches: int,
    assign_batch,
    build_stream,
    query_name: str,
    tmp_prefix: str,
    output_mode: str = "append",
    shard_df=None,
) -> "DataFrame":
    """Shared deterministic micro-batch replay harness for the
    watermark-family gate rows: split the events table into
    ``n_batches`` single-file shards by ``assign_batch(ev, lo, hi)``
    (a Column in [0, n_batches) over the ``_ts_us``-augmented events),
    stagger the shard mtimes so FileStreamSource discovers them in
    order one per trigger, run ``build_stream(raw_stream)`` into an
    append memory sink with availableNow, and return the emitted
    relation localCheckpointed. One copy of the tempdir/utime/
    checkpoint/timeout plumbing — a fix here reaches every replay.

    ``shard_df(ev, i) -> DataFrame`` overrides the disjoint
    ``assign_batch`` split entirely (``assign_batch`` may then be
    None): the dedup replay uses it to deliver the FULL table in every
    micro-batch — at-least-once redelivery, which a one-batch-per-row
    assignment cannot express."""
    import os
    import shutil
    import tempfile
    import time as _time

    from ccm_spark.sources.tables import load_table, ts_micros
    from ccm_spark.streaming.windows import event_stream

    events = load_table(spark, sf_dir, "events")
    ev = events.withColumn("_ts_us", ts_micros(events))
    if shard_df is None:
        lo, hi = ev.agg(F.min("_ts_us"), F.max("_ts_us")).first()
        b = assign_batch(ev, int(lo), int(hi))
    d = tempfile.mkdtemp(prefix=tmp_prefix)
    try:
        src = os.path.join(d, "src")
        os.makedirs(src)
        now = _time.time()
        for i in range(n_batches):
            shard_dir = os.path.join(d, f"b{i}")
            sdf = shard_df(ev, i) if shard_df is not None else ev.where(b == i)
            sdf.drop("_ts_us").coalesce(1).write.parquet(shard_dir)
            part = next(
                (
                    f
                    for f in sorted(os.listdir(shard_dir))
                    if f.endswith(".parquet")
                ),
                None,
            )
            if part is None:
                # an assign_batch that leaves a tercile empty (tiny
                # fixture, disorder promotion) must fail diagnosably,
                # not as a bare StopIteration from next()
                raise ValueError(
                    f"{query_name}: assign_batch left shard {i} of "
                    f"{n_batches} empty — every micro-batch needs at "
                    "least one row (use fewer batches or a denser "
                    "fixture)"
                )
            dst = os.path.join(src, f"f{i}.parquet")
            shutil.copy(os.path.join(shard_dir, part), dst)
            os.utime(dst, (now - 100 + i * 10, now - 100 + i * 10))

        try:
            spark.catalog.dropTempView(query_name)
        except Exception:
            pass
        q = (
            build_stream(event_stream(spark, src, max_files_per_trigger=1))
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError(f"{query_name} stream exceeded 600s")
        return spark.table(query_name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


#: state for the watermark-buffered sessionizer: the open-session tuple
#: (n == 0 means no open session), the held-back event buffer, and the
#: key's max event time
SESSION_WM_STATE_SCHEMA = (
    "session_idx bigint, start_us bigint, last_us bigint, n bigint, "
    "sum_value double, buf_ts array<bigint>, buf_eid array<bigint>, "
    "buf_val array<double>, max_ts_us bigint"
)


def streaming_sessionize_watermarked(
    events: DataFrame,
    gap_minutes: int = 30,
    late_minutes: int = 10,
) -> DataFrame:
    """Out-of-order tolerant variant of ``streaming_sessionize`` (the
    same buffer-until-watermark design as
    ``streaming_hourly_anomalies_watermarked``): each event is HELD in
    per-key state until the key's event-time watermark
    (``max seen ts − late_minutes``) passes it, then folded into the
    session run in strict ``(ts, event_id)`` order; a session is
    emitted ONCE, when the watermark passes its end by more than the
    gap (no future event can extend it: arrivals below the watermark
    fail the lateness gate) — append semantics, no open-session
    snapshots.

    Reordering up to ``late_minutes`` is absorbed; an event OLDER than
    the key's watermark still fails the query loudly (silently merging
    it into a newer session is the bug the in-order operator's
    precondition exists to prevent). Emitted sessions are bit-identical
    to the batch ``events_ops.sessionize`` rows for every session the
    final watermark certifies closed — pinned on a shuffled late-data
    fixture in tests/test_stateful_streaming.py.

    State per key: one open-session tuple + the buffered tail (events
    within ``late_minutes`` of the key's max ts) — bounded by key
    cardinality × lateness window × per-key event rate, not stream
    length.
    """
    gap_us = int(gap_minutes) * 60_000_000
    late_us = int(late_minutes) * 60_000_000

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            idx, start, last, n, sv, b_ts, b_eid, b_val, max_ts = state.get
            buf = [
                (int(t), int(e), float(v))
                for t, e, v in zip(b_ts, b_eid, b_val)
            ]
        else:
            idx, start, last, n, sv, max_ts = 0, 0, 0, 0, 0.0, None
            buf = []
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts)
        ts_us = _pdf_ts_us(pdf["ts"])
        batch_min = int(ts_us.min())
        if max_ts is not None and batch_min < max_ts - late_us:
            raise ValueError(
                "streaming_sessionize_watermarked: event "
                f"{(max_ts - late_us) - batch_min} us older than the allowed "
                f"lateness ({late_minutes}m) for user {key[0]} — raise "
                "late_minutes or repair the source ordering"
            )
        buf.extend(
            (int(t), int(e), float(v))
            for t, e, v in zip(ts_us, pdf["event_id"], pdf["value"].astype(float))
        )
        max_ts = batch_min if max_ts is None else max_ts
        max_ts = max(max_ts, int(ts_us.max()))
        wm = max_ts - late_us
        buf.sort()
        ready = [r for r in buf if r[0] < wm]
        buf = [r for r in buf if r[0] >= wm]
        rows = []
        for t, _e, v in ready:
            if n == 0 or t - last > gap_us:
                if n > 0:
                    rows.append((key[0], idx, n, start, last, sv))
                idx += 1
                start, n, sv = t, 0, 0.0
            n += 1
            if v == v:  # NULL -> NaN here; match F.sum's null-skipping
                sv += v
            last = t
        # close the trailing open session once the watermark passes its
        # end by more than the gap — every later event must start a new
        # session, so its stats are final
        if n > 0 and wm - last > gap_us:
            rows.append((key[0], idx, n, start, last, sv))
            start, last, n, sv = 0, 0, 0, 0.0
        state.update(
            (
                idx,
                start,
                last,
                n,
                sv,
                [t for t, _, _ in buf],
                [e for _, e, _ in buf],
                [v for _, _, v in buf],
                max_ts,
            )
        )
        if not rows:
            return
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "session_idx",
                "n_events",
                "start_us",
                "end_us",
                "sum_value",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_WM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


GAP_OUTPUT_SCHEMA = (
    "key string, gap_start_us bigint, gap_end_us bigint, gap_us bigint, "
    "open boolean"
)
#: state = last finalized event time, the not-yet-finalized event
#: buffer (events at/above the watermark), and the gap-start already
#: flagged as open silence (None = none)
GAP_STATE_SCHEMA = (
    "last_final_us bigint, buf_ts array<bigint>, flagged_start bigint"
)


def streaming_detect_gaps(
    events: DataFrame,
    min_gap_us: int = 3_600_000_000,
    key_col: str = "event_type",
) -> DataFrame:
    """Streaming per-key silence detection — the TRAILING-OPEN half of
    the monitoring pair the batch :func:`~ccm_spark.pipeline.events_ops.
    detect_gaps` deliberately defers (its docstring: a feed that stops
    entirely produces no rows at all in any batch relation cut; only a
    stateful emitter holding "last seen" against a GLOBAL watermark can
    page on it). Two row kinds, append-exactly-once each:

    - CLOSED gaps (``open = false``): a consecutive-event delta >=
      ``min_gap_us`` emits once its later endpoint drops below the
      event-time watermark (no in-bound event can land between the
      endpoints anymore) — converging to exactly the batch
      ``detect_gaps`` relation cut at the final watermark.
    - OPEN silence markers (``open = true``, NULL end/width): when the
      watermark certifies >= ``min_gap_us`` of silence after a key's
      last finalized event, one marker row (key, last_seen) emits — the
      page. Emission is keyed by the gap start, so a key that resumes
      and goes silent again pages again, and a marker's gap, once
      closed by a resuming event, also emits its closed row (the
      marker stays in the log as history — append semantics).

    REQUIRES ``withWatermark`` upstream (the global watermark is what
    lets a key that stops entirely be detected: its own max-ts
    watermark would freeze with it) and ``GroupStateTimeout.
    EventTimeTimeout`` — a silent key re-evaluates via timeout at the
    first watermark that can certify its silence, without any data
    arriving. Contract: disorder must stay inside the withWatermark
    delay — the engine DROPS later-than-watermark rows before this
    operator sees them (unlike the buffered anomalies op, which owns
    its per-key watermark and can raise; a global watermark is only
    available through the engine's mechanism). Size the delay
    generously.

    State per key is three scalars plus the in-flight buffer (bounded
    by delay × event rate), independent of stream length. 100 TB
    shape: one exchange on the key; rows and state never leave their
    reducer.
    """
    if min_gap_us < 1:
        raise ValueError(
            f"streaming_detect_gaps: min_gap_us must be >= 1, got {min_gap_us}"
        )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_final, buf, flagged = state.get
            buf = [int(t) for t in buf]
        else:
            last_final, buf, flagged = None, [], None
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf):
                    buf.extend(int(t) for t in _pdf_ts_us(pdf["ts"]))
        # getCurrentWatermarkMs is the PRIOR batches' watermark (Spark
        # advances it between batches); ms floor of (max event time -
        # delay). 0 = no watermark yet -> nothing finalizes.
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        closed = []
        if buf and wm_us > 0:
            import bisect

            buf.sort()
            cut = bisect.bisect_left(buf, wm_us)  # finalize ts < wm
            final, buf = buf[:cut], buf[cut:]
            prev = last_final
            for t in final:
                if prev is not None and t - prev >= min_gap_us:
                    closed.append((key[0], int(prev), int(t), int(t - prev), False))
                prev = t
            if prev is not None:
                last_final = int(prev)
        marker = None
        if (
            last_final is not None
            and wm_us - last_final >= min_gap_us
            and flagged != last_final
        ):
            marker = (key[0], int(last_final), None, None, True)
            flagged = int(last_final)
        state.update((last_final, buf, flagged))
        # timeout = the next watermark advance this key must SEE without
        # any data arriving; a key is only ever invoked on data or on a
        # fired timeout (the final no-data micro-batch in particular
        # runs NOTHING else), so both pending obligations register one:
        # - flush: buffered events finalize (emitting their closed
        #   gaps) once the watermark passes the earliest of them;
        # - marker: the smallest ms with ms*1000 >= last_final +
        #   min_gap, minus 1 because the engine fires on STRICT
        #   timeout < wm — firing is then exactly iff the marker
        #   condition holds.
        # The engine rejects targets at/below the current watermark;
        # the +1 clamp can defer a sub-ms boundary case by one batch
        # (the evaluation at firing re-checks every condition, so no
        # row is ever wrong, at most one batch later).
        targets = []
        if buf:
            targets.append(min(buf) // 1000)
        if last_final is not None and flagged != last_final:
            targets.append(-((last_final + min_gap_us) // -1000) - 1)
        if targets:
            state.setTimeoutTimestamp(max(min(targets), wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["key", "gap_start_us", "gap_end_us", "gap_us", "open"],
            )
        if marker is not None:
            # separate frame: a None in a closed-row int column would
            # coerce the whole column to float64 in pandas
            yield pd.DataFrame(
                [marker],
                columns=["key", "gap_start_us", "gap_end_us", "gap_us", "open"],
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=GAP_OUTPUT_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def detect_gaps_watermarked_replay(
    spark,
    sf_dir: str,
    n_batches: int = 3,
    min_gap_us: int = 14_400_000_000,
    late_us: int = 7_200_000_000,
    key_col: str = "event_type",
    query_name: str = "gap_monitor_replay",
) -> "DataFrame":
    """Deterministic micro-batch replay of :func:`streaming_detect_gaps`
    over the events table — staged r15 gate candidate (QUERIES.md).

    Events split into ``n_batches`` single-file shards by global
    time-range terciles (time-ordered across batches — the disorder
    machinery is already gated through hourly_anomalies_watermarked;
    what is NEW under test here is the EventTimeTimeout path: silent
    keys re-evaluating with no data in the batch, including the final
    no-data micro-batch that applies the last watermark). The emission
    multiset is deterministic for this fixed split, and the DuckDB twin
    (``oracle_sql_ext.sql_detect_gaps_watermarked``) re-derives it from
    the same tercile arithmetic: closed rows are the batch detect_gaps
    relation cut at the final watermark (split-invariant), and open
    markers are the distinct (key, last-finalized) pairs certified
    silent by any of the realized per-batch watermarks
    ``(floor(max_us(terciles <= j) / 1000) - delay_ms) * 1000``."""
    from ccm_spark.sources.tables import ts_micros

    if late_us % 1_000_000:
        raise ValueError("late_us must be whole seconds (withWatermark delay)")

    def assign_batch(ev, lo, hi):
        return F.least(
            F.lit(n_batches - 1),
            F.expr(f"(_ts_us - {lo}L) * {n_batches} DIV {hi - lo + 1}L"),
        )

    def build_stream(stream):
        stream = stream.withColumn(
            "event_time", F.timestamp_micros(ts_micros(stream))
        ).withWatermark("event_time", f"{late_us // 1_000_000} seconds")
        return streaming_detect_gaps(
            stream, min_gap_us=min_gap_us, key_col=key_col
        )

    return _tercile_shard_replay(
        spark,
        sf_dir,
        n_batches,
        assign_batch,
        build_stream,
        query_name,
        "ccm_gap_monitor_",
    )
