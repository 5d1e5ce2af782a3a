"""applyInPandasWithState running stats must converge to the batch result."""

from __future__ import annotations

import shutil

import pytest

from ccm_spark.pipeline.events_ops import sessionize
from ccm_spark.sources.tables import load_table
from ccm_spark.streaming.stateful import (
    running_stats_batch,
    running_value_stats,
    streaming_sessionize,
)
from ccm_spark.streaming.windows import event_stream


def test_stateful_running_stats_matches_batch(spark, sf_small, tmp_path):
    batch = {
        r.event_type: (r.n, round(r.mean, 9), round(r.m2, 6))
        for r in running_stats_batch(load_table(spark, sf_small, "events")).collect()
    }

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", d / "part-0.parquet")
    stream = running_value_stats(event_stream(spark, str(d)))
    q = (
        stream.writeStream.format("memory")
        .queryName("run_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # 'update' mode may emit several rows per key across micro-batches; the
    # final state per key is the row with the largest n
    rows = spark.sql("SELECT * FROM run_stats").collect()
    final = {}
    for r in rows:
        if r.event_type not in final or r.n > final[r.event_type][0]:
            final[r.event_type] = (r.n, round(r.mean, 9), round(r.m2, 6))
    assert set(final) == set(batch)
    for k in batch:
        assert final[k][0] == batch[k][0], k
        assert final[k][1] == pytest.approx(batch[k][1], abs=1e-9), k
        assert final[k][2] == pytest.approx(batch[k][2], rel=1e-6), k


def test_streaming_sessionize_matches_batch(spark, sf_small, tmp_path):
    """The stateful streaming sessionizer's final rows (last update per
    (user, session)) must equal the batch window-based operator."""
    batch = {
        (r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in sessionize(load_table(spark, sf_small, "events")).collect()
    }

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", d / "part-0.parquet")
    stream = streaming_sessionize(event_stream(spark, str(d)))
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.sql("SELECT * FROM sess_stream").collect():
        k = (r.user_id, r.session_idx)
        # update mode: later snapshots have >= n_events; keep the largest
        if k not in final or r.n_events > final[k][0]:
            final[k] = (r.n_events, r.start_us, r.end_us, r.sum_value)
    assert set(final) == set(batch)
    for k in batch:
        assert final[k][:3] == batch[k][:3], k
        assert final[k][3] == pytest.approx(batch[k][3], abs=1e-9), k


def test_streaming_ccm_final_verdicts_match_batch(spark, tmp_path):
    """Continuous causal monitoring: after the stream drains, each
    pair's LAST emission must equal the batch fast path on the same
    points at the ladder maximum — and arrival order must not matter
    (points sort into t order inside the state)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from ccm_spark.config import CCMConfig
    from ccm_spark.fastpath import ccm_apply_in_pandas
    from ccm_spark.generators import generate_grid_df
    from ccm_spark.streaming.ccm_monitor import streaming_ccm

    grid = [
        {"pair_id": i, "kind": "g2", "length": 120, "coupling": 0.2 * i}
        for i in range(3)
    ]
    series = generate_grid_df(spark, grid)
    # a 10-point runt: below min_points, must NEVER emit a verdict
    runt = spark.createDataFrame(
        [(9, t, 0.1 * t, 0.2 * t) for t in range(10)],
        "pair_id long, t long, x double, y double",
    )
    series = series.unionByName(runt)
    cfg = CCMConfig(num_samples=6, seed=5)

    batch = {
        (r.pair_id, r.direction): (r.lib_size, r.correlation, r.slope, r.convergent)
        for r in ccm_apply_in_pandas(series.where("pair_id != 9"), cfg)
        .withColumn(
            "max_lib",
            F.max("lib_size").over(Window.partitionBy("pair_id", "direction")),
        )
        .where("lib_size = max_lib")
        .collect()
    }

    # two files, REVERSED time order inside -> two micro-batches with
    # out-of-order arrival
    d = tmp_path / "ccm_stream_src"
    d.mkdir()
    rows = series.collect()
    half = [r for r in rows if r.t % 2 == 0]
    rest = [r for r in rows if r.t % 2 == 1]
    schema = "pair_id long, t long, x double, y double"
    spark.createDataFrame([tuple(r) for r in half], schema).coalesce(1).write.parquet(
        str(d / "f0")
    )
    spark.createDataFrame([tuple(r) for r in rest], schema).coalesce(1).write.parquet(
        str(d / "f1")
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d / "*"))
    q = (
        streaming_ccm(stream, cfg, min_points=30)
        .writeStream.format("memory")
        .queryName("ccm_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_ccm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.sql("select * from ccm_monitor").collect()
    assert len(emitted) > 0
    assert all(r.pair_id != 9 for r in emitted)  # the runt stayed silent
    final = {}
    for r in emitted:
        cur = final.get((r.pair_id, r.direction))
        if cur is None or r.n_points > cur.n_points:
            final[(r.pair_id, r.direction)] = r
    assert set(final) == set(batch)
    for k, r in final.items():
        assert r.n_points == 121
        assert (r.lib_size, r.correlation, r.slope, r.convergent) == batch[k], k


def test_sessionize_update_stream_matches_duckdb_replay(spark, sf_small):
    """The FULL update-mode emission multiset of the stateful
    sessionizer (every closed session + every per-batch open-session
    snapshot over the deterministic time-tercile 3-batch split) matches
    the declarative DuckDB statement of what each micro-batch must emit
    — the applyInPandasWithState EMISSION-semantics pin, and the r10
    gate candidate's evidence. Duplicates (a snapshot re-emitted as an
    identical closed row) must appear on both sides."""
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_sessionize_updates
    from ccm_spark.streaming.stateful import sessionize_updates_replay

    out = sessionize_updates_replay(spark, sf_small)
    got = sorted(
        (r.user_id, r.session_idx, r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_small}/events.parquet')"
    )
    want = sorted(
        (int(u), int(s), int(n), int(st), int(en), float(sv))
        for u, s, n, st, en, sv in con.sql(sql_sessionize_updates()).fetchall()
    )
    assert len(got) == len(want)
    # genuinely exercises multi-batch emission: strictly more emitted
    # rows than distinct sessions (per-batch snapshots ride on top of
    # the one closure/final row per session)
    n_sessions = len({(u, s) for u, s, *_ in got})
    assert len(got) > n_sessions
    assert got == want


def test_streaming_hourly_anomalies_matches_batch(spark, sf_small, tmp_path):
    """The stateful streaming anomaly watch over a 3-batch TIME-ORDERED
    split: the last update per (event_type, hour) must equal the batch
    operator row-for-row (round6 values), including warm-up and
    zero-variance-guard rows."""
    import os
    import time

    import pyspark.sql.functions as F

    from ccm_spark.pipeline.events_ops import hourly_anomalies
    from ccm_spark.sources.tables import ts_micros
    from ccm_spark.streaming.stateful import streaming_hourly_anomalies
    from ccm_spark.streaming.windows import event_stream

    ev = load_table(spark, sf_small, "events")
    batch = {
        (r.event_type, r.hour_idx): (
            r.n_events, r.baseline_mean, r.baseline_std, r.zscore, r.anomaly
        )
        for r in hourly_anomalies(ev, window_hours=6, min_hours=3).collect()
    }

    # three time-ordered shards with strictly increasing mtimes, so
    # FileStreamSource discovers them in time order (the op's contract)
    d = tmp_path / "events_anom_stream"
    d.mkdir()
    us = ev.select(ts_micros(ev).alias("us")).agg(
        F.expr("percentile(us, 0.33)").alias("a"),
        F.expr("percentile(us, 0.66)").alias("b"),
    ).collect()[0]
    splits = [
        ev.where(ts_micros(ev) <= int(us.a)),
        ev.where((ts_micros(ev) > int(us.a)) & (ts_micros(ev) <= int(us.b))),
        ev.where(ts_micros(ev) > int(us.b)),
    ]
    for i, part in enumerate(splits):
        p = str(d / f"shard-{i}.parquet")
        part.toPandas().to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    stream = streaming_hourly_anomalies(
        event_stream(spark, str(d), max_files_per_trigger=1),
        window_hours=6,
        min_hours=3,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("anom_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_anom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM anom_stream").collect()
    final = {}
    for r in rows:
        # update mode: a key re-emits only when its own hour gains
        # events under a time-ordered split, so the final row has the
        # largest n_events (the sessionize test's rule — no reliance on
        # memory-sink row order)
        k = (r.event_type, r.hour_idx)
        v = (r.n_events, r.baseline_mean, r.baseline_std, r.zscore, r.anomaly)
        if k not in final or v[0] > final[k][0]:
            final[k] = v
    assert set(final) == set(batch)
    mism = [(k, final[k], batch[k]) for k in batch if final[k] != batch[k]]
    assert not mism, mism[:5]


def test_streaming_hourly_anomalies_rescores_straddled_hour(spark, tmp_path):
    """An hour split across two micro-batches must emit twice — the
    second emission carrying the full count — and later hours' scores
    must use the FINAL count of the straddled hour (deterministic
    hand-built straddle; the sf pin above can land on hour boundaries)."""
    import os
    import time

    import pandas as pd

    from ccm_spark.pipeline.events_ops import hourly_anomalies
    from ccm_spark.streaming.stateful import streaming_hourly_anomalies
    from ccm_spark.streaming.windows import event_stream

    US = 3_600_000_000

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).assign(
            ts=lambda d: pd.to_datetime(d["ts"], unit="us"),
            props="{}",
        )

    eid = iter(range(10_000))
    # hours 0-5: 2 events each (warm-up baseline); hour 6 STRADDLES the
    # shard boundary: 1 event in shard 1, 3 more in shard 2; hour 7 in
    # shard 2 only
    shard1 = [
        (next(eid), h * US + i, 1, "click", 1.0)
        for h in range(6)
        for i in range(2)
    ] + [(next(eid), 6 * US, 1, "click", 1.0)]
    shard2 = [(next(eid), 6 * US + 10 + i, 1, "click", 1.0) for i in range(3)] + [
        (next(eid), 7 * US, 1, "click", 1.0)
    ]
    d = tmp_path / "straddle_stream"
    d.mkdir()
    for i, rows in enumerate((shard1, shard2)):
        p = str(d / f"s{i}.parquet")
        mk(rows).to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    stream = streaming_hourly_anomalies(
        event_stream(spark, str(d), max_files_per_trigger=1),
        window_hours=6,
        min_hours=3,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("straddle_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_straddle"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM straddle_stream").collect()
    hour6 = sorted(
        (r.n_events for r in rows if r.hour_idx == 6), reverse=False
    )
    assert hour6 == [1, 4]  # emitted in both batches, count converged
    # final state equals batch on the union of shards
    ev = spark.createDataFrame(mk(shard1 + shard2))
    batch = {
        (r.event_type, r.hour_idx): (
            r.n_events, r.baseline_mean, r.baseline_std, r.zscore, r.anomaly
        )
        for r in hourly_anomalies(ev, window_hours=6, min_hours=3).collect()
    }
    final = {}
    for r in rows:
        k = (r.event_type, r.hour_idx)
        v = (r.n_events, r.baseline_mean, r.baseline_std, r.zscore, r.anomaly)
        if k not in final or v[0] > final[k][0]:
            final[k] = v
    assert final == batch
    # hour 7's baseline saw hour 6's FINAL count (4, not 1)
    assert final[("click", 7)][1] == batch[("click", 7)][1]


def test_streaming_hourly_anomalies_watermarked_out_of_order(spark, tmp_path):
    """The watermark-buffered variant (r12): a SHUFFLED late-data fixture
    — events reordered within and across micro-batches up to the declared
    lateness — must emit each closed hour EXACTLY ONCE with rows
    bit-identical to the batch operator; hours the final watermark never
    passed stay buffered (unemitted)."""
    import os
    import random
    import time

    import pandas as pd

    from ccm_spark.pipeline.events_ops import hourly_anomalies
    from ccm_spark.streaming.stateful import (
        streaming_hourly_anomalies_watermarked,
    )
    from ccm_spark.streaming.windows import event_stream

    US = 3_600_000_000
    counts = {0: 2, 1: 3, 2: 2, 3: 4, 4: 2, 5: 3, 6: 9, 7: 2, 8: 3, 9: 4}

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).assign(
            ts=lambda d: pd.to_datetime(d["ts"], unit="us"),
            props="{}",
        )

    eid = iter(range(100_000))
    rng = random.Random(42)

    def ev_rows(etype, hours):
        rows = [
            (next(eid), h * US + 7 * i + (1 if etype == "view" else 0), 1, etype, 1.0)
            for h in hours
            for i in range(counts[h])
        ]
        rng.shuffle(rows)  # within-batch disorder
        return rows

    # per shard: max event hour advances 3 -> 6 -> 9; with late_hours=2
    # the watermark closes hours <1, <4, <7 — so shard 2's hour-2/3
    # stragglers and shard 3's hour-5 stragglers are LATE but inside the
    # bound (hour >= prior watermark), exercising the buffer
    shard1 = ev_rows("click", [0, 1, 2, 3]) + ev_rows("view", [0, 1, 2, 3])
    shard2 = ev_rows("click", [2, 3, 4, 5, 6]) + ev_rows("view", [2, 3, 4, 5, 6])
    shard3 = ev_rows("click", [5, 6, 7, 8, 9]) + ev_rows("view", [5, 6, 7, 8, 9])
    d = tmp_path / "wm_stream"
    d.mkdir()
    for i, rows in enumerate((shard1, shard2, shard3)):
        p = str(d / f"s{i}.parquet")
        mk(rows).to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    stream = streaming_hourly_anomalies_watermarked(
        event_stream(spark, str(d), max_files_per_trigger=1),
        window_hours=3,
        min_hours=2,
        z_threshold=2.0,
        late_hours=2,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_anom_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM wm_anom_stream").collect()
    got = {}
    for r in rows:
        k = (r.event_type, r.hour_idx)
        assert k not in got, f"hour emitted twice: {k}"  # exactly-once
        got[k] = (r.n_events, r.baseline_mean, r.baseline_std, r.zscore, r.anomaly)

    # final watermark per key: max ts = hour 9 tail -> closes hours < 7
    ev = spark.createDataFrame(mk(shard1 + shard2 + shard3))
    want = {
        (r.event_type, r.hour_idx): (
            r.n_events, r.baseline_mean, r.baseline_std, r.zscore, r.anomaly
        )
        for r in hourly_anomalies(
            ev, window_hours=3, min_hours=2, z_threshold=2.0
        ).collect()
        if r.hour_idx < 7
    }
    assert got == want
    # non-vacuous: counts double-merged across shards for the straddled
    # hours, and the hour-6 spike (9 vs ~2-4 baseline) must flag
    assert got[("click", 2)][0] == 2 * counts[2]
    assert got[("click", 6)][4] is True


def test_streaming_hourly_anomalies_watermarked_too_late_fails(spark, tmp_path):
    """An event older than the declared lateness must fail the query
    loudly (Spark's built-in watermark would silently drop it — a pager
    feed must not under-count an hour)."""
    import os
    import time

    import pandas as pd
    import pytest

    from ccm_spark.streaming.stateful import (
        streaming_hourly_anomalies_watermarked,
    )
    from ccm_spark.streaming.windows import event_stream

    US = 3_600_000_000

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).assign(
            ts=lambda d: pd.to_datetime(d["ts"], unit="us"),
            props="{}",
        )

    # shard 1 reaches hour 8 -> watermark (late_hours=2) closes hours <6;
    # shard 2 delivers an hour-1 event: 5 hours beyond the bound
    shard1 = [(i, h * US, 1, "click", 1.0) for i, h in enumerate(range(9))]
    shard2 = [(100, 1 * US + 5, 1, "click", 1.0)]
    d = tmp_path / "wm_late_stream"
    d.mkdir()
    for i, rows in enumerate((shard1, shard2)):
        p = str(d / f"s{i}.parquet")
        mk(rows).to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    stream = streaming_hourly_anomalies_watermarked(
        event_stream(spark, str(d), max_files_per_trigger=1), late_hours=2
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_late_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm_late"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="older than the allowed lateness"):
        q.awaitTermination(180)
        q.processAllAvailable()


def test_streaming_sessionize_watermarked_out_of_order(spark, tmp_path):
    """The watermark-buffered sessionizer (r12): shuffled late-data
    fixture — events reordered within/across micro-batches up to the
    declared lateness — must emit each watermark-certified-closed
    session EXACTLY ONCE, bit-identical to the batch operator."""
    import os
    import random
    import time

    import pandas as pd

    from ccm_spark.pipeline.events_ops import sessionize
    from ccm_spark.streaming.stateful import streaming_sessionize_watermarked
    from ccm_spark.streaming.windows import event_stream

    MIN = 60_000_000
    rng = random.Random(11)

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).assign(
            ts=lambda d: pd.to_datetime(d["ts"], unit="us"),
            props="{}",
        )

    eid = iter(range(100_000))

    def sess(user, t0_min, n, step_min=3):
        return [
            (next(eid), (t0_min + i * step_min) * MIN, user, "click", 1.0 + i)
            for i in range(n)
        ]

    # gap=30m, lateness=10m; sessions per user separated by > 30m; the
    # stream ends at t=400m so each user's final watermark (390m)
    # certifies every earlier session closed, leaving only the tail
    # session open
    u1s1, u1s2, u1s3 = sess(1, 0, 4), sess(1, 60, 3), sess(1, 150, 5)
    u2s1, u2s2 = sess(2, 10, 2), sess(2, 100, 6)
    tail = [
        (next(eid), 400 * MIN, 1, "click", 0.5),
        (next(eid), 400 * MIN, 2, "click", 0.5),
    ]
    all_rows = u1s1 + u1s2 + u1s3 + u2s1 + u2s2
    # explicit cross-shard disorder INSIDE the lateness bound:
    # shard1 max=66m (wm 56m) and shard2 opens at 60m — 6 minutes of
    # cross-batch regression, absorbed by the buffer; shard2 max=115m
    # (wm 105m) splits u2's session mid-stream
    shards = [
        u1s1 + u2s1 + [u1s2[2]],          # ...plus s2's LAST event first
        u1s2[:2] + u2s2,                   # s2's earlier events arrive late
        u1s3 + tail,
    ]
    for s in shards:
        rng.shuffle(s)  # within-batch disorder
    d = tmp_path / "wm_sess_stream"
    d.mkdir()
    for i, rows in enumerate(shards):
        p = str(d / f"s{i}.parquet")
        mk(rows).to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    stream = streaming_sessionize_watermarked(
        event_stream(spark, str(d), max_files_per_trigger=1),
        gap_minutes=30,
        late_minutes=10,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm_sess"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM wm_sess_out").collect()
    got = {}
    for r in rows:
        k = (r.user_id, r.session_idx)
        assert k not in got, f"session emitted twice: {k}"
        got[k] = (r.n_events, r.start_us, r.end_us, r.sum_value)

    ev = spark.createDataFrame(mk(all_rows + tail))
    # batch ground truth; the tail events' sessions (last per user) are
    # not watermark-certified closed and stay buffered
    batch = {
        (r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    last_idx = {}
    for u, i in batch:
        last_idx[u] = max(last_idx.get(u, 0), i)
    want = {k: v for k, v in batch.items() if k[1] != last_idx[k[0]]}
    assert got == want and len(want) == 5  # 3 + 2 closed sessions


def test_streaming_sessionize_watermarked_null_values_match_batch(
    spark, tmp_path
):
    """NULL event values must not poison sum_value (r12 advice): the
    Arrow batch delivers NULL as NaN to the pandas fold, and a naive
    `sv += v` turns the whole session's sum into NaN while the batch
    operator's F.sum skips nulls. Pin the two engines bit-identical on
    a session containing a NULL value — batch side read from the SAME
    parquet bytes so the NULL survives both paths."""
    import os
    import time

    import pandas as pd

    from ccm_spark.pipeline.events_ops import sessionize
    from ccm_spark.streaming.stateful import streaming_sessionize_watermarked
    from ccm_spark.streaming.windows import event_stream

    MIN = 60_000_000
    rows = [
        (0, 0 * MIN, 1, "click", 1.0),
        (1, 3 * MIN, 1, "click", None),  # pandas NaN -> parquet NULL
        (2, 6 * MIN, 1, "click", 2.0),
        (3, 400 * MIN, 1, "click", 0.5),  # pushes wm past the session
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).assign(ts=lambda d: pd.to_datetime(d["ts"], unit="us"), props="{}")
    d = tmp_path / "wm_sess_null"
    d.mkdir()
    p = str(d / "s0.parquet")
    pdf.to_parquet(p, index=False)
    os.utime(p, (time.time(), time.time()))

    stream = streaming_sessionize_watermarked(
        event_stream(spark, str(d), max_files_per_trigger=1),
        gap_minutes=30,
        late_minutes=10,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_sess_null_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm_sess_null"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in spark.sql("SELECT * FROM wm_sess_null_out").collect()
    }
    batch = {
        (r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in sessionize(
            spark.read.parquet(str(d)), gap_minutes=30
        ).collect()
    }
    # the closed first session: 3 events, NULL skipped -> sum exactly 3.0
    key = next(k for k, v in got.items() if v[0] == 3)
    assert got[key][3] == 3.0
    assert got[key] == batch[key]


def test_wm_anomalies_replay_matches_duckdb_twin(spark, sf_small):
    """The r13-staged gate candidate (QUERIES.md): the deterministic
    3-batch replay of the watermark-buffered hourly anomalies — with
    injected cross-batch disorder inside the lateness bound — must
    equal the split-INVARIANT DuckDB oracle exactly (the batch
    anomalies relation cut at each key's final watermark). Also pins
    that the disorder injection is non-vacuous: the integer mover rule
    relocates > 0 events on this fixture."""
    import duckdb

    from ccm_spark.streaming.stateful import (
        hourly_anomalies_watermarked_replay,
    )

    # late_hours=24 (12h mover half-window): the sf0.001 events span
    # ~531 hours, so a 1h half-window relocates ~0 events — 12h moves
    # a real cohort across each tercile edge while staying in-bound
    out = hourly_anomalies_watermarked_replay(
        spark, sf_small, window_hours=6, min_hours=3, late_hours=24
    )
    got = sorted(
        (r.event_type, r.hour_idx, r.n_events, r.baseline_mean,
         r.baseline_std, r.zscore, r.anomaly)
        for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_small}/events.parquet')"
    )
    from ccm_spark.plans.oracle_sql_ext import sql_hourly_anomalies_watermarked

    want = sorted(
        (str(a), int(b), int(c), float(d), float(e), float(f), bool(g))
        for a, b, c, d, e, f, g in con.sql(
            sql_hourly_anomalies_watermarked(
                window_hours=6, min_hours=3, late_hours=24
            )
        ).fetchall()
    )
    assert len(got) == len(want) > 0
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:5]
    # non-vacuity: the replay's integer mover rule (even event_id whose
    # ts + late_us/2 crosses a tercile edge) relocated real events
    late_half = 12 * 3_600_000_000  # late_hours=24 -> late_us/2 = 12h
    moved = con.sql(f"""
        WITH b AS (SELECT epoch_us(ts) AS us, event_id,
                          (SELECT min(epoch_us(ts)) FROM events) AS lo,
                          (SELECT max(epoch_us(ts)) FROM events) AS hi
                   FROM events)
        SELECT count(*) FROM b
        WHERE event_id % 2 = 0
          AND least(2, (us + {late_half} - lo) * 3 // (hi - lo + 1))
            > least(2, (us - lo) * 3 // (hi - lo + 1))
    """).fetchone()[0]
    assert moved > 0


def test_welford_merge_skips_nan():
    """running_value_stats' fold must skip NaN (NULL via Arrow) — the
    batch COUNT(value)/AVG(value)/STDDEV(value) all skip nulls."""
    import pandas as pd

    from ccm_spark.streaming.stateful import _welford_merge

    n, mean, m2 = _welford_merge(0, 0.0, 0.0, pd.Series([1.0, float("nan"), 3.0]))
    assert n == 2 and mean == 2.0 and m2 == 2.0


def _run_wm_anomaly_shards(spark, tmp_path, name, shards, **kw):
    import os
    import time

    import pandas as pd

    from ccm_spark.streaming.stateful import (
        streaming_hourly_anomalies_watermarked,
    )
    from ccm_spark.streaming.windows import event_stream

    def mk(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).assign(ts=lambda d: pd.to_datetime(d["ts"], unit="us"), props="{}")

    d = tmp_path / name
    d.mkdir()
    for i, rows in enumerate(shards):
        p = str(d / f"s{i}.parquet")
        mk(rows).to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    stream = streaming_hourly_anomalies_watermarked(
        event_stream(spark, str(d), max_files_per_trigger=1), **kw
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {}
    for r in rows:
        k = (r.event_type, r.hour_idx)
        assert k not in got, f"emitted twice: {k}"
        got[k] = r.n_events
    all_rows = [r for s in shards for r in s]
    return got, mk(all_rows)


def test_wm_anomalies_emit_cursor_never_overshoots_watermark(spark, tmp_path):
    """Review regression (r12): a key whose FIRST observed hour sits
    above its own watermark must not advance the emit cursor past the
    watermark — an in-bound late hour arriving below the first observed
    hour must still be emitted when it closes."""
    US = 3_600_000_000
    eid = iter(range(1000))
    shard1 = [(next(eid), 100 * US + 10 * i, 1, "click", 1.0) for i in range(3)]
    # hour 99 is LATE but in-bound (>= watermark hour 98); hour 103
    # advances the watermark to close hours 99 and 100
    shard2 = [(next(eid), 99 * US + 7, 1, "click", 1.0)] + [
        (next(eid), 103 * US, 1, "click", 1.0)
    ]
    got, _ = _run_wm_anomaly_shards(
        spark, tmp_path, "wm_cursor", [shard1, shard2],
        window_hours=3, min_hours=2, late_hours=2,
    )
    assert got.get(("click", 99)) == 1, got  # the old max() cursor skipped it
    assert got.get(("click", 100)) == 3


def test_wm_anomalies_open_hours_survive_state_truncation(spark, tmp_path):
    """Review regression (r12): with lateness spanning more open hours
    than the old fixed 4*window cap, an open hour's count must survive
    state truncation and merge with its late stragglers — and every
    closed hour must match the batch operator."""
    import pyspark.sql.functions as F  # noqa: F401

    from ccm_spark.pipeline.events_ops import hourly_anomalies

    US = 3_600_000_000
    eid = iter(range(10_000))
    shard1 = [
        (next(eid), h * US + 5 * i, 1, "click", 1.0)
        for h in range(10)
        for i in range(2)
    ]  # hours 0..9, 2 events each; wm after shard1 = hour 1 (late=8)
    shard2 = [(next(eid), 3 * US + 999, 1, "click", 1.0)] + [
        (next(eid), 17 * US, 1, "click", 1.0)
    ]  # straggler into OPEN hour 3 + advance wm to close hours < 9
    got, all_pdf = _run_wm_anomaly_shards(
        spark, tmp_path, "wm_evict", [shard1, shard2],
        window_hours=1, min_hours=1, late_hours=8,
    )
    assert got.get(("click", 3)) == 3, got  # 2 from shard1 + the straggler
    ev = spark.createDataFrame(all_pdf)
    batch = {
        (r.event_type, r.hour_idx): r.n_events
        for r in hourly_anomalies(ev, window_hours=1, min_hours=1).collect()
        if r.hour_idx < 9
    }
    assert {k: v for k, v in got.items() if k[1] < 9} == batch


def test_gap_monitor_replay_matches_duckdb_twin(spark, sf_small):
    """The r14-staged gap-monitor gate candidate (QUERIES.md): the
    3-batch tercile replay of streaming_detect_gaps — closed gaps +
    EventTimeTimeout-driven open-silence markers — must equal the
    schedule-aware DuckDB twin exactly, with both row kinds
    non-vacuous, and the closed rows must equal the batch detect_gaps
    relation cut at the final watermark (streaming==batch
    convergence, the sessionize discipline)."""
    import duckdb

    from ccm_spark.streaming.stateful import detect_gaps_watermarked_replay

    # min_gap=4h, late=2h: at sf0.001 the error feed trails the global
    # max by ~7.1h -> 5.1h of certified silence -> >= 1 open marker;
    # per-key deltas reach 18-24h -> plenty of closed gaps
    out = detect_gaps_watermarked_replay(
        spark, sf_small, min_gap_us=4 * 3_600_000_000,
        late_us=2 * 3_600_000_000,
    )

    def _key(t):
        return tuple((v is None, str(v)) for v in t)

    got = sorted(
        ((r.key, r.gap_start_us, r.gap_end_us, r.gap_us, bool(r.open))
         for r in out.collect()),
        key=_key,
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_small}/events.parquet')"
    )
    from ccm_spark.plans.oracle_sql_ext import (
        sql_detect_gaps,
        sql_detect_gaps_watermarked,
    )

    want = sorted(
        ((str(a), int(b), None if c is None else int(c),
          None if d is None else int(d), bool(e))
         for a, b, c, d, e in con.sql(
             sql_detect_gaps_watermarked(
                 min_gap_us=4 * 3_600_000_000, late_us=2 * 3_600_000_000
             )
         ).fetchall()),
        key=_key,
    )
    assert len(got) == len(want) > 0
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:5]
    # both row kinds non-vacuous
    opens = [r for r in got if r[4]]
    closeds = [r for r in got if not r[4]]
    assert opens and closeds
    # streaming==batch convergence: closed rows are EXACTLY the batch
    # detect_gaps relation cut at the final watermark
    wm_final = con.sql(
        "SELECT (max(epoch_us(ts)) // 1000 - 7200000) * 1000 FROM events"
    ).fetchone()[0]
    batch_cut = sorted(
        (str(a), int(b), int(c), int(d), False)
        for a, b, c, d in con.sql(
            sql_detect_gaps(min_gap_us=4 * 3_600_000_000)
        ).fetchall()
        if int(c) < wm_final
    )
    assert closeds == batch_cut


def test_gap_monitor_hand_built_emissions(spark, tmp_path):
    """Hand-computed emission multiset for a 2-key fixture (the
    discipline of pinning semantics independently of the twin):

    tercile = (ts - B) * 3 DIV (30h + 1us), so key a's events land at
    B, B+1h, B+10h (all tercile 0 — 30h DIV (30h+1us) = 0), B+11h
    (tercile 1), B+30h (tercile 2); key b's single event B+5h is
    tercile 0. late=1h -> realized per-batch watermarks w0=B+9h
    (tercile-0 max B+10h minus 1h), w1=B+10h, w2=B+29h; wJ takes
    effect in batch J+1 (the final no-data batch applies w2).
    min_gap=4h. Expected:
      - closed (a, B+1h -> B+10h, 9h): B+10h is NOT strictly below
        w1=B+10h, so it finalizes only at w2, via the FLUSH timeout
        in the final no-data batch;
      - marker (a, B+1h): certified at w0 (w0 - (B+1h) = 8h >= 4h of
        silence; B+10h is still buffered above w0, so the gap is not
        yet closed);
      - marker (a, B+11h): certified at w2 (18h to the watermark;
        B+30h is at w2+1h and stays buffered);
      - marker (b, B+5h): b's single event finalizes via its own flush
        timeout and flags at w0 (exactly 4h of certified silence) — a
        key with ONE event pages, which the batch operator
        structurally cannot do;
      - NO closed row for (B+11h, B+30h): the end is above the final
        watermark."""
    import pyspark.sql.functions as F

    from ccm_spark.streaming.stateful import detect_gaps_watermarked_replay

    H = 3_600_000_000
    B = 1_700_000_000_000_000
    rows = [
        (1, B, "a"), (2, B + H, "a"), (3, B + 10 * H, "a"),
        (4, B + 11 * H, "a"), (5, B + 30 * H, "a"), (6, B + 5 * H, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_us long, event_type string"
    ).select(
        "event_id",
        F.timestamp_micros("ts_us").alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("").alias("props"),
    )
    d = str(tmp_path / "events_fixture")
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    import os
    import shutil

    os.makedirs(str(tmp_path / "sf"), exist_ok=True)
    part = next(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )
    shutil.copy(os.path.join(d, part), str(tmp_path / "sf" / "events.parquet"))

    out = detect_gaps_watermarked_replay(
        spark, str(tmp_path / "sf"), min_gap_us=4 * H, late_us=1 * H
    )
    got = sorted(
        ((r.key, r.gap_start_us, r.gap_end_us, r.gap_us, bool(r.open))
         for r in out.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    want = sorted(
        [
            ("a", B + H, B + 10 * H, 9 * H, False),
            ("a", B + H, None, None, True),
            ("a", B + 11 * H, None, None, True),
            ("b", B + 5 * H, None, None, True),
        ],
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    assert got == want, (got, want)
