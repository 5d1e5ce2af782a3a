"""The engine must tolerate every ts physical type a real events parquet
can carry: TIMESTAMP(us) / TIMESTAMP_NTZ (the common case) and INT64
TIMESTAMP(NANOS) (read as long via nanosAsLong). Round 3 regressed when
the testdata switched nanos -> micros and every plan hard-coded
``CAST(ts AS BIGINT)``; this pins dtype-regeneration breakage as a test
failure instead of a round failure (sources.tables.ts_micros)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ccm_spark.pipeline.events_ops import sessionize
from ccm_spark.sources.tables import events_pair_series, load_table
from ccm_spark.streaming.windows import windowed_event_stats

BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in epoch micros
N = 60


def _write_events(path: str, unit: str) -> None:
    # 2 users x 2 event types; a >30-min gap every 10 events so sessionize
    # produces multiple sessions; minute spacing otherwise
    ts_us, uid, etype, val = [], [], [], []
    t = BASE_US
    for i in range(N):
        if i % 10 == 0:
            t += 45 * 60_000_000
        else:
            t += 60_000_000
        ts_us.append(t)
        uid.append(i % 2)
        etype.append("click" if i % 3 else "view")
        val.append(float(i) * 0.25)
    table = pa.table(
        {
            "event_id": pa.array(range(N), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")).cast(pa.timestamp(unit)),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(["{}"] * N, pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def dtype_dirs(tmp_path_factory):
    dirs = {}
    for unit in ("us", "ns"):
        d = tmp_path_factory.mktemp(f"events_{unit}")
        _write_events(str(d / "events.parquet"), unit)
        dirs[unit] = str(d)
    return dirs


def _collect_sorted(df):
    return sorted(map(tuple, df.collect()))


def test_load_table_dtypes(spark, dtype_dirs):
    micros = load_table(spark, dtype_dirs["us"], "events")
    nanos = load_table(spark, dtype_dirs["ns"], "events")
    assert micros.schema["ts"].dataType.typeName().startswith("timestamp")
    assert nanos.schema["ts"].dataType.typeName() == "long"  # nanosAsLong


def test_pair_series_identical_across_ts_dtypes(spark, dtype_dirs):
    got_us = _collect_sorted(events_pair_series(spark, dtype_dirs["us"], max_points=50))
    got_ns = _collect_sorted(events_pair_series(spark, dtype_dirs["ns"], max_points=50))
    assert got_us == got_ns
    assert len(got_us) > 0


def test_sessionize_identical_across_ts_dtypes(spark, dtype_dirs):
    got = {
        unit: _collect_sorted(sessionize(load_table(spark, d, "events")))
        for unit, d in dtype_dirs.items()
    }
    assert got["us"] == got["ns"]
    # the fixture's 45-min gaps must actually split sessions
    assert len(got["us"]) > 2


def test_windowed_stats_identical_across_ts_dtypes(spark, dtype_dirs):
    got = {
        unit: _collect_sorted(windowed_event_stats(load_table(spark, d, "events")))
        for unit, d in dtype_dirs.items()
    }
    assert got["us"] == got["ns"]
    assert len(got["us"]) > 0


def test_streaming_stats_match_batch_on_both_dtypes(spark, dtype_dirs, tmp_path):
    """The streaming twin must equal the batch op whichever ts physical
    type the stream's files carry (event_stream infers the schema from
    the files; r03 hard-coded int64 and broke on micros parquet)."""
    from ccm_spark.streaming.windows import event_stream

    for unit, d in dtype_dirs.items():
        batch = _collect_sorted(windowed_event_stats(load_table(spark, d, "events")))
        stream = windowed_event_stats(event_stream(spark, d))
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName(f"ts_dtype_{unit}")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{unit}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = _collect_sorted(spark.sql(f"SELECT * FROM ts_dtype_{unit}"))
        assert got == batch, f"streaming != batch for ts unit {unit}"


def test_hourly_rollup_identical_across_ts_dtypes(spark, dtype_dirs):
    from ccm_spark.pipeline.events_ops import hourly_rollup

    got = {
        unit: _collect_sorted(
            hourly_rollup(load_table(spark, d, "events")).fillna(
                {"hour_idx": -1, "event_type": ""}
            )
        )
        for unit, d in dtype_dirs.items()
    }
    assert got["us"] == got["ns"]
    # per-(type, hour) cells + subtotals + grand total all present
    gids = {r[2] for r in got["us"]}
    assert gids == {0, 1, 3}


def test_resample_ffill_identical_across_ts_dtypes(spark, dtype_dirs):
    """The regular-grid resample must produce identical rows whether ts
    is TIMESTAMP(us) or INT64 nanos — ts_micros dispatch, not a
    hard-coded cast."""
    from ccm_spark.pipeline.events_ops import resample_ffill

    results = {}
    for unit, d in dtype_dirs.items():
        ev = load_table(spark, d, "events")
        results[unit] = _collect_sorted(
            resample_ffill(ev, 10 * 60_000_000)  # 10-minute grid
        )
    assert results["us"] == results["ns"]
    assert len(results["us"]) > 0
