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
