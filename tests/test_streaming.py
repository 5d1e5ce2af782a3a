"""Streaming surface: the same transformation over readStream
(availableNow -> memory sink) must equal the batch result."""

from __future__ import annotations

import shutil

import pytest

from ccm_spark.sources.tables import load_table
from ccm_spark.streaming import event_stream, windowed_event_stats


@pytest.fixture()
def stream_dir(spark, sf_small, tmp_path):
    # stage the events parquet as a streaming source directory
    src = f"{sf_small}/events.parquet"
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(src, d / "part-0.parquet")
    return str(d)


def _key(rows):
    return {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in rows
    }


def test_streaming_matches_batch(spark, sf_small, stream_dir, tmp_path):
    batch = windowed_event_stats(load_table(spark, sf_small, "events"))
    expected = _key(batch.collect())

    stream = windowed_event_stats(event_stream(spark, stream_dir))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _key(spark.sql("SELECT * FROM win_stats").collect())
    assert got == expected
    assert len(got) > 0
