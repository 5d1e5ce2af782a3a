"""CSV/pasted-series sources (reference examples.livemd custom-data path)."""

from __future__ import annotations

import pytest

from ccm_spark import CCM
from ccm_spark.sources.csv_series import parse_pasted_series, read_csv_series

# the livemd's default pasted pair (examples.livemd:190)
X_TEXT = "1.0,1.2,1.5,1.8,2.0,2.3,2.1,1.9,1.6,1.4"
Y_TEXT = "0.5,0.8,1.1,1.4,1.6,1.8,1.7,1.5,1.2,1.0"


def test_parse_pasted_series(spark):
    df = parse_pasted_series(spark, X_TEXT, Y_TEXT)
    rows = df.orderBy("t").collect()
    assert len(rows) == 10
    assert rows[0].x == 1.0 and rows[0].y == 0.5
    assert rows[9].t == 9


def test_parse_rejects_unequal_and_short(spark):
    with pytest.raises(ValueError, match="same length"):
        parse_pasted_series(spark, "1,2,3", "1,2")
    with pytest.raises(ValueError, match="at least 10"):
        parse_pasted_series(spark, "1,2,3", "1,2,3")
    with pytest.raises(ValueError, match="numeric"):
        parse_pasted_series(spark, ",".join(["x"] * 10), ",".join(["1"] * 10))


def test_pasted_series_runs_ccm(spark):
    series = parse_pasted_series(spark, X_TEXT, Y_TEXT)
    res = CCM.from_dataframe(series, num_samples=2, seed=3).bidirectional_ccm()
    # max_lib_size = 10 - 2 = 8 < 10 -> single-entry ladder [8]
    assert [ls for ls, _ in res["x_causes_y"]["results"]] == [8]


def test_events_pair_series_two_phase_topk(spark):
    """Series prep must not globally sort a whole event type on one task:
    phase 1 ranks within (event_type, split_id) — a distributed window —
    and only the bounded survivor set reaches the per-type global rank."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from ccm_spark.sources.tables import events_pair_series, load_table, ts_micros

    sf_dir = "/root/testdata/sf0.001"
    got = events_pair_series(spark, sf_dir, max_points=120)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2, plan
    assert "split_id" in plan, plan

    # equivalent single-window formulation as the correctness oracle
    ev = load_table(spark, sf_dir, "events")
    ts_us = ts_micros(ev)
    w = Window.partitionBy("event_type").orderBy(ts_us.asc(), F.col("event_id").asc())
    naive = (
        ev.where(F.col("event_type").isin(["click", "view"]))
        .select("event_type", "value", (F.row_number().over(w) - 1).alias("t"))
        .where(F.col("t") < 120)
    )
    nx = naive.where(F.col("event_type") == "click").select("t", F.col("value").alias("x"))
    ny = naive.where(F.col("event_type") == "view").select("t", F.col("value").alias("y"))
    want = nx.join(ny, "t").select(F.lit(0).cast("long").alias("pair_id"), "t", "x", "y")

    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_read_csv_series_roundtrip(spark, tmp_path):
    p = tmp_path / "series.csv"
    p.write_text(
        "pair_id,t,x,y\n" + "\n".join(f"0,{t},{t * 0.1},{t * 0.2}" for t in range(12))
    )
    df = read_csv_series(spark, str(p))
    rows = df.orderBy("t").collect()
    assert len(rows) == 12
    assert rows[3].x == pytest.approx(0.3)


def test_load_table_orc_and_json_round_trip(spark, sf_small, tmp_path):
    """Operators are format-agnostic: the documents table re-materialised
    as ORC or JSON loads back value-identical, and a pipeline operator
    produces the same result on it."""
    from ccm_spark.pipeline.text import token_stats
    from ccm_spark.sources.tables import convert_table, load_table

    base = load_table(spark, sf_small, "documents")
    want_rows = sorted(tuple(r) for r in base.collect())
    want_stats = sorted(tuple(r) for r in token_stats(base).collect())
    for fmt in ("orc", "json"):
        convert_table(spark, sf_small, "documents", str(tmp_path), fmt)
        got = load_table(spark, str(tmp_path), "documents", fmt=fmt)
        got = got.select(*base.columns)  # json alphabetises columns
        assert sorted(tuple(r) for r in got.collect()) == want_rows
        assert (
            sorted(tuple(r) for r in token_stats(got).collect()) == want_stats
        )
