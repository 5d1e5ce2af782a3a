"""Day-over-day corpus monitoring — the sketch trio as an operations
loop, runnable documentation for the README "mergeable corpus sketches"
section (the reference has no sketch surface, SURVEY.md §2.1; this is
the incremental-statistics workflow a 100 TB ingestion pipeline runs
nightly).

    python examples/corpus_monitoring.py [sf_dir]

Stages (sketches are KB-to-MB parquet artifacts; the corpora are read
once each and never re-read for the diff):
  1. snapshot day A  (HLL distinct + CMS frequency + bottom-k quantile
                      sketches built in one pass each, written parquet)
  2. snapshot day B  (same sketches over a drifted corpus: 10% of docs
                      dropped, half the texts truncated, a template
                      banner injected — the classic silent-extractor-
                      regression cocktail)
  3. drift readout   (hll_growth / cms_delta / bottomk_drift over the
                      RELOADED artifacts — yesterday's corpus is gone,
                      only its sketches remain)
  3b. volume watch   (per-type hourly anomaly z-scores from the event
                      stream — the pager feed next to the content drift)
  3c. snapshot diff  (doc-level churn by content hash: added / removed /
                      changed / unchanged — WHICH documents moved, the
                      relation that scopes incremental reprocessing)
  3d. divergence     (corpus-level smoothed KL / JS between the two
                      days' unigram distributions — HOW FAR the content
                      moved, the one-number gate on a mixing decision)
  4. merge check     (bottom-k sketches of two day-B shards fold to
                      the union sketch bit-for-bit: the property that
                      lets per-shard builds replace a global pass)

The returned dict is ONE combined drift report (r12, VERDICT r11 #7):
sketch drift + doc churn + distribution divergence + volume anomalies —
the snapshot-diff → divergence → anomaly chain as a single nightly pass.
"""

from __future__ import annotations

#: the injected template token stage 2 plants and stage 3 must flag
BANNER = "subscribe-banner-token"


def run(spark, sf_dir: str, art_dir: str) -> dict:
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.sketches import (
        bottomk_build,
        bottomk_drift,
        bottomk_merge,
        bottomk_quantiles,
        cms_build,
        cms_delta,
        hll_growth,
        token_hll,
    )
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # ---- stage 1+2: per-day snapshots --------------------------------
    day_a = docs
    day_b = (
        docs.filter(F.col("doc_id") % 10 != 0)  # 10% of docs lost
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.substring(F.col("text"), 1, F.length("text") / 2),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.col("text"), F.lit(f" {BANNER} {BANNER}")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )

    from ccm_spark.sources.sinks import (
        read_corpus_sketches,
        write_corpus_sketches,
    )

    def snapshot(day_docs, name: str) -> None:
        with_len = day_docs.select(
            "doc_id", "text", F.length("text").alias("doc_len")
        )
        write_corpus_sketches(
            f"{art_dir}/{name}",
            hll=token_hll(with_len, by=None),
            cms=cms_build(with_len),
            bottomk=bottomk_build(with_len, "doc_len"),
            params={"snapshot": name, "value_col": "doc_len"},
        )

    snapshot(day_a, "day_a")
    snapshot(day_b, "day_b")

    # ---- stage 3: drift from the reloaded artifacts only -------------
    def load(name: str):
        _, sk = read_corpus_sketches(spark, f"{art_dir}/{name}")
        return sk["hll"], sk["cms"], sk["bottomk"]

    hll_a, cms_a, bk_a = load("day_a")
    hll_b, cms_b, bk_b = load("day_b")

    growth = hll_growth(hll_a, hll_b).collect()[0]
    watch = {
        r.token: r
        for r in cms_delta(cms_a, cms_b, [BANNER, "the"]).collect()
    }
    drift = {
        r.prob: r
        for r in bottomk_drift(bk_a, bk_b, [0.5, 0.9]).collect()
    }

    # ---- stage 3b (r11): ingestion-volume anomaly watch --------------
    # the same nightly loop also reads the event stream's volume report:
    # per-type hourly z-scores against the trailing day (warm-up and
    # zero-variance hours unscored) — the pager feed next to the
    # corpus-content drift numbers above
    from ccm_spark.pipeline.events_ops import hourly_anomalies

    ev = load_table(spark, sf_dir, "events")
    anom = hourly_anomalies(ev, window_hours=24, min_hours=6)
    # one action for both numbers — two .count()s would replay the full
    # events scan + hourly aggregate + window twice
    arow = anom.agg(
        F.count("*").alias("n"),
        F.sum(F.col("anomaly").cast("int")).alias("na"),
    ).collect()[0]
    n_hours, n_anom = int(arow.n), int(arow.na)

    # ---- stage 3e (r14): silence watch — the anomaly scan's blind
    # spot: a feed that stops entirely produces no hourly cells at all,
    # so only a gap scan sees it; closed >= 1h silences per type here
    # (the trailing OPEN silence is the streaming gap monitor's job —
    # streaming/stateful.py::streaming_detect_gaps pages on it live)
    from ccm_spark.pipeline.events_ops import detect_gaps

    grow = (
        detect_gaps(ev, min_gap_us=3_600_000_000)
        .agg(F.count("*").alias("n"), F.max("gap_us").alias("worst"))
        .collect()[0]
    )
    n_gaps = int(grow.n)
    # the vacuity diagnostic must fire BEFORE touching worst: max()
    # over zero rows is NULL and int(None) would mask it
    assert n_gaps > 0, "silence watch is vacuous on this fixture"
    worst_gap_h = round(int(grow.worst) / 3.6e9, 2)

    # ---- stage 3c (r12): doc-level churn — WHICH documents moved -----
    # content-hash snapshot diff: one md5 projection per side + one
    # full-outer join; added/changed scope the incremental reprocess,
    # removed feed index retirement
    from ccm_spark.pipeline.dedup import corpus_diff

    churn = {
        r.status: int(r.n)
        for r in corpus_diff(day_a, day_b)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # ---- stage 3d (r12): distribution divergence — HOW FAR it moved --
    # smoothed unigram KL/JS over the union vocabulary: the one-number
    # drift gate a curator reads before re-balancing the mixture (the
    # banner + truncation cocktail must register as nonzero JS)
    from ccm_spark.pipeline.dsir import corpus_divergence

    div = corpus_divergence(day_a, day_b).collect()[0]

    # ---- stage 4: shard-merge equals whole-day build -----------------
    with_len_b = day_b.select("doc_id", F.length("text").alias("doc_len"))
    sh0 = bottomk_build(with_len_b.filter("doc_id % 2 = 0"), "doc_len")
    sh1 = bottomk_build(with_len_b.filter("doc_id % 2 = 1"), "doc_len")
    merged = bottomk_merge(sh0, sh1)
    merged_median = bottomk_quantiles(merged, [0.5]).collect()[0].value_est
    whole_median = bottomk_quantiles(bk_b, [0.5]).collect()[0].value_est

    return {
        "docs_old_est": growth.docs_old_est,
        "docs_new_est": growth.docs_new_est,
        "new_tokens_est": growth.new_tokens_est,
        "banner_old": watch[BANNER].old_est,
        "banner_delta": watch[BANNER].delta,
        "median_len_old": drift[0.5].old_est,
        "median_len_shift": drift[0.5].shift,
        "p90_len_shift": drift[0.9].shift,
        "merged_median": merged_median,
        "whole_median": whole_median,
        "event_hours_scored": n_hours,
        "event_hours_anomalous": n_anom,
        "event_gaps_closed": n_gaps,
        "event_worst_gap_hours": worst_gap_h,
        "docs_added": churn.get("added", 0),
        "docs_removed": churn.get("removed", 0),
        "docs_changed": churn.get("changed", 0),
        "docs_unchanged": churn.get("unchanged", 0),
        "kl_ab_bits": div.kl_ab_bits,
        "kl_ba_bits": div.kl_ba_bits,
        "js_bits": div.js_bits,
        "vocab_union": int(div.vocab_union),
    }


if __name__ == "__main__":
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ccm_spark.session import get_spark

    spark = get_spark("corpus-monitoring-demo")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = run(spark, sf_dir, tempfile.mkdtemp(prefix="corpus_mon_"))
    for k, v in out.items():
        print(f"{k:>18}: {v}")
