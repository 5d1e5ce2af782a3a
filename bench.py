"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The headline set covers every operator family: the full bidirectional CCM
sweep (the reference's whole surface in one plan), each dedup family,
similarity search, and the text-analysis pipeline. Results are forced with
a cheap count() so timing measures the plan execution, not driver
serialisation of big collects.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ccm_spark import entry as E  # noqa: E402
from ccm_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "ccm_bidirectional",
    "ccm_bidirectional_fast",
    "ccm_knn",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "dedup_embedding",
    "text_token_stats",
    "text_quality",
    "text_fingerprint",
    "text_langid",
    "multimodal_features",
    "events_asof_join",
    "events_sessionize",
    "events_hourly_stats",
    "pricing_summary",
    "top_customers_by_nation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("ccm_spark-bench")
    qs = E.queries()

    # untimed warmup: spin up the JVM stages and the Python worker pool so
    # per-query numbers measure steady-state execution, not process forks
    # and cold numpy/pandas imports in 32 workers
    import pandas as pd  # noqa: F401

    warm = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    )
    warm.mapInPandas(lambda it: it, schema="id long").count()
    warm.groupBy((warm.id % 4).alias("k")).count().count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        spark.catalog.clearCache()  # isolate queries: drop persisted relations
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s rows={n}", file=sys.stderr)

    # fleet benchmark: 64 independent pairs through the applyInPandas fast
    # path — the many-series scale story (one shuffle, numpy per pair)
    from ccm_spark.config import CCMConfig
    from ccm_spark.fastpath import ccm_apply_in_pandas
    from ccm_spark.generators import generate_grid_df

    t0 = time.time()
    grid = [
        {"pair_id": i, "kind": "g2", "length": 300, "coupling": 0.1 * (i % 5)}
        for i in range(64)
    ]
    fleet = generate_grid_df(spark, grid)
    cfg = CCMConfig(num_samples=20, seed=7)
    n = ccm_apply_in_pandas(fleet, cfg).count()
    timings["ccm_fleet_64x300"] = round(time.time() - t0, 3)
    print(f"# ccm_fleet_64x300: {timings['ccm_fleet_64x300']:.2f}s rows={n}", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
