"""Timing harness for pipeline.graph.pagerank on the bench's 20k-host
LCG graph — the round-9 perf chase (VERDICT r08 #2: get the 5-iteration
bench extra under ~3.5 s). Run: python tools/perf_pagerank.py [n_runs]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from ccm_spark.session import get_spark  # noqa: E402


def bench_graph(spark):
    return (
        spark.range(20000 * 8)
        .select(
            (F.col("id") % 20000).cast("string").alias("src"),
            ((F.col("id") * F.lit(1103515245).cast("bigint") + 12345) % 20000)
            .cast("string")
            .alias("dst"),
            (1.0 + (F.col("id") % 3)).alias("weight"),
        )
        .filter("src != dst")
    )


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("perf-pagerank")
    from ccm_spark.pipeline.graph import pagerank

    edges = bench_graph(spark)
    for i in range(n_runs):
        spark.catalog.clearCache()
        t0 = time.time()
        n = pagerank(edges, n_iters=5).count()
        print(f"run {i}: {time.time() - t0:.2f}s rows={n}", flush=True)


if __name__ == "__main__":
    main()
