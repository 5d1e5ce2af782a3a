"""One-off bisect harness for the r11 knn_graph_2k regression.

Times `knn_graph_descent(embs, k=10, n_rounds=2)` at sf0.1 exactly as
bench.py's extra does, N warm runs after a warmup, printing per-run
wall-clock + loadavg. Variants are toggled by env so the module code
itself can be edited between runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    nruns = int(os.environ.get("NRUNS", "3"))
    spark = get_spark()
    from ccm_spark.pipeline.ann_graph import knn_graph_descent

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    embs.count()  # warm the scan cache

    import gc

    times = []
    for i in range(nruns + 1):
        # drop the previous run's localCheckpoint RDD blocks + broadcast
        # before timing, then let the 1-min load settle a little
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        la0 = os.getloadavg()[0]
        t0 = time.monotonic()
        n = knn_graph_descent(embs, k=10, n_rounds=2).count()
        dt = time.monotonic() - t0
        tag = "warmup" if i == 0 else f"run{i}"
        print(f"{tag}: {dt:.2f}s rows={n} load_start={la0:.1f}")
        if i > 0:
            times.append(dt)
    srt = sorted(times)
    print(
        f"median: {srt[len(srt) // 2]:.2f}s min: {srt[0]:.2f}s "
        f"all={[round(t, 2) for t in times]}"
    )


if __name__ == "__main__":
    main()
