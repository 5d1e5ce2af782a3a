"""A/B harness for the r12 driver-side ivf_pq_topk watch item (VERDICT
r12 #3): the driver recorded 9.24 s vs the 4.57 s quiet-host self
number — the only extra above 2x. Times `ivf_pq_topk` at sf0.1 exactly
as bench.py's extra does (production geometry: ksub=256, 5 Lloyd
iters, n_queries=100, k=5), N runs after a warmup, printing per-run
wall-clock + start loadavg so load attribution is per-run provable —
the knn_graph_2k bisect playbook (tools/bisect_knn_graph.py).
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
    from ccm_spark.pipeline import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    embs.count()  # warm the scan cache

    import gc

    times = []
    for i in range(nruns + 1):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        la0 = os.getloadavg()[0]
        t0 = time.monotonic()
        n = similarity.ivf_pq_topk(embs, n_queries=100, k=5).count()
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
