"""A/B harness for the r14 driver-side line_dedup watch item (VERDICT
r14 What's wrong #1 / Next #2): the driver recorded 4.118 s median
(all three runs in [3.651, 5.726] at recorded loadavg ~4.5) vs
0.43-0.46 s quiet-host self (9.0x; 12.7x its own r13 driver 0.325 s)
on byte-unchanged pipeline/dedup.py. Times the bench extra at sf0.1
exactly as bench.py does (`remove_duplicated_lines(documents).count()`
— the explode -> min-occurrence window -> filtered re-join chain), N
runs after a warmup, printing per-run wall-clock + start loadavg so
load attribution is per-run provable — the playbook that cleared
ivf_pq_topk (r13, tools/perf_ivf_pq.py) and quality_classifier (r14,
tools/perf_quality_classifier.py).

Set SPLIT=1 to additionally time the two phases separately: the line
relation with its corpus-wide first-occurrence window (the only
exchange) vs the filtered array_join rebuild scan — the bisect to run
if load does not explain the excursion.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    nruns = int(os.environ.get("NRUNS", "3"))
    split = os.environ.get("SPLIT", "0") == "1"
    spark = get_spark()

    import pyspark.sql.functions as F

    from ccm_spark.pipeline.dedup import remove_duplicated_lines
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm the scan cache

    import gc

    times = []
    for i in range(nruns + 1):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        la0 = os.getloadavg()[0]
        t0 = time.monotonic()
        n = remove_duplicated_lines(docs).count()
        dt = time.monotonic() - t0
        phases = ""
        if split:
            # phase bisect AFTER the timed run (before it would warm
            # the very scan the main number is meant to measure): the
            # exploded line relation alone, vs the full chain above
            t0 = time.monotonic()
            docs.select("doc_id", F.posexplode(F.split("text", "\n"))).count()
            t_a = time.monotonic() - t0
            phases = f" explode={t_a:.2f}s rebuild~={max(dt - t_a, 0):.2f}s"
        tag = "warmup" if i == 0 else f"run{i}"
        print(f"{tag}: {dt:.2f}s rows={n} load_start={la0:.1f}{phases}")
        if i > 0:
            times.append(dt)
    srt = sorted(times)
    # bench.py's median convention: average the two middles on even n
    med = (
        srt[len(srt) // 2]
        if len(srt) % 2
        else (srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2
    )
    print(
        f"median: {med:.2f}s min: {srt[0]:.2f}s "
        f"all={[round(t, 2) for t in times]}"
    )


if __name__ == "__main__":
    main()
