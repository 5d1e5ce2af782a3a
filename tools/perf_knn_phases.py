"""Phase attribution for knn_graph_descent at bench geometry (r16).

Times the descent at n_rounds = 0/1/2 (same corpus and params as the
bench's knn_graph_2k extra) so the seed phase and the per-round marginal
cost separate, and dumps the FULL one-round plan (capped_adjacency +
two-hop join + score_topk over a checkpointed nbrs) at small geometry —
the r15 capture only showed the score_topk kernel, so the adjacency
window / join exchange structure was never captured.

Usage::

    python tools/perf_knn_phases.py [plan|time|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccm_spark.session import get_spark  # noqa: E402


def dump_round_plan(spark, out_path: str) -> None:
    import io
    from contextlib import redirect_stdout

    import pyspark.sql.functions as F  # noqa: F401

    from ccm_spark.pipeline import ann_graph as ag
    from ccm_spark.pipeline.similarity import cosine_pandas

    rows = [(i, (i * 7 + 3) % 11, (i * 5 + 1) % 13) for i in range(8)]
    edges = spark.createDataFrame(
        [(a, b, 0.5) for a in range(8) for b in ((a + 1) % 8, (a + 3) % 8)],
        "src long, dst long, cos_sim double",
    )
    nbrs = edges.localCheckpoint(eager=True)
    embs = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(rows)],
        "vec_id long, embedding array<double>",
    )
    vecs, pair_cos = ag._pair_scorer(embs, 8, broadcast_threshold=100)
    cos = cosine_pandas()
    adj = ag.capped_adjacency(nbrs, k=2, rho=1.5)
    if os.environ.get("TAG", "before") != "before":
        # mirror the r16 loop body exactly (per-round adjacency checkpoint)
        adj = adj.localCheckpoint(eager=True)
    two_hop = (
        adj.alias("l")
        .join(adj.alias("r"), F.col("l.src") == F.col("r.src"))
        .select(F.col("l.dst").alias("src"), F.col("r.dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    cand = adj.union(two_hop)
    out = ag._topk(
        ag._score_pairs(vecs, cos, cand, pair_cos, drop_unknown=False), 2
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    with open(out_path, "w") as f:
        f.write(
            "# one FULL kNN-descent round (capped_adjacency + two-hop join\n"
            "# + score_topk) over a checkpointed nbrs, small geometry\n"
        )
        f.write(buf.getvalue())
    text = buf.getvalue()
    print(
        f"round plan -> {out_path}: exchanges={text.count('Exchange')} "
        f"(reused={text.count('ReusedExchange')}) "
        f"windows={text.count('Window (')} arrow={text.count('ArrowEvalPython')}"
    )


def time_phases(spark, sf_dir: str, nruns: int) -> None:
    from ccm_spark.pipeline.ann_graph import knn_graph_descent

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    embs.count()
    for rounds in (0, 1, 2):
        ts = []
        for _ in range(nruns):
            spark.catalog.clearCache()
            la0 = os.getloadavg()[0]
            t0 = time.monotonic()
            n = knn_graph_descent(embs, k=10, n_rounds=rounds).count()
            ts.append(time.monotonic() - t0)
        print(
            f"n_rounds={rounds}: {[round(t, 2) for t in ts]} rows={n} "
            f"load_start={la0:.1f}"
        )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    nruns = int(os.environ.get("NRUNS", "3"))
    spark = get_spark("perf-knn-phases")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = os.environ.get("TAG", "before")
    if mode in ("plan", "both"):
        os.makedirs(os.path.join(here, "plans", "r16"), exist_ok=True)
        dump_round_plan(
            spark,
            os.path.join(here, "plans", "r16", f"knn_descent_full_round_{tag}.txt"),
        )
    if mode in ("time", "both"):
        time_phases(spark, sf_dir, nruns)


if __name__ == "__main__":
    main()
