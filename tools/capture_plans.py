"""Dump .explain("formatted") for declared queries into plans/<ROUND>/.

Usage::

    python tools/capture_plans.py before [sf_dir] [query ...]
    python tools/capture_plans.py after  [sf_dir] [query ...]

Defaults to sf0.1 (the bench scale) and all ``queries()`` entries plus the
bench-local headline queries (ccm_knn / ccm_bidirectional_fast /
ccm_fleet_64x300). Writes ``plans/<ROUND>/<name>_<tag>.txt``; explain()
only plans, it does not execute, so this is cheap and side-effect free
for purely-lazy queries (iterative operators that checkpoint per round
do run their loop jobs at construction time).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from ccm_spark import entry as E  # noqa: E402
from ccm_spark.session import get_spark  # noqa: E402


def bench_local_queries():
    """The bench headline queries that are not in the gated registry."""
    from ccm_spark.config import CCMConfig
    from ccm_spark.fastpath import ccm_apply_in_pandas
    from ccm_spark.generators import generate_grid_df

    def fleet_query(spark, sf_dir):
        grid = [
            {"pair_id": i, "kind": "g2", "length": 300, "coupling": 0.1 * (i % 5)}
            for i in range(64)
        ]
        return ccm_apply_in_pandas(
            generate_grid_df(spark, grid), CCMConfig(num_samples=20, seed=7)
        )

    def bidir_fast_query(spark, sf_dir):
        return ccm_apply_in_pandas(E._series(spark, sf_dir), E._config())

    def knn_query(spark, sf_dir, lib_size=80, sample_id=0):
        import pyspark.sql.functions as F
        from pyspark.storagelevel import StorageLevel

        from ccm_spark.operators.embedding import embed_bidirectional
        from ccm_spark.operators.knn import knn_candidates, top_k_neighbors
        from ccm_spark.operators.sampling import fan_out_with_rank
        from ccm_spark.plans.oracle_sql import PARAMS

        series = E._series(spark, sf_dir)
        emb = embed_bidirectional(series, PARAMS.embedding_dim, PARAMS.tau)
        explicit = spark.createDataFrame(
            [(int(ls),) for ls in PARAMS.lib_sizes], "lib_size int"
        )
        ladder = series.select("pair_id").distinct().crossJoin(explicit)
        # r16: persisted exactly as bench.py's knn_query / the gated
        # sample_corr_plan (the fan-out feeds both kNN join sides)
        fanned = fan_out_with_rank(
            emb, ladder, PARAMS.num_samples, PARAMS.seed
        ).persist(StorageLevel.MEMORY_AND_DISK)
        nn = top_k_neighbors(
            knn_candidates(fanned, PARAMS.embedding_dim), PARAMS.embedding_dim
        )
        return nn.where(
            (F.col("lib_size") == lib_size) & (F.col("sample_id") == sample_id)
        )

    return {
        "ccm_bidirectional_fast": bidir_fast_query,
        "ccm_knn": knn_query,
        "ccm_fleet_64x300": fleet_query,
    }


ROUND = "r16"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    args = sys.argv[2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", ROUND
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("ccm_spark-plans")
    qs = dict(entry_mod.queries())
    qs.update(bench_local_queries())
    # validate up front (ADVICE r15 #4): a mistyped name or a mistyped
    # sf_dir (silently parsed as a query name) otherwise dies on a bare
    # KeyError mid-run with no hint of what was available
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(
            f"unknown queries: {unknown}\navailable: {sorted(qs)}\n"
            "(is the first positional arg a valid sf_dir?)"
        )
    targets = names or list(qs)
    for name in targets:
        fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - record the failure in-file
            text = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({tag})\n{text}")
        n_exch = text.count("Exchange")
        n_py = (
            text.count("BatchEvalPython")
            + text.count("ArrowEvalPython")
            + text.count("MapInPandas")
            + text.count("FlatMapGroupsInPandas")
        )
        print(f"{name}: exchanges={n_exch} python_nodes={n_py} -> {path}")


if __name__ == "__main__":
    main()
