"""Vectorised per-pair CCM fast path (SURVEY.md §7.1 step 6).

``ccm_apply_in_pandas`` shuffles the series once by ``pair_id`` and runs the
entire bootstrap sweep for each pair as vectorised numpy inside one task
(the :mod:`ccm_spark.oracle` kernel — the same code the unit tests trust).
Identical results to the pure-DataFrame plan (same seeded LCG sampling),
but the kNN inner loop becomes BLAS-backed matrix arithmetic instead of a
shuffle join, which wins by a wide margin when each series is small
(thousands of points) and pairs are many — the expected 100 TB regime is
millions of pairs scaling linearly across executors with ONE shuffle total.

The pure-DataFrame plan (plans/cross_map.py) remains the default: it is
the oracle-matching reference path and the right choice when a single
series is too large for one task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ccm_spark.config import CCMConfig
from ccm_spark import oracle

RESULT_SCHEMA = (
    "pair_id long, direction string, lib_size int, correlation double, "
    "slope double, convergent boolean"
)


def ccm_apply_in_pandas(series: DataFrame, config: CCMConfig) -> DataFrame:
    """(pair_id, t, x, y) -> (pair_id, direction, lib_size, correlation,
    slope, convergent), one task per pair."""
    emb_dim, tau = config.embedding_dim, config.tau
    num_samples, seed = config.num_samples, config.seed
    lib_sizes = config.lib_sizes

    def run_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        x = pdf["x"].to_numpy(dtype=np.float64)
        y = pdf["y"].to_numpy(dtype=np.float64)
        pair_id = int(pdf["pair_id"].iloc[0])
        cfg = CCMConfig(
            embedding_dim=emb_dim,
            tau=tau,
            num_samples=num_samples,
            lib_sizes=list(lib_sizes) if lib_sizes is not None else None,
            seed=seed,
        )
        rows = []
        for direction in ("x_causes_y", "y_causes_x"):
            res = oracle.cross_map(x, y, cfg, direction)
            for lib_size, corr in res["results"]:
                rows.append(
                    (
                        pair_id,
                        direction,
                        int(lib_size),
                        float(corr),
                        float(res["slope"]),
                        bool(res["convergent"]),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                "pair_id",
                "direction",
                "lib_size",
                "correlation",
                "slope",
                "convergent",
            ],
        )

    return series.groupBy("pair_id").applyInPandas(run_pair, schema=RESULT_SCHEMA)


def ccm_fast_iterated(series: DataFrame, config: CCMConfig) -> DataFrame:
    """mapInPandas variant for pre-partitioned input (series already
    clustered by pair_id within partitions — e.g. bucketed parquet): avoids
    even the groupBy shuffle."""

    emb_dim, tau = config.embedding_dim, config.tau
    num_samples, seed = config.num_samples, config.seed
    lib_sizes = config.lib_sizes

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: dict[int, list[pd.DataFrame]] = {}
        for pdf in batches:
            for pid, grp in pdf.groupby("pair_id"):
                buf.setdefault(int(pid), []).append(grp)
        cfg = CCMConfig(
            embedding_dim=emb_dim,
            tau=tau,
            num_samples=num_samples,
            lib_sizes=list(lib_sizes) if lib_sizes is not None else None,
            seed=seed,
        )
        for pid, parts in buf.items():
            pdf = pd.concat(parts).sort_values("t")
            x = pdf["x"].to_numpy(dtype=np.float64)
            y = pdf["y"].to_numpy(dtype=np.float64)
            rows = []
            for direction in ("x_causes_y", "y_causes_x"):
                res = oracle.cross_map(x, y, cfg, direction)
                for lib_size, corr in res["results"]:
                    rows.append(
                        (pid, direction, int(lib_size), float(corr),
                         float(res["slope"]), bool(res["convergent"]))
                    )
            yield pd.DataFrame(
                rows,
                columns=["pair_id", "direction", "lib_size", "correlation", "slope", "convergent"],
            )

    return series.mapInPandas(run_partition, schema=RESULT_SCHEMA)
