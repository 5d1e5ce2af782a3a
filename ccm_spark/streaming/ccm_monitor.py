"""Streaming CCM — continuous causal monitoring over live series.

Extension surface (the reference is batch-only in-memory lists,
SURVEY.md §2.1): a fleet of sensor pairs streams (pair_id, t, x, y)
points; each micro-batch folds the new points into per-pair state and
re-emits that pair's CURRENT causal verdict — the alerting shape
("did x start driving y?") that batch re-runs can only approximate with
scheduled jobs.

State per pair is the (t, x, y) buffer itself, capped at ``max_points``
(a sliding causal window — memory is bounded by pairs x window, not
stream length); the verdict is the untouched
:func:`ccm_spark.oracle.bidirectional_ccm` kernel on the buffered
series, evaluated at the resolved ladder's maximum. After the stream
drains, each pair's final emission is IDENTICAL to the batch fast path
on the same points (test-pinned) — streaming adds arrival-order
robustness (points sort into t order inside the state), not new
arithmetic. The shuffle keys on pair_id, fleet-style.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ccm_spark.config import CCMConfig

OUTPUT_SCHEMA = (
    "pair_id bigint, n_points bigint, direction string, lib_size int, "
    "correlation double, slope double, convergent boolean"
)
STATE_SCHEMA = "ts array<bigint>, xs array<double>, ys array<double>"


def streaming_ccm(
    series_stream: DataFrame,
    config: CCMConfig | None = None,
    min_points: int = 60,
    max_points: int = 2000,
) -> DataFrame:
    """(pair_id, t, x, y) stream -> per-trigger causal verdicts:
    (pair_id, n_points, direction, lib_size, correlation, slope,
    convergent), one row per direction at the resolved ladder's MAXIMUM
    library size for the pair's current buffer. Pairs below
    ``min_points`` stay silent (a verdict on a stub series is noise);
    buffers cap at ``max_points`` keeping the NEWEST points (sliding
    window). Update output mode; the ladder re-resolves as the buffer
    grows, exactly as a batch run on the same points would."""
    cfg = config if config is not None else CCMConfig()
    emb_dim, tau, num_samples, seed, radius = (
        cfg.embedding_dim, cfg.tau, cfg.num_samples, cfg.seed,
        cfg.exclusion_radius,
    )
    lib_sizes = list(cfg.lib_sizes) if cfg.lib_sizes is not None else None

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from ccm_spark import oracle
        from ccm_spark.config import CCMConfig as _Cfg

        ts, xs, ys = state.get if state.exists else ([], [], [])
        ts, xs, ys = list(ts), list(xs), list(ys)
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf["t"])
            xs.extend(float(v) for v in pdf["x"])
            ys.extend(float(v) for v in pdf["y"])
        order = np.argsort(np.asarray(ts, dtype=np.int64), kind="stable")
        ts = [ts[i] for i in order][-max_points:]
        xs = [xs[i] for i in order][-max_points:]
        ys = [ys[i] for i in order][-max_points:]
        state.update((ts, xs, ys))
        n = len(ts)
        if n < min_points:
            return
        kcfg = _Cfg(
            embedding_dim=emb_dim, tau=tau, num_samples=num_samples,
            lib_sizes=list(lib_sizes) if lib_sizes is not None else None,
            seed=seed, exclusion_radius=radius,
        )
        res = oracle.bidirectional_ccm(
            np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64), kcfg
        )
        rows = []
        for direction in ("x_causes_y", "y_causes_x"):
            r = res[direction]
            lib, corr = r["results"][-1]
            rows.append(
                (
                    int(key[0]), n, direction, int(lib), float(corr),
                    float(r["slope"]), bool(r["convergent"]),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "pair_id", "n_points", "direction", "lib_size",
                "correlation", "slope", "convergent",
            ],
        )

    return (
        series_stream.groupBy("pair_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
