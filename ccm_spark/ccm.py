"""API shim mirroring the reference's public surface.

Reference: ``CCM.new/3`` (lib/ccm.ex:20-42), ``CCM.cross_map/2``
(lib/ccm.ex:48-74), ``CCM.bidirectional_ccm/1`` (lib/ccm.ex:79-84). A user
of the reference passes two equal-length series and gets back nested maps;
this class accepts python sequences (or an existing (pair_id, t, x, y)
DataFrame for the many-series regime) and runs the single Catalyst plan of
:mod:`ccm_spark.plans.cross_map`, collecting only the tiny result relation.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ccm_spark.config import CCMConfig
from ccm_spark.operators.embedding import DIRECTION_NAMES
from ccm_spark.plans.cross_map import ccm_plan, release_cached


class CCM:
    """``CCM(spark, x, y, embedding_dim=3, tau=1, lib_sizes=None,
    num_samples=100, seed=42)`` — the reference's ``%CCM{}`` struct plus the
    session handle and the rebuild's determinism seed."""

    def __init__(
        self,
        spark: SparkSession,
        x_series: Sequence[float],
        y_series: Sequence[float],
        embedding_dim: int = 3,
        tau: int = 1,
        lib_sizes: Sequence[int] | None = None,
        num_samples: int = 100,
        seed: int = 42,
        exclusion_radius: int = 0,
    ):
        self.config = CCMConfig(
            embedding_dim=embedding_dim,
            tau=tau,
            num_samples=num_samples,
            lib_sizes=list(lib_sizes) if lib_sizes is not None else None,
            seed=seed,
            exclusion_radius=exclusion_radius,
        )
        # V1: equal-length validation (lib/ccm.ex:22-24)
        self.config.validate_series(len(x_series), len(y_series))
        self.spark = spark
        rows = [
            (0, t, float(xv), float(yv))
            for t, (xv, yv) in enumerate(zip(x_series, y_series))
        ]
        self.series = spark.createDataFrame(
            rows, "pair_id long, t long, x double, y double"
        )
        self.n_points = len(x_series)
        self._xy = ([float(v) for v in x_series], [float(v) for v in y_series])

    @classmethod
    def from_dataframe(cls, series: DataFrame, **kwargs) -> "CCM":
        """Many-series mode: a (pair_id, t, x, y) DataFrame, one CCM per pair."""
        obj = cls.__new__(cls)
        obj.config = CCMConfig(**kwargs)
        obj.spark = series.sparkSession
        obj.series = series
        obj.n_points = None
        obj._xy = None
        return obj

    def result_df(self) -> DataFrame:
        """The full lazy result relation
        (pair_id, direction, lib_size, correlation, slope, convergent)."""
        return ccm_plan(self.series, self.config)

    def cross_map(self, direction: str = "x_causes_y") -> dict:
        """Reference-shaped result map for one direction (lib/ccm.ex:69-73).

        An unknown direction raises (the reference's behavior) instead of
        silently matching nothing.
        """
        valid = tuple(DIRECTION_NAMES.values())
        if direction not in valid:
            raise ValueError(
                f"direction must be one of {valid}, got {direction!r}"
            )
        result = self.result_df()
        rows = (
            result.where(F.col("direction") == F.lit(direction))
            .orderBy("lib_size")
            .collect()
        )
        release_cached(result)
        return {
            "direction": direction,
            "results": [(r.lib_size, r.correlation) for r in rows],
            "convergent": bool(rows[0].convergent) if rows else False,
        }

    def bidirectional_ccm(self) -> dict:
        """Reference-shaped nested map (lib/ccm.ex:79-84), from ONE plan run."""
        result = self.result_df()
        rows = result.orderBy("direction", "lib_size").collect()
        release_cached(result)
        out: dict = {}
        for direction in ("x_causes_y", "y_causes_x"):
            sub = [r for r in rows if r.direction == direction]
            out[direction] = {
                "direction": direction,
                "results": [(r.lib_size, r.correlation) for r in sub],
                "convergent": bool(sub[0].convergent) if sub else False,
            }
        return out

    def significance(
        self,
        direction: str = "x_causes_y",
        n_surrogates: int = 19,
        surrogate_seed: int = 97,
        alpha: float = 0.05,
    ) -> dict:
        """Surrogate-data significance of the cross-map skill (an
        extension beyond the reference, which reports skill with no null
        model): circular-shift surrogates of the putative cause, one-sided
        rank p-value. See :mod:`ccm_spark.significance`.

        Single-pair mode returns the reference-shaped dict; a
        ``from_dataframe`` instance dispatches to the FLEET
        implementation and returns the lazy per-pair verdict RELATION
        (`ccm_significance_fleet` — one row per pair_id, offsets keyed
        per pair), because a million-pair corpus has no single dict."""
        if self._xy is None:
            from ccm_spark.significance import ccm_significance_fleet

            return ccm_significance_fleet(
                self.series,
                self.config,
                direction=direction,
                n_surrogates=n_surrogates,
                surrogate_seed=surrogate_seed,
                alpha=alpha,
            )
        from ccm_spark.significance import ccm_significance

        return ccm_significance(
            self.spark,
            self._xy[0],
            self._xy[1],
            config=self.config,
            direction=direction,
            n_surrogates=n_surrogates,
            surrogate_seed=surrogate_seed,
            alpha=alpha,
        )

    def lag_scan(self, direction: str = "x_causes_y", max_lag: int = 8) -> dict:
        """Time-lagged CCM (extension; see
        :func:`ccm_spark.significance.ccm_lag_scan`): skill vs prediction
        lag — a negative-lag peak corroborates true causality, a
        positive-lag peak flags generalized-synchrony false positives.

        Single-pair mode returns the scan dict; a ``from_dataframe``
        instance dispatches to ``ccm_lag_scan_fleet`` and returns the
        lazy per-pair verdict relation."""
        if self._xy is None:
            from ccm_spark.significance import ccm_lag_scan_fleet

            return ccm_lag_scan_fleet(
                self.series, self.config, direction=direction, max_lag=max_lag
            )
        from ccm_spark.significance import ccm_lag_scan

        return ccm_lag_scan(
            self.spark,
            self._xy[0],
            self._xy[1],
            config=self.config,
            direction=direction,
            max_lag=max_lag,
        )

    def suggest_embedding(
        self, e_values=None, tau_values=None, num_samples: int = 20
    ) -> dict:
        """Scan (E, tau) by simplex self-prediction for BOTH series
        (:func:`ccm_spark.significance.embedding_scan`) and recommend the
        conservative choice for a CCM run: the larger of the two best Es
        (under-embedding loses causal signal; mild over-embedding only
        costs a little noise).

        A ``from_dataframe`` instance dispatches to
        ``embedding_scan_fleet`` over the pair relation MELTED into one
        series per (pair, side) and returns the lazy verdict relation
        with ``pair_id``/``side`` columns — per-pair recommendations are
        then one max() away."""
        if self._xy is None:
            from ccm_spark.significance import embedding_scan_fleet

            melted = self.series.selectExpr(
                "pair_id * 2 AS series_id", "t", "x AS value"
            ).unionByName(
                self.series.selectExpr(
                    "pair_id * 2 + 1 AS series_id", "t", "y AS value"
                )
            )
            return (
                embedding_scan_fleet(
                    melted, e_values, tau_values,
                    num_samples=num_samples, seed=self.config.seed,
                )
                .selectExpr(
                    "series_id DIV 2 AS pair_id",
                    "CASE WHEN series_id % 2 = 0 THEN 'x' ELSE 'y' END AS side",
                    "best_e", "best_tau", "lib_size", "best_skill",
                )
            )
        from ccm_spark.significance import embedding_scan

        sx = embedding_scan(
            self.spark, self._xy[0], e_values, tau_values,
            num_samples=num_samples, seed=self.config.seed,
        )
        sy = embedding_scan(
            self.spark, self._xy[1], e_values, tau_values,
            num_samples=num_samples, seed=self.config.seed,
        )
        return {
            "x_scan": sx,
            "y_scan": sy,
            "recommended_e": max(sx["best_e"], sy["best_e"]),
            "recommended_tau": max(sx["best_tau"], sy["best_tau"]),
        }
