"""Causal-network discovery: CCM over many (driver, response) pairs of a
series CORPUS — the application the method was built for (Sugihara et
al. 2012 ran it over ecosystem variable pairs; a modern fleet runs it
over thousands of sensors / metrics / populations).

The reference computes one pair per call (`lib/ccm.ex:79-84`); this
module is the corpus-level composition: take a long-form
``(series_id, t, value)`` relation and a pair list (or all pairs, with
an explicit guard — N series mean N*(N-1)/2 unordered pairs, a size the
caller must own), materialise each pair's aligned ``(pair_id, t, x, y)``
series, and push the whole set through the existing one-shuffle
``fastpath.ccm_apply_in_pandas`` sweep. Every per-pair number is
therefore bit-identical to running the reference-parity kernel on that
pair alone — the network layer adds plumbing, never arithmetic.

Scale shape: building pair series joins the corpus TWICE against the
broadcast pair table — each series row is replicated once per pair
membership (amplification = that series' pair degree; for all-pairs,
N-1). That replication is inherent to per-pair task isolation and is
the knob the pair list controls: screen first (``significance.py``
fleet scans), then run the network on the survivors. The sweep itself
stays one shuffle on pair_id, fleet-style.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.config import CCMConfig

MAX_ALL_PAIRS_SERIES = 200  # all-pairs guard: 200 series = 19,900 pairs


def pair_table(
    series: DataFrame,
    pairs: list[tuple[int, int]] | None = None,
    max_series: int = MAX_ALL_PAIRS_SERIES,
) -> DataFrame:
    """(pair_id, a_id, b_id): the pair relation the network runs over.
    Explicit ``pairs`` are used verbatim (pair_id = list position);
    ``pairs=None`` enumerates all unordered pairs a_id < b_id of the
    distinct series ids — guarded by ``max_series`` because all-pairs
    is quadratic and the caller must opt into that cost. The bidirectional
    sweep covers both directions of each unordered pair, so ordered
    duplicates are rejected."""
    spark = series.sparkSession
    if pairs is not None:
        seen = set()
        for a, b in pairs:
            if a == b:
                raise ValueError(f"pair_table: self-pair ({a}, {b})")
            if (min(a, b), max(a, b)) in seen:
                raise ValueError(
                    f"pair_table: duplicate unordered pair ({a}, {b}) — the "
                    "bidirectional sweep already covers both directions"
                )
            seen.add((min(a, b), max(a, b)))
        return spark.createDataFrame(
            [(i, int(a), int(b)) for i, (a, b) in enumerate(pairs)],
            "pair_id long, a_id long, b_id long",
        )
    distinct_ids = series.select("series_id").distinct()
    # count BEFORE collecting: a million-series corpus must fail the
    # guard without ever shipping its id set to the driver
    n_ids = distinct_ids.count()
    if n_ids > max_series:
        raise ValueError(
            f"pair_table: {n_ids} series -> "
            f"{n_ids * (n_ids - 1) // 2} all-pairs combinations exceeds "
            f"max_series={max_series}; pass an explicit pair list (screen "
            "with the significance fleet scans first) or raise the guard"
        )
    ids = sorted(r.series_id for r in distinct_ids.collect())
    all_pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(all_pairs)],
        "pair_id long, a_id long, b_id long",
    )


def pair_series(series: DataFrame, pairs: DataFrame) -> DataFrame:
    """Materialise (pair_id, t, x, y) from a long-form corpus and a pair
    relation: x = the a_id series, y = the b_id series, aligned on t by
    INNER join (a pair only spans the time range both members cover).
    The pair table broadcasts; the corpus is read twice and shuffled
    once per side on the join key — the unavoidable replication
    documented in the module docstring."""
    xs = (
        series.join(
            F.broadcast(pairs.select("pair_id", F.col("a_id").alias("series_id"))),
            "series_id",
        )
        .select("pair_id", "t", F.col("value").alias("x"))
    )
    ys = (
        series.join(
            F.broadcast(pairs.select("pair_id", F.col("b_id").alias("series_id"))),
            "series_id",
        )
        .select("pair_id", "t", F.col("value").alias("y"))
    )
    return xs.join(ys, ["pair_id", "t"])


def ccm_network(
    series: DataFrame,
    pairs: list[tuple[int, int]] | None = None,
    config: CCMConfig | None = None,
    max_series: int = MAX_ALL_PAIRS_SERIES,
) -> DataFrame:
    """Bidirectional CCM for every pair of a series corpus:
    (a_id, b_id, direction, lib_size, correlation, slope, convergent) —
    ``direction`` is ``x_causes_y`` for a→b and ``y_causes_x`` for b→a,
    exactly the reference's dispatch with x = the a series. The edge list
    of the causal graph falls out as the ``convergent`` rows at the
    ladder maximum.

    Every number is bit-identical to ``oracle.bidirectional_ccm`` on the
    pair's aligned values (test-pinned): this function only builds the
    pair relation (:func:`pair_table`), materialises aligned pair series
    (:func:`pair_series`), and runs the one-shuffle fleet sweep
    (``fastpath.ccm_apply_in_pandas``)."""
    from ccm_spark.fastpath import ccm_apply_in_pandas

    cfg = config if config is not None else CCMConfig()
    ptab = pair_table(series, pairs, max_series)
    res = ccm_apply_in_pandas(pair_series(series, ptab), cfg)
    return (
        res.join(F.broadcast(ptab), "pair_id")
        .select(
            "a_id",
            "b_id",
            "direction",
            "lib_size",
            "correlation",
            "slope",
            "convergent",
        )
    )
