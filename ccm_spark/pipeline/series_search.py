"""Data-series similarity search — z-normalised Euclidean top-k over a
SERIES corpus with PAA lower-bound pruning (the Agrawal/Keogh family the
distributed-series-search literature builds on: "Time Series Similarity
Search for Streaming Data in Distributed Systems", EDBT 2019; "Odyssey",
VLDB 2023 — see PAPERS.md).

The embedding ANN family (:mod:`pipeline.similarity`) searches VECTORS;
this searches raw equal-length series by shape (z-normalisation removes
offset/scale, the standard whole-matching semantics). The prune is the
classic two-phase EXACT algorithm:

  1. every series reduces once to a PAA sketch (segment means of the
     z-normalised values) — per-series Arrow work, one shuffle, sketch
     persists for any number of queries;
  2. a query's LOWER BOUND to every series is the weighted sketch
     distance ``sqrt(sum_j len_j * (q_j - s_j)^2)`` — by the PAA
     lower-bounding lemma this never exceeds the true z-normalised ED,
     so: take the k best sketches, pay exact distance for just those,
     set the threshold to the k-th exact, and pay exact distance ONLY
     for series whose lower bound beats it. The result is EXACTLY the
     brute-force top-k (test-pinned), with the exact-distance work
     bounded by how tight the sketches are instead of corpus size.

Scale shape: sketches are a fleet applyInPandas (one shuffle on
series_id); lower bounds are one narrow pass over the sketch relation
(segments ~ 16 doubles per series — the 100 TB corpus reduces to a GB-
scale sketch table); the two exact phases join only CANDIDATE series'
points, with the query broadcast. Driver traffic: k exact distances,
one threshold scalar, and the candidate id list (bounded by sketch
tightness).

NOTE: no ``from __future__ import annotations`` here — the module
defines a ``pandas_udf`` whose signature inspection breaks under
postponed annotations (the vector_udfs rule).
"""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ccm_spark.functions.partitioning import spread

PAA_SEGMENTS = 16


def _znorm(v: np.ndarray) -> np.ndarray:
    mu = v.mean()
    sd = v.std()
    return (v - mu) / sd if sd > 0 else np.zeros_like(v)


def _paa(v: np.ndarray, segments: int) -> np.ndarray:
    n = len(v)
    bounds = [(i * n) // segments for i in range(segments + 1)]
    return np.array(
        [v[bounds[j]: bounds[j + 1]].mean() for j in range(segments)]
    )


def _seg_lens(n: int, segments: int) -> np.ndarray:
    bounds = [(i * n) // segments for i in range(segments + 1)]
    return np.array([bounds[j + 1] - bounds[j] for j in range(segments)], dtype=np.float64)


def paa_sketches(series: DataFrame, segments: int = PAA_SEGMENTS) -> DataFrame:
    """(series_id, n, sketch): each series' PAA sketch of its z-normalised
    values — build once, persist, serve many queries. One shuffle on
    series_id; per-series cost is one pass over its points."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        v = _znorm(pdf["value"].to_numpy(dtype=np.float64))
        return pd.DataFrame(
            {
                "series_id": [int(pdf["series_id"].iloc[0])],
                "n": [len(v)],
                "sketch": [[float(x) for x in _paa(v, segments)]],
            }
        )

    return (
        spread(series, "series_id")
        .groupBy("series_id")
        .applyInPandas(run, "series_id long, n long, sketch array<double>")
    )


def series_topk(
    series: DataFrame,
    query: "np.ndarray | list[float]",
    k: int = 10,
    segments: int = PAA_SEGMENTS,
    sketches: DataFrame | None = None,
) -> DataFrame:
    """EXACT z-normalised-ED top-k of a query series against the corpus:
    (rank, series_id, distance), PAA-pruned as described in the module
    docstring. All series (and the query) must share one length — whole
    matching; window/split longer series upstream. Pass a prebuilt
    ``sketches`` relation to amortise the sketch pass across queries.
    Ties rank by series_id asc; distances round at 9."""
    q = np.asarray(query, dtype=np.float64)
    n = len(q)
    if n < segments:
        raise ValueError(
            f"series_topk: query length {n} < segments {segments}"
        )
    zq = _znorm(q)
    q_paa = _paa(zq, segments)
    lens = _seg_lens(n, segments)
    spark = series.sparkSession

    sk = sketches if sketches is not None else paa_sketches(series, segments)
    bad = sk.where(F.col("n") != n).limit(1).collect()
    if bad:
        raise ValueError(
            f"series_topk: series {bad[0].series_id} has length "
            f"{bad[0].n} != query length {n} (whole matching needs one length)"
        )
    qp = spark.sparkContext.broadcast((q_paa, lens, zq))

    @F.pandas_udf("double")
    def lb_udf(sketch: pd.Series) -> pd.Series:
        q_paa_, lens_, _ = qp.value
        out = [
            float(np.sqrt((lens_ * (q_paa_ - np.asarray(s)) ** 2).sum()))
            for s in sketch
        ]
        return pd.Series(out)

    lbs = sk.select("series_id", lb_udf(F.col("sketch")).alias("lb"))

    def exact_for(ids: list[int]) -> dict[int, float]:
        sub = series.join(
            F.broadcast(
                spark.createDataFrame([(int(i),) for i in ids], "series_id long")
            ),
            "series_id",
        )

        def dist(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("t")
            _, _, zq_ = qp.value
            zv = _znorm(pdf["value"].to_numpy(dtype=np.float64))
            return pd.DataFrame(
                {
                    "series_id": [int(pdf["series_id"].iloc[0])],
                    "distance": [float(np.sqrt(((zq_ - zv) ** 2).sum()))],
                }
            )

        return {
            r.series_id: r.distance
            for r in spread(sub, "series_id")
            .groupBy("series_id")
            .applyInPandas(dist, "series_id long, distance double")
            .collect()
        }

    # phase 1: exact distances for the k best lower bounds -> threshold
    seed_ids = [
        r.series_id
        for r in lbs.orderBy(F.col("lb").asc(), F.col("series_id").asc())
        .limit(k)
        .collect()
    ]
    seed_exact = exact_for(seed_ids)
    threshold = sorted(seed_exact.values())[min(k, len(seed_exact)) - 1]
    # phase 2: exact only where the lower bound can still beat the k-th
    cand_ids = [
        r.series_id
        for r in lbs.where(F.col("lb") <= F.lit(float(threshold))).collect()
        if r.series_id not in seed_exact
    ]
    exact = dict(seed_exact)
    if cand_ids:
        exact.update(exact_for(cand_ids))
    top = sorted(exact.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    return spark.createDataFrame(
        [(i + 1, int(sid), round(float(d), 9)) for i, (sid, d) in enumerate(top)],
        "rank int, series_id long, distance double",
    )


def _dtw_band(a: np.ndarray, b: np.ndarray, w: int) -> float:
    """Exact DTW distance (sqrt of summed squared steps) under a
    Sakoe-Chiba band of half-width ``w`` — the O(n*w) DP."""
    n = len(a)
    inf = np.inf
    prev = np.full(n + 1, inf)
    prev[0] = 0.0
    cur = np.empty(n + 1)
    for i in range(1, n + 1):
        cur[:] = inf
        lo, hi = max(1, i - w), min(n, i + w)
        for j in range(lo, hi + 1):
            cost = (a[i - 1] - b[j - 1]) ** 2
            cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
        prev, cur = cur, prev
    return float(np.sqrt(prev[n]))


def _keogh_envelope(q: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    n = len(q)
    u = np.array([q[max(0, i - w): i + w + 1].max() for i in range(n)])
    lo = np.array([q[max(0, i - w): i + w + 1].min() for i in range(n)])
    return u, lo


def dtw_topk(
    series: DataFrame,
    query: "np.ndarray | list[float]",
    k: int = 10,
    band_frac: float = 0.1,
) -> DataFrame:
    """EXACT DTW top-k of a query series against the corpus under a
    Sakoe-Chiba band (half-width ``band_frac * n``), z-normalised —
    the UCR-suite search shape: LB_Keogh (the query-envelope lower
    bound, one O(n) pass per series) prunes, exact O(n*band) DP runs
    only where the bound can still win, via the same two-phase
    threshold scheme as :func:`series_topk`. ``band_frac=0`` collapses
    DTW to plain ED. Emits (rank, series_id, distance); ties by
    series_id; result pinned equal to brute-force DTW."""
    q = np.asarray(query, dtype=np.float64)
    n = len(q)
    if n < 4:
        raise ValueError("dtw_topk: query too short")
    w = max(0, int(round(band_frac * n)))
    zq = _znorm(q)
    u, lo = _keogh_envelope(zq, w)
    spark = series.sparkSession
    bc = spark.sparkContext.broadcast((zq, u, lo, w, n))

    def per_series(compute_exact: bool):
        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            zq_, u_, lo_, w_, n_ = bc.value
            pdf = pdf.sort_values("t")
            v = pdf["value"].to_numpy(dtype=np.float64)
            if len(v) != n_:
                raise ValueError(
                    f"dtw_topk: series {int(pdf['series_id'].iloc[0])} has "
                    f"length {len(v)} != query length {n_}"
                )
            zv = _znorm(v)
            if compute_exact:
                d = _dtw_band(zq_, zv, w_)
            else:
                over = np.where(zv > u_, zv - u_, 0.0)
                under = np.where(zv < lo_, lo_ - zv, 0.0)
                d = float(np.sqrt(((over + under) ** 2).sum()))
            return pd.DataFrame(
                {"series_id": [int(pdf["series_id"].iloc[0])], "d": [d]}
            )

        return run

    lbs = (
        spread(series, "series_id")
        .groupBy("series_id")
        .applyInPandas(per_series(False), "series_id long, d double")
    )

    def exact_for(ids: list[int]) -> dict[int, float]:
        sub = series.join(
            F.broadcast(
                spark.createDataFrame([(int(i),) for i in ids], "series_id long")
            ),
            "series_id",
        )
        return {
            r.series_id: r.d
            for r in spread(sub, "series_id")
            .groupBy("series_id")
            .applyInPandas(per_series(True), "series_id long, d double")
            .collect()
        }

    seed_ids = [
        r.series_id
        for r in lbs.orderBy(F.col("d").asc(), F.col("series_id").asc())
        .limit(k)
        .collect()
    ]
    seed_exact = exact_for(seed_ids)
    threshold = sorted(seed_exact.values())[min(k, len(seed_exact)) - 1]
    cand_ids = [
        r.series_id
        for r in lbs.where(F.col("d") <= F.lit(float(threshold))).collect()
        if r.series_id not in seed_exact
    ]
    exact = dict(seed_exact)
    if cand_ids:
        exact.update(exact_for(cand_ids))
    top = sorted(exact.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    return spark.createDataFrame(
        [(i + 1, int(sid), round(float(d), 9)) for i, (sid, d) in enumerate(top)],
        "rank int, series_id long, distance double",
    )


# classic SAX breakpoint tables: N(0,1) quantiles splitting the line into
# `a` equiprobable regions (Lin et al. 2003) — published constants, so any
# engine (or a SQL replay) reproduces the words exactly
SAX_BREAKPOINTS = {
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
    7: [-1.07, -0.57, -0.18, 0.18, 0.57, 1.07],
    8: [-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15],
}


def sax_words(
    sketches: DataFrame, alphabet: int = 8
) -> DataFrame:
    """(series_id, n, word): each series' SAX word — its PAA sketch
    discretised by the fixed N(0,1) breakpoints (valid because sketches
    are built over z-normalised values). A pure codegen projection of
    the sketch relation (nested CASE per segment, no UDF)."""
    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(
            f"sax_words: alphabet must be one of {sorted(SAX_BREAKPOINTS)}"
        )
    bps = SAX_BREAKPOINTS[alphabet]

    def symbol(x):
        expr = F.lit(chr(ord("a") + len(bps)))
        for i in range(len(bps) - 1, -1, -1):
            expr = F.when(x < F.lit(bps[i]), F.lit(chr(ord("a") + i))).otherwise(expr)
        return expr

    return sketches.select(
        "series_id",
        "n",
        F.array_join(F.transform(F.col("sketch"), symbol), "").alias("word"),
    )


def series_neardup(
    series: DataFrame,
    max_dist: float,
    segments: int = PAA_SEGMENTS,
    alphabet: int = 8,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Series-level near-duplicate pairs — the "two sensors reporting the
    same signal" / "stuck channel" detector, the series twin of document
    near-dup: (series_a, series_b, distance) for every pair with
    z-normalised ED <= ``max_dist``, candidates restricted to pairs
    sharing their full SAX WORD (the iSAX bucket trick: near-identical
    shapes discretise identically). Entirely JVM dataflow — per-series
    stats, a z-value projection, the word equi-join with a hot-bucket
    cap (constant/flatlined series all share one word — the same safety
    valve as every dedup family), and one aggregate per candidate pair.

    RECALL caveat, honestly: a single-resolution word misses a near-dup
    whose sketch straddles a breakpoint in any segment; lower
    ``alphabet``/``segments`` to coarsen buckets (more candidates, more
    recall), or run the exact :func:`series_topk` per suspect for a
    guarantee. Precision is exact — every emitted pair is verified."""
    from pyspark.sql import Window

    stats = series.groupBy("series_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sd"),
        F.count("*").alias("n"),
    )
    z = (
        series.join(stats, "series_id")
        .select(
            "series_id",
            "t",
            F.when(F.col("sd") > 0, (F.col("value") - F.col("mu")) / F.col("sd"))
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )
    words = sax_words(paa_sketches(series, segments), alphabet)
    w = Window.partitionBy("word")
    capped = (
        words.withColumn("bucket_n", F.count("*").over(w))
        .where(F.col("bucket_n") <= max_bucket_size)
    )
    a = capped.select(F.col("series_id").alias("series_a"), "word")
    b = capped.select(F.col("series_id").alias("series_b"), "word")
    cands = a.join(b, "word").where(F.col("series_a") < F.col("series_b"))
    za = z.select(F.col("series_id").alias("series_a"), "t", F.col("z").alias("za"))
    zb = z.select(F.col("series_id").alias("series_b"), "t", F.col("z").alias("zb"))
    return (
        cands.join(za, "series_a")
        .join(zb, ["series_b", "t"])
        .groupBy("series_a", "series_b")
        .agg(F.round(F.sqrt(F.sum((F.col("za") - F.col("zb")) ** 2)), 9).alias("distance"))
        .where(F.col("distance") <= max_dist)
    )
