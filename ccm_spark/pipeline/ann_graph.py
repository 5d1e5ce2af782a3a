"""Distributed k-NN GRAPH construction — NN-descent over the embedding
corpus (Dong, Moses & Li 2011, "Efficient K-Nearest Neighbor Graph
Construction for Generic Similarity Measures").

The query-style ANN paths (IVF / PQ / SRP in ``pipeline.similarity``)
answer "nearest to THESE queries"; this builds the ALL-corpus neighbor
graph — the artifact graph-based curation consumes (SemDeDup-style
cluster refinement, graph dedup components over ranked neighbors,
diversity sampling, label propagation) — without ever considering all
pairs. The reference has no similarity surface (SURVEY.md §2.1); this is
extension surface next to the other ANN families.

Algorithm, Spark-first:

1. **Seeded init from SRP-LSH buckets** (reusing
   ``similarity.srp_buckets``): initial neighbor candidates are bucket
   co-members, capped per vector — the same hyperplanes the engine's
   near-dup path trusts, so the seed graph is already locality-biased
   rather than uniform-random (better first-round recall, same
   determinism: planes are seeded LCG).
2. **Descent rounds**: each vector's CAPPED adjacency ``adj[v]`` —
   its own neighbors (out-degree ≤ k) plus a deterministic ρ·k-sample
   of its REVERSE neighbors (the paper's ρ-sampling; a hub can sit in
   thousands of other vectors' top-k, so the raw reverse set is
   unbounded) — proposes ``adj[v] × adj[v]`` candidate pairs ("two
   vectors sharing a neighbor are probably neighbors"), which are
   scored (one Arrow-batched cosine per candidate pair) and merged
   with the incumbents; each vector keeps its top-k by
   ``(round(cos, 9) desc, neighbor id asc)`` (the engine's
   deterministic near-tie rule).

Scale shape: per round every vector contributes at most
``(k·(1+ρ))²`` candidate pairs — the adjacency is capped BEFORE the
pair join, so the bound holds even on hub-skewed corpora (a star
graph's hub proposes (k+ρk)² pairs, not in-degree²) — so shuffle
volume is ``O(N·k²·(1+ρ)²)`` per round, never all-pairs; the pair
join is an equi-join on the shared adjacency owner, scoring is a
narrow Arrow pass over the candidate relation, and the per-round
top-k is one window over (src). The SRP seed self-join carries the
same ``max_bucket_size`` valve as every other blocking family
(``similarity.embedding_near_duplicates``): oversized buckets are
dropped BEFORE the |bucket|² join, so a duplicate-heavy corpus
cannot produce a mega-bucket explosion. Each round
``localCheckpoint``s (the kmeans/pagerank iteration discipline: an
uncut lazy loop re-executes every prior round per consumer).
Determinism: seeded planes + rounded scores + total tie order make the
final graph a pure function of (corpus, k, rounds, seed) on any
partitioning — test-pinned, along with measured recall vs the exact
graph and the no-cartesian plan shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.functions.partitioning import spread
from ccm_spark.pipeline.similarity import (
    adaptive_srp_planes,
    as_double_vec,
    cosine_pandas,
)


def capped_adjacency(
    edges: DataFrame, k: int, rho: float = 1.5
) -> DataFrame:
    """The descent rounds' bounded candidate basis: forward edges
    (out-degree ≤ k by construction) ∪ a deterministic ρ·k-sample of
    each node's REVERSE neighbors — NN-descent's ρ-sampling (Dong et
    al. 2011 §2.3). Out-degree alone does not bound the pair join: a
    hub vector can appear in thousands of other vectors' top-k, and an
    uncapped neighbors ∪ reverse-neighbors set then proposes
    in-degree² candidate pairs at that hub. Sampling is by
    ``md5_long('src:dst')`` rank (a deterministic hash-rank sample, not
    lowest-id — lowest-id would systematically favor early vectors;
    md5 rather than xxhash64 so the rank is ENGINE-PORTABLE and the
    whole graph replays in the DuckDB twin, the repo-wide hashing
    rule), ties broken by dst. Every node's adjacency is ≤ k + ⌈ρ·k⌉
    rows.
    """
    import math

    from ccm_spark.functions.hashing import md5_long

    rev_cap = max(1, math.ceil(rho * k))
    # r16: ONE subtree, one exchange. The r15 shape (fwd.union(rev) with
    # a row_number window over the rev branch) planned the adjacency as
    # a union whose branches are separate physical subtrees — and the
    # descent round consumes adj THREE times (union with the two-hop
    # pairs + both sides of the pair self-join), so the reverse-sample
    # window and its hash(src) exchange were planned (and the window
    # evaluated) three times per round (plans/r16/
    # knn_descent_full_round_before.txt: 7 exchanges, 0 reused). Now
    # both orientations come from one explode-mirror (the r15
    # _score_pairs rule) and ONE window pair ranks them: forward rows
    # sort first (fwd desc), so with nf = the owner's forward count,
    # `rn <= nf + rev_cap` keeps every forward row and exactly the
    # top-rev_cap reverse rows by the SAME (md5 'src:dst' rank, dst)
    # order as before — row-identical output. The spread() below makes
    # the window's exchange explicit-count (AQE-coalesce-exempt, the
    # _score_pairs precedent) so the pair join downstream keeps its
    # parallelism on byte-tiny adjacency relations.
    mirrored = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst"), F.lit(True).alias("fwd")),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.lit(False).alias("fwd"),
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst", "_e.fwd")
    w = Window.partitionBy("src").orderBy(
        F.col("fwd").desc(),
        md5_long(
            F.concat(
                F.col("src").cast("string"), F.lit(":"), F.col("dst").cast("string")
            )
        ).asc(),
        F.col("dst").asc(),
    )
    nf = F.sum(F.col("fwd").cast("int")).over(Window.partitionBy("src"))
    return (
        spread(mirrored, "src")
        .withColumn("_r", F.row_number().over(w))
        .withColumn("_nf", nf)
        .where(F.col("_r") <= F.col("_nf") + rev_cap)
        .select("src", "dst")
    )


def _score_pairs(
    vecs: DataFrame | None,
    cos,
    pairs: DataFrame,
    pair_cos=None,
    drop_unknown: bool = True,
) -> DataFrame:
    """(src, dst) candidates -> scored edges in BOTH directions.

    Scoring is CANONICALISED first (one row per unordered pair,
    mirrored after): cosine is symmetric and candidate sets are heavily
    bidirectional, so this halves the scoring work in either path.

    Two bit-interchangeable paths (pinned equal in tests):

    - ``pair_cos`` set (small-corpus fast path): the candidate relation
      stays two int64 ids wide end-to-end — rows are gathered
      executor-side from a broadcast corpus matrix
      (``cosine_pairs_udf``), so neither the shuffle nor the Arrow
      boundary ever carries a vector — hundreds of MB of array traffic
      replaced by a ~1 MB broadcast at the 2k-vector bench scale
      (measured ~20% wall-clock there, where local in-memory shuffles
      hide most of the byte cost; on a real cluster those bytes cross
      the network).
    - join path (the corpus-scale path, ``vecs`` + ``cos``): vectors
      attach via two equi-joins against the persisted (vec_id, v)
      relation — the only option when the corpus matrix cannot be
      broadcast.

    ``drop_unknown`` keeps the broadcast path behavior-identical to the
    join path when candidate ids may be ABSENT from the index (the
    UDF scores such pairs NaN; the join path silently drops them).
    That can only happen on the probe paths — ``knn_graph_insert``
    handed a served graph referencing vectors no longer in
    ``embeddings``. The DESCENT build passes ``drop_unknown=False``:
    its candidates are bucket co-members / adjacency products of the
    very relation the index was collected from, so the filter would be
    a per-round no-op scan over the (multi-million-row) scored relation
    (the r11->r12 bench bisect: measurable pure overhead)."""
    # r15: ONE exchange for dedup + compute spread. The r14 plan paid
    # two full exchanges of the candidate relation back-to-back — the
    # distinct's hash(a, b) exchange, then spread()'s hash(a) respread
    # so AQE could not coalesce the compute-heavy scoring stage to a
    # couple of tasks. An explicit-count repartition on (a, b) BEFORE
    # the aggregate satisfies the distinct's distribution requirement
    # (no second exchange is planned), is AQE-coalesce-exempt, and
    # spreads the scoring evenly — same rows, one exchange fewer per
    # descent round.
    cpairs = spread(
        pairs.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ),
        "a",
        "b",
        factor=2,
    ).dropDuplicates(["a", "b"])
    if pair_cos is not None:
        cscored = cpairs.select(
            "a",
            "b",
            (F.round(pair_cos(F.col("a"), F.col("b")), 9) + F.lit(0.0)).alias(
                "cos_sim"
            ),
        )
        if drop_unknown:
            # ids absent from the broadcast index score NaN; the join
            # path DROPS such pairs (no vector row to equi-join), so
            # filter them out to keep the two paths behavior-identical.
            # Corpus embeddings never score NaN themselves (zero norms
            # -> 0.0). Arrow maps the pandas-UDF NaN to NULL (and
            # Spark's isnan(NULL) is false, not NULL), so check both.
            cscored = cscored.where(
                F.col("cos_sim").isNotNull() & ~F.isnan(F.col("cos_sim"))
            )
    else:
        joined = cpairs.join(
            vecs.select(F.col("vec_id").alias("a"), F.col("v").alias("av")), "a"
        ).join(vecs.select(F.col("vec_id").alias("b"), F.col("v").alias("bv")), "b")
        joined = spread(joined, "a", factor=2)
        cscored = joined.select(
            "a",
            "b",
            (F.round(cos(F.col("av"), F.col("bv")), 9) + F.lit(0.0)).alias(
                "cos_sim"
            ),
        )
    # r15: mirror via ONE explode, not a self-union. Union's two
    # branches are separate physical subtrees — only the exchange below
    # them is reusable, so the dedup aggregate AND the Arrow scoring
    # pass executed twice per round (defeating the point of
    # canonicalising). Generate doubles the rows inline above a single
    # scored subtree: same rows, scoring runs once.
    return cscored.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("_e"),
        "cos_sim",
    ).select("_e.src", "_e.dst", "cos_sim")


#: corpora at or below this many vectors score candidate pairs against a
#: BROADCAST matrix (ids-only candidate relation) instead of equi-joining
#: vectors onto every pair; 100k x 64-dim float64 is ~51 MB resident per
#: executor — set 0 to force the join path (the corpus-scale shape)
KNN_GRAPH_BROADCAST_MAX = 100_000

#: hard BYTE bound on the broadcast matrix (n * dim * 8): the row
#: threshold alone under-protects high-dim corpora (100k x 1024-dim
#: float64 is ~820 MB of driver + per-executor memory), so the dispatch
#: probes one row's dimensionality and falls back to the join path when
#: the matrix would exceed this
KNN_GRAPH_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def _pair_scorer(
    embeddings: DataFrame,
    n: int,
    broadcast_threshold: int,
    dim: int | None = None,
):
    """Pick the scoring path: returns ``(vecs, pair_cos)`` where exactly
    one is non-None. Broadcast path collects the (bounded) corpus
    matrix once and ships it per executor via SparkContext.broadcast;
    join path persists the (vec_id, v) relation for the joins. The
    broadcast path is taken only when BOTH the row threshold and the
    estimated-bytes bound (one probed row's dim x n x 8 <=
    KNN_GRAPH_BROADCAST_MAX_BYTES) allow it. Callers that already know
    the embedding width pass ``dim`` to skip the probe job (the descent
    folds it into its count aggregate)."""
    from pyspark.storagelevel import StorageLevel

    take_broadcast = 0 < n <= broadcast_threshold
    if take_broadcast:
        if dim is None:
            probe = embeddings.select(
                F.size(as_double_vec("embedding")).alias("d")
            ).first()
            dim = int(probe["d"]) if probe is not None else 0
        take_broadcast = n * dim * 8 <= KNN_GRAPH_BROADCAST_MAX_BYTES
    if take_broadcast:
        import numpy as np

        from ccm_spark.functions.vector_udfs import cosine_pairs_udf

        rows = embeddings.select(
            "vec_id", as_double_vec("embedding").alias("v")
        ).collect()
        idmap = {int(r.vec_id): j for j, r in enumerate(rows)}
        mat = np.array([r.v for r in rows], dtype=np.float64)
        bc = embeddings.sparkSession.sparkContext.broadcast((idmap, mat))
        return None, cosine_pairs_udf(bc)
    vecs = embeddings.select(
        "vec_id", as_double_vec("embedding").alias("v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    return vecs, None


def _topk(edges: DataFrame, k: int) -> DataFrame:
    """Per-src top-k of scored edges by the engine's deterministic
    near-tie rule (cos desc, dst asc)."""
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), F.col("dst").asc())
    return edges.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _seed_pairs(
    embeddings: DataFrame,
    planes: int,
    seed: int,
    n_seed_tables: int,
    cap: int,
    max_bucket_size: int,
    left_ids: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) seed candidate pairs from ``n_seed_tables``
    independent SRP tables in ONE corpus pass (r16). The r15 shape
    looped table-by-table — each table re-running the 64-dim posexplode
    + plane join + two aggregates over the corpus, and each table's
    bucket relation feeding BOTH sides of its self-join as separate
    physical subtrees — so the bucketization chain executed up to
    2 · n_seed_tables times per build. Here all tables' hyperplanes ride
    one broadcast relation keyed by ``tbl`` (the per-table planes are
    byte-identical: ``srp_plane_values(planes, DIM, seed + t)``, exactly
    what ``similarity.srp_buckets`` derives per table), the explode and
    both aggregates run once over (vec_id, tbl) keys, and the valved
    bucket relation — n_tables·N rows of three int64s — is eagerly
    localCheckpointed so the |bucket|² self-join consumes ONE
    materialisation (and, because the checkpoint preserves the valve
    window's hash(tbl, bucket) partitioning, the self-join plans zero
    exchanges). Per-table semantics are unchanged: the oversize valve
    applies per (tbl, bucket) BEFORE the self-join, the per-src cap
    ranks by dst asc per (tbl, src), and cross-table duplicate pairs
    are retained exactly as the old per-table union retained them
    (score_topk's canonical dedup absorbs both).

    ``left_ids`` restricts the PROPOSING side to an id set — the
    ``knn_graph_insert`` increment — while the candidate side stays the
    full valved corpus, matching the r15 per-table ``bn = b.join(new)``
    shape."""
    from ccm_spark.pipeline.similarity import DIM, srp_plane_values

    spark = embeddings.sparkSession
    plane_rows = [
        (t, pl, d, c)
        for t in range(n_seed_tables)
        for (pl, d, c) in srp_plane_values(planes, DIM, seed + t)
    ]
    planes_df = spark.createDataFrame(
        plane_rows, "tbl int, plane int, dim_idx int, comp double"
    )
    comps = (
        spread(embeddings, "vec_id")
        .select(
            "vec_id", F.posexplode(as_double_vec("embedding")).alias("dim_idx", "v")
        )
        .join(F.broadcast(planes_df), "dim_idx")
        .groupBy("vec_id", "tbl", "plane")
        .agg(F.sum(F.col("v") * F.col("comp")).alias("dot"))
    )
    pw = F.expr("shiftleft(CAST(1 AS BIGINT), plane)")
    bit = F.when(F.col("dot") >= 0.0, pw).otherwise(F.lit(0).cast("long"))
    b = comps.groupBy("vec_id", "tbl").agg(F.sum(bit).alias("bucket"))
    bucket_w = Window.partitionBy("tbl", "bucket")
    valved = (
        spread(b, "tbl", "bucket")
        .withColumn("bucket_n", F.count("*").over(bucket_w))
        .where(F.col("bucket_n") <= max_bucket_size)
        .drop("bucket_n")
        .localCheckpoint(eager=True)
    )
    left = valved if left_ids is None else valved.join(left_ids, "vec_id")
    p = (
        left.alias("l")
        .join(valved.alias("r"), ["tbl", "bucket"])
        .where(F.col("l.vec_id") != F.col("r.vec_id"))
        .select(
            "tbl",
            F.col("l.vec_id").alias("src"),
            F.col("r.vec_id").alias("dst"),
        )
    )
    wcap = Window.partitionBy("tbl", "src").orderBy(F.col("dst").asc())
    return (
        p.withColumn("_r", F.row_number().over(wcap))
        .where(F.col("_r") <= cap)
        .select("src", "dst")
    )


def knn_graph_descent(
    embeddings: DataFrame,
    k: int = 10,
    n_rounds: int = 3,
    seed: int = 99,
    init_cap: int | None = None,
    planes: int | None = None,
    n_seed_tables: int = 3,
    rho: float = 1.5,
    max_bucket_size: int = 1000,
    broadcast_threshold: int = KNN_GRAPH_BROADCAST_MAX,
) -> DataFrame:
    """Approximate k-NN graph ``(src, dst, cos_sim, rank)`` over the
    whole embedding corpus via SRP-seeded NN-descent.

    ``init_cap`` bounds how many bucket co-members seed each vector
    (default ``2k``): an overfull SRP bucket contributes its
    lowest-vec_id members — the deterministic cap, not a sample.
    ``max_bucket_size`` drops degenerate SRP buckets from seeding
    BEFORE the |bucket|² self-join (the blocking families' shared
    valve; a vector whose bucket is oversized in EVERY seed table — a
    mega-block of near-identical vectors — gets no seed edge, nothing
    points at it, and it is absent from the output, exactly the
    near-dup families' contract for valved buckets). ``rho`` bounds
    each node's sampled reverse in-degree at ⌈ρ·k⌉ per descent round
    (see :func:`capped_adjacency`). Vectors whose bucket is a
    singleton start edge-less and are reached through REVERSE edges in
    the descent rounds; a vector unreachable after all rounds is
    absent from the output (count them — on real corpora with adaptive
    plane counts this is rare; the test pins the realised coverage on
    the synthetic corpus).

    Tiny-corpus caveat: ``planes=None`` uses the engine-wide adaptive
    plane count, whose FLOOR is ``SRP_PLANES`` (8) — sized for real
    corpora. Under ~128 vectors that makes most buckets singletons and
    the graph can come out EMPTY; pass ``planes`` explicitly there
    (``examples/corpus_pipeline.py`` shows the sizing rule: ~8
    expected members per bucket).
    """
    if k < 1 or n_rounds < 0:
        raise ValueError(
            f"knn_graph_descent: k >= 1 and n_rounds >= 0 required "
            f"(got k={k}, n_rounds={n_rounds})"
        )
    cap = init_cap if init_cap is not None else 2 * k
    # one aggregate job yields both the row count and the embedding
    # width, so the byte-bound broadcast dispatch needs no second probe
    stats = embeddings.select(
        F.count("*").alias("n"),
        F.first(F.size(as_double_vec("embedding"))).alias("d"),
    ).first()
    n = int(stats["n"])
    dim = int(stats["d"]) if stats["d"] is not None else 0
    if planes is None:
        planes = adaptive_srp_planes(n)
    cos = cosine_pandas()
    vecs, pair_cos = _pair_scorer(embeddings, n, broadcast_threshold, dim=dim)

    def score_topk(pairs: DataFrame) -> DataFrame:
        """(src, dst) candidates -> per-src top-k scored edges (the
        shared _score_pairs/_topk kernels — knn_graph_insert reuses
        them so the incremental path can never diverge on scoring).
        drop_unknown=False: descent candidates come from the very
        relation the broadcast index was collected from, so no pair can
        score NaN — the parity filter belongs to the insert/search
        probe paths only (r11->r12 bench bisect)."""
        return _topk(
            _score_pairs(vecs, cos, pairs, pair_cos, drop_unknown=False), k
        )

    # seed: SRP bucket co-members from SEVERAL independent hash tables.
    # One table is NOT enough: its buckets partition the corpus into
    # equivalence classes, and two-hop expansion of intra-bucket edges
    # can never leave a class — the descent would only ever refine
    # inside the seed components (measured: recall frozen across rounds
    # at one table). Independent tables' cliques overlap, so their
    # union is globally connected with high probability — the standard
    # multi-table LSH argument, here buying CONNECTIVITY rather than
    # candidate recall. Capped deterministically by dst id per table.
    # All tables are built in ONE corpus pass (r16, _seed_pairs); no
    # pre-distinct on the pairs: score_topk's canonicalising
    # (least, greatest) distinct dedupes in an exchange it pays anyway.
    pairs0 = _seed_pairs(
        embeddings, planes, seed, n_seed_tables, cap, max_bucket_size
    )
    nbrs = score_topk(pairs0).localCheckpoint(eager=True)

    for _ in range(n_rounds):
        # r16: the round consumes adj three ways (self-join l/r + the
        # union below); an eager localCheckpoint of the byte-tiny
        # (≤ N·(k+⌈ρk⌉) rows of two int64s) relation computes the
        # mirror window ONCE and — because localCheckpoint preserves
        # the window's hash(src) output partitioning — the pair
        # self-join on src plans ZERO exchanges over it (measured in
        # plans/r16/knn_descent_full_round_after.txt; A/B in
        # OPTIMIZATION_r16.md)
        adj = capped_adjacency(nbrs, k, rho).localCheckpoint(eager=True)
        # pair join on the shared adjacency OWNER (l.src == r.src):
        # "two members of one node's capped adjacency are candidates
        # for each other". Each owner holds ≤ k + ⌈ρk⌉ rows, so the
        # join emits ≤ (k(1+ρ))² pairs per node — bounded by
        # construction, unlike a join through the (unbounded
        # in-degree) mid vertex.
        # r16: emit each two-hop pair in ONE orientation (src < dst), not
        # both — score_topk canonicalises to (least, greatest) and
        # dedupes before scoring, so the (b, a) twin of every (a, b) was
        # pure shuffle volume: the pair relation entering the round's
        # repartition exchange halves, the dedup aggregate sees half the
        # rows, and the distinct canonical pair set (hence the scored
        # rows, the mirror, and the final graph) is bit-identical
        two_hop = (
            adj.alias("l")
            .join(adj.alias("r"), F.col("l.src") == F.col("r.src"))
            .select(F.col("l.dst").alias("src"), F.col("r.dst").alias("dst"))
            .where(F.col("src") < F.col("dst"))
        )
        # as with the seed union: no pre-distinct — score_topk's
        # canonical-pair distinct absorbs the duplicates in one exchange
        cand = adj.union(two_hop)
        nbrs = score_topk(cand).localCheckpoint(eager=True)

    if vecs is not None:
        vecs.unpersist()
    return nbrs


def knn_graph_insert(
    embeddings: DataFrame,
    graph: DataFrame,
    new_ids: DataFrame,
    k: int = 10,
    seed: int = 99,
    init_cap: int | None = None,
    planes: int | None = None,
    n_seed_tables: int = 3,
    max_bucket_size: int = 1000,
    broadcast_threshold: int = KNN_GRAPH_BROADCAST_MAX,
) -> DataFrame:
    """Incremental k-NN graph maintenance — insert an ingestion
    increment into a served :func:`knn_graph_descent` graph WITHOUT
    rebuilding it (the ``dedup_incremental`` /
    ``probe_embedding_index`` contract, for the graph artifact):

    1. **Seed**: the same multi-table SRP bucketization over the FULL
       corpus (``embeddings`` = existing ∪ increment, the valve
       applied), but candidate pairs are generated from the INCREMENT
       side only — work is proportional to the increment, never to the
       corpus.
    2. **Hop through the served graph**: each new vector's bucket
       co-members contribute their existing ranked edges ((new ~ c,
       c → d) ⇒ (new, d)) — one equi-join; the standing graph's
       quality substitutes for descent rounds, so candidate volume per
       new vector is ≤ tables·cap·(1 + k).
    3. **Score + merge**: the shared canonical scoring kernel; NEW
       nodes take their top-k, and EXISTING nodes re-rank ONLY where
       the mirror of a (new, existing) pair touched them — every
       untouched existing row passes through byte-identical
       (test-pinned), so the output can overwrite the served relation
       in place.

    Deterministic: pure function of (embeddings, graph, new_ids, k,
    seed) on any partitioning. New↔new near-dups meet through shared
    buckets; a new vector whose every bucket is valved or empty gets
    no edges and is absent (the build-path contract). Pass the SAME
    ``planes`` the standing graph was built with when its bucketization
    should be reproduced exactly; the default re-derives the adaptive
    count from the full corpus size."""
    if k < 1:
        raise ValueError(f"knn_graph_insert: k >= 1 required (got k={k})")
    cap = init_cap if init_cap is not None else 2 * k
    n = embeddings.count()
    if planes is None:
        planes = adaptive_srp_planes(n)
    cos = cosine_pandas()
    new = new_ids.select("vec_id").distinct()
    # the merge's no-duplicate argument requires new_ids ∩ graph.src = ∅:
    # re-inserting a node already in the graph would mirror edges onto
    # incumbent (src, dst) rows and let one neighbor hold two top-k
    # ranks. One left-semi count over the (tiny) increment relation.
    n_overlap = new.join(
        graph.select(F.col("src").alias("vec_id")), "vec_id", "left_semi"
    ).count()
    if n_overlap:
        raise ValueError(
            f"knn_graph_insert: {n_overlap} new_ids already exist in the "
            "served graph — re-insertion would duplicate incumbent edges; "
            "rebuild with knn_graph_descent or exclude existing ids"
        )
    vecs, pair_cos = _pair_scorer(embeddings, n, broadcast_threshold)

    # all seed tables in one corpus pass; candidate pairs proposed from
    # the INCREMENT side only (left_ids), against the full valved corpus
    pairs0 = _seed_pairs(
        embeddings,
        planes,
        seed,
        n_seed_tables,
        cap,
        max_bucket_size,
        left_ids=new,
    )

    # hop: co-members' ranked edges extend each new vector's pool
    ge = graph.select(F.col("src").alias("_m"), F.col("dst").alias("_d"))
    hop = (
        pairs0.join(ge, pairs0["dst"] == ge["_m"])
        .select("src", F.col("_d").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    sc = _score_pairs(vecs, cos, pairs0.union(hop), pair_cos).localCheckpoint(
        eager=True
    )

    new_rows = _topk(sc.join(new, sc["src"] == new["vec_id"], "left_semi"), k)
    touched = sc.join(new, sc["src"] == new["vec_id"], "left_anti")
    touched_src = touched.select("src").distinct()
    incumbent = graph.select("src", "dst", "cos_sim").join(
        touched_src, "src", "left_semi"
    )
    # no (src, dst) overlap to dedupe: touched rows are mirrors of
    # (new, existing) pairs, so their dst is always a NEW node while
    # incumbent edges point at pre-existing nodes
    updated = _topk(incumbent.unionByName(touched), k)
    untouched = graph.join(touched_src, "src", "left_anti")
    out = untouched.unionByName(updated).unionByName(new_rows)
    if vecs is not None:
        vecs.unpersist()
    return out


def knn_graph_components(
    graph: DataFrame, threshold: float = 0.95, max_iter: int = 25
) -> DataFrame:
    """Graph-based dedup over the ranked neighbor graph (the r10
    CONSUMER of :func:`knn_graph_descent`): ``(vec_id, component)``
    connected components of the graph's edges with ``cos_sim >=
    threshold`` — near-duplicate CLUSTERS from the same artifact that
    serves retrieval and diversity sampling, with no extra LSH pass
    over the corpus. Because the graph already ranks each vector's k
    nearest, thresholding its edges is exactly the near-dup evidence
    the pair families mine, pre-localised: a vector's above-threshold
    neighbors are a subset of its top-k (k must exceed the expected
    duplicate-group size for full recall within a group — groups
    larger than k still collapse transitively through chained top-k
    edges, the usual label-propagation argument).

    Every graph node appears in the output (no above-threshold edge →
    its own singleton component); labels are min-vec_id, so filtering
    ``vec_id == component`` yields the deduplicated representative
    set. One filter + the shared min-label kernel
    (``graph.connected_components``): rounds bounded by component
    diameter, eager localCheckpoint per round, loud failure past
    ``max_iter``."""
    from ccm_spark.pipeline.graph import connected_components

    strong = graph.where(F.col("cos_sim") >= threshold).select("src", "dst")
    # self-edges keep threshold-isolated nodes in the node universe;
    # they are identity under min-label propagation
    nodes = graph.select("src").distinct()
    edges = strong.unionByName(nodes.select("src", F.col("src").alias("dst")))
    return connected_components(edges, max_iter=max_iter).select(
        F.col("node").alias("vec_id"), "component"
    )


def graph_diversity_sample(
    graph: DataFrame, threshold: float = 0.95, seed: str = "ds"
) -> DataFrame:
    """Diversity sampling off the ranked neighbor graph (the second
    r10 CONSUMER next to :func:`knn_graph_components`): ``(vec_id,
    keep)`` where the kept set is an INDEPENDENT SET of the
    cos >= threshold graph — no two kept vectors are above-threshold
    neighbors, so dense semantic regions are thinned to local
    representatives while isolated vectors always survive.

    Rule (one round of Luby's algorithm under a deterministic hash
    priority): v keeps iff no above-threshold neighbor u has a smaller
    ``(md5_long(seed:id), id)`` priority. Pure function of (graph,
    threshold, seed) on any partitioning; within a duplicate CLIQUE
    exactly the min-priority member keeps. One symmetrised projection
    of the edge relation + one per-node aggregate — no iteration, no
    collect; at 100 TB this is a min-aggregate and a join over an
    O(N·k) relation (no pre-distinct on the symmetrised edges: a
    duplicate neighbor entry cannot change a MIN)."""
    from ccm_spark.functions.hashing import md5_long

    def pr(col):
        return md5_long(F.concat(F.lit(f"{seed}:"), F.col(col).cast("string")))

    e = graph.where(F.col("cos_sim") >= threshold).select("src", "dst")
    # symmetrise via one explode (the r15 mirror rule): a self-union
    # would evaluate the thresholded edge subtree once per branch
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    nbr_min = (
        sym.select("src", F.struct(pr("dst").alias("p"), F.col("dst").alias("i")).alias("np"))
        .groupBy("src")
        .agg(F.min("np").alias("min_np"))
    )
    nodes = graph.select("src").distinct()
    own = F.struct(pr("src").alias("p"), F.col("src").alias("i"))
    return (
        nodes.join(nbr_min, "src", "left")
        .select(
            F.col("src").alias("vec_id"),
            (F.col("min_np").isNull() | (own < F.col("min_np"))).alias("keep"),
        )
    )


def knn_graph_recall(
    graph: DataFrame, exact: DataFrame, k: int = 10
) -> DataFrame:
    """Per-node recall of an approximate k-NN graph vs the exact one
    (``similarity.cosine_topk`` with ``n_queries = N``): (src, n_hits,
    recall). The join is on ranked edge identity (src, dst) — cosine
    ties broken identically on both sides by the shared (score desc,
    id asc) rule, so recall is well-defined."""
    g = graph.select("src", "dst")
    e = exact.select(
        F.col("query_id").alias("src"), F.col("target_id").alias("dst")
    )
    hits = g.join(e, ["src", "dst"], "left_semi").groupBy("src").agg(
        F.count("*").alias("n_hits")
    )
    base = e.select("src").distinct()
    return base.join(hits, "src", "left").select(
        "src",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        (
            F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6)
            + F.lit(0.0)
        ).alias("recall"),
    )


def knn_graph_search(
    graph: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    beam: int = 32,
    n_hops: int = 3,
    n_seeds: int = 16,
) -> DataFrame:
    """Best-first beam search over the served k-NN graph — the graph
    family's retrieval consumer (the HNSW layer-0 walk, batched): for
    each query vector, start from deterministic seed nodes, repeatedly
    expand the current per-query beam through the graph's ranked edges,
    and return the top-k visited nodes. Queries whose true neighbors
    are reachable within ``n_hops`` of a seed avoid the brute-force
    scan entirely; recall vs exact is pinned in tests/test_ann_graph.py.

    Deterministic end-to-end: seeds are the ``n_seeds`` lowest node
    ids (SRP-bucket seeding would cut hops on clustered corpora, but
    id-seeding keeps the walk replayable in the pure-Python twin and
    costs nothing on isotropic data); scores round to 9 decimals with
    the graph's (cos desc, id asc) tie rule; every hop expands the
    CURRENT beam only and never re-scores a visited (query, node) pair.
    Graph nodes absent from the embeddings relation (a served graph can
    outlive deletions) are recorded visited-with-NULL-score — never
    re-proposed, never expanded, never output; already-expanded beam
    members are skipped on later hops (their dsts are all visited).

    100 TB shape: per hop — one join of the beam (|Q|·beam rows, two
    int64s wide) against the graph's edge relation, one anti-join
    against the visited set, one Arrow-batched cosine pass against the
    broadcast query matrix, one per-query top-beam window. The corpus
    embedding relation is touched once per hop via equi-join on the
    candidate ids only (never scanned whole); visited state is
    localCheckpointed per hop (the NN-descent rounds' lineage
    discipline). Driver holds nothing but the loop counter.
    """
    if min(k, beam, n_hops, n_seeds) < 1:
        raise ValueError("knn_graph_search: k, beam, n_hops, n_seeds must be >= 1")
    cos = cosine_pandas()
    vecs = embeddings.select(
        "vec_id", as_double_vec("embedding").alias("v")
    )
    qv = queries.select(
        F.col("query_id"), as_double_vec("embedding").alias("qv")
    )
    edges = graph.select("src", "dst")

    def score_mark(cand: DataFrame) -> DataFrame:
        """Score candidates AND record the unscorable ones (graph nodes
        with no row in the embeddings relation — a served graph can
        reference vectors since deleted, the ``knn_graph_insert``
        precondition). Unscorable nodes enter visited with a NULL
        ``cos_sim`` so the anti-join never re-proposes them hop after
        hop; the NULL keeps them out of the frontier and the output
        (both filter on ``cos_sim IS NOT NULL``).

        ONE pass: a left join against the vector relation marks
        dangling nodes in the same plan that scores the live ones (the
        scored-then-anti-join form evaluated the candidate join subtree
        twice per hop). The cosine kernel still sees a well-shaped
        vector for every row — dangling rows feed it the query vector
        itself (cos(q,q), discarded by the when()) so the Arrow batch
        never carries NULL arrays."""
        return (
            spread(cand, "query_id", factor=2)
            .join(F.broadcast(qv), "query_id")
            .join(vecs, F.col("node") == F.col("vec_id"), "left")
            .select(
                "query_id",
                "node",
                F.when(
                    F.col("v").isNotNull(),
                    F.round(
                        cos(F.col("qv"), F.coalesce(F.col("v"), F.col("qv"))), 9
                    )
                    + F.lit(0.0),
                ).alias("cos_sim"),
            )
        )

    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(n_seeds)
    )
    visited = score_mark(
        qv.select("query_id").crossJoin(F.broadcast(seeds))
    ).localCheckpoint(eager=True)

    beam_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("node").asc()
    )
    expanded = None
    for _ in range(n_hops):
        frontier = (
            visited.where(F.col("cos_sim").isNotNull())
            .withColumn("rank", F.row_number().over(beam_w))
            .where(F.col("rank") <= beam)
            .select("query_id", "node")
        )
        # only expand frontier members not expanded on a previous hop:
        # an already-expanded node's dsts are all visited, so re-joining
        # it against the edge relation buys nothing — output-identical,
        # one (|Q|·beam)-row anti-join instead of a wasted edge join
        to_expand = (
            frontier
            if expanded is None
            else frontier.join(expanded, ["query_id", "node"], "left_anti")
        )
        cand = (
            to_expand.join(edges, to_expand.node == edges.src)
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["query_id", "node"], "left_anti")
        )
        visited = visited.unionByName(score_mark(cand)).localCheckpoint(eager=True)
        expanded = (
            to_expand
            if expanded is None
            else expanded.unionByName(to_expand)
        ).localCheckpoint(eager=True)

    return (
        visited.where(F.col("cos_sim").isNotNull())
        .withColumn("rank", F.row_number().over(beam_w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("node").alias("target_id"),
            "cos_sim",
        )
    )
