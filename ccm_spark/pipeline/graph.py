"""Link-graph analytics for crawl curation — host graph + PageRank.

The reference has no graph surface (SURVEY.md §2.1); this is extension
surface for the training-data pipeline: production crawl curation ranks
hosts by link centrality (Common Crawl publishes exactly such a
host-level ranking) and uses it to budget the crawl frontier and weight
corpus sampling. The chain here:

    html.extract_links --host_graph--> (src,dst,weight) --pagerank--> ranks

100 TB design:
  - **The edge relation is the scale object.** ``host_graph``
    aggregates page-level links down to (src_host, dst_host, weight)
    with one map-side-combined groupBy — hosts number ~10^8 where pages
    number ~10^11, so everything iterative runs on the reduced graph.
  - **PageRank = 2 shuffles/iteration, both on the same key.** The
    contribution join and the rank aggregation hash on src/dst; edges
    are repartitioned ONCE on src and persisted, so every iteration's
    join reuses that layout and only the (node, rank) relation — the
    small side — moves. On a real cluster the same layout comes from
    bucketing the edge table by src.
  - **Lineage is cut every iteration.** Iterative DataFrame loops grow
    a plan per round; ``localCheckpoint`` keeps round N's plan O(1)
    instead of O(N) (same discipline as dedup's label propagation).
  - **Dangling mass stays in-plan.** Nodes with no out-links leak rank;
    the leak is recovered as one scalar aggregate crossJoin-broadcast
    back into the update — no per-iteration driver collect.
  - Float sums are order-dependent, so ranks are reproducible to ~1e-12
    (not bit-exact) across partitionings — tests pin against an exact
    numpy power-iteration replay at that tolerance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .urls import url_domain

#: default damping — the standard Brin/Page value
DAMPING = 0.85


def host_graph(
    links: DataFrame,
    base_col: str = "base_url",
    href_col: str = "href",
    keep_self: bool = False,
) -> DataFrame:
    """Page-level link rows → weighted host-level edges
    ``(src, dst, weight)``. Unparseable hosts drop out (NULL domain);
    intra-host edges (navigation chrome) are dropped unless asked for —
    they dominate raw counts and carry no cross-site endorsement."""
    e = links.select(
        url_domain(F.col(base_col)).alias("src"),
        url_domain(F.col(href_col)).alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if not keep_self:
        e = e.filter(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(F.count("*").alias("weight"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "weight",
    n_iters: int = 10,
    damping: float = DAMPING,
    quantize: int | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge relation → ``(node, rank)``,
    ranks summing to 1 (with ``quantize`` set, only to ~1: each
    per-iteration rounding perturbs the total by up to n·5e-(q+1) —
    the exact sum-to-1 invariant is traded for cross-engine
    replayability). Parallel edges are additive; nodes appearing
    only as targets still receive rank; dangling nodes (no out-edges)
    redistribute uniformly, so total mass is conserved exactly (up to
    float summation) — the property the numpy replay pin checks (at
    ``quantize=None``; the quantized gate relies on the drift being
    tolerable, not absent).
    Edges with NULL or non-positive weight are dropped (they carry no
    endorsement and would poison the out-strength division); their
    endpoints stay in the node relation, and a src left with no
    positive out-edge is treated as dangling.

    ``quantize`` rounds every rank to that many decimals after each
    update — the kmeans/PQ trainers' cross-engine discipline: each
    iteration restarts from identical state in every engine, so a SQL
    power-iteration replay stays hash-identical (used by the gated
    ``pagerank_hosts`` query). ``None`` (the default) keeps full
    precision.

    Plan per iteration: ranks ⋈ edges on src (edges pre-partitioned +
    persisted, one layout for all rounds) → groupBy dst (map-side
    partial agg) → one scalar dangling aggregate broadcast back in.
    ``localCheckpoint`` truncates lineage each round (an every-2-rounds
    cadence was measured slower in r08 — the uncut round's recompute
    exceeds the skipped materialisation; see the loop comment)."""
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    # non-positive/NULL weights carry no endorsement and would poison
    # the out-strength division (a src whose weights sum to 0 gets
    # p = 0/0 = NULL and its rank mass silently vanishes — breaking the
    # conservation invariant the tests pin). Dropping them keeps mass
    # exact: a src with no surviving out-edge is dangling and
    # redistributes uniformly. Nodes stay in the relation via the node
    # set, which is taken BEFORE the weight filter.
    nodes_src = e
    e = e.filter(F.col("w") > 0)
    # endpoint set via one explode, not a self-union: union's branches
    # are separate physical subtrees, so materialising the node set
    # evaluated the caller's edge relation twice (r15)
    nodes = nodes_src.select(
        F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
    ).distinct()
    nodes = nodes.persist()
    n = nodes.count()  # one scalar, once — not per iteration
    if n == 0:
        # empty result is computed before the unpersist drops the
        # (empty) persisted relation — otherwise the early return
        # leaks the persist for the session
        out = nodes.withColumn("rank", F.lit(0.0)).localCheckpoint(eager=True)
        nodes.unpersist()
        return out

    # size the iteration shuffles to the GRAPH, not the session default
    # (ceiling): r08 measured the 20k-node bench graph spending most of
    # each round on 32-partition exchange task overhead — at sp=4-8 the
    # same 5 iterations run ~40% faster, and on a real cluster a
    # host-graph with 1e9 nodes keeps the (large) session value. The
    # session conf is set for the loop only and restored in `finally`
    # (session-scoped: concurrent queries on the same session during a
    # pagerank call would see the reduced value — run centralities on
    # their own session if that window matters; per-join repartition()
    # cannot reach the groupBy exchanges, so the conf is the lever).
    spark = edges.sparkSession
    default_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    npart = max(2, min(default_sp, n // 4000 + 1))

    # out-strength denormalised onto edges once; layout reused every round
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .repartition(npart, "src")
        .persist()
    )

    # dangling-ness is STATIC, so it is stamped onto the node relation
    # ONCE (one left join against the distinct src set, eagerly
    # materialised — a lazy persist would only take effect after the
    # caller's first action, past the unpersists below); inside the
    # loop the per-round dangling mass is then a FILTER + scalar agg
    # over the already-checkpointed ranks — no join at all (r08 ran a
    # semi-join per round here; on the 20k bench graph that join was
    # pure per-iteration overhead)
    srcs = e.select("src").distinct().withColumn("_has_out", F.lit(True))

    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(npart))
        return _pagerank_loop(e, nodes, srcs, n, n_iters, damping, quantize)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(default_sp))
        e.unpersist()
        nodes.unpersist()


def _pagerank_loop(e, nodes, srcs, n, n_iters, damping, quantize):
    """The power-iteration loop of :func:`pagerank` (split out so the
    caller's try/finally conf restore + unpersists wrap every exit)."""
    nodes_f = (
        nodes.join(srcs, nodes.node == srcs.src, "left")
        .select(
            "node",
            F.coalesce(F.col("_has_out"), F.lit(False)).alias("has_out"),
        )
        .localCheckpoint(eager=True)
    )

    ranks = nodes_f.select("node", "has_out", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iters):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("contrib"))
        )
        # rank mass sitting on dangling nodes, recovered in-plan: the
        # broadcast job only scans the checkpointed ranks (node-sized)
        dangling = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        new_rank = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping)
            * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dmass") / n)
        )
        if quantize is not None:
            new_rank = F.round(new_rank, quantize)
        ranks = (
            nodes_f.join(contribs, nodes_f.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", "has_out", new_rank.alias("rank"))
        )
        # EAGER checkpoint EVERY round, for two reasons both pinned
        # by tests: (a) each iteration executes here, WHILE e/nodes
        # are still persisted AND the graph-sized shuffle conf is
        # active — a lazy loop would defer all rounds past the
        # caller's conf restore + unpersists and recompute the edge
        # layout every round; (b) ranks feeds TWO consumers per round
        # (contribs + dangling), so an uncut plan DOUBLES per
        # iteration — O(2^n_iters) analysis blew the driver heap at
        # 12 rounds when this was briefly a persist-only chain.
        # Checkpointing every SECOND round was MEASURED in r08
        # (bench pagerank_20k: 6.2 s vs 5.3 s per-round) and reverted:
        # the uncut round re-executes once per consumer at the next
        # cut, and on a 20k-node graph that recompute costs more than
        # the skipped materialisation — per-round stays. Superseded
        # rounds' checkpoint blocks are released by the ContextCleaner
        # as soon as the rebound Python reference drops (CPython
        # refcounting — prompt in practice); Spark exposes no public
        # API to free them more eagerly.
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def top_hosts(
    edges: DataFrame, k: int = 100, n_iters: int = 10, damping: float = DAMPING
) -> DataFrame:
    """The curation artifact: top-k hosts by PageRank with their degree
    stats joined on — what a crawl budgeter actually consumes. Two-phase
    top-k is unnecessary here: ranks is host-cardinality (already the
    reduced relation), so one orderBy-limit is the right plan."""
    ranks = pagerank(edges, n_iters=n_iters, damping=damping)
    # degrees over the SAME edge set pagerank walks (positive weights
    # only) — otherwise the report can show out_degree > 0 for a host
    # pagerank treated as dangling
    pos = edges.filter(F.col("weight").cast("double") > 0)
    deg = pos.groupBy("src").agg(F.count("*").alias("out_degree"))
    indeg = pos.groupBy("dst").agg(F.count("*").alias("in_degree"))
    return (
        ranks.join(deg, ranks.node == deg.src, "left")
        .join(indeg, ranks.node == indeg.dst, "left")
        .select(
            "node",
            "rank",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        )
        .orderBy(F.desc("rank"), "node")
        .limit(k)
    )


def anchor_text_profile(
    links: DataFrame, k: int = 10, by_host: bool = True
) -> DataFrame:
    """Per link TARGET: the top-k anchor terms pointing at it —
    the classic off-page relevance signal (what OTHER pages call a
    target is a cleaner description than the target's own boilerplate);
    search indexes fold this into the target's term profile, and a
    curation pass uses it as an independent topical label.

    ``by_host=True`` profiles hosts (the reduced ~10^8-key relation —
    the default at crawl scale); ``False`` profiles exact normalised
    URLs. Plan: codegen term explode → one map-side-combined count on
    (target, term) — skew-free because the key includes the term — then
    the engine's two-phase local/global top-k so no task ever sorts a
    mega-target's whole term relation."""
    from pyspark.sql import Window

    from ccm_spark.functions.hashing import tokens_col

    from .urls import url_normalize

    target = (
        url_domain(F.col("href")) if by_host else url_normalize(F.col("href"))
    )
    terms = links.select(
        target.alias("target"),
        F.explode(tokens_col("anchor_text")).alias("term"),
    ).filter(F.col("target").isNotNull())
    counts = terms.groupBy("target", "term").agg(F.count("*").alias("n"))
    order = [F.col("n").desc(), F.col("term").asc()]
    local_w = Window.partitionBy("target", "split_id").orderBy(*order)
    survivors = (
        counts.withColumn("split_id", F.spark_partition_id())
        .withColumn("lr", F.row_number().over(local_w))
        .where(F.col("lr") <= k)
    )
    w = Window.partitionBy("target").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("target", "rank", "term", "n")
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, component) over an arbitrary undirected edge relation —
    component = smallest node id reachable. The generic form of the
    dedup family's cluster assignment (pipeline/dedup.py
    duplicate_components), exposed for graph-side curation jobs: mirror
    clusters over the host graph, session stitching, any
    same-entity collapse where pairwise evidence must become groups.

    Same engine discipline as the dedup twin: min-label propagation
    (one same-key shuffle per round, rounds bounded by component
    diameter), eager ``localCheckpoint`` per round so the plan AND the
    computation stay flat, convergence proven by a zero-change round,
    loud failure past ``max_iter`` (a deeper graph means the diameter
    assumption is wrong, not that a silent partial answer is fine).
    Nodes appear in the output iff they appear in an edge; direction is
    ignored (edges are symmetrised here)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    from pyspark.storagelevel import StorageLevel

    # symmetrise with ONE explode over a single edge subtree — a
    # self-union would evaluate the caller's edge relation twice when
    # the persist materialises (r15)
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    converged = False
    # max_iter PROPAGATION rounds + 1: a diameter-d component needs d
    # effective rounds plus one zero-change round to PROVE convergence,
    # so max_iter sized to the diameter budget still converges
    for _ in range(max_iter + 1):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components: no convergence after {max_iter + 1} "
            f"rounds (max_iter={max_iter} propagation + 1 confirmation) — "
            "component diameter exceeds the bound; raise max_iter"
        )
    return labels


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iters: int = 10,
    quantize: int | None = None,
) -> DataFrame:
    """HITS hubs and authorities (Kleinberg, JACM 1999) over an edge
    relation → ``(node, hub, authority)`` — the link-centrality
    complement to :func:`pagerank`: a crawl curator reads AUTHORITY to
    budget content hosts and HUB to budget directory/aggregator hosts
    (a high-hub host is where new authorities are discovered).

    Mutual recursion, L1-normalised each half-step (the fixed-point
    RANKING is the same as the classical L2 form, but a sum
    normalisation keeps every update a join + aggregate + one
    broadcast scalar — no sqrt, and with ``quantize`` set every value
    is rounded after each half-step so a SQL replay restarts from
    identical state per iteration, the pagerank/kmeans cross-engine
    discipline):

        a_{t+1}(v) ∝ Σ_{u→v} h_t(u)      h_{t+1}(u) ∝ Σ_{u→v} a_{t+1}(v)

    Parallel edges are additive (a page linking twice endorses twice);
    pass ``weight`` to carry the multiplicity ``host_graph`` already
    aggregated into its weight column — without it an aggregated host
    graph loses page multiplicity and near-regular graphs degenerate to
    uniform scores. Non-positive/NULL weights are dropped (no
    endorsement), their endpoints stay in the node set (the pagerank
    rule). Nodes with no in-edges hold authority 0, no out-edges hub 0
    — both stay in the output.

    100 TB shape, same as pagerank: the deduped edge relation is
    repartitioned on ``src`` ONCE and persisted (every iteration's two
    joins reuse the layout), scores are the small moving side, the two
    normalisation totals are 1-row broadcast cross joins, and
    ``localCheckpoint`` cuts lineage per iteration.

    Concurrency caveat (shared with :func:`pagerank`): the iteration
    shuffles are sized to the GRAPH by setting the session-scoped
    ``spark.sql.shuffle.partitions`` for the loop (restored in
    ``finally``) — an unrelated query running CONCURRENTLY on the same
    SparkSession during the iterations would plan with the reduced
    count. Run graph centralities on their own session (or accept the
    window) — per-join repartition() cannot reach the groupBy
    exchanges, so the conf is the only lever short of AQE.
    """
    if n_iters < 1:
        raise ValueError("hits: n_iters must be >= 1")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    # one explode, not a self-union — the pagerank node-set rule (r15):
    # a union would evaluate the caller's edge subtree twice here
    nodes = (
        e.select(F.explode(F.array(F.col("src"), F.col("dst"))).alias("node"))
        .distinct()
        .persist()
    )
    e = e.filter(F.col("w") > 0)
    n = nodes.count()
    if n == 0:
        out = nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        ).localCheckpoint(eager=True)
        nodes.unpersist()
        return out
    spark = edges.sparkSession
    default_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    npart = max(2, min(default_sp, n // 4000 + 1))
    q = (lambda c: F.round(c, quantize)) if quantize is not None else (lambda c: c)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(npart))
        e = e.repartition(npart, "src").persist()
        e.count()
        h = nodes.select("node", F.lit(1.0 / n).alias("s")).localCheckpoint(
            eager=True
        )
        a = None
        # r15 A/B note: cutting at the RAW aggregate instead (so _l1's
        # tot branch reads a checkpoint and each edge join runs once)
        # was tried and REVERTED — the bench showed hits_20k 6.5 s ->
        # 19-33 s: re-evaluating the lazy _l1 join tree inside every
        # consumer costs more at this geometry than the duplicated
        # (tiny) edge join it saves. The r14 shape stays.
        for _ in range(n_iters):
            # authority from current hubs
            a_raw = (
                e.join(h.withColumnRenamed("node", "src"), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("w") * F.col("s")).alias("raw"))
            )
            a = _l1(nodes, a_raw, "dst", q).localCheckpoint(eager=True)
            # hubs from the fresh authorities
            h_raw = (
                e.join(a.withColumnRenamed("node", "dst"), "dst")
                .groupBy("src")
                .agg(F.sum(F.col("w") * F.col("s")).alias("raw"))
            )
            h = _l1(nodes, h_raw, "src", q).localCheckpoint(eager=True)
        out = (
            nodes.join(h.withColumnRenamed("s", "hub"), "node", "left")
            .join(a.withColumnRenamed("s", "authority"), "node", "left")
            .select(
                "node",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        # unpersist INSIDE the finally: a mid-iteration failure must not
        # leak the persisted corpus-scale edge relation for the session
        spark.conf.set("spark.sql.shuffle.partitions", str(default_sp))
        e.unpersist()
        nodes.unpersist()
    return out


def _l1(nodes: DataFrame, raw: DataFrame, key: str, q) -> DataFrame:
    """L1-normalise a (key, raw) score relation over ALL nodes (absent
    keys are 0): one 1-row total broadcast back via cross join, rounding
    hook applied AFTER the division (the per-iteration restart-identical
    state the SQL replay depends on)."""
    tot = raw.agg(F.sum("raw").alias("tot"))
    return (
        nodes.join(raw.withColumnRenamed(key, "node"), "node", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            q(
                F.when(
                    F.col("tot") > 0, F.coalesce("raw", F.lit(0.0)) / F.col("tot")
                ).otherwise(F.lit(0.0))
            ).alias("s"),
        )
    )
