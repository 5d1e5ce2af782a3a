"""Corpus-assembly operators: deterministic data mixing and sequence packing.

The reference engine has no corpus surface at all (it is a CCM analytics
library, SURVEY.md §2.1); these are the assembly steps an LLM training-data
pipeline runs after filtering/dedup:

- :func:`mixture_sample` — per-language sampling rates ("data mixing
  weights"), down- AND up-sampling (rates > 1 emit deterministic repeat
  copies), applied with a deterministic md5 threshold. A pure row-local
  plan: zero shuffle, filter pushes into the scan, and the SAME doc
  multiset is kept on any cluster size or partitioning — re-runs and
  backfills are reproducible, which `df.sample()` cannot promise under
  repartitioning.
- :func:`pack_sequences` — greedy sequential packing of tokenized docs
  into fixed token-budget training sequences. Docs are sharded by a stable
  md5 bucket; packing is sequential WITHIN a shard (the inherent data
  dependence of first-fit) and embarrassingly parallel ACROSS shards. At
  100 TB you raise ``n_shards`` so each shard's doc list fits a task
  comfortably (packing state is O(1) per shard).

Both are hash-checked against DuckDB oracles (mixture: identical md5
predicate; packing: per-shard recursive CTE carrying the (bin, fill)
state), so the exact bin assignment — not just row counts — is pinned
cross-engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ccm_spark.functions.hashing import md5_long, tokens_col
from ccm_spark.functions.partitioning import spread

#: modulus for the mixing key: rates are expressed as integer thresholds
#: out of MIX_MOD so no floating-point ever touches the keep/drop decision.
MIX_MOD = 1_000_000

#: default per-language mixing rates for the demo query (en-heavy mix).
DEFAULT_MIX_RATES: dict[str, float] = {
    "en": 1.0,
    "de": 0.5,
    "fr": 0.35,
    "es": 0.2,
    "zh": 0.1,
}
DEFAULT_MIX_SALT = "mix1"
DEFAULT_MIX_FALLBACK = 0.05

PACK_BUDGET = 256
PACK_SHARDS = 8


def mix_key(doc_id_col: str, salt: str) -> F.Column:
    """Deterministic per-doc sampling key in [0, MIX_MOD): a 60-bit md5 of
    ``doc_id:salt`` reduced mod MIX_MOD. Changing the salt draws an
    independent sample; the key is engine-portable (md5 is md5)."""
    seed = F.concat(F.col(doc_id_col).cast("string"), F.lit(":" + salt))
    return F.pmod(md5_long(seed), F.lit(MIX_MOD))


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    fallback_rate: float = DEFAULT_MIX_FALLBACK,
    salt: str = DEFAULT_MIX_SALT,
) -> DataFrame:
    """Stratified deterministic sampling by language — data-mixing weights,
    DOWN- and UP-sampling in one rule.

    A doc with rate r is emitted ``floor(r)`` times unconditionally, plus
    one extra copy iff ``mix_key < round(frac(r) * MIX_MOD)`` — so
    E[copies] = r exactly, per-doc multiplicities are deterministic under
    any partitioning, and for r <= 1 this reduces to the original
    keep-iff-below-threshold rule. Rates above 1 are how real mixing
    weights express epoch repetition (e.g. r=2.3: every doc twice, 30%
    of docs a third time). Output has one row per COPY with ``copy_idx``
    in [0, n); callers that only downsample can drop the column.

    The whole operator stays narrow: one pass over the scan, a generator
    explode of a per-row integer range, no shuffle at any scale; the kept
    multiset is independent of partitioning, task count, and execution
    order (unlike ``df.sample``).
    """
    rates = DEFAULT_MIX_RATES if rates is None else rates
    key = mix_key("doc_id", salt)
    thr = F.lit(int(round(fallback_rate * MIX_MOD)))
    for lang, rate in sorted(rates.items()):
        thr = F.when(F.col("lang") == lang, F.lit(int(round(rate * MIX_MOD)))).otherwise(thr)
    n_copies = (
        F.floor(thr / F.lit(MIX_MOD)).cast("int")
        + (key < F.pmod(thr, F.lit(MIX_MOD))).cast("int")
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            key.alias("sample_key"),
            n_copies.alias("n_copies"),
        )
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            "sample_key",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy_idx"),
        )
    )


def temperature_rates(
    docs: DataFrame,
    tau: float = 0.7,
    group_col: str = "lang",
    target_total: int | None = None,
) -> dict[str, float]:
    """Temperature-based mixing rates (the mT5/XLM-R multilingual
    reweighting): sampling mass q_i ∝ p_i^tau over the groups' natural
    shares p_i, converted to the PER-DOC rates :func:`mixture_sample`
    consumes — ``rate_i = q_i * T / n_i`` with T = ``target_total``
    (default: the corpus size, so the mixed corpus keeps its scale).
    tau=1 reproduces the natural distribution (every rate 1.0 at the
    default T); tau→0 approaches uniform-by-group, upsampling small
    groups above 1 (multi-copy repetition) and downsampling large ones.

    One map-side-combined count aggregate; the driver sees one row per
    GROUP (languages/domains — dozens, not documents), computes the
    closed-form rates, and the result plugs straight into the narrow
    sampling pass. Deterministic; groups are whatever ``group_col``
    holds (language, source domain, quality bucket...)."""
    if not 0 < tau <= 1:
        raise ValueError(f"temperature_rates: tau must be in (0, 1], got {tau}")
    counts = {
        r[group_col]: r.n
        for r in docs.groupBy(group_col).agg(F.count("*").alias("n")).collect()
        if r[group_col] is not None
    }
    if not counts:
        raise ValueError("temperature_rates: no groups found")
    total = sum(counts.values())
    t = total if target_total is None else int(target_total)
    mass = {g: (n / total) ** tau for g, n in counts.items()}
    z = sum(mass.values())
    return {g: (mass[g] / z) * t / counts[g] for g in sorted(counts)}


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Greedy sequential sequence packing within md5 shards.

    Each doc's token count comes from the shared whitespace tokenizer
    (hashing.tokens_col). Docs are bucketed into ``n_shards`` stable shards
    and, in doc_id order within a shard, appended to the current bin if it
    fits (``fill + n <= budget``) else a new bin is opened (a doc larger
    than the budget gets a bin of its own). Emits one row per doc with its
    (shard, bin_idx, bin_offset) placement.

    Scale shape: one hash exchange on ``shard``, then a per-shard
    sequential loop in an Arrow batch — state is two integers. Shard count
    is the parallelism knob; packing quality is unaffected by shard count
    (bins never span shards by construction).
    """
    prepared = docs.select(
        F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(n_shards)).alias("shard"),
        "doc_id",
        F.size(tokens_col("text")).cast("long").alias("n_tokens"),
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_idx = 0
        fill = -1  # sentinel: first doc always opens bin 0
        bins, offsets = [], []
        for n in pdf["n_tokens"]:
            if fill < 0:
                offset, fill = 0, int(n)
            elif fill + n <= budget:
                offset = fill
                fill += int(n)
            else:
                bin_idx += 1
                offset, fill = 0, int(n)
            bins.append(bin_idx)
            offsets.append(offset)
        return pd.DataFrame(
            {
                "shard": pdf["shard"],
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "bin_idx": pd.Series(bins, dtype="int64"),
                "bin_offset": pd.Series(offsets, dtype="int64"),
            }
        )

    return (
        spread(prepared, "shard")
        .groupBy("shard")
        .applyInPandas(
            _pack,
            schema="shard long, doc_id long, n_tokens long, bin_idx long, bin_offset long",
        )
    )


def shuffle_key(doc_id_col: str, seed: str) -> F.Column:
    """Full-width deterministic shuffle key: the 60-bit md5 integer of
    ``doc_id:shuf:seed``. Engine-portable (md5 is md5), so a DuckDB
    ``ORDER BY`` on the same expression replays the exact global order.
    A new seed draws an independent permutation (per-epoch reshuffle)."""
    return md5_long(
        F.concat(F.col(doc_id_col).cast("string"), F.lit(":shuf:" + seed))
    )


def global_shuffle(
    docs: DataFrame, seed: str = "epoch0", num_partitions: int | None = None
) -> DataFrame:
    """Deterministic global shuffle of a corpus — the "shuffle the training
    data" step, as a total pseudo-random ORDER, not an ORDER BY.

    ``repartitionByRange`` on the md5 shuffle key range-partitions the
    corpus (Spark samples the key distribution — md5 keys are uniform, so
    ranges balance within sampling error) and a ``sortWithinPartitions``
    orders each range locally: together, partition index then row order IS
    the global permutation — written out, files concatenate into globally
    shuffled order. No single-task global sort ever happens (an ``orderBy``
    would plan the same exchange + local sort, but this form states the
    contract explicitly and survives writers that would strip a top-level
    sort). Each epoch's reshuffle is one exchange of the corpus — the
    unavoidable minimum for a global permutation; doc_id breaks the
    (improbable) 60-bit key ties so the order is total and reproducible
    on any cluster size.
    """
    out = docs.withColumn("shuffle_key", shuffle_key("doc_id", seed))
    if num_partitions is None:
        out = out.repartitionByRange(F.col("shuffle_key"), F.col("doc_id"))
    else:
        out = out.repartitionByRange(
            num_partitions, F.col("shuffle_key"), F.col("doc_id")
        )
    return out.sortWithinPartitions("shuffle_key", "doc_id")


def stratified_sample(
    docs: DataFrame,
    n_per_group: int,
    group_col: str = "lang",
    salt: str = "strat1",
) -> DataFrame:
    """Exact-count deterministic stratified sampling: the ``n_per_group``
    docs with the smallest md5 sample keys per group — a uniform draw
    without replacement whose membership is a pure function of (doc_id,
    salt), independent of partitioning and cluster size (what
    ``df.sampleBy`` cannot promise, and it only approximates fractions,
    never exact counts).

    Two-phase top-k (the :func:`~ccm_spark.pipeline.text.vocab_topk`
    shape): each scan partition keeps its local n smallest keys per group,
    so the per-group window that ranks globally sees at most
    n x num_partitions rows per group — a billion-doc group never lands
    on one task, which a naive per-group window would force. Emits the
    sampled docs with their ``sample_rank`` in [1, n].
    """
    key = md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
    )
    keyed = docs.select(
        group_col, "doc_id", key.alias("sample_key")
    )
    order = [F.col("sample_key").asc(), F.col("doc_id").asc()]
    local_w = Window.partitionBy("split_id", group_col).orderBy(*order)
    survivors = (
        keyed.withColumn("split_id", F.spark_partition_id())
        .withColumn("lr", F.row_number().over(local_w))
        .where(F.col("lr") <= n_per_group)
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_group)
        .select(group_col, "doc_id", "sample_key", "sample_rank")
    )


def budget_select(
    docs: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    salt: str = "budget1",
    n_buckets_log2: int = 12,
) -> DataFrame:
    """Exact token-budget corpus selection: per group, keep documents in
    deterministic md5-key order until the NEXT doc would push the running
    token total over the group's budget — "give me 50B tokens of English,
    10B of German" as one reproducible operator (groups without a budget
    are dropped).

    Semantics (replayed exactly by a DuckDB cumulative-window twin): a doc
    is kept iff its inclusive running ``n_tokens`` sum, ordered by
    (sample_key, doc_id) within the group, is <= the group budget.

    A naive formulation is a per-group global cumulative window — one
    task per group, unusable when a group is most of a 100 TB corpus.
    Here the key space is cut into 2**n_buckets_log2 range buckets:
    (1) one hash-aggregate builds the per-(group, bucket) token histogram
    (NOTE: an eager Spark job at call time; ~4096 rows per group reach
    the driver regardless of corpus size), (2) the driver walks each
    group's cumulative histogram to find the single BOUNDARY bucket where
    the budget crosses, (3) one pass joins the tiny boundary table
    (broadcast), prunes every past-boundary bucket BEFORE the exchange,
    and runs the cumulative window partitioned by (group, bucket) — each
    window partition is a 1/4096 sliver of its group; below-boundary
    buckets keep everything, the boundary bucket keeps rows while the
    exact prefix total + local cumulative stays within budget. Raise
    ``n_buckets_log2`` to thin the slivers; results are identical for
    any bucket count and any partitioning.
    """
    spark = docs.sparkSession
    # tokenisation dominates both passes and happens BEFORE any exchange —
    # spread single-split local inputs or it runs on one core
    docs = spread(docs, "doc_id")
    key = md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
    )
    shift = 60 - n_buckets_log2  # md5_long keys are 60-bit
    # keyed is the text-free projection (5 narrow columns) consumed by
    # BOTH passes — persist it so the 100 TB text is scanned and
    # tokenised ONCE, not once per pass (~40 bytes/doc cached;
    # MEMORY_AND_DISK spills). Attached as _ccm_persisted for
    # release_cached.
    from pyspark.storagelevel import StorageLevel

    keyed = (
        docs.select(
            F.col(group_col).alias("grp"),
            "doc_id",
            key.alias("sample_key"),
            F.size(tokens_col("text")).cast("long").alias("n_tokens"),
        )
        .withColumn("bucket", F.shiftright("sample_key", shift))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    hist = (
        keyed.where(F.col("grp").isin(list(budgets)))
        .groupBy("grp", "bucket")
        .agg(F.sum("n_tokens").alias("bucket_tokens"))
        .collect()
    )
    by_grp: dict[str, list] = {}
    for r in hist:
        by_grp.setdefault(r["grp"], []).append((r["bucket"], r["bucket_tokens"]))
    # (grp, boundary_bucket, prefix_tokens_below_boundary, budget)
    bounds = []
    for grp, buckets in by_grp.items():
        budget = int(budgets[grp])
        cum = 0
        boundary, prefix = None, 0
        for bucket, toks in sorted(buckets):
            if cum + toks > budget:
                boundary, prefix = bucket, cum
                break
            cum += toks
        if boundary is None:
            boundary, prefix = 1 << n_buckets_log2, cum  # whole group fits
        bounds.append((grp, int(boundary), int(prefix), budget))
    if not bounds:
        keyed.unpersist()
        # same contract as the main path: group_col name restored, empty
        # _ccm_persisted so release_cached works uniformly
        empty = keyed.select(
            F.col("grp").alias(group_col), "doc_id", "sample_key", "n_tokens"
        ).where(F.lit(False))
        empty._ccm_persisted = []
        return empty
    bdf = spark.createDataFrame(
        bounds, "grp string, boundary long, prefix long, budget long"
    )
    # one pass: prune past-boundary buckets BEFORE the exchange, then a
    # cumulative window partitioned by (grp, bucket) — below-boundary
    # buckets are kept wholesale (their cum is irrelevant), only the
    # boundary bucket's rows consult prefix + cum. Every window partition
    # is a 1/2**n_buckets_log2 sliver of its group.
    joined = keyed.join(F.broadcast(bdf), "grp").where(
        F.col("bucket") <= F.col("boundary")
    )
    w = (
        Window.partitionBy("grp", "bucket")
        .orderBy("sample_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        joined.withColumn("cum", F.sum("n_tokens").over(w))
        .where(
            (F.col("bucket") < F.col("boundary"))
            | (F.col("prefix") + F.col("cum") <= F.col("budget"))
        )
        .select(F.col("grp").alias(group_col), "doc_id", "sample_key", "n_tokens")
    )
    out._ccm_persisted = [keyed]
    return out


def with_global_positions(df: DataFrame, position_col: str = "global_pos") -> DataFrame:
    """Assign each row its 0-based GLOBAL position in the DataFrame's
    current (partition index, within-partition) order — e.g. the training
    step number after :func:`global_shuffle` — with ZERO additional
    shuffle.

    The naive ``row_number() OVER (ORDER BY ...)`` is a single-task global
    sort. Here: one lightweight counting pass collects per-partition row
    counts (an eager Spark job; one integer per partition reaches the
    driver), the driver prefix-sums them into offsets, and a narrow Arrow
    pass stamps ``offset[pid] + local_index`` — the distributed
    zipWithIndex, kept in the DataFrame/Arrow world. Positions are
    deterministic iff the input's partitioning and row order are STABLE
    ACROSS JOBS. Raw ``global_shuffle`` output is NOT automatically
    stable: ``repartitionByRange`` re-samples its range boundaries per
    execution (seeded by RDD id), so with partial sampling at scale the
    count pass and the stamp pass can place boundary rows in different
    partitions. ``localCheckpoint(eager=True)`` (or persist + materialize)
    the input first so both passes — and any downstream write — read the
    same materialized partitions; this also avoids recomputing an
    expensive upstream plan twice.
    """
    import pandas as pd

    n_parts = df.rdd.getNumPartitions()

    def count_rows(it):
        n = 0
        pid = None
        for pdf in it:
            if len(pdf) and pid is None:
                pid = int(pdf["__pid"].iloc[0])
            n += len(pdf)
        if pid is not None:
            yield pd.DataFrame({"pid": [pid], "n": [n]})

    with_pid = df.withColumn("__pid", F.spark_partition_id())
    sizes = {
        r.pid: r.n
        for r in with_pid.mapInPandas(count_rows, "pid long, n long").collect()
    }
    offsets = {}
    acc = 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)

    cols = df.columns
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def stamp(it):
        local = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            off = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf[cols].copy()
            out[position_col] = pd.Series(
                range(off + local, off + local + len(pdf)), dtype="int64"
            ).values
            local += len(pdf)
            yield out

    return with_pid.mapInPandas(stamp, f"{fields}, {position_col} long")


def score_weighted_sample(
    scored: DataFrame,
    score_col: str = "model_score",
    gamma: float = 1.0,
    floor_rate: float = 0.0,
    salt: str = "qsample1",
) -> DataFrame:
    """Quality-weighted deterministic sampling: keep each document with
    probability ``max(floor_rate, score^gamma)`` — the curation move
    that samples a corpus TOWARD its quality distribution instead of
    thresholding it (a hard cutoff discards every borderline document;
    weighted sampling keeps them at reduced rate, preserving diversity
    — the standard soft-filter used with classifier quality scores).

    ``gamma`` sharpens (>1) or flattens (<1) the preference;
    ``floor_rate`` guarantees even zero-scored documents a minimum
    acceptance (set it > 0 when total distribution coverage matters
    more than purity). Scores must lie in [0, 1] (what
    ``text.classifier_score`` emits); NULL scores use the floor.

    Same determinism contract as :func:`mixture_sample`: acceptance
    compares the md5 ``mix_key`` against round(p * MIX_MOD), so the
    kept SET is a pure function of (doc_id, salt, score) — independent
    of partitioning, reproducible on any cluster, and a fresh salt
    draws an independent sample. One narrow pass, no shuffle,
    streaming-safe."""
    if not 0 <= floor_rate <= 1:
        raise ValueError(f"score_weighted_sample: floor_rate must be in [0, 1], got {floor_rate}")
    if gamma <= 0:
        raise ValueError(f"score_weighted_sample: gamma must be > 0, got {gamma}")
    key = mix_key("doc_id", salt)
    p = F.greatest(
        F.lit(float(floor_rate)),
        F.coalesce(
            F.pow(F.col(score_col).cast("double"), F.lit(float(gamma))),
            F.lit(float(floor_rate)),
        ),
    )
    thr = F.round(p * F.lit(MIX_MOD), 0).cast("long")
    return scored.withColumn("keep", key < thr)


def train_eval_split(
    docs: DataFrame,
    eval_frac: float = 0.01,
    salt: str = "split1",
    decontaminate_train: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Deterministic held-out split WITH leakage control — the eval-set
    construction step a training pipeline runs once per corpus freeze:

      1. split by the salted md5 mix key (content-independent,
         partitioning-independent, reproducible from (doc_id, salt)
         alone — the same key discipline as ``mixture_sample``);
      2. flag every TRAIN document sharing a token shingle with the
         eval split (``dedup.decontaminate`` — without this step the
         held-out loss is contaminated by near-copies that the random
         split scattered across the boundary).

    Returns ``(train, eval, leaks)``: train already has the leaking
    docs REMOVED (pass ``decontaminate_train=False`` to keep them and
    decide downstream); ``leaks`` is the audit relation (doc_id +
    shared-shingle count) a curation report records.

    Scale: the split is a narrow filter on both sides (one corpus scan
    each); the leak check is the decontaminate join, whose eval side is
    the SMALL side by construction (eval_frac of the corpus)."""
    if not 0.0 < eval_frac < 1.0:
        raise ValueError(f"train_eval_split: eval_frac must be in (0, 1), got {eval_frac}")
    from ccm_spark.pipeline.dedup import decontaminate

    key = mix_key("doc_id", salt)
    cut = int(eval_frac * MIX_MOD)
    eval_docs = docs.filter(key < cut)
    train_docs = docs.filter(key >= cut)
    flagged = decontaminate(train_docs, eval_docs)
    leaks = flagged.filter(F.col("contaminated"))
    if decontaminate_train:
        train_docs = train_docs.join(
            leaks.select("doc_id").distinct(), "doc_id", "left_anti"
        )
    return train_docs, eval_docs, leaks


def grouped_split(
    docs: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    salt: str = "gsplit1",
) -> DataFrame:
    """Adds ``split``: leakage-safe BY-CONSTRUCTION split assignment —
    every document of a GROUP (domain, near-dup cluster id, author,
    source) lands in the same split, because the assignment hashes the
    group key, never the document. The complement of
    :func:`train_eval_split`: that one splits per-document and removes
    leaks post-hoc (exact/near-copy leakage); this one prevents
    STRUCTURAL leakage (same site/cluster straddling train and test —
    the contamination a shingle check cannot see, e.g. templated
    sibling pages or paraphrases inside one near-dup cluster).

    ``fractions`` maps split name -> fraction; they must sum to 1
    (within 1e-9). Assignment: the salted md5 of the group key against
    cumulative thresholds in sorted-split-name order — deterministic,
    content-independent, partitioning-independent. NULL groups form one
    group of their own (hash of the literal 'NULL' marker), so unparsed
    domains stay together too. One codegen expression, no shuffle, no
    join; EXPECTED fractions hold over groups (a giant group lands
    whole in one split — the point)."""
    if not fractions:
        raise ValueError("grouped_split: fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"grouped_split: fractions must sum to 1, got {total}"
        )
    if any(f < 0 for f in fractions.values()):
        raise ValueError("grouped_split: fractions must be >= 0")
    key = md5_long(
        F.concat(
            F.lit(f"{salt}:"),
            F.coalesce(F.col(group_col).cast("string"), F.lit("\x00NULL")),
        )
    ) % MIX_MOD
    expr = None
    acc = 0.0
    names = sorted(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        # round, not truncate: 0.29 * 1e6 is 289999.99999999994 in
        # binary — int() would silently shave the band by one key
        # (mixture_sample's int(round(...)) convention)
        cond = key < int(round(acc * MIX_MOD))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return docs.withColumn("split", split)


def top_fraction(
    df: DataFrame,
    score_col: str,
    frac: float,
    tie_col: str = "doc_id",
) -> DataFrame:
    """Keep exactly ``ceil(frac · n)`` rows with the highest scores —
    the percentile-calibrated filter ("keep the classifier's top 25%")
    as a first-class operator.

    Rank-based, not threshold-based: an absolute score cut is wrong
    under skewed calibration (a weak-label classifier can score every
    probability low — the data_selection example's lesson), and a
    percentile THRESHOLD computed then re-applied double-counts ties.
    Order is (round6(score) DESC, tie_col ASC): rounding first keeps
    the rank replay-exact across engines, the tie column makes it
    total.

    Scale shape: one count action sizes k, then the engine's standard
    two-phase top-k — each partition prunes to its local k before the
    single-task global rank, so no task ever sorts the corpus (the
    global-window ``percent_rank`` form this replaces plans ONE
    partition for the whole relation). Returns the kept rows plus
    their 1-based ``rank`` (the input must not already carry a
    ``rank`` column — it is the operator's output contract).

    Determinism contract: the count action and the rank pass evaluate
    the input lineage TWICE, so ``df`` must be deterministic (every
    repo source is; checkpoint/persist a nondeterministic upstream —
    e.g. a fresh unseeded sample — before calling, or the two
    evaluations can disagree on n).
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"top_fraction: frac must be in (0, 1], got {frac}")
    if "rank" in df.columns:
        raise ValueError("top_fraction: input already has a 'rank' column")
    n = df.count()
    if n == 0:
        return df.withColumn("rank", F.lit(0).cast("int")).limit(0)
    import math

    k = max(1, math.ceil(frac * n))
    order = [
        (F.round(F.col(score_col), 6) + F.lit(0.0)).desc(),
        F.col(tie_col).asc(),
    ]
    # collision-safe temp names: the input schema is caller-controlled
    split_c, lr_c = "__tf_split", "__tf_local_rank"
    local_w = Window.partitionBy(split_c).orderBy(*order)
    survivors = (
        df.withColumn(split_c, F.spark_partition_id())
        .withColumn(lr_c, F.row_number().over(local_w))
        .where(F.col(lr_c) <= k)
    )
    w = Window.orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .drop(split_c, lr_c)
    )


def packing_efficiency(
    docs: DataFrame, seq_lens: tuple = (128, 256, 512)
) -> DataFrame:
    """Padding-waste planning report for :func:`pack_sequences`: for
    each candidate sequence length L, the token budget a NAIVE
    one-doc-per-sequence layout would spend — ``n_sequences = Σ
    ceil(n_tokens/L)``, ``padded = n_sequences·L − Σ n_tokens``, and
    the waste fraction — the number a curator reads to pick L (and to
    quantify what greedy packing then claws back).

    One token-count projection, a broadcast cross join with the tiny
    seq_len relation, one aggregate — no shuffle wider than
    |seq_lens| × partitions. Token counts use the shared whitespace
    tokenizer, matching ``pack_sequences``.
    """
    if not seq_lens or any(int(x) < 1 for x in seq_lens):
        raise ValueError(f"packing_efficiency: seq_lens must be >= 1, got {seq_lens}")
    spark = docs.sparkSession
    ls = spark.createDataFrame(
        [(int(x),) for x in sorted(set(int(x) for x in seq_lens))],
        "seq_len int",
    )
    toks = docs.select(F.size(tokens_col("text")).alias("n_tokens"))
    per = toks.crossJoin(F.broadcast(ls)).select(
        "seq_len",
        "n_tokens",
        F.ceil(F.col("n_tokens") / F.col("seq_len")).cast("long").alias("n_seq"),
    )
    return (
        per.groupBy("seq_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_seq").alias("n_sequences"),
            (F.sum(F.col("n_seq") * F.col("seq_len")) - F.sum("n_tokens")).alias(
                "padded_tokens"
            ),
        )
        .select(
            "seq_len",
            "n_docs",
            "total_tokens",
            "n_sequences",
            "padded_tokens",
            (
                F.round(
                    F.col("padded_tokens")
                    / (F.col("padded_tokens") + F.col("total_tokens")),
                    6,
                )
                + F.lit(0.0)
            ).alias("waste_frac"),
        )
    )


def select_within_token_budget(
    docs: DataFrame,
    budget: int,
    score_col: str | None = None,
    text_col: str = "text",
    tie_col: str = "doc_id",
) -> DataFrame:
    """Greedy quality-first selection under a token budget: order docs by
    ``(round6(score) DESC, tie_col ASC)`` (by ``tie_col`` alone when
    ``score_col`` is None — a FIFO budget cut) and keep the maximal
    prefix whose cumulative token count stays ``<= budget`` — "give me
    the best N-billion-token subset", the selection every
    fixed-compute training run makes after scoring.

    Complement of :func:`budget_select`, not a duplicate: that operator
    fills per-group budgets in RANDOM (md5-key) order, which admits the
    bucket-histogram shortcut because md5 keys are uniform — a
    quality-ordered prefix cannot use it (score distributions are
    arbitrary), so this one pays one range exchange instead.

    Keep rule is strict prefix arithmetic: a doc is kept iff the
    cumulative token sum INCLUDING it is within budget; the first doc
    over the line is dropped and so is everything after it (no
    skip-and-backfill — that would be knapsack, not a prefix, and its
    output would depend on traversal order).

    Returns the kept rows as ``(doc_id, n_tokens, sel_rank,
    cum_tokens)``; join back to the corpus on ``doc_id`` for payloads.

    Scale shape (the distributed prefix-sum pattern): the slim
    ``(tie, score, n_tokens)`` projection is range-partitioned on the
    selection order and localCheckpointed (ONE materialization — both
    phases below read it, so the sampled range boundaries can never
    disagree between them); phase A aggregates per-partition token
    totals and row counts (one tiny P-row collect) into broadcast
    prefix offsets; phase B computes partition-LOCAL cumulative sums
    (window keyed on the partition id) and adds the offset. No task
    ever sorts or scans more than its range slice, and nothing
    corpus-sized is collected — the single-partition global-window
    cumsum this replaces is the same trap ``top_fraction`` documents.
    At 100 TB the checkpointed projection is ~24 bytes/doc of
    executor-local disk; swap localCheckpoint for a persisted table if
    the job graph needs it durable.
    """
    if budget < 0:
        raise ValueError(f"select_within_token_budget: budget must be >= 0, got {budget}")
    slim = docs.select(
        F.col(tie_col).alias("doc_id"),
        *([F.col(score_col).alias("_score")] if score_col is not None else []),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    order = (
        [
            (F.round(F.col("_score"), 6) + F.lit(0.0)).desc(),
            F.col("doc_id").asc(),
        ]
        if score_col is not None
        else [F.col("doc_id").asc()]
    )
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    ranked = (
        slim.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # phase A: per-range-slice totals -> broadcast prefix offsets (P rows)
    totals = {
        int(r._pid): (int(r.tok), int(r.cnt))
        for r in ranked.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("cnt"))
        .collect()
    }
    tok_off, cnt_off, t_acc, c_acc = {}, {}, 0, 0
    for pid in sorted(totals):
        tok_off[pid], cnt_off[pid] = t_acc, c_acc
        t_acc += totals[pid][0]
        c_acc += totals[pid][1]
    spark = docs.sparkSession
    off = F.broadcast(
        spark.createDataFrame(
            [(p, tok_off[p], cnt_off[p]) for p in sorted(totals)],
            "_pid int, _tok_off long, _cnt_off long",
        )
    )
    # phase B: partition-local running sums + the broadcast offset
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranked.join(off, "_pid")
        .select(
            "doc_id",
            "n_tokens",
            (F.count("*").over(w) + F.col("_cnt_off")).cast("long").alias("sel_rank"),
            (F.sum("n_tokens").over(w) + F.col("_tok_off")).alias("cum_tokens"),
        )
        .where(F.col("cum_tokens") <= budget)
    )
