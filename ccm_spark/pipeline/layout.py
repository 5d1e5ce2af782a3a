"""Z-order data layout — multi-column data skipping for 100 TB scans.

The reference has no storage layer (SURVEY.md §2.1); this is extension
surface for the lakehouse side of the pipeline: parquet/ORC readers
prune files and row groups by min/max column statistics, but those
statistics only help for columns the data is SORTED by. Sorting by one
column destroys locality in every other; interleaving the bits of
several columns' rank buckets (a Z-/Morton curve) gives every
interleaved column tight per-file ranges at once — the layout trick
behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, built here from plain
DataFrame ops.

How it scales:
  - bucket boundaries come from one ``approxQuantile`` pass (driver
    holds 2^bits boundaries per column — KBs);
  - bucketing + bit interleaving are pure codegen (a higher-order
    filter over a literal boundary array, then shift/or folds);
  - the only shuffle is the ``repartitionByRange`` on the z-value that
    any layout rewrite needs, followed by an in-partition sort;
  - correctness of the curve is partitioning-independent (tests pin the
    interleave against a pure-Python replay), and skipping quality is
    measured honestly: the tests read the written parquet footers and
    assert per-file min/max spreads shrink vs an unordered write.

Caveats stated plainly: quantile bucketing makes the curve
rank-ordered, not value-ordered (ties and skew collapse into one
bucket — which is exactly what you want for skipping); files ≈ z-range
segments, so pruning quality degrades gracefully as query predicates
drift from the z-ordered columns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: bits per dimension: 2^8 rank buckets per column is plenty for
#: file-level skipping (files >> buckets) while keeping the literal
#: boundary arrays small
ZORDER_BITS = 8


def _bucket(col: Column, boundaries: list[float]) -> Column:
    """Rank bucket of ``col`` in [0, len(boundaries)]: the number of
    boundaries <= value — one higher-order filter over a literal array,
    no UDF. NULLs land in bucket 0 (they carry no skipping power)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    # strictly-below count: the minimum value lands in bucket 0 and the
    # top of the range in bucket len(boundaries) — the full [0, 2^bits)
    # span, no wasted codes
    return F.when(col.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(arr, lambda b: b < col.cast("double")))
    )


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * n_cols + j — a shift/or fold, all codegen."""
    n = len(buckets)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def py_zorder(bucket_values: list[int], bits: int = ZORDER_BITS) -> int:
    """Pure-Python replay of the interleave for the tests' oracle."""
    z = 0
    for i in range(bits):
        for j, b in enumerate(bucket_values):
            z |= ((b >> i) & 1) << (i * len(bucket_values) + j)
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = ZORDER_BITS,
    bounds: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Adds ``_z`` (the Morton key over the columns' rank buckets) and
    returns the per-column boundaries used. Pass ``bounds`` (from a
    previous call, or reloaded via ``sources.sinks.read_zorder_bounds``)
    to key an INCREMENT onto the same curve as the base data — the
    bucketing is then a pure projection, no quantile pass. Fresh
    boundaries come from one approxQuantile pass per column (sketch
    error 1/8 bucket width so adjacent buckets cannot merge)."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key: 1-4 columns (the curve degrades beyond)")
    if bits * len(cols) > 62:
        raise ValueError("zorder_key: bits * n_cols must fit a long")
    n_buckets = 1 << bits
    if bounds is None:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = {
            c: df.approxQuantile(c, probs, 1.0 / (n_buckets * 8)) for c in cols
        }
    else:
        missing = [c for c in cols if c not in bounds]
        if missing or any(len(bounds[c]) != n_buckets - 1 for c in cols):
            raise ValueError(
                f"zorder_key: bounds do not define a {n_buckets}-bucket curve "
                f"for columns {cols} (missing: {missing})"
            )
    buckets = [_bucket(F.col(c), bounds[c]) for c in cols]
    return df.withColumn("_z", _interleave(buckets, bits)), bounds


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = ZORDER_BITS,
    n_files: int = 16,
) -> dict:
    """Rewrite ``df`` as ``n_files`` parquet files laid out along the
    Z-curve of ``cols``: range-partition on the key (contiguous curve
    segments per file), sort within partitions, drop the key, write.
    Returns the bucket boundaries (the curve's reusable definition)."""
    keyed, bounds = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds


def plan_compaction(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    path_col: str = "path",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Small-file compaction planner over a file manifest — the
    OPTIMIZE/rewrite-data-files decision every lakehouse table needs
    after streaming or fine-grained ingest (a 100 TB table written by
    1000 executors accumulates millions of KB-files; scans then pay
    per-file open cost and lose row-group pruning).

    Input: one row per data file ``(partition, path, size_bytes)``.
    Output: the same rows plus the merge-task assignment —
    ``(task_id, task_files, task_bytes, compact)``:

    - files already >= ``target_bytes`` are well-sized: ``task_id=-1``,
      ``compact=false`` (never rewritten, never grouped);
    - small files are packed per table partition in PATH order
      (deterministic, locality-preserving) by the relational
      prefix-bucket rule — ``task = cum_small_bytes_before DIV
      target_bytes`` (the chunk_by_sentences/select_within_token_budget
      pattern): each task's total stays < target + its last file, and
      no sequential driver loop ever sees the manifest;
    - a task that ends up holding ONE small file is a no-op rewrite:
      ``compact=false`` (boundary-split adjacency means the rule can
      strand a singleton where greedy would not — documented
      approximation, bounded by one task per partition boundary).

    100 TB shape: the manifest relation (millions of rows, three
    narrow columns) shuffles ONCE on hash(partition); both windows
    (running sum, task stats) and the bucket arithmetic reuse that
    clustering — no second exchange, no collect, no global sort.
    """
    if target_bytes < 1:
        raise ValueError(
            f"plan_compaction: target_bytes must be >= 1, got {target_bytes}"
        )
    small = F.col("size_bytes") < target_bytes
    w_before = (
        Window.partitionBy("partition")
        .orderBy("path")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = (
        files.select(
            F.col(partition_col).alias("partition"),
            F.col(path_col).alias("path"),
            F.col(size_col).cast("long").alias("size_bytes"),
        )
        .withColumn(
            "_cum_before",
            F.coalesce(
                F.sum(F.when(small, F.col("size_bytes")).otherwise(0)).over(
                    w_before
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "task_id",
            F.when(small, F.expr(f"_cum_before DIV {target_bytes}")).otherwise(
                F.lit(-1).cast("long")
            ),
        )
    )
    w_task = Window.partitionBy("partition", "task_id")
    return base.select(
        "partition",
        "path",
        "size_bytes",
        "task_id",
        F.when(small, F.count("*").over(w_task))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("task_files"),
        F.when(small, F.sum("size_bytes").over(w_task))
        .otherwise(F.col("size_bytes"))
        .cast("long")
        .alias("task_bytes"),
        (small & (F.count("*").over(w_task) >= 2)).alias("compact"),
    )


#: canonicalises a URI for the file-tag JOIN ONLY ("file:///x",
#: "file:/x" -> "/x"): manifest paths and input_file_name render the
#: same file with different slash counts, so BOTH sides pass through
#: this before comparing. Never use the stripped form to READ a file —
#: it drops the scheme/authority a non-local filesystem needs.
_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:/+"


def file_manifest(spark, root: str) -> DataFrame:
    """List a table directory into the ``(partition, path, size_bytes)``
    manifest :func:`plan_compaction` consumes — one row per DATA file
    (bookkeeping files like ``_SUCCESS``/dotfiles are skipped), with
    ``partition`` = the file's directory relative to ``root`` ('' for
    files directly under it), so Hive-style ``k=v`` subdirectories
    group naturally. ``path`` is the fully-QUALIFIED Hadoop URI
    (``file:/...``, ``hdfs://nn/...``, ``s3a://bucket/...``) so a
    downstream read resolves on the right filesystem, not the default
    one.

    Listing runs driver-side through the Hadoop FileSystem API (works
    for local paths, HDFS, and object stores alike) — the same
    metadata-proportional cost every table-maintenance engine pays to
    build a rewrite job; production tables with transaction logs
    (Delta/Iceberg) read the manifest from the log instead and feed it
    to plan_compaction directly."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    root_str = fs.makeQualified(jpath).toString().rstrip("/")
    rows = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()  # already qualified by the FS
        name = p.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")):
            continue
        rel_dir = p[len(root_str):].lstrip("/").rsplit("/", 1)
        partition = rel_dir[0] if len(rel_dir) == 2 else ""
        rows.append((partition, p, int(st.getLen())))
    return spark.createDataFrame(
        sorted(rows), "partition string, path string, size_bytes long"
    )


def compact_files(spark, plan: DataFrame, out_dir: str) -> dict:
    """Execute a :func:`plan_compaction` plan — the act half of the
    plan→act pair (the salted_join discipline: the planner's verdict
    applied, not just reported). Every ``compact=true`` task's files
    are rewritten as ONE parquet file under
    ``out_dir/_part=<partition>/_task=<id>/``; well-sized files and
    stranded singletons are left in place (the plan already marked
    them no-ops).

    Spark-first execution: the compactable files are read as one
    DataFrame, each row tagged with its merge task by a BROADCAST
    (path → task) join on ``input_file_name()`` (both sides pass
    to one normalised key: both sides scheme-stripped, and the scan
    side additionally percent-decoded —
    ``input_file_name`` renders a URI-ENCODED path, e.g. a space
    becomes ``%20``, while the Hadoop manifest path is unencoded, so
    an encoded-vs-raw mismatch would silently drop every row of a
    file with a special character in its name; the join coverage is
    also ASSERTED against the manifest before the write, so any
    residual normalisation gap fails loudly instead of losing data),
    then
    ``repartition(partition, task)`` hashes every task's rows onto
    exactly one shuffle partition so the partitioned write emits
    exactly one data file per task directory — no driver loop over
    tasks, no per-task job. The one ``collect()`` is the rewrite
    manifest itself (path + task per compactable file) — bounded by
    the maintenance batch, the same driver-side task list every
    OPTIMIZE implementation materialises; corpus BYTES never visit
    the driver.

    Returns ``{"n_tasks", "n_files_in", "bytes_in"}``."""
    todo = plan.where("compact").select(
        "partition", "task_id", "path", "size_bytes"
    ).collect()
    if not todo:
        return {"n_tasks": 0, "n_files_in": 0, "bytes_in": 0}
    import re

    # reads use the manifest's QUALIFIED URIs; only the join key is
    # canonicalised: scheme stripped ('file:///x' vs 'file:/x' — same
    # file, different slash count), and the SCAN side percent-decoded,
    # because input_file_name renders the URI-ENCODED path (space ->
    # %20) while the Hadoop manifest is raw. The manifest side stays
    # RAW deliberately: one decode of the encoded rendering always
    # lands back on the raw path — including a literal %XX in a file
    # name, which input_file_name double-encodes (%2520) so the single
    # decode recovers the literal — whereas decoding the manifest too
    # would over-decode exactly that case and spuriously refuse a
    # valid plan.
    mapping = [
        (re.sub(_SCHEME_RE, "/", r.path), r.partition, r.task_id)
        for r in todo
    ]
    tag = spark.createDataFrame(
        mapping, "_norm string, _part string, _task long"
    )
    # literal '+' is NOT form-encoded by a URI path, but url_decode
    # would eat it as a space — protect it before decoding
    norm_key = F.url_decode(
        F.regexp_replace(
            F.regexp_replace(F.input_file_name(), _SCHEME_RE, "/"),
            r"\+",
            "%2B",
        )
    )
    planned = {m[0] for m in mapping}
    if len(planned) != len(mapping):
        # two distinct manifest paths decoding to one key would
        # DUPLICATE their rows through the tag join — refuse
        raise RuntimeError(
            "compact_files: normalisation collision — two planned paths "
            "share a join key after scheme-strip"
        )
    raw = spark.read.parquet(*[r.path for r in todo])
    # invariant BEFORE the rewrite: every file the scan yields rows
    # for must resolve to a planned key — an inner join that silently
    # dropped a file's rows is data loss, so fail loudly instead.
    # (A planned file ABSENT from the scan keys is a zero-row file:
    # nothing to lose, not an error.) Cost: one column-pruned pass
    # collecting <= len(todo) distinct file names.
    seen = {
        r[0] for r in raw.select(norm_key.alias("_norm")).distinct().collect()
    }
    if seen - planned:
        raise RuntimeError(
            "compact_files: tag-join coverage mismatch — scanned files "
            f"that resolve to no planned key (their rows would be "
            f"silently dropped): {sorted(seen - planned)[:3]} "
            f"(of {len(planned)} planned / {len(seen)} seen)"
        )
    data = (
        raw.withColumn("_norm", norm_key)
        .join(F.broadcast(tag), "_norm")
        .drop("_norm")
    )
    n_tasks = len({(p, t) for _, p, t in mapping})
    (
        data.repartition(max(1, n_tasks), "_part", "_task")
        .write.partitionBy("_part", "_task")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return {
        "n_tasks": n_tasks,
        "n_files_in": len(todo),
        # already on the driver — a second Spark job would re-run the
        # plan's window lineage just to recompute this sum
        "bytes_in": int(sum(r.size_bytes for r in todo)),
    }


def compact_roundtrip(
    spark,
    docs: DataFrame,
    n_shards: int = 4,
    tmp_prefix: str = "ccm_compact_rt_",
) -> DataFrame:
    """Hash-grade end-to-end exercise of the plan→act pair (staged r16
    gate candidate, QUERIES.md): write ``docs`` as a fragmented
    Hive-partitioned table (``p = doc_id % 3``, ``n_shards`` hash
    shards per partition), manifest it, plan with an effectively
    infinite target so EVERY file is compactable and every partition
    collapses to ONE merge task, execute the rewrite, and return the
    compacted tree read back as ``(partition, doc_id, text_md5)``.

    The returned relation is twin-checkable WITHOUT any file-size
    knowledge — by construction it must equal, as a multiset,
    ``('p=' || doc_id % 3, doc_id, md5(coalesce(text, '')))`` over the
    input — so a cross-engine hash certifies the full
    manifest → plan → tag-join → rewrite chain loses nothing,
    duplicates nothing, and lands every row in its planned partition
    (the row-preservation property the r14 executor only
    assert-checked). A partition that fragments into a single file
    would be a silent no-op rewrite, so the fixture refuses it loudly
    instead of passing vacuously. The tree is localCheckpointed and
    the temp table removed before returning.
    """
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=tmp_prefix)
    try:
        tbl = f"{d}/tbl"
        out = f"{d}/out"
        (
            docs.select(
                "doc_id", "text", (F.col("doc_id") % 3).alias("p")
            )
            .repartition(n_shards, "doc_id")
            .write.partitionBy("p")
            .parquet(tbl)
        )
        plan = plan_compaction(
            file_manifest(spark, tbl), target_bytes=2**40
        ).localCheckpoint(eager=True)
        stranded = plan.where("NOT compact").count()
        if stranded:
            raise RuntimeError(
                f"compact_roundtrip: {stranded} file(s) not compactable "
                "(single-file partition?) — the roundtrip hash would be "
                "vacuous; use more input rows or fewer shards"
            )
        compact_files(spark, plan, out)
        back = spark.read.parquet(out).select(
            F.col("_part").alias("partition"),
            "doc_id",
            F.md5(
                F.coalesce(F.col("text"), F.lit("")).cast("binary")
            ).alias("text_md5"),
        )
        return back.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
