"""Sink round-trips: partitioned write, bucketed series layout."""

from __future__ import annotations

from ccm_spark.config import CCMConfig
from ccm_spark.fastpath import ccm_apply_in_pandas, ccm_fast_iterated
from ccm_spark.generators import coupled_series, pairs_to_pdf
from ccm_spark.sources.sinks import (
    checksum,
    read_series_bucketed,
    write_partitioned,
    write_series_bucketed,
)
from ccm_spark.sources.tables import load_table


def test_write_partitioned_roundtrip(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.select("lang").distinct().toPandas()["lang"]) == set(
        docs.select("lang").distinct().toPandas()["lang"]
    )
    assert checksum(back.select("doc_id", "text")) == checksum(docs.select("doc_id", "text"))


def test_write_partitioned_files_per_partition(spark, sf_small, tmp_path):
    """files_per_partition > 1 must actually split a directory into multiple
    files (the salt on the repartition keys), and stay content-identical."""
    import glob

    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "docs_split")
    write_partitioned(docs, out, partition_by=["lang"], files_per_partition=3)
    lang_dirs = glob.glob(f"{out}/lang=*")
    assert lang_dirs
    per_dir = [len(glob.glob(f"{d}/*.parquet")) for d in lang_dirs]
    assert max(per_dir) > 1  # the knob has an effect...
    assert max(per_dir) <= 3  # ...and respects the bound
    back = spark.read.parquet(out)
    assert checksum(back.select("doc_id", "text")) == checksum(docs.select("doc_id", "text"))


def test_bucketed_series_feeds_shuffle_free_fastpath(spark, tmp_path):
    pairs = []
    for pid in range(4):
        x, y = coupled_series(length=60, coupling=0.2, noise_level=0.02, seed=pid)
        pairs.append((pid, x, y))
    series = spark.createDataFrame(pairs_to_pdf(pairs))
    out = str(tmp_path / "series_bucketed")
    write_series_bucketed(series, out, num_buckets=4)

    back = read_series_bucketed(spark, out)
    cfg = CCMConfig(num_samples=3, lib_sizes=[20, 40], seed=5)
    via_group = {
        (r.pair_id, r.direction, r.lib_size): r.correlation
        for r in ccm_apply_in_pandas(series, cfg).collect()
    }
    via_bucketed = {
        (r.pair_id, r.direction, r.lib_size): r.correlation
        for r in ccm_fast_iterated(back, cfg).collect()
    }
    assert via_group == via_bucketed


def test_write_training_shards_manifest_and_order(spark, sf_small, tmp_path):
    """Shards + manifest: totals match the corpus, each shard dir holds
    one file, and (shard, global_pos) order replays the md5 permutation."""
    import glob
    import json

    import duckdb
    import pyspark.sql.functions as F

    from ccm_spark.sources.sinks import write_training_shards
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, n_shards=5, seed="ep1")
    assert manifest["n_docs"] == docs.count()
    want_tokens = docs.select(
        F.sum(F.size(F.filter(F.split(F.lower("text"), "[ \\t\\n\\x0b\\f\\r]+"), lambda t: t != "")))
    ).collect()[0][0]
    assert manifest["n_tokens"] == want_tokens
    assert manifest["n_shards"] == 5
    on_disk = json.load(open(path + "/_manifest.json"))
    assert on_disk == manifest
    # positions tile 0..N-1 across shards in shard order
    edges = [(s["min_pos"], s["max_pos"]) for s in manifest["shards"]]
    assert edges[0][0] == 0 and edges[-1][1] == manifest["n_docs"] - 1
    for (_, hi), (lo, _) in zip(edges, edges[1:]):
        assert lo == hi + 1
    for s in manifest["shards"]:
        files = glob.glob(f"{path}/shard={s['shard']}/*.parquet")
        assert len(files) == 1
    # reading back in (shard, global_pos) order replays the permutation
    back = spark.read.parquet(path)
    got = [
        r.doc_id for r in back.orderBy("shard", "global_pos").select("doc_id").collect()
    ]
    want = [
        int(d)
        for (d,) in duckdb.sql(
            f"""
SELECT doc_id FROM read_parquet('{sf_small}/documents.parquet')
ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf:ep1'), 1, 15)) AS BIGINT), doc_id
"""
        ).fetchall()
    ]
    assert got == want


def test_read_training_shards_resume_prunes_and_completes(spark, sf_small, tmp_path):
    """Resume from a mid-epoch position: exactly the rows at
    global_pos >= start come back, the below-start shards are pruned at
    the PARTITION level (plan shows the shard predicate), and
    start_pos=0 reproduces the full epoch."""
    from ccm_spark.sources.sinks import read_training_shards, write_training_shards
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "shards_resume")
    manifest = write_training_shards(docs, path, n_shards=4, seed="ep1")
    n = manifest["n_docs"]

    m2, full = read_training_shards(spark, path)
    assert m2 == manifest
    assert sorted(r.global_pos for r in full.select("global_pos").collect()) == list(range(n))

    # resume from inside the THIRD shard: shards 0-1 pruned
    start = manifest["shards"][2]["min_pos"] + 3
    _, resumed = read_training_shards(spark, path, start_pos=start)
    got = sorted(r.global_pos for r in resumed.select("global_pos").collect())
    assert got == list(range(start, n))
    plan = resumed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan
