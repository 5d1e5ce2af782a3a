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


def test_ivf_index_roundtrip_probe_matches_in_session(spark, sf_small, tmp_path):
    """Persist trained IVF centroids, reload, probe: the loaded-index
    ivf_topk must match the in-session build row-for-row (the embedding
    side's dedup_against_index story — r6 verdict missing #3)."""
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.similarity import ivf_kmeans_centroids, ivf_topk
    from ccm_spark.sources.sinks import read_ivf_index, write_ivf_index

    embs = load_table(spark, sf_small, "embeddings")
    cents = ivf_kmeans_centroids(embs, stride=40, n_iters=2)
    path = str(tmp_path / "ivf_idx")
    manifest = write_ivf_index(cents, path, params={"stride": 40, "n_iters": 2})
    assert manifest["kind"] == "ivf_centroids" and manifest["params"]["stride"] == 40

    m2, loaded = read_ivf_index(spark, path)
    assert m2 == manifest
    in_session = sorted(
        (r.query_id, r.rank, r.target_id, r.cos_sim)
        for r in ivf_topk(
            embs, n_queries=20, k=5, centroids=F.broadcast(cents)
        ).collect()
    )
    from_disk = sorted(
        (r.query_id, r.rank, r.target_id, r.cos_sim)
        for r in ivf_topk(
            embs, n_queries=20, k=5, centroids=F.broadcast(loaded)
        ).collect()
    )
    assert from_disk == in_session and len(from_disk) == 100


def test_pq_codebooks_roundtrip_bit_exact(spark, sf_small, tmp_path):
    """Codebooks reload float64-bit-exact, so a loaded index encodes
    identically to the in-session build."""
    import numpy as np

    from ccm_spark.pipeline.similarity import pq_codebooks, pq_encode
    from ccm_spark.sources.sinks import read_pq_codebooks, write_pq_codebooks

    embs = load_table(spark, sf_small, "embeddings")
    books = pq_codebooks(embs, m=4, ksub=16, train_stride=7)
    path = str(tmp_path / "pq_idx")
    manifest = write_pq_codebooks(books, path, params={"train_stride": 7})
    assert manifest["params"]["m"] == 4 and manifest["params"]["ksub"] == 16

    m2, loaded = read_pq_codebooks(spark, path)
    assert m2 == manifest
    assert len(loaded) == len(books)
    for a, b in zip(books, loaded):
        assert a.dtype == b.dtype == np.float64
        assert (a == b).all()
    codes_mem = {r.vec_id: r.codes for r in pq_encode(embs, books).collect()}
    codes_disk = {r.vec_id: r.codes for r in pq_encode(embs, loaded).collect()}
    assert codes_mem == codes_disk


def test_srp_planes_roundtrip_and_drift_guard(spark, tmp_path):
    """Planes round-trip; a manifest whose params no longer reproduce the
    stored values (generator drift) must fail loudly, and reading the
    wrong artifact kind must refuse."""
    import json
    import os

    import pytest

    from ccm_spark.pipeline.similarity import srp_plane_values
    from ccm_spark.sources.sinks import (
        read_ivf_index,
        read_srp_planes,
        write_srp_planes,
    )

    path = str(tmp_path / "srp_idx")
    manifest = write_srp_planes(path, planes=8, dim=32, seed=99)
    m2, vals = read_srp_planes(spark, path)
    assert m2 == manifest
    assert vals == sorted(srp_plane_values(8, 32, 99))
    # kind mismatch refuses
    with pytest.raises(ValueError, match="kind"):
        read_ivf_index(spark, path)
    # drift: same values, manifest claims another seed -> loud failure
    mpath = os.path.join(path, "_manifest.json")
    tampered = dict(manifest, params={**manifest["params"], "seed": 7})
    with open(mpath, "w") as f:
        json.dump(tampered, f)
    with pytest.raises(ValueError, match="drifted"):
        read_srp_planes(spark, path)


def test_bm25_index_roundtrip_serves_identical_topk(spark, sf_small, tmp_path):
    """A reloaded BM25 index must serve the exact same top-k as the
    in-session build — many query batches amortise one corpus build."""
    from ccm_spark.pipeline.search import bm25_index, bm25_topk
    from ccm_spark.sources.sinks import read_bm25_index, write_bm25_index

    docs = load_table(spark, sf_small, "documents")
    idx = bm25_index(docs)
    path = str(tmp_path / "bm25_idx")
    manifest = write_bm25_index(idx, path)
    assert manifest["params"]["n_docs"] == idx["n_docs"]

    loaded = read_bm25_index(spark, path)
    assert loaded["n_docs"] == idx["n_docs"]
    assert loaded["avgdl"] == idx["avgdl"]
    queries = ["data processing pipeline", "the spark shuffle"]
    mem = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk(idx, queries, k=10).collect()
    )
    disk = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk(loaded, queries, k=10).collect()
    )
    assert disk == mem and len(disk) == 20


def test_paa_sketches_roundtrip_and_geometry_guard(spark, tmp_path):
    """Persisted sketches serve series_topk identically to a fresh
    build; querying with the wrong segment count refuses."""
    import numpy as np
    import pandas as pd
    import pytest

    from ccm_spark.pipeline.series_search import paa_sketches, series_topk
    from ccm_spark.sources.sinks import read_paa_sketches, write_paa_sketches

    rng = np.random.default_rng(5)
    rows = []
    for sid in range(20):
        v = np.sin(np.linspace(0, 4 * np.pi, 96)) * (1 + sid / 10) + rng.normal(
            0, 0.2, 96
        )
        rows.append(pd.DataFrame({"series_id": sid, "t": range(96), "value": v}))
    series = spark.createDataFrame(
        pd.concat(rows), "series_id long, t long, value double"
    )
    sk = paa_sketches(series, segments=16)
    path = str(tmp_path / "paa_idx")
    manifest = write_paa_sketches(sk, path, segments=16)
    assert manifest["params"]["segments"] == 16 and manifest["n_rows"] == 20

    _, loaded = read_paa_sketches(spark, path, segments=16)
    q = np.sin(np.linspace(0, 4 * np.pi, 96))
    fresh = [
        (r.rank, r.series_id, r.distance)
        for r in series_topk(series, q, k=5).orderBy("rank").collect()
    ]
    served = [
        (r.rank, r.series_id, r.distance)
        for r in series_topk(series, q, k=5, sketches=loaded).orderBy("rank").collect()
    ]
    assert served == fresh
    with pytest.raises(ValueError, match="segments"):
        read_paa_sketches(spark, path, segments=8)


def test_bigram_lm_roundtrip_scores_identically(spark, sf_small, tmp_path):
    """A reloaded LM must score every document bit-identically to the
    freshly trained model — the perplexity filter can run against a
    frozen artifact across sessions."""
    from ccm_spark.pipeline.lm import perplexity, train_bigram_lm
    from ccm_spark.sources.sinks import read_bigram_lm, write_bigram_lm

    docs = load_table(spark, sf_small, "documents")
    model = train_bigram_lm(docs, vocab_size=200, max_bigrams=2000)
    path = str(tmp_path / "lm_artifact")
    manifest = write_bigram_lm(model, path)
    assert manifest["params"]["total"] == model["total"]

    loaded = read_bigram_lm(spark, path)
    assert loaded == model
    mem = {
        r.doc_id: (r.n_scored, r.cross_entropy, r.perplexity)
        for r in perplexity(docs, model).collect()
    }
    disk = {
        r.doc_id: (r.n_scored, r.cross_entropy, r.perplexity)
        for r in perplexity(docs, loaded).collect()
    }
    assert disk == mem and len(disk) == 500


def test_bpe_model_roundtrip_encodes_identically(spark, sf_small, tmp_path):
    """A reloaded BPE model (merge ORDER restored from the explicit rank
    column) must encode every document identically to the in-session
    model."""
    from ccm_spark.pipeline.tokenize import bpe_encode, train_bpe
    from ccm_spark.sources.sinks import read_bpe_model, write_bpe_model

    docs = load_table(spark, sf_small, "documents").limit(60)
    model = train_bpe(docs, n_merges=150)
    path = str(tmp_path / "bpe_model")
    manifest = write_bpe_model(model, path)
    assert manifest["params"]["n_merges"] == len(model["merges"])

    loaded = read_bpe_model(spark, path)
    assert loaded["merges"] == model["merges"]
    assert loaded["vocab"] == model["vocab"]
    mem = {
        r.doc_id: (tuple(r.pieces), tuple(r.piece_ids))
        for r in bpe_encode(docs, model).collect()
    }
    disk = {
        r.doc_id: (tuple(r.pieces), tuple(r.piece_ids))
        for r in bpe_encode(docs, loaded).collect()
    }
    assert disk == mem and len(disk) == 60


def test_unigram_model_round_trip_serves_identically(spark, tmp_path):
    from ccm_spark.pipeline.tokenize import train_unigram, unigram_encode
    from ccm_spark.sources.sinks import read_unigram_model, write_unigram_model

    docs = spark.createDataFrame(
        [(i, "abab abab ababab xy") for i in range(20)],
        "doc_id long, text string",
    )
    model = train_unigram(docs, vocab_size=8, n_em_iters=2)
    write_unigram_model(model, str(tmp_path / "uni"))
    loaded = read_unigram_model(spark, str(tmp_path / "uni"))
    assert loaded["pieces"] == model["pieces"]  # float64 bit-exact
    assert loaded["max_piece_len"] == model["max_piece_len"]
    a = {
        r.doc_id: (tuple(r.pieces), tuple(r.piece_ids))
        for r in unigram_encode(docs, model).collect()
    }
    b = {
        r.doc_id: (tuple(r.pieces), tuple(r.piece_ids))
        for r in unigram_encode(docs, loaded).collect()
    }
    assert a == b


def test_corpus_sketches_round_trip(spark, tmp_path):
    """The sketch-trio artifact: one directory + manifest per snapshot;
    the reloaded relations must equal the in-session builds exactly
    (bit-exact for CMS/bottom-k; the HLL binary round-trips through
    parquet and re-estimates identically)."""
    import pytest

    from ccm_spark.pipeline.sketches import bottomk_build, cms_build, token_hll
    from ccm_spark.sources.sinks import (
        read_corpus_sketches,
        write_corpus_sketches,
    )

    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, f"alpha tok{i} beta", "web") for i in range(300)],
        "doc_id long, text string, source string",
    ).withColumn("doc_len", F.length("text"))
    path = str(tmp_path / "sk")
    man = write_corpus_sketches(
        path,
        hll=token_hll(docs, by=None),
        cms=cms_build(docs),
        bottomk=bottomk_build(docs, "doc_len", k=64),
        params={"day": "2026-08-15"},
    )
    assert man["kind"] == "corpus_sketches"
    assert set(man["members"]) == {"hll", "cms", "bottomk"}
    got_man, sk = read_corpus_sketches(spark, path)
    assert got_man["params"] == {"day": "2026-08-15"}
    assert sorted(map(tuple, sk["cms"].collect())) == sorted(
        map(tuple, cms_build(docs).collect())
    )
    assert sorted(map(tuple, sk["bottomk"].collect())) == sorted(
        map(tuple, bottomk_build(docs, "doc_len", k=64).collect())
    )
    reloaded = sk["hll"].collect()[0]
    fresh = token_hll(docs, by=None).collect()[0]
    assert reloaded.distinct_tokens_est == fresh.distinct_tokens_est
    assert reloaded.distinct_docs_est == fresh.distinct_docs_est

    with pytest.raises(ValueError, match="at least one"):
        write_corpus_sketches(str(tmp_path / "empty"))
