"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The headline set covers every operator family: the full bidirectional CCM
sweep (the reference's whole surface in one plan), each dedup family,
similarity search, and the text-analysis pipeline. Results are forced with
a cheap count() so timing measures the plan execution, not driver
serialisation of big collects.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ccm_spark import entry as E  # noqa: E402
from ccm_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "ccm_bidirectional",
    "ccm_bidirectional_fast",
    "ccm_knn",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "dedup_embedding",
    "text_token_stats",
    "text_quality",
    "text_fingerprint",
    "text_langid",
    "multimodal_features",
    "events_asof_join",
    "events_sessionize",
    "events_hourly_stats",
    "pricing_summary",
    "top_customers_by_nation",
]


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - platform without getloadavg
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_before = _loadavg()
    # loadavg gate (r08 judge): BENCH_r08 started at loadavg 8.36/32 and
    # its totals diverged +11% from the quiet-host run of identical code.
    # Wait (bounded) for the 1-min load to fall below the threshold so
    # the bench measures the engine, not the neighbours; if the host
    # never quiets down, run anyway but flag it in the JSON.
    LOAD_GATE = 2.0
    LOAD_GATE_MAX_WAIT = 300.0
    load_wait = 0.0
    while load_wait < LOAD_GATE_MAX_WAIT:
        la = _loadavg()
        if not la or la[0] <= LOAD_GATE:
            break
        print(
            f"# loadavg {la[0]} > {LOAD_GATE}, waiting ({load_wait:.0f}s)...",
            file=sys.stderr,
        )
        time.sleep(15)
        load_wait += 15
    load_at_start = _loadavg()
    load_warning = bool(load_at_start and load_at_start[0] > LOAD_GATE)
    spark = get_spark("ccm_spark-bench")
    qs = E.queries()

    # untimed warmup: spin up the JVM stages and the Python worker pool so
    # per-query numbers measure steady-state execution, not process forks
    # and cold numpy/pandas imports in 32 workers
    import pandas as pd  # noqa: F401

    warm = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    )
    warm.mapInPandas(lambda it: it, schema="id long").count()
    warm.groupBy((warm.id % 4).alias("k")).count().count()

    # fleet benchmark: 64 independent pairs through the applyInPandas fast
    # path — the many-series scale story (one shuffle, numpy per pair)
    from ccm_spark.config import CCMConfig
    from ccm_spark.fastpath import ccm_apply_in_pandas
    from ccm_spark.generators import generate_grid_df

    def fleet_query(spark, sf_dir):
        grid = [
            {"pair_id": i, "kind": "g2", "length": 300, "coupling": 0.1 * (i % 5)}
            for i in range(64)
        ]
        return ccm_apply_in_pandas(
            generate_grid_df(spark, grid), CCMConfig(num_samples=20, seed=7)
        )

    # bench-only queries: dropped from the gated registry (the 50-entry
    # driver window) but kept here under the same names/semantics so
    # per-query timings stay comparable across rounds
    def bidir_fast_query(spark, sf_dir):
        return ccm_apply_in_pandas(E._series(spark, sf_dir), E._config())

    def knn_query(spark, sf_dir, lib_size=80, sample_id=0):
        import pyspark.sql.functions as F
        from pyspark.storagelevel import StorageLevel

        from ccm_spark.operators.embedding import embed_bidirectional
        from ccm_spark.operators.knn import knn_candidates, top_k_neighbors
        from ccm_spark.operators.sampling import fan_out_with_rank
        from ccm_spark.plans.oracle_sql import PARAMS

        series = E._series(spark, sf_dir)
        emb = embed_bidirectional(series, PARAMS.embedding_dim, PARAMS.tau)
        explicit = spark.createDataFrame(
            [(int(ls),) for ls in PARAMS.lib_sizes], "lib_size int"
        )
        ladder = series.select("pair_id").distinct().crossJoin(explicit)
        # r16: persist the fan-out exactly as the gated sample_corr_plan
        # does — it feeds BOTH sides of the kNN self-join, and the
        # unpersisted form re-evaluated the whole fan-out chain per side
        # (interleaved A/B in OPTIMIZATION_r16.md: ~3.2 -> ~2.2 s).
        # Same rows; the bench's clearCache() drops the blocks between
        # samples, so nothing survives a timed run.
        fanned = fan_out_with_rank(
            emb, ladder, PARAMS.num_samples, PARAMS.seed
        ).persist(StorageLevel.MEMORY_AND_DISK)
        nn = top_k_neighbors(
            knn_candidates(fanned, PARAMS.embedding_dim), PARAMS.embedding_dim
        )
        return nn.where(
            (F.col("lib_size") == lib_size) & (F.col("sample_id") == sample_id)
        )

    local_queries = {
        "ccm_bidirectional_fast": bidir_fast_query,
        "ccm_knn": knn_query,
        "ccm_fleet_64x300": fleet_query,
        # rotated out of the gated registry r09 (QUERIES.md) but kept in
        # the headline set under the same name/semantics so cross-round
        # totals stay same-set comparable
        "text_fingerprint": E.q_text_fingerprint,
        # same for the r11 rotation (graph-family rows came in)
        "dedup_ngram_jaccard": E.q_dedup_ngram_jaccard,
        "events_sessionize": E.q_events_sessionize,
        # same for the r12 rotation (knn_graph_insert /
        # shipping_priority / corpus_divergence / phrase_blocklist
        # took the gate slots)
        "dedup_minhash_lsh": E.q_dedup_minhash_lsh,
        "dedup_simhash_pairs": E.q_dedup_simhash_pairs,
        "events_hourly_stats": E.q_events_hourly_stats,
        # same for the r13 rotation (knn_graph_search / chunk_documents
        # / char_entropy / hourly_anomalies took the gate slots)
        "text_langid": E.q_text_langid,
        # same for the r14 rotation (chunk_by_sentences /
        # winnow_fingerprints / plan_compaction /
        # hourly_anomalies_watermarked took the gate slots)
        "text_quality": E.q_text_quality,
        "top_customers_by_nation": E.q_top_customers_by_nation,
        # same for the r15 rotation (detect_gaps / key_skew_report /
        # local_supplier_volume / hits_hosts took the gate slots)
        "text_token_stats": E.q_text_token_stats,
        "pricing_summary": E.q_pricing_summary,
        "events_asof_join": E.q_events_asof_join,
        # same for the r16 rotation (gap_monitor / hybrid_search_rrf /
        # salted_join took the gate slots)
        "ann_cosine_topk": E.q_ann_cosine_topk,
    }

    # median of REPEATS per query, pass-interleaved so a VM-noise burst
    # (SCALE.md documents ±5x spikes) lands on different queries each pass
    # instead of poisoning one query's whole sample
    REPEATS = 3
    # sub-second queries are the most noise-fragile (one multi-second host
    # burst can poison 2 of 3 samples); give them extra interleaved passes
    # so their median stands on 5 samples instead of 3
    EXTRA_REPEATS = 2
    EXTRA_BELOW_SEC = 1.5
    # the CCM flagships carry the widest historical spreads (r07 driver
    # saw ccm_bidirectional hit 9.2 s on a 2 s plan — first-execution
    # codegen/JIT landing in the median): run each once UNTIMED before
    # the passes, and give them the 5-sample treatment below
    FLAGSHIPS = ["ccm_bidirectional", "ccm_bidirectional_fast", "ccm_fleet_64x300"]
    names = HEADLINE + ["ccm_fleet_64x300"]
    samples: dict[str, list[float]] = {n: [] for n in names}
    # r11 (VERDICT r10 #7): sample the 1-min loadavg as each query
    # finishes, so a loaded driver run is distinguishable QUERY-BY-QUERY
    # (the r10 driver run's loadavg tripled mid-run; run-level
    # before/after can't say which timings it poisoned)
    load_samples: dict[str, list[float]] = {n: [] for n in names}

    def run_pass(pass_names: list[str]) -> None:
        for name in pass_names:
            fn = local_queries.get(name) or qs[name]
            spark.catalog.clearCache()  # isolate queries: drop persisted relations
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            samples[name].append(time.time() - t0)
            la = _loadavg()
            load_samples[name].append(la[0] if la else -1.0)
            print(f"# {name}: {samples[name][-1]:.2f}s rows={n}", file=sys.stderr)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2

    for name in FLAGSHIPS:
        fn = local_queries.get(name) or qs[name]
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).count()
        print(f"# warmup {name}: {time.time() - t0:.2f}s", file=sys.stderr)

    for _ in range(REPEATS):
        run_pass(names)
    fragile = [
        n
        for n in names
        if median(samples[n]) < EXTRA_BELOW_SEC or n in FLAGSHIPS
    ]
    for _ in range(EXTRA_REPEATS):
        run_pass(fragile)

    timings = {name: round(median(xs), 3) for name, xs in samples.items()}
    total = round(sum(timings.values()), 3)

    # Families added after the headline set froze: timed ONCE each and
    # reported separately so cross-round totals stay same-set comparable
    # while new operators still get a recorded baseline.
    def extra_lm(spark, sf_dir):
        from ccm_spark.pipeline.lm import perplexity, train_bigram_lm
        from ccm_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        return perplexity(docs, train_bigram_lm(docs))

    def extra_bm25(spark, sf_dir):
        from ccm_spark.pipeline.search import bm25_topk
        from ccm_spark.sources.tables import load_table

        return bm25_topk(
            load_table(spark, sf_dir, "documents"),
            ["data processing pipeline", "the spark shuffle"],
            k=10,
        )

    def extra_line_dedup(spark, sf_dir):
        from ccm_spark.pipeline.dedup import remove_duplicated_lines
        from ccm_spark.sources.tables import load_table

        return remove_duplicated_lines(load_table(spark, sf_dir, "documents"))

    def extra_dtw(spark, sf_dir):
        # 128 smooth series x 513 points, query = a time-warped member,
        # band << period: the UCR search regime where LB_Keogh actually
        # prunes (~90% here — chaotic/noise corpora degenerate to full
        # brute-force DTW because a wiggly query's envelope covers the
        # whole z-range; the stats field reports the realised ratio).
        # The corpus persists first: a real search serves a materialised
        # relation, not three regenerations (one per search phase).
        import numpy as np
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.series_search import dtw_topk

        n, s = 513, 128
        base = spark.range(s).selectExpr("id AS series_id").crossJoin(
            spark.range(n).selectExpr("id AS t")
        )
        pi = 3.141592653589793
        series = base.select(
            "series_id",
            "t",
            (
                F.sin(
                    2 * pi * (F.col("series_id") % 4 + 1) * F.col("t") / n
                    + (F.col("series_id") % 32) * (pi / 16)
                )
                + 0.05 * F.sin(F.col("t") * 1.7 + F.col("series_id"))
            ).alias("value"),
        ).persist()
        series.count()
        v7 = np.array(
            [r.value for r in series.where("series_id = 7").orderBy("t").collect()]
        )
        warped_t = np.linspace(0, n - 1, n) ** 1.01 / ((n - 1) ** 0.01)
        q = np.interp(warped_t, np.arange(n), v7)
        stats = {}
        out = dtw_topk(series, q, k=5, band_frac=0.05, stats=stats)
        print(f"# dtw_topk prune stats: {stats}", file=sys.stderr)
        return out

    def extra_kmeans(spark, sf_dir):
        from ccm_spark.pipeline.clustering import kmeans_assign, kmeans_fit
        from ccm_spark.sources.tables import load_table

        embs = load_table(spark, sf_dir, "embeddings")
        cents = kmeans_fit(embs, k=16, n_iters=2)
        return kmeans_assign(embs, cents)

    def extra_pca(spark, sf_dir):
        from ccm_spark.pipeline.similarity import pca_fit, pca_transform
        from ccm_spark.sources.tables import load_table

        embs = load_table(spark, sf_dir, "embeddings")
        comps, mu = pca_fit(embs, out_dim=16)
        return pca_transform(embs, comps, mu)

    def extra_html(spark, sf_dir):
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.html import extract_text
        from ccm_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        # wrap the corpus in markup so the whole regex chain does real work
        wrapped = docs.select(
            "doc_id",
            F.concat(
                F.lit("<html><head><style>p{}</style></head><body>"
                      "<script>var x = 1;</script><div><p>"),
                F.regexp_replace("text", "\\. ", ".</p><p>"),
                F.lit("</p></div></body></html>"),
            ).alias("html"),
        )
        return extract_text(wrapped)

    # warc fixture synthesised OUTSIDE the timed call (the bench times
    # the engine's parse, not python gzip writes): 16 per-record-gzip
    # shards x 400 pages, ~1 KB each, 97 hosts cross-linking
    import gzip
    import tempfile

    warc_dir = tempfile.mkdtemp(prefix="bench_warc_")
    prose = ("lorem word data pipeline shard " * 24).strip()

    def _warc_rec(i: int) -> bytes:
        body = (
            f"<html><head><title>p{i}</title></head><body><p>{prose}</p>"
            f'<a href="http://h{(i * 7) % 97}.com/">next</a></body></html>'
        ).encode()
        http = (
            f"HTTP/1.1 200 X\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:r{i}>\r\n"
            f"WARC-Target-URI: http://h{i % 97}.com/p{i}\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    for sh in range(16):
        with open(os.path.join(warc_dir, f"s{sh}.warc.gz"), "wb") as f:
            f.write(
                b"".join(gzip.compress(_warc_rec(sh * 400 + i)) for i in range(400))
            )

    def extra_warc(spark, sf_dir):
        from ccm_spark.sources.warc import read_warc, warc_html_documents

        return warc_html_documents(read_warc(spark, warc_dir))

    def extra_bottomk(spark, sf_dir):
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.sketches import bottomk_build, bottomk_quantiles

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.length("text").alias("doc_len")
        )
        sk = bottomk_build(docs, "doc_len", k=256)
        return bottomk_quantiles(sk, [0.25, 0.5, 0.75, 0.95])

    def extra_pagerank(spark, sf_dir):
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.graph import pagerank

        # deterministic 20k-host graph, 8 out-edges per host via an LCG
        edges = (
            spark.range(20000 * 8)
            .select(
                (F.col("id") % 20000).cast("string").alias("src"),
                ((F.col("id") * F.lit(1103515245).cast("bigint") + 12345) % 20000)
                .cast("string")
                .alias("dst"),
                (1.0 + (F.col("id") % 3)).alias("weight"),
            )
            .filter("src != dst")
        )
        return pagerank(edges, n_iters=5)

    def extra_ivf_pq(spark, sf_dir):
        """The composed faiss-style index (IVF coarse quantizer over PQ
        codes) at PRODUCTION geometry (ksub=256, 5 Lloyd iters) — the
        gated pq_topk row runs the small gate geometry, so this extra
        carries the timing evidence for the real shape."""
        from ccm_spark.pipeline import similarity

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return similarity.ivf_pq_topk(embs, n_queries=100, k=5)

    def extra_quality_classifier(spark, sf_dir):
        """The r09-gated trainable classifier at sf scale: 3 GD
        iterations (two hash aggregates each) + the one-pass fixed-point
        serving kernel over the full documents table."""
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.classify import (
            score_quality,
            train_quality_classifier,
        )
        from ccm_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        labels = docs.select(
            "doc_id", (F.col("doc_id") % 3 == 0).cast("int").alias("label")
        )
        model = train_quality_classifier(docs, labels, dim=256, n_iters=3, lr=2.0)
        return score_quality(docs, model)

    def extra_dsir(spark, sf_dir):
        """The r09-gated DSIR chain + Gumbel top-k resampling at sf
        scale (target = doc_id%10 slice, k = 10% of the raw side)."""
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.dsir import dsir_log_weights, dsir_resample
        from ccm_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        target = docs.where(F.col("doc_id") % 10 == 0)
        raw = docs.where(F.col("doc_id") % 10 != 0)
        w = dsir_log_weights(raw, target)
        return dsir_resample(w, k=max(1, raw.count() // 10), seed=7)

    def extra_lm_kn(spark, sf_dir):
        """Kneser-Ney train + score (r09; r10 gate candidate) — timed
        next to the add-alpha lm_perplexity extra for a like-for-like
        smoothing-cost comparison."""
        from ccm_spark.pipeline.lm import perplexity, train_kn_bigram_lm
        from ccm_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        return perplexity(docs, train_kn_bigram_lm(docs))

    def extra_knn_graph(spark, sf_dir):
        """NN-descent all-corpus k-NN graph (r09): multi-table SRP seed
        + 2 bounded two-hop rounds over the sf embeddings (2 rounds
        keeps the extra's cost proportionate; the recall-vs-rounds curve
        itself is pinned in tests/test_ann_graph.py)."""
        from ccm_spark.pipeline.ann_graph import knn_graph_descent

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return knn_graph_descent(embs, k=10, n_rounds=2)

    def extra_streaming_sessionize(spark, sf_dir):
        """Micro-batch throughput of the stateful streaming sessionizer
        (applyInPandasWithState): one availableNow pass over the sf
        events shard into a memory sink. The returned relation is the
        sink table, so the harness .count() is trivial — the timed work
        is the stream itself (requested by the r07 judge so streaming
        regressions surface in BENCH like warc_parse does)."""
        import shutil
        import tempfile

        from ccm_spark.streaming.stateful import streaming_sessionize
        from ccm_spark.streaming.windows import event_stream

        d = tempfile.mkdtemp(prefix="bench_sess_stream_")
        try:
            # the warm second run re-registers the same memory-sink name
            try:
                spark.catalog.dropTempView("bench_sess_stream")
            except Exception:
                pass
            shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-0.parquet")
            q = (
                streaming_sessionize(event_stream(spark, d))
                .writeStream.format("memory")
                .queryName("bench_sess_stream")
                .outputMode("update")
                .option("checkpointLocation", f"{d}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                # a loaded-host overrun must not leave an active query
                # whose source/checkpoint dirs the finally block deletes
                # (stream-error noise + a name collision on the warm
                # second run)
                q.stop()
                raise RuntimeError(
                    "streaming_sessionize bench extra exceeded 300s"
                )
            return spark.sql("SELECT * FROM bench_sess_stream")
        finally:
            # the memory sink holds the rows; the source dir can go
            shutil.rmtree(d, ignore_errors=True)

    def extra_chunking(spark, sf_dir):
        """r12 context-window chunking at sf scale: the map-only
        corpus->training-row rewrite (64-token windows, 48 stride)."""
        from ccm_spark.pipeline.chunking import chunk_documents
        from ccm_spark.sources.tables import load_table

        return chunk_documents(
            load_table(spark, sf_dir, "documents"), max_tokens=64, stride=48
        )

    def extra_chunk_sentences(spark, sf_dir):
        """r13 sentence-bounded chunk packing at sf scale: the shared
        punctuation injection, split_sentences, prefix-bucket packing
        at 64 tokens — one exchange end-to-end."""
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.chunking import chunk_by_sentences
        from ccm_spark.pipeline.text import SENT_INJECT_RE, split_sentences
        from ccm_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.regexp_replace("text", SENT_INJECT_RE, r"$1. ").alias("text"),
        )
        return chunk_by_sentences(split_sentences(docs), max_tokens=64)

    def extra_plan_compaction(spark, sf_dir):
        """r13 compaction planner over a lineitem-derived manifest
        (600k files at sf0.1 — a realistic small-file count): 32 table
        partitions from l_suppkey (the synthetic lineitem carries no
        l_shipmode), path from the composite key, size from
        l_extendedprice cents."""
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.layout import plan_compaction
        from ccm_spark.sources.tables import load_table

        li = load_table(spark, sf_dir, "lineitem")
        manifest = li.select(
            (F.col("l_suppkey") % 32).cast("string").alias("partition"),
            F.concat(
                F.lit("f-"),
                F.lpad(F.col("l_orderkey").cast("string"), 10, "0"),
                F.lit("-"),
                F.col("l_linenumber").cast("string"),
            ).alias("path"),
            (F.col("l_extendedprice") * 100).cast("long").alias("size_bytes"),
        )
        return plan_compaction(manifest, target_bytes=1_000_000)

    def extra_key_skew(spark, sf_dir):
        """r13 shuffle-health report on the biggest fact relation:
        per-l_suppkey mass profile of lineitem (two map-side-combined
        aggregates + two-phase top-N)."""
        from ccm_spark.pipeline.skew import key_skew_report
        from ccm_spark.sources.tables import load_table

        return key_skew_report(
            load_table(spark, sf_dir, "lineitem"), "l_suppkey", top_n=50
        )

    def extra_winnow(spark, sf_dir):
        """r12 winnowing fingerprints at sf scale (k=5, w=4): gram hash
        + doc-partitioned rolling min + distinct."""
        from ccm_spark.pipeline.chunking import winnow_fingerprints
        from ccm_spark.sources.tables import load_table

        return winnow_fingerprints(load_table(spark, sf_dir, "documents"), k=5, w=4)

    def extra_hits(spark, sf_dir):
        """r12 HITS over the same deterministic 20k-host LCG graph as
        pagerank_20k (5 iterations = 10 half-steps), so the two
        centrality iterations are directly comparable."""
        import pyspark.sql.functions as F

        from ccm_spark.pipeline.graph import hits

        edges = (
            spark.range(20000 * 8)
            .select(
                (F.col("id") % 20000).cast("string").alias("src"),
                ((F.col("id") * F.lit(1103515245).cast("bigint") + 12345) % 20000)
                .cast("string")
                .alias("dst"),
            )
            .filter("src != dst")
        )
        return hits(edges, n_iters=5)

    def extra_blocklist(spark, sf_dir):
        from ccm_spark.pipeline.filters import (
            BLOCKLIST_GATE_PHRASES,
            phrase_blocklist_matches,
        )
        from ccm_spark.sources.tables import load_table

        return phrase_blocklist_matches(
            load_table(spark, sf_dir, "documents"), BLOCKLIST_GATE_PHRASES
        )

    def extra_hybrid_rrf(spark, sf_dir):
        """r14 hybrid retrieval: bm25 + cosine fused by RRF — 20
        more-like-this queries, both rankers bounded, fusion touches
        only their top-k outputs."""
        from ccm_spark.pipeline.search import hybrid_search_rrf

        return hybrid_search_rrf(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            n_queries=20,
            k_each=10,
            top_k=10,
        )

    def extra_detect_gaps(spark, sf_dir):
        from ccm_spark.pipeline.events_ops import detect_gaps
        from ccm_spark.sources.tables import load_table

        return detect_gaps(
            load_table(spark, sf_dir, "events"), min_gap_us=300_000_000
        )

    def extra_merge_upsert(spark, sf_dir):
        """r15 staged candidate: latest-wins CDC merge of the derived
        re-crawl delta (re-crawls + tombstones + same-version ties)
        into the documents snapshot — one hash exchange on doc_id."""
        from ccm_spark.pipeline.cdc import merge_upsert_gate

        return merge_upsert_gate(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        )

    def extra_profile_columns(spark, sf_dir):
        """r15 staged candidate: per-column profile of documents (5
        cols incl. a null-bearing derived one) — one scan, one
        distinct-value-sized exchange."""
        from ccm_spark.pipeline.profile import profile_documents_gate

        return profile_documents_gate(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        )

    def extra_heavy_hitters(spark, sf_dir):
        """r15 staged candidate: Misra-Gries heavy hitters over
        documents.lang — per-partition summaries + broadcast-filtered
        exact recount, no per-distinct-value shuffle."""
        from ccm_spark.pipeline.sketches import heavy_hitters

        return heavy_hitters(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), "lang", k=5
        )

    def extra_promo_revenue(spark, sf_dir):
        """r15 TPC-H Q14: one-month pushdown window + broadcast part
        dim + conditional-sum ratio."""
        from ccm_spark.pipeline.relational import promo_revenue

        return promo_revenue(spark, sf_dir)

    def extra_q18(spark, sf_dir):
        """r15 TPC-H Q18: per-order rollup, HAVING before any join,
        qualified set broadcast through orders and customer."""
        from ccm_spark.pipeline.relational import large_volume_customers

        return large_volume_customers(spark, sf_dir)

    def extra_tfidf(spark, sf_dir):
        """r16 (VERDICT r15 #5): first recorded baseline for
        tfidf_terms — previously ungated AND unbenched, so its
        double-consumed tf aggregate was invisible to every cross-round
        comparison. Baselined the round it stages, per policy."""
        from ccm_spark.pipeline.text import tfidf_terms
        from ccm_spark.sources.tables import load_table

        return tfidf_terms(load_table(spark, sf_dir, "documents"), k=5)

    # r16 (VERDICT r15 #8): the HOT streaming variant — source dir and
    # sink-view name pre-created ONCE, untimed, so the extra times the
    # micro-batch machinery itself rather than tempdir + parquet-copy
    # setup. streaming_sessionize keeps its original convention
    # unchanged (setup inside the timed region) for cross-round
    # comparability; the hot/cold delta IS the setup cost, read
    # directly from the two extras. Each run still gets a FRESH
    # checkpoint subdir (a reused availableNow checkpoint would replay
    # nothing and time an empty batch — gaming, not measurement).
    _hot_stream_dir = tempfile.mkdtemp(prefix="bench_sess_stream_hot_")
    _hot_stream_runs = [0]
    # source dir built HERE — outside the extras loop, untimed
    import shutil as _sh

    os.makedirs(os.path.join(_hot_stream_dir, "src"))
    _sh.copy(
        f"{sf_dir}/events.parquet",
        os.path.join(_hot_stream_dir, "src", "part-0.parquet"),
    )

    def extra_streaming_sessionize_hot(spark, sf_dir):
        from ccm_spark.streaming.stateful import streaming_sessionize
        from ccm_spark.streaming.windows import event_stream

        src = os.path.join(_hot_stream_dir, "src")
        try:
            spark.catalog.dropTempView("bench_sess_stream_hot")
        except Exception:
            pass
        _hot_stream_runs[0] += 1
        ckpt = os.path.join(_hot_stream_dir, f"ckpt{_hot_stream_runs[0]}")
        q = (
            streaming_sessionize(event_stream(spark, src))
            .writeStream.format("memory")
            .queryName("bench_sess_stream_hot")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "streaming_sessionize_hot bench extra exceeded 300s"
            )
        return spark.sql("SELECT * FROM bench_sess_stream_hot")

    extras = {
        # url_dedup left the gated registry r14 (slot went to
        # plan_compaction) but stays timed under the same name
        "url_dedup": E.q_url_dedup,
        "hybrid_rrf": extra_hybrid_rrf,
        "phrase_blocklist": extra_blocklist,
        "lm_perplexity": extra_lm,
        "bm25_topk": extra_bm25,
        "line_dedup": extra_line_dedup,
        "dtw_topk": extra_dtw,
        "kmeans_cluster": extra_kmeans,
        "pca_project": extra_pca,
        "html_extract": extra_html,
        "warc_parse": extra_warc,
        "pagerank_20k": extra_pagerank,
        "doclen_quantile_sketch": extra_bottomk,
        "ivf_pq_topk": extra_ivf_pq,
        "streaming_sessionize": extra_streaming_sessionize,
        "quality_classifier": extra_quality_classifier,
        "dsir_select": extra_dsir,
        "lm_perplexity_kn": extra_lm_kn,
        "knn_graph_2k": extra_knn_graph,
        # r12 additions — first recorded baselines this round
        "chunk_documents": extra_chunking,
        "winnow_fingerprints": extra_winnow,
        "hits_20k": extra_hits,
        # r13 additions — first baselines measured solo (SCALE.md)
        "chunk_by_sentences": extra_chunk_sentences,
        "plan_compaction": extra_plan_compaction,
        "key_skew_report": extra_key_skew,
        # r15 additions — the round's newly gated rows (HITS already
        # rides as hits_20k at bench geometry; key_skew_report above).
        # detect_gaps uses a 5-minute threshold HERE: sf0.1's stream is
        # dense enough that the gate's 1 h default finds zero gaps
        # (vacuous timing); 300 s yields ~9.8k rows so the extra times
        # real output, same plan shape
        "detect_gaps": extra_detect_gaps,
        "q5_supplier_volume": E.q_local_supplier_volume,
        # r15 staged candidates (twins + pins landed this round) —
        # first baselines recorded the round they stage, per policy
        "merge_upsert": extra_merge_upsert,
        "profile_columns": extra_profile_columns,
        "promo_revenue": extra_promo_revenue,
        "large_volume_customers": extra_q18,
        "heavy_hitters_lang": extra_heavy_hitters,
        # r16 additions — first baselines recorded this round (VERDICT
        # r15 #5 and #8); appended at the end so every earlier extra
        # keeps its queue position (the cooldown-band comparability)
        "tfidf_terms": extra_tfidf,
        "streaming_sessionize_hot": extra_streaming_sessionize_hot,
    }
    # two runs per extra: the REPORTED number stays the FIRST (cold) run
    # so cross-round extra comparisons stay apples-to-apples with r1-r6
    # single-cold-run history (the second run is warm — codegen classes
    # and page cache survive clearCache — so a min would read as a ~3x
    # phantom improvement on unchanged code); the [min, max] spread rides
    # along to refute host-noise regressions, same as the headline
    # queries' spread fields (r07 alone saw two: an 18s pagerank and a
    # 7s kmeans, both loaded-window artifacts).
    #
    # r10 refinements (VERDICT r09 #3/#8):
    # - the two heaviest extras (dsir_select, knn_graph_2k) and the
    #   iterative pagerank_20k run 3 samples instead of 2, so expensive-
    #   tail regressions separate from cold-run noise;
    # - CONVENTION CHANGE, recorded here and in the JSON
    #   (extra_queries_convention): pagerank_20k now reports the WARM
    #   median (median of runs 2..n). Its cold-vs-warm delta is
    #   first-execution codegen/JIT of the iteration loop (measured
    #   cold 5.3 s / warm 3.5 s on identical plans; tools/
    #   perf_pagerank.py reproduces it), i.e. a per-SESSION constant a
    #   long-lived graph job pays once — not per-query cost. The cold
    #   run still executes first and stays visible in the spread.
    # r13 (VERDICT r12 #4): hits_20k joins the warm-median convention —
    # SCALE.md documents the identical first-execution codegen constant
    # (12.4 s cold vs ~6.6 s warm) that moved pagerank_20k to
    # warm-median in r10; and url_dedup gets nruns=3 so one co-tenant
    # hit cannot set the reported value (r12 reported 10.13 s from a
    # [0.745, 10.13] two-run spread while the driver saw 2.49 s).
    EXTRA_NRUNS = {
        "dsir_select": 3,
        "knn_graph_2k": 3,
        "pagerank_20k": 3,
        "hits_20k": 3,
        "url_dedup": 3,
    }
    EXTRA_WARM_MEDIAN = {"pagerank_20k", "hits_20k"}
    # r13 (VERDICT r12 #4, completed): nruns=3 alone still reports the
    # FIRST run, so a co-tenant hit on run 1 sets the value anyway (the
    # r13 self run caught dsir_select at samples [34.9, 7.5, 9.1] — a
    # 5.6x phantom). Volatile extras report the MEDIAN OF ALL runs
    # (cold run still executes first and stays visible in the spread).
    EXTRA_MEDIAN_ALL = {"url_dedup", "dsir_select"}
    # r14 (VERDICT r13 #6): the r13 keeper run proved nruns=2 +
    # report-first cannot absorb a co-tenant window on ANY multi-second
    # extra (bm25_topk [11.0, 11.95], lm_perplexity [8.48, 9.58],
    # kmeans_cluster [4.96, 9.84] — all 3-4x their own r12 selves AND
    # the r13 driver numbers on unchanged code). The convention now
    # extends ADAPTIVELY: once any sample of an extra reaches
    # EXTRA_SLOW_SEC, a third sample runs and the reported value is the
    # median of all runs. Static name lists above stay for the known
    # cases; this catches every current and future multi-second extra.
    EXTRA_SLOW_SEC = 2.0
    EXTRA_SLOW_NRUNS = 3
    # r12 (VERDICT r11 #6): cooldown re-gate BETWEEN extras. The r11
    # self-run's own 1-min loadavg ramped 4 -> 15 as the extras queue
    # drained back-to-back, manufacturing phantom quiet-host regressions
    # (bm25_topk +64% that reversed on the driver). Before each extra's
    # timed runs, wait (bounded) for the 1-min loadavg to decay below
    # EXTRA_LOAD_GATE so every extra starts inside the same documented
    # band; a per-extra cap and a whole-run budget keep the bench's
    # wall-clock bounded on a host that never quiets — budget exhaustion
    # is flagged in the JSON rather than stalling the run. The recorded
    # per-extra START loadavg is the number a cross-round comparison
    # should read before calling an extra's delta a regression.
    EXTRA_LOAD_GATE = 6.0
    EXTRA_COOLDOWN_MAX = 60.0
    EXTRA_COOLDOWN_BUDGET = 360.0
    cooldown_spent = 0.0
    # r16 (VERDICT r15 #3): run-level loadavg bracket for the EXTRAS
    # phase, carried into the parsed line with per-extra floors so a
    # loaded extras phase (the r15 driver's c32 pagerank 23 s) is
    # attributable from BENCH_rN.json alone
    extras_load_start = _loadavg()
    extra_start_load: dict[str, float] = {}
    extra_timings = {}
    extra_spread = {}
    extra_nruns = {}
    extra_load_samples = {}
    extra_hit_slow: dict[str, bool] = {}
    for name, fn in extras.items():
        waited = 0.0
        while cooldown_spent < EXTRA_COOLDOWN_BUDGET and waited < EXTRA_COOLDOWN_MAX:
            la = _loadavg()
            if not la or la[0] <= EXTRA_LOAD_GATE:
                break
            time.sleep(5)
            waited += 5
            cooldown_spent += 5
        la = _loadavg()
        extra_start_load[name] = la[0] if la else -1.0
        if waited:
            print(
                f"# cooldown before {name}: {waited:.0f}s "
                f"(start loadavg {extra_start_load[name]})",
                file=sys.stderr,
            )
        extra_runs = []
        extra_load_samples[name] = []
        planned = EXTRA_NRUNS.get(name, 2)
        hit_slow = False
        while len(extra_runs) < planned:
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            extra_runs.append(round(time.time() - t0, 3))
            la = _loadavg()
            extra_load_samples[name].append(la[0] if la else -1.0)
            # adaptive extension (r14): a multi-second extra gets a
            # third sample so its median can survive one co-tenant hit.
            # The flag (not the run count) drives the median_all switch
            # below — a static-nruns=3 extra that never reached the
            # threshold keeps its historical first-run convention.
            if extra_runs[-1] >= EXTRA_SLOW_SEC:
                hit_slow = True
                planned = max(planned, EXTRA_SLOW_NRUNS)
        if name in EXTRA_WARM_MEDIAN:
            extra_timings[name] = round(median(extra_runs[1:]), 3)
        elif name in EXTRA_MEDIAN_ALL or hit_slow:
            extra_timings[name] = round(median(extra_runs), 3)
        else:
            extra_timings[name] = extra_runs[0]
        extra_hit_slow[name] = hit_slow
        extra_spread[name] = [min(extra_runs), max(extra_runs)]
        extra_nruns[name] = len(extra_runs)
        print(
            f"# extra {name}: {extra_timings[name]:.2f}s rows={n} "
            f"samples={extra_runs}",
            file=sys.stderr,
        )
    summary = json.dumps(
        {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "runs_per_query": REPEATS,
                "extra_runs_sub_sec": EXTRA_REPEATS,
                "aggregation": "median",
                "queries": timings,
                # per-query error bars: [min, max] of the raw samples — a
                # cross-round comparison is only meaningful where the
                # intervals separate (VM noise manufactured 6 phantom >=2x
                # "regressions" on byte-identical code in round 5)
                "queries_spread": {
                    name: [round(min(xs), 3), round(max(xs), 3)]
                    for name, xs in samples.items()
                },
                "queries_nruns": {name: len(xs) for name, xs in samples.items()},
                # post-freeze operator families, single-shot timings,
                # EXCLUDED from "value" (cross-round totals compare the
                # same headline set)
                "extra_queries": extra_timings,
                "extra_queries_spread": extra_spread,
                "extra_queries_nruns": extra_nruns,
                # r10 convention change (documented in the comment block
                # above): pagerank_20k reports the warm median — its
                # cold-vs-warm delta is per-session codegen/JIT, not
                # per-query cost; every other extra still reports the
                # first (cold) run
                "extra_queries_convention": {
                    **{
                        # r14: any extra that reached >= EXTRA_SLOW_SEC
                        # ran 3 samples and reports median_all
                        name: "median_all"
                        for name, slow in extra_hit_slow.items()
                        if slow and name not in EXTRA_WARM_MEDIAN
                    },
                    **{
                        name: "warm_median"
                        for name in sorted(EXTRA_WARM_MEDIAN)
                    },
                    **{
                        name: "median_all"
                        for name in sorted(EXTRA_MEDIAN_ALL)
                    },
                },
                # host-load context: SCALE.md documents ±5x co-tenant
                # bursts on this VM; a cross-round comparison should read
                # these before calling a delta a regression
                # per-sample 1-min loadavg taken as each run finished,
                # aligned index-for-index with queries_spread's raw
                # samples — reads which SPECIFIC timings a mid-run load
                # burst poisoned (r11, VERDICT r10 #7)
                "loadavg_per_query": {
                    name: xs for name, xs in load_samples.items()
                },
                "extra_loadavg_per_query": extra_load_samples,
                # r12 cooldown re-gate: per-extra START loadavg (the
                # comparable band), gate threshold, and how much of the
                # bounded cooldown budget the run spent waiting
                "extra_start_loadavg": extra_start_load,
                "extras_loadavg": [
                    extras_load_start[0] if extras_load_start else -1.0,
                    (_loadavg() or [-1.0])[0],
                ],
                "extra_cooldown_gate": EXTRA_LOAD_GATE,
                "extra_cooldown_spent_sec": cooldown_spent,
                "extra_cooldown_budget_sec": EXTRA_COOLDOWN_BUDGET,
                "extra_cooldown_budget_exhausted": cooldown_spent
                >= EXTRA_COOLDOWN_BUDGET,
                "loadavg_before": load_before,
                "loadavg_at_start": load_at_start,
                "loadavg_gate": LOAD_GATE,
                "loadavg_wait_sec": load_wait,
                "loadavg_gate_exceeded": load_warning,
                "flagship_warmup": FLAGSHIPS,
                "loadavg_after": _loadavg(),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    print(summary)
    # the r06 driver's stdout tail truncated the headline line (parsed:
    # null) — persist the same JSON to a file so the summary survives any
    # stdout-volume truncation
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    with open(out_path, "w") as f:
        f.write(summary + "\n")
    # r16 (VERDICT r15 #3): a second same-round run used to OVERWRITE
    # BENCH_LOCAL.json, losing the first run's loadavg maps (the r15
    # c32 extras burst became unattributable). Every run now ALSO
    # appends to a history file; BENCH_LOCAL.json stays the latest run
    # under its frozen name.
    with open(out_path.replace(".json", "_HISTORY.jsonl"), "a") as f:
        f.write(summary + "\n")
    # r13 (VERDICT r12 #5): the driver records only a stdout TAIL, and
    # the full summary line (per-query loadavg maps included) outgrew
    # that window three rounds running (BENCH_r10..r12 all parsed:
    # null). Print a compact line — headline total + per-query medians
    # + extras' reported numbers, no spreads/loadavg — as the LAST
    # stdout line so the driver's own record parses again; the full
    # artifact lives in BENCH_LOCAL.json above.
    # r15 (VERDICT r14 #7): the r14 driver headline was attributable
    # only by spelunking BENCH_LOCAL.json's loadavg maps — carry the
    # per-query FLOORS (min of the raw samples) and their sum in the
    # parsed line itself, so a loaded driver round reads directly from
    # BENCH_rN.json (floor ≈ prior round's median on unchanged code =
    # load, not regression). The reported median convention is
    # unchanged; floors ride along.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "headline_floor": round(
                    sum(min(xs) for xs in samples.values()), 3
                ),
                "queries": timings,
                "queries_floor": {
                    name: round(min(xs), 3) for name, xs in samples.items()
                },
                "extra_queries": extra_timings,
                # r16 (VERDICT r15 #3): extras attribution in the parsed
                # line itself — per-extra floors (min of the raw runs)
                # and the extras phase's start/end 1-min loadavg pair
                "extra_queries_floor": {
                    name: sp[0] for name, sp in extra_spread.items()
                },
                "extras_loadavg": [
                    extras_load_start[0] if extras_load_start else -1.0,
                    (_loadavg() or [-1.0])[0],
                ],
                "full_artifact": "BENCH_LOCAL.json",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
