"""End-to-end corpus-preparation walkthrough — the training-data
pipeline assembled from the engine's operators, runnable documentation
(the PySpark analogue of the reference's examples.livemd notebook, which
demos the CCM surface; this demos the corpus surface).

    python examples/corpus_pipeline.py [sf_dir]

Stages (each one operator, each individually oracle- or replay-pinned):
  0. URL hygiene           (canonicalise, URL-exact dedup, domain caps)
  1. quality filter        (rule-based keep/drop)
  1a. phrase blocklist     (C4-style bad-phrase drop + density report)
  1b. perplexity filter    (Kneser-Ney bigram LM on the rule-clean
                            docs; drop the least reference-like tail)
  1c. PII audit            (validated redaction counts: emails, Luhn-
                            gated cards, IPv4, phones — report stage)
  2. exact dedup           (md5 hash-aggregate, keep representative)
  3. near-dup removal      (MinHash+LSH clusters -> keep min doc_id)
  4. decontamination       (Bloom probe + exact verify vs an eval split)
  5. mixing                (per-language rates, deterministic)
  6. tokenize + budget     (wordpiece ids; exact per-language token caps)
  7. shuffle + shards      (global permutation, manifest hand-off)
"""

from __future__ import annotations


def run(spark, sf_dir: str, shard_path: str) -> dict:
    """Run the whole pipeline; returns the stage-by-stage row counts and
    the final shard manifest (collected — demo scale)."""
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.dedup import (
        decontaminate_bloom,
        duplicate_components,
        exact_duplicates,
    )
    from ccm_spark.pipeline.mixing import budget_select, mixture_sample
    from ccm_spark.pipeline.text import quality_filter
    from ccm_spark.pipeline.tokenize import build_wordpiece_vocab, tokenize_docs
    from ccm_spark.plans.cross_map import release_cached
    from ccm_spark.sources.sinks import write_training_shards
    from ccm_spark.sources.tables import load_table

    counts: dict = {}

    def checkpoint(new_docs):
        """Materialise AND truncate lineage at each stage boundary
        (eager localCheckpoint). persist() is NOT enough here: it caches
        data but the logical plan keeps nesting, and with the iterative
        near-dup stage embedded, every later action paid a driver-side
        walk of that tree (measured 30-80s per stage before the switch);
        worse, unpersisting a superseded stage CASCADES into dependent
        caches. At production scale the equivalent boundary is writing
        each stage to a table and reading it back (durable, restartable);
        localCheckpoint is the in-session twin."""
        new_docs = new_docs.localCheckpoint(eager=True)
        return new_docs, new_docs.count()

    docs = load_table(spark, sf_dir, "documents")
    counts["input"] = docs.count()

    # 0. URL hygiene — the metadata-level first pass, run before any text
    # is read. The test corpus carries no URL column, so derive a demo one
    # (doc pairs share a page; odd members arrive with tracking params —
    # the crawl-twice case canonicalisation exists for), then keep each
    # canonical URL's representative and cap docs per domain.
    from ccm_spark.pipeline.urls import domain_cap, url_duplicates

    with_urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"),
            F.expr("(doc_id DIV 2) % 37"),
            F.lit(".example.org/doc/"),
            F.expr("doc_id DIV 2"),
            F.when(F.expr("doc_id % 2 = 1"), F.lit("?utm_source=feed")).otherwise(
                F.lit("")
            ),
        ).alias("url"),
    )
    url_reps = url_duplicates(with_urls).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    capped = domain_cap(with_urls.join(url_reps, "doc_id"), 12).select("doc_id")
    docs, counts["after_url_hygiene"] = checkpoint(docs.join(capped, "doc_id"))

    # eval split for decontamination (stand-in for a benchmark suite)
    eval_docs = docs.where("doc_id % 31 = 0")
    docs = docs.where("doc_id % 31 != 0")

    # 1. rule-based quality filter
    kept = quality_filter(docs).where("keep").select("doc_id")
    docs, counts["after_quality"] = checkpoint(docs.join(kept, "doc_id"))

    # 1a. phrase blocklist (the C4 bad-words pass, r11): drop docs
    # containing blocked multi-token phrases — relational anchor-join
    # matching, no regex union. The demo list targets the synthetic
    # vocabulary; a real pipeline broadcasts its policy list here.
    from ccm_spark.pipeline.filters import (
        blocklist_filter,
        char_entropy_signals,
        compression_signals,
    )

    docs, counts["after_blocklist"] = checkpoint(
        blocklist_filter(docs, ["table table table", "slow slow slow"])
    )

    # 1a'. information-density report (non-filtering): zlib ratio and
    # char-entropy extremes — the Gopher repetitiousness signals a
    # curator reads before setting filter thresholds.
    # an empty surviving set would make these aggregates NULL and the
    # float() casts below TypeError — same guard as the embedding
    # survivors assert later in the pipeline
    assert counts["after_blocklist"] > 0, "blocklist dropped every document"
    dens = (
        compression_signals(docs)
        .agg(
            F.avg("compression_ratio").alias("avg_r"),
            F.min("compression_ratio").alias("min_r"),
        )
        .collect()[0]
    )
    ent = char_entropy_signals(docs).agg(F.avg("entropy_bits").alias("h")).collect()[0]
    counts["density"] = {
        "avg_zlib_ratio": round(float(dens.avg_r), 4),
        "min_zlib_ratio": round(float(dens.min_r), 4),
        "avg_char_entropy_bits": round(float(ent.h), 4),
    }

    # 1b. perplexity filter (CCNet-style): train the reference LM on the
    # rule-clean docs themselves (a real pipeline trains on trusted text,
    # e.g. wikipedia) and drop the least reference-like tail bucket.
    # Kneser-Ney smoothing (the KenLM family CCNet actually uses, r09):
    # absolute discounting + continuation counts score boilerplate-heavy
    # text more sharply than add-alpha
    from ccm_spark.pipeline.lm import (
        perplexity,
        perplexity_buckets,
        train_kn_bigram_lm,
    )

    lm = train_kn_bigram_lm(docs, vocab_size=2_000, max_bigrams=20_000)
    buckets = perplexity_buckets(perplexity(docs, lm))
    keep_ppl = buckets.where(
        F.col("bucket").isNull() | (F.col("bucket") != "tail")
    ).select("doc_id")
    docs, counts["after_perplexity"] = checkpoint(docs.join(keep_ppl, "doc_id"))

    # 1c. PII audit (report, non-filtering): validated redaction counts —
    # what a release review reads; the redacted TEXT would feed the next
    # stage in a pipeline that ships the corpus outside
    from ccm_spark.pipeline.text import redact_pii_extended

    pii = redact_pii_extended(docs).agg(
        F.sum("n_emails").alias("em"),
        F.sum("n_cards").alias("cd"),
        F.sum("n_ips").alias("ip"),
        F.sum("n_phones").alias("ph"),
    ).collect()[0]
    counts["pii_found"] = {
        "emails": int(pii.em), "cards": int(pii.cd),
        "ips": int(pii.ip), "phones": int(pii.ph),
    }

    # 2. exact dedup: keep each content hash's representative
    reps = exact_duplicates(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    docs, counts["after_exact_dedup"] = checkpoint(docs.join(reps, "doc_id"))

    # 3. near-dup clusters -> keep the component label (min doc_id)
    comp = duplicate_components(docs, threshold=0.5)
    keep = comp.where(F.col("doc_id") == F.col("component")).select("doc_id")
    docs, counts["after_near_dedup"] = checkpoint(docs.join(keep, "doc_id"))
    release_cached(comp)

    # 4. decontaminate against the eval split (Bloom + exact verify)
    verdicts = decontaminate_bloom(docs, eval_docs)
    clean = verdicts.where(~F.col("contaminated")).select("doc_id")
    docs, counts["after_decontamination"] = checkpoint(docs.join(clean, "doc_id"))
    release_cached(verdicts)

    # 4b. topic balance REPORT (non-filtering): cluster the surviving
    # docs' embeddings with the distributed Lloyd trainer and record the
    # per-cluster population — the number a curator reads before deciding
    # to cap/upsample topics (the cap itself would be
    # mixing.stratified_sample on the cluster column)
    from ccm_spark.pipeline.clustering import cluster_sizes, kmeans_assign, kmeans_fit
    from ccm_spark.sources.tables import load_table as _lt

    embs = _lt(spark, sf_dir, "embeddings").join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    cents = kmeans_fit(embs, k=4, n_iters=3)
    counts["topic_clusters"] = {
        int(r.cluster): int(r.n_members)
        for r in cluster_sizes(kmeans_assign(embs, cents)).collect()
    }
    # ... and the serving-store compression (r09) promoted to a REAL
    # serving path (r11): retrieval runs over the DEQUANTIZED int8
    # store — 4-8x smaller at rest — and the example asserts the
    # measured recall floor vs exact retrieval, so the compressed path
    # can't silently rot (tests/test_pq.py pins the same floor at 0.9)
    from ccm_spark.pipeline.similarity import (
        cosine_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )

    quantized = quantize_embeddings(embs).localCheckpoint(eager=True)
    counts["int8_vectors"] = quantized.count()
    # cosine_topk's n_queries is a vec_id CUTOFF; the surviving corpus
    # here has been dedup-filtered, so derive the cutoff from the 10
    # smallest surviving ids rather than assuming ids 0..9 survived
    k_q = 5
    surviving = [
        r.vec_id
        for r in embs.select("vec_id").orderBy("vec_id").limit(10).collect()
    ]
    assert surviving, "dedup/filter stages dropped every embedding vector"
    n_q = surviving[-1] + 1
    exact_topk = {
        (r.query_id, r.target_id)
        for r in cosine_topk(embs, n_queries=n_q, k=k_q).collect()
    }
    assert exact_topk  # the recall check below must not pass vacuously
    served_topk = {
        (r.query_id, r.target_id)
        for r in cosine_topk(
            dequantize_embeddings(quantized), n_queries=n_q, k=k_q
        ).collect()
    }
    int8_recall = len(exact_topk & served_topk) / max(1, len(exact_topk))
    assert int8_recall >= 0.9, f"int8 serving recall@{k_q} = {int8_recall:.2f}"
    counts["int8_serving_recall_pct"] = int(round(100 * int8_recall))

    # 4c. k-NN graph + graph-based dedup audit (r10): build the ranked
    # neighbor graph once (NN-descent — the artifact retrieval,
    # diversity sampling AND dedup share) and read semantic duplicate
    # components off its thresholded edges — no extra LSH pass. On this
    # corpus the embeddings are isotropic random vectors, so the audit's
    # EXPECTED finding is "no semantic dups at 0.999"; the structural
    # properties still hold and are asserted: every graph node gets a
    # component, labels are min-ids (component <= vec_id), and
    # representatives + redundancy partition the covered corpus.
    from ccm_spark.pipeline.ann_graph import knn_graph_components, knn_graph_descent

    # the demo corpus shrinks to a few dozen survivors at sf0.001; the
    # engine-wide 8-plane SRP floor (sized for corpora, ~256 buckets)
    # would leave every bucket a singleton and the graph empty, so size
    # the planes to the SURVIVING corpus here (~8 expected per bucket)
    import math as _math

    n_embs = embs.count()
    demo_planes = max(2, _math.ceil(_math.log2(max(2.0, n_embs / 8))))
    graph = knn_graph_descent(
        embs, k=5, n_rounds=2, planes=demo_planes
    ).localCheckpoint(eager=True)
    comp = knn_graph_components(graph, threshold=0.999).localCheckpoint(eager=True)
    n_nodes = graph.select("src").distinct().count()
    assert n_nodes > 0  # an empty graph would let every audit pass vacuously
    n_comp_rows = comp.count()
    n_reps = comp.where(F.col("vec_id") == F.col("component")).count()
    assert n_comp_rows == n_nodes, (n_comp_rows, n_nodes)
    assert comp.where(F.col("component") > F.col("vec_id")).count() == 0
    counts["knn_graph_nodes"] = n_nodes
    counts["semantic_dup_redundancy"] = n_comp_rows - n_reps
    # ... and the graph's second consumer: diversity sampling (an
    # independent set of the thresholded graph — dense regions thinned
    # to local representatives). Kept set can never exceed the node set
    # and keeps everything when no above-threshold edges exist.
    from ccm_spark.pipeline.ann_graph import graph_diversity_sample

    div = graph_diversity_sample(graph, threshold=0.999)
    n_div = div.where(F.col("keep")).count()
    assert 0 < n_div <= n_nodes, (n_div, n_nodes)
    counts["diversity_kept"] = n_div

    # 5. language mixing (drop copy_idx: demo rates are <= 1)
    mixed = mixture_sample(docs).select("doc_id").distinct()
    docs, counts["after_mixing"] = checkpoint(docs.join(mixed, "doc_id"))

    # 6. tokenize (broadcast wordpiece vocab) + exact token budgets
    vocab = build_wordpiece_vocab(docs, size=1000)
    toks = tokenize_docs(docs, vocab)
    counts["total_pieces"] = toks.agg(F.sum("n_pieces")).collect()[0][0]
    # vocabulary-fit check (r09) BEFORE committing the corpus to this
    # vocab: fertility (pieces/word) and OOV fraction per the report
    from ccm_spark.pipeline.tokenize import fertility_report

    fert = fertility_report(docs, vocab).collect()[0]
    counts["fertility"] = float(fert.fertility)
    counts["oov_word_frac"] = float(fert.oov_word_frac)
    budgeted = budget_select(
        docs, {"en": 50_000, "de": 20_000, "fr": 10_000, "es": 5_000, "zh": 5_000}
    )
    docs, counts["after_budget"] = checkpoint(docs.join(budgeted.select("doc_id"), "doc_id"))
    release_cached(budgeted)

    # 6b. context-window chunking + winnowing audit (r12). Chunking is
    # the corpus->training-row rewrite (overlap keeps boundary-spanning
    # context learnable); the winnowing fingerprint relation is the
    # position-robust overlap audit a curator runs LAST — it catches
    # shared runs (>= w+k-1 tokens) that survived the hash/simhash
    # dedup passes upstream.
    from ccm_spark.pipeline.chunking import (
        chunk_documents,
        winnow_fingerprints,
        winnow_matches,
    )

    ch = chunk_documents(docs, max_tokens=64, stride=48)
    crow = ch.agg(
        F.count("*").alias("n"), F.sum("n_tokens").alias("tok")
    ).collect()[0]
    counts["chunks"] = int(crow.n)
    counts["chunk_tokens"] = int(crow.tok)
    counts["winnow_fingerprints"] = winnow_fingerprints(docs, k=5, w=4).count()
    counts["winnow_residual_pairs"] = winnow_matches(
        docs, k=5, w=4, min_shared=2
    ).count()

    # 6c. sentence segmentation -> sentence-BOUNDED chunking (r13): a
    # training row should not straddle a sentence boundary the way raw
    # token windows (6b) do. The synthetic corpus carries no
    # punctuation, so the stage first derives a deterministic
    # sentence-ful view (the shared SENT_INJECT_RE constant — a period
    # after every 7th token, the PII-injection precedent), then PACKS
    # consecutive sentences into ~64-token chunks without ever
    # splitting one (chunk_by_sentences — the relational prefix-bucket
    # rule, one exchange total).
    from ccm_spark.pipeline.chunking import chunk_by_sentences
    from ccm_spark.pipeline.text import SENT_INJECT_RE, split_sentences

    sent_docs = docs.select(
        "doc_id",
        F.regexp_replace("text", SENT_INJECT_RE, r"$1. ").alias("text"),
    )
    sents = split_sentences(sent_docs)
    counts["sentences"] = sents.count()
    assert counts["sentences"] > counts["after_budget"], (
        "sentence split is vacuous: every doc collapsed to one sentence"
    )
    sch_sent = chunk_by_sentences(sents, max_tokens=64)
    counts["sentence_chunks"] = sch_sent.count()
    # packing is non-vacuous both ways: it combined sentences (fewer
    # chunks than sentences) without dropping any (docs preserved)
    assert 0 < counts["sentence_chunks"] < counts["sentences"]
    assert sch_sent.select("doc_id").distinct().count() == counts["after_budget"]

    # 7. deterministic shuffle -> training shards + manifest
    manifest = write_training_shards(docs, shard_path, n_shards=4, seed="epoch0")
    counts["shards"] = manifest["n_shards"]
    counts["final_docs"] = manifest["n_docs"]
    counts["final_tokens"] = manifest["n_tokens"]

    # 8 (r14). layout maintenance — the plan->act pair: simulate the
    # fine-grained ingest landing zone every streaming pipeline
    # accumulates (the curated corpus written as many small files —
    # NOT the epoch shards above, whose one-file-per-shard order is a
    # contract compaction must not touch), then list it, plan the
    # small-file merge, EXECUTE the compactable tasks, and verify the
    # rewrite preserved every row while cutting the file count
    from ccm_spark.pipeline.layout import (
        compact_files,
        file_manifest,
        plan_compaction,
    )

    landing = shard_path + "_landing"
    docs.repartition(8).write.mode("overwrite").parquet(landing)
    files = file_manifest(spark, landing)
    counts["shard_files"] = files.count()
    target = files.agg(F.sum("size_bytes")).first()[0] // 3 + 1
    plan = plan_compaction(files, int(target)).localCheckpoint(eager=True)
    stats = compact_files(spark, plan, shard_path + "_compacted")
    counts["compaction_tasks"] = stats["n_tasks"]
    counts["compaction_files_in"] = stats["n_files_in"]
    assert stats["n_tasks"] > 0, "compaction demo is vacuous: no tasks"
    assert stats["n_tasks"] < stats["n_files_in"], (
        "compaction merged nothing: every task holds one file"
    )
    before = spark.read.parquet(*[
        r.path for r in plan.where("compact").select("path").collect()
    ])
    after = spark.read.parquet(shard_path + "_compacted").drop("_part", "_task")
    # the prefix-bucket rule can strand the last shard as a singleton
    # no-op, so the rewrite covers the COMPACTABLE subset exactly
    assert 0 < before.count() == after.count() <= counts["final_docs"], (
        "compaction lost rows"
    )
    merged_files = [
        r.path
        for r in file_manifest(spark, shard_path + "_compacted").collect()
    ]
    assert len(merged_files) == stats["n_tasks"], (
        "compaction wrote more than one file per merge task"
    )

    # 9 (r15). snapshot maintenance — the corpus is not written once: a
    # re-crawl lands as a delta (fresh fetches + takedown tombstones),
    # merges latest-wins into the snapshot, the diff relation audits
    # exactly what changed, and the profile report checks the merged
    # snapshot's health before the next epoch trains on it
    from ccm_spark.pipeline.cdc import merge_upsert, snapshot_diff
    from ccm_spark.pipeline.profile import profile_columns

    base = docs.select("doc_id", "text").withColumn(
        "version", F.lit(0).cast("long")
    )
    # the curated set is a handful of docs by now, and which doc_ids
    # survive shifts with upstream thresholds — so the demo delta picks
    # members by doc_id RANK, not by a fixed modulus that an unlucky
    # survivor set leaves empty. The global window is fine HERE
    # (docs-sized, tiny); the gate fixture (cdc.merge_upsert_gate)
    # uses modulus arithmetic on the full table instead
    from pyspark.sql import Window

    # >= 3 survivors is the real precondition: _r%3==1 recrawls,
    # _r%3==2 takedowns, and the version-mix assert below needs at
    # least one UNTOUCHED version-0 row (_r%3==0) — fail here with the
    # true reason instead of blaming the profile operator downstream
    assert counts["final_docs"] >= 3, (
        f"snapshot demo needs >= 3 curated docs, got {counts['final_docs']}"
    )
    ranked = base.withColumn(
        "_r", F.row_number().over(Window.orderBy("doc_id"))
    )
    recrawl = ranked.where("_r % 3 = 1").select(
        "doc_id",
        F.concat("text", F.lit(" (recrawl)")).alias("text"),
        F.lit(1).cast("long").alias("version"),
        F.lit(False).alias("deleted"),
    )
    takedown = ranked.where("_r % 3 = 2").select(
        "doc_id",
        "text",
        F.lit(1).cast("long").alias("version"),
        F.lit(True).alias("deleted"),
    )
    merged = merge_upsert(
        base,
        recrawl.unionByName(takedown),
        ["doc_id"],
        "version",
        tombstone_col="deleted",
    )
    n_re = recrawl.count()
    n_td = takedown.count()
    assert n_re > 0 and n_td > 0, "snapshot demo is vacuous: empty delta"
    changes = {
        r.change: r.cnt
        for r in snapshot_diff(base, merged, ["doc_id"])
        .groupBy("change")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    # the diff recovers the delta exactly: every re-crawl changed, every
    # takedown removed, nothing invented
    assert changes == {"changed": n_re, "removed": n_td}, changes
    counts["merge_survivors"] = merged.count()
    assert counts["merge_survivors"] == counts["final_docs"] - n_td
    prof = {
        r.col_name: r
        for r in profile_columns(merged, ["doc_id", "version"]).collect()
    }
    assert prof["doc_id"].n_distinct == counts["merge_survivors"], (
        "merge emitted duplicate keys"
    )
    assert prof["version"].n_distinct == 2 and prof["version"].n_nulls == 0, (
        "profile missed the version mix the merge just created"
    )
    return {"counts": counts, "manifest": manifest}


if __name__ == "__main__":
    import json
    import os
    import sys

    # running as a script puts examples/ on sys.path, not the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import tempfile

    from ccm_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline-demo")
    out = run(spark, sf_dir, tempfile.mkdtemp(prefix="ccm_spark_shards_"))
    print(json.dumps(out["counts"], indent=2))
