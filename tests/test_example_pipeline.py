"""The worked corpus-pipeline example must run end-to-end and shrink
the corpus monotonically through its filter stages."""

from __future__ import annotations

import sys


def test_corpus_pipeline_example_runs(spark, sf_small, tmp_path):
    sys.path.insert(0, "/root/repo/examples")
    try:
        from corpus_pipeline import run
    finally:
        sys.path.pop(0)

    out = run(spark, sf_small, str(tmp_path / "shards"))
    c = out["counts"]
    # every filter stage can only shrink the corpus
    assert (
        c["input"]
        > c["after_url_hygiene"]
        >= c["after_quality"]
        > c["after_perplexity"]
        >= c["after_exact_dedup"]
        >= c["after_near_dedup"]
        >= c["after_decontamination"]
        >= c["after_mixing"]
        >= c["after_budget"]
        == c["final_docs"]
        > 0
    )
    assert c["total_pieces"] > 0 and c["final_tokens"] > 0
    assert c["shards"] >= 1
    # the topic-balance report covers every doc alive at that stage
    assert sum(c["topic_clusters"].values()) == c["after_decontamination"]
    # ... and the int8 store quantizes exactly those vectors
    assert c["int8_vectors"] == c["after_decontamination"]
    # vocabulary-fit + PII audit stages report sane values
    assert c["fertility"] >= 1.0 and 0.0 <= c["oov_word_frac"] <= 1.0
    assert all(v >= 0 for v in c["pii_found"].values())
    # r12 chunking + winnowing audit: at least one chunk per surviving
    # doc, overlap expands tokens, and the fingerprint relation is a
    # strict subsample of the gram relation (density ~2/(w+1))
    assert c["chunks"] >= c["final_docs"] > 0
    assert c["chunk_tokens"] >= c["chunks"]
    assert c["winnow_fingerprints"] > 0
    assert c["winnow_residual_pairs"] >= 0
    m = out["manifest"]
    assert m["n_docs"] == c["final_docs"]
    assert sum(s["n_docs"] for s in m["shards"]) == m["n_docs"]


def test_causal_screening_example_runs(spark):
    """The EDM screening walkthrough must run end-to-end, screen out the
    uncoupled pair before the expensive stages, and recover the true
    directed couplings in its edge list."""
    sys.path.insert(0, "/root/repo/examples")
    try:
        from causal_screening import run
    finally:
        sys.path.pop(0)

    out = run(spark)
    # the echoed sensor (6, a scaled copy of 0) is dropped before any
    # EDM stage runs
    assert out["dropped_echo_sensors"] == [6]
    assert set(out["embedding"]) == set(range(6))
    assert set(out["survivors"]) <= set(range(6))
    # the screening keeps the coupled systems' members
    assert {0, 1, 2, 3} <= set(out["survivors"])
    drivers = {(d, r) for d, r, _ in out["edges"]}
    assert (0, 1) in drivers and (2, 3) in drivers


def test_streaming_ingestion_example_stream_equals_batch(spark, sf_small, tmp_path):
    """Every enrichment relation of the ingestion walkthrough must
    produce IDENTICAL rows from a streaming source and a batch read of
    the same shard — the backfill == live guarantee the example
    advertises."""
    sys.path.insert(0, "/root/repo/examples")
    try:
        from streaming_ingestion import build_frozen_artifacts, enrichments, with_demo_urls
    finally:
        sys.path.pop(0)

    from ccm_spark.sources.tables import load_table

    artifacts = build_frozen_artifacts(spark, sf_small)
    docs = with_demo_urls(load_table(spark, sf_small, "documents")).select(
        "doc_id", "url", "text", "lang"
    )
    batch_rels = enrichments(docs, artifacts)
    batch = {
        name: sorted(tuple(r) for r in rel.collect())
        for name, rel in batch_rels.items()
    }

    src = tmp_path / "ingest_src"
    src.mkdir()
    docs.coalesce(2).write.parquet(str(src / "shard0"))
    stream = spark.readStream.schema(docs.schema).parquet(str(src / "shard0"))
    stream_rels = enrichments(stream, artifacts)
    for name, rel in stream_rels.items():
        assert rel.isStreaming, name
        q = (
            rel.writeStream.format("memory")
            .queryName(f"ingest_{name}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = sorted(
            tuple(r) for r in spark.sql(f"select * from ingest_{name}").collect()
        )
        assert got == batch[name], name


def test_crawl_ingest_example_runs(spark, tmp_path):
    """The crawl-ingestion walkthrough must parse all three demo shards
    (including resyncing past the truncated one), honour the robots
    opt-out before content use, dedup the refetched URL, and rank the
    hub every page cites first."""
    sys.path.insert(0, "/root/repo/examples")
    try:
        from crawl_ingest import run, write_demo_crawl
    finally:
        sys.path.pop(0)

    wd = str(tmp_path / "warc")
    write_demo_crawl(wd)
    out = run(spark, wd)
    c = out["counts"]
    assert c["records"] == 8  # 7 pages + robots.txt; truncated shard2: none
    assert c["resync_bytes"] > 0  # but its loss is visible
    assert c["robots_txt_rules"] == 1  # a.com: Disallow /secret
    assert c["sitemap_seeds"] == 1  # a.com/sitemap.xml
    assert c["hosts_with_crawl_delay"] == 1  # a.com: Crawl-delay 3
    assert c["robots_opted_out"] == 1  # meta noindex on b private
    assert c["robots_txt_blocked"] == 1  # a.com/secret.html
    assert c["html_documents"] == 5  # 7 fetches - meta opt-out - disallowed
    assert c["url_duplicate_groups"] == 1  # a.com/ fetched twice
    assert c["unique_urls"] == 4  # 5 docs - 1 refetch
    assert c["curated"] == 4 and c["curated_kept"] == 4
    # hub.com is cited by every page -> ranks first
    assert out["ranking"][0][0] == "hub.com"
    assert {h for h, _ in out["ranking"]} == {"a.com", "b.com", "hub.com"}
    # r12 weighted-HITS readout: hub.com (cited by every page, 4 weighted
    # in-links) is the top AUTHORITY; a.com (3 pages citing hub + 2
    # citing b) is the top HUB — the weighted replay fixed point
    assert c["top_authority_host"] == "hub.com"
    assert c["top_hub_host"] == "a.com"


def test_corpus_monitoring_example_runs(spark, sf_small, tmp_path):
    """The sketch-trio monitoring walkthrough must detect all three
    planted drifts from RELOADED artifacts (docs lost, banner injected,
    doc lengths shrunk) and prove shard-merge == whole-day build."""
    sys.path.insert(0, "/root/repo/examples")
    try:
        from corpus_monitoring import run
    finally:
        sys.path.pop(0)

    out = run(spark, sf_small, str(tmp_path / "arts"))
    # ~10% of docs dropped
    assert out["docs_new_est"] < out["docs_old_est"] * 0.95
    # the planted banner is absent on day A and jumps on day B
    assert out["banner_old"] == 0
    assert out["banner_delta"] > 0
    # halving half the texts pulls the median and p90 down
    assert out["median_len_shift"] < 0
    assert out["p90_len_shift"] < 0
    # mergeable: two shard sketches fold to the whole-day answer
    assert out["merged_median"] == out["whole_median"]
    # r12 combined drift report: the doc-level churn diff must account
    # for every planted mutation exactly — 10% of doc_ids removed,
    # nothing added, and every surviving truncated-or-bannered doc
    # counted as changed (doc_id%2==0 or %3==0, excluding %10==0)
    assert out["docs_added"] == 0
    assert out["docs_removed"] == 50
    want_changed = sum(
        1
        for i in range(500)
        if i % 10 != 0 and (i % 2 == 0 or i % 3 == 0)
    )
    assert out["docs_changed"] == want_changed
    assert out["docs_unchanged"] == 450 - want_changed
    # ...and the distribution divergence must register the drift as a
    # real, finite, symmetric-bounded signal
    assert 0 < out["js_bits"] <= 1.0
    assert out["kl_ab_bits"] > 0 and out["kl_ba_bits"] > 0
    assert out["vocab_union"] > 0


def test_data_selection_example_runs(spark, sf_small):
    """The selection walkthrough composes DSIR + classifier + semantic
    dedup into one deterministic sample: the pool shrinks monotonically
    through the stages, the classifier improves on its weak labels, and
    the selected set is reproducible."""
    sys.path.insert(0, "/root/repo/examples")
    try:
        from data_selection import run
    finally:
        sys.path.pop(0)

    out = run(spark, sf_small)
    assert out["input"] == 500
    assert out["weighted"] == 450  # raw split
    assert out["classifier_loss_last"] < out["classifier_loss_first"]
    assert 0 < out["sem_kept"] <= 500
    assert 0 < out["pool"] <= out["weighted"]
    assert out["selected"] == max(1, out["pool"] // 2)
    # r12 compute-budget cut: quality-ordered prefix inside the token
    # budget, never exceeding it, keeping at least one doc
    assert 0 < out["budget_kept_docs"] <= out["selected"]
    assert 0 < out["budget_used_tokens"] <= out["budget_tokens"]
    # deterministic end to end
    out2 = run(spark, sf_small)
    assert out2["selected_ids_head"] == out["selected_ids_head"]
