"""Ingestion-time enrichment — the STREAMING half of the corpus story:
every operator here is append-mode-safe (narrow Arrow/codegen passes and
stream-static joins, zero state), so a new crawl shard is scored,
tagged, and dedup-flagged AGAINST FROZEN ARTIFACTS the moment it lands,
before any batch job runs.

    python examples/streaming_ingestion.py

``enrichments`` builds five relations from one source, each keyed by
doc_id — the way real pipelines lay out enrichment tables (one relation
per signal family, joined at READ time where joins are cheap, rather
than stream-stream-joined at write time, which would demand watermark
state for no benefit):
  url     (canonical URL + probe of the persisted URL index)
  quality (rule-filter verdict + signals)
  moji    (encoding-damage score)
  ppl     (perplexity under the frozen reference bigram LM)
  clf     (frozen hashed-classifier quality score)

Every relation runs IDENTICALLY on a batch DataFrame or a streaming
source — ``tests/test_example_pipeline.py`` pins stream == batch for
each, which is the operational guarantee: backfills and live ingestion
produce byte-identical enrichment.
"""

from __future__ import annotations


def build_frozen_artifacts(spark, sf_dir: str) -> dict:
    """The corpus-side state an ingestion pipeline probes against —
    built once from yesterday's corpus, then FROZEN."""
    from ccm_spark.pipeline.lm import train_bigram_lm
    from ccm_spark.pipeline.text import classifier_weights
    from ccm_spark.pipeline.urls import url_index
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return {
        "url_index": url_index(with_demo_urls(docs).select("doc_id", "url")),
        "lm": train_bigram_lm(docs, vocab_size=1000, max_bigrams=5000),
        "clf_weights": classifier_weights(log2_features=14),
    }


def with_demo_urls(docs):
    """The testdata has no URL column; synthesise a deterministic one
    (doc_id-keyed) so the URL stages have something real to chew on."""
    import pyspark.sql.functions as F

    return docs.withColumn(
        "url",
        F.concat(
            F.lit("http://example"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/page/"),
            (F.col("doc_id") % 50).cast("string"),
        ),
    )


def enrichments(docs, artifacts: dict) -> dict:
    """The five enrichment relations over (doc_id, url, text, lang)
    rows — every one narrow or stream-static, so the SAME code serves
    batch backfills and streaming ingestion."""
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.lm import perplexity
    from ccm_spark.pipeline.text import (
        classifier_score,
        mojibake_signals,
        quality_filter,
    )
    from ccm_spark.pipeline.urls import probe_url_index

    return {
        "url": probe_url_index(docs, artifacts["url_index"]).select(
            "doc_id", "url_norm", F.col("is_known").alias("url_seen_before")
        ),
        "quality": quality_filter(docs).select("doc_id", "n_tokens", "keep"),
        "moji": mojibake_signals(docs).select("doc_id", "mojibake_frac"),
        "ppl": perplexity(docs, artifacts["lm"]).select("doc_id", "perplexity"),
        "clf": classifier_score(
            docs, weights=artifacts["clf_weights"], log2_features=14
        ),
    }


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ccm_spark.session import get_spark
    from ccm_spark.sources.tables import load_table

    spark = get_spark("streaming-ingestion-demo")
    sf_dir = "/root/testdata/sf0.001"
    artifacts = build_frozen_artifacts(spark, sf_dir)
    docs = with_demo_urls(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "url", "text", "lang"
    )
    rels = enrichments(docs, artifacts)
    # batch mode: join at read time (cheap, doc_id-keyed) for display
    out = rels["url"]
    for name in ("quality", "moji", "ppl", "clf"):
        out = out.join(rels[name], "doc_id")
    out.orderBy("doc_id").show(10, truncate=40)
