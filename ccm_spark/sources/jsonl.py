"""JSONL document source/sink — the interchange format LLM corpora ship in.

The reference has no file-format surface at all (it consumes in-memory
lists, lib/ccm.ex:26); this is extension surface for the training-data
pipeline: corpora arrive as JSON-lines shards, get cleaned/deduped, and
leave as parquet. Reads are schema-explicit (no inference pass — at 100 TB
an inference scan is a full extra read of the corpus), splittable per
file, and work identically as batch or streaming sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: canonical documents schema (matches the testdata parquet tables).
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def write_documents_jsonl(docs: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write documents as JSONL shards. ``n_files`` bounds output shard
    count (round-robin repartition — content-independent, so no skew)."""
    if n_files is not None:
        docs = docs.repartition(n_files)
    docs.write.mode("overwrite").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Batch read with the explicit documents schema."""
    return spark.read.schema(DOCS_SCHEMA).json(path)


def documents_jsonl_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming read of a JSONL corpus directory — new shards are picked
    up as they land (continuous ingestion). Schema-explicit for the same
    reason as the batch read."""
    return spark.readStream.schema(DOCS_SCHEMA).json(path)
