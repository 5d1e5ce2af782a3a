from ccm_spark.sources.tables import load_table, events_pair_series
from ccm_spark.sources.jsonl import (
    documents_jsonl_stream,
    read_documents_jsonl,
    write_documents_jsonl,
)
from ccm_spark.sources.warc import read_warc, warc_html_documents

__all__ = [
    "load_table",
    "events_pair_series",
    "documents_jsonl_stream",
    "read_documents_jsonl",
    "write_documents_jsonl",
    "read_warc",
    "warc_html_documents",
]
