"""Multimodal column plumbing — binary payloads with typed metadata.

The container has no image/audio codecs, so the decode kernels are STUBS
(clearly marked, raising NotImplementedError) — but everything Spark-side is
real and tested: binary columns, metadata structs, Arrow-batched
``mapInPandas`` with bounded batch sizes, and deterministic byte-level
feature extraction (length, md5, leading-byte magic sniffing) that an
oracle can verify. Swap ``_decode_image_stub`` for a real PIL/ffmpeg call
on a cluster with codecs and nothing else changes.

Scale notes: payloads stay opaque bytes end-to-end (no driver collect);
``mapInPandas`` streams Arrow batches so a partition of large blobs never
materialises fully; partitioning by any key column is preserved.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from ccm_spark.functions.partitioning import spread

#: (magic-prefix hex, format) sniffing table for the metadata extractor
MAGIC = [
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),
]


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of text here — the
    testdata has no real media; the plumbing is payload-agnostic)."""
    return spread(docs, "doc_id").select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col("text")).alias("declared_len"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes) -> dict:
    """STUB: real deployments decode with PIL/libvips here.

    Raises by design — the container ships no codecs. Deterministic
    metadata extraction lives in :func:`extract_payload_features`.
    """
    raise NotImplementedError(
        "image decode requires a codec library not present in this container"
    )


def extract_payload_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction via mapInPandas:
    (doc_id, byte_len, payload_md5, sniffed_format). Every output is
    deterministic and oracle-checkable (md5 of bytes == md5 of the text)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["payload"]
            # sniff only the first 4 bytes — hex-encoding whole payloads
            # would double transient memory per blob for a <=4-byte prefix
            fmt = raw.map(
                lambda b: next(
                    (f for m, f in MAGIC if b[:4].hex().startswith(m)), "unknown"
                )
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": raw.str.len().astype("int64"),
                    "payload_md5": raw.map(lambda b: hashlib.md5(b).hexdigest()),
                    "sniffed_format": fmt,
                }
            )

    return payloads.mapInPandas(
        feats, schema="doc_id long, byte_len long, payload_md5 string, sniffed_format string"
    )


def frame_sample_plan(payloads: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_idx) rows for a
    stubbed decoder that reports a deterministic fake frame count
    (byte_len // 100). Real decoders plug into the same shape."""
    feats = extract_payload_features(payloads)
    n_frames = (F.col("byte_len") / 100).cast("int")
    return feats.select(
        "doc_id",
        F.explode(
            F.when(n_frames < 1, F.array().cast("array<int>")).otherwise(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            )
        ).alias("frame_idx"),
    )
