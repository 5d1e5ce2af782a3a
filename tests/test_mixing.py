"""Corpus-assembly operators: mixture sampling, sequence packing, PII
redaction. Cross-engine value parity is pinned by check_parity /
CORRECTNESS; these tests pin the operator INVARIANTS."""

from __future__ import annotations

import pyspark.sql.functions as F

from ccm_spark.pipeline.mixing import (
    PACK_BUDGET,
    mixture_sample,
    pack_sequences,
)
from ccm_spark.pipeline.text import redact_pii
from ccm_spark.sources.tables import load_table


def test_mixture_sample_deterministic_and_stratified(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    a = mixture_sample(docs)
    b = mixture_sample(docs)
    rows_a = sorted(r.doc_id for r in a.collect())
    rows_b = sorted(r.doc_id for r in b.collect())
    assert rows_a == rows_b  # partition/order independent

    # rate 1.0 keeps every en doc; lower rates keep strict subsets
    kept = {r.lang: c for r, c in [(x, x["n"]) for x in a.groupBy("lang").agg(F.count("*").alias("n")).collect()]}
    total = {r.lang: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept["en"] == total["en"]
    assert kept["zh"] < total["zh"]

    # a different salt draws a genuinely different sample
    c = mixture_sample(docs, salt="othersalt")
    assert sorted(r.doc_id for r in c.collect()) != rows_a


def test_mixture_sample_is_shuffle_free(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    plan = mixture_sample(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_invariants(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    out = pack_sequences(docs).collect()
    assert len(out) == docs.count()  # every doc placed exactly once

    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r.shard, r.bin_idx), []).append(r)
    for (_, _), members in by_bin.items():
        fill = sum(m.n_tokens for m in members)
        # a bin only exceeds the budget when it holds a single oversized doc
        assert fill <= PACK_BUDGET or len(members) == 1
        # offsets tile the bin contiguously in doc_id order
        members.sort(key=lambda m: m.doc_id)
        expect = 0
        for m in members:
            assert m.bin_offset == expect
            expect += m.n_tokens

    # bin indices are contiguous from 0 within each shard
    shards: dict[int, set] = {}
    for r in out:
        shards.setdefault(r.shard, set()).add(r.bin_idx)
    for bins in shards.values():
        assert bins == set(range(len(bins)))


def test_redact_pii_exact_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@foo-bar.org or 12345678 now"),
            (2, "no pii here, just 12345 short digits"),
            (3, "two mails x@y.io z@w.co and 0000001 111111"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (rows[1].n_emails, rows[1].n_numbers) == (1, 1)
    assert (rows[2].n_emails, rows[2].n_numbers) == (0, 0)
    assert (rows[3].n_emails, rows[3].n_numbers) == (2, 2)
    # redacted text for doc 1: 'mail me at <EMAIL> or <NUM> now'
    assert rows[1].red_len == len("mail me at <EMAIL> or <NUM> now")
