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


def test_mixture_sample_upsamples_exact_multiset(spark, sf_small):
    """Rates > 1 (epoch repetition): the exact (doc_id, copy_idx) multiset
    must match an independent DuckDB replay of the md5-threshold rule —
    floor(r) copies always, one more iff key < frac(r)*MOD."""
    import duckdb

    from ccm_spark.pipeline.mixing import MIX_MOD

    rates = {"en": 2.3, "de": 1.0, "fr": 0.5}
    docs = load_table(spark, sf_small, "documents")
    out = mixture_sample(docs, rates=rates, fallback_rate=0.1, salt="up1")
    got = sorted((r.doc_id, r.copy_idx) for r in out.collect())

    chain = " ".join(
        f"WHEN '{lang}' THEN {int(round(rate * MIX_MOD))}"
        for lang, rate in sorted(rates.items())
    )
    sf_small_path = sf_small + "/documents.parquet"
    want = sorted(
        (int(d), int(c))
        for d, c in duckdb.sql(
            f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':up1'), 1, 15)) AS BIGINT) % {MIX_MOD} AS BIGINT) AS k,
         CAST(CASE lang {chain} ELSE {int(round(0.1 * MIX_MOD))} END AS BIGINT) AS thr
  FROM read_parquet('{sf_small_path}')
),
counted AS (
  SELECT doc_id, thr // {MIX_MOD} + CASE WHEN k < thr % {MIX_MOD} THEN 1 ELSE 0 END AS n
  FROM keyed
)
SELECT doc_id, unnest(range(n)) AS copy_idx FROM counted WHERE n > 0
"""
        ).fetchall()
    )
    assert got == want
    # E[copies] = r: en docs appear 2 or 3 times each, de exactly once
    per_doc = {}
    for d, _ in got:
        per_doc[d] = per_doc.get(d, 0) + 1
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    for d, n in per_doc.items():
        if langs[d] == "en":
            assert n in (2, 3)
        elif langs[d] == "de":
            assert n == 1


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
