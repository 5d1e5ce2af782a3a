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


def test_global_shuffle_total_order_matches_duckdb(spark, sf_small):
    """Partition index + within-partition order must BE the md5-keyed
    global permutation — replayed independently by a DuckDB ORDER BY on
    the same engine-portable key expression."""
    import duckdb

    from ccm_spark.pipeline.mixing import global_shuffle

    docs = load_table(spark, sf_small, "documents")
    gs = global_shuffle(docs, seed="e1", num_partitions=5)
    rows = gs.select(
        F.spark_partition_id().alias("pid"), "shuffle_key", "doc_id"
    ).collect()
    # within each partition the rows are key-sorted, and partitions hold
    # disjoint ascending key ranges (range partitioner contract)
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append((r.shuffle_key, r.doc_id))
    assert len(by_pid) > 1
    for seq in by_pid.values():
        assert seq == sorted(seq)
    bounds = sorted((min(seq), max(seq), pid) for pid, seq in by_pid.items())
    for (_, hi, _), (lo, _, _) in zip(bounds, bounds[1:]):
        assert hi <= lo
    # collect() concatenates partitions in index order — flatten that way
    got = []
    for pid in sorted(by_pid):
        got.extend(d for _, d in by_pid[pid])
    want = [
        int(d)
        for (d,) in duckdb.sql(
            f"""
SELECT doc_id FROM read_parquet('{sf_small}/documents.parquet')
ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf:e1'), 1, 15)) AS BIGINT), doc_id
"""
        ).fetchall()
    ]
    assert got == want
    # a new seed draws a different permutation of the same multiset
    gs2 = global_shuffle(docs, seed="e2", num_partitions=5)
    got2 = [r.doc_id for r in gs2.select("doc_id").collect()]
    assert sorted(got2) == sorted(got) and got2 != got


def test_stratified_sample_exact_counts_and_membership(spark, sf_small):
    """Exactly n per group (or the whole group when smaller), membership
    replayed by a DuckDB window over the same md5 keys, invariant under
    repartitioning."""
    import duckdb

    from ccm_spark.pipeline.mixing import stratified_sample

    docs = load_table(spark, sf_small, "documents")
    n = 20
    out = stratified_sample(docs, n_per_group=n, salt="s9")
    got = sorted((r.lang, r.doc_id, r.sample_rank) for r in out.collect())
    sizes = {r.lang: r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    per_group: dict[str, int] = {}
    for lang, _, _ in got:
        per_group[lang] = per_group.get(lang, 0) + 1
    assert per_group == {lang: min(n, c) for lang, c in sizes.items()}
    want = sorted(
        (lang, int(d), int(rk))
        for lang, d, rk in duckdb.sql(
            f"""
SELECT lang, doc_id,
       row_number() OVER (
         PARTITION BY lang
         ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':s9'), 1, 15)) AS BIGINT), doc_id
       ) AS rk
FROM read_parquet('{sf_small}/documents.parquet')
QUALIFY rk <= {n}
"""
        ).fetchall()
    )
    assert got == want
    reparts = stratified_sample(docs.repartition(7), n_per_group=n, salt="s9")
    assert sorted((r.lang, r.doc_id, r.sample_rank) for r in reparts.collect()) == got


def test_budget_select_matches_duckdb_cumsum(spark, sf_small):
    """The bucket-histogram + boundary-refinement plan must keep EXACTLY
    the docs a global cumulative window keeps (inclusive running token
    total in (sample_key, doc_id) order <= group budget), for budgets
    that land mid-bucket, and stay invariant under bucket count and
    repartitioning."""
    import duckdb

    from ccm_spark.functions.hashing import sql_tokens
    from ccm_spark.pipeline.mixing import budget_select

    docs = load_table(spark, sf_small, "documents")
    budgets = {"en": 5000, "de": 1, "fr": 10**12}  # mid-bucket, tiny, all
    out = budget_select(docs, budgets, salt="b7")
    got = sorted((r.lang, r.doc_id, r.n_tokens) for r in out.collect())

    cases = " ".join(f"WHEN '{g}' THEN {b}" for g, b in budgets.items())
    want = sorted(
        (g, int(d), int(n))
        for g, d, n in duckdb.sql(
            f"""
WITH keyed AS (
  SELECT lang, doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':b7'), 1, 15)) AS BIGINT) AS k,
         len({sql_tokens('text')}) AS n
  FROM read_parquet('{sf_small}/documents.parquet')
  WHERE lang IN ('en', 'de', 'fr')
),
c AS (
  SELECT lang, doc_id, n,
         sum(n) OVER (PARTITION BY lang ORDER BY k, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM keyed
)
SELECT lang, doc_id, n FROM c
WHERE cum <= CASE lang {cases} END
"""
        ).fetchall()
    )
    assert got == want
    # the fr budget exceeds the whole group: every fr doc kept
    n_fr = docs.where("lang = 'fr'").count()
    assert sum(1 for g, _, _ in got if g == "fr") == n_fr
    # en budget is partial, de keeps at most its smallest-keyed doc
    assert 0 < sum(1 for g, _, _ in got if g == "en") < docs.where("lang='en'").count()
    # invariant under bucket granularity and input partitioning
    alt = budget_select(docs.repartition(7), budgets, salt="b7", n_buckets_log2=5)
    assert sorted((r.lang, r.doc_id, r.n_tokens) for r in alt.collect()) == got


def test_budget_select_degenerate_keeps_group_col_contract(spark, sf_small):
    """No budgeted group present (or empty budget dict) -> an EMPTY result
    with the SAME columns as the main path (group_col restored — callers
    selecting by it must not hit AnalysisException only in the empty
    case) and an empty _ccm_persisted for uniform release_cached."""
    from ccm_spark.pipeline.mixing import budget_select
    from ccm_spark.plans.cross_map import release_cached

    docs = load_table(spark, sf_small, "documents")
    for budgets in ({}, {"zz_no_such_lang": 1000}):
        out = budget_select(docs, budgets)
        assert out.columns == ["lang", "doc_id", "sample_key", "n_tokens"]
        assert out.select("lang").count() == 0
        assert getattr(out, "_ccm_persisted") == []
        release_cached(out)


def test_with_global_positions_is_the_permutation(spark, sf_small):
    """global_pos must be 0..N-1 and rank rows exactly by the shuffle
    order (shuffle_key, doc_id) — and the stamp pass must add no
    exchange beyond the shuffle itself."""
    from ccm_spark.pipeline.mixing import global_shuffle, with_global_positions

    docs = load_table(spark, sf_small, "documents")
    gs = global_shuffle(docs, seed="gp1", num_partitions=5).persist()
    try:
        out = with_global_positions(gs)
        rows = out.select("global_pos", "shuffle_key", "doc_id").collect()
        n = docs.count()
        assert sorted(r.global_pos for r in rows) == list(range(n))
        by_pos = sorted(rows, key=lambda r: r.global_pos)
        keys = [(r.shuffle_key, r.doc_id) for r in by_pos]
        assert keys == sorted(keys)
        # the stamp pass is narrow: no Exchange ABOVE the cached shuffle
        # (the InMemoryRelation's stored plan text repeats the range
        # exchange — only the segment above it is the stamp's own plan)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.split("InMemoryRelation")[0].count("Exchange") == 0
    finally:
        gs.unpersist()


def test_budget_select_caches_the_keyed_projection(spark, sf_small):
    """Regression pin for the single-scan fix: the selection plan must
    read the cached keyed relation (InMemoryTableScan), not re-run the
    scan+tokenise chain, and the cache handle must be released via the
    _ccm_persisted convention."""
    from ccm_spark.pipeline.mixing import budget_select
    from ccm_spark.plans.cross_map import release_cached

    docs = load_table(spark, sf_small, "documents")
    out = budget_select(docs, {"en": 5000, "de": 1000})
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        # the stamping side reads the cache, so the interpreted tokenizer
        # appears only inside the cached relation's stored plan
        above_cache = plan.split("InMemoryRelation")[0]
        assert "split(lower(" not in above_cache
        assert getattr(out, "_ccm_persisted", [])
    finally:
        release_cached(out)


def test_temperature_rates_closed_form_and_composition(spark, sf_small):
    """tau=1 -> every rate exactly 1 (natural distribution, scale kept);
    tau<1 -> small groups upsampled above large ones; rates match the
    closed form and compose with mixture_sample to the expected totals."""
    import pytest

    from ccm_spark.pipeline.mixing import mixture_sample, temperature_rates

    docs = load_table(spark, sf_small, "documents")
    counts = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    total = sum(counts.values())

    natural = temperature_rates(docs, tau=1.0)
    assert set(natural) == set(counts)
    for g, rate in natural.items():
        assert rate == pytest.approx(1.0)

    tau = 0.5
    rates = temperature_rates(docs, tau=tau)
    mass = {g: (n / total) ** tau for g, n in counts.items()}
    z = sum(mass.values())
    for g in counts:
        assert rates[g] == pytest.approx(mass[g] / z * total / counts[g])
    # smaller groups get strictly larger per-doc rates
    ordered = sorted(counts, key=counts.get)
    assert rates[ordered[0]] > rates[ordered[-1]]
    # expected doc mass is conserved: sum(n_g * rate_g) == total
    assert sum(counts[g] * rates[g] for g in counts) == pytest.approx(total)
    # composes with the sampler: realized copies hit the expectation
    # within the bernoulli noise of the fractional parts
    out = mixture_sample(docs, rates, fallback_rate=0.0, salt="temp1")
    realized = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for g in counts:
        expect = counts[g] * rates[g]
        assert abs(realized.get(g, 0) - expect) <= 4 * (expect ** 0.5) + 2, g
    with pytest.raises(ValueError, match="tau"):
        temperature_rates(docs, tau=0.0)


def test_score_weighted_sample_rates_and_determinism(spark):
    """Acceptance tracks score^gamma within binomial noise, the kept set
    is partitioning-invariant, NULL scores fall to the floor, and
    guards raise."""
    import pytest

    from ccm_spark.pipeline.mixing import score_weighted_sample

    n = 4000
    rows = [(i, (i % 100) / 100.0) for i in range(n)] + [(n, None)]
    df = spark.createDataFrame(rows, "doc_id long, model_score double")
    out = score_weighted_sample(df, gamma=1.0, floor_rate=0.0)
    kept = {r.doc_id for r in out.collect() if r.keep}
    # overall acceptance ~ mean score = ~0.495; binomial sd ~ 0.008
    rate = len(kept) / n
    assert abs(rate - 0.495) < 0.03
    # high scores keep much more often than low scores
    hi = sum(1 for i in kept if i % 100 >= 90) / (n // 100 * 10)
    lo = sum(1 for i in kept if i % 100 < 10) / (n // 100 * 10)
    assert hi > 0.85 and lo < 0.15
    # NULL score with floor 0 -> never kept; with floor 1 -> always
    assert n not in kept
    out_floor = score_weighted_sample(df, floor_rate=1.0)
    assert all(r.keep for r in out_floor.collect())
    # deterministic under repartitioning
    again = {
        r.doc_id
        for r in score_weighted_sample(df.repartition(13)).collect()
        if r.keep
    }
    assert again == kept
    with pytest.raises(ValueError, match="gamma"):
        score_weighted_sample(df, gamma=0)
    with pytest.raises(ValueError, match="floor_rate"):
        score_weighted_sample(df, floor_rate=2.0)


def test_train_eval_split_is_deterministic_and_leak_free(spark):
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.mixing import train_eval_split

    base = " ".join(f"tok{i}" for i in range(30))
    rows = [(i, f"{base} doc {i} unique tail {i * 7}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train, ev, leaks = train_eval_split(docs, eval_frac=0.1, salt="t1")

    tr_ids = {r.doc_id for r in train.select("doc_id").collect()}
    ev_ids = {r.doc_id for r in ev.select("doc_id").collect()}
    assert tr_ids.isdisjoint(ev_ids)
    # the shared 30-token prefix makes EVERY train doc leak vs eval
    assert leaks.count() == 200 - len(ev_ids) and len(tr_ids) == 0

    # distinct tails only -> no leaks, split covers the corpus
    rows2 = [(i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(12)))
             for i in range(200)]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    t2, e2, l2 = train_eval_split(docs2, eval_frac=0.1, salt="t1")
    t2_ids = {r.doc_id for r in t2.select("doc_id").collect()}
    e2_ids = {r.doc_id for r in e2.select("doc_id").collect()}
    assert l2.count() == 0
    assert t2_ids | e2_ids == set(range(200)) and t2_ids.isdisjoint(e2_ids)
    assert 5 <= len(e2_ids) <= 40  # ~10% under the md5 key

    # same salt -> same split, regardless of partitioning
    t3, e3, _ = train_eval_split(docs2.repartition(7), eval_frac=0.1, salt="t1")
    assert {r.doc_id for r in e3.select("doc_id").collect()} == e2_ids

    import pytest as _pytest

    with _pytest.raises(ValueError, match="eval_frac"):
        train_eval_split(docs2, eval_frac=1.5)


def test_grouped_split_colocates_groups_and_holds_fractions(spark):
    """Leakage-safe by construction: every member of a group gets the
    SAME split; expected fractions hold over many groups; NULL groups
    stay together; guards fire."""
    import pyspark.sql.functions as F
    import pytest

    from ccm_spark.pipeline.mixing import grouped_split

    rows = [(i, f"dom{i % 200}" if i % 17 else None) for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, domain string")
    out = grouped_split(docs, "domain", {"train": 0.8, "val": 0.1, "test": 0.1})
    # one split per group
    per_group = (
        out.groupBy("domain")
        .agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert per_group == 1
    # fractions approximately hold over the 200 domains (by doc count)
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 2000 == pytest.approx(0.8, abs=0.12)
    # deterministic across partitionings
    out2 = grouped_split(docs.repartition(7), "domain", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert {(r.doc_id, r.split) for r in out2.collect()} == {
        (r.doc_id, r.split) for r in out.collect()
    }
    with pytest.raises(ValueError, match="sum to 1"):
        grouped_split(docs, "domain", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="non-empty"):
        grouped_split(docs, "domain", {})


def test_top_fraction_exact_count_and_order(spark):
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.mixing import top_fraction

    d = spark.createDataFrame(
        [(i, float((i * 37) % 10)) for i in range(20)], "doc_id long, s double"
    )
    out = top_fraction(d, "s", 0.25).collect()
    assert len(out) == 5  # ceil(0.25 * 20)
    # ranked by (round6(s) desc, doc_id asc), dense 1..k
    assert sorted(r.rank for r in out) == [1, 2, 3, 4, 5]
    ordered = sorted(out, key=lambda r: r.rank)
    assert all(a.s >= b.s for a, b in zip(ordered, ordered[1:]))
    # ties break by doc_id: scores repeat every 10 ids, so rank1/rank2
    # share a score and must be id-ordered
    assert ordered[0].s == ordered[1].s and ordered[0].doc_id < ordered[1].doc_id
    # frac=1 keeps everything; invalid fracs rejected
    assert top_fraction(d, "s", 1.0).count() == 20
    import pytest as _pt

    with _pt.raises(ValueError):
        top_fraction(d, "s", 0.0)
    # empty input -> empty output, schema intact
    empty = top_fraction(d.where("doc_id < 0"), "s", 0.5)
    assert empty.count() == 0 and "rank" in empty.columns


def test_top_fraction_matches_duckdb_twin(spark, sf_small):
    """quality-score top-quartile selection pinned cross-engine (r12
    gate candidate, QUERIES.md)."""
    import duckdb
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.mixing import top_fraction
    from ccm_spark.pipeline.text import quality_score
    from ccm_spark.plans.oracle_sql_ext import sql_top_fraction

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    scored = quality_score(docs)
    out = top_fraction(scored, "quality", 0.25).select(
        "doc_id",
        (F.round("quality", 6) + F.lit(0.0)).alias("quality"),
        "rank",
    )
    got = sorted((r.doc_id, r.quality, r.rank) for r in out.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), float(b), int(c))
        for a, b, c in con.sql(sql_top_fraction(0.25)).fetchall()
    )
    assert len(got) == len(want) == 125  # ceil(0.25 * 500)
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, mism[:5]


def test_packing_efficiency_hand_built(spark):
    from ccm_spark.pipeline.mixing import packing_efficiency

    d = spark.createDataFrame(
        [(0, "a " * 10), (1, "b " * 100), (2, "")],  # 10, 100, 0 tokens
        "doc_id long, text string",
    )
    rows = {r.seq_len: r for r in packing_efficiency(d, (64,)).collect()}
    r = rows[64]
    # ceil(10/64)=1, ceil(100/64)=2, ceil(0/64)=0 -> 3 sequences, 192 slots
    assert r.n_docs == 3 and r.total_tokens == 110
    assert r.n_sequences == 3 and r.padded_tokens == 192 - 110
    assert r.waste_frac == round((192 - 110) / 192, 6)
    import pytest as _pt

    with _pt.raises(ValueError):
        packing_efficiency(d, ())
    with _pt.raises(ValueError):
        packing_efficiency(d, (0,))


def test_packing_efficiency_matches_duckdb_twin(spark, sf_small):
    import duckdb

    from ccm_spark.pipeline.mixing import packing_efficiency
    from ccm_spark.plans.oracle_sql_ext import sql_packing_efficiency

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(tuple(r) for r in packing_efficiency(docs).collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(c), int(d), int(e), float(f))
        for a, b, c, d, e, f in con.sql(sql_packing_efficiency()).fetchall()
    )
    assert len(got) == len(want) == 3
    assert got == want
    # longer sequences waste more on this short-doc corpus
    waste = {r[0]: r[5] for r in got}
    assert waste[512] > waste[128]


# ------------------------------------------------- token-budget selection


def test_select_within_token_budget_hand_built(spark):
    from ccm_spark.pipeline.mixing import select_within_token_budget

    # (doc_id, tokens, score): order by score desc -> 2 (5 tok), 0 (3),
    # 3 (4), 1 (2); budget 9 keeps 2 and 0 (8 cum), doc 3 overflows and
    # the STRICT prefix rule drops everything after it too
    rows = [
        (0, "a b c", 0.8),
        (1, "x y", 0.2),
        (2, "p q r s t", 0.9),
        (3, "m n o p", 0.5),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, score double")
    got = sorted(
        (r.doc_id, r.n_tokens, r.sel_rank, r.cum_tokens)
        for r in select_within_token_budget(d, budget=9, score_col="score").collect()
    )
    assert got == [(0, 3, 2, 8), (2, 5, 1, 5)]
    # FIFO variant (no score): doc_id order
    fifo = sorted(
        (r.doc_id, r.sel_rank, r.cum_tokens)
        for r in select_within_token_budget(d, budget=6).collect()
    )
    assert fifo == [(0, 1, 3), (1, 2, 5)]
    # budget 0 / tiny budget -> empty (first doc already over)
    assert select_within_token_budget(d, budget=2, score_col="score").count() == 0


def test_select_within_token_budget_matches_duckdb_twin(spark, sf_small):
    import duckdb

    from ccm_spark.functions.hashing import tokens_col
    from ccm_spark.pipeline.mixing import select_within_token_budget
    from ccm_spark.plans.oracle_sql_ext import sql_select_within_token_budget

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    # score: token count as a double — same expression both engines
    scored = docs.withColumn(
        "score", F.size(tokens_col("text")).cast("double")
    )
    budget = 5_000
    got = sorted(
        (r.doc_id, r.n_tokens, r.sel_rank, r.cum_tokens)
        for r in select_within_token_budget(
            scored, budget=budget, score_col="score"
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    from ccm_spark.functions.hashing import sql_tokens

    want = sorted(
        (int(a), int(b), int(c), int(d_))
        for a, b, c, d_ in con.sql(
            sql_select_within_token_budget(
                budget, score_expr=f"CAST(len({sql_tokens('text')}) AS DOUBLE)"
            )
        ).fetchall()
    )
    assert got and got == want
    # invariants: contiguous ranks from 1, monotone cum inside budget
    ranks = sorted(r[2] for r in got)
    assert ranks == list(range(1, len(got) + 1))
    assert max(r[3] for r in got) <= budget
