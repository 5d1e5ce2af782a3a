"""Bloom-filter decontamination: the no-broadcast-set scale path must be
bit-identical to the exact operator (no false negatives + exact verify),
and the flag-only probe must be a superset that works on a stream."""

from __future__ import annotations

import numpy as np

from ccm_spark.functions.hashing import bloom_positions
from ccm_spark.pipeline.dedup import (
    _bloom_filter_words,
    decontaminate,
    decontaminate_bloom,
)
from ccm_spark.plans.cross_map import release_cached
from ccm_spark.sources.tables import load_table


def _split(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    return docs.where("doc_id % 31 != 0"), docs.where("doc_id % 31 = 0")


def test_bloom_exact_verify_matches_decontaminate(spark, sf_small):
    train, ev = _split(spark, sf_small)
    expected = sorted(
        tuple(r) for r in decontaminate(train, ev).collect()
    )
    assert any(r[2] for r in expected)  # real contamination exists
    out = decontaminate_bloom(train, ev)
    got = sorted(tuple(r) for r in out.collect())
    release_cached(out)
    assert got == expected


def test_bloom_exact_under_heavy_false_positives(spark, sf_small):
    """A deliberately tiny filter (2^10 bits for ~1e5 eval shingles —
    nearly every probe is a false positive) must STILL produce exact
    results: the verify join adjudicates every flagged doc."""
    train, ev = _split(spark, sf_small)
    expected = sorted(tuple(r) for r in decontaminate(train, ev).collect())
    out = decontaminate_bloom(train, ev, log2_m=10, n_hashes=2)
    got = sorted(tuple(r) for r in out.collect())
    release_cached(out)
    assert got == expected


def test_bloom_flag_only_is_superset(spark, sf_small):
    train, ev = _split(spark, sf_small)
    exact = {
        r.doc_id for r in decontaminate(train, ev).collect() if r.contaminated
    }
    probe = decontaminate_bloom(train, ev, exact_verify=False)
    assert probe.columns == ["doc_id", "n_bloom_hits", "maybe_contaminated"]
    flagged = {
        r.doc_id for r in probe.collect() if r.maybe_contaminated
    }
    # no false negatives: every truly contaminated doc is flagged
    assert exact <= flagged


def test_bloom_words_match_positions(spark, sf_small):
    """The distributed build sets exactly the bits bloom_positions says —
    pinned against a driver-side numpy replay of the same shingle set."""
    from ccm_spark.pipeline.dedup import shingles

    _, ev = _split(spark, sf_small)
    sh = shingles(ev).select("shingle_hash").distinct()
    hashes = [r.shingle_hash for r in sh.collect()]
    words = _bloom_filter_words(sh, log2_m=16, n_hashes=3)
    expected = np.zeros(1 << 10, dtype=np.uint64)
    pos = bloom_positions(hashes, 3, 16).ravel()
    np.bitwise_or.at(
        expected,
        (pos >> np.uint64(6)).astype(np.int64),
        np.uint64(1) << (pos & np.uint64(63)),
    )
    assert (words == expected).all()


def test_bloom_streaming_probe_matches_batch(spark, sf_small, tmp_path):
    """The flag-only probe is a narrow projection, so it runs unchanged on
    a streaming source and emits the batch verdicts."""
    from ccm_spark.sources.jsonl import (
        documents_jsonl_stream,
        write_documents_jsonl,
    )

    train, ev = _split(spark, sf_small)
    expected = {
        (r.doc_id, r.n_bloom_hits, r.maybe_contaminated)
        for r in decontaminate_bloom(train, ev, exact_verify=False).collect()
    }
    path = str(tmp_path / "train_jsonl")
    write_documents_jsonl(train, path, n_files=2)
    stream = documents_jsonl_stream(spark, path)
    flagged = decontaminate_bloom(stream, ev, exact_verify=False)
    assert flagged.isStreaming
    q = (
        flagged.writeStream.format("memory")
        .queryName("bloom_decontam")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_bloom_hits, r.maybe_contaminated)
        for r in spark.sql(
            "SELECT doc_id, n_bloom_hits, maybe_contaminated FROM bloom_decontam"
        ).collect()
    }
    assert got == expected


def test_bloom_exact_verify_rejects_stream(spark, sf_small, tmp_path):
    import pytest

    from ccm_spark.sources.jsonl import (
        documents_jsonl_stream,
        write_documents_jsonl,
    )

    train, ev = _split(spark, sf_small)
    path = str(tmp_path / "train_jsonl2")
    write_documents_jsonl(train, path, n_files=1)
    stream = documents_jsonl_stream(spark, path)
    with pytest.raises(ValueError, match="exact_verify"):
        decontaminate_bloom(stream, ev, exact_verify=True)


def test_contamination_report_matches_duckdb(spark, sf_small):
    """The eval-side report must match an independent DuckDB replay of
    the shingle-overlap aggregation on the real corpus."""
    import duckdb

    from ccm_spark.pipeline.dedup import contamination_report

    from ccm_spark.plans.oracle_sql_ext import _shingle_ctes

    from ccm_spark.plans.cross_map import release_cached

    train, ev = _split(spark, sf_small)
    rep = contamination_report(train, ev)
    got = sorted(tuple(r) for r in rep.collect())
    release_cached(rep)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(c), float(d), int(e),
         int(f) if f is not None else None,
         int(g) if g is not None else None)
        for a, b, c, d, e, f, g in con.sql(
            f"""
WITH {_shingle_ctes()},
ev_sh AS (
  SELECT * FROM sh WHERE doc_id % 31 = 0
),
tr_sh AS (
  SELECT * FROM sh WHERE doc_id % 31 != 0
),
sizes AS (
  SELECT doc_id AS eval_doc_id, count(*) AS n_shingles FROM ev_sh GROUP BY 1
),
hits AS (
  SELECT e.doc_id AS eval_doc_id,
         count(DISTINCT e.shingle_hash) AS n_hit,
         count(DISTINCT t.doc_id) AS n_train
  FROM ev_sh e JOIN tr_sh t USING (shingle_hash)
  GROUP BY 1
),
pairs AS (
  SELECT e.doc_id AS eval_doc_id, t.doc_id AS train_doc_id,
         count(DISTINCT e.shingle_hash) AS n_overlap
  FROM ev_sh e JOIN tr_sh t USING (shingle_hash)
  GROUP BY 1, 2
),
worst AS (
  SELECT eval_doc_id,
         first(train_doc_id ORDER BY n_overlap DESC, train_doc_id ASC) AS worst_id,
         max(n_overlap) AS worst_n
  FROM pairs GROUP BY 1
)
SELECT s.eval_doc_id, s.n_shingles,
       coalesce(h.n_hit, 0), round(coalesce(h.n_hit, 0) / s.n_shingles, 6),
       coalesce(h.n_train, 0), w.worst_id, w.worst_n
FROM sizes s LEFT JOIN hits h USING (eval_doc_id)
LEFT JOIN worst w USING (eval_doc_id)
"""
        ).fetchall()
    )
    assert got == want
    assert any(r[2] > 0 for r in got)  # real leakage exists in the corpus


def test_bloom_probe_plan_is_narrow(spark, sf_small):
    """The flag-only probe must stay a pure narrow pipeline: the only
    exchange allowed is the explicit spread repartition of the single-file
    local input — no aggregation or join may appear."""
    train, ev = _split(spark, sf_small)
    probe = decontaminate_bloom(train, ev, exact_verify=False)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan
    assert plan.count("Exchange") <= 1  # the spread() repartition only


def test_bloom_empty_eval_corpus_flags_nothing(spark, sf_small):
    """Degenerate input: an empty eval corpus builds an all-zero filter
    and every training doc comes back clean, in both modes."""
    train, ev = _split(spark, sf_small)
    empty = ev.where("doc_id < 0")
    out = decontaminate_bloom(train, empty)
    rows = out.collect()
    release_cached(out)
    assert len(rows) == train.count()
    assert all(not r.contaminated and r.n_contaminated_shingles == 0 for r in rows)
    probe = decontaminate_bloom(train, empty, exact_verify=False).collect()
    assert all(not r.maybe_contaminated for r in probe)


def test_decontaminate_neardup_flags_paraphrased_copy(spark):
    """A lightly-edited eval copy of a training doc is flagged with a
    high signature estimate against ITS source; unrelated training docs
    are not flagged; the verdict matches a driver replay through the
    already-pinned incremental probe."""
    from ccm_spark.pipeline.dedup import (
        dedup_against_index,
        decontaminate_neardup,
        minhash_index,
    )

    def words(prefix, n):
        return " ".join(f"{prefix}{i}" for i in range(n))

    src = words("shared", 40)
    train = spark.createDataFrame(
        [
            (1, src + " " + words("trail", 5)),     # near-dup of eval 100
            (2, words("other", 45)),                # unrelated
            (3, words("third", 45)),                # unrelated
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, src + " " + words("edited", 5)), (101, words("quiz", 30))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontaminate_neardup(train, ev, 0.5).collect()}
    assert out[1].near_contaminated and out[1].best_eval_doc_id == 100
    assert out[1].est_jaccard >= 0.5
    assert not out[2].near_contaminated and out[2].best_eval_doc_id is None
    assert not out[3].near_contaminated
    # replay through the pinned probe primitive: same pairs, same max
    idx = minhash_index(ev)
    pairs = {
        (r.new_doc_id, r.index_doc_id): r.est_jaccard
        for r in dedup_against_index(
            train, idx, 0.5, broadcast_increment=False
        ).collect()
    }
    assert pairs[(1, 100)] == out[1].est_jaccard
    assert all(k[0] != 2 for k in pairs)


def test_eval_contamination_report_matches_duckdb_twin(spark, sf_small):
    """Per-eval-example overlap-fraction audit (the GPT-3/PaLM
    direction) replayed in DuckDB on the decontaminate gate split —
    exact integer-ratio verdicts, fractions rounded 6. The synthetic
    corpus shares trigram phrasing across docs, so the audit must find
    nonzero overlap; injecting a verbatim train doc as an eval doc
    must flag it fully contaminated (frac 1.0) — the r11 gate
    candidate's evidence (QUERIES.md)."""
    import duckdb
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.dedup import eval_contamination_report
    from ccm_spark.plans.oracle_sql_ext import sql_eval_contamination

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    train = docs.where(F.col("doc_id") % 31 != 0)
    ev = docs.where(F.col("doc_id") % 31 == 0)
    out = eval_contamination_report(train, ev)
    got = sorted(
        (r.doc_id, r.n_shingles, r.n_hit, r.overlap_frac, r.contaminated)
        for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(d), int(ns), int(nh), float(fr), bool(c))
        for d, ns, nh, fr, c in con.sql(sql_eval_contamination()).fetchall()
    )
    assert got == want
    assert any(r[3] > 0.0 for r in got)  # shared phrasing is visible

    # a verbatim train doc leaked into eval -> fully contaminated
    leak = train.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    # ... and a shingle-less doc (1 token < width) rides along: the
    # zero-denominator branch must emit (0, 0, 0.0, False), not an
    # ANSI divide-by-zero
    short = spark.createDataFrame([(2_000_000, "lonely")], "doc_id long, text string")
    out2 = eval_contamination_report(
        train,
        ev.select("doc_id", "text").unionByName(leak).unionByName(short),
    )
    row = out2.where(F.col("doc_id").between(1_000_000, 1_999_999)).collect()[0]
    assert row.overlap_frac == 1.0 and bool(row.contaminated) is True
    srow = out2.where(F.col("doc_id") == 2_000_000).collect()[0]
    assert (srow.n_shingles, srow.n_hit, srow.overlap_frac, bool(srow.contaminated)) == (0, 0, 0.0, False)

    import pytest

    with pytest.raises(ValueError, match="threshold"):
        eval_contamination_report(train, ev, threshold=0.0)
