"""Incremental snapshot maintenance (pipeline/cdc.py)."""

import duckdb
import pyspark.sql.functions as F
import pytest

from ccm_spark.pipeline.cdc import merge_upsert, merge_upsert_gate, snapshot_diff


def _docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet")


def _base(spark):
    return spark.createDataFrame(
        [
            (1, "one-v0", 0),
            (2, "two-v0", 0),
            (3, "three-v0", 0),
        ],
        "k long, payload string, version long",
    )


def test_merge_latest_version_wins(spark):
    delta = spark.createDataFrame(
        [(1, "one-v2", 2), (2, "two-v1", 1)],
        "k long, payload string, version long",
    )
    out = merge_upsert(_base(spark), delta, ["k"], "version")
    got = {r.k: (r.payload, r.version) for r in out.collect()}
    assert got == {1: ("one-v2", 2), 2: ("two-v1", 1), 3: ("three-v0", 0)}


def test_merge_same_version_delta_wins(spark):
    delta = spark.createDataFrame(
        [(1, "one-amended", 0)], "k long, payload string, version long"
    )
    out = merge_upsert(_base(spark), delta, ["k"], "version")
    got = {r.k: r.payload for r in out.collect()}
    assert got[1] == "one-amended"
    assert got[2] == "two-v0" and got[3] == "three-v0"


def test_tombstone_does_not_resurrect_base(spark):
    """The canonical CDC merge bug: filtering deletes BEFORE the rank
    lets the stale base row win and silently resurrects the key. The
    operator ranks first, so a winning tombstone removes the key."""
    delta = spark.createDataFrame(
        [(2, "ignored", 1, True)],
        "k long, payload string, version long, deleted boolean",
    )
    out = merge_upsert(
        _base(spark), delta, ["k"], "version", tombstone_col="deleted"
    )
    got = {r.k: r.payload for r in out.collect()}
    assert set(got) == {1, 3}
    # a LOWER-versioned tombstone must lose to the live base row
    stale = spark.createDataFrame(
        [(2, "ignored", -1, True)],
        "k long, payload string, version long, deleted boolean",
    )
    out2 = merge_upsert(
        _base(spark), stale, ["k"], "version", tombstone_col="deleted"
    )
    assert {r.k for r in out2.collect()} == {1, 2, 3}


def test_merge_output_schema_is_base_schema(spark):
    delta = spark.createDataFrame(
        [(1, "x", 1, False)],
        "k long, payload string, version long, deleted boolean",
    )
    out = merge_upsert(
        _base(spark), delta, ["k"], "version", tombstone_col="deleted"
    )
    # tombstone column was synthesised base-side, so it is dropped
    assert out.columns == ["k", "payload", "version"]


def test_merge_rejects_bad_inputs(spark):
    with pytest.raises(ValueError, match="keys"):
        merge_upsert(_base(spark), _base(spark), [], "version")
    with pytest.raises(ValueError, match="_src"):
        merge_upsert(
            _base(spark).withColumn("_src", F.lit(1)),
            _base(spark),
            ["k"],
            "version",
        )
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(
            _base(spark),
            _base(spark).withColumn("extra", F.lit(1)),
            ["k"],
            "version",
        )


def test_merge_is_partitioning_invariant(spark):
    docs = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 13).alias("version"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    delta = docs.where("k % 3 = 0").withColumn(
        "version", F.col("version") + 1
    )
    a = sorted(
        tuple(r)
        for r in merge_upsert(docs, delta, ["k"], "version").collect()
    )
    b = sorted(
        tuple(r)
        for r in merge_upsert(
            docs.repartition(17), delta.repartition(3), ["k"], "version"
        ).collect()
    )
    assert a == b and len(a) == 400


def test_merge_upsert_gate_matches_duckdb_twin(spark, sf_small):
    """Staged gate candidate (QUERIES.md): the full re-crawl fixture —
    re-crawl at version 1, takedown tombstone, same-version amendment —
    hash-matches the DuckDB ranked-CTE restatement row for row."""
    from ccm_spark.plans.oracle_sql_ext import sql_merge_upsert

    out = merge_upsert_gate(_docs(spark, sf_small))
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), str(c), str(d), int(e), str(f))
        for a, b, c, d, e, f in con.sql(sql_merge_upsert()).fetchall()
    )
    assert len(got) == len(want) > 0
    assert got == want
    # non-vacuity: all three delta behaviours present
    by_key = {r[0]: r for r in got}
    assert any(r[1] == 1 for r in got)          # a re-crawl won
    assert all(k % 7 != 5 for k in by_key)      # takedowns vanished
    assert any(r[1] == 0 and r[0] % 7 == 1 for r in got)  # tie kept


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, s string, n long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 31), (4, "d", 40)],
        "k long, s string, n long",
    )
    got = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_null_position_matters(spark):
    """A value moving between columns must read as 'changed' even
    though Spark's hash fold skips NULL inputs (the null-bitmap
    appended to the hash is what pins column position)."""
    old = spark.createDataFrame([(1, "a", None)], "k long, x string, y string")
    new = spark.createDataFrame([(1, None, "a")], "k long, x string, y string")
    got = snapshot_diff(old, new, ["k"]).collect()
    assert [(r.k, r.change) for r in got] == [(1, "changed")]
    # and NULL vs NULL is NOT a change
    same = snapshot_diff(old, old, ["k"]).collect()
    assert same == []


def test_snapshot_diff_is_empty_on_identical_snapshots(spark, sf_small):
    docs = _docs(spark, sf_small)
    assert snapshot_diff(docs, docs, ["doc_id"]).count() == 0


def test_snapshot_diff_audits_the_merge(spark, sf_small):
    """The pair composes: diff(base, merge(base, delta)) recovers
    exactly the delta's touched keys with the right classification."""
    docs = _docs(spark, sf_small).select("doc_id", "text", "n_chars")
    base = docs.withColumn("version", F.lit(0).cast("long"))
    delta = (
        docs.where("doc_id % 7 = 3")
        .select(
            "doc_id",
            F.concat("text", F.lit("!")).alias("text"),
            (F.col("n_chars") + 1).alias("n_chars"),
            F.lit(1).cast("long").alias("version"),
            F.lit(False).alias("deleted"),
        )
        .unionByName(
            docs.where("doc_id % 7 = 5").select(
                "doc_id",
                "text",
                "n_chars",
                F.lit(1).cast("long").alias("version"),
                F.lit(True).alias("deleted"),
            )
        )
    )
    merged = merge_upsert(
        base, delta, ["doc_id"], "version", tombstone_col="deleted"
    )
    diff = {
        r.doc_id: r.change
        for r in snapshot_diff(base, merged, ["doc_id"]).collect()
    }
    assert diff and all(
        (k % 7 == 3 and c == "changed") or (k % 7 == 5 and c == "removed")
        for k, c in diff.items()
    )
    n3 = docs.where("doc_id % 7 = 3").count()
    n5 = docs.where("doc_id % 7 = 5").count()
    assert len(diff) == n3 + n5


def test_snapshot_diff_null_keys_match_null_safely(spark):
    """A plain equi-join never matches NULL keys — without the
    eqNullSafe condition an UNCHANGED null-key row would be invented
    as one 'removed' plus one 'added'."""
    old = spark.createDataFrame(
        [(None, "a"), (1, "b")], "k string, v string"
    )
    assert snapshot_diff(old, old, ["k"]).collect() == []
    new = spark.createDataFrame(
        [(None, "zz"), (1, "b")], "k string, v string"
    )
    got = [(r.k, r.change) for r in snapshot_diff(old, new, ["k"]).collect()]
    assert got == [(None, "changed")]


def _keyed(spark, n, seed, vmod):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.xxhash64(F.col("id"), F.lit(seed)) % vmod).alias("version"),
        F.md5(F.concat(F.col("id").cast("string"), F.lit(seed))).alias(
            "payload"
        ),
    )


def test_merge_is_idempotent(spark):
    """Re-applying the same delta is a no-op: at equal version the
    delta wins the tie, but its row is byte-identical to the winner it
    already produced."""
    base = _keyed(spark, 300, "b", 7)
    delta = _keyed(spark, 120, "d", 7).withColumn(
        "version", F.col("version") + 7
    )
    once = merge_upsert(base, delta, ["k"], "version")
    twice = merge_upsert(once, delta, ["k"], "version")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_merge_fold_equals_union_under_distinct_versions(spark):
    """Sequential merges compose: folding two deltas one at a time
    equals merging their union in one pass, PROVIDED versions are
    distinct per key across the deltas (the documented (keys, version)
    uniqueness contract — at duplicated versions inside one combined
    delta the tie has no src to break it)."""
    base = _keyed(spark, 300, "b", 5)
    d1 = _keyed(spark, 150, "d1", 5).withColumn(
        "version", F.col("version") + 10
    )
    # d2's versions sit strictly above d1's, so the union stays unique
    d2 = _keyed(spark, 80, "d2", 5).withColumn(
        "version", F.col("version") + 20
    )
    folded = merge_upsert(
        merge_upsert(base, d1, ["k"], "version"), d2, ["k"], "version"
    )
    union = merge_upsert(
        base, d1.unionByName(d2), ["k"], "version"
    )
    a = sorted(map(tuple, folded.collect()))
    b = sorted(map(tuple, union.collect()))
    assert a == b and len(a) == 300
