"""Table profiling (pipeline/profile.py)."""

import duckdb
import pyspark.sql.functions as F
import pytest

from ccm_spark.pipeline.profile import profile_columns, profile_documents_gate


def test_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [
            ("a", 1),
            ("a", 2),
            ("b", None),
            (None, 2),
        ],
        "s string, n int",
    )
    got = {r.col_name: r for r in profile_columns(df).collect()}
    s = got["s"]
    assert (s.n_rows, s.n_nulls, s.n_distinct) == (4, 1, 2)
    assert (s.top_value, s.top_count) == ("a", 2)
    assert (s.min_value, s.max_value) == ("a", "b")
    n = got["n"]
    assert (n.n_rows, n.n_nulls, n.n_distinct) == (4, 1, 2)
    # tie at count 2 between '1'... no: values are 1, 2, 2 -> top '2'
    assert (n.top_value, n.top_count) == ("2", 2)
    assert (n.min_value, n.max_value) == ("1", "2")


def test_profile_top_tie_breaks_to_smallest_value(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "v string"
    )
    row = profile_columns(df, ["v"]).collect()[0]
    assert (row.top_value, row.top_count) == ("a", 2)


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1,), (2,)], "k int").select(
        "k", F.lit(None).cast("string").alias("dead")
    )
    row = {r.col_name: r for r in profile_columns(df).collect()}["dead"]
    assert (row.n_rows, row.n_nulls, row.n_distinct) == (2, 2, 0)
    assert row.top_value is None and row.top_count == 0
    assert row.min_value is None and row.max_value is None


def test_profile_rejects_empty_cols(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])


def test_profile_is_partitioning_invariant(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    a = sorted(
        tuple(r) for r in profile_documents_gate(docs).collect()
    )
    b = sorted(
        tuple(r)
        for r in profile_documents_gate(docs.repartition(23)).collect()
    )
    assert a == b and len(a) == 5


def test_profile_documents_gate_matches_duckdb_twin(spark, sf_small):
    """Staged gate candidate (QUERIES.md): the 5-column documents
    profile (incl. the null-bearing derived ``sig`` column) matches
    the DuckDB stacked-relation restatement row for row."""
    from ccm_spark.plans.oracle_sql_ext import sql_profile_columns

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    got = sorted(tuple(r) for r in profile_documents_gate(docs).collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (
            str(a), int(b), int(c), int(d),
            None if e is None else str(e),
            int(f),
            None if g is None else str(g),
            None if h is None else str(h),
        )
        for a, b, c, d, e, f, g, h in con.sql(sql_profile_columns()).fetchall()
    )
    assert len(got) == len(want) == 5
    assert got == want
    # non-vacuity: the sig column actually exercised the null path
    sig = {t[0]: t for t in got}["sig"]
    assert sig[2] > 0 and sig[3] > 0


def test_profile_fast_agrees_with_exact(spark, sf_small):
    """The at-scale fast path (no explode, HLL distinct) must agree
    with the exact profile: nulls/rows/extremes exactly, distinct
    within the declared rsd, top pair honestly absent."""
    from ccm_spark.pipeline.profile import profile_columns_fast

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("source"))
        .alias("sig"),
    )
    cols = ["doc_id", "lang", "source", "n_chars", "sig"]
    exact = {r.col_name: r for r in profile_columns(docs, cols).collect()}
    fast = {
        r.col_name: r
        for r in profile_columns_fast(docs, cols, rsd=0.02).collect()
    }
    assert set(fast) == set(exact)
    for c in cols:
        e, f = exact[c], fast[c]
        assert (f.n_rows, f.n_nulls) == (e.n_rows, e.n_nulls)
        assert (f.min_value, f.max_value) == (e.min_value, e.max_value), c
        assert abs(f.n_distinct - e.n_distinct) <= max(3, 0.1 * e.n_distinct)
        assert f.top_value is None and f.top_count == 0


def test_profile_fast_plan_has_no_generate(spark, sf_small):
    """Plan-shape pin for the scale claim: the fast path must not
    explode the table — no Generate over the scan, one aggregate."""
    from ccm_spark.pipeline.profile import profile_columns_fast

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = profile_columns_fast(
        docs, ["doc_id", "lang"]
    )._jdf.queryExecution().executedPlan().toString()
    # the only Generate allowed is the single-row unpivot AFTER the
    # aggregate; the scan side must feed the aggregate directly
    # (string min/max may plan as SortAggregate rather than
    # HashAggregate — accept any aggregate node)
    import re

    m = re.search(r"\w*Aggregate", plan)
    assert m, plan[:400]
    scan_side = plan[m.start():]
    assert "Generate" not in scan_side
