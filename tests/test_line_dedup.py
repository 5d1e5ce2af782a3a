"""Line-level dedup (the CCNet unit): stats and keep-first-occurrence
removal pinned against a DuckDB replay and hand-built expectations."""

from __future__ import annotations

import duckdb
import pandas as pd

from ccm_spark.pipeline.dedup import duplicated_lines, remove_duplicated_lines

BOILER1 = "Welcome to Example News"
BOILER2 = "Subscribe to our newsletter today"

FIXTURE = [
    # doc 1 holds the first occurrence of both boilerplate lines
    (1, f"{BOILER1}\nunique one alpha\n{BOILER2}\nunique two alpha"),
    (2, f"{BOILER1}\nunique one beta\n{BOILER2}"),
    # blank line and a short line: never dedup-eligible
    (3, "totally unique content\n\nok"),
    # a doc that IS one boilerplate line -> reduced to the empty string
    (4, BOILER1),
    (5, None),
    # repeated within ONE doc only: n_docs=1, survives min_docs=2
    (6, "same line twice here\nsame line twice here"),
]


def _fixture_df(spark):
    pdf = pd.DataFrame(FIXTURE, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    )
    return pdf, spark.createDataFrame(pdf, "doc_id long, text string")


def test_duplicated_lines_stats(spark):
    _, docs = _fixture_df(spark)
    stats = {
        (r.keep_doc_id, r.keep_line_idx): (r.n_docs, r.n_occurrences)
        for r in duplicated_lines(docs).where("n_occurrences > 1").collect()
    }
    # BOILER1 first occurs at (1, 0) in 3 docs; BOILER2 at (1, 2) in 2;
    # the within-doc repeat at (6, 0) twice in one doc
    assert stats == {(1, 0): (3, 3), (1, 2): (2, 2), (6, 0): (1, 2)}


def test_remove_duplicated_lines_matches_duckdb_replay(spark):
    pdf, docs = _fixture_df(spark)
    got = sorted(
        (r.doc_id, r.text, r.n_lines_removed)
        for r in remove_duplicated_lines(docs).collect()
    )
    duckdb.register("fixture_line_docs", pdf)
    want = sorted(
        (int(d), t, int(n))
        for d, t, n in duckdb.sql(
            """
WITH t AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls
  FROM fixture_line_docs WHERE text IS NOT NULL
),
l AS (
  SELECT doc_id, unnest(range(1, len(ls) + 1)) - 1 AS line_idx, ls FROM t
),
lines AS (
  SELECT doc_id, line_idx, list_extract(ls, line_idx + 1) AS line FROM l
),
dup AS (
  SELECT line,
         min(doc_id * 1000000 + line_idx) AS keep_key
  FROM lines
  WHERE len(trim(line)) >= 4
  GROUP BY line
  HAVING count(DISTINCT doc_id) >= 2
),
kept AS (
  SELECT li.doc_id, li.line_idx, li.line
  FROM lines li LEFT JOIN dup d ON li.line = d.line
  WHERE d.line IS NULL
     OR li.doc_id * 1000000 + li.line_idx = d.keep_key
),
recon AS (
  SELECT doc_id,
         COALESCE(string_agg(line, chr(10) ORDER BY line_idx), '') AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
n AS (SELECT doc_id, len(ls) AS n_lines FROM t)
SELECT f.doc_id,
       CASE WHEN f.text IS NULL THEN NULL ELSE COALESCE(r.text, '') END AS text,
       COALESCE(n.n_lines, 0) - COALESCE(r.n_kept, 0) AS n_lines_removed
FROM fixture_line_docs f
LEFT JOIN recon r ON f.doc_id = r.doc_id
LEFT JOIN n ON f.doc_id = n.doc_id
"""
        ).fetchall()
    )
    assert got == want
    by_id = {d: (t, n) for d, t, n in got}
    # hand-built expectations: doc 1 untouched (holds every first
    # occurrence), doc 2 loses both boilerplate lines, doc 3 untouched
    # (blank + short lines ineligible), doc 4 empties, NULL passes, the
    # single-doc repeat survives
    assert by_id[1] == (FIXTURE[0][1], 0)
    assert by_id[2] == ("unique one beta", 2)
    assert by_id[3] == (FIXTURE[2][1], 0)
    assert by_id[4] == ("", 1)
    assert by_id[5] == (None, 0)
    assert by_id[6] == (FIXTURE[5][1], 0)
    # membership and texts invariant under input partitioning
    alt = sorted(
        (r.doc_id, r.text, r.n_lines_removed)
        for r in remove_duplicated_lines(docs.repartition(5)).collect()
    )
    assert alt == got


def test_remove_duplicated_lines_is_idempotent(spark):
    """After one pass every eligible line is corpus-unique, so a second
    pass must be a no-op — the keep-one-occurrence contract converges in
    one step like the substring family's pairwise rule."""
    _, docs = _fixture_df(spark)
    once = remove_duplicated_lines(docs)
    once_rows = sorted((r.doc_id, r.text) for r in once.collect())
    twice = remove_duplicated_lines(once.select("doc_id", "text"))
    twice_rows = sorted((r.doc_id, r.text, r.n_lines_removed) for r in twice.collect())
    assert [(d, t) for d, t, _ in twice_rows] == once_rows
    assert all(n == 0 for _, _, n in twice_rows)


def test_corpus_diff_statuses(spark):
    """Every status class on a hand-built pair of snapshots, including
    the NULL-text cases, pinned vs a DuckDB replay."""
    import duckdb

    from ccm_spark.pipeline.dedup import corpus_diff

    old = pd.DataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish"), (5, None),
         (6, None)],
        columns=["doc_id", "text"],
    ).astype({"doc_id": "int64"})
    new = pd.DataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new"), (5, None),
         (6, "text now")],
        columns=["doc_id", "text"],
    ).astype({"doc_id": "int64"})
    got = {
        r.doc_id: r.status
        for r in corpus_diff(
            spark.createDataFrame(old, "doc_id long, text string"),
            spark.createDataFrame(new, "doc_id long, text string"),
        ).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",  # NULL both times: no content either time
        6: "changed",    # NULL -> text
    }
    duckdb.register("diff_old", old)
    duckdb.register("diff_new", new)
    want = dict(
        duckdb.sql(
            """
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM diff_old o FULL OUTER JOIN diff_new n ON o.doc_id = n.doc_id
"""
        ).fetchall()
    )
    assert got == {int(k): v for k, v in want.items()}
