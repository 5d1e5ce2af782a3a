"""HTML -> text extraction: pinned against a DuckDB regex replay of the
SAME chain (the regexes are engine-portable by construction), plus direct
content asserts on a hand-built fixture of real-world markup shapes."""

from __future__ import annotations

import duckdb
import pandas as pd

from ccm_spark.pipeline.html import ANY_TAG_RE, BLOCK_TAG_RE, DROP_BLOCK_RES, ENTITIES

FIXTURE = [
    (
        0,
        "<!DOCTYPE html><html><head><title>T</title>"
        "<style>body { color: red; }</style></head>"
        "<body><SCRIPT type='text/javascript'>var x = '<p>not text</p>';\n"
        "alert(1);</SCRIPT>"
        "<!-- a comment\nspanning lines -->"
        "<div class='main'><h1>Heading</h1>"
        "<p>First &amp; second &lt;tag&gt; &quot;quoted&quot;.</p>"
        "<p>Item&nbsp;list:</p><ul><li>one</li><li>two</li></ul>"
        "</div></body></html>",
    ),
    (1, "plain text, no markup at all"),
    (2, None),
    (3, "<p>a</p><p>b</p><br>c"),
    # unclosed script: body LEAKS as text (documented under-strip), tag dies
    (4, "<script>var leak = 1; x < 2 && y > 3"),
    # &amp;lt; must decode ONCE to the text "&lt;", never twice to "<"
    (5, "double &amp;lt; encode"),
    (6, "  \t spaces\r\n\n\n\nand   runs \n "),
    (7, "a <b>bold</b> span stays inline"),
]


def _expected():
    # adjacent block tags produce >=2 newlines, kept as ONE paragraph
    # break (\n\n); runs of 3+ collapse to the same break
    return {
        0: (
            "Heading\n\nFirst & second <tag> \"quoted\".\n\n"
            "Item list:\n\none\n\ntwo"
        ),
        1: "plain text, no markup at all",
        2: None,
        3: "a\n\nb\n\nc",
        4: "var leak = 1; x 3",
        5: "double &lt; encode",
        6: "spaces\n\nand runs",
        7: "a bold span stays inline",
    }


def _duck_sql(rel: str) -> str:
    expr = "html"
    for pat in DROP_BLOCK_RES:
        expr = f"regexp_replace({expr}, '{pat}', '', 'g')"
    expr = f"regexp_replace({expr}, '{BLOCK_TAG_RE}', chr(10), 'g')"
    expr = f"regexp_replace({expr}, '{ANY_TAG_RE}', '', 'g')"
    for ent, repl in ENTITIES:
        lit = repl.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{lit}')"
    expr = f"regexp_replace({expr}, '[ \\t\\r\\x0b\\f]+', ' ', 'g')"
    expr = f"regexp_replace({expr}, ' ?\\n ?', chr(10), 'g')"
    expr = f"regexp_replace({expr}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    expr = f"regexp_replace({expr}, '^\\s+|\\s+$', '', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM {rel}"


def test_extract_text_matches_duckdb_replay_and_content(spark):
    from ccm_spark.pipeline.html import extract_text

    pdf = pd.DataFrame(FIXTURE, columns=["doc_id", "html"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, html string")
    got = {r.doc_id: r.text for r in extract_text(df).collect()}
    duckdb.register("html_fixture", pdf)
    want = {int(d): t for d, t in duckdb.sql(_duck_sql("html_fixture")).fetchall()}
    assert got == want
    assert got == _expected()


def test_extract_text_feeds_quality_filter(spark):
    """The advertised contract: extraction output slots directly into the
    existing text pipeline (same column shape quality_filter consumes)."""
    from ccm_spark.pipeline.html import extract_text
    from ccm_spark.pipeline.text import quality_filter

    prose = " ".join(
        "the quick brown fox jumps over the lazy dog and runs away."
        for _ in range(10)
    )
    html_docs = spark.createDataFrame(
        [
            (0, f"<html><body><p>{prose}</p></body></html>", "en"),
            (1, "<script>only_code();</script><p>x</p>", "en"),
        ],
        "doc_id long, html string, lang string",
    )
    out = quality_filter(extract_text(html_docs).select("doc_id", "text", "lang"))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0, 1}
    assert rows[0].keep  # real prose survives
    assert not rows[1].keep  # a bare "x" fails the length rules


def test_extract_text_stream_equals_batch(spark, tmp_path):
    """Extraction is a pure narrow projection — it must run identically
    on a streaming crawl source (append mode, zero state)."""
    from ccm_spark.pipeline.html import extract_text

    pdf = pd.DataFrame(FIXTURE, columns=["doc_id", "html"]).astype(
        {"doc_id": "int64"}
    )
    df = spark.createDataFrame(pdf, "doc_id long, html string")
    batch = {r.doc_id: r.text for r in extract_text(df).collect()}
    src = tmp_path / "html_src"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "p0"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "p0"))
    out = extract_text(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("html_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_html"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.text for r in spark.sql("select * from html_stream").collect()
    }
    assert got == batch


def test_robots_flags(spark):
    """Robots meta directives: both attribute orders, both quote styles,
    'none' implies both flags, directives are token-bounded (noindexed is
    not noindex), absent/NULL html means no opt-out."""
    from ccm_spark.pipeline.html import robots_flags

    rows = [
        (0, '<meta name="robots" content="noindex, nofollow">'),
        (1, "<meta content='NOINDEX' name='robots'>"),
        (2, '<meta name="robots" content="none">'),
        (3, '<meta name="robots" content="index, follow">'),
        (4, '<meta name="robots" content="noindexed">'),  # not a directive
        (5, '<meta name="viewport" content="noindex">'),  # wrong meta
        (6, "<p>no meta at all</p>"),
        (7, None),
        (8, '<META NAME="ROBOTS" CONTENT="nofollow">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r.doc_id: (r.robots_noindex, r.robots_nofollow)
        for r in robots_flags(df).collect()
    }
    assert got[0] == (True, True)
    assert got[1] == (True, False)
    assert got[2] == (True, True)
    assert got[3] == (False, False)
    assert got[4] == (False, False)
    assert got[5] == (False, False)
    assert got[6] == (False, False)
    assert got[7] == (False, False)
    assert got[8] == (False, True)


def test_mojibake_signals_match_duckdb_replay(spark):
    """Encoding-damage detection: double-decode sequences and U+FFFD
    count; clean accented text does NOT trigger; counts match a DuckDB
    replay of the same pattern."""
    import duckdb
    import pandas as pd

    from ccm_spark.pipeline.text import MOJIBAKE_PAT, mojibake_signals

    rows = [
        (0, "cafÃ© and another cafÃ©"),   # 2x mangled e-acute
        (1, "itâ€™s fineâ€¦"),  # 2x mangled punctuation
        (2, "hard � failure ��"),              # 3x replacement char
        (3, "clean café résumé naïve"),   # real accents: clean
        (4, ""),
        (5, None),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).astype({"doc_id": "int64"})
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_mojibake, r.mojibake_frac)
        for r in mojibake_signals(df).collect()
    }
    assert got[0][0] == 2 and got[1][0] == 2 and got[2][0] == 3
    assert got[3] == (0, 0.0) and got[4] == (0, 0.0) and got[5] == (0, 0.0)
    duckdb.register("moji_fixture", pdf)
    want = {
        int(d): (int(n), float(f))
        for d, n, f in duckdb.sql(
            f"""
SELECT doc_id,
       CASE WHEN text IS NULL THEN 0
            ELSE len(regexp_split_to_array(text, '{MOJIBAKE_PAT}')) - 1 END AS n,
       CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
            ELSE round((len(regexp_split_to_array(text, '{MOJIBAKE_PAT}')) - 1)
                       / length(text), 6) + 0.0 END AS f
FROM moji_fixture"""
        ).fetchall()
    }
    assert got == want
