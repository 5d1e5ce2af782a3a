"""Link extraction + host graph + PageRank (extension surface — the
reference has no graph/text layer, SURVEY.md §2.1).

Pins: exact link rows from a markup fixture (resolution rules, quote
styles, anchor-text cleanup), host-graph weights, PageRank vs an exact
numpy power-iteration replay (same dangling handling), mass
conservation, and partitioning invariance."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from ccm_spark.pipeline.graph import host_graph, pagerank, top_hosts
from ccm_spark.pipeline.html import extract_links

PAGE = (
    "<html><body>"
    '<a href="https://other.com/x">Abs <b>link</b></a>'
    "<a href='//cdn.com/lib.js.html'>proto-rel</a>"
    '<a href="/root.html">Root &amp; rel</a>'
    '<a href="sibling.html">plain rel</a>'
    '<a href="#frag">frag only</a>'
    '<a href="mailto:a@b.c">mail</a>'
    '<a href="">empty</a>'
    "</body></html>"
)


def _links(spark, base="http://ex.com/dir/page.html", page=PAGE):
    df = spark.createDataFrame([(base, page)], "url string, html string")
    return {
        r.href: r.anchor_text for r in extract_links(df).collect()
    }


def test_extract_links_resolution_and_anchors(spark):
    got = _links(spark)
    assert got == {
        "https://other.com/x": "Abs link",  # tag-stripped anchor
        "http://cdn.com/lib.js.html": "proto-rel",  # base scheme inherited
        "http://ex.com/root.html": "Root & rel",  # entity decoded
        "http://ex.com/dir/sibling.html": "plain rel",  # dir-relative
    }  # fragment-only / mailto / empty dropped


def test_extract_links_empty_base_path(spark):
    got = _links(spark, base="http://ex.com")
    assert got["http://ex.com/sibling.html"] == "plain rel"


def test_extract_links_query_only_href_keeps_base_filename(spark):
    """RFC 3986 §5.3: '?page=2' replaces the base URL's QUERY, keeping
    the full base path — the regression resolved it against the base
    DIRECTORY, inventing http://ex.com/dir/?page=2."""
    page = '<a href="?page=2">next</a><a href="?a=1&amp;b=2">params</a>'
    got = _links(spark, page=page)
    assert got == {
        "http://ex.com/dir/page.html?page=2": "next",
        "http://ex.com/dir/page.html?a=1&b=2": "params",
    }
    # empty base path: query attaches to '/'
    got = _links(spark, base="http://ex.com", page='<a href="?p=1">n</a>')
    assert set(got) == {"http://ex.com/?p=1"}


def test_host_graph_weights_and_self_drop(spark):
    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/2", "http://B.com:80/y"),  # same host after parse
            ("http://a.com/3", "http://a.com/nav"),  # intra-host -> dropped
            ("http://b.com/1", "http://a.com/z"),
            ("not a url", "http://a.com/z"),  # unparseable src -> dropped
        ],
        "base_url string, href string",
    )
    got = {(r.src, r.dst): r.weight for r in host_graph(links).collect()}
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}


def _np_pagerank(edges, n_iters, damping=0.85):
    """Textbook power iteration with uniform dangling redistribution —
    the exact semantics pagerank() claims."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw: dict[str, float] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    p = np.zeros((n, n))
    for s, d, w in edges:
        p[idx[d], idx[s]] += w / outw[s]
    dangling = np.array([v not in outw for v in nodes])
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        dmass = r[dangling].sum()
        r = (1 - damping) / n + damping * (p @ r + dmass / n)
    return dict(zip(nodes, r))


EDGES = [
    ("a", "b", 1.0),
    ("a", "c", 2.0),  # weighted: c gets 2x a's endorsement vs b
    ("b", "c", 1.0),
    ("c", "a", 1.0),
    ("c", "d", 1.0),
    ("e", "a", 1.0),  # e: no in-links; d: dangling (no out-links)
]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, weight double")


def test_pagerank_matches_numpy_replay(spark):
    got = {r.node: r.rank for r in pagerank(_edges_df(spark), n_iters=12).collect()}
    want = _np_pagerank(EDGES, n_iters=12)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)  # mass conserved
    # the weighted edge matters: c outranks b
    assert got["c"] > got["b"] > got["e"]


def test_pagerank_cycle_is_uniform(spark):
    cyc = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0), ("d", "a", 1.0)],
        "src string, dst string, weight double",
    )
    got = {r.node: r.rank for r in pagerank(cyc, n_iters=7).collect()}
    for v in got.values():
        assert v == pytest.approx(0.25, abs=1e-12)


def test_pagerank_partitioning_invariant(spark):
    base = {r.node: r.rank for r in pagerank(_edges_df(spark), n_iters=6).collect()}
    rep = {
        r.node: r.rank
        for r in pagerank(_edges_df(spark).repartition(7), n_iters=6).collect()
    }
    for v in base:
        assert rep[v] == pytest.approx(base[v], abs=1e-11)


def test_top_hosts_degrees_and_order(spark):
    rows = top_hosts(_edges_df(spark), k=3, n_iters=12).collect()
    want = _np_pagerank(EDGES, n_iters=12)
    order = sorted(want, key=lambda v: (-want[v], v))[:3]
    assert [r.node for r in rows] == order
    by = {r.node: r for r in rows}
    assert by["a"].out_degree == 2 and by["a"].in_degree == 2
    assert by["c"].in_degree == 2 and by["c"].out_degree == 2


def test_pagerank_rejects_zero_iters(spark):
    with pytest.raises(ValueError, match="n_iters"):
        pagerank(_edges_df(spark), n_iters=0)


def test_anchor_text_profile_by_host(spark):
    from ccm_spark.pipeline.graph import anchor_text_profile

    links = spark.createDataFrame(
        [
            ("http://a.com/1", "http://t.com/x", "Great Spark guide"),
            ("http://b.com/1", "http://t.com/y", "spark guide"),
            ("http://c.com/1", "http://www.t.com/z", "guide"),
            ("http://a.com/2", "http://other.com/", "misc page"),
            ("http://a.com/3", "not a url", "dropped"),
        ],
        "base_url string, href string, anchor_text string",
    )
    got = [
        (r.rank, r.term, r.n)
        for r in anchor_text_profile(links, k=2)
        .filter("target = 't.com'")
        .orderBy("rank")
        .collect()
    ]
    # 'guide' appears in all 3 anchors (www. folds into t.com), 'spark' in 2
    assert got == [(1, "guide", 3), (2, "spark", 2)]


def test_anchor_text_profile_by_url(spark):
    from ccm_spark.pipeline.graph import anchor_text_profile

    links = spark.createDataFrame(
        [
            ("http://a.com/", "http://t.com/x?utm_source=z", "deep page"),
            ("http://b.com/", "http://t.com/x", "deep page too"),
        ],
        "base_url string, href string, anchor_text string",
    )
    rows = anchor_text_profile(links, k=5, by_host=False).collect()
    # tracking param folds away -> both anchors profile ONE url
    assert {r.target for r in rows} == {"http://t.com/x"}
    by_term = {r.term: r.n for r in rows}
    assert by_term["deep"] == 2 and by_term["page"] == 2 and by_term["too"] == 1


def test_connected_components_chain_and_islands(spark):
    from ccm_spark.pipeline.graph import connected_components

    edges = spark.createDataFrame(
        # chain a-b-c-d (diameter 3), island x-y, self-contained z-z
        [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y"), ("z", "z")],
        "src string, dst string",
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x",
        "z": "z",
    }


def test_connected_components_raises_past_max_iter(spark):
    import pytest as _pytest

    from ccm_spark.pipeline.graph import connected_components

    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(8)],
        "src string, dst string",
    )
    with _pytest.raises(RuntimeError, match="no convergence"):
        connected_components(chain, max_iter=2)
    # and the honest bound succeeds on the same graph
    got = {r.node: r.component for r in connected_components(chain).collect()}
    assert set(got.values()) == {"n00"}


def test_pagerank_zero_weight_src_becomes_dangling(spark):
    """A src whose weights sum to 0 must not leak rank mass (the
    regression: p = 0/0 = NULL silently vanished its mass). The node
    is treated as dangling and mass stays conserved, matching the
    numpy replay on the positive-weight subgraph + full node set."""
    edges = [
        ("a", "b", 1.0),
        ("b", "a", 1.0),
        ("z", "a", 0.0),  # z's only out-edge has zero weight
        ("y", "z", None),  # NULL weight: dropped, y dangling; z still a node
    ]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r.node: r.rank for r in pagerank(df, n_iters=8).collect()}
    assert set(got) == {"a", "b", "y", "z"}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # replay: positive edges only, but all four nodes present
    nodes = ["a", "b", "y", "z"]
    idx = {v: i for i, v in enumerate(nodes)}
    p = np.zeros((4, 4))
    p[idx["b"], idx["a"]] = 1.0
    p[idx["a"], idx["b"]] = 1.0
    dangling = np.array([v in ("y", "z") for v in nodes])
    r = np.full(4, 0.25)
    for _ in range(8):
        dmass = r[dangling].sum()
        r = 0.15 / 4 + 0.85 * (p @ r + dmass / 4)
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], abs=1e-12)


# ------------------------------------------------------------------ HITS


def _py_hits(edges, n_iters, quant=None):
    """Pure-Python L1-normalised HITS replay (same half-step rounding)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    rnd = (lambda x: round(x, quant)) if quant is not None else (lambda x: x)
    h = {v: 1.0 / len(nodes) for v in nodes}
    a = {}
    for _ in range(n_iters):
        a_raw = {}
        for u, v in edges:
            a_raw[v] = a_raw.get(v, 0.0) + h.get(u, 0.0)
        tot = sum(a_raw.values())
        a = {v: rnd(a_raw.get(v, 0.0) / tot) if tot > 0 else 0.0 for v in nodes}
        h_raw = {}
        for u, v in edges:
            h_raw[u] = h_raw.get(u, 0.0) + a.get(v, 0.0)
        tot = sum(h_raw.values())
        h = {v: rnd(h_raw.get(v, 0.0) / tot) if tot > 0 else 0.0 for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def test_hits_hub_authority_separation(spark):
    """A directory page linking to three content hosts must score as the
    top hub with ~zero authority; the content hosts the reverse."""
    from ccm_spark.pipeline.graph import hits

    edges = [("dir", f"c{i}") for i in range(3)] + [
        ("c0", "c1"),
        ("other", "c0"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: (r.hub, r.authority) for r in hits(e, n_iters=10).collect()}
    top_hub = max(out, key=lambda v: out[v][0])
    top_auth = max(out, key=lambda v: out[v][1])
    assert top_hub == "dir" and out["dir"][1] == 0.0
    assert top_auth.startswith("c")
    # L1 invariant: both score vectors sum to ~1
    assert abs(sum(h for h, _ in out.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in out.values()) - 1.0) < 1e-9


def test_hits_matches_python_replay(spark):
    import random

    from ccm_spark.pipeline.graph import hits

    rng = random.Random(3)
    edges = list(
        {
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
            for _ in range(150)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.hub, r.authority) for r in hits(e, n_iters=6).collect()}
    want = _py_hits(edges, 6)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-9)
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-9)


def test_hits_matches_duckdb_twin(spark, sf_small):
    """Quantised half-steps make the whole iteration replayable in SQL —
    exact equality including the doubles, the pagerank gate discipline."""
    import duckdb

    from ccm_spark.pipeline.graph import hits
    from ccm_spark.plans import oracle_sql_ext as oext

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    d = F.col("doc_id")
    src = F.concat(F.lit("h"), (d % oext.PAGERANK_GATE_SRC_MOD).cast("string"))
    dst = F.concat(
        F.lit("h"), ((d * 13 + 5) % oext.PAGERANK_GATE_DST_MOD).cast("string")
    )
    edges = docs.select(src.alias("src"), dst.alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    out = hits(edges, n_iters=5, quantize=9).select(
        "node",
        (F.round("hub", 9) + F.lit(0.0)).alias("hub"),
        (F.round("authority", 9) + F.lit(0.0)).alias("authority"),
    )
    got = sorted((r.node, r.hub, r.authority) for r in out.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (a, float(b), float(c))
        for a, b, c in con.sql(oext.sql_hits_hosts(n_iters=5, quant=9)).fetchall()
    )
    assert got == want and got


def test_hits_weighted_carries_multiplicity(spark):
    """An aggregated host graph loses page multiplicity unless weight is
    passed: a weighted citer must out-hub an unweighted one, and zero/
    negative weights are dropped as non-endorsements (endpoints stay)."""
    from ccm_spark.pipeline.graph import hits

    edges = [
        ("a", "hub", 3.0),
        ("a", "b", 2.0),
        ("b", "hub", 1.0),
        ("b", "a", 1.0),
        ("hub", "a", 1.0),
        ("hub", "b", 1.0),
        ("ghost", "hub", 0.0),  # dropped edge; ghost stays a node
    ]
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    out = {
        r.node: (r.hub, r.authority)
        for r in hits(e, weight="weight", n_iters=8).collect()
    }
    # weighted replay fixed point: a is the top hub, hub the top authority
    assert max(out, key=lambda v: out[v][0]) == "a"
    assert max(out, key=lambda v: out[v][1]) == "hub"
    assert out["ghost"] == (0.0, 0.0)
    assert out["a"][0] == pytest.approx(0.691, abs=0.02)
    assert out["hub"][1] == pytest.approx(0.553, abs=0.02)
