"""Crawl-ingestion walkthrough — raw WARC shards to curated documents,
runnable documentation for the round-7 crawl surface (the stage BEFORE
examples/corpus_pipeline.py, which starts at clean text).

    python examples/crawl_ingest.py [warc_dir]

Stages (each one operator, each test-pinned in its own module):
  0. WARC parse          (sources.warc.read_warc — file-parallel, no shuffle)
  1. HTML documents      (2xx text/html -> strip_html -> documents shape)
  2. compliance          (host robots.txt rules + meta noindex, both
                          dropped BEFORE any content use)
  3. URL hygiene         (canonicalise + URL-exact dedup)
  4. link graph          (extract_links -> host_graph -> PageRank)
  5. curation join       (host rank + quality signals per document)

With no warc_dir argument the demo synthesises a deterministic 3-shard
crawl in a temp dir (two hosts linking each other plus a hub every page
cites, one robots-opted-out page, one duplicate URL fetched twice, one
truncated shard) so every stage has something real to do.
"""

from __future__ import annotations

import gzip
import os
import tempfile


def _http(status: int, ctype: str, body: bytes) -> bytes:
    head = (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body


def _rec(rid: str, uri: str, payload: bytes) -> bytes:
    heads = [
        "WARC/1.0",
        "WARC-Type: response",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        f"WARC-Target-URI: {uri}",
        "WARC-Date: 2026-02-03T04:05:06Z",
        "Content-Type: application/http;msgtype=response",
        f"Content-Length: {len(payload)}",
    ]
    return "\r\n".join(heads).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _page(title: str, body: str, links: list[str], robots: str | None = None) -> bytes:
    meta = f'<meta name="robots" content="{robots}">' if robots else ""
    anchors = "".join(f'<a href="{u}">to {u}</a>' for u in links)
    prose = " ".join(
        "the quick brown fox jumps over the lazy dog near the river bank." for _ in range(12)
    )
    return (
        f"<html><head><title>{title}</title>{meta}</head>"
        f"<body><h1>{title}</h1><p>{body} {prose}</p>{anchors}</body></html>"
    ).encode()


def write_demo_crawl(warc_dir: str) -> None:
    """Three deterministic shards: a.com and b.com link each other and
    the hub.com page every page cites; one page opts out via robots
    meta; one URL is fetched twice (shards overlap, as real crawls do);
    shard 2 is truncated mid-record."""
    pages = [
        ("r1", "http://a.com/", _page("A home", "alpha", ["http://hub.com/", "/about.html", "http://b.com/"])),
        ("r2", "http://a.com/about.html", _page("A about", "alpha about", ["http://hub.com/", "/"])),
        ("r3", "http://b.com/", _page("B home", "beta", ["http://hub.com/", "http://a.com/"])),
        ("r4", "http://hub.com/", _page("Hub", "the hub", ["http://a.com/", "http://b.com/"])),
        ("r5", "http://b.com/private.html", _page("B private", "opted out", ["http://hub.com/"], robots="noindex, nofollow")),
        # same URL fetched again in a later shard -> url_dedup's job
        ("r6", "http://a.com/", _page("A home", "alpha refetch", ["http://hub.com/", "/about.html", "http://b.com/"])),
        # a.com's robots.txt disallows this one -> robots.py's job
        ("r7", "http://a.com/secret.html", _page("A secret", "hidden draft", ["http://b.com/"])),
    ]
    recs = [_rec(rid, uri, _http(200, "text/html", html)) for rid, uri, html in pages]
    recs.append(
        _rec(
            "rb1",
            "http://a.com/robots.txt",
            _http(
                200,
                "text/plain",
                b"User-agent: *\r\nDisallow: /secret\r\n"
                b"Crawl-delay: 3\r\nSitemap: http://a.com/sitemap.xml\r\n",
            ),
        )
    )
    os.makedirs(warc_dir, exist_ok=True)
    with open(os.path.join(warc_dir, "shard0.warc"), "wb") as f:
        f.write(b"".join(recs[:3]))
    with open(os.path.join(warc_dir, "shard1.warc.gz"), "wb") as f:
        f.write(b"".join(gzip.compress(r) for r in recs[3:]))
    with open(os.path.join(warc_dir, "shard2.warc"), "wb") as f:
        f.write(recs[0][: len(recs[0]) // 2])  # truncated upload


def run(spark, warc_dir: str) -> dict:
    """Run the whole ingestion; returns per-stage counts plus the host
    ranking (collected — demo scale)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from ccm_spark.pipeline.graph import host_graph, top_hosts
    from ccm_spark.pipeline.html import extract_links, robots_flags
    from ccm_spark.pipeline.robots import (
        apply_robots,
        robots_crawl_delay,
        robots_sitemaps,
        robots_txt_rules,
    )
    from ccm_spark.pipeline.text import quality_filter
    from ccm_spark.pipeline.urls import (
        url_duplicates,
        url_host,
        with_url_normalized,
    )
    from ccm_spark.sources.warc import read_warc, warc_html_documents

    counts: dict = {}

    # 0: parse every shard; resync rows surface data loss without failing
    records = read_warc(spark, warc_dir).persist()
    counts["records"] = records.filter(F.col("warc_type") != "resync").count()
    counts["resync_bytes"] = (
        records.filter(F.col("warc_type") == "resync")
        .agg(F.coalesce(F.sum("payload_len"), F.lit(0)))
        .first()[0]
    )

    # 1+2: compliance BEFORE any content processing — the host-level
    # robots.txt rules AND the page-level meta opt-out (the compliant
    # order: a production crawler applies robots.txt at FETCH time;
    # applying it again over a collected corpus catches rule changes)
    robots_bodies = records.filter(
        (F.col("warc_type") == "response")
        & F.col("target_uri").endswith("/robots.txt")
        & (F.col("http_status") == 200)
    ).select(
        # the engine's shared host key — identical to apply_robots by
        # construction (a hand-rolled regex here once captured the
        # USERINFO for user:pass@host URLs, un-keying the host's rules)
        url_host(F.col("target_uri")).alias("host"),
        F.decode("payload", "UTF-8").alias("robots_txt"),
    )
    rules = robots_txt_rules(robots_bodies)
    counts["robots_txt_rules"] = rules.count()
    # the other frontier inputs the same bodies carry: sitemap seeds
    # for discovery, crawl-delay for pacing
    counts["sitemap_seeds"] = robots_sitemaps(robots_bodies).count()
    counts["hosts_with_crawl_delay"] = robots_crawl_delay(robots_bodies).count()

    kept_records = records.filter(
        (F.col("warc_type") == "response")
        & F.col("http_content_type").startswith("text/html")
    ).withColumn("html", F.decode("payload", "UTF-8"))
    opted_out = robots_flags(kept_records).filter(F.col("robots_noindex"))
    counts["robots_opted_out"] = opted_out.count()
    verdicts = apply_robots(
        kept_records.select("record_id", F.col("target_uri").alias("url")), rules
    )
    counts["robots_txt_blocked"] = verdicts.filter("NOT robots_allowed").count()
    compliant = (
        kept_records.join(opted_out.select("record_id"), "record_id", "left_anti")
        .join(
            verdicts.filter("robots_allowed").select("record_id"),
            "record_id",
            "left_semi",
        )
        .persist()
    )
    docs = warc_html_documents(compliant).persist()
    counts["html_documents"] = docs.count()

    # 3: URL hygiene — canonical form, keep first fetch per URL
    normed = with_url_normalized(docs)
    dupes = url_duplicates(docs)  # one row per distinct url_norm
    counts["url_duplicate_groups"] = dupes.filter("n_copies > 1").count()
    first_fetch = (
        normed.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("url_norm").orderBy("warc_date", "doc_id")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    ).persist()
    counts["unique_urls"] = first_fetch.count()

    # 4: link graph over the COMPLIANT pages only (an opted-out or
    # disallowed page's links never enter the graph) -> host centrality
    links = extract_links(
        compliant.select(F.col("target_uri").alias("url"), "html")
    )
    hg = host_graph(links)
    hosts = top_hosts(hg, k=10, n_iters=12)
    ranking = [(r.node, round(r.rank, 6)) for r in hosts.collect()]
    counts["hosts_ranked"] = len(ranking)

    # 4b (r12): the HITS complement — AUTHORITY budgets content hosts,
    # HUB budgets the directory/aggregator hosts where new authorities
    # get discovered; a frontier scheduler reads both next to PageRank.
    # weight carries the page multiplicity host_graph aggregated away —
    # without it this near-regular demo graph is score-uniform
    from ccm_spark.pipeline.graph import hits

    ha = {
        r.node: (r.hub, r.authority)
        for r in hits(hg, weight="weight", n_iters=8).collect()
    }
    # deterministic readout: ties break on the host name (collect order
    # is partition-dependent), and an empty host graph reports None
    counts["top_hub_host"] = (
        max(ha, key=lambda v: (ha[v][0], v)) if ha else None
    )
    counts["top_authority_host"] = (
        max(ha, key=lambda v: (ha[v][1], v)) if ha else None
    )

    # 4c (r13): shuffle-health check BEFORE committing the edge relation
    # to per-host joins — a crawl's link graph is the canonical hot-key
    # relation (every page cites the hub), and the report is what
    # decides broadcast vs salted downstream. The hub must surface as
    # the top key with the entropy gap visible.
    from ccm_spark.pipeline.skew import key_skew_report, salted_join
    from ccm_spark.pipeline.urls import url_domain as _dom

    link_hosts = links.select(
        "href", _dom(F.col("href")).alias("k")
    ).persist()
    skew = {
        r.key: r
        for r in key_skew_report(link_hosts, "k", top_n=5).collect()
    }
    assert skew, "link relation is empty — skew stage is vacuous"
    top = min(skew.values(), key=lambda r: r.rank)
    counts["hottest_link_host"] = top.key
    counts["hottest_link_share"] = float(top.share)
    # the demo graph cites the hub from every page: the top key must
    # carry strictly more than the runner-up AND more than its uniform
    # 1/n_keys share — a flat key distribution here means the fixture
    # lost its hub and the salting stage below is exercising nothing
    runner_up = max(
        (r.share for r in skew.values() if r.rank == 2), default=0.0
    )
    assert top.share > runner_up and top.share > 1.0 / top.n_keys, (
        f"link graph lost its hub: top share {top.share} vs runner-up "
        f"{runner_up} / uniform {1.0 / top.n_keys:.4f}"
    )

    # 4d (r14): the report's verdict APPLIED — the diagnose→fix loop.
    # Joining every link row to its target host's rank is the classic
    # skewed probe-side join (the hub key carries top.share of the
    # probe mass onto one reducer); when the report shows real
    # concentration, run it salted. Row-identity with the plain join is
    # asserted — salting changes the shuffle layout, never the result.
    target_ranks = hosts.select(
        F.col("node").alias("k"), F.col("rank").alias("target_rank")
    )
    if top.share >= 0.25:
        weighted = salted_join(
            link_hosts, target_ranks, "k", n_salts=8, how="left"
        )
        plain = link_hosts.join(target_ranks, "k", "left")
        assert (
            weighted.exceptAll(plain).isEmpty()
            and plain.exceptAll(weighted).isEmpty()
        ), "salted hub-host join diverged from the plain join"
    else:  # pragma: no cover - demo fixture always concentrates
        weighted = link_hosts.join(target_ranks, "k", "left")
    counts["links_rank_weighted"] = weighted.filter(
        F.col("target_rank").isNotNull()
    ).count()
    counts["hub_join_salted"] = bool(top.share >= 0.25)
    link_hosts.unpersist()

    # 5: curation join — host rank becomes a per-document sampling prior
    from ccm_spark.pipeline.urls import url_domain

    ranked = hosts.select(F.col("node").alias("dom"), F.col("rank").alias("host_rank"))
    qf = quality_filter(first_fetch.withColumn("lang", F.lit("en"))).select(
        "doc_id", "keep"
    )
    curated = (
        first_fetch.select("doc_id", "url")
        .join(qf, "doc_id")
        .withColumn("dom", url_domain(F.col("url")))
        .join(F.broadcast(ranked), "dom", "left")
        .select("doc_id", "url", "keep", "host_rank")
    )
    counts["curated"] = curated.count()
    counts["curated_kept"] = curated.filter("keep").count()

    records.unpersist()
    compliant.unpersist()
    docs.unpersist()
    first_fetch.unpersist()
    return {"counts": counts, "ranking": ranking}


if __name__ == "__main__":
    import sys

    # scripts resolve sys.path[0] to examples/, not the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ccm_spark.session import get_spark

    if len(sys.argv) > 1:
        wd = sys.argv[1]
    else:
        wd = os.path.join(tempfile.mkdtemp(prefix="crawl_demo_"), "warc")
        write_demo_crawl(wd)
    out = run(get_spark("crawl-ingest-example"), wd)
    for k, v in out["counts"].items():
        print(f"{k:>22}: {v}")
    print("host ranking:")
    for host, rank in out["ranking"]:
        print(f"{host:>22}: {rank}")
