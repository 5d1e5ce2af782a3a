"""robots.txt parsing + compliance filtering (extension surface — the
reference has no crawl layer, SURVEY.md §2.1).

Pins: group-header semantics (consecutive User-agent lines, named-bot
groups ignored), empty-Disallow-is-open, longest-prefix precedence with
allow winning ties, default-open for rule-less hosts, conservative
wildcard/'$' degradation (truncated disallows keep original-pattern
precedence), and path+query match targets."""

from __future__ import annotations

from ccm_spark.pipeline.robots import apply_robots, robots_txt_rules

ROBOTS_A = """# comments everywhere
User-agent: gptbot
Disallow: /

User-Agent: *
Disallow: /private/
Allow: /private/ok/
Disallow:
disallow: /tmp

User-agent: otherbot
User-agent: *
Disallow: /shared/
"""

ROBOTS_B = """User-agent: somebody-else
Disallow: /everything/
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return robots_txt_rules(df)


def test_robots_rules_star_groups_only(spark):
    got = {(r.host, r.rule, r.prefix) for r in _rules(spark).collect()}
    assert got == {
        ("a.com", "disallow", "/private/"),
        ("a.com", "allow", "/private/ok/"),
        ("a.com", "disallow", "/tmp"),
        # the multi-UA header group applies because '*' is among them
        ("a.com", "disallow", "/shared/"),
        # gptbot's group and b.com's named group contribute nothing;
        # the empty Disallow contributes nothing
    }


def test_apply_robots_precedence_and_defaults(spark):
    urls = spark.createDataFrame(
        [
            (0, "http://a.com/"),
            (1, "http://a.com/private/x.html"),
            (2, "http://a.com/private/ok/x.html"),  # allow: longest match
            (3, "http://a.com/tmpfile"),  # prefix match, not path-segment
            (4, "http://a.com/shared/y"),
            (5, "http://b.com/everything/z"),  # named-bot rule: not ours
            (6, "http://nobody.com/x"),  # no robots.txt at all
            (7, "http://A.COM/private/z"),  # host case-folds
        ],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.robots_allowed
        for r in apply_robots(urls, _rules(spark)).collect()
    }
    assert got == {
        0: True,
        1: False,
        2: True,
        3: False,
        4: False,
        5: True,
        6: True,
        7: False,
    }
    # row multiplicity survives (two identical rows stay two rows)
    dup = spark.createDataFrame(
        [(9, "http://a.com/private/x"), (9, "http://a.com/private/x")],
        "doc_id long, url string",
    )
    assert apply_robots(dup, _rules(spark)).count() == 2


def test_apply_robots_wildcard_disallow_degrades_conservatively(spark):
    """RFC 9309 §2.2.3 wildcard disallows must never be matched
    literally (that direction FETCHES publisher-forbidden URLs): the
    pattern is truncated at its first '*' and matches a superset. A
    pattern reduced to '' blocks the whole host."""
    rules = robots_txt_rules(
        spark.createDataFrame(
            [
                ("w.com", "User-agent: *\nDisallow: /*/secret\n"),
                ("x.com", "User-agent: *\nDisallow: /files/*.php\n"),
                ("y.com", "User-agent: *\nDisallow: *\n"),
            ],
            "host string, robots_txt string",
        ),
        wildcard="conservative",
    )
    urls = spark.createDataFrame(
        [
            (0, "http://w.com/a/secret"),  # matched by the real pattern
            (1, "http://w.com/*/secret"),
            (2, "http://w.com/open"),  # superset cost: '/' blocks this too
            (3, "http://x.com/files/app.php"),
            (4, "http://x.com/public/app.php"),  # outside the '/files/' stem
            (5, "http://y.com/anything"),  # 'Disallow: *' == block all
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.robots_allowed for r in apply_robots(urls, rules).collect()}
    assert got == {0: False, 1: False, 2: False, 3: False, 4: True, 5: False}


def test_apply_robots_dollar_anchor_and_precedence_preserved(spark):
    """A trailing '$' on a disallow is stripped (prefix blocks a
    superset), and the truncated disallow keeps its ORIGINAL pattern
    length for precedence — an allow whose length falls between the
    truncated and original lengths must NOT win the tie (that would
    over-fetch a URL the real pattern blocks)."""
    rules = robots_txt_rules(
        spark.createDataFrame(
            [
                ("d.com", "User-agent: *\nDisallow: /exact$\n"),
                (
                    "p.com",
                    # pattern len 10 > allow len 9 > truncated len 5:
                    # real matcher blocks /dir/file.php; literal-length
                    # precedence would wrongly let the allow win
                    "User-agent: *\nDisallow: /dir/*.php\nAllow: /dir/file\n",
                ),
            ],
            "host string, robots_txt string",
        ),
        wildcard="conservative",
    )
    urls = spark.createDataFrame(
        [
            (0, "http://d.com/exact"),
            (1, "http://d.com/exactly-longer"),  # superset cost
            (2, "http://p.com/dir/file.php"),
            # superset cost: the real pattern would NOT match .txt, but
            # the truncated '/dir/' stem (original precedence 10) does
            # and outranks the len-9 allow — over-blocked, never
            # over-fetched
            (3, "http://p.com/dir/file.txt"),
            (4, "http://p.com/other"),  # outside the stem: default-open
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.robots_allowed for r in apply_robots(urls, rules).collect()}
    assert got == {0: False, 1: False, 2: False, 3: False, 4: True}


def test_apply_robots_matches_query_string(spark):
    """The matched string is path + '?query' (RFC 9309 / Google):
    query-targeted disallows like 'Disallow: /search?q=' must match."""
    rules = robots_txt_rules(
        spark.createDataFrame(
            [("q.com", "User-agent: *\nDisallow: /search?q=\n")],
            "host string, robots_txt string",
        )
    )
    urls = spark.createDataFrame(
        [
            (0, "http://q.com/search?q=terms"),
            (1, "http://q.com/search"),  # no query -> no match
            (2, "http://q.com/search?page=2"),  # different param
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.robots_allowed for r in apply_robots(urls, rules).collect()}
    assert got == {0: False, 1: True, 2: True}


def test_robots_rules_cap_never_sheds_disallows(spark):
    """The conservative-cap contract: a short broad Disallow must
    survive a cap dominated by longer Allow rules — the regression this
    pins flipped blocked URLs to allowed when 'Disallow: /' sorted last
    under pure length-desc precedence and was cut."""
    body = (
        "User-agent: *\nDisallow: /\n"
        + "\n".join(f"Allow: /public/section{i:04d}/" for i in range(20))
    )
    rules = robots_txt_rules(
        spark.createDataFrame([("c.com", body)], "host string, robots_txt string"),
        max_rules_per_host=5,
    )
    got = [(r.rule, r.prefix) for r in rules.collect()]
    assert ("disallow", "/") in got
    assert len(got) == 5
    urls = spark.createDataFrame([(0, "http://c.com/b")], "doc_id long, url string")
    assert [r.robots_allowed for r in apply_robots(urls, rules).collect()] == [False]


def test_robots_rules_disallow_overflow_collapses_to_full_block(spark):
    """More disallows than the cap: shedding any of them could
    over-fetch, so the host collapses to a single 'Disallow: /'."""
    body = "User-agent: *\n" + "\n".join(
        f"Disallow: /p{i:04d}/" for i in range(20)
    )
    rules = robots_txt_rules(
        spark.createDataFrame([("c.com", body)], "host string, robots_txt string"),
        max_rules_per_host=5,
    )
    got = [(r.rule, r.prefix) for r in rules.collect()]
    assert got == [("disallow", "/")]
    urls = spark.createDataFrame(
        [(0, "http://c.com/anything"), (1, "http://c.com/p0003/x")],
        "doc_id long, url string",
    )
    allowed = {r.doc_id: r.robots_allowed for r in apply_robots(urls, rules).collect()}
    assert allowed == {0: False, 1: False}


def test_robots_named_agent_resolution(spark):
    """RFC 9309 group selection: the longest UA value prefixing the
    crawler's product token wins; named selection REPLACES the star
    groups; hosts naming no match fall back to *; matching is
    case-insensitive; agent=None keeps today's star-only behavior."""
    import pytest

    body = (
        "User-agent: CCMBot-News\nDisallow: /news-private/\n\n"
        "User-agent: ccmbot\nDisallow: /bot-private/\n\n"
        "User-agent: *\nDisallow: /all-private/\n"
    )
    df = spark.createDataFrame(
        [("a.com", body), ("b.com", "User-agent: *\nDisallow: /closed/\n")],
        "host string, robots_txt string",
    )

    # most specific named group wins on a.com; b.com falls back to *
    rules = robots_txt_rules(df, agent="ccmbot-news")
    got = {(r.host, r.rule, r.prefix) for r in rules.collect()}
    assert got == {
        ("a.com", "disallow", "/news-private/"),
        ("b.com", "disallow", "/closed/"),
    }

    # shorter token matches only the shorter group
    rules2 = robots_txt_rules(df, agent="CCMBOT")
    got2 = {(r.host, r.rule, r.prefix) for r in rules2.collect()}
    assert ("a.com", "disallow", "/bot-private/") in got2
    assert ("a.com", "disallow", "/news-private/") not in got2

    # unknown bot: star groups everywhere
    rules3 = robots_txt_rules(df, agent="otherbot")
    got3 = {(r.host, r.rule, r.prefix) for r in rules3.collect()}
    assert ("a.com", "disallow", "/all-private/") in got3

    # agent=None unchanged (star only)
    star = {(r.host, r.prefix) for r in robots_txt_rules(df).collect()}
    assert star == {("a.com", "/all-private/"), ("b.com", "/closed/")}

    with pytest.raises(ValueError, match="product"):
        robots_txt_rules(df, agent="*")


def test_robots_sitemaps_and_crawl_delay(spark):
    """Sitemap lines are host-global (any position, deduped);
    Crawl-delay resolves through the same group selection as the
    rules, max-of-duplicates, absent when unstated."""
    body = (
        "Sitemap: http://a.com/sm1.xml\n"
        "User-agent: ccmbot\nDisallow: /x/\nCrawl-delay: 2.5\n\n"
        "User-agent: *\nDisallow: /y/\nCrawl-delay: 10\n"
        "Sitemap: http://a.com/sm2.xml\n"
        "Sitemap: http://a.com/sm1.xml\n"  # duplicate -> one seed
    )
    from ccm_spark.pipeline.robots import robots_crawl_delay, robots_sitemaps

    df = spark.createDataFrame(
        [("a.com", body), ("b.com", "User-agent: *\nDisallow: /q/\n")],
        "host string, robots_txt string",
    )
    sm = {(r.host, r.sitemap_url) for r in robots_sitemaps(df).collect()}
    assert sm == {
        ("a.com", "http://a.com/sm1.xml"),
        ("a.com", "http://a.com/sm2.xml"),
    }
    # star group delay
    star = {r.host: r.crawl_delay_s for r in robots_crawl_delay(df).collect()}
    assert star == {"a.com": 10.0}  # b.com states none -> absent
    # named group overrides
    named = {
        r.host: r.crawl_delay_s
        for r in robots_crawl_delay(df, agent="ccmbot").collect()
    }
    assert named == {"a.com": 2.5}


def test_robots_tab_and_malformed_value_hardening(spark):
    """Tab-terminated values and malformed delays must never weaken
    compliance or crash: 'User-agent: *\\t# all' still matches the star
    group (a tab riding into the value silently dropped the host's
    prohibitions — over-fetching), tab-commented prefixes and sitemap
    URLs stay clean, and 'Crawl-delay: 1.2.3' is skipped instead of
    aborting the job via an ANSI-mode double cast."""
    from ccm_spark.pipeline.robots import robots_crawl_delay, robots_sitemaps

    body = (
        "User-agent: *\t# every bot\n"
        "Disallow: /private/\t# tab comment\n"
        "Crawl-delay: 1.2.3\n"
        "Crawl-delay: 4\tjunk\n"
        "Sitemap: http://t.com/s.xml\tjunk\n"
    )
    df = spark.createDataFrame([("t.com", body)], "host string, robots_txt string")
    rules = {(r.rule, r.prefix) for r in robots_txt_rules(df).collect()}
    assert rules == {("disallow", "/private/")}
    urls = spark.createDataFrame(
        [(0, "http://t.com/private/x")], "doc_id long, url string"
    )
    rules_df = robots_txt_rules(df)
    assert [r.robots_allowed for r in apply_robots(urls, rules_df).collect()] == [
        False
    ]
    assert {r.sitemap_url for r in robots_sitemaps(df).collect()} == {
        "http://t.com/s.xml"
    }
    # 1.2.3 skipped; '4\tjunk' -> trailing junk also skipped (not a clean
    # directive), so no delay row survives for this host
    assert robots_crawl_delay(df).collect() == []
    clean = spark.createDataFrame(
        [("c.com", "User-agent: *\nCrawl-delay: 2.5\n")],
        "host string, robots_txt string",
    )
    got = {r.host: r.crawl_delay_s for r in robots_crawl_delay(clean).collect()}
    assert got == {"c.com": 2.5}


def test_robots_exact_wildcard_mode(spark):
    """wildcard='exact' compiles RFC 9309 §2.2.3 patterns to anchored
    regexes: '*' spans anything, a trailing '$' anchors the end, a
    mid-pattern '$' and every regex metacharacter match literally, and
    precedence stays the original pattern length (Google semantics)."""
    body = (
        "User-agent: *\n"
        "Disallow: /files/*.php\n"
        "Disallow: /exact$\n"
        "Disallow: /lit.$ch?a+r*\n"
        "Allow: /files/open\n"
    )
    rules = robots_txt_rules(
        spark.createDataFrame([("e.com", body)], "host string, robots_txt string"),
        wildcard="exact",
    )
    urls = spark.createDataFrame(
        [
            (0, "http://e.com/files/app.php"),          # wildcard hit
            (1, "http://e.com/files/app.phpx"),         # prefix-of-match ok too
            (2, "http://e.com/files/app.txt"),          # no '.php' -> open
            (3, "http://e.com/files/openx.php"),        # allow len 11 < dis len 12
            (4, "http://e.com/exact"),                  # '$' anchors: blocked
            (5, "http://e.com/exactly-longer"),         # past the anchor: open
            (6, "http://e.com/lit.$ch?a+rANYTHING"),    # literal metachars + '*'
            (7, "http://e.com/litX$ch?a+r"),            # '.' is literal: open
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.robots_allowed for r in apply_robots(urls, rules).collect()}
    assert got == {
        0: False,
        1: False,
        2: True,
        3: False,
        4: False,
        5: True,
        6: False,
        7: True,
    }
    # exact mode never fetches anything conservative mode would block...
    # in the disallow direction: everything exact blocks here,
    # conservative blocks too (superset)
    cons = robots_txt_rules(
        spark.createDataFrame([("e.com", body)], "host string, robots_txt string"),
        wildcard="conservative",
    )
    got_c = {r.doc_id: r.robots_allowed for r in apply_robots(urls, cons).collect()}
    for k, allowed in got.items():
        if not allowed:
            assert not got_c[k], f"conservative fetched {k} that exact blocks"

    import pytest

    with pytest.raises(ValueError, match="wildcard"):
        robots_txt_rules(
            spark.createDataFrame([("e.com", body)], "host string, robots_txt string"),
            wildcard="fuzzy",
        )


# the fixture moved into the package when robots_rules became a gated
# query (r09): the gate and this pin must parse the SAME bodies
from ccm_spark.pipeline.robots import robots_fixture  # noqa: E402


def test_robots_rules_fixture_matches_duckdb_twin(spark, sf_small):
    """The real parser over document-derived robots bodies vs the
    declarative DuckDB statement of what a correct parse recovers
    (conservative wildcard/'$' degradation included) — the r09 gate
    candidate's evidence, pinned now at sf0.001."""
    import duckdb

    from ccm_spark.plans.oracle_sql_ext import sql_robots_rules_fixture

    rules = robots_txt_rules(
        robots_fixture(spark, sf_small),
        max_rules_per_host=100_000,
        wildcard="conservative",
    )
    got = sorted(
        (r.host, r.rule, r.prefix, r.prec) for r in rules.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = sorted(
        (h, ru, p, int(pr))
        for h, ru, p, pr in con.sql(sql_robots_rules_fixture()).fetchall()
    )
    assert len(got) == len(want) == 400  # 500 docs, 1/5 are comments
    assert got == want


def test_conservative_over_block_rate_measured_default_is_exact(spark, sf_small):
    """The r8-carried wildcard defaulting decision, closed with a
    measurement: over the documents-derived fixture corpus (wildcard
    and '$' rules for 2/5 of docs) and a URL set probing each rule's
    boundary, conservative mode over-blocks ~13.6% of the URLs exact
    mode allows (exactly 244/1800: every '/w<id>/*.php' rule blocks
    the non-.php file in its stem, every '/e<id>$' rule blocks the
    subtree behind its anchor — 200 — plus 44 digit-prefix collisions
    where a truncated '/e3' also swallows a same-host '/e31...' URL
    that no real pattern touches). That loss rate on corpus-keep
    decisions is why wildcard='exact' became the default (r10);
    conservative never over-fetches (verified below) and remains the
    cheap frontier-pre-filter mode."""
    import pyspark.sql.functions as F

    from ccm_spark.pipeline.robots import apply_robots, robots_fixture

    bodies = robots_fixture(spark, sf_small)
    exact = robots_txt_rules(bodies, max_rules_per_host=100_000)
    cons = robots_txt_rules(
        bodies, max_rules_per_host=100_000, wildcard="conservative"
    )
    d = F.col("doc_id")
    host = F.concat(F.lit("http://h"), (d % 7).cast("string"), F.lit(".com"))
    ds = d.cast("string")
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select("doc_id")
    urls = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(host, F.lit("/w"), ds, F.lit("/index.html")),
                F.concat(host, F.lit("/w"), ds, F.lit("/app.php")),
                F.concat(host, F.lit("/e"), ds, F.lit("/sub")),
                F.concat(host, F.lit("/e"), ds),
            )
        ).alias("url"),
    )
    e = apply_robots(urls, exact).withColumnRenamed("robots_allowed", "ok_e")
    c = apply_robots(urls, cons).withColumnRenamed("robots_allowed", "ok_c")
    j = e.join(c, ["doc_id", "url"]).localCheckpoint(eager=True)
    # never over-fetch: conservative allows only what exact allows
    assert j.where(F.col("ok_c") & ~F.col("ok_e")).count() == 0
    n_exact_ok = j.where(F.col("ok_e")).count()
    n_over = j.where(F.col("ok_e") & ~F.col("ok_c")).count()
    assert n_exact_ok == 1800 and n_over == 244, (n_exact_ok, n_over)
    rate = n_over / n_exact_ok
    assert 0.13 < rate < 0.14, rate
