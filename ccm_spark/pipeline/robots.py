"""robots.txt compliance — the host-level half of publisher opt-out
(the page-level half, ``<meta name="robots">``, is
``html.robots_flags``).

The reference has no crawl surface (SURVEY.md §2.1); this is extension
surface for the ingestion pipeline: a compliant crawler fetches
``host/robots.txt`` once per host, and every candidate URL must pass
the host's applicable user-agent rules BEFORE fetch (frontier
filtering) or, for an already-collected corpus, before use. Everything
here is codegen (split/regexp/window) — no UDFs, no Python in the hot
path.

Semantics implemented (the subset that is uniform across real
crawlers, documented rather than hidden):
  - by default the ``User-agent: *`` groups apply; passing the
    crawler's product token via ``agent=`` resolves named groups
    (longest case-insensitive prefix match wins, ``*`` fallback —
    the RFC 9309 / Googlebot rule);
  - consecutive ``User-agent`` lines form one group header; the rules
    after them apply to every agent named above;
  - longest-prefix match wins; on a tie, Allow wins (Google's
    published rule);
  - an empty ``Disallow:`` is "allow everything" (per the original
    spec) and therefore contributes no rule;
  - rules match against the URL's path plus ``?query`` (RFC 9309 /
    Google semantics: ``Disallow: /search?q=`` blocks query-targeted
    URLs);
  - ``*`` wildcards and ``$`` anchors (RFC 9309 §2.2.3) are matched
    EXACTLY by default since r10 (anchored regex per wildcard rule —
    full RFC fidelity; plain prefixes keep the codegen ``startswith``
    path). ``robots_txt_rules(..., wildcard="conservative")`` opts
    into the degraded prefix matcher instead (cheaper: zero regex;
    measured cost on the documents-derived fixture corpus: ~13.6% of
    exactly-allowed URLs over-blocked — see
    ``tests/test_robots.py::test_conservative_over_block_rate...``,
    which is why exact became the default). In conservative mode each
    DISALLOW pattern is truncated at its first ``*`` and stripped of a
    trailing ``$`` (the truncated prefix matches a SUPERSET of the
    URLs the pattern matches; a pattern reduced to the empty string
    becomes ``/``), while precedence still uses the ORIGINAL pattern
    length — so no shorter-after-truncation disallow can lose a
    longest-match tie it would have won, and every URL the real
    pattern blocks stays blocked. ALLOW patterns keep their wildcard
    characters literally (an allow that no longer matches only
    over-blocks). Both degradations err toward blocking too much,
    never toward fetching something forbidden.

100 TB design: rules parse once per HOST (a ~10^8-row relation, not a
page relation); the URL join hashes on host, and each URL row meets
only its own host's rule list (real robots files hold tens of rules).
A pathological million-rule robots.txt is capped at ``max_rules_per_
host`` with disallow rules kept ahead of allow rules (so only allows
are ever shed — over-blocking, never over-fetching); a host whose
DISALLOW count alone exceeds the cap collapses to a single
``Disallow: /`` — fully blocked rather than silently shedding
prohibitions. The cap keeps the join fan-out bounded and by
construction can only make matching more conservative.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: per-host rule cap: disallows kept first, then longest allows; a
#: host with more disallows than this collapses to 'Disallow: /'
MAX_RULES_PER_HOST = 500

# captures stop at space AND tab: a trailing tab before a comment or
# EOL otherwise rides into the value, silently un-matching the group
# (ua '*\t' != '*') or corrupting the prefix — both of which DROP
# prohibitions, the one failure direction this module forbids
_UA_RE = "(?i)^[ \\t]*user-agent[ \\t]*:[ \\t]*([^#\\r\\t ]*)"
_RULE_RE = "(?i)^[ \\t]*(dis)?allow[ \\t]*:[ \\t]*([^#\\r\\t ]*)"


def _grouped_lines(
    robots: DataFrame, host_col: str, text_col: str, extra: dict
) -> DataFrame:
    """Shared line parse: posexplode the per-host body, classify UA
    headers, assign each line to its header-run group (``grp``), and
    attach the caller's extra extracted columns. ONE implementation so
    rule resolution and crawl-delay resolution can never diverge on
    group semantics for the same body."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("pos", "line"),
    )
    ua = F.regexp_extract("line", _UA_RE, 1)
    is_ua = ua != ""
    parsed = lines.select(
        "host",
        "pos",
        F.lower(ua).alias("ua"),
        is_ua.alias("is_ua"),
        *[expr.alias(name) for name, expr in extra.items()],
    )
    w = Window.partitionBy("host").orderBy("pos")
    # a group starts at a UA line not directly preceded by another UA
    # line; group_id = running count of starts; rule lines belong to the
    # group of the most recent header run
    return parsed.withColumn(
        "grp",
        F.sum(
            (
                F.col("is_ua")
                & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
            ).cast("int")
        ).over(w),
    )


def _select_agent_groups(
    starts: DataFrame, agent: str | None, op: str
) -> DataFrame:
    """The applicable ``(host, grp)`` set: the ``*`` groups for
    ``agent=None``, else the groups headed by the LONGEST user-agent
    value case-insensitively prefixing the product token (RFC 9309 /
    Googlebot resolution), REPLACING — not joined with — the star
    groups, which remain the fallback for hosts naming no match."""
    star_groups = (
        starts.filter(F.col("is_ua") & (F.col("ua") == "*"))
        .select("host", "grp")
        .distinct()
    )
    if agent is None:
        return star_groups
    agent_l = agent.strip().lower()
    if not agent_l or agent_l == "*":
        raise ValueError(
            f"{op}: agent must be a non-empty product "
            "token (use agent=None for the '*' groups)"
        )
    named = starts.filter(
        F.col("is_ua")
        & (F.col("ua") != "*")
        & F.lit(agent_l).startswith(F.col("ua"))
    ).select("host", "grp", "ua")
    # all groups headed by the longest matching UA value (dense_rank
    # keeps every group repeating that value; ua asc breaks an
    # equal-length tie deterministically)
    best_w = Window.partitionBy("host").orderBy(
        F.length("ua").desc(), F.col("ua").asc()
    )
    best = (
        named.withColumn("_r", F.dense_rank().over(best_w))
        .filter(F.col("_r") == 1)
        .select("host", "grp")
        .distinct()
    )
    return best.unionByName(
        star_groups.join(best.select("host").distinct(), "host", "left_anti")
    )


def robots_txt_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    max_rules_per_host: int = MAX_RULES_PER_HOST,
    agent: str | None = None,
    wildcard: str = "exact",
) -> DataFrame:
    """One robots.txt body per host → the applicable rule relation
    ``(host, rule, prefix)`` with rule ∈ {allow, disallow}.

    ``agent=None`` keeps the ``User-agent: *`` groups only. Passing the
    crawler's product token (e.g. ``"ccmbot-news"``) selects, per host,
    the groups headed by the LONGEST user-agent value that is a
    case-insensitive prefix of the token (the RFC 9309 / Googlebot
    resolution: ``ccmbot-news`` obeys a ``ccmbot-news`` group over a
    ``ccmbot`` group over ``*``), falling back to the ``*`` groups for
    hosts naming no matching agent. Named-group selection REPLACES the
    star groups for that host — per the RFC, a crawler obeys exactly
    one user-agent match, not the union.

    ``wildcard`` picks how RFC 9309 §2.2.3 ``*``/``$`` patterns match:

      - ``"exact"`` (the default since r10): every pattern containing
        ``*`` (or ending ``$``) is compiled to an anchored regex —
        ``*`` → ``.*``, a trailing ``$`` anchors the end, every other
        character matched literally — carried in an extra
        ``pattern_re`` column that :func:`apply_robots` evaluates with
        ``rlike``; plain prefixes keep the codegen ``startswith`` path.
        Default because fidelity to publisher intent cuts BOTH ways: a
        conservative superset-match never over-fetches but at 100 TB
        every over-blocked URL is lost data the publisher chose to
        allow — measured ~13.6% of exactly-allowed URLs on the fixture
        corpus — while the regex cost is one regex per WILDCARD rule
        per URL of that host only (rules are tens per host; most carry
        no wildcard, and plain prefixes never leave codegen).
      - ``"conservative"``: disallow patterns degrade to the prefix
        before their first ``*`` (a superset match — see the module
        docstring); cheapest, pure ``startswith``, and never
        over-fetches (at the cost of the over-blocking above). The
        right mode for a frontier PRE-filter where a false block only
        delays a fetch, and the mode the gated ``robots_rules``
        CORRECTNESS row pins (its DuckDB twin replays the
        truncation).

    Plan: posexplode lines → codegen classify → two windows on
    (host, line order) to assign each rule line to its governing
    user-agent group — all narrow within one host partition; agent
    resolution adds one more per-host window over the handful of UA
    header rows."""
    if wildcard not in ("conservative", "exact"):
        raise ValueError(
            f"robots_txt_rules: wildcard must be 'conservative' or 'exact', "
            f"got {wildcard!r}"
        )
    starts = _grouped_lines(
        robots,
        host_col,
        text_col,
        {
            "rule": F.when(
                F.regexp_extract("line", _RULE_RE, 0) != "",
                F.when(
                    F.lower(F.regexp_extract("line", _RULE_RE, 1)) == "dis",
                    F.lit("disallow"),
                ).otherwise(F.lit("allow")),
            ),
            "prefix": F.regexp_extract("line", _RULE_RE, 2),
        },
    )
    # r16 (VERDICT r15 #4): the parsed line relation feeds the agent-
    # group selection AND the rule branch — without a persist each
    # consumer re-evaluated the caller's input subtree (the gate
    # fixture's before-plan scanned its documents-derived input 4x).
    # Host-bounded by definition (lines per robots body), persisted
    # MEMORY_AND_DISK and released via the engine-wide _ccm_persisted /
    # release_cached convention.
    from pyspark.storagelevel import StorageLevel as _SL

    starts = starts.persist(_SL.MEMORY_AND_DISK)
    selected = _select_agent_groups(starts, agent, "robots_txt_rules")
    # conservative wildcard degradation (RFC 9309 §2.2.3): a DISALLOW
    # pattern is truncated at its first '*' and stripped of a trailing
    # '$' — the resulting prefix matches a superset of what the pattern
    # matches — and a pattern reduced to '' becomes '/'; 'prec' keeps
    # the ORIGINAL pattern length so the truncated form never loses a
    # longest-match tie the pattern would have won (losing one to an
    # allow would over-fetch). Allow patterns stay literal: a
    # never-matching allow only over-blocks.
    dis_prefix = F.regexp_replace(
        F.substring_index(F.col("prefix"), "*", 1), r"\$$", ""
    )
    match_prefix = F.when(
        F.col("rule") == "disallow",
        F.when(dis_prefix == "", F.lit("/")).otherwise(dis_prefix),
    ).otherwise(F.col("prefix"))
    extra_cols: list = []
    if wildcard == "exact":
        # exact mode: patterns keep their raw text in 'prefix'; any
        # pattern carrying '*' (or a trailing '$') compiles to an
        # anchored regex in 'pattern_re' — '^' + literal-escaped body
        # with '*' -> '.*', plus '$' when the pattern ends with one
        # (a mid-pattern '$' is literal, the Google reading). Plain
        # prefixes leave pattern_re NULL and match by startswith.
        ends = F.col("prefix").endswith("$")
        body = F.when(
            ends, F.expr("substring(prefix, 1, length(prefix) - 1)")
        ).otherwise(F.col("prefix"))
        esc = F.regexp_replace(body, r"([.\[\]{}()+\-^$|?\\])", r"\\$1")
        regex = F.concat(
            F.lit("^"),
            F.regexp_replace(esc, r"\*", ".*"),
            F.when(ends, F.lit("$")).otherwise(F.lit("")),
        )
        match_prefix = F.col("prefix")
        extra_cols = [
            F.when(
                F.col("prefix").contains("*") | ends, regex
            ).otherwise(F.lit(None).cast("string")).alias("pattern_re")
        ]
    rules = (
        starts.filter(F.col("rule").isNotNull() & (F.col("prefix") != ""))
        .join(selected, ["host", "grp"])
        .select(
            "host",
            "rule",
            match_prefix.alias("prefix"),
            F.length("prefix").alias("prec"),
            *extra_cols,
        )
        .distinct()
    )
    # the cap must stay CONSERVATIVE: dropping an allow rule can only
    # over-block (fine), but dropping ANY disallow rule could flip a
    # blocked URL to allowed — so disallows are kept ahead of allows,
    # and a host with more disallows than the cap itself collapses to
    # a single 'Disallow: /' (fully blocked) instead of silently
    # shedding prohibitions
    cap_w = Window.partitionBy("host").orderBy(
        F.col("rule").desc(),  # 'disallow' > 'allow': disallows kept first
        F.col("prec").desc(),
        F.col("prefix").asc(),
    )
    host_w = Window.partitionBy("host")
    marked = rules.withColumn(
        "_n_dis",
        F.sum((F.col("rule") == "disallow").cast("int")).over(host_w),
    ).withColumn("rk", F.row_number().over(cap_w))
    # r16: ONE pass instead of the kept/collapsed two-branch union —
    # the union's branches were separate physical subtrees, so the
    # whole rule chain (and the caller's input below it) evaluated
    # twice. A collapsed host (more disallows than the cap) emits its
    # rk == 1 row rewritten to the single 'Disallow: /' sentinel —
    # every host has a rk == 1 row, so the output multiset is
    # byte-identical to the old two-branch form.
    collapsed = F.col("_n_dis") > max_rules_per_host
    out = (
        marked.filter(
            (~collapsed & (F.col("rk") <= max_rules_per_host))
            | (collapsed & (F.col("rk") == 1))
        )
        .select(
            "host",
            F.when(collapsed, F.lit("disallow")).otherwise(F.col("rule")).alias(
                "rule"
            ),
            F.when(collapsed, F.lit("/")).otherwise(F.col("prefix")).alias(
                "prefix"
            ),
            F.when(collapsed, F.lit(1)).otherwise(F.col("prec")).alias("prec"),
            *(
                [
                    F.when(
                        collapsed, F.lit(None).cast("string")
                    ).otherwise(F.col("pattern_re")).alias("pattern_re")
                ]
                if wildcard == "exact"
                else []
            ),
        )
    )
    out._ccm_persisted = [starts]
    return out


def apply_robots(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Adds ``robots_allowed``: whether the host's applicable rules (as
    produced by :func:`robots_txt_rules` — the ``*`` groups by default,
    or the agent-resolved groups when the rules were built with
    ``agent=``) permit each URL. No rules for a host (or an unparseable
    URL) → allowed (the spec's default-open stance); the rule with the
    highest precedence (the ORIGINAL pattern length carried as ``prec``
    by :func:`robots_txt_rules`; prefix length for hand-built rule
    frames without it) decides; ties go to allow. The matched string is
    the URL's path plus ``?query`` when a query is present (RFC 9309 /
    Google semantics — query-targeted disallows like
    ``Disallow: /search?q=`` match).

    Wildcard decision (r10, closing the r8 carry-over): rules built
    with the default ``wildcard="exact"`` carry ``pattern_re`` and are
    matched with full RFC 9309 §2.2.3 fidelity here; conservative-mode
    rules (no ``pattern_re``) match by their degraded prefix and
    over-block ~13.6% of exactly-allowed URLs on the fixture corpus
    (measured in ``tests/test_robots.py``) — acceptable for a frontier
    pre-filter, not for deciding what a 100 TB corpus may keep, which
    is why exact is the default.

    Plan: one hash join on host + a per-URL window over the handful of
    matching rules. The rules relation is host-cardinality — broadcast
    it upstream if the host universe is small."""
    from .urls import _host_from_parts, url_parts

    p = url_parts(F.col(url_col))
    host = _host_from_parts(p)
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    target = F.when(
        p["query"] == "", path
    ).otherwise(F.concat(path, F.lit("?"), p["query"]))
    keyed = (
        urls.withColumn("_rb_host", host)
        .withColumn("_rb_path", target)
        # transient per-row key: the decision window must keep one row
        # per INPUT row (never collapse identical url rows); the id is
        # job-internal and dropped before returning
        .withColumn("_rb_id", F.monotonically_increasing_id())
    )
    prec = (
        F.col("prec") if "prec" in rules.columns else F.length("prefix")
    )
    pattern_re = (
        F.col("pattern_re")
        if "pattern_re" in rules.columns
        else F.lit(None).cast("string")
    )
    r = rules.select(
        F.col("host").alias("_rb_host"),
        F.col("rule").alias("_rb_rule"),
        F.col("prefix").alias("_rb_prefix"),
        prec.alias("_rb_prec"),
        pattern_re.alias("_rb_re"),
    )
    cand = keyed.join(r, "_rb_host", "left").withColumn(
        "_rb_hit",
        F.col("_rb_prefix").isNotNull()
        # exact-mode wildcard rules carry an anchored regex; plain
        # prefixes (and every conservative-mode rule) keep startswith
        & F.when(
            F.col("_rb_re").isNotNull(),
            F.expr("rlike(_rb_path, _rb_re)"),
        ).otherwise(F.col("_rb_path").startswith(F.col("_rb_prefix"))),
    )
    w = Window.partitionBy("_rb_id").orderBy(
        F.col("_rb_hit").desc(),
        F.col("_rb_prec").desc_nulls_last(),
        F.col("_rb_rule").asc(),  # 'allow' < 'disallow': ties open
    )
    decided = (
        cand.withColumn("_rb_rk", F.row_number().over(w))
        .filter(F.col("_rb_rk") == 1)
        .withColumn(
            "robots_allowed",
            ~(F.col("_rb_hit") & (F.col("_rb_rule") == "disallow")),
        )
    )
    return decided.select(*urls.columns, "robots_allowed")


#: Sitemap and Crawl-delay directive lines (RFC 9309 §2.2.4 allows
#: non-rule lines anywhere; Sitemap is host-global, Crawl-delay is
#: honored per-group by most crawlers). The URL capture stops at tab as
#: well as space; the delay capture is an ANCHORED decimal — '[0-9.]+'
#: would let '1.2.3' through to a cast('double') that THROWS under
#: Spark 4 ANSI mode, aborting the whole job on one malformed host
_SITEMAP_RE = "(?i)^[ \\t]*sitemap[ \\t]*:[ \\t]*([^#\\r\\t ]+)"
_DELAY_RE = "(?i)^[ \\t]*crawl-delay[ \\t]*:[ \\t]*([0-9]+(\\.[0-9]+)?)[ \\t]*([#\\r]|$)"


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """``(host, sitemap_url)`` — the frontier-seed directive. Sitemap
    lines are host-GLOBAL (valid anywhere in the file, outside any
    user-agent group, per RFC 9309), so this is one explode + one
    regexp per line, no group bookkeeping. Distinct: the same sitemap
    repeated across groups is one seed."""
    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.explode(F.split(F.col(text_col), "\r?\n")).alias("line"),
        )
        .select(
            "host",
            F.regexp_extract("line", _SITEMAP_RE, 1).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def robots_crawl_delay(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str | None = None,
) -> DataFrame:
    """``(host, crawl_delay_s)`` — the per-host pacing hint from the
    applicable user-agent group (same group resolution as
    :func:`robots_txt_rules` BY CONSTRUCTION — both call the shared
    ``_grouped_lines`` / ``_select_agent_groups`` helpers: named agent
    first when given, ``*`` fallback; hosts stating no delay are
    absent — the caller's default pacing applies). Multiple delay
    lines in the applicable groups resolve to the MAXIMUM (the
    conservative pace, matching the module-wide never-over-fetch
    stance); malformed values ('1.2.3') fail the anchored decimal
    capture and are skipped — they never reach the double cast, which
    would abort the job under ANSI mode."""
    starts = _grouped_lines(
        robots,
        host_col,
        text_col,
        {"delay": F.regexp_extract("line", _DELAY_RE, 1)},
    )
    selected = _select_agent_groups(starts, agent, "robots_crawl_delay")
    return (
        starts.filter(F.col("delay") != "")
        .join(selected, ["host", "grp"])
        .groupBy("host")
        .agg(F.max(F.col("delay").cast("double")).alias("crawl_delay_s"))
    )


def robots_fixture(spark, sf_dir: str) -> DataFrame:
    """Deterministic per-host robots.txt bodies derived from the
    documents table — the gated ``robots_rules`` row's input: each doc
    contributes one line (rule kind by doc_id % 5, incl. wildcard and
    '$' patterns and comments) under a 'User-agent: *' header per host
    'h<doc_id % 7>.com'. The DuckDB twin
    (``oracle_sql_ext.sql_robots_rules_fixture``) states what a correct
    parse of these bodies recovers, conservative wildcard/'$'
    degradation included."""
    from ccm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ds = d.cast("string")
    k = d % 5
    line = (
        F.when(k == 0, F.concat(F.lit("Disallow: /d"), ds, F.lit("/")))
        .when(k == 1, F.concat(F.lit("Allow: /d"), ds, F.lit("/ok")))
        .when(k == 2, F.concat(F.lit("Disallow: /w"), ds, F.lit("/*.php")))
        .when(k == 3, F.concat(F.lit("Disallow: /e"), ds, F.lit("$")))
        .otherwise(F.concat(F.lit("# comment "), ds))
    )
    host = F.concat(F.lit("h"), (d % 7).cast("string"), F.lit(".com"))
    return (
        docs.select(host.alias("host"), d.alias("doc_id"), line.alias("line"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("User-agent: *\n"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                ),
            ).alias("robots_txt")
        )
    )
