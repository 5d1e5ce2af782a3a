"""URL and domain hygiene — the filters a real pretraining pipeline runs
BEFORE any content hashing.

The reference has no text or URL surface at all (SURVEY.md §2.1); this
module covers the metadata-level first pass of corpus assembly: URL
canonicalisation (case, default ports, tracking parameters, fragments),
URL-exact dedup (the cheapest duplicate family — same page fetched twice),
and per-domain document caps (a handful of boilerplate-heavy domains
otherwise dominate a crawl).

Everything here is pure JVM-side expression work — regexp_extract +
higher-order array functions, whole-stage-codegen'd, zero UDFs and zero
extra shuffles beyond the one hash-aggregate / capped window each op
inherently needs — and every regex is engine-portable, so the DuckDB twin
in ``tests/test_urls.py`` replays the normalisation byte-for-byte.

Normalisation contract (deliberately conservative — it never merges URLs
that could be different resources):
  - scheme and host lowercased; trailing dot on the host dropped
  - userinfo (``user:pass@``) dropped
  - default ports dropped (http:80, https:443); other ports kept
  - fragment dropped (never sent to the server); a '?' inside the
    fragment is fragment text, not a query
  - bracketed IPv6 hosts ('[::1]') kept whole; a host opening an
    unclosed/empty bracket is unparseable (NULL), never truncated
  - tracking query parameters dropped (utm_*, gclid, fbclid, msclkid,
    igshid, mc_cid, mc_eid, ref, ref_src, spm), remaining parameters
    sorted byte-lexicographically; empty query dropped
  - empty path becomes "/"
  - NO dot-segment resolution, percent-decoding, or www-stripping in
    ``url_norm`` (those can change the resource); ``domain`` does strip a
    leading "www." because capping treats www/apex as one publisher
Unparseable URLs (no ``scheme://host``) get NULL url_norm/domain and are
passed through — dropping silently would hide data-quality problems.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ccm_spark.functions.hashing import md5_long
from ccm_spark.functions.partitioning import spread

# one alternation both Spark (Java regex) and DuckDB (RE2) accept
TRACKING_PARAM_RE = (
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid"
    "|ref|ref_src|spm)="
)

_SCHEME_RE = "^[ \\t]*([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[ \\t]*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[ \\t]*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# lazy prefix anchors the query BEFORE any fragment: a '?' inside the
# fragment ('/p#sec?a=1') is not a query (r6 advice)
_QUERY_RE = "^[^#]*?\\?([^#]*)"
# bracketed IPv6 literals ('[::1]') tried first so the colon-based
# host/port split never truncates them (r6 advice); leftmost-first
# alternation holds in both Java regex and RE2
_HOST_RE = "^(?:[^@]*@)?(\\[[^\\]]*\\]|[^:]*)"
_PORT_RE = ":([0-9]+)$"
# a host that OPENS a bracket must be a complete non-empty '[...]'
# literal; '[::1' (unclosed) or '[]' is unparseable, not host '['
_VALID_BRACKET_RE = "^\\[[^\\]]+\\]$"


def _host_invalid(host: Column) -> Column:
    return host.startswith("[") & ~host.rlike(_VALID_BRACKET_RE)


def url_parts(url: Column) -> dict[str, Column]:
    """The raw URL components as codegen expressions (empty string where a
    component is absent — regexp_extract's no-match convention)."""
    scheme = F.regexp_extract(url, _SCHEME_RE, 1)
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    return {
        "scheme": scheme,
        "host": F.regexp_extract(auth, _HOST_RE, 1),
        "port": F.regexp_extract(auth, _PORT_RE, 1),
        "path": F.regexp_extract(url, _PATH_RE, 1),
        "query": F.regexp_extract(url, _QUERY_RE, 1),
    }


def _host_from_parts(p: dict[str, Column]) -> Column:
    """The shared host key computed from an ALREADY-PARSED ``url_parts``
    dict — callers that hold ``p`` must use this form, not
    :func:`url_host`, or the auth/host regexes run twice per row
    (Catalyst does no subexpression elimination across Filter/Project,
    and ``url_parseable`` sits pushed-down on the ~100 GB URL column)."""
    return F.regexp_replace(F.lower(p["host"]), "\\.$", "")


def url_normalize(url: Column) -> Column:
    """Canonical URL string per the module contract; NULL when the value
    does not parse as ``scheme://host...``."""
    p = url_parts(url)
    scheme = F.lower(p["scheme"])
    host = _host_from_parts(p)
    default_port = ((scheme == "http") & (p["port"] == "80")) | (
        (scheme == "https") & (p["port"] == "443")
    )
    port_part = F.when(
        (p["port"] == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    kept = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(kept) == 0, F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(kept, "&")))
    return F.when(
        (scheme == "") | (host == "") | _host_invalid(host),
        F.lit(None).cast("string"),
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path, query_part))


def url_host(url: Column) -> Column:
    """Lowercased host with any trailing dot stripped — THE host key
    every consumer must agree on (robots rule join, crawl examples).
    This round's hand-rolled host regex in an example captured the
    USERINFO of ``user:pass@host`` URLs and silently un-keyed the
    host's robots rules — hence one shared expression. Empty string
    (not NULL) for unparseable input, matching ``url_parts``. Callers
    already holding a ``url_parts`` dict use :func:`_host_from_parts`
    to avoid re-running the parse regexes."""
    return _host_from_parts(url_parts(url))


def url_domain(url: Column) -> Column:
    """Lowercased host with any leading "www." stripped — the per-publisher
    cap key. NULL for unparseable URLs."""
    p = url_parts(url)
    host = _host_from_parts(p)
    dom = F.regexp_replace(host, "^www\\.", "")
    return F.when(
        (F.lower(p["scheme"]) == "") | (dom == "") | _host_invalid(host),
        F.lit(None).cast("string"),
    ).otherwise(dom)


def url_parseable(url: Column) -> Column:
    """True iff :func:`url_normalize` would be non-NULL — the SAME
    ``scheme != '' AND stripped-host != ''`` subexpressions, exposed
    separately because a pushed-down ``url_norm IS NOT NULL`` filter
    re-inlines the ENTIRE normalisation expression into the Filter node
    (Catalyst does not CSE across Filter/Project), doubling the regex
    work per row; this predicate is 4 regex ops instead of ~12."""
    p = url_parts(url)
    host = _host_from_parts(p)
    return (p["scheme"] != "") & (host != "") & ~_host_invalid(host)


def with_url_normalized(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``url_norm`` and ``domain`` — a pure narrow projection (no
    shuffle, streaming-safe), the shared first step of both ops below."""
    u = F.col(url_col)
    return df.withColumn("url_norm", url_normalize(u)).withColumn(
        "domain", url_domain(u)
    )


def url_duplicates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-exact dedup after normalisation: one row per distinct
    ``url_norm`` with the representative (minimum) doc_id and the copy
    count — the same contract as ``dedup.exact_duplicates`` over content
    hashes, but on the metadata the crawler already has (no text ever
    read: at 100 TB this dedups from the ~100 GB URL column alone).
    Unparseable URLs (NULL url_norm) are excluded — NULL is not one
    identity; the exclusion filters on :func:`url_parseable` (equivalent
    to ``url_norm IS NOT NULL`` by construction, ~4x cheaper after
    predicate pushdown). One map-side-combined hash aggregate; scales
    like any groupBy on a high-cardinality key."""
    return (
        df.where(url_parseable(F.col(url_col)))
        .transform(lambda d: with_url_normalized(d, url_col))
        .groupBy("url_norm")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: list[str] | DataFrame,
    url_col: str = "url",
    include_subdomains: bool = True,
) -> DataFrame:
    """Drop documents whose domain is on a blocklist (licensing
    takedowns, spam lists, opted-out publishers) — the policy filter
    that runs right after canonicalisation. ``blocklist`` is a list of
    domains or a one-column DataFrame; ``include_subdomains`` also
    blocks ``*.blocked.com`` (suffix match on a dot boundary — the
    registrable-domain convention). Unparseable URLs pass through (the
    hygiene layer never silently drops what it could not classify).

    Plan: ONE corpus pass — a broadcast LEFT join against the blocklist
    (block lists are thousands of rows, corpora are billions; subdomain
    matching is an inequality condition, still against the broadcast
    side) keeps the rows with no match. A doc matching several
    blocklist rows produces several matched rows, but every one of them
    is filtered, so the kept set never duplicates — and the corpus is
    scanned once, where a semi-then-anti formulation would scan it
    twice."""
    spark = df.sparkSession
    if isinstance(blocklist, list):
        bdf = spark.createDataFrame(
            [(d.lower(),) for d in blocklist], "blocked string"
        )
    else:
        bdf = blocklist.select(F.lower(F.col(blocklist.columns[0])).alias("blocked"))
    base = with_url_normalized(df, url_col)
    if include_subdomains:
        cond = (F.col("domain") == F.col("blocked")) | F.col("domain").endswith(
            F.concat(F.lit("."), F.col("blocked"))
        )
    else:
        cond = F.col("domain") == F.col("blocked")
    return (
        base.join(F.broadcast(bdf), cond, "left")
        .where(F.col("blocked").isNull())
        .drop("blocked", "url_norm", "domain")
    )


def url_index(df: DataFrame, url_col: str = "url") -> DataFrame:
    """The corpus's canonical-URL set: one row per distinct ``url_norm``
    with its representative doc and copy count — persist/write this once
    and probe ingestion increments against it (the URL twin of
    ``dedup.minhash_index``)."""
    return url_duplicates(df, url_col)


def probe_url_index(increment: DataFrame, index: DataFrame, url_col: str = "url") -> DataFrame:
    """Ingestion-time URL dedup: flag each increment document whose
    canonical URL already exists in a (static, persisted) index —
    (doc_id, url_norm, is_known, known_doc_id). A pure stream-static
    LEFT JOIN after the narrow normalisation, so it runs identically on
    a STREAMING increment in append mode with zero state (stream ==
    batch test-pinned); unparseable URLs probe as not-known with NULL
    url_norm. The index side is the bounded-by-corpus distinct-URL
    relation; Spark re-broadcasts or shuffles it per its size, exactly
    like the MinHash index probe."""
    inc = with_url_normalized(increment, url_col).select(
        "doc_id", "url_norm"
    )
    idx = index.select(
        "url_norm", F.col("keep_doc_id").alias("known_doc_id")
    )
    return inc.join(idx, "url_norm", "left").select(
        "doc_id",
        "url_norm",
        F.col("known_doc_id").isNotNull().alias("is_known"),
        "known_doc_id",
    )


def domain_cap(
    df: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    salt: str = "domcap1",
) -> DataFrame:
    """Per-domain document cap: keep at most ``max_per_domain`` docs per
    domain, chosen by deterministic md5 sample key (a uniform draw that is
    a pure function of (doc_id, salt) — reproducible on any cluster size,
    and unbiased w.r.t. crawl order, unlike "first N seen").

    Two-phase top-k (the ``mixing.stratified_sample`` shape): each scan
    partition keeps its local ``max_per_domain`` smallest keys per domain,
    so the global per-domain rank window sees at most cap x num_partitions
    rows per domain — a mega-domain never lands on one task. Unparseable
    URLs pass through with ``cap_rank`` NULL (hygiene must not silently
    drop rows it could not classify; filter ``domain IS NULL`` explicitly
    if desired). Emits the kept docs with their ``domain`` and
    ``cap_rank`` in [1, cap]."""
    if max_per_domain < 1:
        raise ValueError(f"domain_cap: max_per_domain must be >= 1, got {max_per_domain}")
    key = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt)))
    base = spread(with_url_normalized(df, url_col), "doc_id").withColumn(
        "cap_key", key
    )
    parseable = base.where(F.col("domain").isNotNull())
    order = [F.col("cap_key").asc(), F.col("doc_id").asc()]
    local_w = Window.partitionBy("split_id", "domain").orderBy(*order)
    survivors = (
        parseable.withColumn("split_id", F.spark_partition_id())
        .withColumn("lr", F.row_number().over(local_w))
        .where(F.col("lr") <= max_per_domain)
    )
    w = Window.partitionBy("domain").orderBy(*order)
    capped = (
        survivors.withColumn("cap_rank", F.row_number().over(w))
        .where(F.col("cap_rank") <= max_per_domain)
        .select(*df.columns, "domain", "cap_rank")
    )
    unparseable = base.where(F.col("domain").isNull()).select(
        *df.columns, "domain", F.lit(None).cast("int").alias("cap_rank")
    )
    return capped.unionByName(unparseable)
