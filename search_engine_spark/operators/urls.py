"""URL normalization + per-domain corpus statistics.

Re-expresses the reference crawler's URL machinery as corpus-curation
operators (the crawl itself is out of scope — the input table IS the
crawl's output — but its URL semantics survive into curation):

* ``normalizeURL`` (/root/reference/src/cis5550/jobs/Crawler.java:121-307):
  case-normalize scheme+host, drop the ``#fragment``, drop default ports
  (``:80`` for http, ``:443`` for https), drop a trailing slash —
  → :func:`canonical_url`.
* hosts-table keying by hostname (Crawler.java:441-497) →
  :func:`url_host` / :func:`registered_domain`.
* ``canonicalURL`` page-dedup (Crawler.java:519-525, 706-778) →
  :func:`url_dedup` (one representative per canonical URL).

Per-domain aggregation is the standard webtext-pipeline shape (C4 and
successors filter and cap per registered domain): :func:`domain_stats`
gives the per-domain doc/char/language profile those policies consume.

Everything is JVM ``regexp_*``/string built-ins — whole-stage codegen,
zero Python, zero extra shuffles beyond the one keyed aggregation in
``domain_stats``/``url_dedup``. Each regex is restricted to syntax that
Java regex (Spark) and RE2 (DuckDB) interpret identically, and every
operator ships a DuckDB SQL mirror for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# scheme://[userinfo@]host[:port] — group 1 = host. Anchored; no
# lookaround (RE2-safe). Applied to the LOWERCASED url.
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)"

# scheme + authority prefix (case-insensitive part of a URL per RFC 3986)
_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def url_host(url: str | Column) -> Column:
    """Hostname of ``url`` (lowercased; empty string when no scheme)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(F.lower(u), _HOST_RE, 1)


def url_host_sql(url: str) -> str:
    return f"regexp_extract(lower({url}), '{_HOST_RE}', 1)"


def registered_domain(url: str | Column) -> Column:
    """Last two host labels (``a.b.example.co`` → ``example.co``) — the
    per-domain grouping key webtext policies cap/filter on. A public-
    suffix list would refine ccTLD pairs; two labels is the deterministic,
    dependency-free approximation (documented contract, mirrored in SQL).
    Single-label hosts (``localhost``) pass through whole."""
    h = url_host(url)
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", h).otherwise(two)


def registered_domain_sql(url: str) -> str:
    h = url_host_sql(url)
    return (
        f"CASE WHEN regexp_extract({h}, '([^.]+\\.[^.]+)$', 1) = '' "
        f"THEN {h} ELSE regexp_extract({h}, '([^.]+\\.[^.]+)$', 1) END"
    )


def canonical_url(url: str | Column) -> Column:
    """Crawler-grade URL canonicalization (Crawler.java:121-307 subset
    that applies to absolute URLs): lowercase scheme+authority (path and
    query keep their case — they are case-sensitive per RFC 3986), strip
    ``#fragment``, strip default ports, strip one path-terminating
    trailing slash (a slash ending a query string is data and is kept)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # fragment never reaches a server
    prefix = F.lower(F.regexp_extract(u, _PREFIX_RE, 1))
    rest = F.regexp_replace(u, _PREFIX_RE, "")
    prefix = F.regexp_replace(prefix, r"^(http://[^/:]+):80$", r"$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/:]+):443$", r"$1")
    # strip the slash only when it terminates the PATH (no query present):
    # a '/' ending a query value ('?to=/') is data, not path decoration.
    # RE2 has no lookahead, so anchor on "no '?' anywhere before it".
    return F.regexp_replace(F.concat(prefix, rest), r"^([^?]*)/$", r"$1")


def canonical_url_sql(url: str) -> str:
    u = f"regexp_replace({url}, '#.*$', '')"
    prefix = f"lower(regexp_extract({u}, '{_PREFIX_RE}', 1))"
    prefix = f"regexp_replace({prefix}, '^(http://[^/:]+):80$', '\\1')"
    prefix = f"regexp_replace({prefix}, '^(https://[^/:]+):443$', '\\1')"
    rest = f"regexp_replace({u}, '{_PREFIX_RE}', '')"
    return (
        f"regexp_replace(concat({prefix}, {rest}), '^([^?]*)/$', '\\1')"
    )


def domain_stats(
    df: DataFrame, url: str = "url", text: str = "text", lang: str = "lang"
) -> DataFrame:
    """(domain, n_docs, n_chars, n_langs, n_hosts) per registered domain —
    the profile per-domain caps/filters consume. ONE hash aggregation
    (distinct counts rewrite to partial sketches under the hood); at
    100 TB this is the cheapest possible shape for the statistic."""
    return (
        df.select(
            registered_domain(url).alias("domain"),
            url_host(url).alias("_host"),
            F.length(F.col(text)).cast("long").alias("_chars"),
            F.col(lang).alias("_lang"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_chars").alias("n_chars"),
            F.countDistinct("_lang").alias("n_langs"),
            F.countDistinct("_host").alias("n_hosts"),
        )
    )


def domain_stats_sql(
    table: str = "documents", url: str = "url", text: str = "text",
    lang: str = "lang",
) -> str:
    return f"""
SELECT {registered_domain_sql(url)} AS domain,
       count(*) AS n_docs,
       sum(length({text}))::BIGINT AS n_chars,
       count(DISTINCT {lang})::BIGINT AS n_langs,
       count(DISTINCT {url_host_sql(url)})::BIGINT AS n_hosts
FROM {table} GROUP BY 1
"""


def url_dedup(
    df: DataFrame, url: str = "url", docid: str = "doc_id"
) -> DataFrame:
    """(docid, canonical_url): one representative (min docid) per
    canonical URL — the reference's canonicalURL duplicate handling
    (Crawler.java:519-525) as a batch keep-table. Same single-shuffle
    shape as exact content dedup: groupBy(canon).min(docid)."""
    return (
        df.select(
            F.col(docid).alias("docid"),
            canonical_url(url).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(F.min("docid").alias("docid"))
        .select("docid", "canonical_url")
    )


def url_dedup_sql(
    table: str = "documents", url: str = "url", docid: str = "doc_id"
) -> str:
    return f"""
SELECT min({docid})::BIGINT AS docid,
       {canonical_url_sql(url)} AS canonical_url
FROM {table} GROUP BY 2
"""


# ---------------------------------------------------------------------------
# Per-domain quota cap (C4-style corpus balancing)
# ---------------------------------------------------------------------------

# bounded-skew salting for the two-level window (same construction as the
# frontier politeness cap, frontier.py)
CAP_SALT_BUCKETS = 64


def domain_cap(
    df: DataFrame,
    cap: int,
    url: str = "url",
    key: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain — the C4-style
    corpus-balancing rule that stops a boilerplate-heavy megasite from
    dominating the training mix.

    Keep priority within a domain is HASH order on ``key`` (an unbiased
    deterministic sample of the domain's docs, not "first crawled"), key
    ascending as the tie-break. Skew-safe two-level window: level 1 caps
    within (domain, key-hash salt) buckets so a 10^9-doc domain never
    sends its whole row set to one window task; level 2's per-domain
    window then sees ≤ CAP_SALT_BUCKETS·cap rows per domain.
    Result-identical to the single global window (every globally-kept row
    survives its own bucket's local cap); the SQL mirror keeps the
    one-window form. Output: the input columns plus ``domain``.
    """
    from search_engine_spark.functions.hashing import md5_int

    dom = registered_domain(url)
    h = md5_int(F.col(key).cast("string"), seed="domaincap")
    salt = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(CAP_SALT_BUCKETS))
    d = df.withColumn("domain", dom)
    from pyspark.sql import Window

    w1 = Window.partitionBy("domain", salt).orderBy(
        h.asc(), F.col(key).asc()
    )
    w2 = Window.partitionBy("domain").orderBy(h.asc(), F.col(key).asc())
    return (
        d.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= cap)
        .withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= cap)
        .drop("_rn1", "_rn2")
    )


def domain_cap_sql(
    cap: int,
    table: str = "documents",
    url: str = "url",
    key: str = "doc_id",
    cols: str = "*",
    extra_cte: str = "",
) -> str:
    """DuckDB mirror of :func:`domain_cap` (single-window form).
    ``extra_cte`` prepends CTE definitions (e.g. a derived source table)
    into the same WITH clause."""
    from search_engine_spark.functions.hashing import md5_int_sql

    h = md5_int_sql(f"CAST({key} AS VARCHAR)", seed="domaincap")
    lead = f"{extra_cte}," if extra_cte else ""
    return f"""
WITH {lead} dc AS (
  SELECT {cols}, {registered_domain_sql(url)} AS domain FROM {table}
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY domain ORDER BY {h} ASC, {key} ASC) AS rn
  FROM dc
)
SELECT * EXCLUDE (rn) FROM ranked WHERE rn <= {cap}
"""


# ---------------------------------------------------------------------------
# Crawl snapshot delta (what changed between two crawls)
# ---------------------------------------------------------------------------

def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    fp: str = "fp",
    include_unchanged: bool = False,
) -> DataFrame:
    """(url, change) between two crawl snapshots keyed by ``key`` with a
    content fingerprint column ``fp``: ``added`` (url only in new),
    ``removed`` (only in old), ``changed`` (both, fingerprint differs),
    ``unchanged`` (dropped unless ``include_unchanged``).

    The incremental-recrawl primitive: downstream passes (re-extract,
    re-index, re-dedup) consume the delta instead of the full snapshot.
    One co-partitioned full-outer join on the url key — at 10^12 pages
    both sides are url-bucketed Iceberg tables, so the join is
    shuffle-free on matching layouts; nothing here is order-dependent.
    """
    o = old.select(F.col(key).alias("url"), F.col(fp).alias("_fp_old"))
    n = new.select(F.col(key).alias("url"), F.col(fp).alias("_fp_new"))
    j = o.join(n, "url", "full_outer")
    change = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select("url", change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def crawl_delta_sql(
    old_sql: str,
    new_sql: str,
    include_unchanged: bool = False,
) -> str:
    """DuckDB mirror of :func:`crawl_delta`; ``old_sql``/``new_sql`` are
    complete SELECTs yielding (url, fp)."""
    where = "" if include_unchanged else "WHERE change <> 'unchanged'"
    return f"""
WITH o AS ({old_sql}),
n AS ({new_sql}),
j AS (
  SELECT coalesce(o.url, n.url) AS url, o.fp AS fp_old, n.fp AS fp_new
  FROM o FULL OUTER JOIN n ON o.url = n.url
)
SELECT url,
       CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old <> fp_new THEN 'changed'
            ELSE 'unchanged' END AS change
FROM j {where}
"""
