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
