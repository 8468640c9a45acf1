"""Result-serving operators: query-aware snippets, recency-fused ranking,
and per-host result collapsing.

The reference frontend assembles each hit as (title, description, url)
where the "description" is a blind page prefix — frontend/Master.java:74
stores the first quarter of every page at startup and Master.java:215-239
returns `page.substring(0, 200)`-style prefixes per hit. These operators
are the query-aware upgrades a production serving tier needs:

* :func:`snippets` — per-hit extract window centred on the FIRST query-term
  occurrence, query terms highlighted with ``<b>``/``</b>``. Deterministic
  (token window, fixed width), built-ins only, exactly SQL-mirrorable.
* :func:`recency_rerank` — freshness fusion: BM25 score divided by a
  hyperbolic age decay ``1 + age_days/scale_days`` (the warc_ts column of
  the input contract is the age source). Applied to a top-``pool``
  candidate set, never the full corpus.
* :func:`host_collapse` — site collapsing: keep only the best-scoring hit
  per host before the final top-k, so one domain cannot monopolise the
  page (the classic web-search diversity rule).

All three are re-ranking layers over an already-pruned candidate pool
(top-N from the index), so at 100 TB their input is O(pool), not O(corpus):
the expensive part stays in the WAND/index tier, and these run as a
broadcast-sized tail on the driver-adjacent stage. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from search_engine_spark.operators.text_ops import (
    SCORE_DECIMALS,
    query_terms,
    tokens_col,
)
from search_engine_spark.session import widen_small_input

# Sentinel "not found" position — larger than any real document length.
NOT_FOUND = 1 << 30


def _first_hit_pos(toks: Column, terms: list[str]) -> Column:
    """1-based position of the first occurrence of ANY query term, or
    NOT_FOUND. Spark's array_position returns 0 for "absent"; DuckDB's
    list_position returns NULL — both normalise to the sentinel so the
    least() is engine-portable (Spark's least ignores nulls, DuckDB's
    semantics differ version-to-version; a sentinel sidesteps both)."""
    pos = [
        F.coalesce(
            F.nullif(F.array_position(toks, t), F.lit(0)),
            F.lit(NOT_FOUND).cast("long"),
        )
        for t in terms
    ]
    return pos[0] if len(pos) == 1 else F.least(*pos)


def snippets(
    docs: DataFrame,
    query: str,
    before: int = 3,
    width: int = 12,
    docid: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(docid, snippet) for every document containing ≥1 query term.

    Snippet = the ``width``-token window starting ``before`` tokens before
    the first query-term occurrence, each query term wrapped in
    ``<b>…</b>``, joined by single spaces. Whole-stage codegen end to end;
    join it to a top-k result to cap output at serving size.
    """
    terms = query_terms(query)
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "docid long, snippet string"
        )
    d = widen_small_input(docs, light=True).select(
        F.col(docid).alias("docid"), tokens_col(text).alias("_toks")
    )
    p = _first_hit_pos(F.col("_toks"), terms)
    start = F.greatest(F.lit(1).cast("long"), p - F.lit(before))
    window = F.slice(F.col("_toks"), start, width)
    marked = F.transform(
        window,
        lambda x: F.when(
            x.isin(terms), F.concat(F.lit("<b>"), x, F.lit("</b>"))
        ).otherwise(x),
    )
    return (
        d.select("docid", p.alias("_p"), F.array_join(marked, " ").alias("snippet"))
        .filter(F.col("_p") < NOT_FOUND)
        .select("docid", "snippet")
    )


def snippets_sql(
    query: str,
    before: int = 3,
    width: int = 12,
    table: str = "documents",
    docid: str = "doc_id",
    text: str = "text",
) -> str:
    """DuckDB mirror of :func:`snippets` — same window, same sentinel."""
    terms = query_terms(query)
    # nullif-guarded: DuckDB's list_position returns 0 for "absent"
    # (like Spark's array_position), NOT NULL — without the nullif an
    # absent term would anchor every snippet at position 0 (caught by
    # tests/test_serving.py crafted parity).
    least_args = ", ".join(
        f"coalesce(nullif(list_position(toks, '{t}'), 0), {NOT_FOUND})"
        for t in terms
    )
    p = least_args if len(terms) == 1 else f"least({least_args})"
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH stoks AS (
  SELECT {docid} AS docid,
         list_filter(string_split_regex(lower({text}), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM {table}
),
hit AS (SELECT docid, toks, {p} AS p FROM stoks)
SELECT docid,
       array_to_string(
         list_transform(
           toks[greatest(1, p - {before}) :
                greatest(1, p - {before}) + {width} - 1],
           x -> CASE WHEN x IN ({in_list})
                     THEN '<b>' || x || '</b>' ELSE x END),
         ' ') AS snippet
FROM hit WHERE p < {NOT_FOUND}
"""


def recency_rerank(
    hits: DataFrame,
    ages: DataFrame,
    k: int = 10,
    scale_days: float = 30.0,
    decimals: int = SCORE_DECIMALS,
) -> DataFrame:
    """Freshness-fused top-k: ``fscore = score / (1 + age_days/scale_days)``.

    ``hits``   — (docid, score): a top-``pool`` candidate set (already
    rounded to ``decimals``; rounding first keeps the fusion input
    identical across engines).
    ``ages``   — (docid, age_secs): document age in seconds (from the
    ``warc_ts`` column of the page contract: ``now - warc_ts``).

    The join is pool-sized × corpus-sided — Spark broadcasts the hits side
    automatically under AQE; the division order (``/86400.0`` then
    ``/scale_days``) is pinned so the doubles are bit-identical to the SQL
    mirror before the final rounding. Output (docid, score, fscore),
    ordered (fscore desc, docid asc), limited to k.
    """
    decay = (
        F.lit(1.0)
        + F.col("age_secs") / F.lit(86400.0) / F.lit(float(scale_days))
    )
    fused = hits.join(ages, "docid").select(
        "docid",
        "score",
        F.round(F.col("score") / decay, decimals).alias("fscore"),
    )
    return fused.orderBy(
        F.col("fscore").desc(), F.col("docid").asc()
    ).limit(k)


def recency_rerank_sql(
    hits_sql: str,
    ages_sql: str,
    k: int = 10,
    scale_days: float = 30.0,
    decimals: int = SCORE_DECIMALS,
) -> str:
    """DuckDB mirror of :func:`recency_rerank`; ``hits_sql``/``ages_sql``
    are complete SELECTs yielding (docid, score) / (docid, age_secs)."""
    return f"""
WITH rhits AS ({hits_sql}),
rages AS ({ages_sql})
SELECT rhits.docid, score,
       round(score / (1.0 + age_secs / 86400.0 / {float(scale_days)}),
             {decimals}) AS fscore
FROM rhits JOIN rages ON rhits.docid = rages.docid
ORDER BY fscore DESC, rhits.docid ASC
LIMIT {k}
"""


def host_collapse(
    hits: DataFrame,
    k: int = 10,
    host: str = "host",
    docid: str = "docid",
    score: str = "score",
) -> DataFrame:
    """Site-collapsed top-k: best hit per host, then global top-k.

    ``hits`` — (docid, host, score) candidate pool. One window pass
    (partition by host, order score desc / docid asc) keeps rank-1 per
    host; the final ordering is the usual (score desc, docid asc). The
    input is a top-``pool`` result set, so the window runs on O(pool)
    rows regardless of corpus size.
    """
    w = Window.partitionBy(host).orderBy(
        F.col(score).desc(), F.col(docid).asc()
    )
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(F.col(score).desc(), F.col(docid).asc())
        .limit(k)
    )


def host_collapse_sql(
    hits_sql: str, k: int = 10, host: str = "host"
) -> str:
    """DuckDB mirror of :func:`host_collapse`; ``hits_sql`` yields
    (docid, host, score)."""
    return f"""
WITH pool AS ({hits_sql}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {host} ORDER BY score DESC, docid ASC) AS rn
  FROM pool
)
SELECT docid, {host}, score FROM ranked WHERE rn = 1
ORDER BY score DESC, docid ASC
LIMIT {k}
"""
