"""Whole-stage-codegen text operators over any (docid, text) table.

Everything in this module is built from pyspark.sql built-ins only — no
Python UDFs — so it stays JVM-side (WholeStageCodegen), benefits from
predicate pushdown / column pruning, and is exactly mirrorable in ANSI SQL
(the DuckDB oracle gate).

Tokenization here is the SQL-expressible "simple" token stream
(lower → [^a-z0-9]+ → split); the full reference-parity tokenizer with
Porter dual-indexing lives in the pandas-UDF indexer (operators/indexer.py)
and is verified against the pure-Python oracle in tests/.

BM25 constants & semantics match the oracle (oracle/bm25.py): k1=1.2,
b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1), tie-break (score desc, docid asc).
Scores are rounded to 6 decimals BEFORE ranking so ordering is stable across
engines (floating-point summation order differs between Spark and DuckDB).

Replaces the reference's query path (/root/reference/src/cis5550/frontend/
Master.java:356-601: per-term threads over KVS getRow + sampled tf-idf) with
declarative plans Catalyst can optimize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from search_engine_spark.oracle.bm25 import B, K1
from search_engine_spark.oracle.text import STOPWORDS, simple_tokens
from search_engine_spark.session import widen_small_input

TOKEN_SEP_RE = "[^a-z0-9]+"
SCORE_DECIMALS = 6


def tokens_col(text_col: str | Column) -> Column:
    """array<string> of simple tokens — built-ins only."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    arr = F.split(F.regexp_replace(F.lower(c), TOKEN_SEP_RE, " "), " ")
    return F.filter(arr, lambda x: x != "")


def exploded_terms(
    df: DataFrame, docid: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(docid, pos, term) — one row per token occurrence, 1-based positions."""
    df = widen_small_input(df, light=True)
    return df.select(
        F.col(docid).alias("docid"),
        F.posexplode(tokens_col(text)).alias("pos0", "term"),
    ).select("docid", (F.col("pos0") + 1).alias("pos"), "term")


def term_frequencies(
    df: DataFrame, docid: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(docid, term, tf) — map-side partial aggregation applies (hash agg)."""
    return (
        exploded_terms(df, docid, text)
        .groupBy("docid", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(df: DataFrame, docid: str = "doc_id", text: str = "text") -> DataFrame:
    """(docid, dl) — token count per document, no shuffle (per-row size)."""
    return df.select(
        F.col(docid).alias("docid"), F.size(tokens_col(text)).alias("dl")
    )


def document_frequencies(
    df: DataFrame, docid: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(term, df, cf) over the corpus. array_distinct per doc first → the
    shuffle carries one row per (doc, distinct term), not per occurrence."""
    per_doc = df.select(
        F.col(docid).alias("docid"),
        F.explode(tokens_col(text)).alias("term"),
    ).groupBy("docid", "term").agg(F.count(F.lit(1)).alias("tf"))
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def bm25_idf_col(n_docs: Column | int, df_col: Column) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return F.log((n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0))


def query_terms(query: str, stem: bool = False) -> list[str]:
    """Tokenize a query string driver-side, drop stopwords, dedup (ordered).
    Mirrors reference frontend/Master.java:283-296."""
    seen: list[str] = []
    for t in simple_tokens(query):
        if t in STOPWORDS or t in seen:
            continue
        seen.append(t)
    return seen


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 100,
    docid: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Exhaustive BM25 top-k over a (docid, text) table — declarative plan.

    Single-pass shape: ONE narrow projection computes (docid, dl,
    tf_per_query_term) per row — no explode, no per-occurrence shuffle.
    Corpus stats (N, avgdl, df per term) are one global aggregate over that
    projection (Catalyst reuses the subtree), broadcast back via crossJoin;
    the candidate filter (any tf > 0) prunes before scoring and the final
    ORDER BY … LIMIT compiles to TakeOrderedAndProject. Versus the naive
    4-scan formulation (tf agg + df agg + dl agg + dl join) this reads the
    corpus once per subtree use (2×) and shuffles nothing but the stats row.
    Returns (docid, score), score rounded to SCORE_DECIMALS, ordered
    (score desc, docid asc), limited to k.
    """
    terms = query_terms(query)
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "docid long, score double"
        )
    def _eq(t: str):
        # NB: a 1-arg lambda is required — F.filter treats 2-arg callables
        # (incl. default-arg closures) as (element, index) lambdas.
        return lambda x: x == F.lit(t)

    # tokenize ONCE per row: the token array is aliased in its own Project
    # so the per-term filters reference the alias. CollapseProject keeps the
    # two Projects separate (the alias is non-cheap and multiply referenced)
    # — without this, each tf column re-evaluates the regex split.
    # NOT light: the per-term tf filters below are 5-10× regex-tokenize
    # cost per byte — measured at sf0.1, widened 0.70 s vs unwidened 1.1 s.
    toks_once = widen_small_input(docs).select(
        F.col(docid).alias("docid"), tokens_col(text).alias("_toks")
    )
    arr = F.col("_toks")
    per_doc = toks_once.select(
        "docid",
        F.size(arr).alias("dl"),
        *[
            F.size(F.filter(arr, _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    denom_norm = F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl")
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf_i = F.col(f"tf{i}")
        part = (
            bm25_idf_col(F.col("n_docs"), F.col(f"df{i}"))
            * tf_i * F.lit(K1 + 1.0) / (tf_i + denom_norm)
        )
        score = score + F.when(tf_i > 0, part).otherwise(F.lit(0.0))
    # Candidate pruning happens on the UNROUNDED score (> 0 ⟺ some tf > 0,
    # since idf > 0 always) AFTER the stats join — a pre-aggregation filter
    # on the tf columns gets pushed below the Project by Catalyst, which
    # re-inlines the tokenization into the filter condition (k+1 regex
    # splits per row). This shape tokenizes exactly once per row.
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select("docid", score.alias("_s"))
        .filter(F.col("_s") > 0)
        .select("docid", F.round("_s", SCORE_DECIMALS).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def bm25_topk_sql_oracle(
    query: str,
    k: int = 100,
    table: str = "documents",
    docid: str = "doc_id",
    text: str = "text",
    where: str = "TRUE",
    weights: dict[str, int] | None = None,
) -> str:
    """ANSI/DuckDB SQL mirror of bm25_topk — same constants, same rounding,
    same tie-break. Used as the correctness-gate oracle.

    ``weights``: per-term score multiplicity. Mirrors dual-indexing query
    semantics (query matches BOTH the original term and its Porter stem;
    oracle/bm25.py query_terms) on corpora whose stem classes are
    singletons: a term whose stem differs contributes twice."""
    terms = query_terms(query)
    terms_sql = ", ".join(
        f"('{t}', {weights.get(t, 1) if weights else 1})" for t in terms
    )
    return f"""
WITH docs AS (
  SELECT {docid} AS docid, {text} AS txt FROM {table} WHERE {where}
),
qterms(term, w) AS (VALUES {terms_sql}),
toks AS (
  SELECT docid, t.term
  FROM docs,
       LATERAL unnest(string_split_regex(
         trim(regexp_replace(lower(txt), '[^a-z0-9]+', ' ', 'g')), ' '
       )) AS t(term)
  WHERE t.term <> ''
),
doclen AS (SELECT docid, count(*) AS dl FROM toks GROUP BY docid),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT d.docid, coalesce(l.dl, 0) AS dl
        FROM docs d LEFT JOIN doclen l ON d.docid = l.docid)
),
tf AS (
  SELECT docid, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qterms) GROUP BY docid, term
),
dfreq AS (SELECT term, count(DISTINCT docid) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.docid,
         round(sum(
           qterms.w
           * ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf * {K1 + 1.0}
           / (tf.tf + {K1} * ({1.0 - B} + {B} * doclen.dl / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfreq USING (term)
  JOIN doclen ON tf.docid = doclen.docid
  CROSS JOIN stats
  GROUP BY tf.docid
)
SELECT docid, score FROM scored ORDER BY score DESC, docid ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Q5: heuristic boosts (reference frontend/Master.java:375-601)
# ---------------------------------------------------------------------------

URL_BOOST = 50.0  # Master.java:437-441, 457-461: ×50 when url contains term
STEM_BOOST = 25.0  # Master.java:478-589: stemmed-term pass scored at ×25


def _stem_weights(terms: list[str]) -> dict[str, float]:
    """Per-term additive stem-pass weight. The reference runs a second
    scoring pass over the Porter stem of each query term at ×25; under the
    dual-index contract used throughout the gate (stem classes are
    singletons on the synthetic vocabulary, so the stem-pass tf equals the
    plain tf — same contract as stemmed_topk) that pass folds into an
    additive per-term multiplier: +25 iff porter_stem(t) != t."""
    from search_engine_spark.oracle.porter import porter_stem

    return {t: (STEM_BOOST if porter_stem(t) != t else 0.0) for t in terms}


def boosted_topk(
    docs: DataFrame,
    query: str,
    k: int = 100,
    docid: str = "doc_id",
    text: str = "text",
    url: Column | None = None,
    url_boost: float = URL_BOOST,
    stem_boost_by_term: dict[str, float] | None = None,
) -> DataFrame:
    """Q5: BM25 top-k with the reference's heuristic boosts
    (frontend/Master.java:375-601) grafted onto the north-star scorer.

    Each per-term BM25 contribution is multiplied by
        (url contains term ? url_boost : 1) + stem_weight(term)
    where the ×50 url-substring boost mirrors Master.java:437-441/457-461
    and the additive stem weight is the ×25 stemmed pass
    (Master.java:478-589) folded in per `_stem_weights`.

    Same single-pass plan shape as bm25_topk (tokenize once, ONE stats
    broadcast, TakeOrderedAndProject); the url column rides along the
    narrow projection so the boost is a per-row codegen'd CASE, not a join.
    """
    terms = query_terms(query)
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "docid long, score double"
        )
    stem_w = (
        stem_boost_by_term
        if stem_boost_by_term is not None
        else _stem_weights(terms)
    )
    if url is None:
        url = F.lpad(F.col(docid).cast("string"), 12, "0")

    def _eq(t: str):
        return lambda x: x == F.lit(t)

    # NOT light: same measured tradeoff as bm25_topk's tf-filter pipeline.
    toks_once = widen_small_input(docs).select(
        F.col(docid).alias("docid"),
        url.alias("_url"),
        tokens_col(text).alias("_toks"),
    )
    arr = F.col("_toks")
    per_doc = toks_once.select(
        "docid",
        F.size(arr).alias("dl"),
        *[
            F.size(F.filter(arr, _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
        *[
            (F.instr(F.col("_url"), t) > 0).alias(f"ub{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    denom_norm = F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl")
    )
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        tf_i = F.col(f"tf{i}")
        part = (
            bm25_idf_col(F.col("n_docs"), F.col(f"df{i}"))
            * tf_i * F.lit(K1 + 1.0) / (tf_i + denom_norm)
        )
        mult = (
            F.when(F.col(f"ub{i}"), F.lit(url_boost)).otherwise(F.lit(1.0))
            + F.lit(stem_w.get(t, 0.0))
        )
        score = score + F.when(tf_i > 0, part * mult).otherwise(F.lit(0.0))
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select("docid", score.alias("_s"))
        .filter(F.col("_s") > 0)
        .select("docid", F.round("_s", SCORE_DECIMALS).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def boosted_topk_sql_oracle(
    query: str,
    k: int = 100,
    table: str = "documents",
    docid: str = "doc_id",
    text: str = "text",
    url_sql: str | None = None,
    url_boost: float = URL_BOOST,
) -> str:
    """DuckDB mirror of boosted_topk — identical constants, boost rule,
    rounding, and tie-break. ``url_sql`` is a SQL expression over the base
    table's columns producing the url string (default mirrors the operator
    default lpad(docid))."""
    terms = query_terms(query)
    stem_w = _stem_weights(terms)
    if url_sql is None:
        url_sql = f"lpad(CAST({docid} AS VARCHAR), 12, '0')"
    terms_sql = ", ".join(f"('{t}', {stem_w[t]})" for t in terms)
    return f"""
WITH docs AS (
  SELECT {docid} AS docid, {text} AS txt, {url_sql} AS url FROM {table}
),
qterms(term, sw) AS (VALUES {terms_sql}),
toks AS (
  SELECT docid, t.term
  FROM docs,
       LATERAL unnest(string_split_regex(
         trim(regexp_replace(lower(txt), '[^a-z0-9]+', ' ', 'g')), ' '
       )) AS t(term)
  WHERE t.term <> ''
),
doclen AS (SELECT docid, count(*) AS dl FROM toks GROUP BY docid),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT d.docid, coalesce(l.dl, 0) AS dl
        FROM docs d LEFT JOIN doclen l ON d.docid = l.docid)
),
tf AS (
  SELECT docid, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qterms) GROUP BY docid, term
),
dfreq AS (SELECT term, count(DISTINCT docid) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.docid,
         round(sum(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf * {K1 + 1.0}
           / (tf.tf + {K1} * ({1.0 - B} + {B} * doclen.dl / stats.avgdl))
           * ((CASE WHEN contains(d.url, qterms.term)
                    THEN {url_boost} ELSE 1.0 END) + qterms.sw)
         ), {SCORE_DECIMALS}) AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfreq USING (term)
  JOIN doclen ON tf.docid = doclen.docid
  JOIN docs d ON tf.docid = d.docid
  CROSS JOIN stats
  GROUP BY tf.docid
)
SELECT docid, score FROM scored ORDER BY score DESC, docid ASC LIMIT {k}
"""


def bm25f_topk(
    docs: DataFrame,
    anchors: DataFrame,
    query: str,
    k: int = 20,
    w_anchor: float = 2.0,
    docid: str = "doc_id",
    text: str = "text",
    url: str = "url",
) -> DataFrame:
    """(docid, score) — weighted-field BM25F over body + inbound anchor
    text: per-term field tfs combine BEFORE saturation,
    ``ctf = tf_body + w_anchor·tf_anchor`` (Robertson/Zaragoza's simple
    BM25F: early combination keeps one saturation curve, so two weak
    field matches can't outscore one strong one the way score-level
    fusion allows). Length normalization uses the BODY length (anchor
    bags are unboundedly skewed — a hub page's 10^6 inbound anchors
    should raise its tf, not normalize it away); df counts docs with
    ctf > 0 so anchor-only matches contribute evidence.

    ``anchors`` is (dst, term, tf) from ``frontier.anchor_texts``; dst
    joins the docs' ``url`` column (canonical both sides by contract).
    Plan shape: the body side is the single-pass bm25_topk projection;
    the anchor side filters to query terms FIRST (pushed IN), joins the
    (docid, url) map, and folds to one row per doc — then one broadcast
    stats join and TakeOrderedAndProject. Anchor rows for non-query terms
    never shuffle."""
    terms = query_terms(query)
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "docid long, score double"
        )

    def _eq(t: str):
        return lambda x: x == F.lit(t)

    toks_once = widen_small_input(docs).select(
        F.col(docid).alias("docid"),
        F.col(url).alias("_url"),
        tokens_col(text).alias("_toks"),
    )
    arr = F.col("_toks")
    body = toks_once.select(
        "docid",
        "_url",
        F.size(arr).alias("dl"),
        *[
            F.size(F.filter(arr, _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    amap = docs.select(
        F.col(docid).alias("docid"), F.col(url).alias("_url")
    )
    atf = (
        anchors.filter(F.col("term").isin(terms))
        .join(amap, anchors["dst"] == amap["_url"])
        .groupBy("docid")
        .agg(
            *[
                F.sum(
                    F.when(F.col("term") == t, F.col("tf")).otherwise(F.lit(0))
                ).alias(f"atf{i}")
                for i, t in enumerate(terms)
            ]
        )
    )
    comb = body.join(atf, "docid", "left").select(
        "docid",
        "dl",
        *[
            (
                F.col(f"tf{i}")
                + F.lit(w_anchor) * F.coalesce(F.col(f"atf{i}"), F.lit(0))
            ).alias(f"ctf{i}")
            for i in range(len(terms))
        ],
    )
    stats = comb.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"ctf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    denom_norm = F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl")
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        ctf = F.col(f"ctf{i}")
        part = (
            bm25_idf_col(F.col("n_docs"), F.col(f"df{i}"))
            * ctf * F.lit(K1 + 1.0) / (ctf + denom_norm)
        )
        score = score + F.when(ctf > 0, part).otherwise(F.lit(0.0))
    return (
        comb.crossJoin(F.broadcast(stats))
        .select("docid", score.alias("_s"))
        .filter(F.col("_s") > 0)
        .select("docid", F.round("_s", SCORE_DECIMALS).alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )


def bm25f_sql_tail(
    query: str,
    k: int = 20,
    w_anchor: float = 2.0,
    docs_rel: str = "fdocs",
    anchors_rel: str = "fanchors",
) -> str:
    """DuckDB mirror of :func:`bm25f_topk` as the tail of a WITH chain:
    expects ``{docs_rel}(docid, url, text)`` and
    ``{anchors_rel}(dst, term, tf)`` CTEs already defined. Same combined-
    tf, body-length norm, ctf>0 df, constants, rounding, tie-break."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("bm25f_sql_tail needs ≥1 non-stopword query term")
    tf_cols = ", ".join(
        f"len(list_filter(tt, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    atf_cols = ", ".join(
        f"sum(CASE WHEN a.term = '{t}' THEN a.tf ELSE 0 END) AS atf{i}"
        for i, t in enumerate(terms)
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    ctf_cols = ", ".join(
        f"(b.tf{i} + {w_anchor} * coalesce(x.atf{i}, 0))::DOUBLE AS ctf{i}"
        for i in range(len(terms))
    )
    df_cols = ", ".join(
        f"sum((ctf{i} > 0)::BIGINT) AS df{i}" for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"""CASE WHEN c.ctf{i} > 0 THEN
          ln((s.n_docs - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0)
          * c.ctf{i} * {K1 + 1.0}
          / (c.ctf{i} + {K1} * ({1.0 - B} + {B} * c.dl / s.avgdl))
        ELSE 0.0 END"""
        for i in range(len(terms))
    )
    return f"""
fbody AS (
  SELECT docid, url, len(tt) AS dl, {tf_cols}
  FROM (SELECT docid, url,
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> x <> '') AS tt
        FROM {docs_rel})
),
fatf AS (
  SELECT d.docid, {atf_cols}
  FROM {anchors_rel} a JOIN {docs_rel} d ON a.dst = d.url
  WHERE a.term IN ({in_list})
  GROUP BY d.docid
),
fcomb AS (
  SELECT b.docid, b.dl, {ctf_cols}
  FROM fbody b LEFT JOIN fatf x USING (docid)
),
fstats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_cols} FROM fcomb
)
SELECT c.docid, round({score_terms}, {SCORE_DECIMALS}) AS score
FROM fcomb c, fstats s
WHERE {" OR ".join(f"c.ctf{i} > 0" for i in range(len(terms)))}
ORDER BY score DESC, c.docid ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# More-Like-This: tf-idf term-space document similarity
# ---------------------------------------------------------------------------

MLT_IDF_QUANT = 1000  # idf quantized to integer milli-nats (see below)


def mlt_weights(
    df: DataFrame, docid: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(docid, term, w) — tf-idf document vectors with
    ``w = tf * floor(ln(N/df) * 1e3)`` (an exact BIGINT).

    The milli-nat idf quantization is the same trick as the LM scorer's
    micro-nats (textstats.py): every downstream dot product and norm is
    INTEGER arithmetic — associative, partitioning-independent,
    bit-identical across engines — with one float division + sqrt at the
    very end. Milli (not micro) keeps w ~1e6, so pairwise products stay
    ~1e12 and corpus-scale sums sit far under int64."""
    tf = term_frequencies(df, docid, text)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = df.select(F.count(F.lit(1)).alias("_n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "docid",
            "term",
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("_n") / F.col("_df"))
                    * F.lit(MLT_IDF_QUANT)
                ).cast("long")
            ).cast("long").alias("w"),
        )
        .filter(F.col("w") > 0)  # df == N terms carry zero signal
    )


def more_like_this(
    df: DataFrame,
    query_docid: int,
    k: int = 10,
    docid: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(docid, cos) — top-``k`` documents most similar to
    ``query_docid`` by tf-idf cosine over shared terms (the classic
    related-documents / Lucene MoreLikeThis serving feature, term-space
    sibling of the embedding :func:`similarity.cosine_topk`).

    Shape: vectors and norms are term-/doc-keyed aggs with map-side
    combine; the probe is ONE co-partitioned join on ``term`` against the
    query doc's (small, broadcast) vector, then a doc-keyed dot-product
    agg — candidate docs sharing no term with the query never enter the
    join. All integer until the final cos division."""
    w = mlt_weights(df, docid, text)
    norms = w.groupBy("docid").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    qv = F.broadcast(
        w.filter(F.col("docid") == query_docid).select(
            "term", F.col("w").alias("qw")
        )
    )
    qn = F.broadcast(
        norms.filter(F.col("docid") == query_docid).select(
            F.col("n2").alias("qn2")
        )
    )
    dots = (
        w.join(qv, "term")
        .filter(F.col("docid") != query_docid)
        .groupBy("docid")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    return (
        dots.join(norms, "docid")
        .crossJoin(qn)
        .select(
            "docid",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("n2")) * F.sqrt(F.col("qn2"))),
                6,
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("docid").asc())
        .limit(k)
    )


def more_like_this_sql(
    query_docid: int,
    k: int = 10,
    table: str = "documents",
    docid: str = "doc_id",
    text: str = "text",
) -> str:
    """DuckDB mirror of :func:`more_like_this`."""
    return f"""
WITH toks AS (
  SELECT {docid} AS docid,
         list_filter(string_split_regex(lower({text}), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM {table}
),
flat AS (SELECT docid, t.term FROM toks, unnest(toks.toks) AS t(term)),
tf AS (SELECT docid, term, count(*) AS tf FROM flat GROUP BY docid, term),
dfreq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM {table}),
w AS (
  SELECT docid, term,
         (tf * floor(ln(n.n::DOUBLE / dfc) * {MLT_IDF_QUANT})::BIGINT)::BIGINT
           AS w
  FROM tf JOIN dfreq USING (term), n
),
wp AS (SELECT * FROM w WHERE w > 0),
norms AS (SELECT docid, sum(w * w)::BIGINT AS n2 FROM wp GROUP BY docid),
qv AS (SELECT term, w AS qw FROM wp WHERE docid = {query_docid}),
qn AS (SELECT n2 AS qn2 FROM norms WHERE docid = {query_docid}),
dots AS (
  SELECT wp.docid, sum(wp.w * qv.qw)::BIGINT AS dot
  FROM wp JOIN qv USING (term)
  WHERE wp.docid <> {query_docid}
  GROUP BY wp.docid
)
SELECT d.docid,
       round(d.dot / (sqrt(n2.n2) * sqrt(qn.qn2)), 6) AS cos
FROM dots d JOIN norms n2 ON n2.docid = d.docid, qn
ORDER BY cos DESC, d.docid ASC LIMIT {k}
"""
