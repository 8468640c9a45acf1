"""Count-Min Sketch term statistics (Cormode & Muthukrishnan 2005).

The streaming-sketch family the engine's exact aggregations replace at
query time but cannot replace at INGEST time: a 100-TB firehose cannot
afford a full term aggregation per monitoring tick, while a d x w counter
grid (here 4 x 256 by default) is a fixed-size mergeable state whose
per-row cost is d hash-bucket increments. This module builds the sketch
RELATIONALLY — counters are rows, not driver arrays — so the same code is
the batch mirror of the streaming update and every stage stays a keyed
aggregation with map-side combine.

Hashing uses the Kirsch-Mitzenmacher two-hash family
(functions/hashing.py): d bucket functions ``(h1 + j*h2) % width`` from
ONE md5 digest per term, deterministic and identical in Spark, DuckDB,
and Python — which is what makes even the sketch ESTIMATES
oracle-checkable, not just the exact counts.

CMS guarantees: estimate >= exact always (counters only over-count on
collisions); with width w and depth d, the over-count exceeds
2N/w with probability at most 2^-d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from search_engine_spark.functions.hashing import (
    md5_two_hash_cols,
    md5_two_hash_sql,
)
from search_engine_spark.operators.text_ops import tokens_col

CMS_DEPTH = 4
CMS_WIDTH = 256


def _term_counts(df: DataFrame, docid: str, text: str) -> DataFrame:
    return (
        df.select(F.explode(tokens_col(text)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_counters(
    df: DataFrame,
    docid: str = "doc_id",
    text: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, c) — the d x w counter grid as rows. Built from the
    per-term counts (one keyed agg with map-side combine), then d
    bucket-keyed partial sums; the grid is a mergeable monoid, so
    incremental ingest is a union + re-agg of grids."""
    h0, h1 = md5_two_hash_cols(F.col("term"), 2)[:2]
    tf = _term_counts(df, docid, text).select(
        "term", "c", h0.alias("_h1"), (h1 - h0).alias("_h2")
    )
    exploded = tf.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        ((F.col("_h1") + F.col("row") * F.col("_h2")) % width).alias(
            "bucket"
        ),
        "c",
    )
    return exploded.groupBy("row", "bucket").agg(F.sum("c").alias("c"))


def cms_heavy_hitters(
    df: DataFrame,
    k: int = 25,
    docid: str = "doc_id",
    text: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(term, est, exact, overcount) — top-``k`` terms by CMS estimate
    (min over the d counters each term hashes into), with the exact count
    alongside: ``overcount = est - exact >= 0`` ALWAYS (a negative value
    would mean a broken sketch — pytest-pinned). Ties broken by term so
    the row set is deterministic.

    At scale the probe side joins the counter grid on (row, bucket) —
    the grid is d*w rows, broadcast regardless of corpus size."""
    grid = F.broadcast(cms_counters(df, docid, text, depth, width))
    h0, h1 = md5_two_hash_cols(F.col("term"), 2)[:2]
    tf = _term_counts(df, docid, text).select(
        "term", F.col("c").alias("exact"),
        h0.alias("_h1"), (h1 - h0).alias("_h2"),
    )
    probes = tf.select(
        "term", "exact", "_h1", "_h2",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        "term", "exact", "row",
        ((F.col("_h1") + F.col("row") * F.col("_h2")) % width).alias(
            "bucket"
        ),
    )
    est = (
        probes.join(grid, ["row", "bucket"])
        .groupBy("term", "exact")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.select(
            "term", "est", "exact", (F.col("est") - F.col("exact")).alias(
                "overcount"
            )
        )
        .orderBy(F.col("est").desc(), F.col("term").asc())
        .limit(k)
    )


def cms_heavy_hitters_sql(
    k: int = 25,
    table: str = "documents",
    docid: str = "doc_id",
    text: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB mirror of :func:`cms_heavy_hitters`."""
    h1, h2 = md5_two_hash_sql("term")
    return f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower({text}), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM {table}
),
tf AS (
  SELECT t.term, count(*) AS c, {h1} AS h1v, {h2} AS h2v
  FROM toks, unnest(toks.toks) AS t(term)
  GROUP BY t.term
),
probes AS (
  SELECT term, c AS exact, g.j AS row,
         (h1v + g.j * h2v) % {width} AS bucket
  FROM tf, unnest(generate_series(0, {depth - 1})) AS g(j)
),
grid AS (
  SELECT row, bucket, sum(exact)::BIGINT AS c
  FROM probes GROUP BY row, bucket
),
est AS (
  SELECT p.term, p.exact, min(grid.c) AS est
  FROM probes p JOIN grid USING (row, bucket)
  GROUP BY p.term, p.exact
)
SELECT term, est::BIGINT AS est, exact::BIGINT AS exact,
       (est - exact)::BIGINT AS overcount
FROM est
ORDER BY est DESC, term ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Bloom filter as a relational bit-position set
# ---------------------------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_HASHES = 4


def bloom_build(
    keys: DataFrame,
    key: str = "term",
    bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(pos) — the set bit positions of a Bloom filter over ``keys``
    (Bloom 1970), as rows: the relational form is mergeable (union +
    distinct), broadcastable (<= ``bits`` rows regardless of key count),
    and — because positions come from the md5 two-hash family — exactly
    reproducible in any engine. The classic join-pruning side structure:
    broadcast the positions, semi-join probes before an expensive join."""
    h0, h1 = md5_two_hash_cols(F.col("_k"), 2)[:2]
    base = keys.select(F.col(key).alias("_k")).distinct().select(
        "_k", h0.alias("_h1"), (h1 - h0).alias("_h2")
    )
    return (
        base.select(
            F.explode(
                F.sequence(F.lit(0), F.lit(num_hashes - 1))
            ).alias("j"),
            "_h1", "_h2",
        )
        .select(((F.col("_h1") + F.col("j") * F.col("_h2")) % bits)
                .alias("pos"))
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    filter_bits: DataFrame,
    truth: DataFrame | None = None,
    key: str = "term",
    bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(term, maybe_present[, actually_present, false_positive]) — probe
    membership: a key "maybe" belongs iff ALL its ``num_hashes`` bit
    positions are set (no false negatives, by construction). With
    ``truth`` (the original key relation) the output also carries the
    ground truth and the false-positive flag — the accounting that sizes
    bits/hashes for a target FP rate.

    Shape: the filter is broadcast (<= bits rows); each probe explodes to
    ``num_hashes`` membership lookups and re-aggregates — no shuffle of
    the probe side beyond its own key agg."""
    fb = F.broadcast(filter_bits)
    h0, h1 = md5_two_hash_cols(F.col("term"), 2)[:2]
    pr = probes.select(F.col(key).alias("term")).distinct().select(
        "term", h0.alias("_h1"), (h1 - h0).alias("_h2")
    )
    hit_counts = (
        pr.select(
            "term",
            F.explode(
                F.sequence(F.lit(0), F.lit(num_hashes - 1))
            ).alias("j"),
            "_h1", "_h2",
        )
        .select(
            "term",
            ((F.col("_h1") + F.col("j") * F.col("_h2")) % bits).alias("pos"),
        )
        .join(fb, "pos", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    out = (
        pr.select("term")
        .join(hit_counts, "term", "left")
        .select(
            "term",
            (F.coalesce("_hits", F.lit(0)) == num_hashes).alias(
                "maybe_present"
            ),
        )
    )
    if truth is None:
        return out
    t = truth.select(F.col(key).alias("term")).distinct().withColumn(
        "actually_present", F.lit(True)
    )
    return out.join(t, "term", "left").select(
        "term",
        "maybe_present",
        F.coalesce("actually_present", F.lit(False)).alias(
            "actually_present"
        ),
        (
            F.col("maybe_present")
            & ~F.coalesce("actually_present", F.lit(False))
        ).alias("false_positive"),
    )


def bloom_probe_sql(
    keys_sql: str,
    probes_sql: str,
    bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> str:
    """DuckDB mirror of bloom_build + bloom_probe(truth=keys) over CTE
    bodies each yielding a ``term`` column."""
    h1, h2 = md5_two_hash_sql("term")
    return f"""
WITH keys AS MATERIALIZED (SELECT DISTINCT term FROM ({keys_sql})),
kb AS (SELECT term, {h1} AS h1v, {h2} AS h2v FROM keys),
fbits AS MATERIALIZED (
  SELECT DISTINCT (h1v + g.j * h2v) % {bits} AS pos
  FROM kb, unnest(generate_series(0, {num_hashes - 1})) AS g(j)
),
probes AS MATERIALIZED (SELECT DISTINCT term FROM ({probes_sql})),
pb AS (SELECT term, {h1} AS h1v, {h2} AS h2v FROM probes),
hits AS (
  SELECT pb.term, count(*) AS n_hits
  FROM pb, unnest(generate_series(0, {num_hashes - 1})) AS g(j)
  WHERE (pb.h1v + g.j * pb.h2v) % {bits} IN (SELECT pos FROM fbits)
  GROUP BY pb.term
)
SELECT p.term,
       coalesce(h.n_hits, 0) = {num_hashes} AS maybe_present,
       (k.term IS NOT NULL) AS actually_present,
       (coalesce(h.n_hits, 0) = {num_hashes} AND k.term IS NULL)
         AS false_positive
FROM probes p
LEFT JOIN hits h ON h.term = p.term
LEFT JOIN keys k ON k.term = p.term
"""
