"""Ranking-quality evaluation: nDCG@k, MRR, recall@k over (results, qrels).

The offline evaluation harness every search stack runs next to its
serving tier (TREC methodology): system rankings joined against graded
relevance judgments, reduced to per-query metrics.

Exactness contract: the rank discounts ``1/log2(rank+1)`` are
IRRATIONAL, and per-group float summation order differs between engines —
so the discount table is precomputed DRIVER-SIDE in Python, quantized to
integer micro-units, and injected into both engines as literals (the same
move as the LM scorer's micro-nats). Gains ``2^rel - 1`` are integers, so
every DCG/IDCG accumulation is exact BIGINT arithmetic; the single
float division per metric happens once at the end on identical operands.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

EVAL_QUANT = 1_000_000


def _discount_micro(rank: int) -> int:
    return round(EVAL_QUANT / math.log2(rank + 1))


def search_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    qid: str = "qid",
    docid: str = "docid",
    rank: str = "rank",
    rel: str = "rel",
) -> DataFrame:
    """(qid, ndcg, mrr, recall, n_rel) — per-query nDCG@k, reciprocal
    rank of the first relevant hit within k, and recall@k.

    ``results``: (qid, docid, rank) with rank 1-based; ``qrels``:
    (qid, docid, rel) graded ``rel >= 0`` (rows with rel 0 are allowed
    and count as non-relevant). Queries with no relevant qrels are
    excluded (their metrics are undefined).

    Shape: one co-partitioned (qid, docid) join + two qid-keyed aggs +
    one qid-keyed window for the ideal ranking — everything hash
    partitions on qid."""
    disc = F.create_map(
        *[
            x
            for r in range(1, k + 1)
            for x in (F.lit(r), F.lit(_discount_micro(r)))
        ]
    )
    res = results.select(
        F.col(qid).alias("qid"), F.col(docid).alias("docid"),
        F.col(rank).alias("rank"),
    ).filter(F.col("rank") <= k)
    qr = qrels.select(
        F.col(qid).alias("qid"), F.col(docid).alias("docid"),
        F.col(rel).alias("rel"),
    )
    relevant = qr.filter(F.col("rel") > 0)
    n_rel = relevant.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_rel")
    )

    gain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)).cast("long")
    hits = res.join(relevant, ["qid", "docid"])
    dcg = hits.groupBy("qid").agg(
        F.sum(gain * disc[F.col("rank")]).alias("dcg_micro"),
        F.min(F.col("rank")).alias("first_rank"),
        F.count(F.lit(1)).alias("n_hits"),
    )

    w = Window.partitionBy("qid").orderBy(
        F.col("rel").desc(), F.col("docid").asc()
    )
    ideal = (
        relevant.withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= k)
        .groupBy("qid")
        .agg(F.sum(gain * disc[F.col("irank")]).alias("idcg_micro"))
    )
    return (
        n_rel.join(ideal, "qid")
        .join(dcg, "qid", "left")
        .select(
            "qid",
            F.round(
                F.coalesce(F.col("dcg_micro"), F.lit(0))
                / F.col("idcg_micro").cast("double"),
                6,
            ).alias("ndcg"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("first_rank"), F.lit(0.0)
                ),
                6,
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0))
                / F.col("n_rel").cast("double"),
                6,
            ).alias("recall"),
            F.col("n_rel").cast("long").alias("n_rel"),
        )
    )


def search_eval_sql(
    results_sql: str, qrels_sql: str, k: int = 10
) -> str:
    """DuckDB mirror of :func:`search_eval` over CTE bodies yielding
    (qid, docid, rank) and (qid, docid, rel)."""
    disc_cases = " ".join(
        f"WHEN {r} THEN {_discount_micro(r)}" for r in range(1, k + 1)
    )
    return f"""
WITH res0 AS ({results_sql}),
res AS (SELECT qid, docid, rank FROM res0 WHERE rank <= {k}),
qr AS ({qrels_sql}),
relevant AS (SELECT qid, docid, rel FROM qr WHERE rel > 0),
n_rel AS (SELECT qid, count(*) AS n_rel FROM relevant GROUP BY qid),
hits AS (
  SELECT r.qid, (power(2.0, v.rel) - 1.0)::BIGINT AS gain, r.rank
  FROM res r JOIN relevant v ON v.qid = r.qid AND v.docid = r.docid
),
dcg AS (
  SELECT qid,
         sum(gain * (CASE rank {disc_cases} END))::BIGINT AS dcg_micro,
         min(rank) AS first_rank,
         count(*) AS n_hits
  FROM hits GROUP BY qid
),
ideal0 AS (
  SELECT qid, (power(2.0, rel) - 1.0)::BIGINT AS gain,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rel DESC, docid ASC) AS irank
  FROM relevant
),
ideal AS (
  SELECT qid,
         sum(gain * (CASE irank {disc_cases} END))::BIGINT AS idcg_micro
  FROM ideal0 WHERE irank <= {k} GROUP BY qid
)
SELECT n.qid,
       round(coalesce(d.dcg_micro, 0) / i.idcg_micro::DOUBLE, 6) AS ndcg,
       round(coalesce(1.0 / d.first_rank, 0.0), 6) AS mrr,
       round(coalesce(d.n_hits, 0) / n.n_rel::DOUBLE, 6) AS recall,
       n.n_rel::BIGINT AS n_rel
FROM n_rel n JOIN ideal i USING (qid) LEFT JOIN dcg d USING (qid)
"""
