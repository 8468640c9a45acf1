"""Q5 heuristic boosts and Q8 rank fusion.

Reference parity targets: frontend/Master.java:375-601 (×50 url-substring
boost :437-441/:457-461, ×25 stemmed pass :478-589) and
jobs/IndexerProjectVersion1.java:307-328 (harmonic fusion
2·pr·s/(pr+s) of PageRank and the text score).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import pagerank as PR
from search_engine_spark.operators import text_ops as T
from search_engine_spark.oracle.bm25 import B, K1


def _bm25_part(tf, dl, avgdl, n_docs, df):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


DOCS = [
    # (doc_id, text, url)
    (1, "spark spark batch", "https://a.example/spark/1"),  # url hit
    (2, "spark batch row", "https://a.example/batch/2"),  # no url hit
    (3, "table row row", "https://a.example/row/3"),  # stem-pass term
    (4, "row batch line", "https://a.example/row/4"),  # no query term
]


def test_boosted_topk_hand_computed(spark):
    """×50 exactly when url contains the term; 'table' (porter→'tabl')
    picks up the additive ×25 stem-pass weight; doc 4 is pruned."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string, url string")
    out = T.boosted_topk(df, "spark table", k=10, url=F.col("url"))
    got = {r["docid"]: r["score"] for r in out.collect()}

    dls = {1: 3, 2: 3, 3: 3, 4: 3}
    avgdl, n = 3.0, 4
    exp = {
        1: 50.0 * _bm25_part(2, dls[1], avgdl, n, 2),
        2: 1.0 * _bm25_part(1, dls[2], avgdl, n, 2),
        3: (1.0 + 25.0) * _bm25_part(1, dls[3], avgdl, n, 1),
    }
    assert set(got) == {1, 2, 3}
    for d, s in exp.items():
        assert got[d] == pytest.approx(round(s, 6), abs=1e-6)
    # boost actually reorders: plain BM25 ranks doc 3 (rare term) first,
    # the url boost lifts doc 1 to the top
    order = [r["docid"] for r in out.collect()]
    assert order[0] == 1 and 3 in order


def test_boosted_topk_defaults_reduce_to_vacuous_url(spark):
    """With the default digit-only url no term can match: every multiplier
    collapses to 1 + stem_weight."""
    df = spark.createDataFrame(
        [(d, t) for d, t, _ in DOCS], "doc_id long, text string"
    )
    out = {r["docid"]: r["score"]
           for r in T.boosted_topk(df, "spark", k=10).collect()}
    plain = {r["docid"]: r["score"]
             for r in T.bm25_topk(df, "spark", k=10).collect()}
    assert out == plain  # stem('spark')=='spark' → no stem weight either


def test_rank_fusion_harmonic_mean(spark):
    """Fused score is exactly 2ab/(a+b) of the rounded inputs, tie-broken
    (score desc, docid asc), truncated to k."""
    scores = spark.createDataFrame(
        [(1, 4.0), (2, 1.0), (3, 2.5)], "docid long, score double"
    )
    ranks = spark.createDataFrame(
        [(1, 0.15), (2, 3.0), (3, 1.0), (9, 7.0)], "id long, rank double"
    )
    got = [(r["docid"], r["score"])
           for r in PR.rank_fusion(scores, ranks, k=2).collect()]
    exp = sorted(
        [
            (1, round(2 * 0.15 * 4.0 / 4.15, 6)),
            (2, round(2 * 3.0 * 1.0 / 4.0, 6)),
            (3, round(2 * 1.0 * 2.5 / 3.5, 6)),
        ],
        key=lambda t: (-t[1], t[0]),
    )[:2]
    assert got == exp  # doc 9 has no text match → absent


def test_rank_fusion_promotes_linked_doc(spark):
    """A doc outside the BM25 top-1 overtakes it when its PageRank is
    high enough — the reason fusion consumes the complete match set."""
    scores = spark.createDataFrame(
        [(1, 3.0), (2, 2.9)], "docid long, score double"
    )
    ranks = spark.createDataFrame(
        [(1, 0.2), (2, 5.0)], "id long, rank double"
    )
    top = PR.rank_fusion(scores, ranks, k=1).collect()[0]
    assert top["docid"] == 2
