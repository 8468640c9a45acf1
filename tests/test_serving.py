"""Serving-tier re-rankers: snippets / recency fusion / host collapse /
PMI co-occurrence / weighted sampling — edge-case behavior plus crafted-
corpus DuckDB parity (window clamping at both ends is where the Spark
slice() and DuckDB list-slicing semantics could diverge; pin them)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import serving as SV
from search_engine_spark.operators import textstats as TS
from search_engine_spark.operators.sampling import (
    SCALE,
    weighted_sample,
    weighted_sample_sql,
)
from search_engine_spark.operators.text_ops import bm25_topk


CRAFT = [
    # term at position 1 → window start clamps to 1
    (0, "needle aaa bbb ccc ddd eee fff ggg hhh iii jjj kkk lll mmm"),
    # term mid-doc → full (before=3, width=12) window
    (1, "x1 x2 x3 x4 x5 needle y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"),
    # term at the very end → window truncates
    (2, "z1 z2 z3 z4 z5 z6 z7 needle"),
    # no query term → excluded entirely
    (3, "nothing to see here at all"),
    # both query terms; FIRST occurrence anchors; both get highlighted
    (4, "a1 thread a2 needle a3 a4 a5 a6 a7 a8 a9 a10"),
]


@pytest.fixture(scope="module")
def craft_docs(spark):
    return spark.createDataFrame(CRAFT, "doc_id long, text string")


def test_snippets_window_clamps_and_highlights(spark, craft_docs):
    out = {
        r["docid"]: r["snippet"]
        for r in SV.snippets(
            craft_docs, "needle thread", before=3, width=12
        ).collect()
    }
    # doc 3 has no query term → absent
    assert set(out) == {0, 1, 2, 4}
    # clamp at start: window begins at token 1
    assert out[0].startswith("<b>needle</b> aaa bbb")
    # mid-doc: 3 tokens of left context, 12 tokens total
    assert out[1] == "x3 x4 x5 <b>needle</b> y1 y2 y3 y4 y5 y6 y7 y8"
    # end-of-doc: truncated window, still highlighted
    assert out[2] == "z5 z6 z7 <b>needle</b>"
    # first occurrence (thread @2) anchors; both terms marked in-window
    assert out[4].startswith("a1 <b>thread</b> a2 <b>needle</b>")


def test_snippets_empty_query_is_empty(spark, craft_docs):
    assert SV.snippets(craft_docs, "the of and").count() == 0  # stopwords


def test_snippets_crafted_duckdb_parity(spark, craft_docs, ddb):
    sdf = SV.snippets(craft_docs, "needle thread").orderBy("docid")
    con = ddb.cursor()
    con.register(
        "craft_docs", pd.DataFrame(CRAFT, columns=["doc_id", "text"])
    )
    sql = SV.snippets_sql("needle thread", table="craft_docs")
    drows = con.sql(sql + " ORDER BY docid").fetchall()
    assert [tuple(r) for r in sdf.collect()] == drows


def test_recency_rerank_reorders_by_age(spark):
    hits = spark.createDataFrame(
        [(1, 10.0), (2, 9.0)], "docid long, score double"
    )
    # doc 1 is 300 days old, doc 2 fresh → doc 2 must outrank doc 1:
    # 10/(1+300/30) = 0.909…  <  9/(1+0/30) = 9.0
    ages = spark.createDataFrame(
        [(1, 300 * 86400), (2, 0)], "docid long, age_secs long"
    )
    rows = SV.recency_rerank(hits, ages, k=2).collect()
    assert [r["docid"] for r in rows] == [2, 1]
    assert rows[0]["fscore"] == 9.0
    assert rows[1]["fscore"] == round(10.0 / 11.0, 6)


def test_host_collapse_keeps_best_per_host(spark):
    hits = spark.createDataFrame(
        [
            (1, "a.com", 9.0),
            (2, "a.com", 8.0),  # same host, lower score → dropped
            (3, "b.com", 7.0),
            (4, "c.com", 6.5),
            (5, "b.com", 7.0),  # tie on score → docid 3 wins for b.com
        ],
        "docid long, host string, score double",
    )
    rows = SV.host_collapse(hits, k=10).collect()
    assert [(r["docid"], r["host"]) for r in rows] == [
        (1, "a.com"), (3, "b.com"), (4, "c.com")
    ]


def test_cooccur_pmi_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "seed alpha beta"),
            (1, "seed alpha"),
            (2, "alpha beta"),
            (3, "seed gamma"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["term"]: r
        for r in TS.cooccur_pmi(docs, "seed", min_df=1, k=10).collect()
    }
    # N=4, c_seed=3; alpha: df=3, copair=2 → pmi = ln(4*2/(3*3))
    assert rows["alpha"]["copair"] == 2 and rows["alpha"]["df"] == 3
    assert rows["alpha"]["pmi"] == round(math.log(8.0 / 9.0), 6)
    # gamma: df=1, copair=1 → ln(4/3); beta: df=2, copair=1 → ln(4/6)
    assert rows["gamma"]["pmi"] == round(math.log(4.0 / 3.0), 6)
    assert rows["beta"]["pmi"] == round(math.log(4.0 / 6.0), 6)


def test_cooccur_pmi_never_returns_seed_or_rare(spark):
    docs = spark.createDataFrame(
        [(0, "seed once seed common"), (1, "common seed")],
        "doc_id long, text string",
    )
    terms = {
        r["term"]
        for r in TS.cooccur_pmi(docs, "seed", min_df=2, k=10).collect()
    }
    assert "seed" not in terms  # seed itself excluded
    assert "once" not in terms  # df=1 < min_df=2
    assert terms == {"common"}


def test_weighted_sample_extremes_and_monotonicity(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    assert weighted_sample(df, "doc_id", F.lit(0.0)).count() == 0
    assert weighted_sample(df, "doc_id", F.lit(1.0)).count() == 500
    # monotone: a higher weight keeps a superset of a lower weight
    lo = {
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", F.lit(0.2)).collect()
    }
    hi = {
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", F.lit(0.6)).collect()
    }
    assert lo <= hi
    assert len(lo) == pytest.approx(100, abs=40)
    assert len(hi) == pytest.approx(300, abs=60)


def test_weighted_sample_sql_parity_on_varying_weights(spark, ddb):
    rows = [(i, (i * 37) % 101) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = weighted_sample(
        df, "doc_id", F.col("w") / F.lit(100.0)
    ).orderBy("doc_id")
    con = ddb.cursor()
    con.register("wdocs", pd.DataFrame(rows, columns=["doc_id", "w"]))
    drows = con.sql(
        "SELECT doc_id, w FROM wdocs WHERE "
        + weighted_sample_sql("doc_id", "w / 100.0")
        + " ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in kept.collect()] == drows


def test_serving_rerankers_compose_on_gate_corpus(spark):
    """End-to-end shape check on real testdata: pool → collapse → snippet
    join keeps the serving contract (≤k rows, every host unique)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pool = bm25_topk(docs, "spark table join", k=50)
    hosts = docs.select(
        F.col("doc_id").alias("docid"),
        F.concat(
            F.lit("h"), (F.col("doc_id") % 7).cast("string")
        ).alias("host"),
    )
    hits = pool.join(hosts, "docid").select("docid", "host", "score")
    out = SV.host_collapse(hits, k=5).collect()
    assert len(out) == 5
    assert len({r["host"] for r in out}) == 5


def test_page_after_cursor_semantics_with_ties(spark):
    hits = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 4.0), (5, 3.0)],
        "docid long, score double",
    )
    # cursor at (5.0, docid=2): tied docs AFTER the cursor docid come
    # first, then lower scores — doc 1 (tied, earlier docid) must NOT
    # reappear
    rows = SV.page_after(hits, 5.0, 2, k=3).collect()
    assert [r["docid"] for r in rows] == [3, 4, 5]


def test_page_after_pages_partition_the_serp(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pool = bm25_topk(docs, "spark table join", k=30)
    all_rows = pool.collect()
    page1 = all_rows[:10]
    cur = page1[-1]
    page2 = SV.page_after(
        pool, float(cur["score"]), int(cur["docid"]), k=10
    ).collect()
    assert [r["docid"] for r in page2] == [
        r["docid"] for r in all_rows[10:20]
    ]


def test_proximity_rerank_prefers_adjacent_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta filler filler filler"),      # adjacent: span 1
            (2, "alpha filler filler filler beta"),      # span 4
            (3, "alpha filler filler filler filler"),    # beta absent
        ],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (3, 2.5)], "docid long, score double"
    )
    rows = SV.proximity_rerank(docs, hits, "alpha", "beta", k=3).collect()
    by_id = {r["docid"]: r for r in rows}
    assert by_id[1]["minspan"] == 1 and by_id[1]["pscore"] == 3.0
    assert by_id[2]["minspan"] == 4 and by_id[2]["pscore"] == 2.4
    # doc 3 has only one term: no bonus, keeps its BM25 score
    assert by_id[3]["minspan"] is None and by_id[3]["pscore"] == 2.5
    assert [r["docid"] for r in rows] == [1, 3, 2]


def test_facet_counts_per_facet_topk(spark):
    hits = spark.createDataFrame(
        [
            (1, "a.com", "en"),
            (2, "a.com", "en"),
            (3, "b.com", "en"),
            (4, "b.com", "de"),
        ],
        "docid long, host string, lang string",
    )
    rows = SV.facet_counts(hits, facets=["host", "lang"], k=1).collect()
    got = {(r["facet"], r["value"], r["n"]) for r in rows}
    # k=1 per facet; ties break by value asc → a.com over b.com
    assert got == {("host", "a.com", 2), ("lang", "en", 3)}


def test_domain_cap_two_level_equals_single_window(spark):
    """The salted two-level cap must be row-identical to the naive single
    global window, including on a skewed domain (one domain with 10x the
    rows of the others)."""
    from pyspark.sql import Window
    from search_engine_spark.functions.hashing import md5_int
    from search_engine_spark.operators.urls import domain_cap, registered_domain

    rows = [(i, f"https://big.example.com/p{i}") for i in range(400)]
    rows += [(1000 + i, f"https://s{i % 5}.other.org/p{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, url string")

    got = sorted(
        (r["doc_id"], r["domain"])
        for r in domain_cap(df, cap=15).collect()
    )

    h = md5_int(F.col("doc_id").cast("string"), seed="domaincap")
    w = Window.partitionBy("domain").orderBy(h.asc(), F.col("doc_id").asc())
    naive = (
        df.withColumn("domain", registered_domain("url"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
    )
    want = sorted((r["doc_id"], r["domain"]) for r in naive.collect())
    assert got == want
    # the skewed domain is actually capped
    assert sum(1 for _, d in got if d == "example.com") == 15
    assert sum(1 for _, d in got if d == "other.org") == 15


def test_crawl_delta_states(spark):
    from search_engine_spark.operators.urls import crawl_delta

    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "B"), ("u4", "d")], "url string, fp string"
    )
    got = {(r["url"], r["change"]) for r in crawl_delta(old, new).collect()}
    assert got == {("u2", "changed"), ("u3", "removed"), ("u4", "added")}
    full = {
        (r["url"], r["change"])
        for r in crawl_delta(old, new, include_unchanged=True).collect()
    }
    assert ("u1", "unchanged") in full and len(full) == 4


def test_micro_str_three_engine_parity(spark, ddb):
    """The suite rows carry 6-dp floats as round(x*1e6) integer strings;
    that is only hash-stable if Spark, DuckDB, and Python produce the
    SAME integer for every value — including negatives (PMI) and values
    whose 6-dp image lands near the 1e6 grid. 20k seeded values, three
    vectorized evaluations."""
    import random

    import __spark_entry__ as E

    rng = random.Random(1729)
    vals = [round(rng.uniform(-50, 50), 6) for _ in range(20000)]
    # adversarial .5-boundary neighborhoods at the 1e6 grid
    vals += [x + eps for x in (0.0000005, -0.0000005, 1.9999995)
             for eps in (0.0, 1e-12, -1e-12)]
    vals = [round(v, 6) for v in vals]

    py = [str(int(round(v * 1000000.0))) for v in vals]

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v double")
    got_spark = [
        r["s"] for r in df.select(
            "i", E._micro_str("v").alias("s")
        ).orderBy("i").collect()
    ]

    con = ddb.cursor()
    import pandas as pd
    con.register("mvals", pd.DataFrame({"i": range(len(vals)), "v": vals}))
    got_duck = [
        r[0] for r in con.sql(
            "SELECT CAST(round(v * 1000000.0) AS BIGINT)::VARCHAR "
            "FROM mvals ORDER BY i"
        ).fetchall()
    ]

    assert got_spark == got_duck
    # Python's round() banker-rounds ties while the engines round ties
    # away from zero — upstream 6-dp rounding keeps true ties off the
    # grid, so all three agree on real data; allow the crafted
    # .5-boundary rows to differ from PYTHON only
    diff_py = [i for i, (a, b) in enumerate(zip(got_spark, py)) if a != b]
    assert all(i >= 20000 for i in diff_py)
