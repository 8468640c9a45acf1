"""Tombstone-masked querying (topk_with_deletes): the load-bearing claim
is REBUILD EQUIVALENCE — querying the original index with a tombstone set
must produce exactly what a from-scratch index over the surviving
documents produces (same urls, same scores to 1e-9), because the live
path recomputes df/n_docs/avgdl over survivors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import gen_pages_df
from search_engine_spark.operators.indexer import build_index
from search_engine_spark.operators import query as Q

N_DOCS = 240
QUERY = "demosthenes prince solemn affair"


@pytest.fixture(scope="module")
def pages(spark):
    return gen_pages_df(spark, N_DOCS, partitions=4).localCheckpoint()


@pytest.fixture(scope="module")
def full_index(spark, tmp_path_factory, pages):
    out = str(tmp_path_factory.mktemp("idx") / "full")
    build_index(pages, out, lang="en", stem=True, partitions=4)
    return Q.load_index(spark, out)


def _url_scores(idx, result_df):
    """docid→url mapping via the index's own docs table (rebuilds assign
    different dense docids, so parity is stated over urls)."""
    rows = (
        result_df.join(idx.docs.select("docid", "url"), "docid")
        .select("url", "score")
        .collect()
    )
    return {r["url"]: r["score"] for r in rows}


def test_deletes_equal_rebuild(spark, tmp_path_factory, pages, full_index):
    # tombstone ~1/3 of the corpus by url hash (docid-space agnostic)
    dead_urls = pages.filter(F.xxhash64("url") % 3 == 0).select("url")
    dele = (
        full_index.docs.join(dead_urls, "url").select("docid")
    )
    got = _url_scores(
        full_index,
        Q.topk_with_deletes(full_index, dele, QUERY, k=30),
    )

    out = str(tmp_path_factory.mktemp("idx") / "survivors")
    build_index(
        pages.join(dead_urls, "url", "left_anti"),
        out, lang="en", stem=True, partitions=4,
    )
    rebuilt = Q.load_index(spark, out)
    want = _url_scores(rebuilt, Q.topk_distributed(rebuilt, QUERY, k=30))

    assert set(got) == set(want) and len(got) == 30
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-9)


def test_deletes_empty_set_is_plain_query(spark, full_index):
    dele = spark.createDataFrame([], "docid long")
    got = [
        tuple(r)
        for r in Q.topk_with_deletes(full_index, dele, QUERY, k=20).collect()
    ]
    want = [
        tuple(r)
        for r in Q.topk_distributed(full_index, QUERY, k=20).collect()
    ]
    assert got == want


def test_deletes_can_eliminate_a_term_entirely(spark, full_index):
    """Deleting every doc containing one query term must behave exactly
    like the term never existed (its idf contribution vanishes)."""
    # all docs containing 'demosthenes'
    holders = Q.topk_distributed(full_index, "demosthenes", k=10**6).select(
        "docid"
    )
    n_holders = holders.count()
    assert n_holders > 0
    got = [
        tuple(r)
        for r in Q.topk_with_deletes(
            full_index, holders, QUERY, k=15
        ).collect()
    ]
    assert got  # other terms still return hits
    assert not [d for d, _ in got if d in {r["docid"] for r in holders.collect()}]
