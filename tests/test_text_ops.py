"""text_ops (JVM-side DataFrame text operators) vs the DuckDB SQL oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.operators.text_ops import (
    bm25_topk,
    bm25_topk_sql_oracle,
    document_frequencies,
    query_terms,
    term_frequencies,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _cmp(spark_df, duck_df, keys):
    a = spark_df.toPandas().sort_values(keys).reset_index(drop=True)
    b = duck_df.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_query_terms():
    assert query_terms("The Quick, quick FOX!") == ["quick", "fox"]
    assert query_terms("the and of") == []


def test_term_frequencies_match_duckdb(documents, ddb):
    got = term_frequencies(documents)
    want = ddb.execute(
        """
        SELECT doc_id AS docid, t.term, count(*) AS tf
        FROM documents,
             LATERAL unnest(string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '
             )) AS t(term)
        WHERE t.term <> '' GROUP BY 1, 2
        """
    ).fetchdf()
    _cmp(got, want, ["docid", "term"])


def test_document_frequencies_match_duckdb(documents, ddb):
    got = document_frequencies(documents)
    want = ddb.execute(
        """
        WITH toks AS (
          SELECT doc_id AS docid, t.term
          FROM documents,
               LATERAL unnest(string_split_regex(
                 trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '
               )) AS t(term)
          WHERE t.term <> ''
        )
        SELECT term, count(DISTINCT docid) AS df, count(*) AS cf
        FROM toks GROUP BY term
        """
    ).fetchdf()
    _cmp(got, want, ["term"])


@pytest.mark.parametrize(
    "q", ["data processing pipeline", "machine learning", "the weather"]
)
def test_bm25_topk_matches_duckdb(documents, ddb, q):
    got = bm25_topk(documents, q, k=50).toPandas()
    want = ddb.execute(bm25_topk_sql_oracle(q, k=50)).fetchdf()
    assert list(got["docid"]) == list(want["docid"])
    assert list(got["score"]) == list(want["score"])


def test_bm25_empty_query(documents):
    assert bm25_topk(documents, "the and of", k=10).count() == 0
