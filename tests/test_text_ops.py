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


# ---------------------------------------------------------------------------
# More-Like-This (tf-idf term-space similarity; text_ops.more_like_this)
# ---------------------------------------------------------------------------


def test_more_like_this_ranks_shared_vocab(spark):
    import math

    from search_engine_spark.operators.text_ops import (
        MLT_IDF_QUANT,
        more_like_this,
    )

    rows = [
        (0, "spark shuffle join window"),
        (1, "spark shuffle join sort"),       # 3/4 terms shared with 0
        (2, "spark window"),                  # 2 shared
        (3, "totally unrelated words here"),  # 0 shared
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["docid"], r["cos"]) for r in more_like_this(df, 0, k=5).collect()]
    # doc 2 is a pure subset vector (short norm) so it outranks doc 1;
    # doc 3 shares nothing and is absent entirely
    assert [d for d, _ in got] == [2, 1]
    # hand-check doc 2's cosine from the quantized weights
    def w(term, n, dfc, tf=1):
        return tf * math.floor(math.log(n / dfc) * MLT_IDF_QUANT)

    w_spark, w_window = w("spark", 4, 3), w("window", 4, 2)
    w_join = w("join", 4, 2)
    w_shuffle = w("shuffle", 4, 2)
    dot = w_spark * w_spark + w_window * w_window
    n0 = math.sqrt(w_spark**2 + w_shuffle**2 + w_join**2 + w_window**2)
    n2 = math.sqrt(w_spark**2 + w_window**2)
    assert got[0] == (2, round(dot / (n0 * n2), 6))


def test_more_like_this_excludes_ubiquitous_terms(spark):
    from search_engine_spark.operators.text_ops import mlt_weights

    rows = [(i, f"common unique{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = {r["term"] for r in mlt_weights(df).collect()}
    assert "common" not in terms  # df == N -> idf 0 -> pruned
    assert "unique0" in terms
