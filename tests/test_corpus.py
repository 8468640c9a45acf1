"""Corpus generator determinism + FIXTURES.md property checks."""

from __future__ import annotations

import numpy as np

from search_engine_spark.corpus import (
    PLANTED_PHRASES,
    STOPWORDS,
    VOCAB,
    _sample_word,
    _sample_words_vec,
    gen_pages_pandas,
    page_record,
)
from search_engine_spark.oracle.text import extract_text, simple_tokens


def test_vectorized_sampling_matches_scalar():
    for docid in [0, 7, 12345]:
        vec = _sample_words_vec(docid, np.arange(64, dtype=np.uint64))
        assert vec == [_sample_word(docid, i) for i in range(64)]


def test_page_record_deterministic():
    a, b = page_record(17), page_record(17)
    assert a == b


def test_text_is_pinned_extraction_of_html():
    for d in [0, 1, 50, 99, 123]:
        r = page_record(d)
        assert r["text"] == extract_text(r["html"])


def test_duplicates_and_urls():
    r98, r99 = page_record(98), page_record(99)
    assert r98["html"] == r99["html"]
    assert r98["url"] != r99["url"]


def test_properties():
    pdf = gen_pages_pandas(300)
    assert pdf["url"].is_unique
    assert set(pdf["lang"]) <= {"en", "de"}
    # stop-word head dominates (skew present)
    toks = simple_tokens(" ".join(pdf["text"][:100]))
    stop_frac = sum(t in STOPWORDS for t in toks) / len(toks)
    assert stop_frac > 0.25
    # planted phrases occur
    joined = " ".join(pdf["text"])
    assert any(ph in joined for ph in PLANTED_PHRASES)
    assert len(VOCAB) == 10_000


def test_distributed_generation_matches_local(spark):
    from search_engine_spark.corpus import gen_pages_df

    sdf = gen_pages_df(spark, 60, partitions=4).orderBy("url").toPandas()
    pdf = gen_pages_pandas(60).sort_values("url").reset_index(drop=True)
    assert list(sdf["url"]) == list(pdf["url"])
    assert list(sdf["text"]) == list(pdf["text"])
    assert [bytes(x) for x in sdf["html"]] == [bytes(x) for x in pdf["html"]]
