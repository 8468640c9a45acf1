"""Pure-Python oracle: the pinned, versioned definition of the engine's text
semantics (extraction, tokenization, stemming, BM25 ranking).

The Spark engine must match these functions exactly — byte-identical extracted
text per url, identical token streams, rank-identical BM25 top-k. Tests in
tests/ compare the Spark path against this package.
"""

from search_engine_spark.oracle.porter import porter_stem
from search_engine_spark.oracle.text import (
    STOPWORDS,
    extract_text,
    tokenize,
    valid_word,
)
from search_engine_spark.oracle.bm25 import OracleIndex, bm25_idf

__all__ = [
    "porter_stem",
    "extract_text",
    "tokenize",
    "valid_word",
    "STOPWORDS",
    "OracleIndex",
    "bm25_idf",
]
