"""BPE trainer/encoder parity (operators/bpe.py).

The bpe_vocab / bpe_encoded gate rows are rows-only (iterative global
argmax is not SQL-expressible), so THIS module is their value-level
gate: the guarded driver loop, the distributed one-shuffle-per-round
loop, and an independent naive recount reference must produce identical
merge tables; the JVM merge fold must equal the Python scan; encoding
by lowest-rank-present must equal replaying merges in rank order.
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.bpe import (
    _merge_fold_col,
    _train_on_dict,
    bpe_encode,
    bpe_train,
    bpe_train_distributed,
    encode_word,
    merge_word,
    word_counts,
)


def _naive_train(words, num_merges, min_pair_freq=2):
    """Independent reference: full per-position recount every round,
    (count DESC, pair ASC) argmax, greedy left-to-right application."""
    syms = {i: list(w) for i, (w, _) in enumerate(words)}
    cnts = {i: c for i, (_, c) in enumerate(words)}
    merges = []
    for rank in range(num_merges):
        pc = Counter()
        for i, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += cnts[i]
        if not pc:
            break
        (left, right), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_freq:
            break
        merges.append((rank, left, right, left + right, c))
        for i in syms:
            syms[i] = merge_word(syms[i], left, right)
    return merges


def _rand_words(seed, n_vocab=250, k=4000, alpha="abcde"):
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        for _ in range(n_vocab)
    ]
    return sorted(Counter(rng.choices(vocab, k=k)).items()), vocab


def _rand_docs(spark, seed, n_docs=50, words_per_doc=25):
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 7)))
        for _ in range(100)
    ]
    rows = [
        (i, " ".join(rng.choices(vocab, k=words_per_doc)) + " Mixed, CASE! 42")
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _tbl(df):
    return [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]


# -- pure-Python layer -------------------------------------------------------

@pytest.mark.parametrize("seed", [3, 7, 42])
def test_incremental_trainer_matches_naive_reference(seed):
    words, _ = _rand_words(seed)
    assert _train_on_dict(words, 60, 2) == _naive_train(words, 60, 2)


def test_merge_word_greedy_left_to_right():
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_word(list("aab"), "a", "b") == ["a", "ab"]
    assert merge_word(["x", "y", "y"], "x", "y") == ["xy", "y"]


@pytest.mark.parametrize("seed", [5, 11])
def test_encode_lowest_rank_equals_replay_in_rank_order(seed):
    words, vocab = _rand_words(seed)
    merges = _train_on_dict(words, 60, 2)
    ranks = {(l, r): k for (k, l, r, _, _) in merges}
    for w in vocab:
        replayed = list(w)
        for (_, l, r, _, _) in merges:
            replayed = merge_word(replayed, l, r)
        assert encode_word(w, ranks) == replayed, w


# -- Spark layer -------------------------------------------------------------

def test_driver_vs_distributed_merge_table_identical(spark):
    docs = _rand_docs(spark, 11)
    a = _tbl(bpe_train(spark, docs, num_merges=25))
    b = _tbl(bpe_train_distributed(spark, docs, num_merges=25))
    assert a == b and len(a) == 25


def test_dict_guard_routes_to_distributed_identically(spark):
    docs = _rand_docs(spark, 13, n_docs=30)
    a = _tbl(bpe_train(spark, docs, num_merges=15))
    b = _tbl(bpe_train(spark, docs, num_merges=15, driver_dict_max=3))
    assert a == b


def test_driver_path_matches_naive_on_spark_word_counts(spark):
    docs = _rand_docs(spark, 17, n_docs=30)
    wc = word_counts(docs).filter(F.col("cnt") >= 2).collect()
    words = sorted((r["word"], int(r["cnt"])) for r in wc)
    expected = [tuple(m) for m in _naive_train(words, 20, 2)]
    assert _tbl(bpe_train(spark, docs, num_merges=20)) == expected


def test_merge_fold_col_equals_merge_word(spark):
    rng = random.Random(29)
    rows = [
        ([rng.choice(["a", "b", "ab", "c"]) for _ in range(rng.randint(1, 10))],)
        for _ in range(60)
    ]
    df = spark.createDataFrame(rows, "syms array<string>")
    got = [
        r["out"]
        for r in df.select(
            _merge_fold_col(F.col("syms"), "a", "b").alias("out")
        ).collect()
    ]
    assert got == [merge_word(s, "a", "b") for (s,) in rows]


def test_encode_counts_match_pure_python_and_invariants(spark):
    docs = _rand_docs(spark, 19, n_docs=20)
    merges = bpe_train(spark, docs, num_merges=20)
    enc = {r["docid"]: r for r in bpe_encode(docs, merges).collect()}
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }
    tok_re = re.compile(r"[^a-z0-9]+")
    for did, txt in docs.collect():
        words = [w for w in tok_re.sub(" ", txt.lower()).split() if w]
        row = enc[did]
        assert row["n_words"] == len(words)
        assert row["n_chars"] == sum(len(w) for w in words)
        assert row["n_bpe_tokens"] == sum(
            len(encode_word(w, ranks)) for w in words
        )
        assert row["n_words"] <= row["n_bpe_tokens"] <= row["n_chars"]


def test_encode_with_zero_merges_is_char_count(spark):
    docs = _rand_docs(spark, 23, n_docs=10)
    enc = bpe_encode(docs, []).collect()
    assert all(r["n_bpe_tokens"] == r["n_chars"] for r in enc)


def test_encode_inherits_string_doc_key(spark):
    # corpus.gen_pages_df pages are keyed by url (string), not bigint —
    # the output docid type must follow the input key type
    docs = _rand_docs(spark, 37, n_docs=10).select(
        F.concat(F.lit("http://d/"), F.col("doc_id")).alias("url"), "text"
    )
    enc = bpe_encode(docs, [("a", "b")], docid="url")
    assert dict(enc.dtypes)["docid"] == "string"
    rows = enc.collect()
    assert len(rows) == 10 and all(r["docid"].startswith("http://") for r in rows)


def test_train_is_deterministic_across_runs(spark):
    docs = _rand_docs(spark, 31, n_docs=25)
    assert _tbl(bpe_train(spark, docs, num_merges=18)) == _tbl(
        bpe_train(spark, docs, num_merges=18)
    )
