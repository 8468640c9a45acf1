"""Sequence packing / distributed prefix sum (operators/packing.py).

The two-phase distributed exclusive prefix sum must equal the
sequential definition regardless of partition count, and the packing
arithmetic must match a pure-Python concat-then-chunk reference
(including empty docs and docs longer than the budget).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
)


def _rand_tokens(seed, n=200, max_tokens=600, zeros_every=17):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        nt = 0 if i % zeros_every == 0 else rng.randint(1, max_tokens)
        rows.append((i * 3 + 1, nt))  # non-contiguous ids: order by value
    return rows


def _reference_pack(rows, budget):
    out = {}
    start = 0
    for did, nt in sorted(rows):
        seq_id, seq_off = start // budget, start % budget
        straddles = int(nt > 0 and (start + nt - 1) // budget != seq_id)
        out[did] = (nt, start, seq_id, seq_off, straddles)
        start += nt
    return out


@pytest.mark.parametrize("parts", [2, 8])
def test_prefix_sum_matches_sequential_any_partitioning(spark, parts):
    rows = _rand_tokens(3)
    df = spark.createDataFrame(rows, "docid bigint, n_tokens bigint")
    got = {
        r["docid"]: r["start"]
        for r in exclusive_prefix_sum(
            df, "docid", "n_tokens", partitions=parts
        ).collect()
    }
    start, want = 0, {}
    for did, nt in sorted(rows):
        want[did] = start
        start += nt
    assert got == want


@pytest.mark.parametrize("budget", [64, 256])
def test_pack_sequences_matches_reference(spark, budget):
    rows = _rand_tokens(7)
    df = spark.createDataFrame(rows, "docid bigint, n_tokens bigint")
    ref = _reference_pack(rows, budget)
    got = pack_sequences(df, budget=budget).collect()
    assert len(got) == len(rows)
    for r in got:
        assert (
            r["n_tokens"],
            r["start"],
            r["seq_id"],
            r["seq_offset"],
            r["straddles"],
        ) == ref[r["docid"]], r["docid"]


def test_doc_longer_than_budget_straddles(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 700), (3, 5)], "docid bigint, n_tokens bigint"
    )
    got = {r["docid"]: r for r in pack_sequences(df, budget=256).collect()}
    assert got[2]["straddles"] == 1 and got[2]["seq_id"] == 0
    # doc 3 starts after 710 tokens -> window 2, no straddle
    assert (got[3]["seq_id"], got[3]["seq_offset"], got[3]["straddles"]) == (
        2,
        710 % 256,
        0,
    )


def test_zero_token_doc_occupies_nothing(spark):
    df = spark.createDataFrame(
        [(1, 256), (2, 0), (3, 1)], "docid bigint, n_tokens bigint"
    )
    got = {r["docid"]: r for r in pack_sequences(df, budget=256).collect()}
    assert (got[2]["seq_id"], got[2]["seq_offset"], got[2]["straddles"]) == (
        1,
        0,
        0,
    )
    assert got[3]["start"] == 256


def test_budget_must_be_positive(spark):
    df = spark.createDataFrame([(1, 1)], "docid bigint, n_tokens bigint")
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)
