"""Byte-pair-encoding (BPE) tokenizer training + encoding, Spark-first.

The reference engine (see ``jobs/Indexer.java`` for its tokenize tier)
stops at whitespace/stem tokenization; an LLM training-data pipeline
additionally needs the *trainer* that produces a subword vocabulary
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the algorithm implemented here from the
paper). ``textstats.bpe_token_estimate`` estimates token counts; this
module learns the actual merge table and applies it.

Scale architecture (what changes at 100 TB and what doesn't):

* The only corpus-sized pass is :func:`word_counts` — ONE hash groupBy
  with map-side partial aggregation. Zipf's law compacts ~10^13 token
  occurrences into ~10^8 unique words, so everything after that pass
  operates on the compacted dictionary, never the corpus.
* The merge loop runs over the ``min_freq``-pruned dictionary. Like the
  serving paths in ``query.py`` (``DRIVER_POSTINGS_MAX``), the dict is
  preflight-counted: at or under :data:`DRIVER_DICT_MAX` rows it is
  collected once and trained with an incremental-recount loop (the
  standard single-node formulation — this is what real trainers do,
  because the pruned dict fits comfortably in memory even for web-scale
  corpora); above the budget the call hands off to
  :func:`bpe_train_distributed`, which keeps the dictionary as a
  DataFrame and pays one keyed shuffle per merge round. Both paths are
  merge-table-identical (pytest-pinned), so the guard can never change
  results, only placement.
* Encoding (:func:`bpe_encode`) is corpus-sized again: Arrow-batched
  ``mapInPandas`` with the (tiny, ``num_merges``-bounded) rank table in
  the closure, a per-batch word cache exploiting Zipf repetition, and a
  doc_id+text-only column footprint so the scan prunes.

Determinism contract (cross-run, cross-path): pair selection is
(count DESC, left ASC, right ASC); merge application within a word is
one greedy left-to-right pass — expressed as the same fold in the
driver loop (Python) and the distributed loop (JVM ``aggregate``).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from search_engine_spark.operators.text_ops import tokens_col
from search_engine_spark.session import widen_small_input

# Driver-memory guard for the pruned word dictionary (rows). 2M unique
# words × ~40 bytes is well under 100 MB on the driver; far past it is
# not — above this the trainer stays distributed. Mirrors the
# DRIVER_POSTINGS_MAX discipline in operators/query.py.
DRIVER_DICT_MAX = 2_000_000

MERGES_SCHEMA = StructType(
    [
        StructField("rank", IntegerType(), False),
        StructField("left", StringType(), False),
        StructField("right", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def word_counts(
    docs: DataFrame, text: str = "text"
) -> DataFrame:
    """(word, cnt) over the corpus — the one corpus-sized pass.

    Single hash aggregation with map-side combine; the scan prunes to
    the text column only.
    """
    docs = widen_small_input(docs, light=True)
    return (
        docs.select(F.explode(tokens_col(text)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# shared greedy-merge semantics
# ---------------------------------------------------------------------------

def merge_word(symbols: list[str], left: str, right: str) -> list[str]:
    """One greedy left-to-right merge pass of (left, right) -> left+right.

    The Python mirror of :func:`_merge_fold_col`; both paths and the
    tests pin their equivalence.
    """
    merged = left + right
    out: list[str] = []
    for s in symbols:
        if out and out[-1] == left and s == right:
            out[-1] = merged
        else:
            out.append(s)
    return out


def _merge_fold_col(syms_col, left: str, right: str):
    """JVM-side fold equal to :func:`merge_word` (no Python in the loop).

    ``aggregate`` walks the array once; "last element == left and
    current == right" replaces the last element with the merged symbol,
    which is exactly the greedy left-to-right pass: after a merge the
    tail symbol becomes left+right, which can never equal ``left``
    again (``right`` is non-empty), so overlaps skip just as the
    imperative scan does.
    """
    merged = left + right
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


# ---------------------------------------------------------------------------
# driver fast path (guarded)
# ---------------------------------------------------------------------------

def _train_on_dict(
    words: list[tuple[str, int]], num_merges: int, min_pair_freq: int
) -> list[tuple[int, str, str, str, int]]:
    """Merge loop over a collected (word, cnt) dict, incremental recount.

    Pair counts are per adjacent position (a word 'aaa' contributes
    ('a','a') twice), matching the distributed pair explode and the
    Sennrich reference. On each merge only the words that contain the
    winning pair are re-counted (subtract old contributions, merge, add
    new) — O(affected words) per round instead of O(dict).
    """
    syms: list[list[str]] = [list(w) for w, _ in words]
    cnts: list[int] = [c for _, c in words]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)

    def add_word(i: int, sign: int) -> None:
        s, c = syms[i], cnts[i] * sign
        for a, b in zip(s, s[1:]):
            pair_counts[(a, b)] += c
            if sign > 0:
                pair_words[(a, b)].add(i)

    for i in range(len(syms)):
        add_word(i, +1)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        best_pair, best_cnt = None, 0
        for p, c in pair_counts.items():
            if c > best_cnt or (
                c == best_cnt and best_pair is not None and p < best_pair
            ):
                best_pair, best_cnt = p, c
        if best_pair is None or best_cnt < min_pair_freq:
            break
        left, right = best_pair
        merges.append((rank, left, right, left + right, int(best_cnt)))
        affected = list(pair_words.get(best_pair, ()))
        for i in affected:
            add_word(i, -1)
            for a, b in zip(syms[i], syms[i][1:]):
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(i)
            syms[i] = merge_word(syms[i], left, right)
            add_word(i, +1)
        # drop exhausted pairs so the argmax scan stays tight
        pair_counts = defaultdict(
            int, {p: c for p, c in pair_counts.items() if c > 0}
        )
    return merges


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int = 64,
    min_freq: int = 2,
    min_pair_freq: int = 2,
    text: str = "text",
    driver_dict_max: int | None = None,
) -> DataFrame:
    """Learn a BPE merge table from a documents DataFrame.

    Returns (rank, left, right, merged, pair_count) ordered by rank.
    ``min_freq`` prunes the word dictionary (words rarer than this
    cannot influence a ``min_pair_freq``-bounded merge anyway at
    sensible settings, and the pruning is what bounds the dict at
    web scale). Dict preflight at or under ``driver_dict_max`` rows →
    collected incremental loop; above → :func:`bpe_train_distributed`
    (identical output, one shuffle per round).
    """
    if driver_dict_max is None:
        driver_dict_max = DRIVER_DICT_MAX
    wc = word_counts(docs, text=text).filter(F.col("cnt") >= min_freq)
    wc = wc.localCheckpoint()  # one corpus pass, reused by either path
    if wc.count() > driver_dict_max:
        return _train_distributed_on_dict(
            spark, wc, num_merges, min_pair_freq
        )
    rows = wc.collect()
    words = sorted((r["word"], int(r["cnt"])) for r in rows)
    merges = _train_on_dict(words, num_merges, min_pair_freq)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


# ---------------------------------------------------------------------------
# distributed path (the >DRIVER_DICT_MAX overflow route)
# ---------------------------------------------------------------------------

def bpe_train_distributed(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int = 64,
    min_freq: int = 2,
    min_pair_freq: int = 2,
    text: str = "text",
) -> DataFrame:
    """Merge-table-identical sibling of :func:`bpe_train` that never
    collects the word dictionary."""
    wc = word_counts(docs, text=text).filter(F.col("cnt") >= min_freq)
    return _train_distributed_on_dict(
        spark, wc.localCheckpoint(), num_merges, min_pair_freq
    )


def _train_distributed_on_dict(
    spark: SparkSession,
    wc: DataFrame,
    num_merges: int,
    min_pair_freq: int,
) -> DataFrame:
    """One keyed shuffle per merge round over the dict DataFrame.

    Per round: adjacent-pair explode (per position, matching the driver
    loop) → hash agg with map-side combine → TakeOrdered(1) for the
    deterministic argmax (count DESC, left ASC, right ASC — never a
    full sort materialization) → JVM fold applies the merge. Lineage is
    truncated every few rounds like ``pagerank.py``; the scalar argmax
    collect is the only driver traffic.
    """
    state = wc.select(
        F.split(F.col("word"), "").alias("syms"), F.col("cnt")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        pairs = (
            state.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("left"),
                            F.element_at("syms", i + 1).alias("right"),
                        ),
                    )
                ).alias("pair"),
                F.col("cnt"),
            )
            .groupBy("pair.left", "pair.right")
            .agg(F.sum("cnt").alias("pcnt"))
        )
        top = pairs.orderBy(
            F.desc("pcnt"), F.asc("left"), F.asc("right")
        ).take(1)
        if not top or int(top[0]["pcnt"]) < min_pair_freq:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((rank, left, right, left + right, int(top[0]["pcnt"])))
        state = state.select(
            _merge_fold_col(F.col("syms"), left, right).alias("syms"),
            F.col("cnt"),
        )
        if (rank + 1) % 8 == 0:
            state = state.localCheckpoint()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


# ---------------------------------------------------------------------------
# encoding (corpus-sized apply)
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: repeatedly merge the lowest-rank pair present.

    Equivalent to replaying the merge table in rank order (the
    Sennrich formulation) — pytest pins the equivalence — but skips
    merges that cannot apply.
    """
    s = list(word)
    while len(s) >= 2:
        best_rank, best = None, None
        for a, b in zip(s, s[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (a, b)
        if best is None:
            break
        s = merge_word(s, best[0], best[1])
    return s


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    docid: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(docid, n_words, n_bpe_tokens, n_chars) per document.

    ``merges`` may be the DataFrame from :func:`bpe_train` (collected
    here — bounded by ``num_merges``, never corpus-sized) or an
    in-rank-order list of (left, right). The corpus pass is one
    Arrow-batched ``mapInPandas`` whose input projection is
    (docid, text) only; a per-batch word→encoding cache turns Zipf
    repetition into dict hits instead of re-encodes.
    """
    if isinstance(merges, DataFrame):
        mrows = merges.orderBy("rank").collect()
        pair_list = [(r["left"], r["right"]) for r in mrows]
    else:
        pair_list = list(merges)
    ranks = {p: i for i, p in enumerate(pair_list)}

    import re

    tok_re = re.compile(r"[^a-z0-9]+")

    def run(batches):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            out = []
            for did, txt in zip(pdf["docid"], pdf["text"]):
                words = [
                    w
                    for w in tok_re.sub(" ", (txt or "").lower()).split()
                    if w
                ]
                n_tok = 0
                for w in words:
                    n = cache.get(w)
                    if n is None:
                        n = len(encode_word(w, ranks))
                        cache[w] = n
                    n_tok += n
                out.append(
                    (
                        did,
                        len(words),
                        n_tok,
                        sum(len(w) for w in words),
                    )
                )
            yield pd.DataFrame(
                out, columns=["docid", "n_words", "n_bpe_tokens", "n_chars"]
            )

    docs = widen_small_input(docs, light=True)
    src = docs.select(
        F.col(docid).alias("docid"), F.col(text).alias("text")
    )
    # the doc key type follows the input (bigint doc_id for the testdata
    # tables, string url for corpus.gen_pages_df pages)
    did_type = docs.schema[docid].dataType.simpleString()
    return src.mapInPandas(
        run,
        schema=(
            f"docid {did_type}, n_words bigint, n_bpe_tokens bigint, "
            "n_chars bigint"
        ),
    )
