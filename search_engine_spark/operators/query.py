"""Query-side engine: BM25 top-k over the block index.

Two execution paths, both exact (no posting-list sampling — the reference
randomly sampled 2000 docs per term, frontend/Master.java:356-391; the
north star replaces that with exact block-max pruning):

* ``topk_distributed`` — a declarative Spark plan: partition-pruned scan of
  the postings table for the query's terms, block decode inside
  ``mapInPandas`` (Arrow-batched), per-(doc,term) BM25 partials, then
  ``groupBy(docid).sum → ORDER BY score DESC LIMIT k``
  (TakeOrderedAndProject). Scales with the cluster; used for batch query
  workloads (thousands of queries per job).

* ``topk_wand`` — driver-side document-at-a-time Block-Max WAND (Ding &
  Suel, SIGIR 2011) over the fetched posting blocks for interactive
  queries: exact top-k with block skipping, never decoding blocks whose
  block-max cannot beat the current threshold. Verified rank-identical to
  the exhaustive oracle in tests.

Phrase search (reference jobs/IndexerProjectPhraseSearch.java:328-475)
intersects posting lists in df-ascending order and verifies adjacency with
the stored positions via a two-pointer offset merge.
"""

from __future__ import annotations

import heapq
import json
import os
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from search_engine_spark.functions.codec import decode_block
from search_engine_spark.oracle.bm25 import B, K1, bm25_term_score
from search_engine_spark.oracle.text import STOPWORDS, tokenize


@dataclass
class Index:
    """Handles to one index warehouse (see operators/indexer.py layout)."""

    spark: SparkSession
    path: str
    stats: dict

    @property
    def postings(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "postings"))

    @property
    def terms(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "terms"))

    @property
    def docs(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "docs"))


def load_index(spark: SparkSession, path: str) -> Index:
    with open(os.path.join(path, "stats.json")) as fh:
        stats = json.load(fh)
    return Index(spark=spark, path=path, stats=stats)


def parse_query(query: str, stem: bool = True) -> list[str]:
    """Query terms: document tokenizer + stopword filter + ordered dedup
    (reference frontend/Master.java:283-296). Dual-indexing means stemmed
    variants match without query-side expansion beyond the stem itself."""
    seen: list[str] = []
    for term, _pos in tokenize(query, stem=stem, cap=None):
        if term in STOPWORDS or term in seen:
            continue
        seen.append(term)
    return seen


# ---------------------------------------------------------------------------
# Distributed exact top-k
# ---------------------------------------------------------------------------

def topk_distributed(index: Index, query: str, k: int = 100) -> DataFrame:
    """(docid, score) top-k as a Spark plan. The term filter is pushed into
    the parquet scan (term-sorted layout → row-group pruning)."""
    terms = parse_query(query, stem=index.stats.get("stem", True))
    spark = index.spark
    if not terms:
        return spark.createDataFrame([], "docid long, score double")
    n_docs = index.stats["n_docs"]
    avgdl = index.stats["avgdl"]

    blocks = index.postings.filter(F.col("term").isin(terms))
    tstats = index.terms.filter(F.col("term").isin(terms)).select("term", "idf")

    withidf = blocks.join(F.broadcast(tstats), "term")

    # decode blocks → (docid, tf, idf) rows → join dl → exact BM25 partial
    # → sum per doc. Arrow-batched; the join against docs(dl) is a normal
    # shuffle join (or broadcast when the doc table is small).
    def decode_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc: list[int] = []
            out_tf: list[int] = []
            out_idf: list[float] = []
            for blob, idf in zip(pdf["block"], pdf["idf"]):
                docids, tfs, _pos = decode_block(bytes(blob))
                out_doc.extend(docids)
                out_tf.extend(tfs)
                out_idf.extend([float(idf)] * len(docids))
            yield pd.DataFrame(
                {"docid": pd.Series(out_doc, dtype="int64"),
                 "tf": pd.Series(out_tf, dtype="int64"),
                 "idf": pd.Series(out_idf, dtype="float64")}
            )

    decoded = withidf.select("block", "idf").mapInPandas(
        decode_rows, schema="docid long, tf long, idf double"
    )
    dl = index.docs.select("docid", "dl")
    scored = (
        decoded.join(dl, "docid")
        .withColumn(
            "part",
            F.col("idf") * F.col("tf") * F.lit(K1 + 1.0)
            / (
                F.col("tf")
                + F.lit(K1)
                * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy("docid")
        .agg(F.sum("part").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


# ---------------------------------------------------------------------------
# Driver-side Block-Max WAND
# ---------------------------------------------------------------------------

class _Cursor:
    """Posting cursor over the (bucket, block_id)-ordered blocks of a term.

    Blocks decode lazily; ``shallow_advance`` moves across block metadata
    without decoding (the block-max skip)."""

    __slots__ = (
        "term", "idf", "blocks", "bi", "docids", "tfs", "pi", "ub",
    )

    def __init__(self, term: str, idf: float, blocks: list[tuple]):
        # blocks: list of (first_docid, last_docid, block_max_norm, blob)
        # where block_max_norm excludes the per-term idf factor (stored
        # idf-free by the indexer); all bounds here multiply idf back in.
        self.term = term
        self.idf = idf
        self.blocks = blocks
        self.bi = 0
        self.docids: list[int] = []
        self.tfs: list[int] = []
        self.pi = 0
        # global upper bound = idf · max block_max (standard WAND term UB)
        self.ub = idf * max(b[2] for b in blocks) if blocks else 0.0
        self._load()

    def _load(self) -> None:
        if self.bi < len(self.blocks):
            d, t, _p = decode_block(self.blocks[self.bi][3])
            self.docids, self.tfs = d, t
            self.pi = 0
        else:
            self.docids, self.tfs = [], []
            self.pi = 0

    @property
    def exhausted(self) -> bool:
        return self.bi >= len(self.blocks)

    @property
    def doc(self) -> int:
        return self.docids[self.pi]

    @property
    def tf(self) -> int:
        return self.tfs[self.pi]

    @property
    def block_max(self) -> float:
        return self.idf * self.blocks[self.bi][2]

    @property
    def block_last(self) -> int:
        return self.blocks[self.bi][1]

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with docid >= target."""
        while not self.exhausted and self.blocks[self.bi][1] < target:
            self.bi += 1
            if self.bi < len(self.blocks):
                self._load()
        if self.exhausted:
            self.docids, self.tfs = [], []
            return
        if not self.docids:
            self._load()
        # binary search within the decoded block
        lo, hi = self.pi, len(self.docids)
        while lo < hi:
            mid = (lo + hi) // 2
            if self.docids[mid] < target:
                lo = mid + 1
            else:
                hi = mid
        self.pi = lo
        if self.pi >= len(self.docids):
            # target falls between this block and the next
            self.bi += 1
            self._load()
            if self.exhausted:
                return
            self.next_geq(target)

    def advance(self) -> None:
        self.pi += 1
        if self.pi >= len(self.docids):
            self.bi += 1
            self._load()


def _fetch_term_blocks(index: Index, terms: list[str]) -> dict[str, list[tuple]]:
    """Collect (bucket, block_id)-ordered block metadata + bytes per term.
    One partition-pruned scan for all query terms."""
    rows = (
        index.postings.filter(F.col("term").isin(terms))
        .select(
            "term", "bucket", "block_id", "first_docid", "last_docid",
            "block_max", "block",
        )
        .collect()
    )
    out: dict[str, list[tuple]] = {}
    for r in rows:
        out.setdefault(r["term"], []).append(
            (r["bucket"], r["block_id"], r["first_docid"], r["last_docid"],
             r["block_max"], bytes(r["block"]))
        )
    for t in out:
        out[t].sort(key=lambda x: (x[0], x[1]))
        out[t] = [(f, l, m, b) for (_bk, _bi, f, l, m, b) in out[t]]
    return out


def topk_wand(
    index: Index,
    query: str,
    k: int = 100,
    doclen: dict[int, int] | None = None,
) -> list[tuple[int, float]]:
    """Exact BM25 top-k via document-at-a-time Block-Max WAND.

    Returns [(docid, score)] sorted (score desc, docid asc) — identical to
    the exhaustive oracle. ``doclen`` may be passed to avoid re-collecting
    the doc table across queries."""
    terms = parse_query(query, stem=index.stats.get("stem", True))
    if not terms:
        return []
    avgdl = index.stats["avgdl"]
    idfs = {
        r["term"]: r["idf"]
        for r in index.terms.filter(F.col("term").isin(terms)).collect()
    }
    blocks = _fetch_term_blocks(index, [t for t in terms if t in idfs])
    if doclen is None:
        doclen = {
            r["docid"]: r["dl"] for r in index.docs.select("docid", "dl").collect()
        }
    cursors = [
        _Cursor(t, idfs[t], blocks[t]) for t in terms if blocks.get(t)
    ]
    cursors = [c for c in cursors if not c.exhausted]
    if not cursors:
        return []

    heap: list[tuple[float, int]] = []  # min-heap of (score, -docid)
    theta = 0.0

    def push(docid: int, score: float) -> None:
        nonlocal theta
        item = (score, -docid)
        if len(heap) < k:
            heapq.heappush(heap, item)
            if len(heap) == k:
                theta = heap[0][0]
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
            theta = heap[0][0]

    while True:
        live = [c for c in cursors if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.doc)
        # pivot: smallest prefix of (doc-sorted) cursors whose UB sum can
        # beat theta. Docs strictly below pivot_doc cannot enter the top-k,
        # so cursors may be advanced past them (classic WAND invariant).
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(live):
            acc += c.ub
            if len(heap) < k or acc > theta:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # no remaining document can beat theta
        pivot_doc = live[pivot_i].doc

        if len(heap) >= k:
            # Block-max refinement (BMW): shallow-align the blocks of every
            # cursor at doc <= pivot_doc (skipped postings all have
            # docid < pivot_doc — already excluded by the WAND invariant),
            # then test the block-max sum against theta.
            group = [c for c in live if c.doc <= pivot_doc]
            for c in group:
                while not c.exhausted and c.block_last < pivot_doc:
                    c.bi += 1
                    c._load()
            group = [c for c in group if not c.exhausted]
            if not group:
                continue
            bm_sum = sum(c.block_max for c in group)
            if bm_sum <= theta:
                # No doc in [pivot_doc, boundary] scored from the group's
                # current blocks can beat theta; jump past the smallest
                # block boundary, clamped at the next non-group cursor's doc
                # so no doc with cross-cursor contributions is skipped.
                boundary = min(c.block_last for c in group)
                target = boundary + 1
                nxt = min(
                    (c.doc for c in live
                     if not c.exhausted and c.doc > pivot_doc),
                    default=None,
                )
                if nxt is not None:
                    target = min(target, nxt)
                target = max(target, pivot_doc + 1)
                for c in group:
                    if not c.exhausted and c.doc < target:
                        c.next_geq(target)
                continue

        # deep alignment: move every cursor below the pivot up to it
        # (safe per the WAND invariant; no-op when the heap isn't full,
        # because then pivot_i == 0 == the smallest doc).
        advanced = False
        for c in live:
            if not c.exhausted and c.doc < pivot_doc:
                c.next_geq(pivot_doc)
                advanced = True
        if advanced:
            continue  # re-sort and re-pivot with fresh positions

        # all live cursors sit at doc >= pivot_doc → fully score pivot_doc
        dl = doclen[pivot_doc]
        s = 0.0
        for c in live:
            if not c.exhausted and c.doc == pivot_doc:
                s += bm25_term_score(c.tf, dl, avgdl, c.idf)
                c.advance()
        push(pivot_doc, s)

    out = sorted(((-d, s) for s, d in heap), key=lambda x: (-x[1], x[0]))
    return [(d, s) for d, s in out]


# ---------------------------------------------------------------------------
# Phrase search
# ---------------------------------------------------------------------------

def phrase_docs(index: Index, phrase: str) -> list[int]:
    """Docids containing the exact adjacent token phrase.

    Candidate intersection in df-ascending order (reference
    IndexerProjectPhraseSearch.java:407-440), adjacency verified from the
    stored 1-based positions (checkExactMatch :340-376)."""
    terms = [t for t, _ in tokenize(phrase, stem=False, cap=None)]
    if not terms:
        return []
    blocks = _fetch_term_blocks(index, list(dict.fromkeys(terms)))
    if any(t not in blocks for t in terms):
        return []
    decoded: dict[str, dict[int, list[int]]] = {}
    for t in set(terms):
        per_doc: dict[int, list[int]] = {}
        for _f, _l, _m, blob in blocks[t]:
            ds, _tfs, poss = decode_block(blob)
            for d, p in zip(ds, poss):
                per_doc[d] = p
        decoded[t] = per_doc
    order = sorted(set(terms), key=lambda t: len(decoded[t]))
    cands = set(decoded[order[0]].keys())
    for t in order[1:]:
        cands &= set(decoded[t].keys())
        if not cands:
            return []
    out = []
    for d in sorted(cands):
        pos_sets = [set(decoded[t][d]) for t in terms]
        for p in sorted(pos_sets[0]):
            if all((p + i) in pos_sets[i] for i in range(1, len(terms))):
                out.append(d)
                break
    return out
