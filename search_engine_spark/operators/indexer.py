"""Distributed inverted-index builder — the engine's core batch pipeline.

Replaces the reference's index build (/root/reference/src/cis5550/jobs/
IndexerProject.java:191-441: sequential driver docId counter + side-effect
KVS `batchPut` writes keyed by term) with an explicit, declarative Spark
plan:

    pages ──filter(lang)──> docid assignment (distributed dense rank)
          ──mapInPandas(tokenize: extraction-parity tokenizer + Porter
            dual-indexing)──> (docid, term, tf, positions, dl)
          ──groupBy(term).agg──> term stats (df, cf, idf)
          ──heavy-term detection──> bucket postings by docid range for
            skewed terms (explicit skew handling per north_rule)
          ──applyInPandas(encode)──> delta-gap+varint posting BLOCKS with
            block-max BM25 metadata (functions/codec.py)
          ──repartitionByRange(term).sortWithinPartitions──> parquet

Scale design notes (the parts that must survive 10^12 docs):

* **Docid assignment** is a two-pass distributed dense rank over url
  (range-partition by url → per-partition counts → driver prefix-sum of P
  integers → per-partition offset + local rank). No global window, no
  driver-side scan — the reference's sequential global counter
  (IndexerProject.java:210-235) is the anti-pattern this replaces. The
  only driver state is one count per partition.
* **Skew**: stop-word-head terms have posting lists ~N long; a naive
  groupBy(term) would put an entire such list in one task. Terms whose df
  exceeds ``postings_per_bucket`` are split into docid-RANGE buckets
  (deterministic, not random salt), so every task encodes a bounded chunk
  and — because buckets are disjoint, ordered docid ranges — concatenating
  the per-bucket blocks in (bucket, block_id) order yields the globally
  docid-sorted posting list with NO re-merge pass. Block-max metadata is
  exact per block, so it is unaffected by the split.
* **Storage layout**: postings are range-partitioned and sorted by term so
  parquet row-group min/max statistics prune term lookups; in production
  the same DataFrames commit to Iceberg tables (partition pruning +
  snapshots); this container lacks the Iceberg runtime jar so the catalog
  writes plain parquet with an identical schema.

Index warehouse layout (directory = one index):
    postings/   term, bucket, block_id, first_docid, last_docid, n, block_max, block bytes
    terms/      term, df, cf, idf
    docs/       docid, url, dl
    stats.json  n_docs, avgdl, build metadata
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from search_engine_spark.functions.codec import DEFAULT_BLOCK_SIZE, split_blocks
from search_engine_spark.oracle.bm25 import bm25_idf
from search_engine_spark.oracle.text import tokenize

# A "heavy" term's postings are split into docid-range buckets of this many
# postings (expected), keeping encode tasks bounded regardless of term skew.
DEFAULT_POSTINGS_PER_BUCKET = 50_000

POSTINGS_SCHEMA = (
    "docid long, term string, tf int, positions array<int>, dl int"
)

BLOCKS_SCHEMA = (
    "term string, bucket int, block_id int, first_docid long, "
    "last_docid long, n int, block_max double, block binary"
)


# ---------------------------------------------------------------------------
# Stage 1: docid assignment (distributed dense rank by url)
# ---------------------------------------------------------------------------

def assign_docids(
    pages: DataFrame, partitions: int | None = None
) -> DataFrame:
    """(url, text, …) → same plus dense ``docid`` = rank of url (0-based).

    Deterministic for a fixed corpus and scale-safe: range-partition by url,
    count per partition (tiny driver collect: one long per partition),
    prefix-sum offsets, then add offset + within-partition ordinal in a
    single mapInPandas pass. Equivalent to
    ``row_number() over (order by url) - 1`` without the single-partition
    window (reference's sequential counter: IndexerProject.java:210-235).
    """
    spark = pages.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    ranged = (
        pages.repartitionByRange(parts, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in ranged.schema.fields
        if f.name != "_pid"
    ) + ", docid long"
    cols = [f.name for f in ranged.schema.fields if f.name != "_pid"]

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
                base = b_offsets.value[pid]
            out = pdf[cols].copy()
            out["docid"] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield out

    return ranged.mapInPandas(add_ids, schema=out_schema)


# ---------------------------------------------------------------------------
# Stage 2: tokenize → (docid, term, tf, positions, dl)
# ---------------------------------------------------------------------------

def tokenize_postings(
    docs: DataFrame,
    docid: str = "docid",
    text: str = "text",
    stem: bool = True,
    cap: int | None = None,
) -> DataFrame:
    """Reference-parity tokenization as a vectorized Arrow stage.

    One output row per (docid, distinct term): tf + 1-based positions over
    valid tokens, Porter dual-indexing (original and stem both emitted at
    the same position when they differ — IndexerProject.java:378-400),
    1500-token cap, plus the document length ``dl`` (number of capped valid
    positions) repeated on every row so BM25 stats need no extra join.
    """
    src = docs.select(F.col(docid).alias("docid"), F.col(text).alias("text"))
    kw = {} if cap is None else {"cap": cap}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_docid: list[int] = []
            rows_term: list[str] = []
            rows_tf: list[int] = []
            rows_pos: list[list[int]] = []
            rows_dl: list[int] = []
            for did, txt in zip(pdf["docid"], pdf["text"]):
                pairs = tokenize(txt or "", stem=stem, **kw)
                per_term: dict[str, list[int]] = {}
                dl = 0
                for term, pos in pairs:
                    per_term.setdefault(term, []).append(pos)
                    if pos > dl:
                        dl = pos
                for term, plist in per_term.items():
                    rows_docid.append(int(did))
                    rows_term.append(term)
                    rows_tf.append(len(plist))
                    rows_pos.append(plist)
                    rows_dl.append(dl)
            yield pd.DataFrame(
                {
                    "docid": pd.Series(rows_docid, dtype="int64"),
                    "term": rows_term,
                    "tf": pd.Series(rows_tf, dtype="int32"),
                    "positions": rows_pos,
                    "dl": pd.Series(rows_dl, dtype="int32"),
                }
            )

    return src.mapInPandas(run, schema=POSTINGS_SCHEMA)


# ---------------------------------------------------------------------------
# Stage 3: term statistics + heavy-term detection
# ---------------------------------------------------------------------------

def term_stats(postings: DataFrame, n_docs: int) -> DataFrame:
    """(term, df, cf, idf) — hash aggregation with map-side partials
    (reference's df/idf full-scan pass: IndexerProjectVersion1.java:781-802)."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    ).withColumn(
        "idf",
        F.log(
            (F.lit(n_docs) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
    )


# ---------------------------------------------------------------------------
# Stage 4: posting-block build (skew-bucketed)
# ---------------------------------------------------------------------------

def build_blocks(
    postings: DataFrame,
    terms: DataFrame,
    n_docs: int,
    avgdl: float,
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    block_size: int = DEFAULT_BLOCK_SIZE,
    with_positions: bool = True,
) -> DataFrame:
    """Encode posting lists into compressed blocks with block-max metadata.

    Heavy terms (df > postings_per_bucket) are split into deterministic
    docid-range buckets — ``bucket = docid // bucket_span`` — so no encode
    task sees more than ~postings_per_bucket rows; light terms use bucket 0.
    Because buckets partition the docid space in order, reading blocks in
    (bucket, block_id) order restores the globally sorted posting list
    without a merge (SURVEY.md §7 stage 4).
    """
    # bucket span in docid units chosen so an AVERAGE-density heavy term
    # gets ~postings_per_bucket postings per bucket; worst case (df = N,
    # every doc) gives exactly postings_per_bucket.
    bucket_span = max(1, postings_per_bucket)
    heavy = terms.filter(F.col("df") > postings_per_bucket).select("term", "idf")
    light = terms.filter(F.col("df") <= postings_per_bucket).select("term", "idf")

    # broadcast the (small) heavy set; light terms vastly outnumber heavy
    # ones but each has a small posting list.
    tagged = (
        postings.join(F.broadcast(heavy.withColumn("_heavy", F.lit(True))),
                      "term", "left")
        .withColumn(
            "bucket",
            F.when(
                F.col("_heavy").isNotNull(),
                (F.col("docid") / F.lit(bucket_span)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_heavy", "idf")
    )
    # every posting row needs idf (for block-max); join the full term stats.
    # This is a term-keyed shuffle join the groupBy below reuses (same key).
    tagged = tagged.join(terms.select("term", "idf"), "term")

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("docid")
        term = pdf["term"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        idf = float(pdf["idf"].iloc[0])
        docids = pdf["docid"].astype("int64").tolist()
        tfs = pdf["tf"].astype("int64").tolist()
        positions = (
            [list(p) for p in pdf["positions"]] if with_positions else None
        )
        doclen = dict(zip(docids, pdf["dl"].astype("int64").tolist()))
        rows = []
        for bi, blob, bmax, first, last, n in split_blocks(
            docids, tfs, positions, doclen, avgdl, idf, block_size
        ):
            rows.append((term, bucket, bi, first, last, n, bmax, blob))
        return pd.DataFrame(
            rows,
            columns=[
                "term", "bucket", "block_id", "first_docid",
                "last_docid", "n", "block_max", "block",
            ],
        )

    return tagged.groupBy("term", "bucket").applyInPandas(
        encode, schema=BLOCKS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Full build
# ---------------------------------------------------------------------------

def build_index(
    pages: DataFrame,
    out_dir: str,
    lang: str | None = "en",
    stem: bool = True,
    cap: int | None = None,
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    block_size: int = DEFAULT_BLOCK_SIZE,
    partitions: int | None = None,
) -> dict:
    """pages(url, warc_ts, html, text, lang) → index warehouse at out_dir.

    Returns the stats dict (also persisted as stats.json). Every stage is a
    DataFrame transform; the only driver-side data are per-partition counts
    (docid assignment) and the final scalar stats.
    """
    spark = pages.sparkSession
    src = pages.filter(F.col("lang") == lang) if lang else pages
    docs = assign_docids(src.select("url", "text"), partitions=partitions)

    postings = tokenize_postings(docs, stem=stem, cap=cap)
    # doc table + global stats; dl is carried on posting rows — one
    # max-aggregation, no rejoin against the corpus.
    doc_tbl = postings.groupBy("docid").agg(F.max("dl").alias("dl")).join(
        docs.select("docid", "url"), "docid"
    )
    doc_tbl.persist()
    stats_row = doc_tbl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"] or 0.0)

    postings.persist()
    terms = term_stats(postings, n_docs)
    terms.persist()

    blocks = build_blocks(
        postings, terms, n_docs, avgdl,
        postings_per_bucket=postings_per_bucket, block_size=block_size,
    )

    parts = partitions or spark.sparkContext.defaultParallelism
    # term-sorted layout → parquet min/max row-group pruning on term lookups
    (
        blocks.repartitionByRange(parts, "term")
        .sortWithinPartitions("term", "bucket", "block_id")
        .write.mode("overwrite").parquet(os.path.join(out_dir, "postings"))
    )
    (
        terms.repartitionByRange(max(1, parts // 4), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(os.path.join(out_dir, "terms"))
    )
    (
        doc_tbl.repartitionByRange(max(1, parts // 4), "docid")
        .sortWithinPartitions("docid")
        .write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
    )
    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "stem": stem,
        "cap": cap,
        "block_size": block_size,
        "postings_per_bucket": postings_per_bucket,
        "lang": lang,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "stats.json"), "w") as fh:
        json.dump(stats, fh, indent=1)
    postings.unpersist()
    terms.unpersist()
    doc_tbl.unpersist()
    return stats


def merge_index_stats(a: dict, b: dict) -> dict:
    """Merged-corpus stats (MergeIndexes semantics, reference
    jobs/MergeIndexes.java:45-127): doc sets assumed disjoint."""
    n = a["n_docs"] + b["n_docs"]
    avgdl = (
        (a["avgdl"] * a["n_docs"] + b["avgdl"] * b["n_docs"]) / n if n else 0.0
    )
    out = dict(a)
    out.update({"n_docs": n, "avgdl": avgdl})
    return out
