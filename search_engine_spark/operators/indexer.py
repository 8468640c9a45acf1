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

from search_engine_spark.functions.codec import DEFAULT_BLOCK_SIZE
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

def build_blocks_arrow(
    postings: DataFrame,
    terms: DataFrame,
    n_docs: int,
    avgdl: float,
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    block_size: int = DEFAULT_BLOCK_SIZE,
    partitions: int | None = None,
) -> DataFrame:
    """Arrow-native block build in ONE shuffle.

    ``repartitionByRange(term, bucket) → sortWithinPartitions(term, bucket,
    docid) → mapInArrow(stream encoder)``: groups arrive contiguous and
    docid-sorted, so the encoder is a zero-copy streaming pass over Arrow
    batches — positions stay a flat values+offsets ListArray end to end (no
    per-row Python lists), and the output is already term-range-laid-out
    for the parquet write (no second shuffle). Heavy terms are docid-range
    bucketed exactly as in ``build_blocks``.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from search_engine_spark.functions.codec import encode_block_arrays
    from search_engine_spark.oracle.bm25 import B, K1

    spark = postings.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    bucket_span = max(1, postings_per_bucket)
    heavy = terms.filter(F.col("df") > postings_per_bucket).select("term")
    tagged = (
        postings.join(
            F.broadcast(heavy.withColumn("_heavy", F.lit(True))), "term", "left"
        )
        .withColumn(
            "bucket",
            F.when(
                F.col("_heavy").isNotNull(),
                (F.col("docid") / F.lit(bucket_span)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .select("term", "bucket", "docid", "tf", "positions", "dl")
        .repartitionByRange(parts, "term", "bucket")
        .sortWithinPartitions("term", "bucket", "docid")
    )

    out_fields = pa.schema(
        [
            ("term", pa.string()),
            ("bucket", pa.int32()),
            ("block_id", pa.int32()),
            ("first_docid", pa.int64()),
            ("last_docid", pa.int64()),
            ("n", pa.int32()),
            ("block_max", pa.float64()),
            ("block", pa.binary()),
        ]
    )

    def emit_groups(tbl: "pa.Table", starts: "np.ndarray"):
        """Encode each contiguous (term,bucket) group of a docid-sorted
        table; ``starts`` are the group start offsets (first = 0)."""
        tbl = tbl.combine_chunks()
        docid = tbl.column("docid").to_numpy()
        tf = tbl.column("tf").to_numpy().astype(np.int64, copy=False)
        dl = tbl.column("dl").to_numpy().astype(np.float64, copy=False)
        pos = tbl.column("positions")
        pos = pos.chunk(0) if isinstance(pos, pa.ChunkedArray) else pos
        offs = pos.offsets.to_numpy().astype(np.int64, copy=False)
        base = offs[0]
        offs = offs - base
        flat = pos.values.to_numpy().astype(np.int64, copy=False)
        flat = flat[base : base + offs[-1]] if len(offs) else flat[:0]
        terms_np = tbl.column("term").to_numpy(zero_copy_only=False)
        bucket_np = tbl.column("bucket").to_numpy()
        norm = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        bounds = np.append(starts, len(tbl))
        o_term, o_bucket, o_bid, o_first, o_last, o_n, o_max, o_blob = (
            [], [], [], [], [], [], [], []
        )
        for gi in range(len(starts)):
            g0, g1 = int(bounds[gi]), int(bounds[gi + 1])
            t, bk = terms_np[g0], int(bucket_np[g0])
            for bi, s in enumerate(range(g0, g1, block_size)):
                e = min(s + block_size, g1)
                blob = encode_block_arrays(
                    docid[s:e],
                    tf[s:e],
                    flat[offs[s] : offs[e]],
                    np.diff(offs[s : e + 1]),
                )
                o_term.append(t)
                o_bucket.append(bk)
                o_bid.append(bi)
                o_first.append(int(docid[s]))
                o_last.append(int(docid[e - 1]))
                o_n.append(e - s)
                o_max.append(float(norm[s:e].max()))
                o_blob.append(blob)
        if o_term:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_term, pa.string()),
                    pa.array(o_bucket, pa.int32()),
                    pa.array(o_bid, pa.int32()),
                    pa.array(o_first, pa.int64()),
                    pa.array(o_last, pa.int64()),
                    pa.array(o_n, pa.int32()),
                    pa.array(o_max, pa.float64()),
                    pa.array(o_blob, pa.binary()),
                ],
                schema=out_fields,
            )

    def group_starts(tbl: "pa.Table") -> "np.ndarray":
        n = len(tbl)
        if n <= 1:
            return np.zeros(min(n, 1), dtype=np.int64)
        term = tbl.column("term").combine_chunks()
        buck = tbl.column("bucket").combine_chunks()
        neq = pc.or_(
            pc.not_equal(term.slice(1), term.slice(0, n - 1)),
            pc.not_equal(buck.slice(1), buck.slice(0, n - 1)),
        ).to_numpy(zero_copy_only=False)
        return np.concatenate([[0], np.nonzero(neq)[0] + 1]).astype(np.int64)

    def encode_stream(batches):
        pending: "pa.Table | None" = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if pending is not None:
                tbl = pa.concat_tables([pending, tbl]).combine_chunks()
            if len(tbl) == 0:
                continue
            starts = group_starts(tbl)
            last = int(starts[-1])
            head, pending = tbl.slice(0, last), tbl.slice(last)
            if len(head):
                yield from emit_groups(head, starts[:-1])
        if pending is not None and len(pending):
            yield from emit_groups(pending, group_starts(pending))

    return tagged.mapInArrow(encode_stream, schema=BLOCKS_SCHEMA)


def build_blocks(
    postings: DataFrame,
    terms: DataFrame,
    n_docs: int,
    avgdl: float,
    postings_per_bucket: int = DEFAULT_POSTINGS_PER_BUCKET,
    block_size: int = DEFAULT_BLOCK_SIZE,
    with_positions: bool = True,
) -> DataFrame:
    """Encode posting lists into compressed blocks with block-max metadata
    (block_max stored idf-normalized: max of tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl))
    over the block; the query engine multiplies the per-term idf back in).

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
    # heavy set is tiny by Zipf (only terms with df > bucket size) → safe
    # broadcast at any corpus scale; light terms are many but each small.
    heavy = terms.filter(F.col("df") > postings_per_bucket).select("term")

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
        .drop("_heavy")
    )
    # block_max is stored WITHOUT the idf factor (idf is a per-term
    # constant; the query side multiplies it in). This avoids joining the
    # full term-stats table into the posting stream — at web scale the
    # vocabulary is far too large to broadcast and the join would be a
    # second full shuffle of the posting data.

    import numpy as np

    from search_engine_spark.functions.codec import encode_block_arrays
    from search_engine_spark.oracle.bm25 import B, K1

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("docid")
        term = pdf["term"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        docids = pdf["docid"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.float64)
        # idf-NORMALIZED per-posting BM25 partials (block_max excludes the
        # per-term idf constant; query side multiplies it in), vectorized
        scores = (
            tfs * (K1 + 1.0)
            / (tfs + K1 * (1.0 - B + B * dls / avgdl))
        )
        if with_positions:
            plists = pdf["positions"].tolist()
            pos_lens = np.fromiter(
                (len(p) for p in plists), dtype=np.int64, count=len(plists)
            )
            pos_flat = (
                np.concatenate([np.asarray(p, dtype=np.int64) for p in plists])
                if pos_lens.sum() > 0
                else np.empty(0, dtype=np.int64)
            )
            pos_offsets = np.concatenate([[0], np.cumsum(pos_lens)])
        rows = []
        for bi, s in enumerate(range(0, len(docids), block_size)):
            e = min(s + block_size, len(docids))
            if with_positions:
                blob = encode_block_arrays(
                    docids[s:e],
                    tfs[s:e],
                    pos_flat[pos_offsets[s] : pos_offsets[e]],
                    pos_lens[s:e],
                )
            else:
                blob = encode_block_arrays(docids[s:e], tfs[s:e], None, None)
            rows.append(
                (
                    term, bucket, bi,
                    int(docids[s]), int(docids[e - 1]), e - s,
                    float(scores[s:e].max()), blob,
                )
            )
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

    parts = partitions or spark.sparkContext.defaultParallelism
    # arrow streaming encoder emits blocks already term-range-partitioned
    # and term-sorted (one shuffle total) → parquet min/max row-group
    # pruning works on term lookups with no extra exchange
    blocks = build_blocks_arrow(
        postings, terms, n_docs, avgdl,
        postings_per_bucket=postings_per_bucket, block_size=block_size,
        partitions=parts,
    )
    blocks.write.mode("overwrite").parquet(os.path.join(out_dir, "postings"))
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
