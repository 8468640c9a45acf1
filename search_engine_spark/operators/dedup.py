"""Deduplication operators for large-scale training-data pipelines.

Four families, all DataFrame-declarative (JVM built-ins; no Python UDFs):

* **Exact** — hash-groupBy on a content digest (the reference's
  content-dedup table keyed by page-body hash,
  /root/reference/src/cis5550/jobs/Crawler.java:519-525).
* **N-gram Jaccard (exact)** — word-shingle inverted-index self-join:
  pairs sharing ≥1 shingle, |A∩B| by count, Jaccard from set sizes.
  Shingles with document frequency 1 are pruned BEFORE the join (they
  cannot create a pair — lossless). At 100 TB the quadratic head of
  ultra-common shingles is the bottleneck; the MinHash path below is the
  scale answer, this one is the exact verifier.
* **MinHash + LSH** — per-doc signatures (min over shingles of k md5-based
  hash functions), banded into LSH buckets; candidate pairs = bucket
  self-join; final answer verified with exact Jaccard. Deterministic
  (functions/hashing.py) so even the LSH stage is oracle-checkable.
* **SimHash** — 32-bit tf-weighted SimHash per document; near-dup pairs =
  signature hamming distance ≤ r via (bucket-join on bit-bands).

All outputs order doc pairs (a < b) for stable comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from search_engine_spark.functions.hashing import md5_int, md5_int32
from search_engine_spark.operators.text_ops import tokens_col

DEFAULT_SHINGLE = 3
DEFAULT_NUM_HASHES = 8
DEFAULT_BANDS = 4  # rows-per-band = num_hashes // bands


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(
    df: DataFrame, docid: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(content_hash, n_dupes, keep_docid): one row per distinct content;
    keep_docid = smallest docid in the group (deterministic survivor)."""
    return (
        df.select(F.col(docid).alias("docid"), F.md5(F.col(text)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dupes"),
            F.min("docid").alias("keep_docid"),
        )
    )


def exact_dedup(df: DataFrame, docid: str = "doc_id", text: str = "text") -> DataFrame:
    """The deduplicated table: keep the min-docid row per distinct text."""
    keep = exact_dedup_groups(df, docid, text).select(
        F.col("keep_docid").alias(docid)
    )
    return df.join(keep, docid, "left_semi")


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------

def shingles(
    df: DataFrame, docid: str = "doc_id", text: str = "text", n: int = DEFAULT_SHINGLE
) -> DataFrame:
    """(docid, shingle) — DISTINCT word n-gram shingles per doc, built with
    array built-ins (transform over token-index slices), no Python."""
    toks = tokens_col(text)
    # Guard: for docs with fewer than n tokens, sequence(0, size-n) would
    # run DOWNWARD (step defaults to -1 when start > stop) and slice() then
    # crashes on index 0 — short/empty docs must yield no shingles instead.
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(docid).alias("docid"), F.explode(sh).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    docid: str = "doc_id",
    text: str = "text",
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(a, b, jaccard) for all doc pairs with shingle-Jaccard ≥ threshold.

    Inverted-index join: only docs sharing a shingle meet; singleton
    shingles pruned losslessly. jaccard rounded to 6 dp for cross-engine
    stability."""
    sh = shingles(df, docid, text, n).persist()
    sizes = sh.groupBy("docid").agg(F.count(F.lit(1)).alias("sz"))
    # prune shingles that occur in a single doc (cannot form pairs)
    common = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 1)
        .select("shingle")
    )
    sh2 = sh.join(common, "shingle")
    left = sh2.select(F.col("docid").alias("a"), "shingle")
    right = sh2.select(F.col("docid").alias("b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("docid").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("docid").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sza") + F.col("szb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    docid: str = "doc_id",
    text: str = "text",
    n: int = DEFAULT_SHINGLE,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """(docid, mh0..mh{k-1}) — MinHash signature per doc: min over its
    shingles of k independent md5-derived hash functions. One shuffle
    (groupBy docid) with map-side partial min aggregation."""
    sh = shingles(df, docid, text, n)
    hashed = sh.select(
        "docid",
        *[md5_int(F.col("shingle"), seed=j).alias(f"h{j}") for j in range(num_hashes)],
    )
    return hashed.groupBy("docid").agg(
        *[F.min(f"h{j}").alias(f"mh{j}") for j in range(num_hashes)]
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(a, b) candidate pairs: docs agreeing on ALL rows of ≥1 band.

    Signature matrix banded r = k/bands rows per band; band key is the
    struct of its minhashes → self-join per band → distinct pairs. This is
    the scale path: cost ∝ bucket sizes, not corpus²."""
    r = num_hashes // bands
    parts = []
    for b in range(bands):
        cols = [
            F.col(f"mh{b * r + i}").alias(f"k{i}") for i in range(r)
        ]
        parts.append(
            sigs.select(
                F.col("docid"),
                F.lit(b).alias("band"),
                F.struct(*cols).alias("key"),
            )
        )
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)
    left = banded.select("band", "key", F.col("docid").alias("a"))
    right = banded.select("band", "key", F.col("docid").alias("b"))
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float,
    docid: str = "doc_id",
    text: str = "text",
    n: int = DEFAULT_SHINGLE,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard ≥ threshold → (a, b, jaccard).

    Exactness note: LSH can miss pairs (false negatives) — this operator's
    contract is 'pairs found by LSH that truly exceed the threshold', the
    standard trade at scale. jaccard_pairs() is the exhaustive variant."""
    sigs = minhash_signatures(df, docid, text, n, num_hashes)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands)
    sh = shingles(df, docid, text, n)
    sizes = sh.groupBy("docid").agg(F.count(F.lit(1)).alias("sz"))
    # exact-verify only the candidate pairs: restrict the shingle-shingle
    # join to (a, b) candidates so intersection counting is pair-local
    left = sh.select(F.col("docid").alias("a"), "shingle")
    right = sh.select(F.col("docid").alias("b"), "shingle")
    inter = (
        cands.join(left, "a")
        .join(right, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("docid").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("docid").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(
    df: DataFrame, docid: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(docid, simhash) — 32-bit tf-weighted SimHash (Charikar 2002).

    Plan: explode tokens → per-(doc,term) tf → term hash (md5 32-bit) →
    explode bit index 0..31 → signed tf sum per (doc, bit) → bit j set iff
    sum > 0 → simhash = Σ 2^j. All built-ins; two keyed shuffles."""
    tf = (
        df.select(F.col(docid).alias("docid"), F.explode(tokens_col(text)).alias("term"))
        .groupBy("docid", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", md5_int32(F.col("term")))
    )
    bits = tf.select(
        "docid",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    ).withColumn(
        "contrib",
        F.when(
            F.expr("(shiftright(h, bit) & 1) = 1"),
            F.col("tf"),
        ).otherwise(-F.col("tf")),
    )
    return (
        bits.groupBy("docid", "bit")
        .agg(F.sum("contrib").alias("s"))
        .withColumn(
            "bitval",
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy("docid")
        .agg(F.sum("bitval").alias("simhash"))
    )


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    docid: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(a, b, hamming) pairs with SimHash hamming distance ≤ max_hamming.

    Scale path: split the 32-bit signature into (max_hamming+1) bit-bands —
    any pair within distance r agrees exactly on ≥1 band (pigeonhole) —
    bucket-join per band, then verify with bit_count(xor)."""
    sigs = simhash(df, docid, text)
    nbands = max_hamming + 1
    width = SIMHASH_BITS // nbands
    parts = []
    for b in range(nbands):
        shift = b * width
        w = width if b < nbands - 1 else SIMHASH_BITS - shift
        mask = (1 << w) - 1
        parts.append(
            sigs.select(
                "docid",
                "simhash",
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), shift).bitwiseAND(F.lit(mask)).alias("key"),
            )
        )
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)
    left = banded.select("band", "key", F.col("docid").alias("a"), F.col("simhash").alias("sa"))
    right = banded.select("band", "key", F.col("docid").alias("b"), F.col("simhash").alias("sb"))
    cands = (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
    )
    return (
        cands.withColumn("x", F.col("sa").bitwiseXOR(F.col("sb")))
        .withColumn("hamming", F.bit_count("x"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
