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

from pyspark.sql import Column, DataFrame, Window, functions as F

from search_engine_spark.functions.hashing import md5_int32, md5_two_hash_cols
from search_engine_spark.operators.text_ops import tokens_col
from search_engine_spark.session import widen_small_input

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

def shingle_array_col(text: str | Column, n: int = DEFAULT_SHINGLE) -> Column:
    """array<string> of DISTINCT word n-gram shingles — a single per-row
    expression (no explode, no shuffle)."""
    return _shingles_from_tokens(tokens_col(text), n)


def _shingles_from_tokens(toks: Column, n: int) -> Column:
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
    return F.array_distinct(sh)


def shingles(
    df: DataFrame, docid: str = "doc_id", text: str = "text", n: int = DEFAULT_SHINGLE
) -> DataFrame:
    """(docid, shingle) — DISTINCT word n-gram shingles per doc, built with
    array built-ins (per-row array_distinct — no distinct shuffle).

    The token array binds in its own Project (multiply-referenced,
    non-cheap → CollapseProject keeps it) so the regex tokenizer runs once
    per row, not once per reference inside the shingle expression."""
    df = widen_small_input(df)
    t = df.select(
        F.col(docid).alias("docid"), tokens_col(text).alias("_toks")
    )
    return t.select(
        "docid",
        F.explode(_shingles_from_tokens(F.col("_toks"), n)).alias("shingle"),
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------

# Below this threshold the PPJoin prefix (|A| - ceil(t·|A|) + 1 shingles)
# covers nearly the whole set, so the filter's window + joins cost more
# than they prune; the plain inverted-index join wins.
PREFIX_FILTER_MIN_T = 0.3


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    docid: str = "doc_id",
    text: str = "text",
    n: int = DEFAULT_SHINGLE,
    prefix_filter: bool | None = None,
) -> DataFrame:
    """(a, b, jaccard) for all doc pairs with shingle-Jaccard ≥ threshold.

    Two LOSSLESS candidate-generation strategies, auto-selected on the
    threshold (``prefix_filter=None``):

    * **Prefix filtering** (PPJoin; Xiao, Wang, Lin & Yu, WWW 2008;
      Chaudhuri et al., ICDE 2006) for t ≥ 0.3: order each doc's shingles
      by global document frequency ascending (rare first) and self-join
      only the first ``|A| - ceil(t'·|A|) + 1`` per doc. J(A,B) ≥ t forces
      |A∩B| ≥ t·|A|, so any qualifying pair must meet inside the prefix —
      the df² blow-up of stop-shingles never materializes. t' = t − 5e-7
      absorbs the final 6-dp rounding.
    * **Inverted-index join** for low thresholds (prefix ≈ whole set):
      pairs sharing ≥1 non-singleton shingle.

    Survivors of either are verified with the exact intersection count;
    results are identical. jaccard rounded to 6 dp for cross-engine
    stability."""
    if prefix_filter is None:
        prefix_filter = threshold >= PREFIX_FILTER_MIN_T
    # NB: no internal persist — an operator-owned cache can never be
    # unpersisted at the right time; callers batching many thresholds over
    # one corpus should cache shingles() themselves.
    sh = shingles(df, docid, text, n)
    # sizes via groupBy (not a per-row size() expression): the aggregation
    # ends in an exchange AQE can reuse across the two final size joins,
    # where a map-only subtree re-executes the shingle scan per reference
    # (measured ~25% slower)
    sizes = sh.groupBy("docid").agg(F.count(F.lit(1)).alias("sz"))
    if not prefix_filter:
        return _jaccard_inverted(sh, sizes, threshold)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("fdf"))
    nonsingle = sh.join(freq.filter(F.col("fdf") > 1), "shingle")
    if prefix_filter:
        t_relaxed = max(0.0, threshold - 5e-7)
        w = Window.partitionBy("docid").orderBy(
            F.col("fdf").asc(), F.col("shingle").asc()
        )
        cand_src = (
            nonsingle.withColumn("rid", F.row_number().over(w))
            .join(sizes, "docid")
            .filter(
                F.col("rid")
                <= F.col("sz") - F.ceil(F.lit(t_relaxed) * F.col("sz")) + 1
            )
            .select("docid", "shingle")
        )
        cands = (
            cand_src.select(F.col("docid").alias("a"), "shingle")
            .join(
                cand_src.select(F.col("docid").alias("b"), "shingle"),
                "shingle",
            )
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        # exact verification of candidates only (pair-local intersection)
        left = sh.select(F.col("docid").alias("a"), "shingle")
        right = sh.select(F.col("docid").alias("b"), "shingle")
        inter = (
            cands.join(left, "a")
            .join(right, ["b", "shingle"])
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


# A shingle shared by m docs yields m(m-1)/2 pairs; above this cut the
# pairs are generated by a distributed self-join (rows spread across
# tasks) instead of exploding m² structs inside one task's array row.
HOT_SHINGLE_CUT = 512


def _jaccard_inverted(
    sh: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Low-threshold exact Jaccard: ONE inverted-index aggregation
    (groupBy shingle → sorted posting array), then candidate pairs are
    generated MAP-SIDE from each posting array (nested transform —
    no row self-join, no shuffle of per-occurrence rows). Shingles with
    posting lists longer than HOT_SHINGLE_CUT take the classic self-join
    path so one task never explodes the m² head of a stop-shingle."""
    inv = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("docid")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    cold = inv.filter(F.size("ds") <= HOT_SHINGLE_CUT)
    ds = F.col("ds")
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + 2, F.size(ds)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cold_pairs = cold.select(F.explode(pair_arr).alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    hot = inv.filter(F.size("ds") > HOT_SHINGLE_CUT).select(
        "shingle", F.explode(ds).alias("docid")
    )
    hot_pairs = (
        hot.select("shingle", F.col("docid").alias("a"))
        .join(hot.select("shingle", F.col("docid").alias("b")), "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    inter = (
        cold_pairs.unionByName(hot_pairs)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("docid").alias("a"), F.col("sz").alias("sza")),
            "a",
        )
        .join(
            sizes.select(F.col("docid").alias("b"), F.col("sz").alias("szb")),
            "b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


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
    shingles of k hash functions from the two-hash family h_j = h1 + j·h2
    (Kirsch & Mitzenmacher 2006) — ONE md5 digest per shingle instead of
    k. One shuffle (groupBy docid) with map-side partial min aggregation."""
    sh = shingles(df, docid, text, n)
    hashed = sh.select(
        "docid", *md5_two_hash_cols(F.col("shingle"), num_hashes)
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
    df = widen_small_input(df)
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


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components over dup pairs)
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame, max_iter: int = 30
) -> DataFrame:
    """(docid, cluster) for every vertex in ``pairs(a, b)``: cluster = the
    minimum docid reachable in the undirected dup graph.

    Iterative min-label propagation as DataFrame jobs (the iterative-
    algorithm pattern the reference used for PageRank, here serving
    dedup): each round joins labels across edges and takes the min of
    (own label, neighbour labels); converges in O(component diameter)
    rounds — near-dup clusters are shallow (dups of dups), so typically
    2-4. Each round is one shuffle; `localCheckpoint` truncates the plan
    so lineage doesn't grow with iterations. Stops early at fixpoint."""
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("id").alias("docid"), F.col("label").alias("cluster"))


def dedup_clusters(
    df: DataFrame,
    threshold: float,
    docid: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(docid, cluster) over ALL docs: near-dup clusters from the
    MinHash+LSH pair stage closed under transitivity (A~B, B~C → one
    cluster even when A,C don't collide); singletons cluster to
    themselves. The keep-policy is then `cluster == docid`."""
    pairs = minhash_dedup_pairs(df, threshold, docid, text)
    cc = connected_components(pairs)
    return (
        df.select(F.col(docid).alias("docid"))
        .join(cc, "docid", "left")
        .select(
            "docid", F.coalesce("cluster", F.col("docid")).alias("cluster")
        )
    )


def dedup_by_cluster(
    df: DataFrame,
    threshold: float,
    docid: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """The near-dup-deduplicated table: keep exactly one doc per
    transitive near-dup cluster (the min-docid representative). This is
    the row-level output corpus curation actually consumes — exact_dedup
    removes byte-identical copies; this removes near-copies too."""
    keep = (
        dedup_clusters(df, threshold, docid, text)
        .filter(F.col("cluster") == F.col("docid"))
        .select(F.col("docid").alias(docid))
    )
    return df.join(keep, docid, "left_semi")
