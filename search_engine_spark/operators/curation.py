"""End-to-end corpus curation + dataset release.

``curate`` is the library form of the gate's `curation_pipeline` query —
the composition the individual operators exist for: language filter →
quality floor → repetition ceiling → canonical-URL dedup → exact text
dedup → (optional) per-domain quota → (optional) continuous-weight
downsampling → deterministic train/val/test split. Every stage is a keyed
semi-join; the survivor set is staged once (materialization cut) so
downstream consumers don't re-derive the tokenize chain.

``write_release`` is the sink: split-partitioned parquet shards plus a
_MANIFEST.json with per-split counts and an order-independent content
checksum — the artifact a training run pins. The checksum is a decimal
sum of per-row md5-derived integers reduced mod 10^15, so it is
independent of partition count, write order, and engine, never wraps
(decimal(38,0) accumulation), and any dropped/duplicated/changed row
changes it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from search_engine_spark.functions.hashing import md5_int
from search_engine_spark.operators import sampling as SMP
from search_engine_spark.operators import textstats as TS
from search_engine_spark.operators import urls as U

CHECKSUM_MOD = 10**15  # per-row reduction; decimal(38,0) sum stays exact
# to ~10^23 rows, so the aggregate never wraps at any realistic scale


def curate(
    docs: DataFrame,
    weights: dict[str, float],
    lang: str = "en",
    q_min: float = 0.35,
    rep_max: float = 0.2,
    url: str | None = "url",
    domain_cap_n: int | None = None,
    weight_col=None,
    docid: str = "doc_id",
) -> DataFrame:
    """(doc_id, split) keep-table for a training-data release.

    ``docs`` needs (docid, text, lang[, url]). ``url=None`` skips the
    URL-dedup stage (corpora without urls); ``domain_cap_n`` adds the
    C4-style per-domain quota; ``weight_col`` (a Column in [0,1]) adds
    continuous-weight downsampling AFTER all dedup (so the sampling rate
    applies to unique content, not dup multiplicity).
    """
    d = docs
    if docid != "doc_id":
        d = d.withColumnRenamed(docid, "doc_id")
    sel = d.filter(F.col("lang") == lang)
    q_keep = (
        TS.quality_score(sel)
        .filter(F.col("quality") >= q_min)
        .select(F.col("docid").alias("doc_id"))
    )
    rep_keep = (
        TS.repetition_stats(sel)
        .filter(F.col("dup_bigram_frac") <= rep_max)
        .select(F.col("docid").alias("doc_id"))
    )
    # materialization cut — see curation_pipeline's docstring: without it
    # every downstream consumer re-derives the tokenize+filter chain
    surv = sel.join(q_keep, "doc_id").join(rep_keep, "doc_id").localCheckpoint(
        eager=False
    )
    if url is not None:
        url_keep = U.url_dedup(surv, url=url).select(
            F.col("docid").alias("doc_id")
        )
        surv = surv.join(url_keep, "doc_id")
    text_keep = surv.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    surv = surv.join(text_keep.select("doc_id"), "doc_id")
    if domain_cap_n is not None and url is not None:
        surv = U.domain_cap(surv, cap=domain_cap_n, url=url).drop("domain")
    if weight_col is not None:
        surv = SMP.weighted_sample(surv, key="doc_id", weight=weight_col)
    return SMP.split_assign(
        surv.select("doc_id"), key="doc_id", weights=weights
    )


def write_release(
    docs: DataFrame,
    keep: DataFrame,
    out_dir: str,
    docid: str = "doc_id",
) -> dict:
    """Write the released dataset: ``docs`` (full attribute rows) joined
    to ``keep`` (doc_id, split), parquet partitioned by split, plus a
    _MANIFEST.json {split: {n_docs, n_chars, checksum}} written AFTER the
    data (readers treat manifest presence as commit, the same
    write-then-rename discipline as streaming/indexing.py).

    Returns the manifest dict. Deterministic: re-running over the same
    input produces byte-identical manifest numbers regardless of
    partitioning (the checksum is an order-independent mod-2^63 sum).
    """
    d = docs
    if docid != "doc_id":
        d = d.withColumnRenamed(docid, "doc_id")
    rel = d.join(keep, "doc_id")
    data_path = os.path.join(out_dir, "data")
    rel.write.mode("overwrite").partitionBy("split").parquet(data_path)
    back = rel.sparkSession.read.parquet(data_path)
    stats = (
        back.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
            (
                F.sum(
                    F.pmod(
                        md5_int(F.col("doc_id").cast("string"), seed="rel"),
                        F.lit(CHECKSUM_MOD),
                    ).cast("decimal(38,0)")
                )
                % F.lit(CHECKSUM_MOD)
            ).cast("long").alias("checksum"),
        )
        .collect()
    )
    manifest = {
        r["split"]: {
            "n_docs": int(r["n_docs"]),
            "n_chars": int(r["n_chars"]),
            "checksum": int(r["checksum"]),
        }
        for r in stats
    }
    tmp = os.path.join(out_dir, "_MANIFEST.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_MANIFEST.json"))
    return manifest
