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


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020, §2.2 heuristics)
# ---------------------------------------------------------------------------

C4_TERMINALS = (".", "!", "?", '"', "'")


def c4_clean(
    df: DataFrame,
    docid: str = "doc_id",
    text: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """(docid, clean_text, n_lines, n_kept_lines, n_sentences, kept,
    drop_reason) — the C4 cleaning pass (Raffel et al. 2020, §2.2): the
    LINE-level complement to the Gopher DOC-level rules
    (:func:`textstats.gopher_filter`), applied by every C4-descended
    webtext pipeline before dedup:

    * keep only lines that end in terminal punctuation (. ! ? or a
      closing quote) — drops navigation/menu fragments;
    * drop lines with fewer than ``min_line_words`` words;
    * drop lines containing the word "javascript" (enable-JS boilerplate);
    * drop the whole doc if it contains "lorem ipsum" (placeholder text)
      or a curly brace (source code), or if fewer than ``min_sentences``
      sentences survive (sentence count = terminal-punctuation marks in
      the cleaned text).

    ``drop_reason`` is '' for kept docs, else the first matching tag of
    ``lorem`` / ``brace`` / ``sentences``. The cross-corpus
    three-sentence-span dedup that C4 runs AFTER this pass is
    :func:`dedup.duplicate_spans` / :func:`dedup.paragraph_dedup` —
    compose them.

    Per-row array built-ins only — no explode, no shuffle, no Python;
    embarrassingly parallel at any scale."""
    t = F.col(text)
    line_words = lambda x: F.size(  # noqa: E731
        F.filter(F.split(x, r"\s+"), lambda w: w != "")
    )
    line_ok = lambda x: (  # noqa: E731
        F.substring(F.rtrim(x), -1, 1).isin(*C4_TERMINALS)
        & (line_words(x) >= min_line_words)
        & ~F.contains(F.lower(x), F.lit("javascript"))
    )
    base = df.select(
        F.col(docid).alias("docid"),
        F.filter(
            F.split(t, "\n"), lambda x: F.trim(x) != ""
        ).alias("lines"),
        F.contains(F.lower(t), F.lit("lorem ipsum")).alias("has_lorem"),
        F.contains(t, F.lit("{")).alias("has_brace"),
    ).select(
        "docid",
        F.size("lines").alias("n_lines"),
        F.concat_ws(
            "\n", F.filter(F.col("lines"), line_ok)
        ).alias("clean_text"),
        F.size(F.filter(F.col("lines"), line_ok)).alias("n_kept_lines"),
        "has_lorem",
        "has_brace",
    )
    n_sentences = (
        F.length("clean_text")
        - F.length(F.regexp_replace("clean_text", r"[.!?]", ""))
    ).cast("long")
    base = base.withColumn("n_sentences", n_sentences)
    kept = (
        ~F.col("has_lorem")
        & ~F.col("has_brace")
        & (F.col("n_sentences") >= min_sentences)
    )
    return base.select(
        "docid",
        "clean_text",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
        "n_sentences",
        kept.alias("kept"),
        F.when(F.col("has_lorem"), F.lit("lorem"))
        .when(F.col("has_brace"), F.lit("brace"))
        .when(F.col("n_sentences") < min_sentences, F.lit("sentences"))
        .otherwise(F.lit(""))
        .alias("drop_reason"),
    )


def c4_clean_sql(
    table: str = "documents",
    docid: str = "doc_id",
    text: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> str:
    """DuckDB mirror of :func:`c4_clean`."""
    terms = ", ".join(
        "'" + c.replace("'", "''") + "'" for c in C4_TERMINALS
    )
    line_ok = (
        f"x -> substr(rtrim(x), -1, 1) IN ({terms}) "
        f"AND len(list_filter(string_split_regex(x, '\\s+'), w -> w <> ''))"
        f" >= {min_line_words} "
        f"AND NOT contains(lower(x), 'javascript')"
    )
    return f"""
WITH base AS (
  SELECT {docid} AS docid,
         len(lines)::BIGINT AS n_lines,
         coalesce(array_to_string(list_filter(lines, {line_ok}), chr(10)),
                  '') AS clean_text,
         len(list_filter(lines, {line_ok}))::BIGINT AS n_kept_lines,
         contains(lower({text}), 'lorem ipsum') AS has_lorem,
         contains({text}, '{{') AS has_brace
  FROM (
    SELECT {docid}, {text},
           list_filter(string_split({text}, chr(10)), x -> trim(x) <> '')
             AS lines
    FROM {table})
),
sent AS (
  SELECT *,
         (length(clean_text)
          - length(regexp_replace(clean_text, '[.!?]', '', 'g')))::BIGINT
           AS n_sentences
  FROM base
)
SELECT docid, clean_text, n_lines, n_kept_lines, n_sentences,
       (NOT has_lorem AND NOT has_brace
        AND n_sentences >= {min_sentences}) AS kept,
       CASE WHEN has_lorem THEN 'lorem'
            WHEN has_brace THEN 'brace'
            WHEN n_sentences < {min_sentences} THEN 'sentences'
            ELSE '' END AS drop_reason
FROM sent
"""
