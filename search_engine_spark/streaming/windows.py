"""Structured Streaming operators.

The reference has no streaming at all (SURVEY.md §2.4) — its crawler
frontier and PageRank loops are iterative batch. This module adds the
streaming surface a Common-Crawl-scale ingest pipeline needs, built on
Structured Streaming so the SAME transformations run incrementally:

* ``stream_pages`` — file-source stream over a pages directory: new
  parquet files (crawl deliveries) are picked up incrementally.
* ``streaming_postings`` — the indexer's tokenize stage as a streaming
  transform (mapInPandas works unchanged on streams): each micro-batch
  appends (docid, term, tf, positions, dl) rows; a downstream batch job
  folds them into posting blocks (index refresh).
* ``windowed_event_counts`` — tumbling event-time window aggregation with
  a watermark (late data dropped after the threshold).
* ``session_windows`` — gap-based session aggregation via the built-in
  ``session_window`` (state stores + watermark eviction).

Tests drive these with trigger(availableNow=True) against static parquet
and assert equality with the batch equivalents — the Structured Streaming
guarantee being exercised deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from search_engine_spark.operators.indexer import POSTINGS_SCHEMA, tokenize_postings

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Incremental scan of a pages directory (crawl output deliveries)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_postings(
    pages_stream: DataFrame, lang: str = "en"
) -> DataFrame:
    """Tokenize stage over a stream: same pandas UDF as the batch indexer.

    docids are not assignable incrementally as dense ranks; streaming mode
    keys postings by url hash (xxhash64) — the batch compaction job maps
    them to dense ids when folding into the main index."""
    src = pages_stream.filter(F.col("lang") == lang).select(
        F.xxhash64("url").alias("docid"), "text"
    )
    return tokenize_postings(src)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data watermark.

    Works on both a stream (incremental state) and a static frame (plain
    groupBy) — the declarative plan is identical."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", window).alias("win"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n",
        "sum_value",
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions per user via the built-in session_window
    (stateful streaming operator; watermark evicts closed sessions)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.session_window("ts", gap).alias("sess"),
        "user_id",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
    ).select(
        "user_id",
        F.col("sess.start").alias("session_start"),
        F.col("sess.end").alias("session_end"),
        "n_events",
        "sum_value",
    )


def streaming_first_seen(
    docs_stream: DataFrame, docid: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Streaming exact dedup — a CUSTOM stateful operator via
    ``applyInPandasWithState``: emit each content hash's FIRST occurrence
    only, across the whole stream. Per-key state (one flag per hash) lives
    in the state store; later micro-batches containing the same content
    emit nothing. Within the first micro-batch that sees a hash, the
    smallest docid wins (deterministic survivor).

    This is the streaming face of operators/dedup.exact_dedup: a crawl
    ingest can drop duplicate page bodies at arrival time instead of in a
    batch pass."""
    import pandas as pd

    src = docs_stream.select(
        F.md5(F.col(text)).alias("content_hash"),
        F.col(docid).alias("docid"),
    )

    def emit_first(key, pdfs, state):
        if state.exists:
            return iter(())
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["docid"].min())
                best = m if best is None else min(best, m)
        state.update((1,))
        return iter(
            [pd.DataFrame({"content_hash": [key[0]], "docid": [best]})]
        )

    return src.groupBy("content_hash").applyInPandasWithState(
        emit_first,
        outputStructType="content_hash string, docid long",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_stream_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain a stream into an in-memory table with availableNow (test/dev
    helper): processes everything currently available, then stops."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
