"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]``; the configs below are chosen so the
same code would behave on a multi-executor cluster (AQE on, sane shuffle
partition counts, Arrow enabled for all pandas UDF exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "search_engine_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession.

    cores=None → ``local[*]``. shuffle_partitions defaults to the core count
    (local mode: one JVM; 200 default partitions would just add task overhead).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores_str = env if env else "*"
    else:
        cores_str = str(cores)
    n_shuffle = shuffle_partitions or (
        int(cores_str) * 2 if cores_str.isdigit() else 32
    )
    builder = (
        SparkSession.builder.master(f"local[{cores_str}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def widen_small_input(df, min_ratio: int = 2):
    """Parallelize tiny scans before expression-heavy pipelines.

    A small table often arrives as ONE file → ONE task (splits are
    file/row-group granular), serializing everything downstream —
    tokenize/shingle expressions then run 1-core regardless of cluster
    size. When the scan has fewer than cores/min_ratio partitions,
    round-robin repartition to default parallelism; at real scale the
    input has splits >> cores and this is a no-op (no shuffle inserted).
    Only order-insensitive consumers (keyed aggregations) may rely on it.

    Streaming DataFrames pass through untouched (``df.rdd`` would throw).
    The many-files fast path skips the RDD-conversion probe entirely —
    at scale the scan always has splits >> cores, so the (mildly
    expensive) ``df.rdd.getNumPartitions()`` analysis only ever runs for
    genuinely tiny local inputs.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        if len(df.inputFiles()) * min_ratio >= target:
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() * min_ratio < target:
        return df.repartition(target)
    return df
