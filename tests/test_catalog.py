"""Warehouse abstraction: parquet layout now, Iceberg when configured."""

from __future__ import annotations

import os

from search_engine_spark.catalog import Warehouse, iceberg_available


def test_parquet_roundtrip(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "w"))
    assert not wh.uses_iceberg
    df = spark.range(0, 100).withColumnRenamed("id", "docid")
    wh.write(df, "docs")
    assert wh.read("docs").count() == 100
    assert os.path.isdir(str(tmp_path / "w" / "docs"))
    # overwrite commit replaces, append appends
    wh.write(df.limit(10), "docs")
    assert wh.read("docs").count() == 10
    wh.write(df.limit(5), "docs", mode="append")
    assert wh.read("docs").count() == 15


def test_unconfigured_iceberg_degrades_to_parquet(spark, tmp_path):
    assert not iceberg_available(spark, "nope")
    wh = Warehouse(spark, str(tmp_path / "w2"), iceberg_catalog="nope")
    assert not wh.uses_iceberg  # no catalog conf / no runtime jar
    df = spark.range(0, 7)
    wh.write(df, "t")
    assert wh.read("t").count() == 7


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    """Compaction rewrites a fragmented table into few sorted files with
    identical content; the original survives a crash (staged swap)."""
    from pyspark.sql import functions as F

    from search_engine_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(0, 20_000).select(
        F.col("id").alias("docid"), (F.col("id") % 97).alias("dl")
    )
    wh.write(df.repartition(64), "docs")  # deliberately fragmented
    before = {(r["docid"], r["dl"]) for r in wh.read("docs").collect()}
    stats = wh.compact("docs", sort_cols=["docid"], target_mb=256)
    assert stats["files_before"] >= 64
    assert stats["files_after"] <= 4
    after = {(r["docid"], r["dl"]) for r in wh.read("docs").collect()}
    assert after == before
    # the queryable layout survives: docid ranges are disjoint across files
    got = wh.read("docs").orderBy("docid").select("docid").collect()
    assert [r["docid"] for r in got] == sorted(r[0] for r in before)


def test_compact_crash_window_recovery(spark, tmp_path):
    """A crash between the two swap renames leaves the table stranded at
    <path>.old; the next read()/compact() must roll it back instead of
    failing (r2 claimed atomicity the two-rename swap cannot provide)."""
    import shutil

    wh = Warehouse(spark, str(tmp_path / "whc"))
    df = spark.range(0, 500).withColumnRenamed("id", "docid")
    wh.write(df, "t")
    path = str(tmp_path / "whc" / "t")
    # simulate the crash window: first rename done, second never happened
    os.rename(path, path + ".old")
    assert not os.path.exists(path)
    assert wh.read("t").count() == 500          # read heals the swap
    assert os.path.exists(path)
    # stale .old left over AFTER a completed swap must not break the next
    # compact (it is discarded, the live table wins)
    shutil.copytree(path, path + ".old")
    stats = wh.compact("t", sort_cols=["docid"])
    assert wh.read("t").count() == 500
    assert not os.path.exists(path + ".old")
