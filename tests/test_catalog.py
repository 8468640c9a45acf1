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
