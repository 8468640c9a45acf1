"""Warehouse abstraction: parquet layout now, Iceberg when configured."""

from __future__ import annotations

import os

import pytest

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


def test_versioned_snapshots_time_travel(spark, tmp_path):
    """Snapshot commits: overwrite creates a new version, the previous one
    stays readable (time travel); append reuses the parent's files."""
    wh = Warehouse(spark, str(tmp_path / "v"), versioned=True)
    df = spark.range(0, 100).withColumnRenamed("id", "docid")
    wh.write(df, "t")
    assert wh.current_version("t") == 1
    wh.write(df.limit(10), "t")                       # overwrite → v2
    wh.write(df.limit(5), "t", mode="append")         # append    → v3
    assert wh.current_version("t") == 3
    assert wh.read("t").count() == 15
    assert wh.read("t", version=2).count() == 10
    assert wh.read("t", version=1).count() == 100
    snaps = wh.snapshots("t")
    assert [s["version"] for s in snaps] == [1, 2, 3]
    assert snaps[2]["mode"] == "append" and snaps[2]["parent"] == 2
    # append manifest contains the parent's files (no rewrite)
    assert set(snaps[1]["files"]) < set(snaps[2]["files"])


def test_versioned_autodetect_and_mixed_handles(spark, tmp_path):
    """A Warehouse handle WITHOUT the flag must auto-detect an existing
    versioned table on both read and write (never clobber the layout)."""
    root = str(tmp_path / "v2")
    Warehouse(spark, root, versioned=True).write(
        spark.range(0, 20), "t"
    )
    plain = Warehouse(spark, root)                    # no flag
    assert plain.read("t").count() == 20
    plain.write(plain.read("t").limit(3), "t")        # goes through commit
    assert plain.current_version("t") == 2
    assert plain.read("t").count() == 3
    assert plain.read("t", version=1).count() == 20


def test_versioned_compact_is_pointer_flip(spark, tmp_path):
    """Compacting a versioned table is one snapshot commit — fewer files,
    same rows, and the pre-compaction snapshot still time-travels."""
    from pyspark.sql import functions as F

    wh = Warehouse(spark, str(tmp_path / "v3"), versioned=True)
    df = spark.range(0, 5000).select(
        F.col("id").alias("docid"), (F.col("id") % 7).alias("x")
    )
    wh.write(df.repartition(32), "t")
    stats = wh.compact("t", sort_cols=["docid"])
    assert stats["files_before"] >= 32 and stats["files_after"] <= 4
    assert wh.current_version("t") == 2
    assert wh.read("t").count() == 5000
    assert wh.read("t", version=1).count() == 5000


def test_expire_snapshots_drops_unreferenced_data(spark, tmp_path):
    import os

    root = str(tmp_path / "v4")
    wh = Warehouse(spark, root, versioned=True)
    df = spark.range(0, 50)
    wh.write(df, "t")
    wh.write(df.limit(10), "t")
    wh.write(df.limit(5), "t")
    # plus an orphan data dir from a simulated crashed (uncommitted) write
    orphan = os.path.join(root, "t", "data", "sXX-orphan")
    os.makedirs(orphan)
    open(os.path.join(orphan, "junk.parquet"), "w").write("x")
    out = wh.expire_snapshots("t", keep_last=1)
    assert out["manifests_dropped"] == 2
    assert out["dirs_dropped"] == 3                   # v1 + v2 + orphan
    assert wh.read("t").count() == 5                  # current unharmed
    with pytest.raises(Exception):
        wh.read("t", version=1)


def test_versioned_append_adopts_plain_table(spark, tmp_path):
    """First snapshot commit onto a pre-existing plain-parquet table with
    mode='append' must ADOPT the legacy files into the manifest — not
    silently drop every pre-migration row (review finding)."""
    root = str(tmp_path / "v5")
    Warehouse(spark, root).write(spark.range(0, 40), "t")   # plain layout
    wh = Warehouse(spark, root, versioned=True)
    wh.write(spark.range(100, 110), "t", mode="append")     # migrate
    assert wh.current_version("t") == 1
    got = sorted(r["id"] for r in wh.read("t").collect())
    assert got == list(range(0, 40)) + list(range(100, 110))
    # expire must not choke on (or sweep) the adopted root-level files
    wh.write(spark.range(0, 5), "t")                        # v2 overwrite
    wh.expire_snapshots("t", keep_last=1)
    assert wh.read("t").count() == 5


def test_versioned_read_during_compact_iceberg_semantics(spark, tmp_path):
    """Iceberg contract: a reader planned against snapshot N keeps working
    while (and after) compaction commits N+1 — versioned compaction is a
    pointer flip, old data files stay live until expire_snapshots. The
    same reader breaks only after an explicit expire, never from the
    compact itself."""
    wh = Warehouse(spark, str(tmp_path / "rdc"), versioned=True)
    df = spark.range(0, 400).withColumnRenamed("id", "docid")
    wh.write(df, "t")
    wh.write(spark.range(400, 500).withColumnRenamed("id", "docid"),
             "t", mode="append")
    reader = wh.read("t")          # lazy plan pinned to snapshot v2 files
    stats = wh.compact("t", sort_cols=["docid"])
    assert wh.current_version("t") == 3
    # concurrent reader: still the exact pre-compact rows (old files live)
    assert reader.count() == 500
    # new reads see the compacted snapshot with identical content
    assert wh.read("t").count() == 500
    assert stats["files_before"] >= stats["files_after"]
    # time travel to the pre-compact snapshot still works
    assert wh.read("t", version=2).count() == 500


def test_versioned_commit_crash_points_leave_old_version_live(spark, tmp_path):
    """Iceberg hadoop-catalog commit contract: a crash at ANY point inside
    _commit leaves the previous version fully live — a half-commit is
    impossible. Each crash point is simulated by reproducing the exact
    on-disk state _commit would leave there."""
    import json as _json

    wh = Warehouse(spark, str(tmp_path / "cc"), versioned=True)
    df = spark.range(0, 50).withColumnRenamed("id", "docid")
    wh.write(df, "t")                 # v1 (committed baseline)
    base = str(tmp_path / "cc" / "t")
    man_dir = os.path.join(base, "_snapshots")
    fake = {"version": 2, "parent": 1, "mode": "overwrite", "ts": 0.0,
            "files": ["data/doesnotexist/x.parquet"]}

    # crash point A: manifest tmp written, never renamed
    with open(os.path.join(man_dir, "v000002.json.tmp"), "w") as f:
        _json.dump(fake, f)
    assert wh.current_version("t") == 1
    assert wh.read("t").count() == 50

    # crash point B: manifest renamed, pointer never updated — the new
    # manifest is unreferenced; reads stay on v1
    os.rename(os.path.join(man_dir, "v000002.json.tmp"),
              os.path.join(man_dir, "v000002.json"))
    assert wh.current_version("t") == 1
    assert wh.read("t").count() == 50

    # crash point C: pointer tmp written, never renamed — still v1
    with open(os.path.join(base, "_VERSION.tmp"), "w") as f:
        f.write("2")
    assert wh.current_version("t") == 1
    assert wh.read("t").count() == 50

    # the next REAL commit overwrites the stale artifacts and wins
    wh.write(df.limit(7), "t")
    assert wh.current_version("t") == 2
    assert wh.read("t").count() == 7


def test_unversioned_compact_every_crash_point_recovers(spark, tmp_path):
    """The plain-parquet two-rename swap: all three crash points heal on
    the next read()/compact() — stale .compacting is overwritten, a
    stranded .old is rolled back, a leftover .old after a completed swap
    is discarded."""
    import shutil

    wh = Warehouse(spark, str(tmp_path / "uc"))
    df = spark.range(0, 300).withColumnRenamed("id", "docid")
    wh.write(df, "t")
    path = str(tmp_path / "uc" / "t")

    # crash point 1: .compacting written, swap never started — live table
    # untouched; the next compact overwrites the stale staging dir
    shutil.copytree(path, path + ".compacting")
    assert wh.read("t").count() == 300
    wh.compact("t", sort_cols=["docid"])
    assert wh.read("t").count() == 300
    assert not os.path.exists(path + ".compacting")

    # crash point 2: first rename done, second never happened, with the
    # staging dir still present (the fullest crash state)
    shutil.copytree(path, path + ".compacting")
    os.rename(path, path + ".old")
    assert wh.read("t").count() == 300          # _recover rolls back .old
    assert os.path.exists(path)
    wh.compact("t", sort_cols=["docid"])        # stale staging overwritten
    assert wh.read("t").count() == 300

    # crash point 3: both renames done, .old cleanup never ran
    shutil.copytree(path, path + ".old")
    wh.compact("t", sort_cols=["docid"])
    assert wh.read("t").count() == 300
    assert not os.path.exists(path + ".old")
