"""Warehouse table IO — Iceberg when a catalog is configured, parquet
layout otherwise.

north_star: index tables (postings/terms/docs + lineage) commit to Iceberg
at production scale — atomic snapshot commits, partition pruning, schema
evolution. This container has no Iceberg runtime jar, so the SAME writer
abstraction degrades to a plain-parquet layout with identical schemas,
identical (sorted, range-partitioned) file layout, and overwrite-as-commit
semantics. ``versioned=True`` additionally provides the snapshot-commit
contract WITHOUT the jar: every write is a JSON file manifest + an atomic
``_VERSION`` pointer flip (Iceberg's hadoop-catalog commit shape) — time
travel via ``read(name, version=N)``, ``snapshots()`` lineage,
``expire_snapshots()`` retention, append without rewrite, and compaction
as a pointer flip with no crash window. Swapping to Iceberg is a session-conf change, not a code change:

    spark.sql.catalog.se            = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.se.type      = hadoop
    spark.sql.catalog.se.warehouse = <warehouse root>

then ``Warehouse(spark, root, iceberg_catalog="se")``.

Replaces the reference's custom KVS persistence (kvs/Worker.java: append
log + replay) with table commits.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True iff ``catalog`` is configured AND its implementation class is
    loadable in this JVM (the runtime jar is actually on the classpath)."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(impl)
        return True
    except Exception:
        return False


@dataclass
class Warehouse:
    """One index warehouse: named tables under ``root``.

    ``iceberg_catalog=None`` (or an unconfigured/unloadable catalog) uses
    the parquet layout (``root/<table>/``) — byte-compatible with what
    operators/indexer.py writes and operators/query.py reads.
    """

    spark: SparkSession
    root: str
    iceberg_catalog: str | None = None
    versioned: bool = False

    def __post_init__(self) -> None:
        self._iceberg = bool(
            self.iceberg_catalog
            and iceberg_available(self.spark, self.iceberg_catalog)
        )

    @property
    def uses_iceberg(self) -> bool:
        return self._iceberg

    def _ident(self, name: str) -> str:
        ns = os.path.basename(self.root.rstrip("/")) or "idx"
        return f"{self.iceberg_catalog}.{ns}.{name}"

    # -- snapshot plumbing (parquet path; Iceberg has its own) ------------

    def _ptr_path(self, name: str) -> str:
        return os.path.join(self.root, name, "_VERSION")

    def _manifest_path(self, name: str, version: int) -> str:
        return os.path.join(
            self.root, name, "_snapshots", f"v{version:06d}.json"
        )

    def current_version(self, name: str) -> int | None:
        """Committed snapshot id of a versioned table, else None."""
        try:
            with open(self._ptr_path(name)) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def _manifest(self, name: str, version: int) -> dict:
        with open(self._manifest_path(name, version)) as f:
            return json.load(f)

    def _commit(self, name: str, manifest: dict) -> None:
        """Two-step atomic commit: manifest file first (content-complete
        before it becomes visible: written to a tmp name, then renamed),
        then the _VERSION pointer the same way. A crash anywhere leaves
        either the old version fully live or the new one — never a
        half-commit (the unreferenced data/manifest files are swept by
        :meth:`expire_snapshots`). Single-writer per table, like an
        Iceberg hadoop catalog's rename-based commit."""
        mpath = self._manifest_path(name, manifest["version"])
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, mpath)
        ptr, ptmp = self._ptr_path(name), self._ptr_path(name) + ".tmp"
        with open(ptmp, "w") as f:
            f.write(str(manifest["version"]))
        os.rename(ptmp, ptr)

    def snapshots(self, name: str) -> list[dict]:
        """All committed snapshot manifests of ``name`` (ascending), up to
        the current pointer — lineage metadata for audits and rollbacks."""
        cur = self.current_version(name)
        if cur is None:
            return []
        out = []
        for v in range(1, cur + 1):
            try:
                out.append(self._manifest(name, v))
            except OSError:
                continue  # expired
        return out

    def expire_snapshots(self, name: str, keep_last: int = 2) -> dict:
        """Drop all but the ``keep_last`` newest snapshots and delete data
        files no remaining snapshot references (Iceberg's
        expire_snapshots action). Also sweeps orphan data dirs left by a
        crash before commit. Returns {manifests_dropped, dirs_dropped}."""
        import shutil

        cur = self.current_version(name)
        if cur is None:
            return {"manifests_dropped": 0, "dirs_dropped": 0}
        keep_from = max(1, cur - keep_last + 1)
        dropped = 0
        for v in range(1, keep_from):
            try:
                os.remove(self._manifest_path(name, v))
                dropped += 1
            except OSError:
                pass
        live: set[str] = set()
        for v in range(keep_from, cur + 1):
            try:
                live |= {
                    f.split("/", 2)[1]  # data/<dir>/file.parquet
                    for f in self._manifest(name, v)["files"]
                    if f.startswith("data/")  # adopted legacy files sit
                    # at the table root and are never swept
                }
            except OSError:
                pass
        data_root = os.path.join(self.root, name, "data")
        gone = 0
        for d in os.listdir(data_root) if os.path.isdir(data_root) else []:
            if d not in live:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                gone += 1
        return {"manifests_dropped": dropped, "dirs_dropped": gone}

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        """Commit ``df`` as table ``name``. Iceberg: an atomic snapshot
        (createOrReplace / append). Parquet, ``versioned=False``:
        directory overwrite/append — staged by Spark's commit protocol, so
        readers never see partial output. Parquet, ``versioned=True``:
        an Iceberg-style snapshot commit — data files land under
        ``<table>/data/<uuid>/``, a JSON manifest lists every live file
        (``append`` = parent's files + the new ones: no rewrite), and the
        ``_VERSION`` pointer flips atomically; old snapshots stay readable
        via ``read(name, version=...)`` until expired."""
        if self._iceberg:
            writer = df.writeTo(self._ident(name)).using("iceberg")
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
            return
        cur = self.current_version(name)
        # auto-detect like read(): once a table is versioned, every commit
        # goes through the snapshot protocol even if this handle didn't
        # set the flag — mixing layouts would corrupt the table.
        if not self.versioned and cur is None:
            df.write.mode(mode).parquet(os.path.join(self.root, name))
            return
        ddir = f"s{(cur or 0) + 1}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.root, name, "data", ddir)
        df.write.mode("overwrite").parquet(out)
        files = sorted(
            f"data/{ddir}/{f}" for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        if mode == "append":
            if cur is not None:
                files = self._manifest(name, cur)["files"] + files
            else:
                # first snapshot commit onto a PRE-EXISTING plain-parquet
                # table: adopt its files into the manifest — dropping them
                # (the naive cur-is-None path) would silently lose every
                # pre-migration row on an append.
                tdir = os.path.join(self.root, name)
                legacy = sorted(
                    f for f in os.listdir(tdir) if f.endswith(".parquet")
                ) if os.path.isdir(tdir) else []
                files = legacy + files
        self._commit(
            name,
            {
                "version": (cur or 0) + 1,
                "parent": cur,
                "mode": mode,
                "ts": time.time(),
                "files": files,
            },
        )

    def _recover(self, name: str) -> None:
        """Heal the parquet-path swap's crash window: ``compact`` renames
        ``path → path.old`` then ``path.compacting → path``; a crash
        between the two leaves no live table. If ``path`` is missing but
        ``path.old`` exists, roll back (the .compacting copy, when
        complete, is equivalent — but .old is always a known-good full
        table, so restoring it is the safe choice either way)."""
        if self._iceberg:
            return
        path = os.path.join(self.root, name)
        old = path + ".old"
        if not os.path.exists(path) and os.path.exists(old):
            os.rename(old, path)

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Read table ``name``; versioned tables are AUTO-DETECTED by the
        ``_VERSION`` pointer, so readers need no flag and time travel is
        ``read(name, version=N)`` (any unexpired snapshot)."""
        if self._iceberg:
            if version is not None:
                raise NotImplementedError(
                    "Iceberg time travel goes through the catalog: "
                    "SELECT ... FROM t VERSION AS OF <snapshot_id> "
                    "(snapshot ids differ from Warehouse manifest versions)"
                )
            return self.spark.read.table(self._ident(name))
        cur = self.current_version(name)
        if cur is not None:
            m = self._manifest(name, version if version is not None else cur)
            base = os.path.join(self.root, name)
            return self.spark.read.parquet(
                *[os.path.join(base, f) for f in m["files"]]
            )
        if version is not None:
            raise ValueError(f"table {name!r} is not versioned")
        self._recover(name)
        return self.spark.read.parquet(os.path.join(self.root, name))

    def compact(
        self, name: str, sort_cols: list[str], target_mb: int = 256
    ) -> dict:
        """Small-file compaction: rewrite table ``name`` into
        ``ceil(bytes/target_mb)`` range-partitioned files sorted by
        ``sort_cols`` — the same pruning layout the build writes, fewer
        files. Streaming ingest and chunked builds fragment tables (each
        merge level / chunk commit leaves its own small files); at scale
        that throttles scan planning and object-store reads. Iceberg:
        this is the ``rewrite_data_files`` action (createOrReplace
        snapshot). Parquet: staged rewrite + two-rename directory swap —
        a crash inside the swap window strands the table at
        ``<path>.old``, which :meth:`read`/:meth:`compact` roll back
        automatically on the next call (see ``_recover``). Returns
        {files_before, files_after, bytes}."""
        import math
        import shutil

        cur = self.current_version(name)
        if cur is not None:
            # versioned table: compaction is just another snapshot commit
            # (pointer flip) — NO directory swap, NO crash window at all.
            base = os.path.join(self.root, name)
            m = self._manifest(name, cur)
            nbytes = sum(
                os.path.getsize(os.path.join(base, f)) for f in m["files"]
            )
            n_out = max(1, math.ceil(nbytes / (target_mb << 20)))
            out = self.read(name).repartitionByRange(
                n_out, *sort_cols
            ).sortWithinPartitions(*sort_cols)
            before = len(m["files"])
            self.write(out, name, mode="overwrite")
            after = len(self._manifest(name, cur + 1)["files"])
            return {"files_before": before, "files_after": after,
                    "bytes": nbytes}

        self._recover(name)
        df = self.read(name)
        if self._iceberg:
            nbytes = None
            n_out = max(1, df.rdd.getNumPartitions() // 8)
        else:
            path = os.path.join(self.root, name)
            files = [
                os.path.join(dp, f)
                for dp, _dn, fn in os.walk(path)
                for f in fn
                if f.endswith(".parquet")
            ]
            nbytes = sum(os.path.getsize(f) for f in files)
            n_out = max(1, math.ceil(nbytes / (target_mb << 20)))
        before = len(files) if not self._iceberg else None
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
        if self._iceberg:
            out.writeTo(self._ident(name)).using("iceberg").createOrReplace()
            return {"files_before": before, "files_after": None,
                    "bytes": nbytes}
        tmp = path + ".compacting"
        out.write.mode("overwrite").parquet(tmp)
        old = path + ".old"
        shutil.rmtree(old, ignore_errors=True)  # stale leftover from a
        # crash AFTER a completed earlier swap — path is live, drop it
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        after = sum(
            1
            for dp, _dn, fn in os.walk(path)
            for f in fn
            if f.endswith(".parquet")
        )
        return {"files_before": before, "files_after": after, "bytes": nbytes}
