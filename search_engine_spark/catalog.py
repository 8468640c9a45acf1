"""Warehouse table IO — Iceberg when a catalog is configured, parquet
layout otherwise.

north_star: index tables (postings/terms/docs + lineage) commit to Iceberg
at production scale — atomic snapshot commits, partition pruning, schema
evolution. This container has no Iceberg runtime jar, so the SAME writer
abstraction degrades to a plain-parquet layout with identical schemas,
identical (sorted, range-partitioned) file layout, and overwrite-as-commit
semantics. Swapping to Iceberg is a session-conf change, not a code change:

    spark.sql.catalog.se            = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.se.type      = hadoop
    spark.sql.catalog.se.warehouse = <warehouse root>

then ``Warehouse(spark, root, iceberg_catalog="se")``.

Replaces the reference's custom KVS persistence (kvs/Worker.java: append
log + replay) with table commits.
"""

from __future__ import annotations

import os
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

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        """Commit ``df`` as table ``name``. Iceberg: an atomic snapshot
        (createOrReplace / append). Parquet: directory overwrite/append —
        the write is staged by Spark's commit protocol, so readers never
        see partial output."""
        if self._iceberg:
            writer = df.writeTo(self._ident(name)).using("iceberg")
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
        else:
            df.write.mode(mode).parquet(os.path.join(self.root, name))

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

    def read(self, name: str) -> DataFrame:
        if self._iceberg:
            return self.spark.read.table(self._ident(name))
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
