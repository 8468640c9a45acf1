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

    def read(self, name: str) -> DataFrame:
        if self._iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(os.path.join(self.root, name))
