"""As-of join — a time-series operator Spark's DataFrame API lacks.

``asof_join(left, right)`` matches every left row to the LATEST right row
with ``right.on <= left.on`` within the same ``by`` key (the classic
point-in-time join: order→latest-quote, event→most-recent-session).

Plan shape (declarative, no Python): both sides are tagged and unioned
with the left row packed into one struct and the right payload into
another; a single ``last(_r, ignorenulls=True)`` carry-forward window over
(``by`` key, ordered by time with right-before-left on ties) attaches the
match; filtering back to left rows unpacks both structs. ONE shuffle
(hash by key) + one within-partition sort — the same cost envelope as
sessionization, and the same skew posture (a hot key sorts in one task;
salt or range-bucket hot keys upstream at 100 TB).

Determinism: right rows tying on (by, on) resolve to the greatest
``tiebreak`` column value — mirror an external oracle by deduplicating its
right side the same way (e.g. DuckDB ``ASOF JOIN`` after a
``row_number() ... ORDER BY tiebreak DESC = 1`` qualify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    value_cols: tuple[str, ...] = ("event_id", "value"),
    prefix: str = "r_",
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + ``prefix``-renamed right
    ``value_cols`` of the latest right row at-or-before the left row's
    ``on`` time (nulls when no prior right row exists)."""
    tiebreak = tiebreak or value_cols[0]
    rtypes = dict(right.dtypes)
    r_struct_t = "struct<" + ", ".join(
        f"{c}:{rtypes[c]}" for c in value_cols
    ) + ">"
    l_side = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    ltypes = dict(left.dtypes)
    l_struct_t = "struct<" + ", ".join(
        f"{c}:{ltypes[c]}" for c in left.columns
    ) + ">"
    r_side = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(l_struct_t).alias("_l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    u = l_side.unionByName(r_side)
    # right rows order before left at the same instant (<= semantics);
    # among tied right rows the LAST in (tiebreak asc) order wins
    w = (
        Window.partitionBy("_by")
        .orderBy(
            F.col("_ts").asc(),
            F.col("_tag").asc(),
            F.col("_r").getField(tiebreak).asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(prefix + c) for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    by: str = "user_id",
    bucket_seconds: int = 3600,
    value_cols: tuple[str, ...] = ("session_id",),
    prefix: str = "r_",
) -> DataFrame:
    """Interval-containment join: left rows matched to every right
    interval with ``start <= on <= end`` on the same ``by`` key.

    Spark plans a bare inequality join as a broadcast-nested-loop (or
    cartesian) — quadratic at scale. This operator makes it an EQUI-join:
    time is chunked into ``bucket_seconds`` buckets, each interval
    explodes to the buckets it covers, each left row maps to its single
    bucket, and the join runs hash-partitioned on (by, bucket) with the
    exact containment predicate as a post-filter. Cost ∝ rows +
    interval-length/bucket (choose the bucket near the typical interval
    length); a (left, interval) pair meets in exactly one bucket — the
    left row's own — so no dedup pass is needed."""
    b = F.lit(bucket_seconds)

    def secs(df: DataFrame, col: str):
        # timestamps can't cast straight to long (Spark 4); numerics can
        dt = dict(df.dtypes)[col]
        c = F.col(col)
        return F.unix_timestamp(c) if dt.startswith("timestamp") else c.cast("long")

    lb = left.withColumn("_b", F.floor(secs(left, on) / b))
    rb = right.select(
        F.col(by).alias("_rby"),
        F.col(start).alias("_start"),
        F.col(end).alias("_end"),
        F.floor(secs(right, start) / b).alias("_b0"),
        F.floor(secs(right, end) / b).alias("_b1"),
        *[F.col(c).alias(prefix + c) for c in value_cols],
    ).withColumn(
        "_b", F.explode(F.sequence(F.col("_b0"), F.col("_b1")))
    ).drop("_b0", "_b1")
    cond = (lb[by] == rb["_rby"]) & (lb["_b"] == rb["_b"])
    return (
        lb.join(rb, cond)
        .filter(
            (F.col(on) >= F.col("_start")) & (F.col(on) <= F.col("_end"))
        )
        .select(*left.columns, *[prefix + c for c in value_cols])
    )
