"""Event-sequence analytics over the events stream table.

Funnel and cohort-retention — the two canonical product-analytics
queries every event warehouse serves. Both are pure keyed-aggregation +
co-partitioned-join shapes: at 100 TB every stage hash-partitions on
``user_id`` (funnel) or on the cohort key (retention), with map-side
partial aggregation, and Catalyst reuses the user_id exchange across the
funnel's chained stages because every join and agg keys on it.

Timestamps are carried as epoch MICROSECONDS (BIGINT) in all outputs —
the engine's hash-gate contract bans raw timestamp columns (cross-engine
formatting drift); integer micros are exact and identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    window_hours: int = 72,
    user: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
) -> DataFrame:
    """(user_id, stage, t1_us, t2_us, ..., tN_us) — strict-order
    first-completion funnel: stage k is reached at the EARLIEST step-k
    event that is strictly after the user's stage-(k-1) time and within
    ``window_hours`` of their stage-1 time (the classic
    window-anchored-at-entry funnel). ``stage`` is the number of steps
    completed; users who never fire step 1 are absent; unreached step
    times are NULL.

    Shape: one filtered agg per step + one co-partitioned join per step,
    ALL keyed on ``user_id`` — a single exchange feeds the whole chain.
    Never a window over the full event stream: each stage pre-filters to
    its step's events before aggregating, so a 10^12-row stream with a
    rare step-3 event aggregates only the rare rows at stage 3."""
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    u, t, et = F.col(user), F.col(ts), F.col(event_type)
    ev = events.select(
        u.alias("user_id"), F.unix_micros(t.cast("timestamp")).alias("t_us"),
        et.alias("_et"),
    )
    win_us = window_hours * 3_600_000_000
    cur = (
        ev.filter(F.col("_et") == steps[0])
        .groupBy("user_id")
        .agg(F.min("t_us").alias("t1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("_et") == step)
            .join(cur.select("user_id", f"t{i - 1}_us", "t1_us"), "user_id")
            .filter(
                (F.col("t_us") > F.col(f"t{i - 1}_us"))
                & (F.col("t_us") <= F.col("t1_us") + F.lit(win_us))
            )
            .groupBy("user_id")
            .agg(F.min("t_us").alias(f"t{i}_us"))
        )
        cur = cur.join(nxt, "user_id", "left")
    stage = F.lit(1)
    for i in range(2, len(steps) + 1):
        stage = stage + F.when(
            F.col(f"t{i}_us").isNotNull(), F.lit(1)
        ).otherwise(F.lit(0))
    return cur.select(
        "user_id",
        stage.cast("long").alias("stage"),
        *[F.col(f"t{i}_us") for i in range(1, len(steps) + 1)],
    )


def funnel_sql(
    steps: list[str],
    window_hours: int = 72,
    table: str = "events",
    user: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
) -> str:
    """DuckDB mirror of :func:`funnel`."""
    win_us = window_hours * 3_600_000_000
    ctes = [
        f"""s1 AS (
  SELECT {user} AS user_id, min(epoch_us({ts}::TIMESTAMP)) AS t1_us
  FROM {table} WHERE {event_type} = '{steps[0]}' GROUP BY {user})""",
        "f1 AS (SELECT user_id, t1_us FROM s1)",
    ]
    for i, step in enumerate(steps[1:], start=2):
        prev_cols = ", ".join(f"t{j}_us" for j in range(1, i))
        ctes.append(
            f"""s{i} AS (
  SELECT e.{user} AS user_id, min(epoch_us(e.{ts}::TIMESTAMP)) AS t{i}_us
  FROM {table} e JOIN f{i - 1} f ON f.user_id = e.{user}
  WHERE e.{event_type} = '{step}'
    AND epoch_us(e.{ts}::TIMESTAMP) > f.t{i - 1}_us
    AND epoch_us(e.{ts}::TIMESTAMP) <= f.t1_us + {win_us}
  GROUP BY e.{user})"""
        )
        ctes.append(
            f"f{i} AS (SELECT f.user_id, {prev_cols}, s{i}.t{i}_us"
            f" FROM f{i - 1} f LEFT JOIN s{i} USING (user_id))"
        )
    n = len(steps)
    stage = " + ".join(
        ["1"]
        + [
            f"CASE WHEN t{i}_us IS NOT NULL THEN 1 ELSE 0 END"
            for i in range(2, n + 1)
        ]
    )
    cols = ", ".join(f"t{i}_us" for i in range(1, n + 1))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT user_id, ({stage})::BIGINT AS stage, {cols} FROM f{n}"
    )


def retention_cohorts(
    events: DataFrame,
    anchor_type: str,
    period_days: int = 7,
    max_periods: int = 8,
    user: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
) -> DataFrame:
    """(cohort, period, active_users) — classic cohort retention: users
    are cohorted by the period of their FIRST ``anchor_type`` event
    (period = floor(epoch_days / period_days), an absolute grid — no
    calendar arithmetic, so both engines agree exactly), and counted
    active in every later period in which they fire ANY event, up to
    ``max_periods`` after the cohort period (period 0 = the cohort
    period itself, so every cohort's period-0 count equals its size).

    Shape: one user-keyed agg for cohort assignment, one co-partitioned
    join back, one (cohort, period)-keyed distinct-count agg."""
    u, t, et = F.col(user), F.col(ts), F.col(event_type)
    pd_us = period_days * 86_400_000_000
    ev = events.select(
        u.alias("user_id"),
        F.unix_micros(t.cast("timestamp")).alias("_t_us"),
        et.alias("_et"),
    ).select(
        "user_id",
        # integer division (not double-divide-then-cast): exact at any
        # epoch magnitude, same floor semantics as DuckDB's // on the
        # all-positive domain
        F.expr(f"_t_us div {pd_us}").cast("long").alias("p"),
        "_et",
    )
    cohorts = (
        ev.filter(F.col("_et") == anchor_type)
        .groupBy("user_id")
        .agg(F.min("p").alias("cohort"))
    )
    return (
        ev.join(cohorts, "user_id")
        .filter(
            (F.col("p") >= F.col("cohort"))
            & (F.col("p") <= F.col("cohort") + max_periods)
        )
        .select("cohort", (F.col("p") - F.col("cohort")).alias("period"),
                "user_id")
        .distinct()
        .groupBy("cohort", "period")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


def retention_cohorts_sql(
    anchor_type: str,
    period_days: int = 7,
    max_periods: int = 8,
    table: str = "events",
    user: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
) -> str:
    """DuckDB mirror of :func:`retention_cohorts`."""
    pd_us = period_days * 86_400_000_000
    return f"""
WITH ev AS (
  SELECT {user} AS user_id,
         (epoch_us({ts}::TIMESTAMP) // {pd_us})::BIGINT AS p,
         {event_type} AS et
  FROM {table}
),
cohorts AS (
  SELECT user_id, min(p) AS cohort FROM ev
  WHERE et = '{anchor_type}' GROUP BY user_id
),
act AS (
  SELECT DISTINCT c.cohort, e.p - c.cohort AS period, e.user_id
  FROM ev e JOIN cohorts c USING (user_id)
  WHERE e.p >= c.cohort AND e.p <= c.cohort + {max_periods}
)
SELECT cohort, period, count(*)::BIGINT AS active_users
FROM act GROUP BY cohort, period
"""
