"""Sampling operators (Flame op #14, reference flame/Worker.java:136-172:
per-row Bernoulli keep with probability f).

Two variants:

* ``spark_sample`` — the engine-native path: ``df.sample(fraction, seed)``
  (Bernoulli split per partition, Spark's own RNG). Statistically correct
  and fast, but the accept set depends on partitioning, so it is verified
  statistically (count tolerance + subset) in pytest, not value-hashed
  against an oracle.
* ``bernoulli_sample`` — hash-Bernoulli: keep a row iff
  ``md5(seed:key) mod 10^6 < fraction * 10^6``. I.i.d. per key,
  deterministic across engines and partitionings — the gate-checkable
  variant, and the variant you want at 10^12 rows anyway (resumable +
  reproducible regardless of cluster layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from search_engine_spark.functions.hashing import md5_int, md5_int_sql

SCALE = 1_000_000


def bernoulli_keep_col(key: Column, fraction: float, seed: int | str) -> Column:
    return (md5_int(key.cast("string"), seed=seed) % SCALE) < int(
        fraction * SCALE
    )


def bernoulli_sample(
    df: DataFrame, fraction: float, seed: int | str, key: str
) -> DataFrame:
    """Deterministic hash-Bernoulli sample on ``key``."""
    return df.filter(bernoulli_keep_col(F.col(key), fraction, seed))


def bernoulli_sample_sql(
    fraction: float, seed: int | str, key: str
) -> str:
    """DuckDB WHERE-clause mirror of ``bernoulli_sample``."""
    h = md5_int_sql(f"CAST({key} AS VARCHAR)", seed=seed)
    return f"({h} % {SCALE}) < {int(fraction * SCALE)}"


def spark_sample(
    df: DataFrame, fraction: float, seed: int = 42
) -> DataFrame:
    """Native ``df.sample`` (Bernoulli, seeded)."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    seed: int | str,
    key: str,
    strata: str,
) -> DataFrame:
    """Deterministic per-stratum hash-Bernoulli sample (the downsampling
    primitive of corpus curation: e.g. keep 10% of English, 100% of
    low-resource languages). Same engine-portable keep rule as
    :func:`bernoulli_sample`, with the fraction selected per stratum via a
    literal CASE — strata absent from ``fractions`` are dropped. Fully
    mirrorable in SQL (:func:`stratified_sample_sql`); the native
    ``df.sampleBy`` equivalent is exercised in pytest (partitioning-
    dependent RNG, statistically verified)."""
    h = md5_int(F.col(key).cast("string"), seed=seed) % SCALE
    cond = F.lit(False)
    for s, frac in sorted(fractions.items()):
        cond = cond | (
            (F.col(strata) == s) & (h < int(frac * SCALE))
        )
    return df.filter(cond)


def stratified_sample_sql(
    fractions: dict[str, float], seed: int | str, key: str, strata: str
) -> str:
    """DuckDB WHERE-clause mirror of :func:`stratified_sample`."""
    h = f"({md5_int_sql(f'CAST({key} AS VARCHAR)', seed=seed)} % {SCALE})"
    parts = [
        f"({strata} = '{s}' AND {h} < {int(frac * SCALE)})"
        for s, frac in sorted(fractions.items())
    ]
    return "(" + " OR ".join(parts) + ")"


def split_assign(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    seed: int | str = "split",
) -> DataFrame:
    """df + ``split`` column — deterministic train/val/test assignment.

    Every dataset release needs a split that is (a) reproducible bit-for-
    bit across reruns and cluster layouts, (b) stable under appends (a
    row's split never changes when other rows arrive), and (c) free of
    the partitioning dependence of ``randomSplit``. Hash-partition the
    unit interval: u = md5(seed:key) mod 10^6, assign the first split
    whose cumulative weight bound exceeds u (splits ordered by name for
    determinism). Weights must sum to ~1; the last split absorbs
    remainder. Pure map stage — no shuffle, survives any scale."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = md5_int(F.col(key).cast("string"), seed=seed) % SCALE
    names = sorted(weights)
    expr = F.lit(names[-1])
    cum = 0.0
    bounds = []
    for name in names[:-1]:
        cum += weights[name]
        bounds.append((name, int(cum * SCALE)))
    for name, b in reversed(bounds):
        expr = F.when(h < b, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def split_assign_sql(
    key: str, weights: dict[str, float], seed: int | str = "split"
) -> str:
    """DuckDB CASE-expression mirror of :func:`split_assign`."""
    h = f"({md5_int_sql(f'CAST({key} AS VARCHAR)', seed=seed)} % {SCALE})"
    names = sorted(weights)
    if len(names) == 1:  # CASE with zero WHENs is invalid SQL
        return f"'{names[0]}'"
    clauses = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        clauses.append(f"WHEN {h} < {int(cum * SCALE)} THEN '{name}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{names[-1]}' END"


def weighted_sample(
    df: DataFrame, key: str, weight: Column, seed: int | str = "wsample"
) -> DataFrame:
    """Per-row weighted hash-Bernoulli keep: row survives iff
    ``hash_uniform(key) < weight`` where ``weight`` is a Column in [0, 1].

    The training-mix primitive: continuous per-document keep probabilities
    (quality-, length-, or domain-derived) instead of a single fraction —
    deterministic across engines, partitionings, and reruns, stable under
    appends (a new row never flips an old row's verdict). The threshold is
    materialised as ``floor(weight * SCALE)`` so both engines compare the
    same integers (double→int casts round differently across engines;
    floor does not). Pure map-side filter: no shuffle at any scale."""
    thresh = F.floor(weight * F.lit(SCALE)).cast("long")
    return df.filter(
        (md5_int(F.col(key).cast("string"), seed=seed) % SCALE) < thresh
    )


def weighted_sample_sql(
    key: str, weight_expr: str, seed: int | str = "wsample"
) -> str:
    """DuckDB WHERE-clause mirror of :func:`weighted_sample`."""
    h = md5_int_sql(f"CAST({key} AS VARCHAR)", seed=seed)
    return (
        f"({h} % {SCALE}) < "
        f"CAST(floor(({weight_expr}) * {SCALE}) AS BIGINT)"
    )
