"""Similarity search over embedding columns (array<float>).

Three tiers:

* ``cosine_topk`` — brute-force exact top-k against one query vector:
  a single narrow scan, dot/norm computed with array built-ins
  (``zip_with`` + ``aggregate``) entirely JVM-side; ``ORDER BY … LIMIT k``
  compiles to TakeOrderedAndProject (no global sort materialization).
* ``knn_join`` — exact k-NN for a (small, broadcast) set of query rows
  against the corpus: broadcast-join + per-query window top-k.
* ``lsh_hyperplane_*`` — the 100 TB path: deterministic random-hyperplane
  (sign-LSH) bucketing; candidates = bucket join, verified by exact cosine.
  Hyperplane components are md5-derived ±1 (functions/hashing.py) so the
  whole pipeline is reproducible across engines.

All cosines are rounded to 6 dp before ranking (cross-engine float-sum
stability), ties broken by id ascending.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from search_engine_spark.functions.hashing import md5_int32, md5_int32_py

COS_DECIMALS = 6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), COS_DECIMALS)


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_id: str = "vec_id",
    vec: str = "embedding",
    exclude_self: int | None = None,
) -> DataFrame:
    """(vec_id, cos) — exact top-k by cosine to ``query_vec``."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = emb.select(
        F.col(vec_id).alias("vec_id"),
        cosine_col(F.col(vec), q).alias("cos"),
    )
    if exclude_self is not None:
        out = out.filter(F.col("vec_id") != exclude_self)
    return out.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)


def knn_join(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, cos, rank) — exact k nearest neighbours for each query
    id (excluding self). The query side is broadcast (small by contract);
    ranking is a per-query window over the scored scan."""
    q = emb.filter(F.col(vec_id).isin(query_ids)).select(
        F.col(vec_id).alias("qid"), F.col(vec).alias("qvec")
    )
    scored = (
        emb.select(F.col(vec_id).alias("vec_id"), F.col(vec).alias("v"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            cosine_col(F.col("v"), F.col("qvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "cos", "rank")
    )


def cosine_near_pairs(
    emb: DataFrame,
    threshold: float,
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """(a, b, cos) — EXACT all pairs with cosine ≥ threshold (embedding
    near-duplicate detection). Inherently quadratic: the exact verifier /
    small-table path; ``cosine_near_pairs_lsh`` is the bucketed scale
    path. cos rounded to 6 dp; pairs ordered a < b."""
    a = emb.select(F.col(vec_id).alias("a"), F.col(vec).alias("va"))
    b = emb.select(F.col(vec_id).alias("b"), F.col(vec).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine_col(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def cosine_near_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 32,
    max_hamming: int = 2,
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Bucketed near-pair scale path: sign-LSH signatures (deterministic
    hyperplanes), candidates = pairs agreeing exactly on ≥1 of
    ``max_hamming+1`` signature bit-bands (pigeonhole: covers every pair
    within that signature hamming distance), verified by EXACT cosine ≥
    threshold. Precision is exact; recall is the standard LSH trade
    (pairs whose signatures differ in > max_hamming bits are missed) and
    rises with n_planes/max_hamming. Cost ∝ bucket sizes, not corpus².

    Default n_planes=32 (signatures are cheap: one dot per plane) so the
    default band keys are 10-12 bits wide — r2's n_planes=8 default gave
    2-4-bit bands = 4-16 buckets per band, which degenerates toward the
    cartesian join at corpus scale. Keep ``n_planes // (max_hamming+1)``
    ≥ 8 bits when tuning. Signatures are localCheckpoint'ed: the banded
    union references them 2(max_hamming+1) times."""
    sigs = lsh_signature(emb, dim, n_planes, vec_id, vec).localCheckpoint()
    nbands = max_hamming + 1
    width = max(1, n_planes // nbands)
    parts = []
    for bnd in range(nbands):
        shift = bnd * width
        w = width if bnd < nbands - 1 else n_planes - shift
        mask = (1 << w) - 1
        parts.append(
            sigs.select(
                "vec_id",
                "v",
                F.lit(bnd).alias("band"),
                F.shiftright(F.col("sig"), shift)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
        )
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)
    left = banded.select(
        "band", "key", F.col("vec_id").alias("a"), F.col("v").alias("va")
    )
    right = banded.select(
        "band", "key", F.col("vec_id").alias("b"), F.col("v").alias("vb")
    )
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb")
        .distinct()
        .select("a", "b", cosine_col(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# Sign-LSH (random hyperplanes) — the approximate scale path
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: component (p, i) = sign of an md5 bit."""
    planes = []
    for p in range(n_planes):
        h = [1.0 if (md5_int32_py(f"{p}:{i}", seed="plane") & 1) else -1.0 for i in range(dim)]
        planes.append(h)
    return planes


def lsh_signature(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """(vec_id, sig) — sign-LSH bucket id: bit p = 1 iff v · plane_p > 0."""
    planes = hyperplanes(dim, n_planes)
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        pc = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(F.col("v"), pc) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = sig + bit.cast("long")
    return emb.select(
        F.col(vec_id).alias("vec_id"), F.col(vec).alias("v")
    ).withColumn("sig", sig)


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_id: str = "vec_id",
    vec: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe), then exact
    cosine within candidates. ~2^-planes of the corpus scanned per probe."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qsig = 0
    for p, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            qsig |= 1 << p
    probes = {qsig}
    if probe_hamming >= 1:
        for p in range(n_planes):
            probes.add(qsig ^ (1 << p))
    sigs = lsh_signature(emb, dim, n_planes, vec_id, vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        sigs.filter(F.col("sig").isin(list(probes)))
        .select(F.col("vec_id"), cosine_col(F.col("v"), q).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant: coarse quantize to the nearest of C pivots
# ---------------------------------------------------------------------------

def _ivf_cell_col(
    vec: Column, pivots: list[tuple[int, list[float]]]
) -> Column:
    """Nearest-pivot (by cosine) cell id as a codegen'd Column — the
    greatest-of-struct trick keeps the argmax JVM-side; ties break to the
    lowest cell id."""
    best = None
    for cid, pv in pivots:
        pc = F.array(*[F.lit(float(x)) for x in pv])
        cand = F.struct(
            cosine_col(vec, pc).alias("cos"),
            F.lit(-cid).alias("negid"),
        )
        best = cand if best is None else F.greatest(best, cand)
    return (-best.getField("negid")).cast("int")


# Above this pivot count the nested greatest(struct(cos,…)) expression —
# k inlined cosines in ONE projection — blows up codegen; the broadcast
# join + max-struct aggregation below scales to thousands of cells.
IVF_CODEGEN_MAX_PIVOTS = 64


def ivf_assign(
    emb: DataFrame,
    pivots: list[tuple[int, list[float]]],
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """(vec_id, cell): nearest-pivot (by cosine) coarse assignment.

    Pivots are (cell_id, vector) — at scale they come from
    :func:`kmeans_pivots`; any deterministic pivot set works (e.g. first C
    vectors). Small pivot sets inline the argmax as one codegen'd
    expression; larger ones broadcast the pivot table and reduce with a
    max-of-struct aggregation (identical tie-break: lowest cell id), so
    IVF cell counts in the thousands stay off the codegen cliff."""
    if len(pivots) <= IVF_CODEGEN_MAX_PIVOTS:
        return emb.select(
            F.col(vec_id).alias("vec_id"),
            _ivf_cell_col(F.col(vec), pivots).alias("cell"),
        )
    spark = emb.sparkSession
    pv = spark.createDataFrame(
        [(int(cid), [float(x) for x in v]) for cid, v in pivots],
        "cid int, pv array<double>",
    )
    scored = (
        emb.select(F.col(vec_id).alias("vec_id"), F.col(vec).alias("v"))
        .crossJoin(F.broadcast(pv))
        .select(
            "vec_id",
            F.struct(
                cosine_col(F.col("v"), F.col("pv")).alias("cos"),
                (-F.col("cid")).alias("negid"),
            ).alias("cand"),
        )
    )
    return scored.groupBy("vec_id").agg(
        (-F.max("cand").getField("negid")).cast("int").alias("cell")
    )


def kmeans_pivots(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Distributed spherical k-means — the IVF pivot trainer for real
    scale (Lloyd's iterations as DataFrame jobs, not a driver loop over
    vectors).

    Init = the k lowest-``vec_id`` rows (deterministic). Per iteration:
    assignment is the codegen'd argmin (:func:`_ivf_cell_col`, no shuffle),
    and the centroid update is ONE partial-aggregated shuffle keyed on
    (cell, dim) via posexplode → sum/count; only k×dim means ever reach
    the driver. Cosine is scale-invariant so the un-normalized cell mean
    is a valid spherical centroid. Empty cells keep their previous pivot.
    Centroid components round to 6 dp (cross-partitioning float-sum
    stability)."""
    rows = emb.orderBy(F.col(vec_id).asc()).limit(k).collect()
    cents: dict[int, list[float]] = {
        i: [float(x) for x in r[vec]] for i, r in enumerate(rows)
    }
    for _ in range(iters):
        pivots = sorted(cents.items())
        if len(pivots) <= IVF_CODEGEN_MAX_PIVOTS:
            # two-step select: posexplode's multi-alias in the same
            # projection as the greatest-of-struct argmax breaks struct
            # field resolution
            assigned = emb.select(
                _ivf_cell_col(F.col(vec), pivots).alias("cell"),
                F.col(vec).alias("v"),
            )
        else:
            # thousands of cells: same broadcast-join argmax as
            # ivf_assign — keeps the assignment off the codegen cliff
            assigned = (
                ivf_assign(emb, pivots, vec_id, vec)
                .join(
                    emb.select(
                        F.col(vec_id).alias("vec_id"), F.col(vec).alias("v")
                    ),
                    "vec_id",
                )
                .select("cell", "v")
            )
        stats = (
            assigned
            .select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum(F.col("val").cast("double")).alias("s"),
                 F.count("*").alias("n"))
            .collect()
        )
        for r in stats:
            cents[int(r["cell"])][int(r["pos"])] = round(
                r["s"] / r["n"], 6
            )
    return sorted(cents.items())


def ivf_topk(
    emb: DataFrame,
    pivots: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k scanning only the ``nprobe`` cells nearest the
    query. Exact cosine within the probed cells."""
    qcos = sorted(
        (
            (
                sum(a * b for a, b in zip(query_vec, pv))
                / (
                    (sum(a * a for a in query_vec) ** 0.5)
                    * (sum(b * b for b in pv) ** 0.5)
                ),
                cid,
            )
            for cid, pv in pivots
        ),
        key=lambda t: (-t[0], t[1]),
    )
    probe_cells = [cid for _c, cid in qcos[:nprobe]]
    assigned = ivf_assign(emb, pivots, vec_id, vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(F.col(vec_id).alias("vec_id"), F.col(vec).alias("v"))
        .join(assigned.filter(F.col("cell").isin(probe_cells)), "vec_id")
        .select("vec_id", cosine_col(F.col("v"), q).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
    )
