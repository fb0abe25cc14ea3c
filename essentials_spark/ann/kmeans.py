"""Lloyd k-means over an embedding column — cluster assignment as a
gated, SQL-replayable operator.

The clustering sibling of ann/cosine.py's IVF coarse quantizer (whose
``train_iters`` path is a Spark-only refinement): deterministic
seeding (the k smallest ids), a fixed number of Lloyd iterations, and
centroids rounded to a 1e-6 grid after every update so the DuckDB
oracle replays the exact trajectory (grid rounding absorbs the
sum-order FP noise of the mean aggregates — the PR_CONV_TOL-style
margin argument; measured margins live in the gate docstring).

Scale shape (the reason this is NOT a thin MLlib call): per
iteration,

- assignment is pure codegen — the k×d centroid matrix is collected
  to the driver (tiny) and inlined as array literals; each row folds
  k squared-L2 distances via zip_with/aggregate and takes
  array_min of (d2, cid) structs. No shuffle, no UDF, no k×n join.
- the update is ONE shuffle: groupBy(cluster) with d avg aggregates
  (the _ivf_cells training idiom), never an n×d explode.

Empty clusters keep their previous centroid (both engines replay the
same rule). k and d are bounded driver-side state; corpus size only
flows through the two scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(v, c_lits):
    return F.aggregate(
        F.zip_with(v, c_lits, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_expr(v, centroids: list[list[float]]):
    """(cluster) = argmin_c ||v - c||^2, ties to the smaller cid —
    the (d2, cid) struct array_min comparator, matching the oracle's
    ORDER BY d2, cid."""
    scored = F.array(
        *[
            F.struct(
                _sq_dist(v, F.array(*[F.lit(float(x)) for x in c])).alias("d2"),
                F.lit(j).alias("cid"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    return F.array_min(scored)["cid"]


def kmeans(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """Returns (id_col, cluster int) under the centroids after
    ``iters`` Lloyd updates from the deterministic seed (vectors of
    the k smallest ids, in id order => cid 0..k-1)."""
    dim_row = emb.select(F.size(vec_col)).first()
    if dim_row is None:
        raise ValueError("kmeans: empty input")
    dim = dim_row[0]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    rows = emb.select(F.col(id_col).alias("_id"), v.alias("v")).persist()

    seeds = rows.orderBy("_id").limit(k).collect()
    centroids = [[float(x) for x in r["v"]] for r in seeds]

    for _ in range(iters):
        assigned = rows.withColumn("cluster", _assign_expr(F.col("v"), centroids))
        means = (
            assigned.groupBy("cluster")
            .agg(*[F.round(F.avg(F.col("v")[i]), round_decimals).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        for r in means:  # empty clusters keep their old centroid
            centroids[r["cluster"]] = [float(r[f"m{i}"]) for i in range(dim)]

    out = rows.select(
        F.col("_id").alias(id_col),
        _assign_expr(F.col("v"), centroids).cast("int").alias("cluster"),
    )
    rows.unpersist()
    return out


def kmeans_cost(
    emb: DataFrame,
    assignments: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster sum-of-squares per cluster given an assignment
    (1 row per cluster: cluster, n, wcss) — the elbow-curve statistic.
    One join + one shuffle; centroids recomputed exactly from the
    assignment (no drift vs a stale centroid table)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dim = emb.select(F.size(vec_col)).first()[0]
    joined = emb.select(F.col(id_col), v.alias("v")).join(assignments, id_col)
    cent = joined.groupBy("cluster").agg(
        F.count("*").alias("n"),
        *[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)],
    )
    rejoined = joined.join(cent, "cluster")
    d2 = None
    for i in range(dim):
        term = (F.col("v")[i] - F.col(f"m{i}")) * (F.col("v")[i] - F.col(f"m{i}"))
        d2 = term if d2 is None else d2 + term
    return (
        rejoined.select("cluster", d2.alias("d2"))
        .groupBy("cluster")
        .agg(F.count("*").alias("n"), F.sum("d2").alias("wcss"))
    )


def pq_codes(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization: split each d-dim vector into ``m``
    contiguous sub-vectors, train an independent k-means codebook per
    subspace (the same deterministic Lloyd trajectory as kmeans()),
    and emit the per-subspace cluster ids as integer codes
    (id_col, code0..code{m-1}).

    The compressed-ANN path at 10^11-vector scale: codes are m bytes
    per vector instead of 4d, and asymmetric-distance search scans
    codes against a k×m lookup table. Codebook training cost is
    m × iters narrow aggregates; assignment is pure codegen (the
    inlined-centroid argmin kmeans() uses) — no shuffle touches the
    full vectors beyond the training means.

    Deterministic end-to-end (seeds = k smallest ids, 1e-6 centroid
    grid, min-cid ties), so the DuckDB oracle replays every codebook
    and every code bit-for-bit. d must be divisible by m.
    """
    dim = emb.select(F.size(vec_col)).first()[0]
    if dim % m:
        raise ValueError(f"pq_codes: dim {dim} not divisible by m={m}")
    sub = dim // m
    out = emb.select(id_col)
    for j in range(m):
        subv = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col)
        )
        codes = kmeans(subv, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
        out = out.join(codes.withColumnRenamed("cluster", f"code{j}"), id_col)
    return out
