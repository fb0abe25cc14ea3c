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


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> list[list[float]]:
    """The Lloyd training loop alone: returns the k×d centroid list
    after ``iters`` updates from the deterministic seed (vectors of
    the k smallest ids, in id order => cid 0..k-1). Centroids live on
    the 1e-6 grid — the driver-side state is O(k·d), never data."""
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
    rows.unpersist()
    return centroids


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cluster int) under fixed centroids — pure codegen."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.select(
        F.col(id_col),
        _assign_expr(v, centroids).cast("int").alias("cluster"),
    )


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
    centroids = kmeans_train(emb, k, iters, id_col, vec_col, round_decimals)
    return kmeans_assign(emb, centroids, id_col, vec_col)


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


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """One deterministic Lloyd codebook per contiguous subspace;
    returns m × k × (d/m) centroid lists (driver-side, O(m·k·d))."""
    dim = emb.select(F.size(vec_col)).first()[0]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        subv = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col)
        )
        books.append(kmeans_train(subv, k=k, iters=iters, id_col=id_col, vec_col=vec_col))
    return books


def _round_half_away(v: float, scale: int = 1_000_000) -> int:
    """round(v*scale) with DuckDB semantics (half away from zero) —
    Python's round() is banker's and would diverge on exact .5."""
    import math

    x = v * scale
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def pq_adc_topk(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    topk: int = 5,
    n_queries: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: queries (the vectors
    with id < n_queries) stay exact; corpus vectors are represented by
    their m subspace codes; distance(q, x) = Σ_j LUT_j[q][code_j(x)],
    the squared L2 between q's j-th slice and x's j-th centroid.

    EVERYTHING after codebook training is integer algebra in µ-units:
    centroids live on the 1e-6 grid and queries are quantized to it
    (half-away-from-zero, the DuckDB round), so the LUT entries and
    the summed distances are exact BIGINTs — the oracle replays every
    distance bit-for-bit, no FP margin argument needed. The µ-unit
    quantization perturbs true distances by O(1e-6·scale) — far below
    PQ's own quantization error, and identical in both engines.

    Scale shape: one pass assigning codes (inlined-centroid codegen),
    a broadcast of n_queries × m × k LUT ints folded into ONE column
    expression per query, and a top-k window over n_queries
    partitions. The corpus is scanned once; no shuffle touches
    vectors. Returns (query_id, neighbor_id, d2_u, rank)."""
    dim = emb.select(F.size(vec_col)).first()[0]
    sub = dim // m
    books = pq_train(emb, m=m, k=k, iters=iters, id_col=id_col, vec_col=vec_col)

    # per-subspace codes, joined into one row per vector
    codes = emb.select(F.col(id_col), F.col(vec_col))
    for j in range(m):
        cj = kmeans_assign(
            emb.select(F.col(id_col), F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col)),
            books[j],
            id_col=id_col,
            vec_col=vec_col,
        ).withColumnRenamed("cluster", f"_c{j}")
        codes = codes.join(cj, id_col)

    # µ-unit LUTs per query (driver-side: n_queries × m × k ints)
    qrows = (
        emb.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
        .orderBy("_qid")
        .collect()
    )
    cent_u = [
        [[_round_half_away(x) for x in c] for c in books[j]] for j in range(m)
    ]
    per_query = []
    for r in qrows:
        q_u = [_round_half_away(float(x)) for x in r["_qv"]]
        d2 = None
        for j in range(m):
            lut = [
                sum(
                    (q_u[j * sub + t] - cent_u[j][c][t]) ** 2
                    for t in range(sub)
                )
                for c in range(k)
            ]
            term = F.element_at(
                F.array(*[F.lit(x).cast("long") for x in lut]), F.col(f"_c{j}") + 1
            )
            d2 = term if d2 is None else d2 + term
        per_query.append(
            codes.select(
                F.lit(int(r["_qid"])).cast("long").alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
                d2.cast("long").alias("d2_u"),
            )
        )
    scored = per_query[0]
    for df in per_query[1:]:
        scored = scored.unionByName(df)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("d2_u", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "d2_u", F.col("rank").cast("long").alias("rank"))
    )
