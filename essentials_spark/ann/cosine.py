"""Cosine similarity search over an embedding column (array<float>).

- brute_force_topk: the exact baseline — normalized dot products via
  JVM-side higher-order functions (zip_with + aggregate; no Python),
  broadcast of the (small) query set against the candidate scan, top-k
  by window. O(|Q| x |C|) work but embarrassingly parallel: at 100 TB
  the candidate side stays partition-parallel and only |Q| x k rows
  shuffle.
- lsh_topk: the scale path — random-hyperplane (SimHash-family) LSH:
  candidates are bucketed by b-bit signatures over t tables; each query
  probes its buckets only, turning the cross product into a bucketed
  equi-join. Recall is tunable via (bits, tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, sim, rank); deterministic tiebreak
    (rounded sim desc, neighbor_id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), sim_decimals).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _rh_signature(vec, planes, bits: int):
    """b-bit random-hyperplane signature: sign bits of <v, h_i> with
    deterministic per-(plane, dim) pseudo-random hyperplanes derived
    from hash — reference-style index-seeded randomness
    (algorithms/generate/random.hxx)."""
    sig = F.lit(0).cast("long")
    for i in range(bits):
        proj = F.aggregate(
            F.zip_with(
                vec,
                planes[i],
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    tables: int = 4,
    dim: int | None = None,
    sim_decimals: int = 6,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing.

    Each vector gets ``tables`` signatures of ``bits`` bits; query and
    candidate meet when any table's signature matches — a bucketed
    equi-join on (table, signature) instead of a cross join.
    """
    if dim is None:
        dim = len(candidates.select(vec_col).first()[0])

    import numpy as np

    rng = np.random.RandomState(42)
    planes = rng.standard_normal((tables, bits, dim))

    def with_sigs(df, idc):
        v = _as_double(F.col(vec_col))
        rows = df.select(F.col(id_col).alias(idc), v.alias("v")).withColumn("n", _norm(F.col("v")))
        sigs = []
        for t in range(tables):
            plane_cols = [F.array(*[F.lit(float(x)) for x in planes[t][b]]) for b in range(bits)]
            sigs.append(F.struct(F.lit(t).alias("tbl"), _rh_signature(F.col("v"), plane_cols, bits).alias("sig")))
        return rows.withColumn("sig", F.explode(F.array(*sigs))).select(
            idc, "v", "n", F.col("sig.tbl").alias("tbl"), F.col("sig.sig").alias("sig")
        )

    qs = with_sigs(queries, "query_id")
    cs = with_sigs(candidates, "neighbor_id")
    pairs = (
        qs.join(cs, ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(qs["v"], cs["v"]) / (qs["n"] * cs["n"]), sim_decimals
            ).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
