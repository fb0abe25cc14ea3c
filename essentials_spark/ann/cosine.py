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


def _plane_component(t: int, b: int):
    """Deterministic pseudo-random hyperplane component for (table t,
    bit b, dimension i): hash-derived uniform in [-1, 1] — the
    reference's index-seeded randomness (algorithms/generate/
    random.hxx) instead of literal plane arrays, which bloat the plan
    at 1-4k dims and force a driver-side dim probe."""
    seed = t * 1024 + b
    return lambda x, i: x * (
        (F.pmod(F.xxhash64(F.lit(seed), i), F.lit(2001)) - F.lit(1000)).cast("double") / 1000.0
    )


def _rh_signature(vec, t: int, bits: int):
    """b-bit random-hyperplane signature: sign bits of <v, h_i>."""
    sig = F.lit(0).cast("long")
    for b in range(bits):
        proj = F.aggregate(
            F.transform(vec, _plane_component(t, b)), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def _rh_signature_literal(vec, planes_t: list[list[float]]):
    """Signature against literal plane arrays (portable mode): the same
    component values are inlined into the oracle SQL (functions/
    portable_hash.plane_components), so buckets are value-checkable in
    DuckDB. Fine at O(100) dims; the hash-derived variant above is the
    scale path for 1-4k dims."""
    sig = F.lit(0).cast("long")
    for b, comps in enumerate(planes_t):
        arr = F.array(*[F.lit(c) for c in comps])
        proj = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        sig = sig + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
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
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing.

    Each vector gets ``tables`` signatures of ``bits`` bits; query and
    candidate meet when any table's signature matches — a bucketed
    equi-join on (table, signature) instead of a cross join. ``dim``
    is required only in ``portable`` mode (literal plane arrays shared
    with the oracle SQL); otherwise hyperplanes are hash-derived per
    dimension index and any dim works.
    """
    planes = None
    if portable:
        from essentials_spark.functions.portable_hash import plane_components

        if dim is None:
            raise ValueError("portable lsh_topk requires dim")
        planes = plane_components(tables, bits, dim)

    def with_sigs(df, idc):
        v = _as_double(F.col(vec_col))
        rows = df.select(F.col(id_col).alias(idc), v.alias("v")).withColumn("n", _norm(F.col("v")))
        sigs = [
            F.struct(
                F.lit(t).alias("tbl"),
                (
                    _rh_signature_literal(F.col("v"), planes[t])
                    if portable
                    else _rh_signature(F.col("v"), t, bits)
                ).alias("sig"),
            )
            for t in range(tables)
        ]
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


def lsh_pairs(
    vectors: DataFrame,
    min_sim: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 10,
    tables: int = 6,
    bucket_cap: int = 64,
    chain_width: int = 2,
    sim_decimals: int = 6,
) -> DataFrame:
    """Self-join near-neighbor pairs (a, b, sim), a < b, sim >= min_sim.

    Threshold-first (no top-k window over an unbounded candidate set —
    the dedup use-case wants *all* pairs above min_sim); LSH buckets
    above ``bucket_cap`` fall back to bounded chain pairing (see
    dedup/minhash.capped_bucket_pairs) so a degenerate bucket of
    near-identical vectors cannot go quadratic."""
    from essentials_spark.dedup.minhash import capped_bucket_pairs

    v = _as_double(F.col(vec_col))
    rows = vectors.select(F.col(id_col).alias("id"), v.alias("v")).withColumn("n", _norm(F.col("v")))
    sigs = [
        F.struct(F.lit(t).alias("tbl"), _rh_signature(F.col("v"), t, bits).alias("sig"))
        for t in range(tables)
    ]
    bucketed = rows.withColumn("s", F.explode(F.array(*sigs))).select(
        "id", "v", "n", F.col("s.tbl").alias("tbl"), F.col("s.sig").alias("sig")
    )
    cand = capped_bucket_pairs(
        bucketed, ["tbl", "sig"], ["v", "n"], bucket_cap=bucket_cap, chain_width=chain_width
    )
    sim = F.round(_dot(F.col("a_v"), F.col("b_v")) / (F.col("a_n") * F.col("b_n")), sim_decimals)
    return cand.select("a", "b", sim.alias("sim")).filter(F.col("sim") >= min_sim)
