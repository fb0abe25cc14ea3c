"""Deterministic, oracle-replayable sketches — cardinality and
frequency estimation whose ANSWERS are reproducible bit-for-bit.

Probabilistic sketches (HyperLogLog, count-min, Bloom) are normally
"approximate AND run-dependent"; built on the engine's portable
md5-int60 hash they stay approximate but become PURE FUNCTIONS of the
input set: the same rows give the same buckets, the same estimate, on
any cluster layout, at any parallelism — and a DuckDB oracle replays
the estimate exactly (the error ANALYSIS is probabilistic, the VALUE
is deterministic). That is what makes them gateable, debuggable, and
safe for incremental pipelines (a re-run never flips an estimate).

Spark's built-in approx_count_distinct (HLL++) is NOT oracle-matchable
(engine-private hashing/registers), hence these operators.

Scale shapes:
- linear counting: one narrow hash projection + one groupBy over at
  most ``m`` buckets (m is a constant) — estimate from the empty-
  bucket fraction, -m·ln(V/m) (Whang et al. 1990). Accurate while
  n ≲ m·ln(m); pick m ~ expected n.
- count-min: ``depth`` independent md5-salted rows × ``width``
  buckets; ONE groupBy at (depth·width)-scale builds the whole
  matrix; a point query takes the min over depth cells (conservative
  overestimate, Cormode & Muthukrishnan 2005).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.functions.portable_hash import md5_int60


def linear_count(
    df: DataFrame, key: str, m: int = 4096
) -> DataFrame:
    """Linear-counting distinct estimate of ``key`` (1 row:
    n_buckets, occupied, estimate). estimate = round(-m·ln(V/m)) with
    V = empty-bucket fraction — both engines compute the identical
    double from identical integers, and the single ln/round pair is
    the only FP step. Saturated sketch (V=0) returns estimate = -1
    (caller must widen m); exact-zero input returns 0."""
    occ = (
        df.select((md5_int60(F.col(key).cast("string")) % F.lit(m)).alias("b"))
        .where(F.col("b").isNotNull())
        .distinct()
        .agg(F.count(F.lit(1)).alias("occupied"))
    )
    return occ.select(
        F.lit(m).cast("long").alias("n_buckets"),
        F.col("occupied").cast("long"),
        F.when(F.col("occupied") >= m, F.lit(-1))
        .when(F.col("occupied") == 0, F.lit(0))
        .otherwise(
            F.round(-F.lit(float(m)) * F.log((m - F.col("occupied")) / F.lit(float(m))))
        )
        .cast("long")
        .alias("estimate"),
    )


def count_min_table(
    df: DataFrame, key: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """The count-min matrix as rows (d, b, c): one groupBy builds all
    ``depth`` rows at once (the key is hashed with a per-row salt
    'd|key'). At most depth·width output rows regardless of input
    size — broadcastable state for point queries and merges (matrices
    from two micro-batches ADD cell-wise: the sketch is a monoid,
    which is what makes it streaming/incremental-safe)."""
    rows = df.select(F.col(key).cast("string").alias("k"))
    stacked = None
    for d in range(depth):
        h = (md5_int60(F.concat(F.lit(f"{d}|"), F.col("k"))) % F.lit(width)).alias("b")
        part = rows.select(F.lit(d).cast("int").alias("d"), h)
        stacked = part if stacked is None else stacked.unionByName(part)
    return stacked.groupBy("d", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))


def count_min_query(
    table: DataFrame, keys: DataFrame, key: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query ``keys`` against a count-min table: est(k) =
    min_d c[d][h_d(k)] (cells never undercount; collisions only
    inflate). One broadcast join of the (≤depth·width)-row table —
    queries never rescan the source data."""
    probes = keys.select(F.col(key).cast("string").alias("k")).distinct()
    stacked = None
    for d in range(depth):
        h = (md5_int60(F.concat(F.lit(f"{d}|"), F.col("k"))) % F.lit(width)).alias("b")
        part = probes.select("k", F.lit(d).cast("int").alias("d"), h)
        stacked = part if stacked is None else stacked.unionByName(part)
    return (
        stacked.join(F.broadcast(table), ["d", "b"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
        .select(F.col("k").alias(key), "est")
    )


def linear_count_error_bound(m: int, n: int) -> float:
    """Expected relative standard error of linear counting at load
    t = n/m: sqrt(m)·sqrt(exp(t) − t − 1)/n (Whang et al., Table 2) —
    documentation helper for picking m; not used in the operators."""
    t = n / m
    return math.sqrt(m * (math.exp(t) - t - 1)) / max(n, 1)
