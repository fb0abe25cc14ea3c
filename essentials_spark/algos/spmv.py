"""SpMV and SpGEMM over edge DataFrames.

Reference: include/gunrock/algorithms/spmv.hxx:72-127 (neighborreduce
pull / whole-graph advance push) and spgemm.hxx:91-246 (Gustavson
row-by-row product via two advances + scans + compaction).

Spark shape: SpMV is exactly ops/neighbor_reduce (join + groupBy with
map-side partials); the CSR-block vectorized variant reuses
graph/csr_blocks.spmv_push. SpGEMM's whole Gustavson machinery
(offsets scans, compaction) collapses into join + groupBy — Catalyst
does the allocation and compaction the reference hand-rolls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.graph.derive import Graph
from essentials_spark.ops.neighbor_reduce import neighbor_reduce


def spmv(graph: Graph, x: DataFrame, kernel: str = "dataframe", n_buckets: int | None = None) -> DataFrame:
    """y = A.x — x: (vid, value); returns (vid, value) for rows with
    at least one nonzero term (pull direction, spmv.hxx:107-127)."""
    if kernel == "csr":
        from essentials_spark.graph.csr_blocks import build_csr_blocks, spmv_push

        spark = graph.edges.sparkSession
        n_buckets = n_buckets or spark.sparkContext.defaultParallelism
        # push over the transposed edges == pull over the originals
        edges_t = graph.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight").alias("coef")
        )
        blocks = build_csr_blocks(edges_t, n_buckets)
        return spmv_push(blocks, x, n_buckets, value_col="value").withColumnRenamed(
            "dst", "vid"
        ).withColumnRenamed("contrib", "value")
    return neighbor_reduce(graph.edges, x, agg=F.sum, direction="pull")


def spgemm(a: DataFrame, b: DataFrame) -> DataFrame:
    """C = A @ B over COO edge DataFrames (src, dst, weight).

    Returns (src, dst, weight) of the product; the inner-dimension
    match is a shuffle join on a.dst == b.src and the accumulation a
    hash aggregate (≙ Gustavson per-row expansion + merge,
    spgemm.hxx:136-208)."""
    return (
        a.select(F.col("src").alias("i"), F.col("dst").alias("k"), F.col("weight").alias("wa"))
        .join(b.select(F.col("src").alias("k"), F.col("dst").alias("j"), F.col("weight").alias("wb")), "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("weight"))
        .select(F.col("i").alias("src"), F.col("j").alias("dst"), "weight")
    )
