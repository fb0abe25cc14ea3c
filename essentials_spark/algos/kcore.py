"""K-core decomposition — iterative peeling.

Reference: include/gunrock/algorithms/kcore.hxx:112-199 — for k = 1..:
repeatedly delete vertices with remaining degree < k (advance +
parallel_for + predicated filter); a vertex's core number is the
largest k at which it survives.

Spark shape: the "deleted" flag (kcore.hxx:40-41 bool array) is
membership of the remaining-edges DataFrame; each peel round is a
degree groupBy + semi-join filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def kcore(
    graph: Graph,
    max_k: int = 1000,
    runner: SuperstepRunner | None = None,
    pre_symmetrized: bool = False,
) -> DataFrame:
    """Returns (vid: long, core: int) for every vertex (0 if isolated)."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "kcore")
    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    remaining = truncate_plan(edges.select("src", "dst")).persist()
    cores = truncate_plan(graph.vertices.select("vid", F.lit(0).cast("int").alias("core"))).persist()

    it = 0
    for k in range(1, max_k + 1):
        while True:
            deg = remaining.groupBy("src").agg(F.count("*").alias("deg"))
            victims = deg.filter(F.col("deg") < k).select(F.col("src").alias("vid"))
            n_removed = victims.count()
            it += 1
            runner.log(it, k=k, removed=n_removed)
            if n_removed == 0:
                break
            remaining = truncate_plan(
                remaining.join(victims.withColumnRenamed("vid", "src"), "src", "left_anti")
                .join(victims.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            ).persist()
        # survivors of round k have core >= k
        survivors = remaining.select("src").distinct().withColumnRenamed("src", "vid")
        n_surv = survivors.count()
        if n_surv == 0:
            break
        cores = truncate_plan(
            cores.join(survivors.withColumn("_s", F.lit(1)), "vid", "left").select(
                "vid", F.when(F.col("_s").isNotNull(), F.lit(k)).otherwise(F.col("core")).cast("int").alias("core")
            )
        ).persist()

    runner.finalize()
    return cores
