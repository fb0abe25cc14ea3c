"""Greedy independent-set graph coloring.

Reference: include/gunrock/algorithms/color.hxx:89-151 — per
iteration, every uncolored vertex with the locally maximal random
priority among uncolored neighbors takes color 2*iter, the locally
minimal takes 2*iter+1 (2 colors per iteration). Priorities are
index-seeded deterministic pseudo-randoms
(algorithms/generate/random.hxx:20-34, color.hxx:64-65) — here
xxhash64(vid, seed), so runs are reproducible (SURVEY §7.3 risk 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def color(
    graph: Graph,
    max_iter: int = 1000,
    seed: int = 42,
    runner: SuperstepRunner | None = None,
    pre_symmetrized: bool = False,
) -> DataFrame:
    """Returns (vid: long, color: int); valid coloring (no edge joins
    two equal colors). Isolated vertices get color 0."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "color")
    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    edges = truncate_plan(edges.select("src", "dst"))

    # deterministic priority per vertex; ties impossible via (hash, vid)
    prio = F.xxhash64(F.col("vid"), F.lit(seed))
    uncolored = truncate_plan(graph.vertices.select("vid").withColumn("prio", prio)).persist()
    colored = spark.createDataFrame([], "vid long, color int")

    it = 0
    while it < max_iter:
        n_left = uncolored.count()
        if n_left == 0:
            break
        # neighbor priorities restricted to uncolored vertices
        u_edges = (
            edges.join(uncolored.select(F.col("vid").alias("src"), F.col("prio").alias("sprio")), "src")
            .join(uncolored.select(F.col("vid").alias("dst"), F.col("prio").alias("dprio")), "dst")
        )
        nbr = u_edges.groupBy("src").agg(
            F.max(F.struct("dprio", "dst")).alias("mx"),
            F.min(F.struct("dprio", "dst")).alias("mn"),
        ).withColumnRenamed("src", "vid")
        decide = uncolored.join(nbr, "vid", "left").select(
            "vid",
            "prio",
            F.when(
                F.col("mx").isNull() | (F.struct(F.col("prio").alias("dprio"), F.col("vid").alias("dst")) > F.col("mx")),
                F.lit(2 * it),
            )
            .when(
                F.struct(F.col("prio").alias("dprio"), F.col("vid").alias("dst")) < F.col("mn"),
                F.lit(2 * it + 1),
            )
            .cast("int")
            .alias("color"),
        )
        decide = truncate_plan(decide)
        newly = decide.filter(F.col("color").isNotNull()).select("vid", "color")
        colored = truncate_plan(colored.unionByName(newly)).persist()
        uncolored = truncate_plan(decide.filter(F.col("color").isNull()).select("vid", "prio")).persist()
        it += 1
        runner.log(it, colored=newly.count(), remaining=n_left)

    runner.finalize()
    return colored
