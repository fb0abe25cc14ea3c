"""Betweenness centrality — Brandes forward/backward supersteps.

Reference: include/gunrock/algorithms/bc.hxx:104-213 — forward BFS
advances keeping per-depth frontiers and shortest-path counts (sigma),
then a backward pass accumulates dependencies
delta(v) = sum over successors w of sigma_v/sigma_w * (1 + delta_w);
multi-source via the batch operator (bc.hxx:253-271).

Spark shape: the source/batch dimension is folded into the state
DataFrame as a ``seed`` column (vectorized batching, SURVEY §2.1), so
one pair of forward/backward loops serves all sources; per-depth
frontiers are rows filtered by the ``depth`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph


def betweenness_centrality(
    graph: Graph,
    sources: list[int] | None = None,
    max_iter: int = 10_000,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Returns (vid: long, bc: double) — unnormalized, summed over the
    given sources (all vertices if None and the graph is small)."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "bc")
    edges = truncate_plan(graph.edges.select("src", "dst").repartition("src"))

    if sources is None:
        sources = [r["vid"] for r in graph.vertices.select("vid").collect()]
    seeds = spark.createDataFrame([(int(s),) for s in sources], "seed long")

    # ---- forward: multi-source BFS with sigma accumulation ----
    state = truncate_plan(
        seeds.select("seed", F.col("seed").alias("vid"), F.lit(0).alias("depth"), F.lit(1.0).alias("sigma"))
    ).persist()
    frontier = state
    depth = 0
    while depth < max_iter:
        nxt = (
            edges.join(frontier.select(F.col("vid").alias("src"), "seed", "sigma"), "src")
            .groupBy("seed", F.col("dst").alias("vid"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(state.select("seed", "vid"), ["seed", "vid"], "left_anti")
        )
        depth += 1
        new = truncate_plan(nxt.withColumn("depth", F.lit(depth)))
        n_new = new.count()
        runner.log(depth, discovered=n_new)
        if n_new == 0:
            break
        state = truncate_plan(state.unionByName(new.select("seed", "vid", "depth", "sigma"))).persist()
        frontier = new

    max_depth = depth - 1

    # ---- backward: dependency accumulation, deepest level first ----
    deltas = truncate_plan(state.select("seed", "vid", "depth", "sigma", F.lit(0.0).alias("delta"))).persist()
    for d in range(max_depth, 0, -1):
        succ = deltas.filter(F.col("depth") == d).select(
            "seed", F.col("vid").alias("dst"), F.col("sigma").alias("wsigma"), F.col("delta").alias("wdelta")
        )
        contrib = (
            edges.join(succ, "dst")
            .join(
                deltas.filter(F.col("depth") == d - 1).select("seed", F.col("vid").alias("src"), F.col("sigma").alias("vsigma")),
                ["seed", "src"],
            )
            .groupBy("seed", F.col("src").alias("vid"))
            .agg(F.sum((F.col("vsigma") / F.col("wsigma")) * (1.0 + F.col("wdelta"))).alias("dd"))
        )
        deltas = truncate_plan(
            deltas.join(contrib, ["seed", "vid"], "left").select(
                "seed", "vid", "depth", "sigma", (F.col("delta") + F.coalesce(F.col("dd"), F.lit(0.0))).alias("delta")
            )
        ).persist()

    out = (
        deltas.filter(F.col("vid") != F.col("seed"))
        .groupBy("vid")
        .agg(F.sum("delta").alias("bc"))
        .join(graph.vertices.select("vid"), "vid", "right")
        .select("vid", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc"))
    )
    runner.finalize()
    return out
