"""Betweenness centrality — Brandes forward/backward supersteps.

Reference: include/gunrock/algorithms/bc.hxx:104-213 — forward BFS
advances keeping per-depth frontiers and shortest-path counts (sigma),
then a backward pass accumulates dependencies
delta(v) = sum over successors w of sigma_v/sigma_w * (1 + delta_w),
with the returned bc_values accumulating **0.5 x** each update
(bc.hxx:168 'scaled output' — the undirected each-pair-once
convention); multi-source via the batch operator (bc.hxx:253-271).

Spark shape: the source/batch dimension is folded into the state
DataFrame as a ``seed`` column (vectorized batching, SURVEY §2.1), so
one pair of forward/backward loops serves all sources; per-depth
frontiers are rows filtered by the ``depth`` column. The edge table is
persisted bucketed in both orientations (forward joins on src,
backward on dst), so neither loop re-shuffles the graph. Sources must
be explicit or sampled (``n_sample``): collecting every vertex id to
the driver and cross-producting it through the state is a scale-killer
at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.static_table import prepare_static_edges
from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph


def betweenness_centrality(
    graph: Graph,
    sources: list[int] | None = None,
    max_iter: int = 10_000,
    runner: SuperstepRunner | None = None,
    edges_mode: str = "bucketed",
    n_sample: int = 32,
) -> DataFrame:
    """Returns (vid: long, bc: double) — reference-scaled (0.5x per
    dependency update), summed over the given sources.

    ``sources=None`` uses the ``n_sample`` smallest vertex ids
    (deterministic, bounded — a capped approximation, standard for BC
    at scale; pass explicit sources for exact multi-source runs)."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "bc")
    e = graph.edges.select("src", "dst")
    edges = prepare_static_edges(e, runner, keys="src", mode=edges_mode, name_hint="bc_fwd")
    edges_rev = prepare_static_edges(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        runner, keys="src", mode=edges_mode, name_hint="bc_rev",
    )

    if sources is None:
        # bounded deterministic sample — never a full-vertex collect
        sources = [r["vid"] for r in graph.vertices.select("vid").orderBy("vid").limit(n_sample).collect()]
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
        prev = state
        # truncate_plan materializes, so the new state no longer depends
        # on the old cache — release it eagerly (reassignment alone
        # leaves the unpersist to the lazy ContextCleaner)
        state = truncate_plan(state.unionByName(new.select("seed", "vid", "depth", "sigma"))).persist()
        prev.unpersist()
        frontier = new

    max_depth = depth - 1

    # ---- backward: dependency accumulation, deepest level first ----
    deltas = truncate_plan(state.select("seed", "vid", "depth", "sigma", F.lit(0.0).alias("delta"))).persist()
    for d in range(max_depth, 0, -1):
        succ = deltas.filter(F.col("depth") == d).select(
            "seed", F.col("vid").alias("src"), F.col("sigma").alias("wsigma"), F.col("delta").alias("wdelta")
        )
        # walk predecessors on the transposed table (join keyed on its
        # bucketed src = the successor endpoint)
        contrib = (
            edges_rev.join(succ, "src")
            .join(
                deltas.filter(F.col("depth") == d - 1).select("seed", F.col("vid").alias("dst"), F.col("sigma").alias("vsigma")),
                ["seed", "dst"],
            )
            .groupBy("seed", F.col("dst").alias("vid"))
            .agg(F.sum((F.col("vsigma") / F.col("wsigma")) * (1.0 + F.col("wdelta"))).alias("dd"))
        )
        prev_d = deltas
        deltas = truncate_plan(
            deltas.join(contrib, ["seed", "vid"], "left").select(
                "seed", "vid", "depth", "sigma", (F.col("delta") + F.coalesce(F.col("dd"), F.lit(0.0))).alias("delta")
            )
        ).persist()
        prev_d.unpersist()

    out = (
        deltas.filter(F.col("vid") != F.col("seed"))
        .groupBy("vid")
        .agg((F.lit(0.5) * F.sum("delta")).alias("bc"))
        .join(graph.vertices.select("vid"), "vid", "right")
        .select("vid", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc"))
    )
    runner.finalize()
    return out
