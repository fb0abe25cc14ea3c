"""PageRank — whole-graph advance superstep, reference semantics.

Reference: include/gunrock/algorithms/pr.hxx —
- iweights[u] = alpha / sum(out-weights(u)), 0 for dangling (:77-91);
- init p = 1/n (:73);
- per iteration (:106-153):
    plast <- p
    dsum   = alpha * sum(plast[v] for dangling v)      (:124-133)
    p      = fill((1 - alpha + dsum) / n)              (:134)
    p[dst] += plast[src] * iweights[src] * w  for every edge (:140-152)
- converged when iteration > 0 and max|p - plast| < tol (L-inf,
  :155-178); defaults alpha=0.85 tol=1e-6 (examples/algorithms/pr/
  pr.cu:55-56).

Spark plan per superstep: ONE shuffle aggregate (groupBy(dst) of
rank*coef messages over the pre-weighted edge table) + a broadcast-or-
shuffle join back onto the vertex state, with the L-inf error and the
NEXT iteration's dangling sum folded into a single driver collect.
Float64 throughout (the reference's float32 atomics admit reduction-
order variance; float64 + deterministic aggregation keeps us within
allclose 1e-6 of the formula).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph


def pagerank(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 1000,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Returns (vid: long, rank: double)."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "pagerank")

    verts = graph.vertices.select("vid")
    edges = graph.edges

    # out-weight sums -> per-edge spread coefficient iweights[src]*w
    outw = edges.groupBy("src").agg(F.sum("weight").alias("outw"))
    edges_w = (
        edges.join(outw, "src")
        .select("src", "dst", (F.lit(alpha) * F.col("weight") / F.col("outw")).alias("coef"))
        .repartition("src")
    )
    # truncate the derivation lineage (and reset carried stats — see
    # engine/superstep.truncate_plan): every superstep replans this
    # subtree otherwise
    edges_w = truncate_plan(edges_w)
    m = edges_w.count()

    # vertex state: rank + dangling flag (no out-edges)
    state = (
        verts.join(edges.select("src").distinct().withColumnRenamed("src", "vid").withColumn("_h", F.lit(1)), "vid", "left")
        .select("vid", F.col("_h").isNull().alias("dangling"))
    )

    n = verts.count()
    init_rank = 1.0 / n
    ranks = state.withColumn("rank", F.lit(init_rank))

    resumed = runner.latest()
    iteration = 0
    converged = False
    if resumed is not None:
        iteration, ranks, meta = resumed
        converged = bool(meta.get("converged"))
    ranks = ranks.persist()
    # dsum over current ranks (cheap aggregate; exact on resume too)
    dsum = ranks.filter("dangling").agg(F.sum("rank")).collect()[0][0] or 0.0
    dsum *= alpha

    while not converged and iteration < max_iter:
        base = (1.0 - alpha + dsum) / n
        msgs = (
            edges_w.join(ranks.select(F.col("vid").alias("src"), "rank"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("coef")).alias("contrib"))
        )
        new_ranks = (
            ranks.select("vid", "dangling", F.col("rank").alias("plast"))
            .join(msgs.withColumnRenamed("dst", "vid"), "vid", "left")
            .select(
                "vid",
                "dangling",
                (F.lit(base) + F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
                "plast",
            )
        )
        new_ranks = runner.materialize(new_ranks, iteration + 1)
        stats = new_ranks.agg(
            F.max(F.abs(F.col("rank") - F.col("plast"))).alias("err"),
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))).alias("dsum"),
        ).collect()[0]
        err, dsum = stats["err"], alpha * (stats["dsum"] or 0.0)
        iteration += 1
        runner.log(iteration, linf_err=err, edges_processed=m)
        ranks.unpersist()
        ranks = new_ranks.drop("plast").persist()
        if err < tol:
            # durable final write: a resumed run must return THIS state,
            # not run an extra superstep past convergence
            ranks = runner.materialize(ranks, iteration, force=True, meta={"converged": True}).persist()
            break

    runner.log(iteration, converged=True, total_edges_processed=m * iteration)
    out = ranks.select("vid", "rank")
    runner.finalize()
    return out
