"""Label propagation — synchronous mode-of-neighbors supersteps.

The reference has no standalone LP; its nearest relatives are graph
coloring's iterative per-vertex decisions from neighbor state
(include/gunrock/algorithms/color.hxx:99-146) and hash-min CC. Our LP
(SURVEY.md §2.12 gap analysis): every superstep each vertex adopts its
neighbors' most frequent label, **min-label tiebreak** for
determinism (the reference breaks ties with seeded index-derived
randoms, algorithms/generate/random.hxx:20-34 — a deterministic
function of the index; min-label is our deterministic choice).
Synchronous updates over the symmetrized edge table; stops at zero
changes or max_iter (synchronous LP can 2-cycle on bipartite
structure, so max_iter is part of the spec and oracles pin it).

Spark plan per superstep: groupBy(dst, label).count() then a
max_by-style struct-max per dst — two shuffle aggregates, both with
map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def label_propagation(
    graph: Graph,
    max_iter: int = 20,
    runner: SuperstepRunner | None = None,
    pre_symmetrized: bool = False,
) -> DataFrame:
    """Returns (vid: long, label: long). Labels init to vid."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "lp")

    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    # localCheckpoint truncates the derivation lineage so each
    # superstep replans a constant-depth tree (see pagerank.py note)
    edges = truncate_plan(edges.select("src", "dst").repartition("src"))
    m = edges.count()

    labels = truncate_plan(graph.vertices.select("vid", F.col("vid").alias("label")))

    iteration = 0
    converged = False
    resumed = runner.latest()
    if resumed is not None:
        iteration, labels, meta = resumed
        converged = bool(meta.get("converged"))
    labels = labels.persist()

    while not converged and iteration < max_iter:
        counts = (
            edges.join(labels.select(F.col("vid").alias("src"), "label"), "src")
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        # most frequent label, min-label tiebreak: max of (cnt, -label)
        best = (
            counts.groupBy("dst")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("top"))
            .select(F.col("dst").alias("vid"), (-F.col("top.neg")).alias("new_label"))
        )
        new_labels = labels.join(best, "vid", "left").select(
            "vid",
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            F.col("label").alias("old"),
        )
        new_labels = runner.materialize(new_labels, iteration + 1)
        n_changed = new_labels.filter(F.col("label") != F.col("old")).count()
        iteration += 1
        runner.log(iteration, changed=n_changed, edges_processed=m)
        labels.unpersist()
        labels = new_labels.drop("old").persist()
        if n_changed == 0:
            labels = runner.materialize(labels, iteration, force=True, meta={"converged": True}).persist()
            break

    out = labels.select("vid", "label")
    runner.finalize()
    return out
