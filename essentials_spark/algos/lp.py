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
map-side partials. The edge table is persisted once as a src-bucketed
table (engine/static_table.py) so supersteps shuffle only label state;
``fused_iters`` folds k rounds into one Spark action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.static_table import hint_state_join, prepare_static_edges
from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def label_propagation(
    graph: Graph,
    max_iter: int = 20,
    runner: SuperstepRunner | None = None,
    pre_symmetrized: bool = False,
    edges_mode: str = "bucketed",
    fused_iters: int = 1,
    persist_result: bool = True,
) -> DataFrame:
    """Returns (vid: long, label: long). Labels init to vid.
    ``persist_result=False`` releases the result's CacheManager pin
    before returning (data stays in checkpoint blocks; see cc.py)."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "lp")

    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    edges = prepare_static_edges(edges.select("src", "dst"), runner, keys="src", mode=edges_mode, name_hint="lp")
    m = edges.count()

    labels = truncate_plan(graph.vertices.select("vid", F.col("vid").alias("label")))
    n = labels.count()

    if runner.fingerprint is None:
        runner.fingerprint = f"lp:n={n}:m={m}:max_iter={max_iter}"
    iteration = 0
    converged = False
    resumed = runner.latest()
    if resumed is not None:
        iteration, labels, meta = resumed
        converged = bool(meta.get("converged"))
    labels = labels.persist()

    def one_round(cur: DataFrame) -> DataFrame:
        """One mode-of-neighbors round. Returns (vid, label, old)."""
        # adaptive state-join hint (see engine/static_table.py): label
        # state is vertex-scale forever — broadcast only when the
        # vertex count is genuinely small, else shuffle_hash
        counts = (
            edges.join(hint_state_join(cur.select(F.col("vid").alias("src"), "label"), n), "src")
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        # most frequent label, min-label tiebreak: max of (cnt, -label)
        best = (
            counts.groupBy("dst")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("top"))
            .select(F.col("dst").alias("vid"), (-F.col("top.neg")).alias("new_label"))
        )
        return cur.join(best, "vid", "left").select(
            "vid",
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            F.col("label").alias("old"),
        )

    # clamp fused depth — see pagerank.py: unrolled-plan stats grow
    # superlinearly with block depth and stall the planner past ~6
    fused_iters = min(fused_iters, 6)
    while not converged and iteration < max_iter:
        k = min(max(1, fused_iters), max_iter - iteration)
        cur = labels
        intermediates = []
        for j in range(k):
            cur = one_round(cur.select("vid", "label"))
            # last fused iterate flows straight into materialize —
            # persisting it too writes a redundant n-scale cache copy
            # (see algos/cc.py); non-final iterates are referenced by
            # their successor (messages + join left side)
            if j < k - 1:
                cur = cur.persist()
                intermediates.append(cur)
        new_labels = runner.materialize(cur, iteration + k)
        n_changed = new_labels.filter(F.col("label") != F.col("old")).count()
        for df in intermediates:
            df.unpersist()
        iteration += k
        runner.log(iteration, changed=n_changed, edges_processed=m * k)
        labels.unpersist()
        labels = new_labels.drop("old").persist()
        if n_changed == 0:
            prev = labels
            labels = runner.materialize(
                labels, iteration, eager=True, force=True, meta={"converged": True}
            ).persist()
            prev.unpersist()  # superseded by the eager checkpoint
            break

    out = labels.select("vid", "label")
    runner.finalize()
    if not persist_result:
        try:
            labels.unpersist()
        except Exception:
            pass
    return out
