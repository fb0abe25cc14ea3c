"""K-core decomposition — iterative peeling via decrement messages.

Reference: include/gunrock/algorithms/kcore.hxx:112-199 — for k = 1..:
repeatedly delete vertices with remaining degree < k (advance +
parallel_for + predicated filter); a vertex's core number is the
largest k at which it survives (peeled during round k => core = k-1).

Scale shape: the symmetrized edge table is persisted ONCE as a
src-bucketed table; each peel sub-round moves only the *victims'*
adjacency (victims ⋈ edges → groupBy(dst) degree decrements) — the
remaining-edge table is never rewritten and the full edge set never
re-shuffles (round-1 version re-anti-joined and re-aggregated the
whole edge table twice per sub-round). Decrements aimed at vertices
removed in the same sub-round are dropped by the state anti-join,
matching the reference's simultaneous-delete semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.static_table import prepare_static_edges
from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def kcore(
    graph: Graph,
    max_k: int = 1000,
    runner: SuperstepRunner | None = None,
    pre_symmetrized: bool = False,
    edges_mode: str = "bucketed",
) -> DataFrame:
    """Returns (vid: long, core: int) for every vertex (0 if isolated)."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "kcore")
    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    edges = prepare_static_edges(edges.select("src", "dst"), runner, keys="src", mode=edges_mode, name_hint="kcore")

    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "vid")
    state = truncate_plan(
        graph.vertices.select("vid")
        .join(deg, "vid", "left")
        .select("vid", F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"))
    ).persist()

    peeled: list[DataFrame] = []  # (vid, core) fragments
    it = 0
    k = 1
    while k <= max_k:
        victims = state.filter(F.col("deg") < k).select("vid")
        n_removed = victims.count()
        it += 1
        runner.log(it, k=k, removed=n_removed)
        if n_removed == 0:
            if state.count() == 0:
                break
            k += 1
            continue
        peeled.append(
            truncate_plan(victims.withColumn("core", F.lit(k - 1).cast("int")))
        )
        # degree decrements along the victims' adjacency only
        dec = (
            edges.join(peeled[-1].select(F.col("vid").alias("src")), "src")
            .groupBy("dst")
            .agg(F.count("*").alias("dec"))
            .withColumnRenamed("dst", "vid")
        )
        new_state = truncate_plan(
            state.join(peeled[-1].select("vid"), "vid", "left_anti")
            .join(dec, "vid", "left")
            .select("vid", (F.col("deg") - F.coalesce(F.col("dec"), F.lit(0))).alias("deg"))
        ).persist()
        state.unpersist()
        state = new_state

    # survivors past max_k keep the last k they were known to survive
    survivors = state.select("vid", F.lit(min(k, max_k)).cast("int").alias("core"))
    out = survivors
    for frag in peeled:
        out = out.unionByName(frag)
    runner.finalize()
    return out
