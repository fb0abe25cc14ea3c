"""Minimum spanning forest — Borůvka supersteps.

Reference: include/gunrock/algorithms/mst.hxx:105-261 — per round:
remove-filter picks each component's minimum outgoing edge (:119-145),
components contract via hooking + pointer jumping (:173-220), repeat
until no cross-component edges remain. Component count at least halves
per round -> O(log n) rounds.

Deterministic tiebreak on (weight, src, dst) — the reference notes its
own atomics admit ties broken by arrival order (mst.hxx:196-199); we
pin a total order instead so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def mst(
    graph: Graph,
    max_iter: int = 100,
    runner: SuperstepRunner | None = None,
) -> tuple[DataFrame, float]:
    """Returns (chosen edges DataFrame (src, dst, weight), total weight).

    Input treated as undirected; edges canonicalized to src < dst.
    """
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "mst")
    und = canonicalize_edges(graph.edges, symmetrize=True, dedup=False, drop_self_loops=True)
    # canonical undirected edge = (min, max) with min weight kept
    und = (
        und.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"), "weight"
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    und = truncate_plan(und).persist()

    comp = truncate_plan(graph.vertices.select("vid", F.col("vid").alias("comp"))).persist()
    chosen = spark.createDataFrame([], "src long, dst long, weight double")

    it = 0
    while it < max_iter:
        it += 1
        lab = comp.withColumnRenamed("vid", "src").withColumnRenamed("comp", "csrc")
        lab2 = comp.withColumnRenamed("vid", "dst").withColumnRenamed("comp", "cdst")
        cross = truncate_plan(
            und.join(lab, "src").join(lab2, "dst").filter(F.col("csrc") != F.col("cdst"))
        )
        n_cross = cross.count()
        runner.log(it, cross_edges=n_cross)
        if n_cross == 0:
            break
        # min outgoing edge per component, deterministic tiebreak
        sym_cross = cross.select(F.col("csrc").alias("c"), "src", "dst", "weight", F.col("cdst").alias("tgt")).unionByName(
            cross.select(F.col("cdst").alias("c"), "src", "dst", "weight", F.col("csrc").alias("tgt"))
        )
        hooks = (
            sym_cross.groupBy("c")
            .agg(F.min(F.struct("weight", "src", "dst", "tgt")).alias("e"))
            .select("c", F.col("e.src").alias("src"), F.col("e.dst").alias("dst"),
                    F.col("e.weight").alias("weight"), F.col("e.tgt").alias("tgt"))
        )
        chosen = truncate_plan(
            chosen.unionByName(hooks.select("src", "dst", "weight")).dropDuplicates(["src", "dst"])
        ).persist()
        # contract the hook forest (mst.hxx:173-205 analogue). Root
        # rule breaks the 2-cycles mutual min-edges create:
        #   p(c) = c    if hooks are mutual and c < tgt (c becomes root)
        #   p(c) = tgt  otherwise
        parent = hooks.select("c", F.col("tgt").alias("p"))
        parent = (
            parent.alias("a")
            .join(parent.alias("b"), (F.col("a.p") == F.col("b.c")) & (F.col("b.p") == F.col("a.c")), "left")
            .select(
                F.col("a.c").alias("c"),
                F.when(F.col("b.c").isNotNull() & (F.col("a.c") < F.col("a.p")), F.col("a.c"))
                .otherwise(F.col("a.p"))
                .alias("p"),
            )
        )
        parent = truncate_plan(parent).persist()
        # pointer-jump to roots (forest depth is small after 2-cycle break)
        for _ in range(20):
            lookup = parent.select(F.col("c").alias("p"), F.col("p").alias("pp"))
            nxt = parent.join(lookup, "p", "left").select(
                "c", F.coalesce(F.col("pp"), F.col("p")).alias("p")
            )
            nxt = truncate_plan(nxt).persist()
            if nxt.join(parent, "c").filter(nxt["p"] != parent["p"]).count() == 0:
                parent = nxt
                break
            parent = nxt
        comp = truncate_plan(
            comp.join(parent.withColumnRenamed("c", "comp").withColumnRenamed("p", "newc"), "comp", "left")
            .select("vid", F.coalesce(F.col("newc"), F.col("comp")).alias("comp"))
        ).persist()

    total = chosen.agg(F.sum("weight")).collect()[0][0] or 0.0
    runner.finalize()
    return chosen, float(total)
