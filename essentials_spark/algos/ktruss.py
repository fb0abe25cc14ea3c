"""K-truss decomposition — iterative support peeling over the
degree-oriented triangle enumeration.

The k-truss is the maximal subgraph in which every edge participates
in at least k-2 triangles (Cohen 2008) — the edge-analogue of k-core
and the standard cohesion refinement of triangle counting. The
reference ships the counting half (include/gunrock/algorithms/
tc.hxx:68-129); this extends it with the same remove-filter peeling
discipline its k-core and MST enactors use (filter/remove semantics,
operators/filter/filter.hxx) applied to EDGES.

Spark plan per round: per-edge support via the identical degree-
oriented wedge join triangle_count uses (orientation bounds every
wedge fan-out to O(sqrt m) — algos/tc.py module docstring), the
triangle set exploded to its three canonical edges and counted, then
one semi-join keeps edges with support >= k-2. The edge set CONTRACTS
every round (like mst's active set), so late rounds are cheap; the
loop is a driver fixpoint with one count per round. Only edges that
lost a triangle can newly drop, so a delta recompute is possible at
100 TB; the full recompute keeps rounds O(cascade depth) and every
round's cost proportional to the CURRENT subgraph, which is the
dominant effect (peeling kills hub fans first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def edge_support(und: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (src < dst) edge set.

    Returns (src, dst, sup) for edges with sup >= 1; edges in no
    triangle have no row. Same orientation algebra as triangle_count
    (tc.hxx:68-129 semantics, degree-ordered wedges)."""
    sym = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "vid")
    with_deg = (
        und.join(deg.select(F.col("vid").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("vid").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    )
    lower_first = F.struct("sdeg", "src") < F.struct("ddeg", "dst")
    oriented = truncate_plan(
        with_deg.select(
            F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
            F.when(lower_first, F.col("ddeg")).otherwise(F.col("sdeg")).alias("vdeg"),
        )
    )
    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("vdeg").alias("bdeg"))
    e2 = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"), F.col("vdeg").alias("cdeg"))
    wedges = e1.join(e2, "a").filter(F.struct("bdeg", "b") < F.struct("cdeg", "c"))
    closing = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    triangles = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    # each triangle supports its three canonical edges once
    tri_edges = triangles.select(
        F.explode(
            F.array(
                F.struct(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")),
                F.struct(F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst")),
                F.struct(F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return tri_edges.groupBy("src", "dst").agg(F.count("*").alias("sup"))


def ktruss(
    graph: Graph,
    k: int,
    max_iter: int = 200,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Edges (src, dst; canonical src < dst) of the k-truss.

    Peels edges with support < k-2 until the support condition holds
    for every survivor; the result is the unique maximal such
    subgraph (peeling order cannot matter: removing an unqualified
    edge never qualifies another, supports only decrease). k <= 2
    returns the whole canonical edge set (every edge is trivially in
    a 2-truss)."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "ktruss")
    und = canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    ).filter(F.col("src") < F.col("dst")).select("src", "dst")
    und = truncate_plan(und).persist()
    n_prev = und.count()
    if k <= 2:
        runner.finalize()
        return und
    it = 0
    while it < max_iter:
        it += 1
        sup = edge_support(und)
        keep = truncate_plan(
            und.join(
                sup.filter(F.col("sup") >= k - 2).select("src", "dst"),
                ["src", "dst"],
                "left_semi",
            )
        ).persist()
        n_keep = keep.count()
        runner.log(it, edges=n_keep, dropped=n_prev - n_keep)
        und.unpersist()
        und = keep
        if n_keep == n_prev or n_keep == 0:
            break
        n_prev = n_keep
    runner.finalize()
    return und
