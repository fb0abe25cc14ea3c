"""Triangle counting — degree-ordered enumeration, reference semantics.

Reference: include/gunrock/algorithms/tc.hxx:68-129 + the sorted
neighbor-list intersection in graph/csr.hxx:110-167 (smaller list
first :126-129 — the degree-ordering optimization). Semantics pinned
by the golden fixture unittests/algorithms/tc.cuh:19-95:

- undirected graph, self-loops excluded;
- per-vertex count = number of triangles containing the vertex
  ("third vertex" attribution: each edge (u,v) with neighbor > source
  credits every w in N(u) ∩ N(v), so each triangle credits all three
  corners once);
- total = sum = 3 x #triangles.

Spark plan: orient every undirected edge from its (degree, vid)-lower
endpoint to its higher one — a DAG where every vertex's out-degree is
O(sqrt(m)) on any graph, which bounds the wedge join (the standard
distributed-TC mitigation for the same power-law blow-up the
reference's merge-path load balancer fights). Then
  triangles = wedges(u->v, u->w with v<w) JOIN oriented(v->w)
— two shuffle joins total, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def triangle_count(graph: Graph, pre_symmetrized: bool = False) -> tuple[DataFrame, int]:
    """Returns (per-vertex DataFrame (vid, tc: long), total).

    total == 3 x number of distinct triangles (reference convention).
    """
    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    # truncate derivation lineage: the wedge plan references this
    # subtree several times (see pagerank.py note on stats planning)
    sym = truncate_plan(edges.select("src", "dst"))

    deg = sym.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "vid")

    und = sym.filter(F.col("src") < F.col("dst"))
    with_deg = (
        und.join(deg.select(F.col("vid").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("vid").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    )
    lower_first = F.struct("sdeg", "src") < F.struct("ddeg", "dst")
    oriented = with_deg.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(lower_first, F.col("ddeg")).otherwise(F.col("sdeg")).alias("vdeg"),
    )
    oriented = truncate_plan(oriented)

    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("vdeg").alias("bdeg"))
    e2 = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"), F.col("vdeg").alias("cdeg"))
    wedges = e1.join(e2, "a").filter(F.struct("bdeg", "b") < F.struct("cdeg", "c"))
    closing = oriented.select(F.col("u").alias("b"), F.col("v").alias("c"))
    triangles = wedges.join(closing, ["b", "c"]).select("a", "b", "c")

    corners = (
        triangles.select(F.explode(F.array("a", "b", "c")).alias("vid"))
        .groupBy("vid")
        .agg(F.count("*").alias("tc"))
    )
    per_vertex = (
        graph.vertices.select("vid")
        .join(corners, "vid", "left")
        .select("vid", F.coalesce(F.col("tc"), F.lit(0)).alias("tc"))
    )
    total = per_vertex.agg(F.sum("tc")).collect()[0][0] or 0
    return per_vertex, int(total)
