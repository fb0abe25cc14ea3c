"""BFS and SSSP — frontier-based traversal supersteps.

Reference:
- BFS: include/gunrock/algorithms/bfs.hxx:80-132 — advance with
  atomic-min depth relax; depth = iteration at discovery.
- SSSP: include/gunrock/algorithms/sssp.hxx:98-151 — advance with
  atomic-min distance + visited-dedup bypass filter.

Spark shape: the frontier is a DataFrame; advance = frontier x edges
equi-join (ops/advance.py); the atomic-min scatter becomes
groupBy(dst).min (Catalyst partial aggregation replaces atomics);
the visited filter is a left-anti join / conditional update. The edge
table is persisted once as a src-bucketed table so each superstep
shuffles only the (small) frontier (engine/static_table.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.static_table import prepare_static_edges
from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph


def bfs(
    graph: Graph,
    source: int,
    max_iter: int = 10_000,
    runner: SuperstepRunner | None = None,
    edges_mode: str = "bucketed",
) -> DataFrame:
    """Hop distances from ``source``; unreachable vertices omitted.

    Returns (vid: long, dist: int).
    """
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "bfs")
    edges = prepare_static_edges(
        graph.edges.select("src", "dst"), runner, keys="src", mode=edges_mode, name_hint="bfs"
    )

    dist = truncate_plan(
        spark.createDataFrame([(int(source), 0)], "vid long, dist int")
    ).persist()
    frontier = dist.select("vid")
    depth = 0

    while depth < max_iter:
        nxt = (
            edges.join(frontier.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"))
            .dropDuplicates(["vid"])  # uniquify (operators/uniquify)
            .join(dist.select("vid"), "vid", "left_anti")  # visited filter
        )
        depth += 1
        new = truncate_plan(nxt.withColumn("dist", F.lit(depth).cast("int")))
        n_new = new.count()
        runner.log(depth, frontier_size=n_new)
        if n_new == 0:
            break
        prev = dist
        # truncate_plan materializes: the union no longer depends on the
        # old cache — release it eagerly (see bc.py note)
        dist = truncate_plan(dist.unionByName(new)).persist()
        prev.unpersist()
        frontier = new.select("vid")

    runner.finalize()
    return dist


def sssp(
    graph: Graph,
    source: int,
    max_iter: int = 10_000,
    runner: SuperstepRunner | None = None,
    edges_mode: str = "bucketed",
) -> DataFrame:
    """Single-source shortest paths (non-negative weights), Bellman-Ford
    frontier relaxation. Returns (vid: long, dist: double); unreachable
    vertices omitted.
    """
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "sssp")
    edges = prepare_static_edges(graph.edges, runner, keys="src", mode=edges_mode, name_hint="sssp")

    dist = truncate_plan(
        spark.createDataFrame([(int(source), 0.0)], "vid long, dist double")
    ).persist()
    frontier = dist
    iteration = 0

    while iteration < max_iter:
        cand = (
            edges.join(frontier.select(F.col("vid").alias("src"), "dist"), "src")
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
            .withColumnRenamed("dst", "vid")
        )
        merged = dist.join(cand, "vid", "full").select(
            "vid",
            F.least(F.col("dist"), F.col("cand")).alias("dist"),
            (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias("improved"),
        )
        merged = truncate_plan(merged)
        improved = merged.filter(F.coalesce(F.col("improved"), F.lit(False)))
        n_improved = improved.count()
        iteration += 1
        runner.log(iteration, improved=n_improved)
        prev = dist
        dist = merged.select("vid", "dist").persist()
        prev.unpersist()
        frontier = improved.select("vid", "dist")
        if n_improved == 0:
            break

    runner.finalize()
    return dist


def harmonic_centrality(
    graph: Graph,
    sources: list[int] | None = None,
    n_sample: int = 8,
    max_iter: int = 10_000,
    runner: SuperstepRunner | None = None,
    edges_mode: str = "bucketed",
) -> DataFrame:
    """Bounded multi-source harmonic centrality:
    harm(v) = Σ_s 1/d(s, v) over the source set (d > 0, reachable).

    The standard scale approximation (exact all-pairs is O(n·m)):
    a deterministic bounded source sample, the same convention as
    betweenness_centrality's ``n_sample``. The source/batch dimension
    is folded into the state as a ``seed`` column (ops/batch.py
    vectorized batching; reference bc.hxx:253-271) so ONE frontier
    loop serves all sources; per superstep the frontier⋈edges advance
    + per-seed visited anti-join shuffle only frontier-scale rows
    against the bucketed static table.

    Returns (vid: long, harm: double), vertices reached by >= 1 source.
    """
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "harmonic")
    edges = prepare_static_edges(
        graph.edges.select("src", "dst"), runner, keys="src", mode=edges_mode, name_hint="harm"
    )
    if sources is None:
        sources = [
            r["vid"]
            for r in graph.vertices.select("vid").orderBy("vid").limit(n_sample).collect()
        ]
    dist = truncate_plan(
        spark.createDataFrame([(int(s), int(s), 0) for s in sources], "seed long, vid long, dist int")
    ).persist()
    frontier = dist.select("seed", "vid")
    depth = 0

    while depth < max_iter:
        nxt = (
            edges.join(frontier.withColumnRenamed("vid", "src"), "src")
            .select("seed", F.col("dst").alias("vid"))
            .dropDuplicates(["seed", "vid"])
            .join(dist.select("seed", "vid"), ["seed", "vid"], "left_anti")
        )
        depth += 1
        new = truncate_plan(nxt.withColumn("dist", F.lit(depth).cast("int")))
        n_new = new.count()
        runner.log(depth, frontier_size=n_new)
        if n_new == 0:
            break
        prev = dist
        dist = truncate_plan(dist.unionByName(new)).persist()
        prev.unpersist()
        frontier = new.select("seed", "vid")

    out = (
        dist.filter(F.col("dist") > 0)
        .groupBy("vid")
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("harm"))
    )
    runner.finalize()
    return out


def temporal_reachability(
    tedges: DataFrame,
    source: int,
    source_ts: int,
    max_iter: int = 10_000,
    runner: SuperstepRunner | None = None,
    edges_mode: str = "bucketed",
) -> DataFrame:
    """Earliest-arrival temporal reachability over time-stamped edges
    (src, dst, ets): a path is valid iff edge timestamps are
    non-decreasing, and arrival(v) is the minimum feasible arrival —
    standard temporal-graph semantics, here over transcript influence
    edges (io/transcripts.temporal_edges).

    SSSP-shaped label-correcting loop: relax ``arrival(dst) = min ets
    over edges with ets >= arrival(src)``. Arrival times only
    decrease and decreasing arrival(u) only ENLARGES its feasible
    edge set, so the fixpoint is exact (monotone). All values are
    integer microseconds — a fully FP-free operator, which is why its
    oracle hash is bit-exact by construction.

    Returns (vid: long, arrival_us: long) for reached vertices.
    """
    spark = tedges.sparkSession
    runner = runner or SuperstepRunner(spark, "temporal")
    edges = prepare_static_edges(
        tedges.select("src", "dst", "ets"), runner, keys="src", mode=edges_mode,
        name_hint="temporal",
    )
    arr = truncate_plan(
        spark.createDataFrame([(int(source), int(source_ts))], "vid long, arrival long")
    ).persist()
    frontier = arr
    it = 0

    while it < max_iter:
        msgs = (
            edges.join(
                frontier.select(F.col("vid").alias("src"), "arrival"), "src"
            )
            .filter(F.col("ets") >= F.col("arrival"))
            .groupBy("dst")
            .agg(F.min("ets").alias("cand"))
            .withColumnRenamed("dst", "vid")
        )
        improved = (
            msgs.join(arr, "vid", "left")
            .filter(F.col("arrival").isNull() | (F.col("cand") < F.col("arrival")))
            .select("vid", F.col("cand").alias("arrival"))
        )
        improved = truncate_plan(improved)
        n_new = improved.count()
        it += 1
        runner.log(it, frontier_size=n_new)
        if n_new == 0:
            break
        prev = arr
        arr = truncate_plan(
            arr.join(improved.select("vid"), "vid", "left_anti").unionByName(improved)
        ).persist()
        prev.unpersist()
        frontier = improved

    runner.finalize()
    return arr.select("vid", F.col("arrival").alias("arrival_us"))
