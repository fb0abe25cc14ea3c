"""Geolocation — infer unknown vertex coordinates from neighbors.

Reference: include/gunrock/algorithms/geo.hxx:264-391 — iterative
parallel_for over unlocated vertices; per round a vertex with located
neighbors takes
  1 neighbor  -> that location              (geo.hxx:341-356)
  2 neighbors -> their spherical midpoint   (geo.hxx:92-123, :359-362)
  > 2         -> the spatial median: arithmetic-mean init + Weiszfeld
                 iteration with haversine 1/d weights and the
                 Vardi-Zhang coincident-point correction
                 (geo.hxx:130-259), eps=1e-3
for ``total_iterations`` rounds.

Two modes:
- method='reference' (parity): the exact rules above; the Weiszfeld
  loop is a fixed unroll of pure column expressions over the
  (vertex, located-neighbor) pair set — every vertex iterates
  simultaneously, converged ones freeze (no per-row Python).
- method='mean' (oracle-simple): plain avg(lat)/avg(lon) of located
  neighbors for every case. This is a deliberate simplification used
  by the ANSI-SQL cross-engine oracle (arithmetic longitude averaging
  is wrong across the +/-180 wrap; the transcript anchors live in
  [0,90)x[0,180) so the oracle stays well-defined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.functions.geo_math import haversine_km, spherical_midpoint
from essentials_spark.graph.derive import Graph, canonicalize_edges


def _weiszfeld(pairs: DataFrame, init: DataFrame, iters: int, eps: float) -> DataFrame:
    """Spatial median per vid over its (nlat, nlon) point set.

    ``pairs``: (vid, nlat, nlon); ``init``: (vid, ylat, ylon) — the
    arithmetic mean, as in the reference (geo.hxx:161 'mean of all
    possible locations'). Fixed ``iters`` unroll; each vertex freezes
    once |y - y1| < eps (reference geo.hxx:231-238 returns there)."""
    y = init.select("vid", "ylat", "ylon", F.lit(False).alias("done"))
    for _ in range(iters):
        j = pairs.join(y, "vid")
        dist = haversine_km(F.col("nlat"), F.col("nlon"), F.col("ylat"), F.col("ylon"))
        j = j.withColumn("dist", dist).withColumn(
            "dinv", F.when(F.col("dist") == 0, F.lit(0.0)).otherwise(1.0 / F.col("dist"))
        )
        t = j.groupBy("vid").agg(
            F.sum("dinv").alias("dinvs"),
            F.count("*").alias("len"),
            F.sum((F.col("dist") != 0).cast("long")).alias("nonzeros"),
            F.sum(F.col("dinv") * F.col("nlat")).alias("wlat"),
            F.sum(F.col("dinv") * F.col("nlon")).alias("wlon"),
            F.first("ylat").alias("ylat"),
            F.first("ylon").alias("ylon"),
            F.first("done").alias("done"),
        )
        nz = F.col("len") - F.col("nonzeros")  # coincident neighbors
        tlat = F.col("wlat") / F.col("dinvs")
        tlon = F.col("wlon") / F.col("dinvs")
        # Vardi-Zhang step when the estimate sits on >=1 input point
        rlat = (tlat - F.col("ylat")) * F.col("dinvs")
        rlon = (tlon - F.col("ylon")) * F.col("dinvs")
        r = F.sqrt(rlat**2 + rlon**2)
        rinv = F.when(r == 0, F.lit(0.0)).otherwise(nz.cast("double") / r)
        y1lat = F.when(nz == 0, tlat).otherwise(
            F.greatest(F.lit(0.0), 1 - rinv) * tlat + F.least(F.lit(1.0), rinv) * F.col("ylat")
        )
        y1lon = F.when(nz == 0, tlon).otherwise(
            F.greatest(F.lit(0.0), 1 - rinv) * tlon + F.least(F.lit(1.0), rinv) * F.col("ylon")
        )
        all_zero = nz == F.col("len")  # every neighbor coincides: stop at y
        step = F.sqrt((F.col("ylat") - y1lat) ** 2 + (F.col("ylon") - y1lon) ** 2)
        newdone = F.col("done") | all_zero | (step < F.lit(eps))
        y = t.select(
            "vid",
            F.when(F.col("done") | all_zero, F.col("ylat")).otherwise(y1lat).alias("ylat"),
            F.when(F.col("done") | all_zero, F.col("ylon")).otherwise(y1lon).alias("ylon"),
            newdone.alias("done"),
        )
        y = truncate_plan(y)
    return y.select("vid", F.col("ylat").alias("lat"), F.col("ylon").alias("lon"))


def geolocate(
    graph: Graph,
    known: DataFrame,
    max_iter: int = 50,
    runner: SuperstepRunner | None = None,
    edges_mode: str = "bucketed",
    method: str = "mean",
    spatial_iters: int = 8,
    eps: float = 1e-3,
) -> DataFrame:
    """known: (vid, lat, lon). Returns (vid, lat, lon) for every vertex
    that is connected to at least one located vertex.

    Delta frontier (reference geo.hxx:264-391 — its per-round work is
    likewise proportional to the unlocated frontier): only vertices
    located LAST round push coordinates. This is exact, not an
    approximation: a vertex still unlocated at round t had no located
    neighbor before round t-1 (it would have been located then), so
    all of its located neighbors are in the frontier. Per round the
    shuffled state is the frontier and its neighborhood; the full
    ``located`` set is only scanned (via a broadcast membership probe)
    when the frontier is small, never re-exchanged."""
    from essentials_spark.engine.static_table import (
        STATE_BROADCAST_MAX_ROWS,
        hint_state_join,
        prepare_static_edges,
    )

    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "geo")
    edges = prepare_static_edges(
        canonicalize_edges(graph.edges, symmetrize=True, dedup=True, drop_self_loops=True).select("src", "dst"),
        runner, keys="src", mode=edges_mode, name_hint="geo",
    )
    located = truncate_plan(known.select("vid", "lat", "lon")).persist()
    front = located
    front_rows = front.count()

    # broadcast-probe gate: the frames broadcast below (cand_ids, hit)
    # are bounded by the frontier's NEIGHBORHOOD, not its row count —
    # one hub in a small frontier makes them edge-scale. Gate on
    # sum(deg(frontier)) like algos/cc.py; the degree table comes from
    # the bucketed edge scan (no shuffle) on first use.
    _deg_cache: dict = {}

    def frontier_msg_mass(f: DataFrame) -> int:
        if "deg" not in _deg_cache:
            d = edges.groupBy("src").agg(F.count("*").alias("_deg")).persist()
            _deg_cache["deg"] = d
            runner.defer(d.unpersist)
        row = (
            _deg_cache["deg"]
            .join(F.broadcast(f.select(F.col("vid").alias("src"))), "src")
            .agg(F.sum("_deg"))
            .collect()[0][0]
        )
        return int(row or 0)

    it = 0
    while it < max_iter:
        pushed = (
            edges.join(
                hint_state_join(front.withColumnRenamed("vid", "src"), front_rows), "src"
            )
            .select(F.col("dst").alias("vid"), F.col("lat").alias("nlat"), F.col("lon").alias("nlon"))
        )
        if front_rows < STATE_BROADCAST_MAX_ROWS and frontier_msg_mass(
            front
        ) < 4 * STATE_BROADCAST_MAX_ROWS:
            # membership probe without exchanging `located`: probe the
            # (cached, narrow) located scan with the broadcast frontier
            # neighborhood, then null-filter — all exchanges are
            # frontier-scale. (An anti-join would build the hash table
            # from `located`, re-shuffling the cumulative set per round
            # — the round-1 finding this frontier formulation fixes.)
            cand_ids = pushed.select("vid").distinct()
            hit = located.join(F.broadcast(cand_ids), "vid").select("vid", F.lit(1).alias("_loc"))
            pairs = (
                pushed.join(F.broadcast(hit), "vid", "left")
                .filter(F.col("_loc").isNull())
                .drop("_loc")
            )
        else:
            pairs = pushed.join(located.select("vid"), "vid", "left_anti")
        if method == "mean":
            new = pairs.groupBy("vid").agg(F.avg("nlat").alias("lat"), F.avg("nlon").alias("lon"))
        else:
            stats = pairs.groupBy("vid").agg(
                F.count("*").alias("n"),
                F.min(F.struct(F.col("nlat").alias("a"), F.col("nlon").alias("o"))).alias("p1"),
                F.max(F.struct(F.col("nlat").alias("a"), F.col("nlon").alias("o"))).alias("p2"),
                F.avg("nlat").alias("ylat"),
                F.avg("nlon").alias("ylon"),
            )
            stats = truncate_plan(stats).persist()
            mid_lat, mid_lon = spherical_midpoint(
                F.col("p1.a"), F.col("p1.o"), F.col("p2.a"), F.col("p2.o")
            )
            easy = stats.filter(F.col("n") <= 2).select(
                "vid",
                F.when(F.col("n") == 1, F.col("p1.a")).otherwise(mid_lat).alias("lat"),
                F.when(F.col("n") == 1, F.col("p1.o")).otherwise(mid_lon).alias("lon"),
            )
            hard_ids = stats.filter(F.col("n") > 2)
            hard = _weiszfeld(
                pairs.join(hard_ids.select("vid"), "vid", "left_semi"),
                hard_ids.select("vid", "ylat", "ylon"),
                iters=spatial_iters,
                eps=eps,
            )
            new = easy.unionByName(hard)
        new = truncate_plan(new)  # materializes: round intermediates now releasable
        if method != "mean":
            stats.unpersist()
        n_new = new.count()
        it += 1
        runner.log(it, located=n_new, frontier_rows=front_rows)
        if n_new == 0:
            break
        prev = located
        located = truncate_plan(located.unionByName(new)).persist()
        prev.unpersist()
        # next round: only the newly located push. `new` was
        # truncate_plan'd (eager localCheckpoint) above, so the frontier
        # is a materialized LogicalRDD LEAF — next round's `pushed`
        # join, frontier_msg_mass collect, and the located union all
        # read stored blocks, never re-evaluating prior rounds' joins
        # (the O(rounds^2) lineage blowup truncate_plan exists to stop).
        front = new
        front_rows = n_new

    runner.finalize()
    return located
