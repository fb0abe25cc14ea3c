"""Degree-2 chain contraction — derivation-layer preprocessing for
traversal on high-diameter graphs.

Transcript-derived link graphs are DIAMETER-dominated: a conversation
is an 86-turn path, so BFS/SSSP/BC/diameter pay one superstep per hop
even though almost every hop crosses a degree-2 "chain" vertex with no
branching choice. This module contracts every maximal path whose
interior vertices have degree exactly 2 into a single weighted
SUPER-EDGE (endpoints = branch points / tool hubs / chain ends),
keeping an exact REHYDRATION map so per-vertex results on the original
graph are recovered bit-exactly. The machinery is the same contraction
idea as Boruvka MST's supervertex collapse (reference
include/gunrock/algorithms/mst.hxx:173-220), applied to the derivation
layer: traversals then run over a graph whose vertex count ~ #branch
points and whose hop-diameter is the CONTRACTED diameter (for
conversation graphs, a handful), not the turn count.

Construction is pure list ranking (Wyllie pointer jumping, public
classic): each interior vertex owns two HALF-EDGES (one per
direction); pointer doubling composes them until every half-edge
reaches a non-interior endpoint — O(log max-chain-length) rounds, each
one interior-scale self-join. No per-row Python anywhere. Pure
degree-2 CYCLES never finalize; their vertices are simply excluded
from contraction (detected when the non-final count stops shrinking),
so correctness never depends on the graph being cycle-free.

Exactness: interiors have no branching, so any path through a chain
traverses it whole, and a shortest path to an interior vertex v is a
shortest path to one of its chain endpoints plus the in-chain prefix:
dist(v) = min(dist(A) + dA, dist(B) + dB). Both hop counts and weight
sums are carried, so BFS and weighted SSSP rehydrate exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import truncate_plan


@dataclass
class ChainContraction:
    """Result handle.

    - ``super_edges``: (src, dst, hops long, weight double, chain_id
      long) — SYMMETRIC contracted edge set over terminal vertices:
      one pair of rows per maximal chain (chain_id = the interior
      vertex adjacent to the src-side endpoint; parallel chains stay
      distinct rows) plus every original terminal-terminal edge with
      hops=1 (chain_id null).
    - ``interior``: (vid, end_a, da_hops, da_w, last_a, end_b,
      db_hops, db_w, last_b, chain_id, pos_hops, pos_w) — one row per
      contracted interior vertex; ``last_*`` is the interior vertex
      adjacent to that endpoint, ``chain_id`` is the p-side head (one
      value per maximal chain, shared by all its members), and
      ``pos_hops``/``pos_w`` are the member's hop/weight prefix from
      the p endpoint (a consistent in-chain coordinate, used for
      interior-source traversals and chain-aware BC).
    - ``terminals``: (vid) — vertices present in the contracted graph
      (non-interior, incl. degree-2 vertices protected by ``keep`` and
      pure-cycle members).
    """

    super_edges: DataFrame
    interior: DataFrame
    terminals: DataFrame

    def release(self) -> None:
        for df in (self.super_edges, self.interior, self.terminals):
            try:
                df.unpersist()
            except Exception:
                pass


def chain_contraction(
    vertices: DataFrame,
    edges: DataFrame,
    keep: DataFrame | None = None,
    max_rounds: int = 64,
) -> ChainContraction:
    """Contract maximal degree-2 chains of a SYMMETRIZED, deduplicated,
    self-loop-free edge set (src, dst[, weight]; weight defaults 1.0).

    ``keep``: optional (vid) rows that must stay terminal even at
    degree 2 — traversal sources pass themselves here so rehydration
    never has to handle an interior source."""
    e = edges.select("src", "dst", *(["weight"] if "weight" in edges.columns else []))
    if "weight" not in e.columns:
        e = e.withColumn("weight", F.lit(1.0))

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    interior0 = deg.filter(F.col("deg") == 2).select(F.col("src").alias("vid"))
    if keep is not None:
        interior0 = interior0.join(keep.select("vid"), "vid", "left_anti")

    # per-interior neighbor pair, dst-ascending (deg==2 guarantees two
    # distinct rows after dedup) — ONE aggregation carries both
    # neighbor ids and both edge weights
    nb = truncate_plan(
        e.join(interior0.select(F.col("vid").alias("src")), "src")
        .groupBy("src")
        .agg(F.sort_array(F.collect_list(F.struct("dst", "weight"))).alias("ns"))
        .select(
            F.col("src").alias("vid"),
            F.col("ns")[0]["dst"].alias("n1"),
            F.col("ns")[0]["weight"].alias("w1"),
            F.col("ns")[1]["dst"].alias("n2"),
            F.col("ns")[1]["weight"].alias("w2"),
        )
    ).persist()

    # half-edges: (v, x) = standing at interior v, walking toward x.
    # State: end/hops/w = farthest composed position; final once the
    # walk exits the interior set; (nv, nx) = next half-edge to
    # compose with; last = interior vertex adjacent to the endpoint
    # (set exactly when the final hop is taken).
    h0 = nb.select("vid", F.col("n1").alias("x"), F.col("w1").alias("w")).unionByName(
        nb.select("vid", F.col("n2").alias("x"), F.col("w2").alias("w"))
    )
    x_side = nb.select(
        F.col("vid").alias("x"), F.col("n1").alias("xn1"), F.col("n2").alias("xn2")
    )
    cur = truncate_plan(
        h0.join(x_side, "x", "left").select(
            F.col("vid").alias("v"),
            "x",
            F.col("x").alias("end"),
            F.lit(1).cast("long").alias("hops"),
            F.col("w").cast("double").alias("w"),
            F.col("xn1").isNull().alias("final"),
            F.when(F.col("xn1").isNotNull(), F.col("x")).alias("nv"),
            F.when(
                F.col("xn1").isNotNull(),
                F.when(F.col("xn1") == F.col("vid"), F.col("xn2")).otherwise(F.col("xn1")),
            ).alias("nx"),
            F.when(F.col("xn1").isNull(), F.col("vid")).alias("last"),
        )
    ).persist()

    # Wyllie pointer doubling: compose each non-final half-edge with
    # the half-edge it points at; distance covered doubles per round.
    n_interior = nb.count()
    for _ in range(max_rounds):
        row = cur.filter(~F.col("final")).agg(
            F.count(F.lit(1)).alias("c"), F.min("hops").alias("minh")
        ).collect()[0]
        if row["c"] == 0:
            break
        if row["minh"] is not None and row["minh"] > n_interior:
            # every remaining non-final walk is longer than any simple
            # chain can be — all are pure cycles (pointers rotate
            # forever); stop and let them fall back to terminals
            break
        s = cur.select(
            F.col("v").alias("sv"), F.col("x").alias("sx"),
            F.col("end").alias("send"), F.col("hops").alias("shops"),
            F.col("w").alias("sw"), F.col("final").alias("sfinal"),
            F.col("nv").alias("snv"), F.col("nx").alias("snx"),
            F.col("last").alias("slast"),
        )
        nxt = (
            cur.join(s, (cur.nv == s.sv) & (cur.nx == s.sx), "left")
            .select(
                "v", "x",
                F.when(F.col("final"), F.col("end")).otherwise(F.col("send")).alias("end"),
                F.when(F.col("final"), F.col("hops")).otherwise(F.col("hops") + F.col("shops")).alias("hops"),
                F.when(F.col("final"), F.col("w")).otherwise(F.col("w") + F.col("sw")).alias("w"),
                F.when(F.col("final"), F.lit(True)).otherwise(F.coalesce(F.col("sfinal"), F.lit(False))).alias("final"),
                F.when(F.col("final"), F.lit(None).cast("long")).otherwise(F.col("snv")).alias("nv"),
                F.when(F.col("final"), F.lit(None).cast("long")).otherwise(F.col("snx")).alias("nx"),
                F.when(F.col("final"), F.col("last")).otherwise(F.col("slast")).alias("last"),
            )
        )
        old = cur
        cur = truncate_plan(nxt).persist()
        old.unpersist()

    # pure-cycle members: any vertex still owning a non-final half-edge
    # falls back to terminal status (its edges pass through verbatim)
    cyc = cur.filter(~F.col("final")).select("v").distinct()
    resolved = cur.filter(F.col("final")).join(
        cyc.withColumnRenamed("v", "cv"), cur.v == F.col("cv"), "left_anti"
    )

    # interior map: fold the two directions back into one row (the
    # dst-ascending x order makes direction assignment deterministic),
    # then canonicalize an orientation per CHAIN so every member agrees
    # on chain identity and position:
    # - non-loop chain (end_a != end_b): the "p side" is the smaller
    #   endpoint;
    # - loop chain (both directions exit at the same terminal): the
    #   p side is the one whose adjacent-head interior vertex is
    #   smaller (endpoints tie, heads cannot).
    # chain_id := the head interior vertex on the p side — an interior
    # vertex belongs to exactly one chain, so this is chain-unique and
    # identical for every member; pos := hops walking in from p.
    base = (
        resolved.groupBy("v")
        .agg(F.sort_array(F.collect_list(F.struct("x", "end", "hops", "w", "last"))).alias("ds"))
        .select(
            F.col("v").alias("vid"),
            F.col("ds")[0]["end"].alias("end_a"),
            F.col("ds")[0]["hops"].alias("da_hops"),
            F.col("ds")[0]["w"].alias("da_w"),
            F.col("ds")[0]["last"].alias("last_a"),
            F.col("ds")[1]["end"].alias("end_b"),
            F.col("ds")[1]["hops"].alias("db_hops"),
            F.col("ds")[1]["w"].alias("db_w"),
            F.col("ds")[1]["last"].alias("last_b"),
        )
    )
    use_a = F.when(
        F.col("end_a") != F.col("end_b"), F.col("end_a") < F.col("end_b")
    ).otherwise(F.col("last_a") <= F.col("last_b"))
    interior = truncate_plan(
        base.withColumns(
            {
                "chain_id": F.when(use_a, F.col("last_a")).otherwise(F.col("last_b")),
                "pos_hops": F.when(use_a, F.col("da_hops")).otherwise(F.col("db_hops")),
                "pos_w": F.when(use_a, F.col("da_w")).otherwise(F.col("db_w")),
            }
        )
    ).persist()
    nb.unpersist()
    cur.unpersist()

    # one super-edge per maximal chain: every member emits the same
    # (endpoints sorted, total hops/weight, head pair) tuple; the head
    # pair (interior vertices adjacent to each endpoint) keeps PARALLEL
    # same-length chains distinct. chain_id = head on the src side.
    int_use_a = F.when(
        F.col("end_a") != F.col("end_b"), F.col("end_a") < F.col("end_b")
    ).otherwise(F.col("last_a") <= F.col("last_b"))
    chains = truncate_plan(
        interior.select(
            F.when(int_use_a, F.col("end_a")).otherwise(F.col("end_b")).alias("p"),
            F.when(int_use_a, F.col("end_b")).otherwise(F.col("end_a")).alias("q"),
            (F.col("da_hops") + F.col("db_hops")).alias("hops"),
            (F.col("da_w") + F.col("db_w")).alias("weight"),
            F.when(int_use_a, F.col("last_a")).otherwise(F.col("last_b")).alias("head_p"),
            F.when(int_use_a, F.col("last_b")).otherwise(F.col("last_a")).alias("head_q"),
        ).distinct()
    ).persist()

    terminals = truncate_plan(
        vertices.select("vid").join(interior.select("vid"), "vid", "left_anti")
    ).persist()

    passthrough = (
        e.join(interior.select(F.col("vid").alias("src")), "src", "left_anti")
        .join(interior.select(F.col("vid").alias("dst")), "dst", "left_anti")
        .select(
            "src", "dst", F.lit(1).cast("long").alias("hops"),
            F.col("weight").cast("double").alias("weight"),
            F.lit(None).cast("long").alias("chain_id"),
        )
    )
    chain_edges = chains.select(
        F.col("p").alias("src"), F.col("q").alias("dst"), "hops", "weight",
        F.col("head_p").alias("chain_id"),
    ).unionByName(
        chains.filter(F.col("p") != F.col("q")).select(
            F.col("q").alias("src"), F.col("p").alias("dst"), "hops", "weight",
            F.col("head_q").alias("chain_id"),
        )
    )
    super_edges = truncate_plan(passthrough.unionByName(chain_edges)).persist()
    chains.unpersist()
    return ChainContraction(super_edges=super_edges, interior=interior, terminals=terminals)


def expand_distances(
    contraction: ChainContraction,
    dist: DataFrame,
    value_col: str = "dist",
    use_hops: bool = True,
) -> DataFrame:
    """Rehydrate per-vertex distances: given (vid, <value_col>) over
    TERMINAL vertices (reachable only), return the same over ALL
    reachable original vertices. Interior v takes
    min(dist(end_a) + prefix_a, dist(end_b) + prefix_b), null-safe
    (F.least skips an unreachable side); ``use_hops`` picks the hop
    prefix (BFS) vs the weight prefix (SSSP)."""
    da = F.col("da_hops") if use_hops else F.col("da_w")
    db = F.col("db_hops") if use_hops else F.col("db_w")
    d_a = dist.select(F.col("vid").alias("end_a"), F.col(value_col).alias("dist_a"))
    d_b = dist.select(F.col("vid").alias("end_b"), F.col(value_col).alias("dist_b"))
    interior_dist = (
        contraction.interior.join(d_a, "end_a", "left")
        .join(d_b, "end_b", "left")
        .select(
            "vid",
            F.least(F.col("dist_a") + da, F.col("dist_b") + db).alias(value_col),
        )
        .filter(F.col(value_col).isNotNull())
    )
    return dist.select("vid", value_col).unionByName(interior_dist)
