"""Modularity-gain community moves (Louvain phase-1, synchronous).

Sync label propagation provably oscillates on chain-dominated
transcript graphs (BENCH §3i: 2-cycles keep 98 % of vertices flipping
forever). The Louvain move criterion fixes the objective: each round,
every vertex moves to the candidate community c (its neighbors' plus
its own) maximizing the modularity gain of Blondel et al. (2008),

    ΔQ(i→c) ∝ score(i,c) = 2m·e_ic − k_i·(D_c − k_i·[L(i)=c])

an INTEGER in both engines: e_ic = edges from i into c, k_i = degree,
D_c = community degree mass, 2m = |sym rows|. The self-community term
subtracts k_i from D_c (i is removed before evaluating its options —
the standard formulation), so "stay" competes on equal footing. Ties
break to the smallest label; every step is exact integer algebra, so
the DuckDB oracle replays the full schedule bit-for-bit (labels in
key space, order-isomorphic to vids).

``mode='semi'`` applies the same alternating-parity half-schedule as
label_propagation(mode='semi') (algos/lp.py): round r moves only the
vertices with parity r % 2; the rest hold their community. Sync
Louvain 2-cycles on degree-2 pairs exactly like sync LP (both ends of
a pendant edge swap into each other's community forever); the
half-schedule breaks every 2-cycle and converges to a fixpoint of the
sequential move criterion on chain-dominated transcript graphs.

Scale shape per round: one groupBy for D_c (community-count scale),
one edge⋈labels + groupBy for e_ic (the advance/scatter shape every
superstep algorithm here pays), one struct-min argmax — no windows,
no n² anything. Integer bound: 2m·k_max < 2^63 holds to ~10^12 edges
with 10^6-degree hubs; beyond that, promote score to decimal(38,0).

Reference anchor: the reference has no community detection beyond
label propagation (algorithms/... pr/cc/color families); this is a
beyond-reference capability gated like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.graph.derive import Graph


def _degrees(g: Graph) -> DataFrame:
    deg = g.edges.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("k"))
    return (
        g.vertices.select("vid")
        .join(deg, "vid", "left")
        .select("vid", F.coalesce(F.col("k"), F.lit(0)).cast("long").alias("k"))
    )


def louvain_move_round(
    g: Graph,
    labels: DataFrame,
    degrees: DataFrame,
    two_m: int,
    movers: DataFrame | None = None,
) -> DataFrame:
    """One synchronous move round; returns the new (vid, label).

    ``movers``: optional (vid) restriction — only these vertices may
    change community this round (the semi-sync half-schedule); all
    others keep their label. Scores still read the FULL label state
    (D_c, e_ic are global), only the adoption is restricted.
    """
    dmass = (
        labels.join(degrees, "vid")
        .groupBy("label")
        .agg(F.sum("k").alias("d_c"))
    )
    nbr = (
        g.edges.select("src", "dst")
        .join(labels.select(F.col("vid").alias("dst"), F.col("label").alias("lc")), "dst")
        .groupBy(F.col("src").alias("vid"), "lc")
        .agg(F.count("*").cast("long").alias("e_ic"))
    )
    own = labels.select("vid", F.col("label").alias("lc"), F.lit(0).cast("long").alias("e_ic"))
    cand = (
        nbr.unionByName(own)
        .groupBy("vid", "lc")
        .agg(F.sum("e_ic").alias("e_ic"))
    )
    scored = (
        cand.join(labels, "vid")
        .join(degrees, "vid")
        .join(dmass.select(F.col("label").alias("lc"), "d_c"), "lc", "left")
        .select(
            "vid",
            "lc",
            (
                F.lit(int(two_m)) * F.col("e_ic")
                - F.col("k")
                * (
                    F.coalesce(F.col("d_c"), F.lit(0))
                    - F.when(F.col("lc") == F.col("label"), F.col("k")).otherwise(F.lit(0))
                )
            ).alias("score"),
        )
    )
    picked = scored.groupBy("vid").agg(
        F.min(F.struct((-F.col("score")).alias("s"), F.col("lc").alias("l")))["l"].alias("label")
    )
    if movers is None:
        return picked
    # restricted adoption: movers take the argmax, the rest hold. The
    # left join keeps this one exchange on the (small) picked side —
    # labels is already hash-partitioned by vid from the prior round.
    return (
        labels.join(movers.select("vid", F.lit(True).alias("_mv")), "vid", "left")
        .join(picked.select("vid", F.col("label").alias("_new")), "vid", "left")
        .select(
            "vid",
            F.when(F.col("_mv").isNotNull(), F.coalesce(F.col("_new"), F.col("label")))
            .otherwise(F.col("label"))
            .alias("label"),
        )
    )


def louvain(
    g: Graph,
    rounds: int = 2,
    mode: str = "sync",
    semi_parity: DataFrame | None = None,
) -> DataFrame:
    """`rounds` Louvain phase-1 move rounds from singleton
    communities; returns (vid, label). Deterministic — fixed round
    count, integer scores, smallest-label ties.

    ``mode='semi'``: round r moves only vertices whose parity
    (``semi_parity``: (vid, par in {0,1}); default vid % 2) equals
    r % 2 — the LP half-schedule, breaking sync 2-cycles."""
    from essentials_spark.engine.superstep import truncate_plan

    if mode not in ("sync", "semi"):
        raise ValueError(f"unknown louvain mode {mode!r}")
    degrees = truncate_plan(_degrees(g))
    two_m = g.edges.count()
    labels = g.vertices.select("vid", F.col("vid").alias("label"))
    par = None
    if mode == "semi":
        par = semi_parity or g.vertices.select(
            "vid", F.pmod(F.col("vid"), F.lit(2)).cast("int").alias("par")
        )
        par = truncate_plan(par.select("vid", F.col("par").cast("int").alias("par")))
    for r in range(rounds):
        movers = par.filter(F.col("par") == r % 2).select("vid") if par is not None else None
        labels = truncate_plan(louvain_move_round(g, labels, degrees, two_m, movers=movers))
    return labels
