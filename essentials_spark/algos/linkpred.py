"""Neighborhood-overlap link prediction: common neighbors, Jaccard,
Adamic-Adar.

The training-data side of triangle counting: the same wedge stream the
TC operator enumerates (algos/tc.py; reference
algorithms/tc.hxx:58-74's intersection semantics), aggregated per
ENDPOINT PAIR instead of per vertex, scoring non-adjacent pairs as
link candidates — the standard features for link-prediction training
sets and graph-completion curricula over a 10^12-turn transcript graph.

Scores for a non-adjacent pair (u, w), N() over the symmetrized graph:

    cn  = |N(u) ∩ N(w)|
    jac = cn / (|N(u)| + |N(w)| - cn)
    aa  = Σ_{v ∈ N(u)∩N(w)} 1 / ln(deg(v))

Plan shape: wedge enumeration is ONE self-join of the src-bucketed
symmetrized table on the center vertex (u < w cuts each pair to one
row), then a single groupBy(u, w) with map-side partials; the
candidate filter is a left-anti join against the same edge table, and
degree decoration two broadcast-or-shuffle-hash joins against the
n-scale degree table. Every wedge center contributes deg(v) >= 2 (it
needs two distinct neighbors), so ln(deg) is never 0.

At 100 TB the wedge stream is Σ deg(v)^2 — hub-quadratic. Mitigations,
both standard: ``center_cap`` drops wedge centers above a degree cap
(documented approximation — a celebrity hub's common-neighbor signal is
near-useless for link prediction anyway, which is why production
systems cap it), and ``min_cn`` thresholds the aggregate before the
anti-join so the output never materializes the 1-common-neighbor tail.
The self-join inherits the engine's AQE skew-split configuration
(engine/skew.py) for moderate hubs below the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.graph.derive import Graph, canonicalize_edges


def linkpred_scores(
    graph: Graph,
    min_cn: int = 2,
    center_cap: int | None = None,
    pre_symmetrized: bool = False,
) -> DataFrame:
    """Returns (u, w, cn, jac, aa) for non-adjacent pairs u < w with at
    least ``min_cn`` common neighbors. Exact when ``center_cap`` is
    None; with a cap, wedge centers of degree > cap are excluded
    (bounded-skew approximation, see module docstring)."""
    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    sym = edges.select("src", "dst")
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))

    centers = deg
    if center_cap is not None:
        centers = deg.filter(F.col("deg") <= center_cap)
    # wedge stream: (v, u) ⋈ (v, w), u < w; contribution 1/ln(deg(v))
    e1 = sym.join(centers.select("src", "deg"), "src").select(
        F.col("src").alias("v"), F.col("dst").alias("u"), F.col("deg").alias("cdeg")
    )
    e2 = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "v").filter(F.col("u") < F.col("w"))

    pair = wedges.groupBy("u", "w").agg(
        F.count("*").alias("cn"),
        F.sum(F.lit(1.0) / F.log(F.col("cdeg"))).alias("aa"),
    ).filter(F.col("cn") >= min_cn)

    # drop already-adjacent pairs (sym holds both directions, so one
    # orientation check suffices for u < w pairs)
    cand = pair.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_anti",
    )

    du = deg.select(F.col("src").alias("u"), F.col("deg").alias("du"))
    dw = deg.select(F.col("src").alias("w"), F.col("deg").alias("dw"))
    return (
        cand.join(du, "u")
        .join(dw, "w")
        .select(
            "u",
            "w",
            "cn",
            (F.col("cn") / (F.col("du") + F.col("dw") - F.col("cn"))).alias("jac"),
            "aa",
        )
    )
