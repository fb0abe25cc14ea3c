"""Strongly connected components of a DIRECTED edge table — the
forward/backward min-label peel.

CC (algos/cc.py) treats the graph as undirected; transcript-derived
digraphs (tool-call transitions io/transcripts.tool_transitions,
temporal influence edges) need true SCC semantics: u and v share a
component iff each reaches the other along directed edges.

Algorithm (the parallel FW-BW/coloring family, standard BSP SCC in
the Pregel literature):

    repeat until no vertex is unassigned:
      f(v) = min vid over {ancestors of v} ∪ {v}     (forward min-label)
      b(v) = min vid over {descendants of v} ∪ {v}   (backward min-label)
      assign scc(v) = f(v) wherever f(v) == b(v)
      peel assigned vertices; keep only edges between survivors

Correctness: f(v) == b(v) == r means r reaches v AND v reaches r, so
v ∈ SCC(r); conversely every member of SCC(r) has identical ancestor
and descendant sets, hence identical (f, b). Each phase assigns at
least SCC(global min vid), so phases <= #SCCs; on real graphs a
handful of phases suffice (hub SCCs absorb most mass in phase 1 —
same "giant component first" behavior the FW-BW analysis proves).

Scale shape: each min-label fixpoint is the CC hash-min superstep on
a directed edge scan — one shuffle-agg per round, delta-frontier
(only vertices whose label changed propagate), truncate_plan between
rounds (engine/superstep.py stats hygiene). The peel is one
semi-join. No Python in the row path; vids are any orderable type
(string tool keys included).

Reference analogue: the reference ships hash-min CC
(essentials' sssp-style iterative primitives); SCC composes the same
advance/filter supersteps in both edge directions — capability
beyond the reference's undirected-only component operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan


def _min_label_fixpoint(
    vertices: DataFrame,
    edges: DataFrame,
    runner: SuperstepRunner,
    tag: str,
    max_rounds: int = 200,
    csr_blocks: DataFrame | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """(vid, lab): lab = min vid over ancestors-or-self along
    ``edges`` (src -> dst). Delta-frontier hash-min supersteps.

    ``csr_blocks``: packed per-bucket CSR arrays of the SAME edge set
    (graph/csr_blocks.build_csr_blocks) — the round's message
    aggregate then runs as the vectorized MIN-semiring gather kernel
    (csr_min_push, np.minimum.at) with zero edge-side exchange,
    exactly the connected_components_csr physical path; requires
    integral vids."""
    labels = truncate_plan(vertices.select("vid", F.col("vid").alias("lab"))).persist()
    frontier = labels  # changed-label set; round 0 = everything
    for r in range(max_rounds):
        if csr_blocks is not None:
            from essentials_spark.graph.csr_blocks import csr_min_push

            msgs = csr_min_push(
                csr_blocks,
                frontier.select("vid", F.col("lab").alias("label")),
                n_buckets,
                value_col="label",
            ).select(F.col("dst").alias("vid"), F.col("nbr_min").alias("cand"))
        else:
            msgs = (
                edges.join(frontier.select(F.col("vid").alias("src"), "lab"), "src")
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.min("lab").alias("cand"))
            )
        improved = (
            labels.join(msgs, "vid")
            .filter(F.col("cand") < F.col("lab"))
            .select("vid", F.col("cand").alias("lab"))
        )
        new_frontier = truncate_plan(improved).persist()
        n = new_frontier.count()
        runner.log(r + 1, **{f"{tag}_improved": n})
        if n == 0:
            new_frontier.unpersist()
            break
        new_labels = truncate_plan(
            labels.join(new_frontier.select("vid", F.col("lab").alias("nl")), "vid", "left")
            .select("vid", F.coalesce(F.col("nl"), F.col("lab")).alias("lab"))
        ).persist()
        labels.unpersist()
        if frontier is not labels:
            frontier.unpersist()
        labels, frontier = new_labels, new_frontier
    return labels


def strongly_connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    runner: SuperstepRunner | None = None,
    max_phases: int = 50,
    max_rounds: int = 200,
    kernel: str = "dataframe",
    n_buckets: int = 32,
) -> DataFrame:
    """(vid, scc) over a directed edge table (src, dst); scc is the
    minimum vid of the component. ``vertices``: (vid) — pass the full
    vertex set so isolated vertices land in their own singleton
    components.

    ``kernel='csr'`` (integral vids only): each phase packs the live
    forward and reverse edge sets into per-bucket CSR blocks once and
    runs every min-label round through the vectorized MIN-semiring
    gather kernel (csr_min_push) — zero edge-side exchange per round,
    the connected_components_csr physical path applied in both
    directions. A/B-exact with the dataframe kernel (pytest-pinned).
    """
    spark = edges.sparkSession
    runner = runner or SuperstepRunner(spark, "scc")
    remaining = truncate_plan(vertices.select("vid").distinct()).persist()
    live_edges = truncate_plan(
        edges.select(F.col("src").alias("vid"), F.col("dst"))
        .join(remaining, "vid")
        .select(F.col("vid").alias("src"), "dst")
        .join(remaining.select(F.col("vid").alias("dst")), "dst")
        .select("src", "dst")
        .distinct()
    ).persist()
    rev_edges = live_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assigned_parts: list[DataFrame] = []
    for phase in range(max_phases):
        if remaining.count() == 0:
            break
        fwd_blocks = bwd_blocks = None
        if kernel == "csr":
            from essentials_spark.graph.csr_blocks import build_csr_blocks

            fwd_blocks = build_csr_blocks(
                live_edges.withColumn("coef", F.lit(1.0)), n_buckets
            ).persist()
            bwd_blocks = build_csr_blocks(
                rev_edges.withColumn("coef", F.lit(1.0)), n_buckets
            ).persist()
        f = _min_label_fixpoint(
            remaining, live_edges, runner, f"p{phase}_fwd", max_rounds,
            csr_blocks=fwd_blocks, n_buckets=n_buckets,
        )
        b = _min_label_fixpoint(
            remaining, rev_edges, runner, f"p{phase}_bwd", max_rounds,
            csr_blocks=bwd_blocks, n_buckets=n_buckets,
        )
        joined = f.select("vid", F.col("lab").alias("f")).join(
            b.select("vid", F.col("lab").alias("b")), "vid"
        )
        done = truncate_plan(
            joined.filter(F.col("f") == F.col("b")).select("vid", F.col("f").alias("scc"))
        ).persist()
        n_done = done.count()
        runner.log(phase + 1, scc_assigned=n_done)
        assigned_parts.append(done)
        new_remaining = truncate_plan(
            joined.filter(F.col("f") != F.col("b")).select("vid")
        ).persist()
        new_edges = truncate_plan(
            live_edges.join(new_remaining.select(F.col("vid").alias("src")), "src")
            .join(new_remaining.select(F.col("vid").alias("dst")), "dst")
            .select("src", "dst")
        ).persist()
        for df in (remaining, live_edges, f, b):
            df.unpersist()
        for df in (fwd_blocks, bwd_blocks):
            if df is not None:
                df.unpersist()
        remaining, live_edges = new_remaining, new_edges
        rev_edges = live_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if not assigned_parts:
        runner.finalize()
        return vertices.select("vid", F.col("vid").alias("scc")).limit(0)
    out = assigned_parts[0]
    for df in assigned_parts[1:]:
        out = out.unionByName(df)
    runner.finalize()
    return out
