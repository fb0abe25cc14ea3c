"""K-core decomposition — h-index fixpoint (bulk path) + peeling (A/B).

Reference: include/gunrock/algorithms/kcore.hxx:112-199 — for k = 1..:
repeatedly delete vertices with remaining degree < k (advance +
parallel_for + predicated filter); a vertex's core number is the
largest k at which it survives (peeled during round k => core = k-1).

Two algorithms, identical results:

- ``method='hindex'`` (default): the iterated neighbor-h-index
  fixpoint (Lü et al. 2016, "The H-index of a network node"):
  c_0 = degree; c_{t+1}(v) = H({c_t(u) : u ~ v}), where H is the
  largest h such that at least h neighbors have value >= h. Converges
  to the coreness in a NUMBER OF BULK ROUNDS (typically O(10-20) even
  on web graphs), each round one edge-scale shuffle — the scale path.
  On a power-law graph with core numbers in the hundreds, peeling
  costs O(max_core + #waves) driver round-trips; h-index doesn't.
- ``method='peel'``: direct reference-parity peeling, kept as the
  structurally independent A/B cross-check (tests compare the two).

Scale shape (both): the symmetrized edge table is persisted ONCE as a
src-bucketed table. h-index rounds recompute H only for vertices with
at least one CHANGED neighbor (delta frontier — late rounds touch a
shrinking subgraph); peel sub-rounds move only the victims' adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from essentials_spark.engine.static_table import hint_state_join, prepare_static_edges
from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def kcore(
    graph: Graph,
    max_k: int = 1000,
    runner: SuperstepRunner | None = None,
    pre_symmetrized: bool = False,
    edges_mode: str = "bucketed",
    method: str = "hindex",
) -> DataFrame:
    """Returns (vid: long, core: int) for every vertex (0 if isolated)."""
    if method == "hindex":
        return kcore_hindex(
            graph, max_rounds=max_k, runner=runner,
            pre_symmetrized=pre_symmetrized, edges_mode=edges_mode,
        )
    return kcore_peel(
        graph, max_k=max_k, runner=runner,
        pre_symmetrized=pre_symmetrized, edges_mode=edges_mode,
    )


def kcore_hindex(
    graph: Graph,
    max_rounds: int = 1000,
    runner: SuperstepRunner | None = None,
    pre_symmetrized: bool = False,
    edges_mode: str = "bucketed",
) -> DataFrame:
    """Neighbor-h-index fixpoint (module docstring). Per round:

      msgs(v)  = {c(u) : u -> v}        (state join into bucketed edges)
      H(v)     = max over rank r of min(r, c_r)   (window row_number,
                 the same formulation as the driver-gate SQL oracle)
      c(v)    <- coalesce(H(v), 0)

    Delta frontier: once converged vertices stop changing, H is
    recomputed only for vertices with >= 1 changed neighbor; everyone
    else keeps c. The window partitions by dst, so a hub's neighbor
    list sorts within one partition — the same skew shape as any
    per-vertex top-k; bounded because H(v) <= deg(v) means late rounds
    only carry low-degree stragglers."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "kcore_hindex")
    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    edges = prepare_static_edges(
        edges.select("src", "dst"), runner, keys="src", mode=edges_mode, name_hint="kcoreh"
    )
    m = edges.count()

    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "vid")
    state = truncate_plan(
        graph.vertices.select("vid")
        .join(deg, "vid", "left")
        .select("vid", F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("c"))
    ).persist()
    n = state.count()
    if runner.fingerprint is None:
        runner.fingerprint = f"kcore_hindex:n={n}:m={m}"

    # changed set: vertices whose c moved last round (all, at start)
    changed = state.select("vid")
    changed_rows = n
    rounds = 0
    w = Window.partitionBy("dst").orderBy(F.desc("c"), "src")
    while rounds < max_rounds:
        # state joins into the bucketed edge layout (state side moves,
        # edges never re-shuffle); vertices with >= 1 changed neighbor
        # need a fresh H, the rest keep c verbatim. The affected filter
        # is applied AFTER the src-side join (on the message stream, a
        # frontier-scale broadcast/hash join keyed by dst) so the
        # static table is only ever scanned, never re-keyed by dst.
        joined = edges.join(hint_state_join(state.select(F.col("vid").alias("src"), "c"), n), "src")
        if changed_rows < n:
            affected = (
                edges.join(
                    hint_state_join(changed.select(F.col("vid").alias("src")), changed_rows), "src"
                )
                .select(F.col("dst"))
                .distinct()
            )
            # affected is bounded by |changed| * avg_deg — frontier-
            # scale in late rounds; its row count is unknown without an
            # action, so hint by the changed count (a proxy within one
            # degree factor; worst case we shuffle_hash a small set)
            joined = joined.join(hint_state_join(affected, changed_rows), "dst")
        hidx = (
            joined.withColumn("rn", F.row_number().over(w))
            .groupBy("dst")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("c"))).alias("h"))
            .withColumnRenamed("dst", "vid")
        )
        if changed_rows < n:
            # non-affected vertices keep c: left join (h null => keep)
            new_state = (
                state.join(hidx, "vid", "left")
                .select("vid", F.coalesce(F.col("h"), F.col("c")).alias("c"), F.col("c").alias("old"))
            )
        else:
            # full round: isolated vertices (no in-messages) -> 0,
            # mirroring the oracle's coalesce(h, 0)
            new_state = (
                state.join(hidx, "vid", "left")
                .select("vid", F.coalesce(F.col("h"), F.lit(0)).alias("c"), F.col("c").alias("old"))
            )
        new_state = runner.materialize(new_state, rounds + 1)
        delta = new_state.filter(F.col("c") != F.col("old")).select("vid")
        changed_rows = delta.count()
        rounds += 1
        runner.log(rounds, changed=changed_rows, edges_processed=m)
        state.unpersist()
        state = new_state.drop("old").persist()
        changed = delta
        if changed_rows == 0:
            break

    out = state.select("vid", F.col("c").cast("int").alias("core"))
    runner.finalize()
    return out


def kcore_peel(
    graph: Graph,
    max_k: int = 1000,
    runner: SuperstepRunner | None = None,
    pre_symmetrized: bool = False,
    edges_mode: str = "bucketed",
) -> DataFrame:
    """Reference-parity peeling (kcore.hxx:112-199): returns
    (vid: long, core: int) for every vertex (0 if isolated)."""
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "kcore")
    edges = graph.edges if pre_symmetrized else canonicalize_edges(
        graph.edges, symmetrize=True, dedup=True, drop_self_loops=True
    )
    edges = prepare_static_edges(edges.select("src", "dst"), runner, keys="src", mode=edges_mode, name_hint="kcore")

    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "vid")
    state = truncate_plan(
        graph.vertices.select("vid")
        .join(deg, "vid", "left")
        .select("vid", F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"))
    ).persist()

    peeled: list[DataFrame] = []  # (vid, core) fragments
    it = 0
    k = 1
    while k <= max_k:
        victims = state.filter(F.col("deg") < k).select("vid")
        n_removed = victims.count()
        it += 1
        runner.log(it, k=k, removed=n_removed)
        if n_removed == 0:
            if state.count() == 0:
                break
            k += 1
            continue
        peeled.append(
            truncate_plan(victims.withColumn("core", F.lit(k - 1).cast("int")))
        )
        # degree decrements along the victims' adjacency only
        dec = (
            edges.join(peeled[-1].select(F.col("vid").alias("src")), "src")
            .groupBy("dst")
            .agg(F.count("*").alias("dec"))
            .withColumnRenamed("dst", "vid")
        )
        new_state = truncate_plan(
            state.join(peeled[-1].select("vid"), "vid", "left_anti")
            .join(dec, "vid", "left")
            .select("vid", (F.col("deg") - F.coalesce(F.col("dec"), F.lit(0))).alias("deg"))
        ).persist()
        state.unpersist()
        state = new_state

    # survivors past max_k keep the last k they were known to survive
    survivors = state.select("vid", F.lit(min(k, max_k)).cast("int").alias("core"))
    out = survivors
    for frag in peeled:
        out = out.unionByName(frag)
    runner.finalize()
    return out
