"""Minimum spanning forest — Borůvka supersteps with edge contraction.

Reference: include/gunrock/algorithms/mst.hxx:105-261 — per round:
remove-filter picks each component's minimum outgoing edge (:119-145),
components contract via hooking + pointer jumping (:173-220), repeat
until no cross-component edges remain. Component count at least halves
per round -> O(log n) rounds.

Deterministic tiebreak on (weight, src, dst) — the reference notes its
own atomics admit ties broken by arrival order (mst.hxx:196-199); we
pin a total order instead so results are reproducible.

Scale shape: the edge table is CONTRACTED each round (endpoints
relabeled to component ids, intra-component edges dropped,
multi-edges collapsed to their min representative), so round r works
on the shrinking cross-component edge set — round-1's version joined
the full original edge table against the vertex→component map every
round, which re-shuffles the whole graph O(log n) times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import SuperstepRunner, truncate_plan
from essentials_spark.graph.derive import Graph, canonicalize_edges


def mst(
    graph: Graph,
    max_iter: int = 100,
    runner: SuperstepRunner | None = None,
) -> tuple[DataFrame, float]:
    """Returns (chosen edges DataFrame (src, dst, weight), total weight).

    Input treated as undirected; edges canonicalized to src < dst.
    """
    spark = graph.edges.sparkSession
    runner = runner or SuperstepRunner(spark, "mst")
    und = canonicalize_edges(graph.edges, symmetrize=True, dedup=False, drop_self_loops=True)
    # canonical undirected edge = (min, max) with min weight kept
    und = (
        und.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"), "weight"
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    # active cross-component edges; original endpoints ride along so the
    # chosen set reports input edges, not contracted ids
    active = truncate_plan(
        und.select(
            F.col("src").alias("csrc"), F.col("dst").alias("cdst"), "weight", "src", "dst"
        )
    ).persist()
    chosen_frags: list[DataFrame] = []

    it = 0
    while it < max_iter:
        it += 1
        n_active = active.count()
        runner.log(it, cross_edges=n_active)
        if n_active == 0:
            break
        # min outgoing edge per component, deterministic tiebreak
        sym_active = active.select(
            F.col("csrc").alias("c"), "weight", "src", "dst", F.col("cdst").alias("tgt")
        ).unionByName(
            active.select(F.col("cdst").alias("c"), "weight", "src", "dst", F.col("csrc").alias("tgt"))
        )
        hooks = (
            sym_active.groupBy("c")
            .agg(F.min(F.struct("weight", "src", "dst", "tgt")).alias("e"))
            .select("c", F.col("e.src").alias("src"), F.col("e.dst").alias("dst"),
                    F.col("e.weight").alias("weight"), F.col("e.tgt").alias("tgt"))
        )
        hooks = truncate_plan(hooks).persist()
        chosen_frags.append(
            truncate_plan(hooks.select("src", "dst", "weight").dropDuplicates(["src", "dst"]))
        )
        # contract the hook forest (mst.hxx:173-205 analogue). Root
        # rule breaks the 2-cycles mutual min-edges create:
        #   p(c) = c    if hooks are mutual and c < tgt (c becomes root)
        #   p(c) = tgt  otherwise
        parent = hooks.select("c", F.col("tgt").alias("p"))
        parent = (
            parent.alias("a")
            .join(parent.alias("b"), (F.col("a.p") == F.col("b.c")) & (F.col("b.p") == F.col("a.c")), "left")
            .select(
                F.col("a.c").alias("c"),
                F.when(F.col("b.c").isNotNull() & (F.col("a.c") < F.col("a.p")), F.col("a.c"))
                .otherwise(F.col("a.p"))
                .alias("p"),
            )
        )
        parent = truncate_plan(parent).persist()
        # pointer-jump to roots (doubling: depth halves per step). The
        # settled signal is computed INLINE as a `_moved` flag during
        # the doubling join — never a second n-scale join of nxt
        # against parent — and checked EVERY doubling: truncate_plan's
        # eager localCheckpoint is already a full materialization
        # barrier per doubling, so the flag count is a near-free scan
        # of cached blocks, while SKIPPING checks costs real extra
        # doublings (each an n-scale join + checkpoint — measured 63 s
        # batched every 3rd vs 46 s per-doubling at 3.3M vertices).
        # Reference
        # anchor: mst.hxx:207-220 (its jump loop is unsynchronized,
        # but its per-step cost is a device kernel, not a checkpoint).
        jump_doublings = jump_checks = 0
        for j in range(20):
            lookup = parent.select(F.col("c").alias("p"), F.col("p").alias("pp"))
            nxt = parent.join(lookup, "p", "left").select(
                "c",
                F.coalesce(F.col("pp"), F.col("p")).alias("p"),
                (F.col("pp").isNotNull() & (F.col("pp") != F.col("p"))).alias("_moved"),
            )
            nxt = truncate_plan(nxt).persist()
            # nxt is materialized — the superseded parent cache is dead
            # (see bc.py note)
            parent.unpersist()
            parent = nxt
            jump_doublings += 1
            jump_checks += 1
            if nxt.filter("_moved").count() == 0:
                break
        parent = parent.drop("_moved")
        runner.log(it, jump_doublings=jump_doublings, jump_checks=jump_checks)
        # relabel the active edge set through the contraction map, drop
        # the (now intra-component) merged edges, and collapse
        # multi-edges between the same component pair to the min
        # representative — only the min edge can ever be chosen later
        pm_src = parent.select(F.col("c").alias("csrc"), F.col("p").alias("nsrc"))
        pm_dst = parent.select(F.col("c").alias("cdst"), F.col("p").alias("ndst"))
        relabeled = (
            active.join(pm_src, "csrc", "left")
            .join(pm_dst, "cdst", "left")
            .select(
                F.coalesce(F.col("nsrc"), F.col("csrc")).alias("a"),
                F.coalesce(F.col("ndst"), F.col("cdst")).alias("b"),
                "weight", "src", "dst",
            )
            .filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("csrc"), F.greatest("a", "b").alias("cdst"),
                "weight", "src", "dst",
            )
            .groupBy("csrc", "cdst")
            .agg(F.min(F.struct("weight", "src", "dst")).alias("e"))
            .select("csrc", "cdst", F.col("e.weight").alias("weight"),
                    F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        )
        new_active = truncate_plan(relabeled).persist()
        active.unpersist()
        hooks.unpersist()
        active = new_active

    chosen = spark.createDataFrame([], "src long, dst long, weight double")
    for frag in chosen_frags:
        chosen = chosen.unionByName(frag)
    chosen = chosen.dropDuplicates(["src", "dst"]).persist()
    total = chosen.agg(F.sum("weight")).collect()[0][0] or 0.0
    runner.finalize()
    return chosen, float(total)
