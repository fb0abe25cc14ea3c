"""spark-submit entry points.

Cluster usage (north rule: spark-submit --py-files on multi-executor
clusters):

    zip -r essentials_spark.zip essentials_spark
    spark-submit --py-files essentials_spark.zip \\
        -m essentials_spark.cli pagerank \\
        --input iceberg_catalog.db.transcripts --output /out/ranks \\
        --checkpoint-dir /ckpt --resume

Local smoke:  python -m essentials_spark.cli pagerank --synthetic 1000
"""

from __future__ import annotations

import argparse
import sys

from essentials_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="essentials_spark")
    ap.add_argument("algo", choices=[
        "pagerank", "cc", "lp", "tc", "bfs", "sssp", "hits", "salsa",
        "walks", "node2vec", "temporal", "louvain", "scc",
        "mis", "densest", "all",
    ])
    ap.add_argument("--input", help="transcripts table: parquet path or iceberg table name")
    ap.add_argument("--synthetic", type=int, default=None, help="generate N synthetic conversations instead")
    ap.add_argument("--output", default=None, help="write result here (parquet/iceberg)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--source", type=int, default=0, help="bfs/sssp/temporal source vid")
    ap.add_argument("--walk-length", type=int, default=10, help="walks/node2vec steps")
    # bucketed = the at-scale default everywhere (static edge table
    # written once, supersteps shuffle only vertex state)
    ap.add_argument("--kernel", default="bucketed", choices=["bucketed", "dataframe", "csr"])
    args = ap.parse_args(argv)

    spark = get_spark(app_name=f"essentials-{args.algo}")
    from essentials_spark.engine.superstep import SuperstepRunner
    from essentials_spark.graph.keyed import keyed_graph_from_transcripts
    from essentials_spark.io.transcripts import synth_transcripts

    if args.synthetic:
        transcripts = synth_transcripts(spark, n_convs=args.synthetic)
    elif args.input and args.input.endswith((".parquet", "/")) or (args.input or "").startswith("/"):
        transcripts = spark.read.parquet(args.input)
    elif args.input:
        transcripts = spark.read.table(args.input)  # Iceberg/catalog table
    else:
        ap.error("one of --input / --synthetic is required")

    kg = keyed_graph_from_transcripts(transcripts)
    runner = SuperstepRunner(
        spark, args.algo, checkpoint_dir=args.checkpoint_dir, checkpoint_every=args.checkpoint_every
    )

    if args.algo == "all":
        # the multi-algorithm pattern: build the shared bucketed static
        # layouts once (graph/prepared.py), run the whole headline
        # suite against them, write each result under --output/<algo>
        from essentials_spark.graph.prepared import prepare_graph

        if not args.output:
            ap.error("algo 'all' requires --output")
        with prepare_graph(kg.graph, alpha=args.alpha) as pg:
            results = {
                "pagerank": pg.pagerank(tol=args.tol, max_iter=args.max_iter),
                "cc": pg.connected_components(max_iter=args.max_iter),
                "lp": pg.label_propagation(max_iter=min(args.max_iter, 20)),
            }
            pv, total = pg.triangle_count()
            results["tc"] = pv
            print(f"tc_total={total}")
            for name, df in results.items():
                df.join(kg.vkeys, "vid").write.mode("overwrite").parquet(f"{args.output}/{name}")
                print(f"wrote {args.output}/{name}")
        return 0

    if args.algo == "pagerank":
        from essentials_spark.algos import pagerank

        out = pagerank(kg.graph, alpha=args.alpha, tol=args.tol, max_iter=args.max_iter,
                       runner=runner, kernel=args.kernel)
    elif args.algo == "cc":
        from essentials_spark.algos import connected_components

        out = connected_components(
            kg.graph, max_iter=args.max_iter, runner=runner,
            kernel="csr" if args.kernel == "csr" else "dataframe",
        )
    elif args.algo == "lp":
        from essentials_spark.algos import label_propagation

        out = label_propagation(kg.graph, max_iter=args.max_iter, runner=runner)
    elif args.algo == "tc":
        from essentials_spark.algos import triangle_count

        out, total = triangle_count(kg.graph)
        print(f"tc_total={total}")
    elif args.algo == "bfs":
        from essentials_spark.algos import bfs as _bfs

        out = _bfs(kg.graph, source=args.source, runner=runner)
    elif args.algo == "sssp":
        from essentials_spark.algos import sssp as _sssp

        out = _sssp(kg.graph, source=args.source, runner=runner)
    elif args.algo in ("walks", "node2vec"):
        from pyspark.sql import functions as F

        from essentials_spark.graph.derive import canonicalize_edges
        from essentials_spark.sampling import node2vec_walks, random_walks

        sym = canonicalize_edges(kg.graph.edges, symmetrize=True, dedup=True, drop_self_loops=True)
        start = kg.vkeys.select(F.concat("skey", F.lit("#0")).alias("wid"), "vid")
        kern = "csr" if args.kernel == "csr" else "dataframe"
        if args.algo == "walks":
            out = random_walks(sym, start, length=args.walk_length, kernel=kern, runner=runner)
        else:
            out = node2vec_walks(sym, start, length=args.walk_length, kernel=kern, runner=runner)
    elif args.algo == "temporal":
        from pyspark.sql import functions as F

        from essentials_spark.algos import temporal_reachability
        from essentials_spark.io.transcripts import temporal_edges

        te = temporal_edges(transcripts)
        tev = (
            te.join(kg.vkeys.select(F.col("skey").alias("src_key"), F.col("vid").alias("src")), "src_key")
            .join(kg.vkeys.select(F.col("skey").alias("dst_key"), F.col("vid").alias("dst")), "dst_key")
            .select("src", "dst", F.col("ets_us").alias("ets"))
        )
        out = temporal_reachability(tev, args.source, 0, runner=runner)
    elif args.algo == "louvain":
        from essentials_spark.algos.louvain import louvain_multilevel
        from essentials_spark.graph.derive import Graph, canonicalize_edges

        sym = canonicalize_edges(kg.graph.edges, symmetrize=True, dedup=True, drop_self_loops=True)
        # MIS schedule + guard: the measured quality/cost winner
        # (BENCH 3t); 6 rounds/level ~= 2 chase-free sweeps
        out = louvain_multilevel(
            Graph(vertices=kg.graph.vertices, edges=sym),
            level_rounds=(6, 6), mode="mis", guard=True,
        )
    elif args.algo == "scc":
        from pyspark.sql import functions as F

        from essentials_spark.algos.scc import strongly_connected_components

        # directed: turn->next + turn->tool, plus tool->turn back-edges
        tool_vids = kg.vkeys.filter(F.col("skey").startswith("tool|")).select("vid")
        de = kg.graph.edges.select("src", "dst")
        tool_rev = de.join(tool_vids.select(F.col("vid").alias("dst")), "dst").select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        out = strongly_connected_components(
            kg.graph.vertices.select("vid"),
            de.unionByName(tool_rev),
            runner=runner,
            kernel="csr" if args.kernel != "dataframe" else "dataframe",
        )
    elif args.algo == "mis":
        from pyspark.sql import functions as F

        from essentials_spark.algos.mis import maximal_independent_set
        from essentials_spark.graph.derive import canonicalize_edges

        sym = canonicalize_edges(kg.graph.edges, symmetrize=True, dedup=True, drop_self_loops=True)
        out = maximal_independent_set(kg.graph.vertices.select("vid"), sym, runner=runner)
    elif args.algo == "densest":
        from pyspark.sql import functions as F

        from essentials_spark.algos.densest import densest_subgraph
        from essentials_spark.graph.derive import canonicalize_edges

        sym = canonicalize_edges(kg.graph.edges, symmetrize=True, dedup=True, drop_self_loops=True)
        out = densest_subgraph(
            kg.graph.vertices.select("vid"), sym.filter(F.col("src") < F.col("dst")).select("src", "dst"),
            runner=runner,
        )
    elif args.algo == "salsa":
        from essentials_spark.algos import salsa as _salsa

        out = _salsa(kg.graph, max_iter=args.max_iter, runner=runner)
    else:
        from essentials_spark.algos import hits as _hits

        out = _hits(kg.graph, max_iter=args.max_iter, runner=runner)

    out = out.join(kg.vkeys, "vid")
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        out.show(20, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
