"""String-keyed graph derivation (events -> transcripts -> graph).

Used by the driver contract (__spark_entry__.py) and bench.py: every
vertex gets a sortable string key ``skey``:

    turn vertex: 'turn|<conv_id>:<zero-padded turn_idx>'
    tool vertex: 'tool|<tool>'
    conv vertex: 'conv|<conv_id>'   (optional membership edges)

Dense long vids are assigned as the global rank of skey (scalable
two-phase scheme, graph/derive.assign_dense_ids), so min-vid == min-skey
— component labels map 1:1 onto canonical string labels that an ANSI-SQL
oracle can compute without replicating the id assignment.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from essentials_spark.engine.superstep import truncate_plan
from essentials_spark.graph.derive import Graph, assign_dense_ids
from essentials_spark.io.transcripts import transcripts_from_events


@dataclass
class KeyedGraph:
    graph: Graph  # vertices (vid, skey), edges (src, dst, weight)
    vkeys: DataFrame  # (vid, skey)
    key_edges: DataFrame  # (src_key, dst_key)


def _skey_turn(conv_id, turn_idx) -> F.Column:
    return F.concat(F.lit("turn|"), conv_id, F.lit(":"), F.lpad(turn_idx.cast("string"), 6, "0"))


def keyed_graph_from_transcripts(
    transcripts: DataFrame, include_conv_membership: bool = False
) -> KeyedGraph:
    """Build a string-keyed graph, then assign rank-of-skey vids."""
    t = transcripts.select("conv_id", "turn_idx", "tool")

    turn_v = t.select(_skey_turn(F.col("conv_id"), F.col("turn_idx")).alias("skey"))
    tool_v = (
        t.filter(F.col("tool").isNotNull())
        .select(F.concat(F.lit("tool|"), F.col("tool")).alias("skey"))
        .distinct()
    )
    verts = turn_v.unionByName(tool_v)

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    adj = (
        t.select("conv_id", "turn_idx", _skey_turn(F.col("conv_id"), F.col("turn_idx")).alias("src_key"))
        .withColumn("dst_key", F.lead("src_key").over(w))
        .filter(F.col("dst_key").isNotNull())
        .select("src_key", "dst_key")
    )
    tool_e = t.filter(F.col("tool").isNotNull()).select(
        _skey_turn(F.col("conv_id"), F.col("turn_idx")).alias("src_key"),
        F.concat(F.lit("tool|"), F.col("tool")).alias("dst_key"),
    )
    key_edges = adj.unionByName(tool_e)

    if include_conv_membership:
        conv_v = t.select(F.concat(F.lit("conv|"), F.col("conv_id")).alias("skey")).distinct()
        verts = verts.unionByName(conv_v)
        member = t.select(
            F.concat(F.lit("conv|"), F.col("conv_id")).alias("src_key"),
            _skey_turn(F.col("conv_id"), F.col("turn_idx")).alias("dst_key"),
        )
        key_edges = key_edges.unionByName(member)

    vkeys = truncate_plan(assign_dense_ids(verts, ["skey"]).select("vid", "skey"))
    edges = truncate_plan(
        key_edges.join(vkeys.select(F.col("skey").alias("src_key"), F.col("vid").alias("src")), "src_key")
        .join(vkeys.select(F.col("skey").alias("dst_key"), F.col("vid").alias("dst")), "dst_key")
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    graph = Graph(vertices=vkeys.select("vid", "skey"), edges=edges)
    return KeyedGraph(graph=graph, vkeys=vkeys, key_edges=key_edges)


def keyed_graph_from_events(
    spark: SparkSession, sf_dir: str, include_conv_membership: bool = False
) -> KeyedGraph:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return keyed_graph_from_transcripts(
        transcripts_from_events(events), include_conv_membership=include_conv_membership
    )


def windowed_turn_graph(
    transcripts: DataFrame, window: int = 3, include_tools: bool = True
) -> Graph:
    """String-keyed graph of turns within ``window`` of each other in
    the same conversation (plus turn->tool links).

    Built with ``window`` linear lead() passes — never a
    per-conversation quadratic self-join, so a 10^6-turn conversation
    costs O(turns x window), not O(turns^2). Vertex ids stay the
    sortable string keys (no dense-id pass: every consumer of this
    graph — k-truss peeling, truss-style cohesion analyses — uses
    orientation algebra that is vertex-type-agnostic). The windowed
    cliques make this the triangle-dense view of a transcript corpus:
    the natural input for edge-cohesion operators, where the plain
    chain adjacency (keyed_graph_from_transcripts) is triangle-free
    outside tool sharing.
    """
    from pyspark.sql import Window as W

    base = transcripts.select(
        "conv_id",
        "turn_idx",
        _skey_turn(F.col("conv_id"), F.col("turn_idx")).alias("vkey"),
        "tool",
    )
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    parts = [
        base.select(F.col("vkey").alias("src"), F.lead("vkey", d).over(w).alias("dst"))
        .filter(F.col("dst").isNotNull())
        for d in range(1, window + 1)
    ]
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    if include_tools:
        edges = edges.unionByName(
            base.filter(F.col("tool").isNotNull()).select(
                F.col("vkey").alias("src"),
                F.concat(F.lit("tool|"), F.col("tool")).alias("dst"),
            )
        )
    edges = edges.withColumn("weight", F.lit(1.0))
    return Graph(vertices=edges.select(F.col("src").alias("vid")).limit(0), edges=edges)
