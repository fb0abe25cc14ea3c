"""Transcripts -> graph derivation.

Vertices: turns, tools (and optionally conversations); edges:
  1. turn adjacency  (conv_id, i) -> (conv_id, i+1)
  2. tool-call links turn -> tool
  3. (optional) conv -> turn membership

Vertex ids are **dense, deterministic longs** = global rank of
(kind, key) — assigned with a scalable two-phase scheme (range
partition + per-partition offsets) rather than a single-partition
window, so the same code works at 10^12 vertices.

Reference analogue: the .mtx loader's responsibilities
(include/gunrock/io/matrix_market.hxx:99-240) — id normalization,
symmetrization (:194-235), self-loop policy (unittests/algorithms/
tc.cuh:57-95 proves TC excludes self-loops), dedup — live here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Graph:
    """The engine's graph handle: COO-equivalent edge DataFrame + vertices.

    Mirrors reference graph_t (include/gunrock/graph/graph.hxx:52-67)
    minus the view machinery: CSR/CSC views are derived on demand
    (csr_blocks.py) instead of stored.
    """

    vertices: DataFrame  # vid: long, kind: string, key: string, [attrs...]
    edges: DataFrame  # src: long, dst: long, weight: double

    def num_vertices(self) -> int:
        return self.vertices.count()

    def num_edges(self) -> int:
        return self.edges.count()

    def reversed(self) -> "Graph":
        """CSC-flavored view: transpose the edge table
        (reference include/gunrock/graph/csc.hxx)."""
        return Graph(self.vertices, self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))


def assign_dense_ids(keyed: DataFrame, order_cols: list[str], num_partitions: int | None = None) -> DataFrame:
    """Add ``vid`` = global rank of ``order_cols`` (0-based, dense).

    Scalable two-phase zip-with-index: range-partition + sort on the
    key, count rows per partition (tiny collect: one row per
    partition), broadcast cumulative offsets, then vid = offset +
    local position. Avoids the single-partition global window that
    would OOM at web scale while producing identical, fully
    deterministic ids (global rank is independent of where partition
    boundaries fall).
    """
    import pandas as pd

    spark = keyed.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    parted = keyed.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(*order_cols)
    parted = parted.withColumn("_pid", F.spark_partition_id())
    parted = parted.persist()
    counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in parted.schema.fields if f.name != "_pid")
    out_schema += ", vid bigint"

    def add_vid(batches):
        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = b_offsets.value[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["vid"] = pd.RangeIndex(pos, pos + len(pdf)).astype("int64")
            pos += len(pdf)
            yield pdf

    result = parted.mapInPandas(add_vid, schema=out_schema)
    return result


def turn_key(conv_id: F.Column | str, turn_idx: F.Column | str) -> F.Column:
    c = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    t = F.col(turn_idx) if isinstance(turn_idx, str) else turn_idx
    return F.concat(c, F.lit(":"), F.lpad(t.cast("string"), 6, "0"))


def derive_graph(
    transcripts: DataFrame,
    include_conv_vertices: bool = False,
    dense_ids: bool = True,
) -> Graph:
    """Derive (vertices, edges) from a transcripts DataFrame.

    Edge weights are 1.0 (the transcript graph is unweighted; PR
    handles general weights regardless — reference PR is weight-aware,
    algorithms/pr.hxx:77-91).
    """
    t = transcripts.select("conv_id", "turn_idx", "text", "tool").persist()

    turn_v = t.select(
        turn_key("conv_id", "turn_idx").alias("key"),
        F.lit("turn").alias("kind"),
        "conv_id",
        "turn_idx",
        "text",
    )
    tool_v = (
        t.filter(F.col("tool").isNotNull())
        .select(F.concat(F.lit("tool:"), F.col("tool")).alias("key"))
        .distinct()
        .select("key", F.lit("tool").alias("kind"), F.lit(None).cast("string").alias("conv_id"),
                F.lit(None).cast("int").alias("turn_idx"), F.lit(None).cast("string").alias("text"))
    )
    vertices = turn_v.unionByName(tool_v)
    if include_conv_vertices:
        conv_v = t.select("conv_id").distinct().select(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("key"),
            F.lit("conv").alias("kind"),
            F.col("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit(None).cast("string").alias("text"),
        )
        vertices = vertices.unionByName(conv_v)

    # --- edges on string keys first ---
    nxt = t.select(
        turn_key("conv_id", "turn_idx").alias("src_key"),
        turn_key("conv_id", F.col("turn_idx") + 1).alias("dst_key"),
        "conv_id",
        (F.col("turn_idx") + 1).alias("nxt_idx"),
    )
    # keep adjacency edge only if the next turn exists: semi-join on key
    turn_keys = t.select(turn_key("conv_id", "turn_idx").alias("dst_key"))
    adjacency = nxt.join(turn_keys, "dst_key", "left_semi").select("src_key", "dst_key")

    tool_edges = t.filter(F.col("tool").isNotNull()).select(
        turn_key("conv_id", "turn_idx").alias("src_key"),
        F.concat(F.lit("tool:"), F.col("tool")).alias("dst_key"),
    )
    key_edges = adjacency.unionByName(tool_edges)
    if include_conv_vertices:
        member = t.select(
            F.concat(F.lit("conv:"), F.col("conv_id")).alias("src_key"),
            turn_key("conv_id", "turn_idx").alias("dst_key"),
        )
        key_edges = key_edges.unionByName(member)

    if dense_ids:
        vertices = assign_dense_ids(vertices, ["kind", "key"])
        vkeys = vertices.select("key", "vid")
        edges = (
            key_edges.join(vkeys.withColumnRenamed("key", "src_key").withColumnRenamed("vid", "src"), "src_key")
            .join(vkeys.withColumnRenamed("key", "dst_key").withColumnRenamed("vid", "dst"), "dst_key")
            .select("src", "dst", F.lit(1.0).alias("weight"))
        )
    else:
        vertices = vertices.withColumn("vid", F.xxhash64("key"))
        vkeys = vertices.select("key", "vid")
        edges = (
            key_edges.join(vkeys.withColumnRenamed("key", "src_key").withColumnRenamed("vid", "src"), "src_key")
            .join(vkeys.withColumnRenamed("key", "dst_key").withColumnRenamed("vid", "dst"), "dst_key")
            .select("src", "dst", F.lit(1.0).alias("weight"))
        )
    return Graph(vertices=vertices, edges=edges)


def canonicalize_edges(
    edges: DataFrame,
    symmetrize: bool = False,
    dedup: bool = False,
    drop_self_loops: bool = False,
) -> DataFrame:
    """Per-algorithm edge canonicalization.

    - symmetrize: union with transpose (reference symmetric .mtx
      handling, io/matrix_market.hxx:194-235);
    - dedup: exact duplicate removal (reference uniquify operator);
    - drop_self_loops: TC policy (unittests/algorithms/tc.cuh:57-95).
    """
    e = edges
    if drop_self_loops:
        e = e.filter(F.col("src") != F.col("dst"))
    if symmetrize:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    if dedup:
        e = e.dropDuplicates(["src", "dst"])
    return e
