"""neighborreduce: segmented reduction over each vertex's neighbors.

Reference: include/gunrock/framework/operators/neighborreduce/
neighborreduce.hxx:55-101 (mgpu transform_segreduce over CSR
segments; whole-graph only). Spark: join neighbor values onto the
edge table and groupBy the segment key — Catalyst's partial (map-side)
+ final hash aggregation is the distributed segmented reduce, and is
exactly how SpMV pull works (algorithms/spmv.hxx:107-127).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def neighbor_reduce(
    edges: DataFrame,
    values: DataFrame,
    agg: Callable[[Column], Column] = F.sum,
    combine: Callable[[Column, Column], Column] | None = None,
    direction: str = "pull",
    value_col: str = "value",
    out_col: str = "value",
) -> DataFrame:
    """Per-vertex reduce over neighbor values.

    - ``direction='pull'``: for each src, reduce over values of its
      out-neighbors (dst) — SpMV y = A.x;
    - ``direction='push'``: for each dst, reduce over values of its
      in-neighbors (src) — the scatter-aggregate shape PR uses.
    - ``combine(value, weight)``: per-edge transform before the
      reduce (the reference's transform lambda); default value*weight.
    """
    gather_key, group_key = ("dst", "src") if direction == "pull" else ("src", "dst")
    v = values.select(F.col("vid").alias(gather_key), F.col(value_col).alias("_nv"))
    joined = edges.join(v, gather_key)
    per_edge = (
        combine(F.col("_nv"), F.col("weight")) if combine is not None else F.col("_nv") * F.col("weight")
    )
    return (
        joined.select(F.col(group_key).alias("vid"), per_edge.alias("_pv"))
        .groupBy("vid")
        .agg(agg(F.col("_pv")).alias(out_col))
    )
