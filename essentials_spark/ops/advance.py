"""advance: expand a frontier to its neighbors.

Reference: include/gunrock/framework/operators/advance/advance.hxx:91-129
— frontier x adjacency equi-join, user lambda accepts/rejects each
(src, dst, edge weight) and the accepted neighbors form the output
frontier. The reference needs 4 hand-written load balancers
(thread/block/merge-path mapped, operators/advance/*.hxx) to spread
power-law degree work across GPU threads; on Spark the shuffle + AQE
does that, and hub-vertex skew is handled by salting
(engine/skew.py) — same problem, Spark-native fix.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def advance(
    edges: DataFrame,
    frontier: DataFrame | None = None,
    op: Callable[[DataFrame], Column] | Column | None = None,
    direction: str = "forward",
    broadcast_frontier: bool | None = None,
    output: str = "vertices",
) -> DataFrame:
    """Expand ``frontier`` (vid) along ``edges`` (src, dst, weight).

    - ``frontier=None`` = whole-graph advance
      (advance_io_type_t::graph, operators/configs.hxx:46-51): the
      full edge table is the input — a plain scan, no join.
    - ``op``: a Column predicate over columns (src, dst, weight)
      filtering accepted expansions (the reference's advance lambda,
      advance.hxx:53-61).
    - ``direction``: 'forward' joins on src (push, CSR-flavored),
      'backward' joins on dst (pull, CSC-flavored)
      (operators/configs.hxx:58-62).
    - ``broadcast_frontier``: force/forbid broadcasting the frontier
      side of the join; default lets AQE decide, but iterative
      algorithms should pass True while the frontier is small.
    - ``output``: 'vertices' -> distinct-ready (dst) frontier,
      'edges' -> full (src, dst, weight) expansion rows.
    """
    join_key = "src" if direction == "forward" else "dst"
    out_key = "dst" if direction == "forward" else "src"
    if frontier is None:
        expanded = edges
    else:
        f = frontier.select(F.col("vid").alias(join_key))
        if broadcast_frontier:
            f = F.broadcast(f)
        expanded = edges.join(f, join_key)
    if op is not None:
        pred = op(expanded) if callable(op) else op
        expanded = expanded.filter(pred)
    if output == "vertices":
        return expanded.select(F.col(out_key).alias("vid"))
    return expanded
