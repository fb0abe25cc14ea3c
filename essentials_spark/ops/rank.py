"""Global total-order ranking without a single-partition sort.

``row_number() OVER (ORDER BY ...)`` — the obvious way to assign a
global curriculum position — collapses to ONE task at any scale (a
global window has one partition). The scalable shape splits the order
into a bounded head and a parallel tail:

    rank(row) = (#rows with strictly-greater score)        [offsets]
              + row_number within its score group           [parallel]

The offsets come from the DISTINCT-score counts (bounded: scores here
are ppm integers, <= 1e6 distinct values) cumulated over one
bounded-size ordered window — the counting-sort trick
ops/quantiles.py already uses for exact percentiles. The per-score
row_number window is partitioned by score, so it parallelizes; its
worst-case partition is the biggest score tie-class (document the
skew: ties on a 1e6-grained score are small by construction — if a
coarser score ties massively, grade the tie-break column into the
score first).

Training-data use: curriculum ordering (feed highest-quality docs
first), deterministic corpus shuffling (rank over a seeded hash), and
reproducible take-top-N exports. Output is exact integers — the
DuckDB oracle is a literal row_number replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    score_col: str,
    tie_col: str,
    descending: bool = True,
) -> DataFrame:
    """All columns of ``df`` plus ``rank`` (1-based, gap-free): rows
    ordered by (score desc|asc, tie asc). ``score_col`` must be
    integral-valued (bounded distinct values); ``tie_col`` must be
    unique (e.g. the id column)."""
    s = F.col(score_col)
    counts = df.groupBy(s.alias("_s")).agg(F.count(F.lit(1)).alias("_c"))
    order = F.col("_s").desc() if descending else F.col("_s").asc()
    # bounded window: one row per DISTINCT score, not per data row
    offsets = counts.select(
        "_s",
        (F.sum("_c").over(
            Window.orderBy(order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.col("_c")).alias("_off"),
    )
    w_in = Window.partitionBy(score_col).orderBy(F.col(tie_col).asc())
    return (
        df.join(F.broadcast(offsets), s == F.col("_s"))
        .select(*df.columns, (F.col("_off") + F.row_number().over(w_in)).cast("long").alias("rank"))
    )
