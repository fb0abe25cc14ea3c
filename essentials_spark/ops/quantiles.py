"""Exact order statistics over bounded-integer columns — the
counting-sort shape.

Quality thresholding ("drop the bottom decile", "cap at p99") needs
order statistics, and a total sort of 10^12 rows is the wrong plan.
When the value domain is bounded integers (quality·1e6 ∈ [0, 1e6],
token counts, byte lengths, ppm buckets — every score this engine
gates is already such a value), the exact quantile is computable with
ONE distinct-value-scale aggregate:

    groupBy(value).count  →  cumulative sum ordered by value
    →  quantile(q) = min value with cum ≥ ⌈q·n⌉

Shuffle cost is |distinct values| (≤ the domain size, e.g. 1e6), not
n; the ordered cumulative window runs over that bounded table, never
the data. Exact — not approximate like percentile_approx — and pure
integer arithmetic end-to-end, so a SQL oracle replays it bit-for-bit
(percentile_disc semantics: the smallest attained value at or above
the rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def bounded_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles_ppm: tuple[int, ...] = tuple(range(100_000, 1_000_000, 100_000)),
) -> DataFrame:
    """(pct_ppm, value) for each requested quantile (ppm in (0, 1e6]):
    value = the smallest ``value_col`` whose cumulative count reaches
    ⌈q·n/1e6⌉ — exact percentile_disc. ``value_col`` must be integral
    (cast upstream); NULLs are excluded from n, matching SQL
    percentile semantics."""
    spark = df.sparkSession
    vals = df.select(F.col(value_col).cast("long").alias("v")).where(F.col("v").isNotNull())
    counts = vals.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    # ordered cumulative window over the DISTINCT-value table — the
    # single-partition window is bounded by the domain size, not n
    cum = counts.withColumn("cum", F.sum("c").over(Window.orderBy("v")))
    qdf = spark.createDataFrame([(int(q),) for q in quantiles_ppm], "pct_ppm long")
    # integer DIV, not `/`: q·n can exceed 2^53 at 10^12 rows, where
    # the double division would lose the exact rank
    thr = qdf.crossJoin(vals.agg(F.count(F.lit(1)).alias("n"))).select(
        "pct_ppm",
        F.expr(f"(pct_ppm * n + {PPM - 1}) DIV {PPM}").cast("long").alias("thr"),
    )
    return (
        thr.join(cum, F.col("cum") >= F.col("thr"))
        .groupBy("pct_ppm")
        .agg(F.min("v").alias("value"))
        .select("pct_ppm", "value")
    )
