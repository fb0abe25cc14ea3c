"""Whole-graph structural statistics: modularity, degree assortativity.

Single-pass aggregate operators over the symmetrized edge table (each
undirected edge present in both orientations — the degree_histogram
convention). Both are the standard public-literature definitions:

- modularity (Newman): Q = Σ_c [ A_c/(2m) − (D_c/(2m))² ] where A_c
  counts intra-community directed rows, D_c sums community degrees,
  2m = |sym rows|. Scores any labeling (LP, CC, conversations).
- degree assortativity (Newman): Pearson correlation of
  (deg(src), deg(dst)) over the directed rows of the symmetrized
  table.

Both are computed INTEGER-EXACT and reduced to one final float
expression, so the result is bit-identical across partition layouts,
engines (Spark vs DuckDB oracle), and reruns:

- modularity's numerator Σ_c (A_c·2m − D_c²) is an exact BIGINT sum
  (order-independent); only q_ppm = round(num/(2m)²·1e6) touches FP.
  Exactness bound: (2m)² < 2^63 ⇔ 2m < 3.03e9 directed rows; beyond
  that, shard the numerator as Σ_c A_c·2m and Σ_c D_c² separately
  and combine in decimal(38) — the per-community terms still fit.
- assortativity keeps the six Pearson sums (m, Σx, Σy, Σxy, Σx²,
  Σy²) as exact BIGINTs (< 2^63 up to ~1e9 rows with hub degrees
  ~1e4), then evaluates r once in doubles — the same IEEE expression
  both engines round identically.

Scale shape: one groupBy for degrees, one broadcast-sized stats
reduce; no joins beyond edge⋈degree / edge⋈labels (both key-bucketed
by the caller's static tables at scale). Reference anchor: the
whole-graph reduction family (avg/stddev degree, dangling-mass sums)
in essentials' per-algo enactors, e.g. pr.hxx's rank reductions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(sym_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """1 row: (n_communities, two_m, q_num, q_ppm) for a (vid, label)
    assignment over a symmetrized (src, dst) edge table.

    q = q_num / (2m)² with q_num = Σ_c (A_c·2m − D_c²) exact — the
    FP-free integer algebra of Newman's Q (multiply through by (2m)²).
    """
    e = sym_edges.select("src", "dst")
    lab_s = labels.select(F.col("vid").alias("src"), F.col("label").alias("ls"))
    lab_d = labels.select(F.col("vid").alias("dst"), F.col("label").alias("ld"))
    tagged = e.join(lab_s, "src").join(lab_d, "dst")
    two_m = e.count()
    # per-community: directed intra rows (A_c) and degree mass
    # (D_c = directed out-rows touching the community, since every
    # undirected edge appears in both orientations)
    per_c = tagged.groupBy("ls").agg(
        F.sum(F.when(F.col("ls") == F.col("ld"), 1).otherwise(0)).cast("long").alias("a_c"),
        F.count("*").cast("long").alias("d_c"),
    )
    agg = per_c.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum(
            F.col("a_c") * F.lit(int(two_m)) - F.col("d_c") * F.col("d_c")
        ).cast("long").alias("q_num"),
    )
    return agg.select(
        "n_communities",
        F.lit(int(two_m)).cast("long").alias("two_m"),
        "q_num",
        F.round(
            F.col("q_num").cast("double")
            / (F.lit(float(two_m)) * F.lit(float(two_m)))
            * F.lit(1e6)
        ).cast("long").alias("q_ppm"),
    )


def degree_assortativity(sym_edges: DataFrame) -> DataFrame:
    """1 row: (m_rows, r_e6) — Pearson degree-degree correlation over
    the directed rows of the symmetrized table. The six Pearson sums
    are exact BIGINTs; r is the single final FP expression (identical
    IEEE sequence in the DuckDB oracle)."""
    e = sym_edges.select("src", "dst")
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    pairs = (
        e.join(deg.select("src", F.col("d").alias("dx")), "src")
        .join(deg.select(F.col("src").alias("dst"), F.col("d").alias("dy")), "dst")
        .select(F.col("dx").cast("long").alias("dx"), F.col("dy").cast("long").alias("dy"))
    )
    s = pairs.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    m, sx, sy = F.col("m").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    den = F.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    return s.select(
        F.col("m").alias("m_rows"),
        F.when(den > 0, F.round((m * sxy - sx * sy) / den * F.lit(1e6)))
        .otherwise(F.lit(0.0))
        .cast("long")
        .alias("r_e6"),
    )


def degree_gini(edges: DataFrame) -> DataFrame:
    """Gini coefficient of the degree distribution — the
    hub-concentration statistic (0 = regular graph, ->1 = one hub owns
    everything). Over degrees sorted ascending d_1..d_n:

        G = (2·Σ i·d_i − (n+1)·Σd) / (n·Σd)

    computed WITHOUT a global sort: group degrees by value (the
    counting-sort shape — distinct-degree-scale, not n-scale), take an
    ordered cumulative count, and expand each equal-degree run's rank
    sum in closed form: ranks (a, a+c] contribute
    d·(c·a + c·(c+1)/2). Exact BIGINT numerator/denominator; the one
    FP step is the final ppm rounding (half away from zero, the
    engine's convention). Returns 1 row
    (n, degree_sum, gini_num, gini_den, gini_ppm)."""
    from pyspark.sql import Window

    deg = edges.groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).alias("d"))
    grp = deg.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("d")
    cum = grp.withColumn("cum", F.sum("c").over(w)).withColumn(
        "a", F.col("cum") - F.col("c")
    )
    # run contribution to Σ i·d_i: d * (c*a + c*(c+1)/2)
    contrib = (
        F.col("d")
        * (F.col("c") * F.col("a") + F.expr("c * (c + 1) DIV 2"))
    ).cast("long")
    agg = cum.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("d") * F.col("c")).cast("long").alias("s"),
        F.sum(contrib).cast("long").alias("ids"),
    )
    return agg.select(
        "n",
        F.col("s").alias("degree_sum"),
        (F.lit(2) * F.col("ids") - (F.col("n") + 1) * F.col("s")).alias("gini_num"),
        (F.col("n") * F.col("s")).alias("gini_den"),
        F.floor(
            (F.lit(2) * F.col("ids") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.col("n") * F.col("s")).cast("double")
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("gini_ppm"),
    )
