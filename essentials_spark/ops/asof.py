"""Temporal joins the DataFrame API lacks as built-ins: as-of join
and interval range-count — expressed as single-sort merge shapes, the
plans that survive 100 TB.

**As-of join** ("most recent right row at or before each left row"):
the naive formulation is a range self-join (left x every earlier
right row) whose intermediate is O(n^2 / keys) — a non-starter. The
merge shape used here unions both sides into ONE key-partitioned
time-ordered stream and takes a running ``last(right value, ignore
nulls)``: one shuffle on the key, one sort, zero pair
materialization — exactly what a sort-merge as-of join does in
kdb/QuestDB/Flink, declared with stock window expressions so Catalyst
keeps it whole-stage-codegen. Strictness is encoded in the sort, not
a filter: at equal timestamps the left row sorts BEFORE its own
side's right rows (strict) or AFTER them (inclusive), so tie
semantics are deterministic and replay bit-for-bit in ANSI SQL.

**Range count** ("how many points fall in [lo, hi]?") is the other
interval primitive. The join-shaped plan explodes (every interval x
every covered point); the prefix-rank shape here never pairs:
``count(lo, hi) = rank(hi+) - rank(lo-)`` where ``rank`` is the global
count of points at-or-before a boundary. The global rank is computed
scalably — per-time-bucket running counts (window partitioned by
bucket: bounded partitions, parallel) plus a broadcast of per-bucket
offsets (one bounded driver-side cumulative sum over |buckets| rows,
not data rows). Interval endpoints ride the SAME window as the
points, sorted so a ``lo`` endpoint counts strictly-before points and
a ``hi`` endpoint counts at-or-before points — inclusive [lo, hi]
semantics with exact integer arithmetic end-to-end.

Hub-key caveat (as-of): a key holding k rows sorts in one partition's
run of k — same bound as any per-key window. For the transcript
workload the key is the tool id whose hottest value is ~30% of
calls; at 10^12 turns shard such keys by time range first (the
bucket trick below) and stitch shard boundaries with one extra
as-of pass over shard heads (|shards| rows).

Reference analogue: the reference's segmented operations over CSR
row runs (advance + segmented intersection, e.g.
operators/advance/advance.hxx) are the same "sorted runs, no pair
blowup" discipline applied to neighbor lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str = "ts_us",
    value_cols: list[str] | None = None,
    strict: bool = True,
    right_order_cols: list[str] | None = None,
    shard_us: int | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the latest ``right`` row of the
    same key with ``right.ts < left.ts`` (strict) or ``<=``
    (inclusive). Returns all ``left`` columns plus ``value_cols``
    prefixed ``asof_`` (NULL when no earlier right row exists).

    ``right_order_cols``: deterministic tie-break among right rows
    sharing (key, ts) — the LAST row in (ts, *right_order_cols) order
    wins. Pass enough columns to make the order total, or equal-ts
    duplicates make the result engine-dependent.

    One shuffle (key hash), one sort — no range join, no pair
    materialization, no Python in the row path.

    ``shard_us``: HUB-KEY scale path. A key holding k rows sorts in
    one window run of k; when a single key dominates (a hub tool at
    ~half the call stream), pass a time-shard width to split each
    key's stream into (key, ts DIV shard_us) windows that sort in
    parallel, then stitch shard boundaries exactly: the per-shard
    LAST right row (one tiny aggregate) is carried forward across
    shards with an exclusive-frame running last per key (handles
    right-empty shard gaps), and rows with no in-shard match coalesce
    to the carry. Result is IDENTICAL to the unsharded path (A/B
    pytest-pinned); cost moves from O(max key run) to
    O(max key run per shard) + a |keys x shards|-scale stitch.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [c for c in right.columns if c not in keys + [ts_col]]
    right_order_cols = right_order_cols or []

    # side ordering encodes strictness (see module docstring)
    left_side, right_side = (0, 1) if strict else (1, 0)

    lcols = [c for c in left.columns]
    l_tag = left.select(
        *lcols,
        F.lit(left_side).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_ro_{c}") for c in right_order_cols],
    )
    r_tag = right.select(
        *keys,
        F.col(ts_col),
        F.lit(right_side).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        *[F.col(c).alias(f"_ro_{c}") for c in right_order_cols],
    )
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))

    order = [F.col(ts_col), F.col("_side")] + [F.col(f"_ro_{c}") for c in right_order_cols]
    if shard_us is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.select(
            *lcols,
            "_side",
            *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
        )
        return matched.filter(F.col("_side") == left_side).drop("_side")

    # ---- sharded path: per-(key, shard) windows + exact carry stitch
    u = u.withColumn("_shard", F.expr(f"{ts_col} DIV {int(shard_us)}"))
    w = (
        Window.partitionBy(*keys, "_shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_shard = u.select(
        *lcols,
        "_side",
        "_shard",
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_is_{c}") for c in value_cols],
    )
    # per-(key, shard) LAST right row by (ts, tie): lexicographic
    # struct max — ties resolve exactly as the window order does
    pick = F.max(
        F.struct(
            F.col(ts_col),
            *[F.col(f"_ro_{c}") for c in right_order_cols],
            *[F.col(f"_rv_{c}").alias(f"_rv_{c}") for c in value_cols],
        )
    ).alias("_pk")
    # NOTE: the sharded stitch carries whole rows, so right VALUE
    # columns must be non-null for exact plain-path parity (the plain
    # window skips nulls per-column); id/timestamp payloads satisfy
    # this by construction
    shard_last = (
        u.filter(F.col("_side") == right_side)
        .groupBy(*keys, "_shard")
        .agg(pick)
    )
    # carry(key, shard) = last right row of any STRICTLY-earlier shard
    # (exclusive frame; ignorenulls walks across right-empty shards)
    shards = u.select(*keys, "_shard").distinct()
    wc = (
        Window.partitionBy(*keys)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        shards.join(shard_last, [*keys, "_shard"], "left")
        .select(*keys, "_shard", F.last("_pk", ignorenulls=True).over(wc).alias("_carry"))
    )
    out = in_shard.join(carry, [*keys, "_shard"])
    return out.filter(F.col("_side") == left_side).select(
        *lcols,
        *[
            F.coalesce(F.col(f"_is_{c}"), F.col(f"_carry._rv_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
    )


def range_count(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts_us",
    id_col: str = "qid",
    lo_col: str = "lo_us",
    hi_col: str = "hi_us",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """(id_col, n_in_range): for every interval row, the number of
    ``points`` rows with ``lo <= ts <= hi`` — via global prefix ranks,
    never an interval x point join.

    ``bucket_us`` bounds the per-partition sort (points per bucket)
    and the offset table (#buckets); pick it so #buckets stays ~1e6
    at the target scale (hourly buckets over a year = 8.8k). The
    offsets build is fully JVM-side: one bucket groupBy, a dense
    spark.range over [min, max] bucket, and ONE bounded
    single-partition cumulative window over #buckets rows — the
    driver only ever sees the two bucket bounds.
    """
    spark = points.sparkSession
    pts = points.select(F.col(ts_col).cast("long").alias("t")).where(F.col("t").isNotNull())
    b = F.expr(f"t DIV {int(bucket_us)}")

    bounds = pts.agg(F.min(b).alias("lo"), F.max(b).alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return intervals.select(F.col(id_col), F.lit(0).cast("long").alias("n_in_range"))
    min_b, max_b = int(bounds["lo"]), int(bounds["hi"])
    counts_df = pts.select(b.alias("b")).groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    dense = spark.range(min_b, max_b + 1).select(F.col("id").alias("b"))
    off_df = F.broadcast(
        dense.join(counts_df, "b", "left")
        .select("b", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .select(
            "b",
            (
                F.sum("c").over(
                    Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                - F.col("c")
            ).alias("off"),
        )
    )

    # endpoints ride the points' bucket windows; sides order so that a
    # lo endpoint counts strictly-before points and a hi endpoint
    # counts at-or-before points (inclusive [lo, hi])
    lo = intervals.select(
        F.col(id_col).alias("_q"), F.col(lo_col).cast("long").alias("t"),
        F.lit(-1).alias("_side"), F.lit(-1).alias("_kind"),
    )
    hi = intervals.select(
        F.col(id_col).alias("_q"), F.col(hi_col).cast("long").alias("t"),
        F.lit(1).alias("_side"), F.lit(1).alias("_kind"),
    )
    p_tag = pts.select(
        F.lit(None).cast(intervals.schema[id_col].dataType).alias("_q"),
        "t", F.lit(0).alias("_side"), F.lit(0).alias("_kind"),
    )
    u = p_tag.unionByName(lo).unionByName(hi).select(
        "_q", "t", "_side", "_kind",
        # endpoint buckets clamp into the observed range: an earlier
        # bucket's endpoint sorts before every point of min_b (its t
        # is smaller), a later one after every point of max_b
        F.greatest(F.lit(min_b), F.least(F.lit(max_b), F.expr(f"t DIV {int(bucket_us)}"))).alias("_b"),
    )
    w = (
        Window.partitionBy("_b")
        .orderBy("t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        u.withColumn("_run", F.sum(F.when(F.col("_side") == 0, 1).otherwise(0)).over(w))
        .filter(F.col("_side") != 0)
        .join(off_df, F.col("_b") == F.col("b"))
        .select("_q", "_kind", (F.col("off") + F.col("_run")).alias("rank"))
    )
    # intervals whose endpoints clamp out of the observed bucket range
    # still resolve through the window (rank 0 or the grand total)
    return (
        ranked.groupBy("_q")
        .agg(
            F.sum(F.when(F.col("_kind") == 1, F.col("rank")).otherwise(-F.col("rank"))).alias(
                "n_in_range"
            )
        )
        .select(F.col("_q").alias(id_col), F.col("n_in_range").cast("long"))
    )
