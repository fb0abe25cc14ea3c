"""Deterministic synthetic transcript tables + transcript ingest.

Schema (BASELINE.json input_hint):
    conv_id: string, turn_idx: int, role: string,
    text: string, tool: string|null, ts: timestamp

Everything is a pure function of (seed, conv index, turn index) built
from Spark SQL expressions — no Python RNG, no UDFs — so generation is
embarrassingly parallel over ``spark.range`` and reproducible at any
scale (the same recipe generates 10^12 turns on a cluster; only
``n_convs`` changes).

Reference analogue: the reference loads graphs from .mtx files
(include/gunrock/io/matrix_market.hxx:99-240); our "loader" is this
generator + graph/derive.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Epoch base for ts: 2026-01-01 00:00:00 UTC (fixed, arbitrary).
_EPOCH_BASE = 1767225600

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _u01(*cols) -> F.Column:
    """Deterministic pseudo-uniform in [0, 1) from hashing the inputs.

    Mirrors the reference's index-seeded RNG
    (algorithms/generate/random.hxx:20-34): same index -> same value.
    """
    h = F.xxhash64(*cols)
    # map int64 -> [0,1): shift to unsigned via abs of modulo
    return (F.pmod(h, F.lit(2**31)).cast("double")) / F.lit(float(2**31))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 64,
    n_tools: int = 20,
    parallelism: int | None = None,
) -> DataFrame:
    """Generate a deterministic transcripts DataFrame.

    - conversation length: power-law-ish (heavy tail -> long chains,
      exercising multi-round pointer jumping in CC);
    - tool: Zipf-skewed over ``tool00..`` so tool00 is a hub vertex
      (exercises skew mitigation, north-rule requirement);
    - text: pure function of (conv_id, turn_idx) -> enables the
      rehydration text-equality invariant.
    """
    convs = spark.range(0, n_convs, 1, parallelism or spark.sparkContext.defaultParallelism)
    s = F.lit(seed)

    # Power-law-ish length: ceil(max_turns * u^3) in [1, max_turns];
    # cubing the uniform skews mass toward short conversations with a
    # heavy tail of long ones.
    u_len = _u01(F.col("id"), s, F.lit("len"))
    convs = convs.select(
        F.col("id").alias("conv_i"),
        F.format_string("conv%08d", F.col("id")).alias("conv_id"),
        F.greatest(F.lit(1), F.ceil(F.lit(max_turns) * F.pow(u_len, F.lit(3.0))).cast("int")).alias("n_turns"),
    )

    turns = convs.select(
        "conv_i",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    u_tool = _u01(F.col("conv_i"), F.col("turn_idx"), s, F.lit("tool?"))
    u_which = _u01(F.col("conv_i"), F.col("turn_idx"), s, F.lit("which"))
    is_assistant = F.col("turn_idx") % 2 == 1
    # ~30% of assistant turns call a tool; tool index Zipf-ish via u^4
    # (tool00 dominates -> hub vertex).
    tool = F.when(
        is_assistant & (u_tool < 0.3),
        F.format_string("tool%02d", F.floor(F.lit(n_tools) * F.pow(u_which, F.lit(4.0))).cast("int")),
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(is_assistant, F.lit("assistant")).otherwise(F.lit("user")).alias("role"),
        F.concat(
            F.lit("t-"),
            F.col("conv_id"),
            F.lit("-"),
            F.col("turn_idx").cast("string"),
            F.lit("-"),
            F.substring(F.sha1(F.concat_ws("|", F.col("conv_id"), F.col("turn_idx"))), 1, 12),
        ).alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(F.lit(_EPOCH_BASE) + F.col("conv_i") * 1000 + F.col("turn_idx")).alias("ts"),
    )


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Adapt the driver-provided ``events`` table into transcript shape.

    Deterministic mapping (also expressed in ANSI SQL in
    __spark_entry__.oracle_sql so DuckDB computes the identical table):
    each user becomes a conversation; events ordered by (ts, event_id)
    become turns; event_type becomes the tool on every third event.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.format_string("conv%06d", F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_id"),
        F.col("event_type"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.col("ts"),
    ).select(
        "conv_id",
        "turn_idx",
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        "text",
        F.when(F.col("event_id") % 3 == 0, F.col("event_type")).alias("tool"),
        "ts",
    )


def rehydrate(turn_vertices: DataFrame) -> DataFrame:
    """Project turn vertices back to (conv_id, turn_idx, text), ordered.

    Supports the per-turn text-equality invariant (BASELINE.json
    input_hint): rehydrated == source under (conv_id, turn_idx) order.
    """
    return (
        turn_vertices.filter(F.col("kind") == "turn")
        .select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
    )


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """Tool-call transition graph: (src_tool, dst_tool, n).

    A transcript-native derived graph (the payload axis of the north
    rule): for each conversation, consecutive tool-bearing turns in
    (turn_idx) order contribute one src->dst transition; ``n`` counts
    them corpus-wide. The per-conversation lead() is a single window
    pass over the conv-partitioned turns (linear, never a
    per-conversation self-join), and the aggregate is tool-cardinality
    scale — at 10^12 turns the output is a tiny dense digraph the
    engine's centrality operators (pagerank, hits) run on directly.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    tools = transcripts.filter(F.col("tool").isNotNull()).select("conv_id", "turn_idx", "tool")
    return (
        tools.withColumn("dst_tool", F.lead("tool").over(w))
        .filter(F.col("dst_tool").isNotNull())
        .groupBy(F.col("tool").alias("src_tool"), "dst_tool")
        .agg(F.count("*").alias("n"))
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation rollup: (conv_id, n_turns, n_tool_calls,
    n_distinct_tools, duration_us, avg_text_len).

    The transcript-payload profile table a curation pipeline filters
    on (too-short conversations, tool-spam, degenerate text) before
    graph derivation. One shuffle (groupBy conv_id) with map-side
    partials; every aggregate is a built-in JVM expression. ``ts`` is
    TIMESTAMP_NTZ — the duration is an exact NTZ-to-NTZ microsecond
    diff (session-timezone-independent, no boundary-truncation
    semantics to disagree on cross-engine).
    """
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count("tool").alias("n_tool_calls"),
        F.countDistinct("tool").alias("n_distinct_tools"),
        F.timestamp_diff("MICROSECOND", F.min("ts"), F.max("ts")).alias("duration_us"),
        F.round(F.avg(F.length("text")), 6).alias("avg_text_len"),
    )


def temporal_edges(transcripts: DataFrame) -> DataFrame:
    """Time-stamped influence edges (src_key, dst_key, ets_us):

    - turn -> next turn (same conversation), stamped with the NEXT
      turn's wall-clock (when the influence lands);
    - turn <-> tool (both directions), stamped with the turn's ts —
      a turn deposits influence into a tool at its own time, and any
      LATER turn in any conversation can pick it up.

    Feeds temporal (time-respecting) reachability: a path is valid iff
    edge timestamps are non-decreasing, the standard temporal-graph
    semantics. Timestamps are exact NTZ-to-NTZ microsecond diffs
    (session-timezone-independent integers — the oracle reproduces
    them bit-for-bit, no FP anywhere)."""
    from pyspark.sql import Window as W

    epoch0 = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    t = transcripts.select(
        "conv_id", "turn_idx", "tool",
        F.timestamp_diff("MICROSECOND", epoch0, F.col("ts")).alias("ets_us"),
    )
    turnk = F.concat(
        F.lit("turn|"), F.col("conv_id"), F.lit(":"),
        F.lpad(F.col("turn_idx").cast("string"), 6, "0"),
    )
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    base = t.select("conv_id", "turn_idx", "tool", "ets_us", turnk.alias("tk"))
    adj = (
        base.withColumn("nk", F.lead("tk").over(w))
        .withColumn("nts", F.lead("ets_us").over(w))
        .filter(F.col("nk").isNotNull())
        .select(F.col("tk").alias("src_key"), F.col("nk").alias("dst_key"), F.col("nts").alias("ets_us"))
    )
    toolk = F.concat(F.lit("tool|"), F.col("tool"))
    t2tool = base.filter(F.col("tool").isNotNull()).select(
        F.col("tk").alias("src_key"), toolk.alias("dst_key"), "ets_us"
    )
    tool2t = base.filter(F.col("tool").isNotNull()).select(
        toolk.alias("src_key"), F.col("tk").alias("dst_key"), "ets_us"
    )
    return adj.unionByName(t2tool).unionByName(tool2t)


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based batch sessionization: within each user's time-ordered
    event stream, a new session starts where the inter-event gap
    exceeds ``gap_minutes``. Returns the input ids plus
    (session_idx: int, starting at 0 per user).

    Pure integer algebra (gaps in epoch-µs; ties broken by id), so an
    ANSI-SQL oracle replays every assignment. One window pass
    PARTITIONED BY user — per-user state, embarrassingly parallel at
    10^9 users; nothing global. The streaming twin with true
    incremental state is streaming/ingest.conversation_sessions
    (applyInPandasWithState); this is the batch/backfill path — both
    produce the same boundaries on the same input.
    """
    from pyspark.sql import Window

    epoch0 = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    us = F.timestamp_diff("MICROSECOND", epoch0, F.col(ts_col).cast("timestamp_ntz"))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc())
    gap_us = int(gap_minutes) * 60_000_000
    brk = (
        F.when(F.lag(us).over(w).isNull(), F.lit(0))
        .when(us - F.lag(us).over(w) > F.lit(gap_us), F.lit(1))
        .otherwise(F.lit(0))
    )
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.sum(brk).over(
            Window.partitionBy(user_col)
            .orderBy(us.asc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int").alias("session_idx"),
    )


def tool_cooccurrence_pmi(transcripts: DataFrame) -> DataFrame:
    """Pointwise mutual information of tool PAIRS over conversations:
    for tools a < b, pmi(a,b) = ln(n_ab·N / (n_a·n_b)) where n_x =
    conversations containing x, n_ab = containing both, N = all
    conversations. The standard association score for building tool
    affinity graphs / suggesting tool bundles. Counts are exact
    BIGINTs; the single ln is the only FP step (rounded to 1e-6 —
    the engine's scalar-gate convention). Returns
    (tool_a, tool_b, n_a, n_b, n_ab, pmi_e6).

    Scale shape: distinct (conv, tool) is one shuffle; the pair join
    is per-conversation (tools-per-conversation bounded, never a
    global tool×tool product); marginals broadcast."""
    t = transcripts.filter(F.col("tool").isNotNull()).select("conv_id", "tool").distinct()
    n_convs = transcripts.select("conv_id").distinct().count()
    marg = t.groupBy("tool").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    a = t.select("conv_id", F.col("tool").alias("tool_a"))
    b = t.select("conv_id", F.col("tool").alias("tool_b"))
    pairs = (
        a.join(b, "conv_id")
        .filter(F.col("tool_a") < F.col("tool_b"))
        .groupBy("tool_a", "tool_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ma = marg.select(F.col("tool").alias("tool_a"), F.col("n_t").alias("n_a"))
    mb = marg.select(F.col("tool").alias("tool_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "tool_a")
        .join(F.broadcast(mb), "tool_b")
        .select(
            "tool_a",
            "tool_b",
            "n_a",
            "n_b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") * F.lit(float(n_convs)))
                    / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                )
                * 1e6
            )
            .cast("long")
            .alias("pmi_e6"),
        )
    )
