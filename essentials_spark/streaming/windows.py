"""Event-time window rollups — the Structured-Streaming aggregation
shape, runnable identically over a batch DataFrame or a readStream.

``F.window`` is the engine-native windowing primitive: in batch it is
one groupBy on the derived window struct (map-side partial agg, one
shuffle keyed by (window, ...)); under ``readStream`` the SAME
expression becomes an incremental stateful aggregation whose state is
bounded by ``withWatermark`` (late rows beyond the watermark are
dropped, closed windows are emitted and evicted). Writing the rollup
once and running it in both modes is the streaming/batch-parity
contract the incremental family (streaming/ingest.py) already
follows for edge derivation.

Scale shape: state ~ #open windows x #group keys, independent of
row count; a tumbling window assigns each row to exactly one window
(no fan-out), a sliding window to ceil(width/slide) windows (bounded
replication, here 2x). Outputs are exact integers + epoch-us window
bounds, so the DuckDB oracle replays them with pure integer
arithmetic (window start = slide * (t DIV slide) and its preceding
slide offsets).

Reference analogue: per-iteration frontier statistics rollups
(framework/enactor.hxx iteration loop) — bounded-state aggregation
over an unbounded stream of work items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH0 = "1970-01-01 00:00:00"


def _win_bounds_us(prefix: str = "window"):
    epoch0 = F.lit(_EPOCH0).cast("timestamp_ntz")
    return [
        F.timestamp_diff("MICROSECOND", epoch0, F.col(f"{prefix}.start").cast("timestamp_ntz")).alias("win_start_us"),
        F.timestamp_diff("MICROSECOND", epoch0, F.col(f"{prefix}.end").cast("timestamp_ntz")).alias("win_end_us"),
    ]


def _n_convs_agg(df: DataFrame):
    """Exact distinct in batch; HLL (approx_count_distinct) under a
    stream — streaming aggregation forbids exact DISTINCT state.
    HLL register merge is commutative/associative and deterministic,
    so incremental micro-batch folding yields the IDENTICAL estimate
    a one-shot batch HLL pass does (the parity test pins this)."""
    if df.isStreaming:
        return F.approx_count_distinct("conv_id").alias("n_convs")
    return F.countDistinct("conv_id").alias("n_convs")


def tumbling_rollup(
    turns: DataFrame,
    width: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """(win_start_us, win_end_us, n_turns, n_convs, n_tool_calls) per
    tumbling window. Pass ``watermark`` (e.g. ``"2 hours"``) when
    ``turns`` is a stream to bound state; batch runs leave it None.
    Event time must be TIMESTAMP (not NTZ) for watermarked streams.
    """
    df = turns
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    agg = df.groupBy(F.window(F.col(ts_col), width).alias("w")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        _n_convs_agg(df),
        F.count("tool").alias("n_tool_calls"),
    )
    return agg.select(*_win_bounds_us("w"), "n_turns", "n_convs", "n_tool_calls")


def sliding_rollup(
    turns: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window variant: each row lands in width/slide windows
    (bounded replication — 2x for 1h/30m). Same output schema as
    :func:`tumbling_rollup`.
    """
    df = turns
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    agg = df.groupBy(F.window(F.col(ts_col), width, slide).alias("w")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        _n_convs_agg(df),
        F.count("tool").alias("n_tool_calls"),
    )
    return agg.select(*_win_bounds_us("w"), "n_turns", "n_convs", "n_tool_calls")
