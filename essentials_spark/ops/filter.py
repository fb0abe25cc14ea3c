"""filter: keep/drop frontier items by predicate.

Reference: include/gunrock/framework/operators/filter/filter.hxx:59-86
with four physical variants (compact / predicated / remove / bypass,
operators/filter/*.hxx). In Spark all compacting variants are
``df.filter`` (Catalyst always compacts); ``bypass`` (lazy delete,
filter/bypass.hxx:11-46) is a boolean mark column that defers
compaction, which Catalyst keeps lazy anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_frontier(frontier: DataFrame, pred: Column, remove: bool = False) -> DataFrame:
    """compact / predicated / remove variants: one Spark filter.

    ``remove=True`` inverts the predicate
    (thrust::remove_copy_if, operators/filter/remove.hxx:11-38).
    """
    return frontier.filter(~pred if remove else pred)


def bypass_filter(frontier: DataFrame, pred: Column, mark_col: str = "active") -> DataFrame:
    """bypass variant: mark invalid in place, no compaction
    (operators/filter/bypass.hxx:11-46). Downstream ops skip rows with
    ``mark_col == false``; call :func:`compact` to materialize."""
    return frontier.withColumn(mark_col, pred)


def compact(frontier: DataFrame, mark_col: str = "active") -> DataFrame:
    """Compact a bypass-marked frontier (2-pass stream compaction,
    operators/filter/compact.hxx:12-37 — Spark does it in one)."""
    return frontier.filter(F.col(mark_col)).drop(mark_col)
