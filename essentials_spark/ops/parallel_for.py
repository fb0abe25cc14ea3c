"""parallel_for: apply an expression to every element.

Reference: include/gunrock/framework/operators/for/for.hxx:28-43 with
scopes element/vertex/edge/weight (operators/configs.hxx:87-92). On
Spark a per-element transform is a projection — whole-stage codegen
fuses it with neighbors, which is the analogue of the reference's
lambda-inlining kernel fusion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def parallel_for(df: DataFrame, **exprs: Column) -> DataFrame:
    """Apply named column expressions (add or replace columns)."""
    return df.withColumns(dict(exprs))
