"""uniquify: deduplicate a frontier.

Reference: include/gunrock/framework/operators/uniquify/uniquify.hxx:16-43
— full sort+unique for 100% uniqueness, or a cheaper best-effort
adjacent dedup. Spark: ``dropDuplicates`` (exact, shuffles) or a
per-partition pandas dedup (best-effort, shuffle-free) — the latter
mirrors what Catalyst's partial aggregation already does before a
distinct's exchange, exposed for frontier-blowup control between
supersteps without forcing a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def uniquify(frontier: DataFrame, cols: list[str] | None = None, best_effort: bool = False) -> DataFrame:
    cols = cols or frontier.columns
    if not best_effort:
        return frontier.dropDuplicates(cols)

    schema = frontier.schema

    def dedup_partition(batches):
        import pandas as pd

        seen: set = set()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mask = ~pd.MultiIndex.from_frame(pdf[cols]).isin(seen)
            out = pdf[mask]
            seen.update(map(tuple, out[cols].itertuples(index=False, name=None)))
            yield out

    return frontier.mapInPandas(dedup_partition, schema=schema)
