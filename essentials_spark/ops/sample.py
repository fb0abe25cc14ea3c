"""Deterministic stratified sampling — reproducible corpus slicing.

A training-data pipeline samples per stratum (source, language,
quality band) with different rates. Random sampling is neither
reproducible across runs nor checkable; this operator is both: a row
is kept iff a portable content hash of its key falls under the
stratum's ppm threshold, so

- the SAME rows are selected on every run, on any cluster layout,
  at any parallelism (no RNG, no per-partition state);
- the expected rate is exact in distribution (md5 is uniform);
- the DuckDB oracle replays the selection bit-for-bit via the
  functions/portable_hash.py md5-int60 convention.

Pure narrow filter — no shuffle; predicate pushdown survives since
the hash is a deterministic scalar expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from essentials_spark.functions.portable_hash import md5_int60

PPM = 1_000_000


def sample_bucket(key: Column) -> Column:
    """Stable ppm bucket in [0, 1e6) for a string key."""
    return md5_int60(key) % F.lit(PPM)


def stratified_sample(
    df: DataFrame,
    rate_ppm: int,
    key_col: str = "doc_id",
    group_col: str | None = None,
    group_rates_ppm: dict[str, int] | None = None,
) -> DataFrame:
    """Keep rows whose hash bucket < the stratum rate.

    ``rate_ppm`` is the default rate; ``group_rates_ppm`` overrides it
    per ``group_col`` value (strata absent from the map use the
    default). The hash key is ``group|key`` so changing one stratum's
    rate never reshuffles another stratum's selection (monotone:
    raising a rate only ADDS rows — the reservoir property pipelines
    rely on for incremental re-curation).
    """
    if group_col is None:
        key = F.col(key_col).cast("string")
        return df.filter(sample_bucket(key) < F.lit(rate_ppm))
    key = F.concat(F.col(group_col), F.lit("|"), F.col(key_col).cast("string"))
    rate = F.lit(rate_ppm)
    if group_rates_ppm:
        expr = None
        for g, r in sorted(group_rates_ppm.items()):
            cond = F.col(group_col) == g
            expr = F.when(cond, F.lit(r)) if expr is None else expr.when(cond, F.lit(r))
        rate = expr.otherwise(F.lit(rate_ppm))
    return df.filter(sample_bucket(key) < rate)
