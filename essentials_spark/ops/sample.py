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


def mixture_sample(
    df: DataFrame,
    token_budget: int,
    targets_ppm: dict[str, int],
    group_col: str = "lang",
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Budgeted mixture sampling — the "data mixture" step of a
    pretraining pipeline: pick per-group keep RATES so the expected
    sampled token mass approaches ``token_budget`` tokens split per
    ``targets_ppm`` (group -> ppm share of the budget; groups absent
    from the map get share 0 and are dropped).

        target_g  = token_budget * share_g // 1e6          (tokens)
        rate_g    = min(1e6, target_g * 1e6 // tokens_g)    (ppm)

    All integer floor arithmetic — the oracle replays the rates
    exactly; selection reuses the md5-int60 bucket, so the same
    monotonicity/reproducibility contract as stratified_sample holds
    (raising the budget only ADDS rows). Rates above 1e6 clamp: a
    group with fewer tokens than its target keeps everything (no
    upsampling — duplication is a separate, explicit op).

    Scale shape: one group-scale aggregate + a broadcast join of the
    O(groups) rate table + a narrow filter. No driver-side data.
    Output adds rate_ppm and bucket columns (both integer-gateable).
    """
    share = None
    for g, s in sorted(targets_ppm.items()):
        cond = F.col(group_col) == g
        share = F.when(cond, F.lit(s)) if share is None else share.when(cond, F.lit(s))
    share = share.otherwise(F.lit(0)) if share is not None else F.lit(0)

    totals = df.groupBy(group_col).agg(F.sum(F.col(token_col)).cast("long").alias("_gtok"))
    rates = (
        totals.withColumn("_share", share.cast("long"))
        .select(
            group_col,
            F.least(
                F.lit(PPM).cast("long"),
                F.expr(f"CAST({int(token_budget)} AS BIGINT) * _share DIV {PPM} * {PPM} DIV _gtok"),
            ).alias("rate_ppm"),
        )
    )
    key = F.concat(F.col(group_col), F.lit("|"), F.col(key_col).cast("string"))
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("bucket", sample_bucket(key))
        .filter(F.col("bucket") < F.col("rate_ppm"))
    )


def importance_sample(
    df: DataFrame,
    rate_ppm_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-ROW acceptance sampling: keep each row with probability
    ``rate_ppm_col``/1e6 (a quality score, a recency weight — any
    per-row integer rate), decided by the portable md5 bucket of the
    row key. The per-row generalization of stratified_sample's
    per-group rates: deterministic, layout-independent, monotone
    (raising a row's rate can only keep it), and exactly replayable.
    Narrow filter — no shuffle, pushdown survives."""
    key = F.col(key_col).cast("string")
    return df.filter(sample_bucket(key) < F.col(rate_ppm_col).cast("long"))


def sample_fixed_k(
    df: DataFrame,
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic uniform k-sample WITHOUT replacement: the k rows
    with the smallest md5-int60 of their key (ties impossible for
    distinct keys; duplicate keys hash identically, keeping the sample
    a function of the key SET). Distributed top-k — per-partition
    heaps then a k-row merge, never a global sort of the data; the
    selection is stable under any partitioning and under appending
    rows that hash higher (the bottom-k reservoir property)."""
    key = F.col(key_col).cast("string")
    return df.withColumn("_h", md5_int60(key)).orderBy("_h").limit(int(k)).drop("_h")


def assign_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train_ppm: int = 900_000,
    val_ppm: int = 50_000,
) -> DataFrame:
    """Deterministic train/val/test split assignment: the md5 bucket
    of the key partitions rows into train (< train_ppm), val
    (< train_ppm + val_ppm), test (the rest). The split is a pure
    function of the KEY — stable across runs, layouts, and corpus
    growth (a new document can never move an old one between splits;
    the leakage-safety property eval pipelines require). Keying by a
    GROUP id (conversation, source domain) keeps whole groups in one
    split — pass that column as key_col. Narrow projection, no
    shuffle."""
    b = sample_bucket(F.col(key_col).cast("string"))
    return df.withColumn(
        "split",
        F.when(b < F.lit(train_ppm), F.lit("train"))
        .when(b < F.lit(train_ppm + val_ppm), F.lit("val"))
        .otherwise(F.lit("test")),
    )
