"""Sequence packing — batching documents into fixed token budgets.

The training-data step downstream of curation: documents are packed
into fixed-size training sequences (budget = context length in
tokens). Two packers, both deterministic:

- ``pack_sequences`` — streaming cumulative packing: docs in id order
  per source group, a document starts a new sequence when the running
  total crosses the budget. One window pass (running sum + integer
  bucket), fully expressible in ANSI SQL, so the gate value-checks it
  against DuckDB. Documents may straddle a boundary (the trainer
  splits them); ``offset_in_seq`` tells it where.
- ``pack_sequences_ffd`` — capacity-respecting first-fit-decreasing
  bin packing per (source, shard) group via ``applyInPandas``: no
  sequence exceeds the budget (oversized single docs get a dedicated
  sequence). FFD is iterative (not SQL-replayable), so its gate entry
  is rows-only and pytest pins the invariants instead (disjoint
  cover, capacity, determinism, FFD bound).

Scale shape: both packers parallelize across (source[, shard]) groups
— no global ordering, no single-partition window. At 100 TB a single
source can hold billions of docs, so the FFD path sub-shards groups
with a hash (``n_shards``); packing becomes shard-local, which only
costs a bounded per-shard tail (< one budget of waste per shard, the
standard local-packing trade). The window packer's per-group running
sum is Spark's partial-aggregated window — group-parallel, never
driver-side.

Tokenization matches text/rank.py (bm25): whitespace split of the
lowercased, trimmed text — the same count both engines compute.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, tokens): whitespace token count per document."""
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).cast("long").alias("tokens"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Streaming cumulative packing within each ``group_col`` group.

    Returns (id_col, group_col, tokens, seq_id, offset_in_seq):
    ``seq_id = <group>:<floor(preceding_tokens / budget)>`` and
    ``offset_in_seq`` is the doc's start position inside its sequence.
    All outputs are integers/strings — value-exact vs the SQL oracle.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).cast("long").alias("tokens"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("tokens").over(w)
    before = (cum - F.col("tokens")).alias("before")
    # integer-valued doubles are exact below 2^53: floor() is
    # deterministic and identical in DuckDB
    seq_idx = F.floor((cum - F.col("tokens")) / F.lit(budget)).cast("long")
    return toks.select(
        id_col,
        group_col,
        "tokens",
        F.concat(F.col(group_col), F.lit(":"), seq_idx.cast("string")).alias("seq_id"),
        (before - seq_idx * F.lit(budget)).cast("long").alias("offset_in_seq"),
    )


def pack_sequences_ffd(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_shards: int = 1,
) -> DataFrame:
    """First-fit-decreasing bin packing within each (group, shard).

    Returns (id_col, group_col, tokens, seq_id): every sequence's
    token total is <= budget unless it holds a single oversized doc.
    ``seq_id = <group>:<shard>:<bin>`` with bins numbered in creation
    order — fully deterministic (sort key: tokens desc, id asc).

    ``n_shards`` bounds the rows any single FFD task sees: at corpus
    scale a source group is sub-sharded by id hash and packed
    shard-locally (waste: < budget per shard tail, the standard
    trade for parallel packing).
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_grp"),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).cast("long").alias("tokens"),
    ).withColumn("_shard", F.pmod(F.xxhash64("_id"), F.lit(n_shards)).cast("int"))

    out_schema = "_id long, _grp string, _shard int, tokens long, bin long"

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tokens", "_id"], ascending=[False, True], kind="mergesort")
        caps: list[int] = []  # remaining capacity per bin, creation order
        bins = []
        for t in pdf["tokens"].to_numpy():
            placed = -1
            for j, c in enumerate(caps):
                if c >= t:
                    placed = j
                    break
            if placed < 0:
                caps.append(budget)
                placed = len(caps) - 1
                # oversized doc: dedicated bin, capacity goes negative
            caps[placed] -= int(t)
            bins.append(placed)
        pdf = pdf.assign(bin=bins)
        return pdf

    packed = toks.groupBy("_grp", "_shard").applyInPandas(_ffd, schema=out_schema)
    return packed.select(
        F.col("_id").alias(id_col),
        F.col("_grp").alias(group_col),
        "tokens",
        F.concat_ws(":", "_grp", F.col("_shard").cast("string"), F.col("bin").cast("string")).alias("seq_id"),
    )


def packing_stats(packed: DataFrame, budget: int, group_col: str = "source") -> DataFrame:
    """Per-group packing quality rollup over a packer's output:
    (group, n_docs, n_seqs, total_tokens, max_seq_tokens,
    fill_ppm = round(1e6 * total_tokens / (n_seqs * budget))).

    ``fill_ppm`` is the bin-utilization figure a pipeline alerts on.
    """
    per_seq = packed.groupBy(group_col, "seq_id").agg(
        F.count("*").alias("n_docs_seq"), F.sum("tokens").alias("seq_tokens")
    )
    return per_seq.groupBy(group_col).agg(
        F.sum("n_docs_seq").alias("n_docs"),
        F.count("*").alias("n_seqs"),
        F.sum("seq_tokens").alias("total_tokens"),
        F.max("seq_tokens").alias("max_seq_tokens"),
        F.round(
            F.lit(1e6) * F.sum("seq_tokens") / (F.count("*") * F.lit(budget))
        ).cast("long").alias("fill_ppm"),
    )
