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
    # long floordiv (DIV): exact for ANY budget — no FP floor-boundary
    # risk at large cumulative sums; mirrored as // in the DuckDB oracle
    staged = toks.select(
        id_col,
        group_col,
        "tokens",
        (cum - F.col("tokens")).cast("long").alias("before"),
    )
    seq_idx = F.expr(f"before DIV {int(budget)}")
    return staged.select(
        id_col,
        group_col,
        "tokens",
        F.concat(F.col(group_col), F.lit(":"), seq_idx.cast("string")).alias("seq_id"),
        (F.col("before") - seq_idx * F.lit(budget)).cast("long").alias("offset_in_seq"),
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


def chunk_documents(
    docs: DataFrame,
    max_len: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-length training chunks with overlap: split each document
    into windows of ``max_len`` whitespace tokens, striding
    ``max_len - overlap`` so consecutive chunks share ``overlap``
    tokens (the context-continuity convention LM pipelines use).
    Returns (id_col, chunk_idx, start_tok, n_toks, chunk_text).

    Pure integer geometry + one explode — no shuffle, no state:
    n_chunks = 1 + ceil(max(n - max_len, 0) / stride), chunk i covers
    tokens [i·stride, i·stride + max_len). The trailing chunk is the
    only short one; a document shorter than max_len is one chunk.
    Every boundary is exact integer arithmetic over the engine's
    token convention (split on ' '), so a SQL oracle replays both the
    geometry and the reassembled chunk text."""
    toks = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(toks)
    stride = max_len - overlap
    if stride <= 0:
        raise ValueError("chunk_documents: overlap must be < max_len")
    n_chunks = (
        F.lit(1)
        + F.floor((F.greatest(n - F.lit(max_len), F.lit(0)) + F.lit(stride - 1)) / F.lit(stride))
    ).cast("int")
    c = docs.select(
        F.col(id_col),
        toks.alias("_t"),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * F.lit(stride)
    ln = F.least(F.lit(max_len), F.col("_n") - start)
    return c.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        ln.cast("long").alias("n_toks"),
        F.concat_ws(" ", F.slice(F.col("_t"), start + 1, ln)).alias("chunk_text"),
    )
