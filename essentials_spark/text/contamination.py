"""Benchmark contamination detection — n-gram overlap screening.

The decontamination step of a training-data pipeline: flag training
documents sharing any word n-gram with a benchmark/eval set, so they
can be dropped before training (the standard 8-13-gram screen from
public LLM data literature; here the n is a parameter since the
synthetic corpus has short texts).

Plan shape (all JVM expressions, no Python in the row path):

1. benchmark docs -> distinct n-gram strings (one projection);
2. training docs -> per-doc distinct n-grams (explode);
3. inner join on the n-gram, count matches per doc.

At 100 TB the benchmark side is eval suites — tiny relative to the
corpus — so the join broadcasts (mass-gated: `F.broadcast` under
``broadcast_bench``); the training side streams through one explode +
one aggregation, never materializing cross-doc pairs. If the
benchmark set outgrows broadcast, the same plan runs as a shuffle
hash join, still |matching grams|-bounded.

Tokenization matches text/rank.py / dedup/minhash.py: whitespace
split of lowercased trimmed text; n-grams are space-joined slices
(the dedup/jaccard.py shingle convention), so the DuckDB oracle
reproduces them verbatim with list_transform + list_slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngrams(text_col, n: int):
    """Array of word n-gram strings (space-joined), lowercased.

    Docs shorter than ``n`` tokens emit NO grams (standard
    decontamination semantics: a sub-n-gram overlap is not a hit), so
    the index range is gated rather than clamped."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """(id_col, hit_ngrams) for training docs sharing >= 1 word
    n-gram with the benchmark set; hit_ngrams counts the DISTINCT
    contaminated n-grams of the doc (integer — value-exact gate).

    Clean docs are absent from the output (the common filter shape:
    anti-join the result to keep the corpus).
    """
    bench_grams = (
        bench.select(F.explode(_ngrams(F.col(text_col), n)).alias("gram")).distinct()
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    train_grams = train.select(
        F.col(id_col), F.explode(F.array_distinct(_ngrams(F.col(text_col), n))).alias("gram")
    )
    return (
        train_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("hit_ngrams"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    max_hits: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training corpus minus contaminated docs (> max_hits shared
    n-grams). Same single-join plan; returns the surviving rows of
    ``train`` unchanged."""
    hits = ngram_contamination(train, bench, n=n, text_col=text_col, id_col=id_col)
    flagged = hits.filter(F.col("hit_ngrams") > max_hits).select(id_col)
    return train.join(flagged, id_col, "left_anti")
