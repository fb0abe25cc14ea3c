"""Exact n-gram Jaccard similarity for candidate-pair verification.

Given candidate pairs (from MinHash/SimHash), compute the true Jaccard
similarity of word n-gram sets with set expressions — the standard
verify step after approximate candidate generation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngram_set(text_col: Column, n: int) -> Column:
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))


def ngram_jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.0,
) -> DataFrame:
    """pairs: (a, b). Returns (a, b, jaccard) for pairs with
    jaccard >= min_jaccard. Two joins to attach the n-gram sets, then
    pure array expressions (intersect/union sizes)."""
    grams = docs.select(F.col(id_col).alias("id"), _ngram_set(F.col(text_col), n).alias("g"))
    joined = (
        pairs.join(grams.select(F.col("id").alias("a"), F.col("g").alias("ga")), "a")
        .join(grams.select(F.col("id").alias("b"), F.col("g").alias("gb")), "b")
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select("a", "b", F.round(jac, 6).alias("jaccard")).filter(
        F.col("jaccard") >= min_jaccard
    )
