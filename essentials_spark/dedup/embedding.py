"""Embedding-cosine near-duplicate pairs.

Near-dup = cosine similarity above threshold in embedding space.
Candidate generation reuses the random-hyperplane LSH from ann/ (a
bucketed equi-join — never a cross join); pairs are verified with the
exact cosine. For small candidate sets brute force is available via
ann.brute_force_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_cosine_pairs(
    vectors: DataFrame,
    min_sim: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 10,
    tables: int = 6,
) -> DataFrame:
    """Returns (a, b, sim) with a < b and sim >= min_sim."""
    from essentials_spark.ann.cosine import lsh_topk

    # lsh_topk already dedups pairs and computes exact cosine; reuse it
    # with k large enough to keep all above-threshold matches
    topk = lsh_topk(vectors, vectors, k=1_000_000, id_col=id_col, vec_col=vec_col, bits=bits, tables=tables)
    return (
        topk.filter(F.col("sim") >= min_sim)
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select(F.col("query_id").alias("a"), F.col("neighbor_id").alias("b"), "sim")
    )
