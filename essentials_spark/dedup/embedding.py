"""Embedding-cosine near-duplicate pairs.

Near-dup = cosine similarity above threshold in embedding space.
Candidate generation reuses the random-hyperplane LSH from ann/ (a
bucketed equi-join — never a cross join); pairs are verified with the
exact cosine. For small candidate sets brute force is available via
ann.brute_force_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def embedding_cosine_pairs(
    vectors: DataFrame,
    min_sim: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 10,
    tables: int = 6,
    bucket_cap: int | None = 64,
    portable: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Returns (a, b, sim) with a < b and sim >= min_sim.

    Threshold-first pair generation (ann.cosine.lsh_pairs) — no giant-k
    ranking window; degenerate LSH buckets are capped (``bucket_cap=
    None`` disables the cap: exact recall within buckets, the oracle
    mode). ``portable=True`` + ``dim``: literal-plane signatures whose
    buckets are exactly reproducible in DuckDB SQL."""
    from essentials_spark.ann.cosine import lsh_pairs

    return lsh_pairs(
        vectors, min_sim, id_col=id_col, vec_col=vec_col, bits=bits, tables=tables,
        bucket_cap=bucket_cap, portable=portable, dim=dim,
    )
