"""MinHash + LSH near-duplicate detection.

Pipeline (all JVM-side Spark SQL expressions — no Python in the row
path): shingle -> minhash signature -> band -> bucket-join.

- shingles: word k-grams hashed to int64 (xxhash64);
- signature: num_perm minhash values, permutation i approximated by
  min over shingles of xxhash64(shingle, i) — the standard
  hash-family trick;
- LSH: signature split into bands of rows; two docs land in the same
  bucket when a whole band matches; candidate pairs are verified with
  real signature similarity.

At 100 TB the only shuffles are the bucket groupBy and the candidate
dedup — no cross join ever materializes; band width / count tune the
similarity threshold s ≈ (1/bands)^(1/rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingles(text_col, k: int = 5):
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))))


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig: array<long>[num_perm])."""
    def perm(i: int):
        # closure factory — `lambda s, i=i` would make PySpark treat the
        # lambda as binary and bind the ARRAY INDEX to i (see simhash.py)
        return lambda s: F.xxhash64(s, F.lit(i))

    sh = _shingles(F.col(text_col), shingle_k)
    sig = F.array(*[F.array_min(F.transform(F.col("_sh"), perm(i))) for i in range(num_perm)])
    return (
        docs.select(F.col(id_col).alias("id"), sh.alias("_sh"))
        .filter(F.size("_sh") > 0)
        .select("id", sig.alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    min_sim: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs (a, b, sig_sim), a < b, verified by
    full-signature agreement >= min_sim."""
    rows = num_perm // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_perm, shingle_k)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.concat_ws(",", *[F.col("sig")[b * rows + r] for r in range(rows)])).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    left = banded.select("band", "bucket", F.col("id").alias("a"), F.col("sig").alias("siga"))
    right = banded.select("band", "bucket", F.col("id").alias("b"), F.col("sig").alias("sigb"))
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    sim = F.size(F.filter(F.zip_with("siga", "sigb", lambda x, y: x == y), lambda v: v)) / F.size("siga")
    return cand.select("a", "b", F.round(sim, 6).alias("sig_sim")).filter(F.col("sig_sim") >= min_sim)


def minhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Keep/drop assignment: connected components over the near-dup
    pair graph (reusing the engine's CC), keeping the min id of each
    duplicate cluster. Returns (id, keep: bool, cluster: long)."""
    from essentials_spark.algos import connected_components
    from essentials_spark.graph.derive import Graph

    pairs = minhash_lsh_pairs(docs, text_col, id_col, **kwargs)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight"))
    vertices = docs.select(F.col(id_col).alias("vid"))
    labels = connected_components(Graph(vertices=vertices, edges=edges))
    return labels.select(
        F.col("vid").alias("id"),
        F.col("label").alias("cluster"),
        (F.col("vid") == F.col("label")).alias("keep"),
    )
