"""SimHash near-duplicate detection.

64-bit SimHash: each token votes its hash bits (+1/-1); the signature
is the sign vector. Near-dups have small Hamming distance. Candidate
generation splits the 64 bits into ``blocks`` chunks — two docs within
Hamming distance (blocks-1) share at least one exact chunk
(pigeonhole), so candidates come from equi-joins on chunk values, no
cross join. All JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bit_set(h, i: int):
    # bit 63 is the sign bit of the int64 hash
    if i == 63:
        return h < 0
    return h.bitwiseAND(F.lit(1 << i)) != F.lit(0)


def _bit_value(i: int) -> int:
    return -(2**63) if i == 63 else (1 << i)


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", portable: bool = False
) -> DataFrame:
    """(id, simhash: long) — 64-bit signature (bit 63 via sign).

    ``portable``: 32-bit signature over the md5-derived token hash from
    functions/portable_hash.py — bit-identical to the generated
    ANSI-SQL oracle (xxhash64 is not reproducible in DuckDB), so the
    correctness gate can value-check signatures, not just row counts."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    if portable:
        from essentials_spark.functions.portable_hash import md5_int60

        nbits = 32
        hashes = F.transform(toks, lambda t: md5_int60(t) % F.lit(1 << 32))
    else:
        nbits = 64
        hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def merge_for(i: int):
        # closure factory, NOT `lambda acc, h, i=i`: PySpark derives the
        # higher-order function's arity from the Python signature, so a
        # defaulted third parameter breaks aggregate (and in transform it
        # silently binds the array-index column instead of the int)
        return lambda acc, h: acc + F.when(_bit_set(h, i), 1).otherwise(-1)

    sig = F.lit(0).cast("long")
    for i in range(nbits):
        vote = F.aggregate(hashes, F.lit(0), merge_for(i))
        sig = sig + F.when(vote > 0, F.lit(_bit_value(i)).cast("long")).otherwise(F.lit(0).cast("long"))
    return docs.select(F.col(id_col).alias("id"), sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    bucket_cap: int | None = None,
    chain_width: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Candidate pairs (a, b, hamming) with hamming <= max_hamming.

    ``blocks`` must be > max_hamming for exact recall (pigeonhole).
    The default ``bucket_cap=None`` keeps that guarantee. Passing a cap
    switches buckets larger than it to bounded chain pairing (see
    dedup/minhash.py) — the hub-bucket quadratic-blowup guard for
    boilerplate-heavy corpora. A cap trades recall: chain pairing emits
    only ``chain_width`` successor pairs per member and the hamming
    post-filter can drop chain links, so transitive clusters may split.
    Only set a cap in pipelines where a connected-components pass
    follows AND approximate recall is acceptable."""
    from essentials_spark.dedup.minhash import capped_bucket_pairs

    sigs = simhash(docs, text_col, id_col, portable=portable)
    width = (32 if portable else 64) // blocks
    mask = (1 << width) - 1
    chunked = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.expr(f"shiftright(simhash, {b * width}) & {mask}").alias("chunk"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.blk").alias("blk"), F.col("c.chunk").alias("chunk"))

    cand = capped_bucket_pairs(
        chunked, ["blk", "chunk"], ["simhash"], bucket_cap=bucket_cap, chain_width=chain_width
    )
    hamming = F.bit_count(F.col("a_simhash").bitwiseXOR(F.col("b_simhash")))
    return cand.select("a", "b", hamming.alias("hamming")).filter(F.col("hamming") <= max_hamming)
