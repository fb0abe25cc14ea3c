"""End-to-end training-corpus curation pipeline.

The composite a 100 TB pretraining-data pipeline actually runs, staged
in the standard order (cheap narrow filters first, the expensive
near-dedup last so it only sees survivors):

  1. quality gate       (text/analysis.quality_score >= min_quality)
  2. language gate      (text/analysis.language_id in langs)
  3. exact dedup        (normalized-md5 fingerprint, keep min doc_id)
  4. near dedup         (dedup/minhash MinHash+LSH + CC clustering,
                         keep min doc_id per near-dup cluster)

Every stage is a narrow pass or a bounded-shuffle op (see the
component modules for their 100 TB shapes); stage order means the
quadratic-adjacent stage 4 runs on the smallest candidate set.

Output is an AUDIT table, one row per input document: the kept flag
plus the first failing stage as ``reason`` ('quality' | 'lang' |
'exact_dup' | 'near_dup' | NULL for kept docs) — at corpus scale the
drop-reason histogram is the pipeline's primary health metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from essentials_spark.text.analysis import exact_dedup, language_id, quality_score


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.6,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    min_sim: float = 0.5,
    portable: bool = False,
    cleanup: list | None = None,
) -> DataFrame:
    """Returns (doc_id, quality, lang_pred, kept: bool, reason) for
    every input document. ``portable`` selects the SQL-reproducible
    minhash hash family (functions/portable_hash) for stage 4.

    The returned (lazy) audit DataFrame reads the persisted
    ``gated``/``exact_kept`` stages directly, so they cannot be
    unpersisted here; pass ``cleanup`` (a list) to receive them and
    unpersist after your terminal action. The minhash-internal caches
    are released by minhash_dedup itself once CC materializes."""
    from essentials_spark.dedup.minhash import minhash_dedup

    base = language_id(quality_score(docs, text_col), text_col).select(
        F.col(id_col), F.col(text_col), "quality", "lang_pred"
    )
    # gated feeds the survivor chain AND the final audit join;
    # exact_kept feeds the semi-join AND the final audit join — persist
    # both so one downstream action computes each stage once (Spark
    # reuses exchanges, not subtrees; see dedup/minhash.py note)
    gated = base.withColumn(
        "reason",
        F.when(F.col("quality") < min_quality, F.lit("quality")).when(
            ~F.col("lang_pred").isin(*langs), F.lit("lang")
        ),
    ).persist()
    if cleanup is not None:
        cleanup.append(gated)

    s1 = gated.filter(F.col("reason").isNull()).select(id_col, text_col)
    exact_kept = exact_dedup(s1, text_col, id_col).select(id_col).persist()
    if cleanup is not None:
        cleanup.append(exact_kept)

    s2 = s1.join(exact_kept, id_col, "left_semi")
    near = minhash_dedup(
        s2, text_col, id_col, shingle_k=shingle_k, min_sim=min_sim, portable=portable
    )
    near_kept = near.filter(F.col("keep")).select(F.col("id").alias(id_col))

    return (
        gated.join(exact_kept.withColumn("_e", F.lit(1)), id_col, "left")
        .join(near_kept.withColumn("_n", F.lit(1)), id_col, "left")
        .select(
            id_col,
            "quality",
            "lang_pred",
            F.coalesce(
                F.col("reason"),
                F.when(F.col("_e").isNull(), F.lit("exact_dup")),
                F.when(F.col("_n").isNull(), F.lit("near_dup")),
            ).alias("reason"),
        )
        .withColumn("kept", F.col("reason").isNull())
    )
