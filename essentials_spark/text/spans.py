"""Exact duplicate-span detection — substring-level dedup statistics.

Document-level dedup (exact_dedup, minhash) misses the dominant
duplication mode in web corpora: long VERBATIM SPANS repeated across
otherwise-distinct documents (boilerplate, licenses, quoted threads).
The public exact-substring dedup recipe (suffix-array dedup in "
Deduplicating Training Data Makes Language Models Better", Lee et
al. 2022) removes repeated spans above a token threshold; this module
computes the Spark-shaped equivalent signal: for every document, how
much of it is covered by k-token spans that occur elsewhere in the
corpus (either in another doc or repeated within the same doc).

Plan shape (per 100 TB discipline):

1. one projection explodes positioned k-grams (k x token-stream
   bound, no pairs);
2. one groupBy gram counts corpus occurrences — map-side partials
   make the hot boilerplate grams cheap;
3. the duplicated-gram set joins back to positions on the gram hash
   (shuffle hash join; the set is usually small enough to broadcast —
   mass-gated by ``broadcast_dups``);
4. one groupBy doc folds flags into integers.

Nothing materializes doc pairs, so the worst case (every doc shares
boilerplate with every other) stays linear in corpus size — the
failure mode that kills pairwise dedup at scale.

Tokenization matches text/contamination.py (lowercased trimmed
whitespace split); docs shorter than k tokens emit no spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positioned_ngrams(text_col, k: int):
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    grams = F.transform(
        idx, lambda i: F.struct(i.alias("pos"), F.concat_ws(" ", F.slice(toks, i + 1, k)).alias("gram"))
    )
    return F.when(F.size(toks) >= k, grams).otherwise(
        F.array().cast("array<struct<pos:int,gram:string>>")
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_dups: bool = False,
) -> DataFrame:
    """(id_col, n_spans, n_dup_spans, n_dup_grams): per document, the
    number of k-token span positions, how many of those positions
    hold a span occurring >= 2 times corpus-wide, and how many
    DISTINCT duplicated spans the doc contains. Docs with no spans
    (< k tokens) report zeros.

    ``n_dup_spans / n_spans`` is the duplication coverage a curation
    pipeline thresholds on; span positions are retained internally so
    a removal pass can cut exactly the duplicated regions.
    """
    pos = docs.select(
        F.col(id_col),
        F.explode_outer(_positioned_ngrams(F.col(text_col), k)).alias("pg"),
    ).select(id_col, F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))

    occ = (
        pos.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
        .select("gram")
    )
    if broadcast_dups:
        occ = F.broadcast(occ)
    flagged = pos.join(occ.withColumn("dup", F.lit(1)), "gram", "left")
    return flagged.groupBy(id_col).agg(
        F.count("pos").cast("long").alias("n_spans"),
        F.sum(F.when(F.col("dup") == 1, 1).otherwise(0)).cast("long").alias("n_dup_spans"),
        F.countDistinct(F.when(F.col("dup") == 1, F.col("gram"))).cast("long").alias("n_dup_grams"),
    )
