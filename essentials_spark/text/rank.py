"""BM25 relevance scoring over the documents corpus.

The retrieval-side sibling of text/analysis.py's quality features: a
training-data pipeline uses BM25 (Robertson & Spärck Jones / Okapi,
public literature) for query-targeted corpus slicing, curriculum
selection and dedup-cluster canonical-doc election. Everything is
built-in JVM expressions over one tokenized scan:

    idf(t)  = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)     (always > 0)
    score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Plan: one explode of the lowercased whitespace tokens, an EARLY filter
to the query terms (the per-term stream is |terms|-bounded, never
vocabulary-scale), two shuffles (per-doc tf, per-term df), doc-length
aggregate reused from the same exploded scan, and the 1-row (N, avgdl)
corpus stats broadcast. The oracle SQL mirrors every arithmetic
expression verbatim so both engines round the same doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns (doc_id, bm25) for documents matching >= 1 query term.

    ``k1``/``b`` should be short exact decimals (1.2, 0.75) so the
    literals parse to identical doubles in Spark and the SQL oracle."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qt = toks.filter(F.col("tok").isin(list(query_terms)))
    tf = qt.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("part"),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("part").alias("bm25"))
