"""Text analysis operators over a documents table.

All pure Spark SQL expressions — fully whole-stage-codegen'd, scale
linearly with a parquet scan, no shuffle except noted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ein"],
}


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token counts + distinct-token counts (narrow op)."""
    toks = F.split(F.trim(F.col(text_col)), " ")
    return docs.withColumns(
        {
            "n_tokens": F.size(toks).cast("long"),
            "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("long"),
            "n_chars_actual": F.length(F.col(text_col)).cast("long"),
        }
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, punctuation/digit density,
    repetition (distinct-token ratio). Mirrors common pretraining-data
    quality filters; emits raw counts so exact-integer comparison with
    SQL oracles is possible, plus a [0,1] score."""
    t = F.col(text_col)
    toks = F.split(F.trim(t), " ")
    n_tokens = F.size(toks)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[.!?,;:]", ""))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    score = (
        F.when(n_tokens < 5, 0.0)
        .otherwise(
            F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.4
            + (1.0 - F.least(F.lit(1.0), n_punct / F.greatest(n_tokens, F.lit(1)))) * 0.2
            + distinct_ratio * 0.4
        )
    )
    return docs.withColumns(
        {
            "n_tokens": n_tokens.cast("long"),
            "n_punct": n_punct.cast("long"),
            "n_digit": n_digit.cast("long"),
            "distinct_ratio": F.round(distinct_ratio, 6),
            "quality": F.round(score, 6),
        }
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic: argmax over per-language
    marker-word hit counts (ties -> 'und'). One narrow pass."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return docs.withColumn(
        "lang_pred", F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", normalize: bool = True) -> DataFrame:
    """Deterministic content fingerprint (md5 of normalized text) — the
    key for exact-dedup groupBy."""
    t = F.col(text_col)
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return docs.withColumn("fingerprint", F.md5(t))


def repetition_stats(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition profile — the boilerplate/spam
    signal of pretraining quality filters (duplicated-n-gram fraction,
    public data-curation literature).

    Returns per doc: total word n-grams, distinct word n-grams, their
    difference (``dup_ngrams``), and the count of the most frequent
    single token (``top_tok_cnt``). All integers — value-exact vs the
    SQL oracle; the consumer derives the ratio. One narrow pass, no
    shuffle, no explode (array expressions inside codegen).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    # most-frequent-token count without exploding: sort the token
    # array, then a single fold tracks the longest equal run —
    # O(L log L) per doc inside codegen, vs the explode+groupBy
    # shuffle a naive plan would pay
    top_cnt = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return docs.select(
        F.col(id_col),
        F.size(grams).cast("long").alias("total_ngrams"),
        F.size(F.array_distinct(grams)).cast("long").alias("distinct_ngrams"),
        (F.size(grams) - F.size(F.array_distinct(grams))).cast("long").alias("dup_ngrams"),
        top_cnt.cast("long").alias("top_tok_cnt"),
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the min-id document per fingerprint.

    One shuffle (groupBy fingerprint); survivors marked with the size
    of their duplicate group."""
    fp = doc_fingerprint(docs, text_col)
    keep = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("dup_count")
    )
    return fp.join(keep, [id_col, "fingerprint"]).drop("fingerprint")
