"""Text analysis for large-scale training-data pipelines.

Beyond the reference's graph surface: language-ID, quality scoring,
token counting, fingerprinting — all JVM-side Spark SQL expressions
(no Python in the hot path)."""

from essentials_spark.text.analysis import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
