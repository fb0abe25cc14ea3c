"""Approximate/exact nearest-neighbor search over embedding columns."""

from essentials_spark.ann.cosine import brute_force_topk, lsh_topk  # noqa: F401
