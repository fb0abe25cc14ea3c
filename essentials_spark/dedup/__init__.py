"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup — each returns candidate
duplicate pairs or a keep/drop assignment over the documents table.
"""

from essentials_spark.dedup.minhash import minhash_lsh_pairs, minhash_dedup  # noqa: F401
from essentials_spark.dedup.simhash import simhash_pairs  # noqa: F401
from essentials_spark.dedup.jaccard import ngram_jaccard_verify  # noqa: F401
from essentials_spark.dedup.embedding import embedding_cosine_pairs  # noqa: F401
