from essentials_spark.sampling.walks import (
    negative_samples,
    neighbor_sample,
    temporal_neighbor_sample,
    node2vec_walks,
    random_walks,
    ranked_adjacency,
    sampled_adjacency,
    walk_contexts,
)

__all__ = [
    "ranked_adjacency",
    "node2vec_walks",
    "random_walks",
    "sampled_adjacency",
    "negative_samples",
    "neighbor_sample",
    "temporal_neighbor_sample",
    "walk_contexts",
]
