from essentials_spark.sampling.walks import (
    neighbor_sample,
    random_walks,
    ranked_adjacency,
    sampled_adjacency,
    walk_contexts,
)

__all__ = [
    "ranked_adjacency",
    "random_walks",
    "sampled_adjacency",
    "neighbor_sample",
    "walk_contexts",
]
