from essentials_spark.sampling.walks import (
    neighbor_sample,
    random_walks,
    ranked_adjacency,
    sampled_adjacency,
)

__all__ = ["ranked_adjacency", "random_walks", "sampled_adjacency", "neighbor_sample"]
