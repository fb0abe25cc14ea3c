"""Graph layer: edge/vertex DataFrames, derivation, CSR blocks."""

from essentials_spark.graph.derive import Graph, derive_graph, canonicalize_edges  # noqa: F401
