"""essentials_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities modeled on Gunrock "essentials" (reference at
/root/reference, Apache-2.0): bulk-synchronous graph primitives —
advance / filter / uniquify / parallel_for / neighbor_reduce / batch
(reference: include/gunrock/framework/operators/) — composed into
PageRank, connected components, label propagation, triangle counting
and the wider algorithm envelope (BFS, SSSP, HITS, k-core, coloring,
PPR, SpMV, ...), re-expressed idiomatically on Spark DataFrames:

- graph = edge DataFrame (src, dst, weight), COO-equivalent
  (reference include/gunrock/graph/coo.hxx);
- per-partition packed CSR blocks via Arrow/pandas UDFs for the
  vectorized kernel path (reference include/gunrock/graph/csr.hxx);
- each superstep = one Spark job (joins + groupBy aggregates); the
  enactor loop (reference framework/enactor.hxx:243-254) becomes a
  driver-side Python loop with DataFrame state, checkpointing and
  metrics.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from essentials_spark.session import get_spark  # noqa: F401


def prepare_graph(*args, **kwargs):
    """Convenience re-export of graph.prepared.prepare_graph (lazy —
    avoids importing pyspark.sql machinery at package import)."""
    from essentials_spark.graph.prepared import prepare_graph as _pg

    return _pg(*args, **kwargs)
