"""Graph algorithms as superstep compositions of the ops/ primitives.

Required surface (BASELINE.json): pagerank, connected_components,
label_propagation, triangle_count. The wider envelope mirrors the
reference's algorithm directory (include/gunrock/algorithms/).
"""

from essentials_spark.algos.pagerank import pagerank  # noqa: F401
from essentials_spark.algos.cc import connected_components  # noqa: F401
from essentials_spark.algos.lp import label_propagation  # noqa: F401
from essentials_spark.algos.tc import triangle_count  # noqa: F401
