"""The reference's five data-centric dataflow primitives, Spark-first.

Reference: include/gunrock/framework/operators/operators.hxx —
advance, filter, uniquify, parallel_for, neighborreduce (+ batch).
Each is a thin combinator over DataFrames; Catalyst supplies the
load-balancing / compaction / fusion machinery the reference
hand-writes in CUDA.
"""

from essentials_spark.ops.advance import advance  # noqa: F401
from essentials_spark.ops.filter import filter_frontier, bypass_filter, compact  # noqa: F401
from essentials_spark.ops.uniquify import uniquify  # noqa: F401
from essentials_spark.ops.parallel_for import parallel_for  # noqa: F401
from essentials_spark.ops.neighbor_reduce import neighbor_reduce  # noqa: F401
from essentials_spark.ops.batch import batch_execute  # noqa: F401
