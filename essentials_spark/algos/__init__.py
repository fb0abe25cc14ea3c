"""Graph algorithms as superstep compositions of the ops/ primitives.

Required surface (BASELINE.json): pagerank, connected_components,
label_propagation, triangle_count. The wider envelope mirrors the
reference's algorithm directory (include/gunrock/algorithms/).
"""

from essentials_spark.algos.pagerank import (  # noqa: F401
    incremental_pagerank_update,
    incremental_weighted_edges,
    outweights,
    pagerank,
)
from essentials_spark.algos.cc import (  # noqa: F401
    connected_components,
    connected_components_contract,
    incremental_cc_update,
)
from essentials_spark.algos.ktruss import edge_support, ktruss, truss_decomposition  # noqa: F401
from essentials_spark.algos.lp import label_propagation  # noqa: F401
from essentials_spark.algos.louvain import louvain  # noqa: F401
from essentials_spark.algos.tc import incremental_tc_update, triangle_count  # noqa: F401
from essentials_spark.algos.traversal import (  # noqa: F401
    bfs,
    closeness_centrality,
    closeness_centrality_contracted,
    harmonic_centrality,
    harmonic_centrality_contracted,
    sssp,
    temporal_reachability,
)
from essentials_spark.algos.eigen import eigenvector_centrality, katz_centrality  # noqa: F401
from essentials_spark.algos.hits import hits  # noqa: F401
from essentials_spark.algos.salsa import salsa  # noqa: F401
from essentials_spark.algos.kcore import kcore  # noqa: F401
from essentials_spark.algos.color import color  # noqa: F401
from essentials_spark.algos.ppr import ppr  # noqa: F401
from essentials_spark.algos.spmv import spmv, spgemm  # noqa: F401
from essentials_spark.algos.bc import (  # noqa: F401
    betweenness_centrality,
    betweenness_centrality_contracted,
)
from essentials_spark.algos.mst import incremental_msf_update, mst  # noqa: F401
from essentials_spark.algos.geo import geolocate  # noqa: F401
