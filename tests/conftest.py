import pytest
from pyspark.sql import functions as F

from essentials_spark.graph.derive import Graph
from essentials_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(master="local[4]", app_name="essentials-tests", shuffle_partitions=4)
    yield sp
    sp.stop()


def graph_from_edges(spark, pairs, n_vertices=None, weights=None, directed=False):
    """Build a Graph from (u, v) pairs; undirected input is symmetrized."""
    rows = []
    for i, (u, v) in enumerate(pairs):
        w = float(weights[i]) if weights else 1.0
        rows.append((u, v, w))
        if not directed and u != v:
            rows.append((v, u, w))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double").dropDuplicates(["src", "dst"])
    n = n_vertices or (max(max(u, v) for u, v in pairs) + 1 if pairs else 0)
    vertices = spark.range(n).select(F.col("id").alias("vid"))
    return Graph(vertices=vertices, edges=edges)


@pytest.fixture(scope="session")
def golden_tc_graph(spark):
    """Reference TC golden fixture (unittests/algorithms/tc.cuh:19-55):
    CSR Ap=[0,3,5,8,10], Aj=[1,2,3|0,2|0,1,3|0,2] == undirected
    {0-1, 0-2, 0-3, 1-2, 2-3}; triangles 012, 023."""
    return graph_from_edges(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3)])
