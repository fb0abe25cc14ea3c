"""Matrix Market / smtx / points readers (reference io/ parity)."""

from essentials_spark.graph.derive import Graph
from essentials_spark.io.matrix_market import read_mtx, read_points, read_smtx


def test_mtx_symmetric_pattern_golden_tc(spark, tmp_path):
    # the reference TC golden graph as a symmetric pattern .mtx
    # (storage: one direction per undirected edge, 1-based)
    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "% golden: edges {0-1,0-2,0-3,1-2,2-3}\n"
        "4 4 5\n2 1\n3 1\n4 1\n3 2\n4 3\n"
    )
    edges = read_mtx(spark, str(p))
    assert edges.count() == 10  # both directions materialized
    from pyspark.sql import functions as F

    from essentials_spark.algos import triangle_count

    g = Graph(vertices=spark.range(4).select(F.col("id").alias("vid")), edges=edges)
    per_vertex, total = triangle_count(g, pre_symmetrized=False)
    got = [r["tc"] for r in per_vertex.orderBy("vid").collect()]
    assert got == [2, 1, 2, 1] and total == 6


def test_mtx_general_real(spark, tmp_path):
    p = tmp_path / "w.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 3 3\n1 2 0.5\n2 3 1.5\n3 1 2.0\n"
    )
    rows = {(r["src"], r["dst"]): r["weight"] for r in read_mtx(spark, str(p)).collect()}
    assert rows == {(0, 1): 0.5, (1, 2): 1.5, (2, 0): 2.0}


def test_mtx_file_uri(spark, tmp_path):
    # storage portability: the banner read goes through the Hadoop FS
    # layer (no driver-side open()), so URI paths must work
    p = tmp_path / "u.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n2 2 2\n1 2 3.0\n2 1 4.0\n"
    )
    rows = {
        (r["src"], r["dst"]): r["weight"]
        for r in read_mtx(spark, f"file://{p}").collect()
    }
    assert rows == {(0, 1): 3.0, (1, 0): 4.0}


def test_smtx(spark, tmp_path):
    p = tmp_path / "g.smtx"
    p.write_text("3 3 4\n0 2 3 4\n1 2 0 1\n")
    rows = {(r["src"], r["dst"]) for r in read_smtx(spark, str(p)).collect()}
    assert rows == {(0, 1), (0, 2), (1, 0), (2, 1)}


def test_points(spark, tmp_path):
    p = tmp_path / "pts.txt"
    p.write_text("# vid lat lon\n0 51.5 -0.1\n1 48.9 2.35\n")
    rows = {r["vid"]: (r["lat"], r["lon"]) for r in read_points(spark, str(p)).collect()}
    assert rows == {0: (51.5, -0.1), 1: (48.9, 2.35)}
