"""Degree-2 chain contraction: construction invariants + A/B parity
of chain-contracted BFS/SSSP against the plain frontier loops over
adversarial shapes (interior sources, pendant chains, loop chains,
pure cycles, parallel equal-length chains)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import graph_from_edges

from essentials_spark.algos import bfs, sssp
from essentials_spark.graph.chain_contract import chain_contraction, expand_distances


def _bfs_pair(spark, pairs, source, n_vertices=None, weights=None):
    g = graph_from_edges(spark, pairs, n_vertices=n_vertices, weights=weights)
    plain = {r["vid"]: r["dist"] for r in bfs(g, source=source).collect()}
    chain = {r["vid"]: r["dist"] for r in bfs(g, source=source, chain_contract=True).collect()}
    return plain, chain


def _sssp_pair(spark, pairs, source, weights, n_vertices=None):
    g = graph_from_edges(spark, pairs, n_vertices=n_vertices, weights=weights)
    plain = {r["vid"]: r["dist"] for r in sssp(g, source=source).collect()}
    chain = {r["vid"]: r["dist"] for r in sssp(g, source=source, chain_contract=True).collect()}
    return plain, chain


# two hubs (0, 9) joined by two parallel chains of equal length plus a
# pendant chain and an isolated vertex — the canonical adversarial mix
PARALLEL = [
    (0, 1), (1, 2), (2, 9),      # chain A: 0-1-2-9
    (0, 3), (3, 4), (4, 9),      # chain B (parallel, same length)
    (9, 5), (5, 6), (6, 7),      # pendant chain off 9
    (0, 10),                     # pendant edge keeping hub 0 at deg 3
]


def test_contraction_structure_parallel_chains(spark):
    g = graph_from_edges(spark, PARALLEL, n_vertices=11)
    c = chain_contraction(g.vertices, g.edges)
    inter = {r["vid"] for r in c.interior.collect()}
    # 1..6 are degree-2 interiors; 7 is a chain END (degree 1) so it
    # stays terminal; hubs 0, 9 and isolated 8, 10 stay terminal
    assert inter == {1, 2, 3, 4, 5, 6}
    se = c.super_edges.collect()
    chain_rows = [r for r in se if r["chain_id"] is not None]
    # parallel chains 0-9 MUST stay distinct rows (2 chains x 2
    # orientations) + pendant 9-7 x 2
    assert len(chain_rows) == 6
    assert all(r["hops"] == 3 for r in chain_rows)
    pq = sorted((r["src"], r["dst"]) for r in chain_rows)
    assert pq == [(0, 9), (0, 9), (7, 9), (9, 0), (9, 0), (9, 7)]
    # passthrough edge 0-10 survives with hops 1
    assert sorted((r["src"], r["dst"]) for r in se if r["chain_id"] is None) == [(0, 10), (10, 0)]


def test_chain_bfs_matches_plain_terminal_source(spark):
    plain, chain = _bfs_pair(spark, PARALLEL, source=0, n_vertices=11)
    assert chain == plain


def test_chain_bfs_matches_plain_interior_source(spark):
    for src in (1, 4, 5):
        plain, chain = _bfs_pair(spark, PARALLEL, source=src, n_vertices=11)
        assert chain == plain, f"source {src}"


def test_chain_bfs_loop_chain(spark):
    # loop chain: hub 0 with a degree-2 cycle hanging off it
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (4, 5)]
    for src in (0, 2, 5):
        plain, chain = _bfs_pair(spark, pairs, source=src, n_vertices=6)
        assert chain == plain, f"source {src}"


def test_chain_bfs_pure_cycle_falls_back(spark):
    # a pure degree-2 cycle never finalizes — members must fall back
    # to terminals and traversal stays exact
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    g = graph_from_edges(spark, pairs, n_vertices=5)
    c = chain_contraction(g.vertices, g.edges)
    assert c.interior.count() == 0
    plain, chain = _bfs_pair(spark, pairs, source=2, n_vertices=5)
    assert chain == plain


def test_chain_bfs_long_path_mixed_lengths(spark):
    # chains of very different lengths exercise the doubling rounds
    # where short chains finalize long before the longest one
    pairs = (
        [(i, i + 1) for i in range(20)]            # path 0..20
        + [(20, 21), (21, 0)]                      # close into a lollipop via 2-chain
        + [(0, 30), (20, 31)]                      # pendants
    )
    for src in (0, 10, 30):
        plain, chain = _bfs_pair(spark, pairs, source=src, n_vertices=32)
        assert chain == plain, f"source {src}"


def test_chain_sssp_matches_plain_weighted(spark):
    weights = [3.0, 1.0, 2.0, 1.0, 1.0, 5.0, 2.0, 2.0, 1.0, 4.0]
    for src in (0, 3, 9):
        plain, chain = _sssp_pair(spark, PARALLEL, source=src, weights=weights, n_vertices=11)
        assert set(chain) == set(plain), f"source {src}"
        for v in plain:
            assert chain[v] == pytest.approx(plain[v], abs=1e-12), f"source {src} vid {v}"


def test_chain_sssp_asymmetric_direction_weights(spark):
    """A symmetrized edge set may carry DIRECTION-DEPENDENT weights
    (the gate's md5(src>dst) weights do) — the contraction must track
    outbound and inbound sums separately."""
    from essentials_spark.graph.derive import Graph

    rows = []
    for i, (u, v) in enumerate(PARALLEL):
        rows.append((u, v, float(1 + (3 * i) % 7)))
        rows.append((v, u, float(1 + (5 * i + 2) % 7)))  # different reverse weight
    edges = spark.createDataFrame(rows, "src long, dst long, weight double").dropDuplicates(["src", "dst"])
    vertices = spark.range(11).select(F.col("id").alias("vid"))
    g = Graph(vertices=vertices, edges=edges)
    for src in (0, 3, 9, 6):
        plain = {r["vid"]: r["dist"] for r in sssp(g, source=src).collect()}
        chain = {r["vid"]: r["dist"] for r in sssp(g, source=src, chain_contract=True).collect()}
        assert chain == plain, f"source {src}"


def test_expand_distances_null_safe(spark):
    # interior whose end_b side is unreachable still rehydrates via a
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)], n_vertices=5)
    c = chain_contraction(g.vertices, g.edges)
    dist = spark.createDataFrame([(0, 0.0)], "vid long, dist double")
    got = {r["vid"]: r["dist"] for r in expand_distances(c, dist).collect()}
    # terminals reached: only 0; interiors 1, 2 rehydrate from side 0
    assert got[0] == 0.0 and got[1] == 1.0 and got[2] == 2.0


def _geo_ab(spark, pairs, anchors, n_vertices, method="mean"):
    from essentials_spark.algos import geolocate

    g = graph_from_edges(spark, pairs, n_vertices=n_vertices)
    known = spark.createDataFrame(anchors, "vid long, lat double, lon double")
    plain = {
        r["vid"]: (round(r["lat"], 9), round(r["lon"], 9))
        for r in geolocate(g, known, max_iter=60, method=method).collect()
    }
    chain = {
        r["vid"]: (round(r["lat"], 9), round(r["lon"], 9))
        for r in geolocate(g, known, max_iter=60, method=method, chain_contract=True).collect()
    }
    return plain, chain


def test_geolocate_chain_contract_matches_plain_mean(spark):
    """Contracted geolocation == plain synchronous wave: values COPY
    along chains, meet-in-the-middle averages at wave collisions, and
    terminal aggregation over delivering chains. Fixture: two anchors
    with different coords so collisions are visible, plus a pendant."""
    anchors = [(0, 10.0, 20.0), (9, 50.0, 80.0)]
    plain, chain = _geo_ab(spark, PARALLEL, anchors, n_vertices=11)
    assert chain == plain


def test_geolocate_chain_contract_odd_even_meeting(spark):
    """Wave collisions at both parities: an even-length chain meets at
    a vertex (two pushers -> average), an odd-length chain meets on an
    edge (each side keeps its own value)."""
    pairs = (
        [(0, 1), (1, 2), (2, 3), (3, 4)]          # even interior count
        + [(0, 5), (5, 6), (6, 7), (7, 8), (8, 4)]  # odd count, parallel route
    )
    anchors = [(0, 10.0, 20.0), (4, 50.0, 80.0)]
    plain, chain = _geo_ab(spark, pairs, anchors, n_vertices=9)
    assert chain == plain


def test_geolocate_chain_contract_reference_method(spark):
    """method='reference' through the contracted path: chain interiors
    copy (1 pusher) / spherical-midpoint (tie), terminals run the full
    midpoint/Weiszfeld rules over delivered values."""
    # hub 9 receives 3 deliveries (two parallel chains + pendant path
    # back) -> exercises the Weiszfeld n>2 branch at a terminal
    pairs = PARALLEL + [(10, 7)]
    anchors = [(0, 10.0, 20.0), (10, 30.0, 40.0)]
    plain, chain = _geo_ab(spark, pairs, anchors, n_vertices=11, method="reference")
    assert chain == plain


def test_geolocate_chain_contract_interior_anchor(spark):
    """An anchor sitting on a degree-2 chain must stay terminal (keep=
    anchors) and seed the wave from inside the chain."""
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (0, 6)]
    anchors = [(2, 10.0, 20.0)]
    plain, chain = _geo_ab(spark, pairs, anchors, n_vertices=7)
    assert chain == plain


def test_bfs_sssp_csr_kernel_matches_dataframe(spark):
    """The (min,+) tropical CSR kernel (csr_blocks.csr_tropical_push)
    must be A/B bit-exact with the dataframe relax on both the plain
    and the chain-contracted paths."""
    weights = [3.0, 1.0, 2.0, 1.0, 1.0, 5.0, 2.0, 2.0, 1.0, 4.0]
    g = graph_from_edges(spark, PARALLEL, n_vertices=11, weights=weights)
    for src in (0, 4):
        b_df = {r["vid"]: r["dist"] for r in bfs(g, source=src).collect()}
        b_csr = {r["vid"]: r["dist"] for r in bfs(g, source=src, kernel="csr", n_buckets=4).collect()}
        assert b_csr == b_df, f"bfs src {src}"
        b_chain_csr = {
            r["vid"]: r["dist"]
            for r in bfs(g, source=src, chain_contract=True, kernel="csr", n_buckets=4).collect()
        }
        assert b_chain_csr == b_df, f"chain bfs src {src}"
        s_df = {r["vid"]: r["dist"] for r in sssp(g, source=src).collect()}
        s_csr = {r["vid"]: r["dist"] for r in sssp(g, source=src, kernel="csr", n_buckets=4).collect()}
        assert s_csr == s_df, f"sssp src {src}"
        s_chain_csr = {
            r["vid"]: r["dist"]
            for r in sssp(g, source=src, chain_contract=True, kernel="csr", n_buckets=4).collect()
        }
        assert s_chain_csr == s_df, f"chain sssp src {src}"


def _bc_ab(spark, pairs, sources, n_vertices):
    from essentials_spark.algos import betweenness_centrality, betweenness_centrality_contracted

    g = graph_from_edges(spark, pairs, n_vertices=n_vertices)
    plain = {
        r["vid"]: round(r["bc"], 9) for r in betweenness_centrality(g, sources=sources).collect()
    }
    chain = {
        r["vid"]: round(r["bc"], 9)
        for r in betweenness_centrality_contracted(g, sources=sources).collect()
    }
    return plain, chain


def test_bc_contracted_path(spark):
    # classic path fixture — every vertex a source (matches
    # test_bc_brandes): contraction is total (all interiors between
    # the kept sources), pure in-chain target algebra
    plain, chain = _bc_ab(spark, [(0, 1), (1, 2), (2, 3)], [0, 1, 2, 3], 4)
    assert chain == plain == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


def test_bc_contracted_parallel_and_pendant(spark):
    # parallel equal-length chains split sigma 50/50 through both; the
    # pendant chain carries pure through-flow; tie positions occur at
    # the parallel chains' midpoints
    plain, chain = _bc_ab(spark, PARALLEL, [0, 9, 7], 11)
    assert chain == plain


def test_bc_contracted_loop_chain(spark):
    # loop chain: no through-flow, X injections from both directions
    # land on the same terminal, interior tie at the loop midpoint
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (4, 5)]
    plain, chain = _bc_ab(spark, pairs, [0, 5], 6)
    assert chain == plain


def test_bc_contracted_long_chain_sources(spark):
    # sources on long chains (kept terminal) splitting them; mixed
    # chain lengths; an unreachable side (isolated tail)
    pairs = [(i, i + 1) for i in range(12)] + [(3, 20), (20, 21), (21, 8), (30, 31)]
    plain, chain = _bc_ab(spark, pairs, [0, 6], 32)
    assert chain == plain


def test_bc_contracted_fuzz_random(spark):
    import numpy as np

    rng = np.random.RandomState(1234)
    for trial in range(3):
        n = int(rng.randint(12, 26))
        m = int(rng.randint(n - 2, 2 * n))
        pairs = list({(int(a), int(b)) for a, b in rng.randint(0, n, size=(m, 2)) if a != b})
        srcs = sorted({int(s) for s in rng.randint(0, n, size=3)})
        plain, chain = _bc_ab(spark, pairs, srcs, n)
        assert set(chain) == set(plain), f"trial {trial}"
        for v in plain:
            assert abs(chain[v] - plain[v]) < 1e-6, f"trial {trial} vid {v}: {chain[v]} vs {plain[v]} srcs {srcs} pairs {sorted(pairs)}"


def test_harmonic_contracted_matches_plain(spark):
    from essentials_spark.algos import harmonic_centrality, harmonic_centrality_contracted

    g = graph_from_edges(spark, PARALLEL, n_vertices=11)
    for srcs in ([0, 9], [1, 5, 10], [4]):
        plain = {
            r["vid"]: round(r["harm"], 9)
            for r in harmonic_centrality(g, sources=srcs).collect()
        }
        chain = {
            r["vid"]: round(r["harm"], 9)
            for r in harmonic_centrality_contracted(g, sources=srcs).collect()
        }
        assert chain == plain, f"sources {srcs}"


def test_harmonic_contracted_fuzz(spark):
    import numpy as np

    from essentials_spark.algos import harmonic_centrality, harmonic_centrality_contracted

    rng = np.random.RandomState(555)
    for trial in range(2):
        n = int(rng.randint(14, 30))
        m = int(rng.randint(n - 2, 2 * n))
        pairs = list({(int(a), int(b)) for a, b in rng.randint(0, n, size=(m, 2)) if a != b})
        g = graph_from_edges(spark, pairs, n_vertices=n)
        srcs = sorted({int(s) for s in rng.randint(0, n, size=3)})
        plain = {
            r["vid"]: round(r["harm"], 9)
            for r in harmonic_centrality(g, sources=srcs).collect()
        }
        chain = {
            r["vid"]: round(r["harm"], 9)
            for r in harmonic_centrality_contracted(g, sources=srcs).collect()
        }
        assert chain == plain, f"trial {trial} srcs {srcs}"


def test_closeness_contracted_matches_plain(spark):
    from essentials_spark.algos import closeness_centrality, closeness_centrality_contracted

    g = graph_from_edges(spark, PARALLEL, n_vertices=11)
    for srcs in ([0, 9], [1, 5, 10]):
        plain = {
            (r["vid"], r["n_src"], r["sum_dist"])
            for r in closeness_centrality(g, sources=srcs).collect()
        }
        chain = {
            (r["vid"], r["n_src"], r["sum_dist"])
            for r in closeness_centrality_contracted(g, sources=srcs).collect()
        }
        assert chain == plain, f"sources {srcs}"
