"""Correctness of the wider algorithm envelope (SURVEY §2.12) vs
small deterministic oracles."""

import heapq
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from essentials_spark.algos import (
    betweenness_centrality,
    bfs,
    color,
    geolocate,
    hits,
    kcore,
    mst,
    ppr,
    spgemm,
    spmv,
    sssp,
)
from tests.conftest import graph_from_edges

#      1
#    / | \
#   0  |  3 - 4      5 (isolated), 6-7 weighted path
#    \ | /
#      2
PAIRS = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (6, 7)]


def test_bfs_hops(spark):
    g = graph_from_edges(spark, PAIRS, n_vertices=8)
    got = {r["vid"]: r["dist"] for r in bfs(g, source=0).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_bfs_directed(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)], directed=True, n_vertices=4)
    got = {r["vid"]: r["dist"] for r in bfs(g, source=1).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def _dijkstra(n, edges, source):
    adj = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        dv, v = heapq.heappop(pq)
        if dv > dist.get(v, float("inf")):
            continue
        for u, w in adj[v]:
            nd = dv + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


def test_sssp_weighted(spark):
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    weights = [1.0, 4.0, 5.0, 1.0, 2.0]
    g = graph_from_edges(spark, pairs, weights=weights, directed=True, n_vertices=5)
    got = {r["vid"]: r["dist"] for r in sssp(g, source=0).collect()}
    edges = [(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()]
    exp = _dijkstra(5, edges, 0)
    assert got.keys() == exp.keys()
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12


def test_hits_power_iteration(spark):
    g = graph_from_edges(spark, [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)], directed=True, n_vertices=4)
    res = hits(g, max_iter=30).orderBy("vid").collect()
    A = np.zeros((4, 4))
    for r in g.edges.collect():
        A[r["src"], r["dst"]] = 1.0
    auth, hub = np.ones(4), np.ones(4)
    for _ in range(30):
        auth_raw = A.T @ hub
        hub_raw = A @ auth_raw
        auth = auth_raw / np.linalg.norm(auth_raw)
        hub = hub_raw / np.linalg.norm(hub_raw)
    assert np.allclose([r["auth"] for r in res], auth, atol=1e-9)
    assert np.allclose([r["hub"] for r in res], hub, atol=1e-9)


def test_kcore(spark):
    # 4-clique (core 3) with a tail (core 1) and isolated vertex
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pairs = clique + [(3, 4), (4, 5)]
    g = graph_from_edges(spark, pairs, n_vertices=7)
    got = {r["vid"]: r["core"] for r in kcore(g).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1, 6: 0}


def test_kcore_hindex_vs_peel_planted_clique(spark):
    # planted 12-clique (core 11) + random sparse background + chains:
    # the peeling path needs O(max_core) driver waves here while the
    # h-index fixpoint converges in a handful of bulk rounds — both
    # must agree exactly (structurally independent algorithms)
    rng = np.random.RandomState(7)
    k = 12
    clique = [(a, b) for a in range(k) for b in range(a + 1, k)]
    bg = list({(int(a), int(b)) for a, b in rng.randint(k, 60, size=(80, 2)) if a != b})
    chain = [(i, i + 1) for i in range(60, 70)]
    pairs = clique + bg + chain + [(5, 30), (40, 65)]
    g = graph_from_edges(spark, pairs, n_vertices=71)
    hi = {r["vid"]: r["core"] for r in kcore(g, method="hindex").collect()}
    pe = {r["vid"]: r["core"] for r in kcore(g, method="peel").collect()}
    assert hi == pe
    assert all(hi[v] == k - 1 for v in range(k))


def test_kcore_local_fixpoint_vs_hindex(spark):
    # bucketed local-fixpoint kernel (method='local') vs the window-
    # aggregate fixpoint and peeling — three structurally independent
    # paths, exact agreement required. Shapes chosen to stress the
    # boundary exchange: a clique STRADDLING bucket ranges, chains
    # crossing every range boundary, and a hub linking ranges.
    from essentials_spark.algos.kcore import kcore_hindex_local

    rng = np.random.RandomState(17)
    k = 9
    # clique on vids spread across the whole range => all-boundary
    clique_v = [int(v) for v in np.linspace(0, 79, k).astype(int)]
    clique = [(a, b) for i, a in enumerate(clique_v) for b in clique_v[i + 1:]]
    chain = [(i, i + 1) for i in range(80)]  # crosses every bucket edge
    hub = [(3, int(v)) for v in rng.randint(0, 80, size=12) if v != 3]
    pairs = list({*clique, *chain, *hub})
    g = graph_from_edges(spark, pairs, n_vertices=81)
    hi = {r["vid"]: r["core"] for r in kcore(g, method="hindex").collect()}
    for nb in (1, 4, 9):
        lo = {
            r["vid"]: r["core"]
            for r in kcore_hindex_local(g, n_buckets=nb).collect()
        }
        assert lo == hi, f"nb={nb}"
    pe = {r["vid"]: r["core"] for r in kcore(g, method="peel").collect()}
    assert pe == hi
    # wrapper clamp parity
    cl = {r["vid"]: r["core"] for r in kcore(g, method="local", max_k=2).collect()}
    assert cl == {v: min(c, 2) for v, c in hi.items()}


def test_color_valid_and_deterministic(spark):
    rng = np.random.RandomState(3)
    n = 25
    pairs = list({(int(a), int(b)) for a, b in rng.randint(0, n, size=(60, 2)) if a != b})
    g = graph_from_edges(spark, pairs, n_vertices=n)
    c1 = {r["vid"]: r["color"] for r in color(g).collect()}
    c2 = {r["vid"]: r["color"] for r in color(g).collect()}
    assert c1 == c2  # deterministic (seeded priorities)
    for a, b in pairs:
        assert c1[a] != c1[b], f"edge {a}-{b} same color"


def _ppr_oracle(n, edges, seed, alpha, eps, max_iter):
    outd = defaultdict(int)
    adj = defaultdict(list)
    for s, d, _ in edges:
        outd[s] += 1
        adj[s].append(d)
    p = defaultdict(float)
    r = defaultdict(float)
    r[seed] = 1.0
    for _ in range(max_iter):
        active = [v for v in list(r) if outd[v] > 0 and r[v] > eps * outd[v]]
        if not active:
            break
        pushes = [(v, r[v]) for v in active]
        for v, rv in pushes:
            p[v] += alpha * rv
            r[v] = 0.0
        for v, rv in pushes:
            for u in adj[v]:
                r[u] += (1 - alpha) * rv / outd[v]
    return p


def test_ppr_forward_push(spark):
    g = graph_from_edges(spark, PAIRS, n_vertices=8)
    edges = [(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()]
    got = {(r["seed"], r["vid"]): r["score"] for r in ppr(g, seeds=[0, 3], eps=1e-4).collect()}
    for seed in (0, 3):
        exp = _ppr_oracle(8, edges, seed, alpha=0.15, eps=1e-4, max_iter=100)
        for v, val in exp.items():
            if val > 0:
                assert abs(got.get((seed, v), 0.0) - val) < 1e-9


def test_spmv_both_kernels(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0)], weights=[2.0, 3.0, 4.0], directed=True, n_vertices=3)
    x = spark.createDataFrame([(0, 1.0), (1, 2.0), (2, 3.0)], "vid long, value double")
    exp = {0: 2.0 * 2.0, 1: 3.0 * 3.0, 2: 4.0 * 1.0}  # y_i = sum w(i->j) x_j
    for kern in ("dataframe", "csr"):
        got = {r["vid"]: r["value"] for r in spmv(g, x, kernel=kern).collect()}
        assert got == exp, kern


def test_spgemm_squares_adjacency(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2)], directed=True, n_vertices=3)
    c = {(r["src"], r["dst"]): r["weight"] for r in spgemm(g.edges, g.edges).collect()}
    assert c == {(0, 2): 1.0}  # only path 0->1->2


def test_spmv_push_partial_values_masked_gather(spark):
    """Vertices missing from the values side are zero-valued gathers
    (same as the dataframe kernel's inner join), never a blind
    searchsorted index (ADVICE r1)."""
    from essentials_spark.graph.csr_blocks import build_csr_blocks, spmv_push

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (5, 1, 1.0), (7, 2, 2.0), (3, 2, 1.0)], "src long, dst long, coef double"
    )
    blocks = build_csr_blocks(edges, n_buckets=2)
    # values cover only vids {5, 3}: src 0 would searchsorted to 3's
    # slot and src 7 to pos==len without masking
    vals = spark.createDataFrame([(5, 10.0), (3, 4.0)], "vid long, rank double")
    got = {r["dst"]: r["contrib"] for r in spmv_push(blocks, vals, n_buckets=2).collect()}
    assert got == {1: 10.0, 2: 4.0}


def test_bc_brandes(spark):
    # path 0-1-2-3: bc(1)=bc(2)=... brandes on undirected path
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)], n_vertices=4)
    got = {r["vid"]: r["bc"] for r in betweenness_centrality(g, sources=[0, 1, 2, 3]).collect()}
    # reference 0.5x-scaled convention (bc.hxx:168): vertex 1 lies on
    # pair paths {0-2, 0-3, 2-0, 3-0} -> raw delta sum 4, scaled 2
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


def test_bc_default_sources_bounded(spark):
    # sources=None must sample a bounded set, never collect all vids
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)], n_vertices=4)
    got_sampled = {r["vid"]: r["bc"] for r in betweenness_centrality(g, n_sample=2).collect()}
    # seeds {0,1}: paths from 0: (0,2)@1 (0,3)@1,2; from 1: (1,3)@2 ->
    # deltas: v1 gets 2 (from seed 0), v2 gets 1+1=2 -> scaled x0.5
    assert got_sampled == {0: 0.0, 1: 1.0, 2: 1.0, 3: 0.0}


def test_mst_total_weight(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    weights = [1.0, 2.0, 3.0, 4.0, 0.5]
    g = graph_from_edges(spark, pairs, weights=weights, n_vertices=4)
    from essentials_spark.engine.superstep import SuperstepRunner

    runner = SuperstepRunner(spark, "mst_t")
    chosen, total = mst(g, runner=runner)
    assert total == pytest.approx(0.5 + 1.0 + 3.0)  # kruskal: 0-2, 0-1, 2-3
    assert chosen.count() == 3
    # default jump='auto' on a small graph must take the single-task
    # hook-collapse kernel, never the doubling-join ladder
    assert any(m.get("jump_kernel") for m in runner.metrics)
    assert not any("jump_doublings" in m for m in runner.metrics)


def test_mst_deep_chain_jump_batched(spark):
    # long path, forced jump='loop': round-1 hook forest is a deep
    # pointer chain, forcing multiple doublings — exact weight must
    # survive the per-doubling settled checks and the inline _moved
    # flag (the above-single_solve_max fallback path)
    from essentials_spark.engine.superstep import SuperstepRunner

    n = 33
    pairs = [(i, i + 1) for i in range(n - 1)]
    weights = [1.0 + (i % 5) for i in range(n - 1)]
    g = graph_from_edges(spark, pairs, weights=weights, n_vertices=n)
    runner = SuperstepRunner(spark, "mst_chain")
    chosen, total = mst(g, runner=runner, jump="loop")
    assert total == pytest.approx(sum(weights))  # a path IS its own MST
    assert chosen.count() == n - 1
    assert any(m.get("jump_doublings", 0) >= 2 for m in runner.metrics)
    # per-doubling settled-checks on the inline _moved flag: the loop
    # must stop at the first settled doubling
    for m in runner.metrics:
        if "jump_doublings" in m:
            assert m["jump_checks"] == m["jump_doublings"]


def _kruskal_msf(pairs, weights):
    """Independent union-find oracle: unique MSF total weight under
    the engine's (weight, src, dst) total order."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0.0
    n_chosen = 0
    und = {}
    for (a, b), w in zip(pairs, weights):
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        und[k] = min(und.get(k, float("inf")), w)
    for w, a, b in sorted((w, a, b) for (a, b), w in und.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            total += w
            n_chosen += 1
    return total, n_chosen


def test_mst_kernel_loop_prefilter_agree_fuzz(spark):
    # all three physical paths (kernel jump, loop jump, prefilter+kernel)
    # must reproduce the union-find oracle exactly, including ties
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 40
        m = 90
        raw = [
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        ]
        # unique pairs: graph_from_edges dropDuplicates picks an
        # arbitrary row per (src, dst), so duplicate pairs with
        # different weights would make the input ill-defined.
        # integer weights force ties so the lexicographic tiebreak is
        # exercised
        pairs = sorted(set(raw))
        weights = [float(w) for w in rng.integers(1, 6, size=len(pairs))]
        oracle_total, oracle_cnt = _kruskal_msf(pairs, weights)
        g = graph_from_edges(spark, pairs, weights=weights, n_vertices=n)
        for kw in ({"jump": "kernel"}, {"jump": "loop"}, {"prefilter": True, "n_buckets": 4}):
            chosen, total = mst(g, **kw)
            assert total == pytest.approx(oracle_total), (trial, kw)
            assert chosen.count() == oracle_cnt, (trial, kw)


def test_mst_prefilter_drops_cycle_edges(spark):
    # dense block (many bucket-local cycles) + bridge: prefilter must
    # strictly shrink the edge set yet keep the exact MSF
    from essentials_spark.engine.superstep import SuperstepRunner

    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10)] + [(9, 10), (10, 11)]
    weights = [float(1 + ((i * 7 + j) % 4)) for i, j in pairs]
    oracle_total, oracle_cnt = _kruskal_msf(pairs, weights)
    g = graph_from_edges(spark, pairs, weights=weights, n_vertices=12)
    runner = SuperstepRunner(spark, "mst_pref")
    chosen, total = mst(g, runner=runner, prefilter=True, n_buckets=2)
    assert total == pytest.approx(oracle_total)
    assert chosen.count() == oracle_cnt
    pre = [m for m in runner.metrics if m.get("phase") == "prefilter"]
    assert pre and pre[0]["edges_out"] < pre[0]["edges_in"]


def test_geolocate_spreads(spark):
    g = graph_from_edges(spark, [(0, 1), (1, 2)], n_vertices=3)
    known = spark.createDataFrame([(0, 10.0, 20.0)], "vid long, lat double, lon double")
    got = {r["vid"]: (r["lat"], r["lon"]) for r in geolocate(g, known).collect()}
    assert got == {0: (10.0, 20.0), 1: (10.0, 20.0), 2: (10.0, 20.0)}


def test_geolocate_delta_frontier_metrics(spark):
    # chain 0-1-2-...-9 with one anchor at 0: coordinates spread one
    # hop per round, so the per-round frontier (newly located last
    # round) must be exactly 1 — the metrics pin that only the delta
    # pushes, never the cumulative located set (reference geo.hxx's
    # per-round work is likewise frontier-proportional)
    from essentials_spark.engine.superstep import SuperstepRunner

    n = 10
    g = graph_from_edges(spark, [(i, i + 1) for i in range(n - 1)], n_vertices=n)
    known = spark.createDataFrame([(0, 10.0, 20.0)], "vid long, lat double, lon double")
    runner = SuperstepRunner(spark, "geo_delta")
    got = {r["vid"]: (r["lat"], r["lon"]) for r in geolocate(g, known, runner=runner).collect()}
    assert got == {v: (10.0, 20.0) for v in range(n)}
    fronts = [m["frontier_rows"] for m in runner.metrics]
    located = [m["located"] for m in runner.metrics]
    # every spreading round pushes exactly the 1 newly-located vertex
    assert fronts == [1] * len(fronts), fronts
    assert located == [1] * (n - 1) + [0], located


def _np_midpoint(p1, p2):
    """NumPy oracle for the reference spherical midpoint (geo.hxx:92-123)."""
    la1, lo1 = np.radians(p1)
    la2, lo2 = np.radians(p2)
    bx = np.cos(la2) * np.cos(lo2 - lo1)
    by = np.cos(la2) * np.sin(lo2 - lo1)
    lat = np.arctan2(np.sin(la1) + np.sin(la2), np.sqrt((np.cos(la1) + bx) ** 2 + by**2))
    lon = lo1 + np.arctan2(by, np.cos(la1) + bx)
    return np.degrees(lat), np.degrees(lon)


def _np_weiszfeld(points, iters=8, eps=1e-3, radius=6371.0):
    """NumPy oracle for the reference spatial median (geo.hxx:130-259):
    mean init, haversine 1/d weights, Vardi-Zhang zero handling."""
    pts = np.asarray(points, dtype=np.float64)
    y = pts.mean(axis=0)

    def hav(p, q):
        la1, lo1, la2, lo2 = map(np.radians, (p[0], p[1], q[0], q[1]))
        a = np.sin((la2 - la1) / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
        return 2 * radius * np.arcsin(np.sqrt(a))

    for _ in range(iters):
        d = np.array([hav(p, y) for p in pts])
        dinv = np.where(d == 0, 0.0, 1.0 / np.where(d == 0, 1.0, d))
        nz = int((d == 0).sum())
        if nz == len(pts):
            return tuple(y)
        t = (dinv[:, None] * pts).sum(axis=0) / dinv.sum()
        if nz == 0:
            y1 = t
        else:
            r_vec = (t - y) * dinv.sum()
            r = np.sqrt((r_vec**2).sum())
            rinv = 0.0 if r == 0 else nz / r
            y1 = max(0.0, 1 - rinv) * t + min(1.0, rinv) * y
        if np.sqrt(((y - y1) ** 2).sum()) < eps:
            return tuple(y1)
        y = y1
    return tuple(y)


def test_geolocate_reference_semantics(spark):
    """method='reference' parity with the reference's per-count rules:
    1 neighbor copies, 2 take the spherical midpoint, >2 the Weiszfeld
    spatial median — each checked against an independent NumPy oracle."""
    # anchors 0..3 located; 4 sees one (0), 5 sees two (0,1), 6 sees four
    pairs = [(0, 5), (1, 5), (0, 4), (0, 6), (1, 6), (2, 6), (3, 6)]
    anchors = [(0, 10.0, 20.0), (1, 12.0, 26.0), (2, 40.0, 30.0), (3, 11.0, 21.0)]
    g = graph_from_edges(spark, pairs, n_vertices=7)
    known = spark.createDataFrame(anchors, "vid long, lat double, lon double")
    got = {
        r["vid"]: (r["lat"], r["lon"])
        for r in geolocate(g, known, method="reference", max_iter=1).collect()
    }
    assert got[4] == (10.0, 20.0)  # single neighbor: copy
    exp5 = _np_midpoint((10.0, 20.0), (12.0, 26.0))
    assert got[5] == pytest.approx(exp5, abs=1e-9)
    exp6 = _np_weiszfeld([(10.0, 20.0), (12.0, 26.0), (40.0, 30.0), (11.0, 21.0)])
    assert got[6] == pytest.approx(exp6, abs=1e-9)


def test_geolocate_weiszfeld_coincident_point(spark):
    """Vardi-Zhang guard: the mean init coinciding with an input point
    must not divide by zero and must still move toward the median."""
    # 3 collinear lats, mean == middle point
    pairs = [(0, 4), (1, 4), (2, 4)]
    anchors = [(0, 10.0, 20.0), (1, 20.0, 20.0), (2, 30.0, 20.0)]
    g = graph_from_edges(spark, pairs, n_vertices=5)
    known = spark.createDataFrame(anchors, "vid long, lat double, lon double")
    got = {
        r["vid"]: (r["lat"], r["lon"])
        for r in geolocate(g, known, method="reference", max_iter=1).collect()
    }
    exp = _np_weiszfeld([(10.0, 20.0), (20.0, 20.0), (30.0, 20.0)])
    assert got[4] == pytest.approx(exp, abs=1e-9)


def test_incremental_msf_matches_batch_fuzz(spark):
    # T <- MSF(T ∪ batch) over random splits must reproduce the
    # union-find oracle on the union exactly, including ties (integer
    # weights) and forest-edge REPLACEMENT (a later batch's lighter
    # edge displacing a chosen one)
    from essentials_spark.algos import incremental_msf_update

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 40
        m = 100
        raw = [
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        ]
        pairs = sorted(set(raw))
        weights = [float(w) for w in rng.integers(1, 6, size=len(pairs))]
        oracle_total, oracle_cnt = _kruskal_msf(pairs, weights)
        batch_of = rng.integers(0, 3, size=len(pairs))
        forest = spark.createDataFrame([], "src long, dst long, weight double")
        total = 0.0
        for b in range(3):
            rows = [
                (int(p[0]), int(p[1]), w)
                for p, w, bi in zip(pairs, weights, batch_of)
                if bi == b
            ]
            batch = spark.createDataFrame(rows or [], "src long, dst long, weight double")
            forest, total = incremental_msf_update(forest, batch)
        assert total == pytest.approx(oracle_total), trial
        assert forest.count() == oracle_cnt, trial


def test_incremental_msf_replaces_heavy_edge(spark):
    # triangle fed heavy-edges-first: batch 1 forest = {ab(5), bc(4)};
    # batch 2's ac(1) must evict ab — the maintained forest is the
    # union MSF, not a greedy superset
    from essentials_spark.algos import incremental_msf_update

    forest = spark.createDataFrame([], "src long, dst long, weight double")
    b1 = spark.createDataFrame([(0, 1, 5.0), (1, 2, 4.0)], "src long, dst long, weight double")
    forest, total = incremental_msf_update(forest, b1)
    assert total == 9.0 and forest.count() == 2
    b2 = spark.createDataFrame([(0, 2, 1.0)], "src long, dst long, weight double")
    forest, total = incremental_msf_update(forest, b2)
    assert total == 5.0 and forest.count() == 2
    kept = {(r["src"], r["dst"]) for r in forest.collect()}
    assert kept == {(0, 2), (1, 2)}


def _ktruss_oracle(pairs, k):
    # brute-force peel on sets
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b])
            for a, b in edges
        }
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return edges
        edges = edges - drop


def test_ktruss_known_graphs(spark):
    from essentials_spark.algos import ktruss

    # K4: every edge in 2 triangles -> 4-truss is all 6 edges
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = graph_from_edges(spark, k4, n_vertices=4)
    got = {(r["src"], r["dst"]) for r in ktruss(g, 4).collect()}
    assert got == set(k4)
    # K4 minus one edge: supports {2,1,1,1,1} -> cascade empties it
    k4m = [e for e in k4 if e != (0, 1)]
    g2 = graph_from_edges(spark, k4m, n_vertices=4)
    assert ktruss(g2, 4).count() == 0
    # 3-truss = edges in >=1 triangle after cascade; k<=2 = everything
    tri_plus_tail = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g3 = graph_from_edges(spark, tri_plus_tail, n_vertices=4)
    assert {(r["src"], r["dst"]) for r in ktruss(g3, 3).collect()} == {(0, 1), (0, 2), (1, 2)}
    assert ktruss(g3, 2).count() == 4


def test_ktruss_matches_bruteforce_fuzz(spark):
    from essentials_spark.algos import ktruss

    rng = np.random.default_rng(13)
    for trial in range(2):
        n = 24
        pairs = sorted({
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, size=(120, 2))
            if a != b
        })
        g = graph_from_edges(spark, pairs, n_vertices=n)
        for k in (3, 4, 5):
            want = _ktruss_oracle(pairs, k)
            got = {(r["src"], r["dst"]) for r in ktruss(g, k).collect()}
            assert got == want, (trial, k)
            # A/B: the full-recompute path must return the identical set
            full = {(r["src"], r["dst"]) for r in ktruss(g, k, delta=False).collect()}
            assert full == want, (trial, k, "delta=False")


def test_truss_decomposition_fuzz(spark):
    from essentials_spark.algos import truss_decomposition

    rng = np.random.default_rng(29)
    n = 20
    pairs = sorted({
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.integers(0, n, size=(110, 2))
        if a != b
    })
    g = graph_from_edges(spark, pairs, n_vertices=n)
    got = {(r["src"], r["dst"]): r["trussness"] for r in truss_decomposition(g).collect()}
    # brute-force: trussness(e) = max k with e in the k-truss
    want = {}
    k = 2
    edges = set(pairs)
    while edges:
        for e in edges:
            want[e] = k
        k += 1
        edges = _ktruss_oracle(edges, k)
    assert got == want
    # capped: survivors at k_max report k_max, below-cap values unchanged
    cap = 3
    got_cap = {(r["src"], r["dst"]): r["trussness"] for r in truss_decomposition(g, k_max=cap).collect()}
    assert got_cap == {e: min(t, cap) for e, t in want.items()}


def test_truss_decomposition_k4_clique(spark):
    from essentials_spark.algos import truss_decomposition

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(3, 4), (4, 5)]
    g = graph_from_edges(spark, k4 + tail, n_vertices=6)
    got = {(r["src"], r["dst"]): r["trussness"] for r in truss_decomposition(g).collect()}
    assert got == {**{e: 4 for e in k4}, **{e: 2 for e in tail}}


def test_salsa_power_iteration(spark):
    from essentials_spark.algos import salsa

    g = graph_from_edges(spark, [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)], directed=True, n_vertices=4)
    res = salsa(g, max_iter=30).orderBy("vid").collect()
    A = np.zeros((4, 4))
    for r in g.edges.collect():
        A[r["src"], r["dst"]] = 1.0
    outd = A.sum(axis=1)
    ind = A.sum(axis=0)
    W_fwd = np.divide(A, outd[:, None], out=np.zeros_like(A), where=outd[:, None] > 0)
    W_rev = np.divide(A, ind[None, :], out=np.zeros_like(A), where=ind[None, :] > 0)
    auth, hub = np.ones(4), np.ones(4)
    for _ in range(30):
        auth_raw = W_fwd.T @ hub
        hub_raw = W_rev @ auth_raw
        auth = auth_raw / auth_raw.sum()
        hub = hub_raw / hub_raw.sum()
    assert np.allclose([r["auth"] for r in res], auth, atol=1e-9)
    assert np.allclose([r["hub"] for r in res], hub, atol=1e-9)
    # L1 semantics: both are probability distributions
    assert abs(sum(r["auth"] for r in res) - 1.0) < 1e-9
    assert abs(sum(r["hub"] for r in res) - 1.0) < 1e-9


def test_harmonic_centrality_hand_computed(spark):
    """Path 0-1-2-3 + isolated 4, sources {0, 1}:
    harm(v) = sum over sources s != v of 1/d(s,v)."""
    from essentials_spark.algos import harmonic_centrality

    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)], n_vertices=5)
    got = {r.vid: r.harm for r in harmonic_centrality(g, sources=[0, 1]).collect()}
    exp = {
        0: 1.0,            # d(1,0)=1
        1: 1.0,            # d(0,1)=1
        2: 1 / 2 + 1,      # d(0,2)=2, d(1,2)=1
        3: 1 / 3 + 1 / 2,  # d(0,3)=3, d(1,3)=2
    }
    assert got.keys() == exp.keys()
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12


def test_temporal_reachability_semantics(spark):
    """Time-respecting paths only: 0-(t10)->1-(t5)->2 cannot reach 2
    through 1 (5 < 10), but 0-(t10)->1-(t20)->3 can; earliest arrival
    wins when two paths exist."""
    from essentials_spark.algos import temporal_reachability

    edges = spark.createDataFrame(
        [
            (0, 1, 10),
            (1, 2, 5),    # too early once at 1 (arrival 10)
            (1, 3, 20),
            (0, 3, 50),   # direct but later -> min(20, 50) = 20
            (3, 4, 15),   # too early from 3 (arrival 20)
            (3, 4, 30),   # feasible duplicate edge, later ts
        ],
        "src long, dst long, ets long",
    )
    got = {r.vid: r.arrival_us for r in temporal_reachability(edges, 0, 0).collect()}
    assert got == {0: 0, 1: 10, 3: 20, 4: 30}


def test_closeness_centrality_hand_computed(spark):
    """Path 0-1-2-3 + isolated 4, sources {0, 1}: integer statistics
    (n_src reached incl. self at d=0, sum of hop distances)."""
    from essentials_spark.algos import closeness_centrality

    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3)], n_vertices=5)
    got = {r.vid: (r.n_src, r.sum_dist) for r in closeness_centrality(g, sources=[0, 1]).collect()}
    assert got == {
        0: (2, 1),  # d(0,0)=0, d(1,0)=1
        1: (2, 1),
        2: (2, 3),  # 2 + 1
        3: (2, 5),  # 3 + 2
    }


def test_eigenvector_centrality_vs_numpy(spark):
    """Power iteration matches the same iterate computed densely in
    NumPy (identical recurrence, not just the limit)."""
    import numpy as np

    from essentials_spark.algos import eigenvector_centrality

    rng = np.random.RandomState(99)
    n = 30
    pairs = list({(int(a), int(b)) for a, b in rng.randint(0, n, size=(60, 2)) if a != b})
    g = graph_from_edges(spark, pairs, n_vertices=n)
    got = {r["vid"]: r["score"] for r in eigenvector_centrality(g, max_iter=8).collect()}

    A = np.zeros((n, n))
    for u, v in pairs:
        A[u, v] = 1.0
        A[v, u] = 1.0
    x = np.ones(n)
    for _ in range(8):
        x = A @ x
        s = x.sum()
        x = x / s if s > 0 else x * 0.0
    for v in range(n):
        assert abs(got[v] - x[v]) < 1e-9, (v, got[v], x[v])


def test_katz_centrality_vs_numpy(spark):
    """Katz recurrence x <- 1 + alpha*A x matches the dense NumPy
    replay iterate-for-iterate."""
    import numpy as np

    from essentials_spark.algos import katz_centrality

    rng = np.random.RandomState(7)
    n = 25
    pairs = list({(int(a), int(b)) for a, b in rng.randint(0, n, size=(50, 2)) if a != b})
    g = graph_from_edges(spark, pairs, n_vertices=n)
    alpha = 1.0 / 64
    got = {r["vid"]: r["score"] for r in katz_centrality(g, alpha=alpha, max_iter=6).collect()}

    A = np.zeros((n, n))
    for u, v in pairs:
        A[u, v] = 1.0
        A[v, u] = 1.0
    x = np.ones(n)
    for _ in range(6):
        x = 1.0 + alpha * (A @ x)
    for v in range(n):
        assert abs(got[v] - x[v]) < 1e-9, (v, got[v], x[v])


def test_eigenvector_centrality_tol_early_exit(spark):
    """tol > 0 stops at the fixpoint: a triangle (non-bipartite —
    power iteration oscillates on bipartite graphs like stars) hits
    the uniform stationary vector after one round."""
    from essentials_spark.algos import eigenvector_centrality

    g = graph_from_edges(spark, [(0, 1), (1, 2), (0, 2)])
    got = {r["vid"]: r["score"] for r in eigenvector_centrality(g, max_iter=50, tol=1e-12).collect()}
    for v in range(3):
        assert abs(got[v] - 1 / 3) < 1e-12
