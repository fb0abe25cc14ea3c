"""Sampling (random walks, fanout neighbor sampling), link prediction,
and tool-transition derivation."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import graph_from_edges


def _sym_edges(spark, pairs):
    rows = []
    for u, v in pairs:
        rows.append((u, v))
        if u != v:
            rows.append((v, u))
    return spark.createDataFrame(rows, "src long, dst long").dropDuplicates(["src", "dst"])


RW_PAIRS = [(0, 1), (1, 2), (2, 3), (1, 3), (3, 4), (4, 0), (2, 5), (5, 6)]


def test_random_walks_df_csr_exact(spark):
    from essentials_spark.sampling import random_walks

    edges = _sym_edges(spark, RW_PAIRS)
    start = spark.createDataFrame(
        [(f"v{i}#{w}", i) for i in range(7) for w in range(2)], "wid string, vid long"
    )
    a = random_walks(edges, start, length=5, kernel="dataframe")
    b = random_walks(edges, start, length=5, kernel="csr", n_buckets=4)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # 14 walkers x 6 steps, no dead ends on this connected graph
    assert len(ra) == 14 * 6


def test_random_walks_steps_are_edges_and_match_rank_choice(spark):
    from essentials_spark.functions.portable_hash import md5_int60
    from essentials_spark.sampling import random_walks, ranked_adjacency

    edges = _sym_edges(spark, RW_PAIRS)
    start = spark.createDataFrame([(f"v{i}#0", i) for i in range(7)], "wid string, vid long")
    walks = random_walks(edges, start, length=4)
    edge_set = {(r.src, r.dst) for r in edges.collect()}
    radj = {(r.src, r.rank): r.dst for r in ranked_adjacency(edges).collect()}
    deg = {}
    for (s, _r), _d in radj.items():
        deg[s] = deg.get(s, 0) + 1
    rows = sorted(map(tuple, walks.collect()), key=lambda t: (t[0], t[1]))
    by_wid = {}
    for wid, step, vid in rows:
        by_wid.setdefault(wid, []).append((step, vid))
    # recompute every choice independently (Spark-side md5 just for the
    # hash value; the indexing arithmetic redone in Python)
    hash_inputs = [(wid, t) for wid, path in by_wid.items() for t, _ in path if t > 0]
    hdf = spark.createDataFrame(hash_inputs, "wid string, step int").withColumn(
        "h", md5_int60(F.concat(F.col("wid"), F.lit(":"), F.col("step").cast("string")))
    )
    hmap = {(r.wid, r.step): r.h for r in hdf.collect()}
    for wid, path in by_wid.items():
        assert [t for t, _ in path] == list(range(len(path)))
        for (t0, v0), (t1, v1) in zip(path, path[1:]):
            assert (v0, v1) in edge_set
            want = radj[(v0, hmap[(wid, t1)] % deg[v0] + 1)]
            assert v1 == want


def test_random_walks_isolated_vertex_ends_at_step0(spark):
    from essentials_spark.sampling import random_walks

    edges = _sym_edges(spark, [(0, 1)])
    start = spark.createDataFrame([("v9#0", 9)], "wid string, vid long")
    rows = random_walks(edges, start, length=3).collect()
    assert [(r.wid, r.step, r.vid) for r in rows] == [("v9#0", 0, 9)]


def test_sampled_adjacency_fanout_bound_and_subset(spark):
    from essentials_spark.sampling import sampled_adjacency

    ke = spark.createDataFrame(
        [(f"v{u}", f"v{v}") for u, v in RW_PAIRS] + [(f"v{v}", f"v{u}") for u, v in RW_PAIRS],
        "src_key string, dst_key string",
    ).dropDuplicates()
    full = {(r.src_key, r.dst_key) for r in ke.collect()}
    sa = sampled_adjacency(ke, 2)
    rows = [(r.src_key, r.dst_key) for r in sa.collect()]
    assert set(rows) <= full
    per_src = {}
    for s, _d in rows:
        per_src[s] = per_src.get(s, 0) + 1
    assert max(per_src.values()) <= 2
    # vertices with degree <= fanout keep their full neighborhood
    degs = {}
    for s, _d in full:
        degs[s] = degs.get(s, 0) + 1
    for s, d in degs.items():
        assert per_src.get(s, 0) == min(d, 2)
    # deterministic
    again = [(r.src_key, r.dst_key) for r in sampled_adjacency(ke, 2).collect()]
    assert sorted(rows) == sorted(again)


def test_neighbor_sample_hop_structure(spark):
    from essentials_spark.sampling import neighbor_sample, sampled_adjacency

    ke = spark.createDataFrame(
        [(f"v{u}", f"v{v}") for u, v in RW_PAIRS] + [(f"v{v}", f"v{u}") for u, v in RW_PAIRS],
        "src_key string, dst_key string",
    ).dropDuplicates()
    roots = spark.createDataFrame([("v1",), ("v5",)], "root_key string")
    out = neighbor_sample(ke, roots, [2, 1], seed="t")
    rows = [(r.root_key, r.hop, r.src_key, r.dst_key) for r in out.collect()]
    assert len(rows) == len(set(rows))
    hop1 = {(r[0], r[2], r[3]) for r in rows if r[1] == 1}
    hop2 = {r for r in rows if r[1] == 2}
    # hop-1 rows start at their root
    assert all(root == src for root, src, _ in hop1)
    # hop-2 sources are hop-1 destinations of the same root
    hop1_dst = {(root, dst) for root, _src, dst in hop1}
    assert all((root, src) in hop1_dst for root, _h, src, _dst in hop2)
    # hop-i edges come from the hop-i sampled adjacency (seeded per hop)
    sa1 = {(r.src_key, r.dst_key) for r in sampled_adjacency(ke, 2, seed="t:1").collect()}
    sa2 = {(r.src_key, r.dst_key) for r in sampled_adjacency(ke, 1, seed="t:2").collect()}
    assert all((src, dst) in sa1 for _root, src, dst in hop1)
    assert all((src, dst) in sa2 for _root, _h, src, dst in hop2)


def test_linkpred_golden_star(spark):
    """Star 0-{1,2,3} + edge 1-2: candidates (1,3) and (2,3) share the
    hub 0 (deg 3): cn=1, jac=1/(deg_u+deg_w-1), aa=1/ln(3); (1,2) is
    adjacent and excluded."""
    import math

    from essentials_spark.algos.linkpred import linkpred_scores

    g = graph_from_edges(spark, [(0, 1), (0, 2), (0, 3), (1, 2)])
    rows = {(r.u, r.w): r for r in linkpred_scores(g, min_cn=1).collect()}
    assert set(rows) == {(1, 3), (2, 3)}
    for pair in [(1, 3), (2, 3)]:
        r = rows[pair]
        assert r.cn == 1
        assert r.jac == pytest.approx(1.0 / (2 + 1 - 1))
        assert r.aa == pytest.approx(1.0 / math.log(3))


def test_linkpred_min_cn_and_center_cap(spark):
    from essentials_spark.algos.linkpred import linkpred_scores

    # 4-cycle 0-1-2-3-0: (0,2) and (1,3) each share TWO centers
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    rows = {(r.u, r.w): r.cn for r in linkpred_scores(g, min_cn=2).collect()}
    assert rows == {(0, 2): 2, (1, 3): 2}
    # capping centers below their degree (2) removes every wedge
    assert linkpred_scores(g, min_cn=1, center_cap=1).count() == 0


def test_tool_transitions(spark):
    from essentials_spark.io.transcripts import tool_transitions

    rows = [
        ("c1", 0, "user", "t", "grep", None),
        ("c1", 1, "assistant", "t", None, None),
        ("c1", 2, "user", "t", "read", None),
        ("c1", 3, "user", "t", "grep", None),
        ("c2", 0, "user", "t", "read", None),
        ("c2", 1, "user", "t", "grep", None),
        ("c3", 0, "user", "t", "grep", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = {(r.src_tool, r.dst_tool): r.n for r in tool_transitions(t).collect()}
    # c1: grep->read (skipping the tool-less turn), read->grep; c2: read->grep
    assert out == {("grep", "read"): 1, ("read", "grep"): 2}


def test_walk_contexts_window_pairs(spark):
    from essentials_spark.sampling import walk_contexts

    walks = spark.createDataFrame(
        [("a#0", 0, 10), ("a#0", 1, 11), ("a#0", 2, 12), ("b#0", 0, 20), ("b#0", 1, 21)],
        "wid string, step int, vid long",
    )
    out = {(r.center, r.ctx): r.cnt for r in walk_contexts(walks, window=2).collect()}
    # walk a: (10,11),(11,12) at d=1; (10,12) at d=2; walk b: (20,21); all both directions
    expect = {
        (10, 11): 1, (11, 10): 1, (11, 12): 1, (12, 11): 1,
        (10, 12): 1, (12, 10): 1, (20, 21): 1, (21, 20): 1,
    }
    assert out == expect


def test_walk_contexts_counts_aggregate(spark):
    from essentials_spark.sampling import walk_contexts

    # two walks traverse the same pair -> cnt 2
    walks = spark.createDataFrame(
        [("a#0", 0, 1), ("a#0", 1, 2), ("b#0", 0, 1), ("b#0", 1, 2)],
        "wid string, step int, vid long",
    )
    out = {(r.center, r.ctx): r.cnt for r in walk_contexts(walks, window=1).collect()}
    assert out == {(1, 2): 2, (2, 1): 2}


def test_conversation_stats(spark):
    import datetime as dt

    from essentials_spark.io.transcripts import conversation_stats

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("c1", 0, "user", "abcd", "grep", base),
        ("c1", 1, "assistant", "ab", None, base + dt.timedelta(microseconds=1_500_000)),
        ("c1", 2, "user", "abcdef", "grep", base + dt.timedelta(seconds=10)),
        ("c2", 0, "user", "xy", None, base),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz"
    )
    out = {r.conv_id: r for r in conversation_stats(t).collect()}
    c1 = out["c1"]
    assert (c1.n_turns, c1.n_tool_calls, c1.n_distinct_tools) == (3, 2, 1)
    assert c1.duration_us == 10_000_000
    assert c1.avg_text_len == 4.0
    c2 = out["c2"]
    assert (c2.n_turns, c2.n_tool_calls, c2.n_distinct_tools, c2.duration_us) == (1, 0, 0, 0)


def test_node2vec_df_csr_exact(spark):
    from essentials_spark.sampling import node2vec_walks

    edges = _sym_edges(spark, RW_PAIRS)
    start = spark.createDataFrame(
        [(f"n{i}#{w}", i) for i in range(7) for w in range(2)], "wid string, vid long"
    )
    a = node2vec_walks(edges, start, length=5, kernel="dataframe")
    b = node2vec_walks(edges, start, length=5, kernel="csr", n_buckets=4)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) == 14 * 6


def test_node2vec_choice_matches_reference_recompute(spark):
    """Recompute every second-order choice in plain Python from the
    spec: integer weights (w_return if dst==prev, w_common if
    dst in N(prev), else w_far) cumulated in dst-ascending order,
    pick = h % total."""
    from essentials_spark.functions.portable_hash import md5_int60
    from essentials_spark.sampling import node2vec_walks

    W_RET, W_COM, W_FAR = 1, 4, 2
    edges = _sym_edges(spark, RW_PAIRS)
    adj = {}
    for r in edges.collect():
        adj.setdefault(r.src, []).append(r.dst)
    adj = {k: sorted(v) for k, v in adj.items()}
    start = spark.createDataFrame([(f"n{i}#0", i) for i in range(7)], "wid string, vid long")
    walks = node2vec_walks(
        edges, start, length=4, w_return=W_RET, w_common=W_COM, w_far=W_FAR
    )
    rows = sorted(map(tuple, walks.collect()), key=lambda t: (t[0], t[1]))
    by_wid = {}
    for wid, step, vid in rows:
        by_wid.setdefault(wid, []).append(vid)
    hdf = spark.createDataFrame(
        [(wid, t) for wid in by_wid for t in range(1, 5)], "wid string, step int"
    ).withColumn("h", md5_int60(F.concat(F.col("wid"), F.lit(":"), F.col("step").cast("string"))))
    hmap = {(r.wid, r.step): r.h for r in hdf.collect()}
    for wid, path in by_wid.items():
        # step 1: first-order
        assert path[1] == adj[path[0]][hmap[(wid, 1)] % len(adj[path[0]])]
        for t in range(2, len(path)):
            prev, cur = path[t - 2], path[t - 1]
            cands = adj[cur]
            ws = [
                W_RET if c == prev else (W_COM if c in adj[prev] else W_FAR)
                for c in cands
            ]
            r = hmap[(wid, t)] % sum(ws)
            cum = 0
            for c, w in zip(cands, ws):
                cum += w
                if r < cum:
                    assert path[t] == c
                    break


def test_walks_hub_graph_df_csr_exact(spark):
    """Adversarial skew: a 300-neighbor hub. Both walk orders and both
    physical paths must agree — the df path's (src, rank) point probe
    and the CSR gather index the same dst-ascending hub run."""
    from essentials_spark.sampling import node2vec_walks, random_walks

    pairs = [(0, i) for i in range(1, 301)] + [(1, 2), (5, 6), (7, 8)]
    edges = _sym_edges(spark, pairs)
    start = spark.createDataFrame(
        [(f"h{i}#0", i) for i in [0, 1, 2, 5, 150, 300]], "wid string, vid long"
    )
    a = sorted(map(tuple, random_walks(edges, start, length=4).collect()))
    b = sorted(map(tuple, random_walks(edges, start, length=4, kernel="csr", n_buckets=4).collect()))
    assert a == b
    c = sorted(map(tuple, node2vec_walks(edges, start, length=4).collect()))
    d = sorted(map(tuple, node2vec_walks(edges, start, length=4, kernel="csr", n_buckets=4).collect()))
    assert c == d


def test_node2vec_hub_cap_semantics(spark):
    """max_expand: walkers on the 300-degree hub take the first-order
    h % deg step; everyone else keeps the biased pick. df == csr, and
    hub steps match the uniform recompute."""
    from essentials_spark.functions.portable_hash import md5_int60
    from essentials_spark.sampling import node2vec_walks

    pairs = [(0, i) for i in range(1, 301)] + [(1, 2), (2, 3)]
    edges = _sym_edges(spark, pairs)
    adj = {}
    for r in edges.collect():
        adj.setdefault(r.src, []).append(r.dst)
    adj = {k: sorted(v) for k, v in adj.items()}
    start = spark.createDataFrame(
        [(f"c{i}#0", i) for i in [0, 1, 2, 150]], "wid string, vid long"
    )
    a = node2vec_walks(edges, start, length=4, max_expand=16)
    b = node2vec_walks(edges, start, length=4, max_expand=16, kernel="csr", n_buckets=4)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    by_wid = {}
    for wid, step, vid in sorted(ra, key=lambda t: (t[0], t[1])):
        by_wid.setdefault(wid, []).append(vid)
    hdf = spark.createDataFrame(
        [(wid, t) for wid in by_wid for t in range(1, 5)], "wid string, step int"
    ).withColumn("h", md5_int60(F.concat(F.col("wid"), F.lit(":"), F.col("step").cast("string"))))
    hmap = {(r.wid, r.step): r.h for r in hdf.collect()}
    saw_capped = False
    for wid, path in by_wid.items():
        for t in range(2, len(path)):
            cur = path[t - 1]
            if len(adj[cur]) > 16:  # hub: uniform first-order step
                saw_capped = True
                assert path[t] == adj[cur][hmap[(wid, t)] % len(adj[cur])]
    assert saw_capped


def test_temporal_neighbor_sample_respects_time(spark):
    # chain a -1000-> b -2000-> c -3000-> d (forward influence);
    # sampling influencers of d at t=3001 must walk BACKWARD with
    # strictly decreasing bounds: d<-c@3000, c<-b@2000, never b<-a
    # at hop 2 from d (bound 3000 > 1000 allows it) — verify bounds
    from pyspark.sql import functions as F

    from essentials_spark.sampling import temporal_neighbor_sample

    te = spark.createDataFrame(
        [("a", "b", 1000), ("b", "c", 2000), ("c", "d", 3000)],
        "src_key string, dst_key string, ets_us long",
    )
    rev = te.select(
        F.col("dst_key").alias("src_key"), F.col("src_key").alias("dst_key"), "ets_us"
    )
    roots = spark.createDataFrame([("d", 3001)], "root_key string, t0_us long")
    out = {(r.hop, r.src_key, r.dst_key, r.ets_us)
           for r in temporal_neighbor_sample(rev, roots, [2, 2]).collect()}
    assert out == {(1, "d", "c", 3000), (2, "c", "b", 2000)}

    # a root queried BEFORE any edge sees nothing
    early = spark.createDataFrame([("d", 500)], "root_key string, t0_us long")
    assert temporal_neighbor_sample(rev, early, [2, 2]).count() == 0

    # recency cap: with cap=1, a vertex with two incoming edges only
    # exposes the most recent one
    te2 = spark.createDataFrame(
        [("x", "z", 100), ("y", "z", 200)],
        "src_key string, dst_key string, ets_us long",
    )
    rev2 = te2.select(
        F.col("dst_key").alias("src_key"), F.col("src_key").alias("dst_key"), "ets_us"
    )
    r2 = spark.createDataFrame([("z", 300)], "root_key string, t0_us long")
    got = {(r.dst_key, r.ets_us)
           for r in temporal_neighbor_sample(rev2, r2, [5], recent_cap=1).collect()}
    assert got == {("y", 200)}


def test_negative_samples_bump_off_positives(spark):
    from pyspark.sql import functions as F

    from essentials_spark.sampling import negative_samples

    vkeys = spark.createDataFrame(
        [(i, f"v{i:02d}") for i in range(10)], "vid long, skey string"
    )
    pairs = spark.createDataFrame(
        [(f"v{i:02d}", f"v{(i + 1) % 10:02d}") for i in range(10)],
        "center_key string, ctx_key string",
    )
    out = negative_samples(pairs, vkeys, k=3).collect()
    assert len(out) == 30  # k per pair, always
    for r in out:
        assert r.neg_key not in (r.center_key, r.ctx_key)  # bumped off
        assert 0 <= r.neg_idx < 3
    # deterministic rerun
    again = negative_samples(pairs, vkeys, k=3).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in again}
