"""Round-6 ops: as-of join, range count, window rollups, SCC,
BPE encode, global rank — hand-computed fixtures."""

from pyspark.sql import functions as F


def test_asof_join_strict_and_inclusive(spark):
    from essentials_spark.ops.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10, "l1"), ("k", 20, "l2"), ("k", 5, "l0"), ("z", 10, "lz")],
        "key string, ts_us long, lid string",
    )
    right = spark.createDataFrame(
        [("k", 10, "r10"), ("k", 15, "r15"), ("k", 15, "r15b"), ("k", 1, "r1")],
        "key string, ts_us long, rv string",
    )
    # strict: left@10 sees right@1 only (right@10 excluded at equal ts)
    got = {
        r["lid"]: r["asof_rv"]
        for r in asof_join(
            left, right, "key", value_cols=["rv"], strict=True, right_order_cols=["rv"]
        ).collect()
    }
    assert got == {"l0": "r1", "l1": "r1", "l2": "r15b", "lz": None}
    # inclusive: left@10 sees right@10; equal-ts right ties pick the
    # LAST by right_order_cols ('r15b' > 'r15')
    got2 = {
        r["lid"]: r["asof_rv"]
        for r in asof_join(
            left, right, "key", value_cols=["rv"], strict=False, right_order_cols=["rv"]
        ).collect()
    }
    assert got2 == {"l0": "r1", "l1": "r10", "l2": "r15b", "lz": None}


def test_asof_join_composite_key_and_empty_right(spark):
    from essentials_spark.ops.asof import asof_join

    left = spark.createDataFrame(
        [("u1", "t1", 10, 1), ("u1", "t2", 10, 2), ("u2", "t1", 10, 3)],
        "user string, tool string, ts_us long, lid long",
    )
    right = spark.createDataFrame(
        [("u1", "t1", 5, 100), ("u2", "t1", 7, 200), ("u1", "t2", 20, 300)],
        "user string, tool string, ts_us long, rv long",
    )
    got = {
        r["lid"]: r["asof_rv"]
        for r in asof_join(
            left, right, ["user", "tool"], value_cols=["rv"], right_order_cols=["rv"]
        ).collect()
    }
    # composite (user, tool) keys match independently; future right
    # rows and cross-key rows never leak
    assert got == {1: 100, 2: None, 3: 200}
    empty_right = right.limit(0)
    got2 = {
        r["lid"]: r["asof_rv"]
        for r in asof_join(
            left, empty_right, ["user", "tool"], value_cols=["rv"], right_order_cols=["rv"]
        ).collect()
    }
    assert got2 == {1: None, 2: None, 3: None}


def test_asof_sharded_equals_plain(spark):
    # fuzz parity: the time-sharded hub path must be row-identical to
    # the single-window path, across shard widths that split, straddle,
    # and subsume the data — including right-empty shard gaps
    from pyspark.sql import functions as F

    from essentials_spark.ops.asof import asof_join

    left = spark.range(300).select(
        (F.pmod(F.xxhash64("id"), F.lit(3))).cast("string").alias("key"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000))).alias("ts_us"),
        F.col("id").alias("lid"),
    )
    right = spark.range(120).select(
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(3))).cast("string").alias("key"),
        # cluster rights into [0, 500) so late shards have no rights
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500))).alias("ts_us"),
        F.col("id").alias("rv"),
    )
    for strict in (True, False):
        plain = {
            r["lid"]: r["asof_rv"]
            for r in asof_join(
                left, right, "key", value_cols=["rv"], strict=strict, right_order_cols=["rv"]
            ).collect()
        }
        for shard in (7, 100, 5000):
            sharded = {
                r["lid"]: r["asof_rv"]
                for r in asof_join(
                    left, right, "key", value_cols=["rv"], strict=strict,
                    right_order_cols=["rv"], shard_us=shard,
                ).collect()
            }
            assert sharded == plain, (strict, shard)


def test_range_count_boundaries(spark):
    from essentials_spark.ops.asof import range_count

    points = spark.createDataFrame([(t,) for t in [5, 10, 10, 20, 100]], "ts_us long")
    intervals = spark.createDataFrame(
        [
            (1, 10, 20),   # inclusive both ends: 10,10,20 -> 3
            (2, 0, 4),     # before everything -> 0
            (3, 11, 19),   # gap -> 0
            (4, 0, 1000),  # everything -> 5
            (5, 101, 999), # after everything -> 0
            (6, 5, 5),     # single point -> 1
        ],
        "qid long, lo_us long, hi_us long",
    )
    got = {
        r["qid"]: r["n_in_range"]
        for r in range_count(points, intervals, bucket_us=7).collect()
    }
    assert got == {1: 3, 2: 0, 3: 0, 4: 5, 5: 0, 6: 1}


def test_window_rollups(spark):
    from essentials_spark.streaming.windows import sliding_rollup, tumbling_rollup

    turns = spark.createDataFrame(
        [
            ("c1", "2024-01-01 00:10:00", "toolA"),
            ("c1", "2024-01-01 00:50:00", None),
            ("c2", "2024-01-01 01:10:00", "toolB"),
        ],
        "conv_id string, ts_s string, tool string",
    ).select("conv_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "tool")
    t = {r["win_start_us"]: (r["n_turns"], r["n_convs"], r["n_tool_calls"])
         for r in tumbling_rollup(turns).collect()}
    h0 = 1704067200 * 10**6  # 2024-01-01 00:00 UTC epoch-us
    assert t == {h0: (2, 1, 1), h0 + 3_600_000_000: (1, 1, 1)}
    s = {r["win_start_us"]: r["n_turns"] for r in sliding_rollup(turns).collect()}
    # 00:10 lands in [23:40?] no — windows starting 23:30 & 00:00 for
    # width 1h slide 30m: starts 23:30 (23:30-00:30) and 00:00
    assert s[h0] == 2  # 00:00-01:00 holds 00:10 and 00:50
    assert s[h0 + 1_800_000_000] == 2  # 00:30-01:30 holds 00:50, 01:10


def test_scc_hand_graph(spark):
    from essentials_spark.algos.scc import strongly_connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 5), (5, 6), (6, 5), (7, 8)],
        "src long, dst long",
    )
    verts = spark.createDataFrame([(v,) for v in [1, 2, 3, 5, 6, 7, 8, 9]], "vid long")
    got = {r["vid"]: r["scc"] for r in strongly_connected_components(verts, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}


def test_scc_csr_kernel_equals_dataframe(spark):
    # the CSR MIN-semiring path must be label-identical to the
    # dataframe path on a random directed graph (cycles + DAG tails)
    import numpy as np

    from essentials_spark.algos.scc import strongly_connected_components

    rng = np.random.RandomState(5)
    n = 60
    pairs = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, size=(150, 2)) if a != b})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.createDataFrame([(v,) for v in range(n)], "vid long")
    df_out = {(r["vid"], r["scc"]) for r in strongly_connected_components(verts, edges).collect()}
    csr_out = {
        (r["vid"], r["scc"])
        for r in strongly_connected_components(verts, edges, kernel="csr", n_buckets=4).collect()
    }
    assert df_out == csr_out and len(df_out) == n


def test_scc_csr_bucket_count_invariance(spark):
    # the bucket-local chaotic fixpoint must be schedule-independent:
    # any bucket count yields the same labels (monotone-operator
    # unique fixpoint)
    import numpy as np

    from essentials_spark.algos.scc import strongly_connected_components

    rng = np.random.RandomState(17)
    n = 50
    pairs = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, size=(120, 2)) if a != b})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.createDataFrame([(v,) for v in range(n)], "vid long")
    outs = [
        {(r["vid"], r["scc"]) for r in strongly_connected_components(
            verts, edges, kernel="csr", n_buckets=b
        ).collect()}
        for b in (1, 3, 16)
    ]
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) == n


def test_scc_string_vids_and_empty(spark):
    from essentials_spark.algos.scc import strongly_connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
    )
    verts = spark.createDataFrame([("a",), ("b",), ("c",)], "vid string")
    got = {r["vid"]: r["scc"] for r in strongly_connected_components(verts, edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "c"}
    empty_v = verts.limit(0)
    assert strongly_connected_components(empty_v, edges.limit(0)).count() == 0


def test_mis_invariants_and_determinism(spark):
    # independence + maximality + exact determinism on a random graph
    import numpy as np

    from essentials_spark.algos.mis import maximal_independent_set

    rng = np.random.RandomState(11)
    n = 40
    pairs = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, size=(80, 2)) if a != b})
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame([(str(a), str(b)) for a, b in sym], "src string, dst string")
    verts = spark.createDataFrame([(str(v),) for v in range(n)], "vid string")
    out = {(r["vid"], r["mis_round"]) for r in maximal_independent_set(verts, edges).collect()}
    members = {v for v, _ in out}
    adj = {}
    for a, b in sym:
        adj.setdefault(str(a), set()).add(str(b))
    # independence: no two members adjacent
    for v in members:
        assert not (adj.get(v, set()) & members), v
    # maximality: every non-member has a member neighbor
    for v in (set(str(x) for x in range(n)) - members):
        assert adj.get(v, set()) & members, v
    # determinism: identical trajectory on a rerun
    out2 = {(r["vid"], r["mis_round"]) for r in maximal_independent_set(verts, edges).collect()}
    assert out == out2


def test_mis_complete_graph_single_member(spark):
    from essentials_spark.algos.mis import maximal_independent_set

    vs = ["a", "b", "c", "d"]
    sym = [(u, v) for u in vs for v in vs if u != v]
    edges = spark.createDataFrame(sym, "src string, dst string")
    verts = spark.createDataFrame([(v,) for v in vs], "vid string")
    out = maximal_independent_set(verts, edges).collect()
    assert len(out) == 1 and out[0]["mis_round"] == 1


def test_densest_subgraph_planted_clique(spark):
    # K4 (density 1.5) + a 6-chain tail (density ~0.83): the eps=0
    # peel drops the chain in round 1 and the best subgraph is K4
    from essentials_spark.algos.densest import densest_subgraph

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    chain = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15)]
    edges = spark.createDataFrame(k4 + chain, "src long, dst long")
    verts = spark.createDataFrame(
        [(v,) for v in [0, 1, 2, 3, 10, 11, 12, 13, 14, 15, 99]], "vid long"
    )  # 99 isolated: peels immediately, never hurts density
    out = densest_subgraph(verts, edges, epsilon_num=0, epsilon_den=1).collect()
    assert {r["vid"] for r in out} == {0, 1, 2, 3}
    assert all((r["n_sub"], r["m_sub"]) == (4, 6) for r in out)


def test_densest_subgraph_whole_graph_best(spark):
    # a uniform cycle never improves by peeling (peel empties it in
    # one round): best = the full graph
    from essentials_spark.algos.densest import densest_subgraph

    cyc = [(i, (i + 1) % 5) for i in range(5)]
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in cyc], "src long, dst long"
    )
    verts = spark.createDataFrame([(v,) for v in range(5)], "vid long")
    out = densest_subgraph(verts, edges, epsilon_num=0, epsilon_den=1).collect()
    assert {r["vid"] for r in out} == set(range(5))
    assert all((r["n_sub"], r["m_sub"]) == (5, 5) for r in out)


def test_bpe_encode_roundtrip(spark):
    from essentials_spark.text.bpe import bpe_encode, bpe_train

    corpus = spark.createDataFrame(
        [(0, "abab abab xy"), (1, "ab xy xy")], "doc_id long, text string"
    )
    merges = bpe_train(corpus, merges=3)
    # merges: (a,b) cnt5 -> (x,y) cnt3 -> (ab,ab) cnt2
    out = {r["doc_id"]: (r["n_tokens"], r["n_words"]) for r in bpe_encode(corpus, merges).collect()}
    # doc0: 'abab'->[abab] x2 (1 tok each), 'xy'->[xy] => 3 tokens, 3 words
    # doc1: 'ab'->[ab], 'xy' x2 => 3 tokens, 3 words
    assert out == {0: (3, 3), 1: (3, 3)}
    fresh = spark.createDataFrame([(9, "ababx yab q")], "doc_id long, text string")
    out2 = {r["doc_id"]: (r["n_tokens"], r["n_words"]) for r in bpe_encode(fresh, merges).collect()}
    # 'ababx' -> a b a b x -> ab ab x -> abab x (2); 'yab' -> y ab (2); 'q' (1)
    assert out2 == {9: (5, 3)}


def test_global_rank_ties_and_order(spark):
    from essentials_spark.ops.rank import global_rank

    df = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 50), (4, 10), (5, 90)], "doc_id long, score long"
    )
    got = {r["doc_id"]: r["rank"] for r in global_rank(df, "score", "doc_id").collect()}
    assert got == {2: 1, 5: 2, 1: 3, 3: 4, 4: 5}
    asc = {r["doc_id"]: r["rank"] for r in global_rank(df, "score", "doc_id", descending=False).collect()}
    assert asc == {4: 1, 1: 2, 3: 3, 2: 4, 5: 5}
