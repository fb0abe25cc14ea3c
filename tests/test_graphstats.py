"""graphstats (modularity, assortativity) + deterministic stratified sampling."""

import pytest
from pyspark.sql import functions as F

from essentials_spark.algos.graphstats import degree_assortativity, modularity
from essentials_spark.ops.sample import PPM, stratified_sample


def _sym(spark, pairs):
    rows = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_modularity_two_cliques_bridge(spark):
    # two triangles joined by one bridge edge; communities = the triangles.
    # 2m = 14; A_0 = A_1 = 6; D_0 = D_1 = 7 → q_num = 2·(6·14 − 49) = 70
    # Q = 70/196 = 0.357142… → q_ppm = 357143
    e = _sym(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "vid long, label long"
    )
    row = modularity(e, labels).collect()[0]
    assert (row.n_communities, row.two_m, row.q_num, row.q_ppm) == (2, 14, 70, 357143)


def test_modularity_single_community_zero(spark):
    # everything in one community: A = 2m, D = 2m → q_num = (2m)² − (2m)² = 0
    e = _sym(spark, [(0, 1), (1, 2)])
    labels = spark.createDataFrame([(i, 0) for i in range(3)], "vid long, label long")
    row = modularity(e, labels).collect()[0]
    assert (row.q_num, row.q_ppm) == (0, 0)


def test_assortativity_star_is_negative(spark):
    # star K_{1,3}: every directed row pairs degree 3 with degree 1 → r = −1
    e = _sym(spark, [(0, 1), (0, 2), (0, 3)])
    row = degree_assortativity(e).collect()[0]
    assert row.m_rows == 6
    assert row.r_e6 == -1_000_000


def test_assortativity_regular_graph_zero_denominator(spark):
    # 4-cycle: all degrees 2, zero variance → guarded r = 0
    e = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    row = degree_assortativity(e).collect()[0]
    assert (row.m_rows, row.r_e6) == (8, 0)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(3000)], "doc_id long, lang string"
    ).cache()


def test_stratified_rate_and_determinism(spark, docs):
    kept = stratified_sample(docs, 200_000, key_col="doc_id")
    n1, n2 = kept.count(), kept.count()
    assert n1 == n2  # content-hash selection: no RNG, rerun-stable
    assert 0.15 * 3000 < n1 < 0.25 * 3000  # ~20% ±noise

    # repartitioning must not change the selected set
    ids_a = {r.doc_id for r in kept.collect()}
    ids_b = {
        r.doc_id
        for r in stratified_sample(docs.repartition(7), 200_000, key_col="doc_id").collect()
    }
    assert ids_a == ids_b


def test_stratified_monotone_and_grouped(spark, docs):
    # raising a stratum's rate only ADDS rows (reservoir property),
    # and never perturbs the other stratum's selection
    low = stratified_sample(docs, 100_000, group_col="lang", key_col="doc_id",
                            group_rates_ppm={"en": 100_000})
    high = stratified_sample(docs, 100_000, group_col="lang", key_col="doc_id",
                             group_rates_ppm={"en": 500_000})
    low_ids = {(r.lang, r.doc_id) for r in low.collect()}
    high_ids = {(r.lang, r.doc_id) for r in high.collect()}
    assert low_ids <= high_ids
    assert {i for g, i in low_ids if g == "de"} == {i for g, i in high_ids if g == "de"}


def test_stratified_full_rate_keeps_all(spark, docs):
    assert stratified_sample(docs, PPM, key_col="doc_id").count() == 3000


# ---------------------------------------------------------------------------
# Louvain phase-1 move rounds (algos/louvain.py)
# ---------------------------------------------------------------------------


def _graph(spark, pairs, n):
    from essentials_spark.graph.derive import Graph

    verts = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    return Graph(vertices=verts, edges=_sym(spark, pairs))


TRI_BRIDGE = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def test_louvain_sync_round1_hand_computed(spark):
    # two triangles + bridge, 2m = 14, degrees (2,2,3,3,2,2).
    # v0: ->c1 score 14-2*2=10, ->c2 14-2*3=8, stay 0  -> 1
    # v2: ->c0 8, ->c1 8 (tie, min label), ->c3 5      -> 0
    # v4: ->c3 8, ->c5 10                              -> 5
    from essentials_spark.algos.louvain import louvain

    g = _graph(spark, TRI_BRIDGE, 6)
    got = {r.vid: r.label for r in louvain(g, rounds=1).collect()}
    assert got == {0: 1, 1: 0, 2: 0, 3: 4, 4: 5, 5: 4}


def test_louvain_semi_converges_to_triangles(spark):
    # semi half-schedule (par = vid % 2): after 4 rounds the two
    # triangles are the communities and round 4 is a fixpoint
    from essentials_spark.algos.louvain import louvain

    g = _graph(spark, TRI_BRIDGE, 6)
    got4 = {r.vid: r.label for r in louvain(g, rounds=4, mode="semi").collect()}
    assert got4 == {0: 1, 1: 1, 2: 1, 3: 5, 4: 5, 5: 5}
    got6 = {r.vid: r.label for r in louvain(g, rounds=6, mode="semi").collect()}
    assert got6 == got4  # fixpoint


def test_louvain_sync_two_cycles_on_pendant_edge(spark):
    # single edge: sync swaps labels forever (the LP pathology);
    # semi merges both endpoints into one community and stays there
    from essentials_spark.algos.louvain import louvain

    g = _graph(spark, [(0, 1)], 2)
    sync2 = {r.vid: r.label for r in louvain(g, rounds=2).collect()}
    assert sync2 == {0: 0, 1: 1}  # swapped twice = back to start
    semi2 = {r.vid: r.label for r in louvain(g, rounds=2, mode="semi").collect()}
    assert semi2 == {0: 1, 1: 1}
    semi3 = {r.vid: r.label for r in louvain(g, rounds=3, mode="semi").collect()}
    assert semi3 == semi2


def test_louvain_coarsen_conserves_mass(spark):
    # phase-2 invariant: Σw and Σk are conserved level-to-level
    from essentials_spark.algos.louvain import coarsen, louvain

    g = _graph(spark, TRI_BRIDGE, 6)
    labels = louvain(g, rounds=4, mode="semi")
    cg = coarsen(g, labels)
    assert cg.edges.agg(F.sum("w")).collect()[0][0] == 14  # == |sym rows|
    # self-loops carry the internal mass: triangles have 6 directed rows
    loops = {r.src: r.w for r in cg.edges.filter("src = dst").collect()}
    assert loops == {1: 6, 5: 6}


def test_louvain_multilevel_merges_ring_of_triangles(spark):
    # ring of 20 triangles: phase-1 finds the 20 triangles; at the
    # coarse level merging ADJACENT triangles raises modularity
    # (2m*e - k*D = 160 - 64 > 0: the classic resolution limit), so
    # the 2-level run must coarsen further. 1-level: 20 communities;
    # 2-level: strictly fewer, with strictly higher modularity.
    from essentials_spark.algos.graphstats import modularity
    from essentials_spark.algos.louvain import louvain_multilevel

    ncl = 20
    pairs = []
    for i in range(ncl):
        b = 3 * i
        pairs += [(b, b + 1), (b + 1, b + 2), (b, b + 2)]
        pairs.append((b + 2, (b + 3) % (3 * ncl)))
    g = _graph(spark, pairs, 3 * ncl)

    # the ring of coarse vertices needs a proper 2-coloring for the
    # half-schedule (triangle index parity); arbitrary parity lets
    # coarse labels chase each other (covered by the guard test below)
    ring_par = lambda verts: verts.select(  # noqa: E731
        "vid", ((F.col("vid") / 3).cast("long") % 2).cast("int").alias("par")
    )
    one = louvain_multilevel(g, level_rounds=(4,), mode="semi")
    two = louvain_multilevel(g, level_rounds=(4, 4), mode="semi", coarse_parity=ring_par)
    n1 = one.select("label").distinct().count()
    n2 = two.select("label").distinct().count()
    assert n1 == ncl  # phase-1 fixpoint = the triangles
    assert n2 < n1
    q1 = modularity(g.edges, one).collect()[0].q_ppm
    q2 = modularity(g.edges, two).collect()[0].q_ppm
    assert q2 > q1
    # composition covers every vertex exactly once
    assert two.count() == 3 * ncl and two.select("vid").distinct().count() == 3 * ncl

    # guard: with the DEFAULT (arbitrary) coarse parity the coarse
    # level fragments (measured q_ppm 690000 < 700000); guarded
    # multilevel must fall back to the phase-1 assignment exactly
    guarded = louvain_multilevel(g, level_rounds=(4, 4), mode="semi", guard=True)
    qg = modularity(g.edges, guarded).collect()[0].q_ppm
    assert qg >= q1


def test_louvain_color_schedule_merges_without_tuned_parity(spark):
    # color-scheduled moves (proper coloring -> adjacent vertices never
    # move together -> no label chasing) must find the coarse merge on
    # the ring of triangles WITHOUT a hand-tuned parity, where the
    # default md5/vid parity fragments (see guard test above)
    from essentials_spark.algos.graphstats import modularity
    from essentials_spark.algos.louvain import louvain_multilevel

    ncl = 20
    pairs = []
    for i in range(ncl):
        b = 3 * i
        pairs += [(b, b + 1), (b + 1, b + 2), (b, b + 2)]
        pairs.append((b + 2, (b + 3) % (3 * ncl)))
    g = _graph(spark, pairs, 3 * ncl)

    one = louvain_multilevel(g, level_rounds=(2,), mode="color")
    two = louvain_multilevel(g, level_rounds=(2, 2), mode="color")
    q1 = modularity(g.edges, one).collect()[0].q_ppm
    q2 = modularity(g.edges, two).collect()[0].q_ppm
    n1 = one.select("label").distinct().count()
    n2 = two.select("label").distinct().count()
    assert n1 == ncl and n2 < n1
    assert q2 > q1


# ---------------------------------------------------------------------------
# Budgeted mixture sampling (ops/sample.mixture_sample)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tok_docs(spark):
    # 3 groups: a = 10 docs x 100 tokens, b = 10 x 50, c = 5 x 20
    rows = (
        [(i, "a", 100) for i in range(10)]
        + [(i + 10, "b", 50) for i in range(10)]
        + [(i + 20, "c", 20) for i in range(5)]
    )
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long").cache()


def test_mixture_rates_and_zero_share(spark, tok_docs):
    from essentials_spark.ops.sample import mixture_sample

    # budget 600, shares a=50% b=50%: t_a=300 -> 300e6//1000 = 300000;
    # t_b=300 -> 300e6//500 = 600000; c has no share -> dropped
    kept = mixture_sample(tok_docs, 600, {"a": 500_000, "b": 500_000})
    rates = {r.lang: r.rate_ppm for r in kept.select("lang", "rate_ppm").distinct().collect()}
    assert rates.get("a", None) in (None, 300_000)  # group may sample to zero rows
    assert set(rates) <= {"a", "b"}
    got = kept.groupBy("lang").count().collect()
    assert all(r.lang != "c" for r in got)
    # every kept bucket respects its rate
    assert kept.filter(F.col("bucket") >= F.col("rate_ppm")).count() == 0


def test_mixture_clamp_keeps_whole_group(spark, tok_docs):
    from essentials_spark.ops.sample import mixture_sample

    # budget 4000, c share 50% -> target 2000 tokens >> c's 100 -> clamp
    kept = mixture_sample(tok_docs, 4000, {"c": 500_000, "a": 500_000})
    assert kept.filter("lang = 'c'").count() == 5  # rate clamped to 1e6
    rates = {r.lang: r.rate_ppm for r in kept.select("lang", "rate_ppm").distinct().collect()}
    assert rates["c"] == 1_000_000


def test_mixture_budget_monotone(spark, tok_docs):
    from essentials_spark.ops.sample import mixture_sample

    t = {"a": 400_000, "b": 400_000, "c": 200_000}
    lo = {(r.lang, r.doc_id) for r in mixture_sample(tok_docs, 500, t).collect()}
    hi = {(r.lang, r.doc_id) for r in mixture_sample(tok_docs, 2000, t).collect()}
    assert lo <= hi  # raising the budget only ADDS rows


def test_pq_codes_shape_and_determinism(spark):
    import pytest as _pytest

    from essentials_spark.ann.kmeans import pq_codes

    rows = [(i, [float((i * 7 + j * 3) % 13) for j in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = pq_codes(emb, m=2, k=4, iters=2)
    got = codes.collect()
    assert len(got) == 40 and set(codes.columns) == {"vec_id", "code0", "code1"}
    assert all(0 <= r.code0 < 4 and 0 <= r.code1 < 4 for r in got)
    # rerun-stable (deterministic seeds, grid-rounded trajectories)
    again = {(r.vec_id, r.code0, r.code1) for r in pq_codes(emb, m=2, k=4, iters=2).collect()}
    assert {(r.vec_id, r.code0, r.code1) for r in got} == again
    with _pytest.raises(ValueError):
        pq_codes(emb, m=3)  # 8 % 3 != 0


def test_pq_adc_distances_match_reconstruction(spark):
    # ADC d2_u must equal the exact integer distance between the
    # µ-quantized query slices and the coded vector's centroid slices
    from essentials_spark.ann.kmeans import (
        _round_half_away,
        kmeans_assign,
        pq_adc_topk,
        pq_train,
    )

    rows = [(i, [float((i * 5 + j * 7) % 11) / 3.0 for j in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m, k, iters, sub = 2, 4, 2, 4
    out = pq_adc_topk(emb, m=m, k=k, iters=iters, topk=30, n_queries=2).collect()

    books = pq_train(emb, m=m, k=k, iters=iters)
    codes = {}
    for j in range(m):
        subv = emb.selectExpr("vec_id", f"slice(embedding, {j * sub + 1}, {sub}) AS embedding")
        for r in kmeans_assign(subv, books[j]).collect():
            codes.setdefault(r.vec_id, {})[j] = r.cluster
    vecs = {i: v for i, v in rows}
    for r in out:
        q = vecs[r.query_id]
        want = 0
        for j in range(m):
            c = books[j][codes[r.neighbor_id][j]]
            want += sum(
                (_round_half_away(q[j * sub + t]) - _round_half_away(c[t])) ** 2
                for t in range(sub)
            )
        assert r.d2_u == want, (r.query_id, r.neighbor_id)
    # ranks are dense 1..30 per query, ordered by (d2_u, neighbor_id)
    for qid in (0, 1):
        rs = sorted((r for r in out if r.query_id == qid), key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, 31))
        assert all(
            (a.d2_u, a.neighbor_id) < (b.d2_u, b.neighbor_id) for a, b in zip(rs, rs[1:])
        )


def test_louvain_mis_schedule_merges_and_is_independent(spark):
    # per-round hash-local-minima movers are pairwise non-adjacent, so
    # MIS mode has color mode's chase-freedom: the ring of triangles
    # must coarsen with HIGHER modularity at 2 levels, no tuned parity
    from essentials_spark.algos.graphstats import modularity
    from essentials_spark.algos.louvain import _mis_movers, louvain_multilevel

    ncl = 20
    pairs = []
    for i in range(ncl):
        b = 3 * i
        pairs += [(b, b + 1), (b + 1, b + 2), (b, b + 2)]
        pairs.append((b + 2, (b + 3) % (3 * ncl)))
    g = _graph(spark, pairs, 3 * ncl)

    # movers of any round form an independent set
    hv = g.vertices.select("vid", F.xxhash64("vid", F.lit(0)).alias("h"))
    mv = _mis_movers(g.edges, hv)
    both = g.edges.join(mv.withColumnRenamed("vid", "src"), "src").join(
        mv.withColumnRenamed("vid", "dst"), "dst"
    )
    assert both.count() == 0

    # measured deterministic outcomes (xxhash64 schedule): 10 rounds
    # land near the triangle partition (21 communities, one early
    # cross-triangle merge), and the coarse level merges to 9 with a
    # large modularity gain — 0.676 -> 0.7725 (ideal pairing = 0.775)
    one = louvain_multilevel(g, level_rounds=(10,), mode="mis")
    two = louvain_multilevel(g, level_rounds=(10, 10), mode="mis")
    q1 = modularity(g.edges, one).collect()[0].q_ppm
    q2 = modularity(g.edges, two).collect()[0].q_ppm
    n1 = one.select("label").distinct().count()
    n2 = two.select("label").distinct().count()
    assert (n1, q1) == (21, 676172)
    assert (n2, q2) == (9, 772500)


def test_louvain_warm_start_fixpoint_and_incremental(spark):
    from essentials_spark.algos.louvain import louvain
    from essentials_spark.graph.derive import Graph

    g = _graph(spark, TRI_BRIDGE, 6)
    conv = louvain(g, rounds=4, mode="semi")  # the two triangles
    # warm-starting a converged assignment on the SAME graph is a no-op
    again = louvain(g, rounds=2, mode="semi", init_labels=conv)
    assert {(r.vid, r.label) for r in again.collect()} == {
        (r.vid, r.label) for r in conv.collect()
    }
    # incremental arrival: solve triangle 1 alone, then warm-start on
    # the full graph — the new triangle forms without disturbing the old
    e_a = _sym(spark, [(0, 1), (1, 2), (0, 2)])
    l_a = louvain(Graph(vertices=g.vertices, edges=e_a), rounds=4, mode="semi")
    l_b = louvain(g, rounds=4, mode="semi", init_labels=l_a)
    got = {r.vid: r.label for r in l_b.collect()}
    assert len({got[0], got[1], got[2]}) == 1  # old community intact
    assert len({got[3], got[4], got[5]}) == 1  # new community formed
    assert got[0] != got[3]


def test_louvain_checkpoint_resume(spark, tmp_path):
    # the engine resume contract: mid-run restore continues from the
    # last durable round and lands on the identical assignment; a
    # completed run restores its final state verbatim
    import shutil

    from essentials_spark.algos.louvain import louvain
    from essentials_spark.engine.superstep import SuperstepRunner

    g = _graph(spark, TRI_BRIDGE, 6)
    ck = str(tmp_path / "lv")
    fresh = {
        (r.vid, r.label)
        for r in louvain(g, rounds=4, mode="semi").collect()
    }

    r1 = SuperstepRunner(spark, "lv", checkpoint_dir=ck, checkpoint_every=2)
    a = {(r.vid, r.label) for r in louvain(g, rounds=4, mode="semi", runner=r1).collect()}
    assert a == fresh
    # wipe the final round's checkpoint: resume recomputes 3-4 from 2
    shutil.rmtree(f"{ck}/lv/iter=000004")
    shutil.rmtree(f"{ck}/lv/iter=000003", ignore_errors=True)
    r2 = SuperstepRunner(spark, "lv", checkpoint_dir=ck, checkpoint_every=2)
    b = {(r.vid, r.label) for r in louvain(g, rounds=4, mode="semi", runner=r2).collect()}
    assert b == fresh
    # completed-run restore: a third runner returns the stored final
    r3 = SuperstepRunner(spark, "lv", checkpoint_dir=ck, checkpoint_every=2)
    c = {(r.vid, r.label) for r in louvain(g, rounds=4, mode="semi", runner=r3).collect()}
    assert c == fresh
    # different graph, same dir: fingerprint mismatch -> fresh start
    g2 = _graph(spark, [(0, 1)], 2)
    r4 = SuperstepRunner(spark, "lv", checkpoint_dir=ck, checkpoint_every=2)
    d = {(r.vid, r.label) for r in louvain(g2, rounds=2, mode="semi", runner=r4).collect()}
    assert d == {(0, 1), (1, 1)}


def test_importance_and_fixed_k_sampling(spark, docs):
    from essentials_spark.ops.sample import importance_sample, sample_fixed_k

    scored = docs.withColumn("rate_ppm", (F.col("doc_id") % 2) * 1_000_000)
    kept = importance_sample(scored, "rate_ppm")
    # rate 0 rows never kept; rate 1e6 rows always kept
    assert kept.filter("rate_ppm = 0").count() == 0
    assert kept.count() == docs.filter("doc_id % 2 = 1").count()

    s1 = {r.doc_id for r in sample_fixed_k(docs, 100).collect()}
    s2 = {r.doc_id for r in sample_fixed_k(docs.repartition(17), 100).collect()}
    assert len(s1) == 100 and s1 == s2  # layout-independent
    # bottom-k reservoir: the 100-sample contains the 50-sample
    s3 = {r.doc_id for r in sample_fixed_k(docs, 50).collect()}
    assert s3 <= s1


def test_degree_gini_hand_computed(spark):
    # out-degrees [1,1,2,4]: sorted Σ i*d = 25, num = 50 - 5*8 = 10,
    # den = 32 -> G = 0.3125
    from essentials_spark.algos.graphstats import degree_gini

    e = spark.createDataFrame(
        [(0, 9)] + [(1, 9)] + [(2, 9), (2, 8)] + [(3, 9), (3, 8), (3, 7), (3, 6)],
        "src long, dst long",
    )
    r = degree_gini(e).collect()[0]
    assert (r.n, r.degree_sum, r.gini_num, r.gini_den, r.gini_ppm) == (4, 8, 10, 32, 312500)
    # regular graph: G = 0
    reg = spark.createDataFrame([(i, (i + 1) % 4) for i in range(4)], "src long, dst long")
    assert degree_gini(reg).collect()[0].gini_ppm == 0
