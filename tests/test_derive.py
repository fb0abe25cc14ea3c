"""Transcript generation, graph derivation, rehydration invariant."""

import numpy as np

from essentials_spark.graph.derive import assign_dense_ids, derive_graph
from essentials_spark.io.transcripts import rehydrate, synth_transcripts


def test_synth_transcripts_deterministic(spark):
    a = synth_transcripts(spark, n_convs=50, seed=42).orderBy("conv_id", "turn_idx").collect()
    b = synth_transcripts(spark, n_convs=50, seed=42).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    assert len(a) >= 50
    cols = {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert cols == set(synth_transcripts(spark, n_convs=2).columns)


def test_dense_ids_are_global_rank(spark):
    t = synth_transcripts(spark, n_convs=30)
    g = derive_graph(t)
    rows = g.vertices.orderBy("vid").collect()
    n = len(rows)
    assert [r["vid"] for r in rows] == list(range(n))
    # vid order == (kind, key) lexicographic order
    keys = [(r["kind"], r["key"]) for r in rows]
    assert keys == sorted(keys)


def test_dense_ids_stable_across_partitionings(spark):
    t = synth_transcripts(spark, n_convs=30)
    base = t.select("conv_id", "turn_idx").withColumnRenamed("conv_id", "k1")
    a = assign_dense_ids(base, ["k1", "turn_idx"], num_partitions=2).collect()
    b = assign_dense_ids(base.repartition(7), ["k1", "turn_idx"], num_partitions=5).collect()
    assert sorted((r["k1"], r["turn_idx"], r["vid"]) for r in a) == sorted(
        (r["k1"], r["turn_idx"], r["vid"]) for r in b
    )


def test_rehydration_text_equality(spark):
    """Per-turn text equality under (conv_id, turn_idx) ordering
    (BASELINE.json input_hint invariant)."""
    t = synth_transcripts(spark, n_convs=40, seed=42)
    g = derive_graph(t)
    source = t.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    rehydrated = rehydrate(g.vertices).collect()
    assert [tuple(r) for r in source] == [tuple(r) for r in rehydrated]


def test_edges_structure(spark):
    t = synth_transcripts(spark, n_convs=40, seed=42)
    g = derive_graph(t)
    edges = g.edges.collect()
    n_turns = t.count()
    n_convs = t.select("conv_id").distinct().count()
    n_tool_calls = t.filter("tool is not null").count()
    # adjacency edges = turns - convs; tool edges = tool calls
    assert len(edges) == (n_turns - n_convs) + n_tool_calls
    vids = {r["vid"] for r in g.vertices.collect()}
    assert all(e["src"] in vids and e["dst"] in vids for e in edges)


def test_graph_end_to_end_on_transcripts(spark):
    """All four algorithms on a transcript-derived graph vs oracles."""
    from essentials_spark.algos import connected_components, pagerank, triangle_count
    from tests.oracles import cc_oracle, pagerank_oracle, tc_oracle

    t = synth_transcripts(spark, n_convs=30, seed=42, max_turns=12)
    g = derive_graph(t)
    n = g.num_vertices()
    edges = [(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()]

    pr = pagerank(g)
    got_pr = np.array([r["rank"] for r in pr.orderBy("vid").collect()])
    assert np.allclose(got_pr, pagerank_oracle(n, edges), atol=1e-6)

    und = [(s, d) for s, d, _ in edges]
    cc = connected_components(g)
    got_cc = np.array([r["label"] for r in cc.orderBy("vid").collect()])
    assert np.array_equal(got_cc, cc_oracle(n, und))

    per_vertex, total = triangle_count(g)
    got_tc = np.array([r["tc"] for r in per_vertex.orderBy("vid").collect()])
    exp_tc, exp_total = tc_oracle(n, und)
    assert got_tc.tolist() == exp_tc.tolist()
    assert total == exp_total


def test_tool_cooccurrence_pmi_hand_computed(spark):
    # N=4 convs; x in 3, y in 2, both in 2 -> pmi = ln(2*4/(3*2)) =
    # ln(4/3) = 0.2876821 -> 287682; z never pairs
    from essentials_spark.io.transcripts import tool_cooccurrence_pmi

    t = spark.createDataFrame(
        [
            ("c1", "x"), ("c1", "y"), ("c2", "x"), ("c2", "y"),
            ("c3", "x"), ("c3", None), ("c4", "z"),
        ],
        "conv_id string, tool string",
    )
    rows = tool_cooccurrence_pmi(t).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.tool_a, r.tool_b, r.n_a, r.n_b, r.n_ab, r.pmi_e6) == ("x", "y", 3, 2, 2, 287682)
