"""Superstep runner: checkpoint/resume/metrics; ops primitives; skew."""

import numpy as np
from pyspark.sql import functions as F

from essentials_spark.algos import pagerank
from essentials_spark.engine.skew import salted_join
from essentials_spark.engine.superstep import SuperstepRunner
from essentials_spark.ops import advance, batch_execute, filter_frontier, neighbor_reduce, uniquify
from tests.conftest import graph_from_edges


def test_resume_after_convergence_is_identical(spark, tmp_path):
    g = graph_from_edges(spark, [(0, 1), (1, 2), (2, 0), (0, 3)], directed=True, n_vertices=4)
    ck = str(tmp_path / "ck")
    r1 = SuperstepRunner(spark, "pr", checkpoint_dir=ck, checkpoint_every=2)
    a = np.array([r["rank"] for r in pagerank(g, runner=r1).orderBy("vid").collect()])
    r2 = SuperstepRunner(spark, "pr", checkpoint_dir=ck, checkpoint_every=2)
    it, _df, meta = r2.latest()
    assert meta.get("converged") is True
    b = np.array([r["rank"] for r in pagerank(g, runner=r2).orderBy("vid").collect()])
    assert np.array_equal(a, b)


def test_resume_mid_run_reproduces(spark, tmp_path):
    import glob
    import shutil

    g = graph_from_edges(spark, [(i, (i * 3 + 1) % 30) for i in range(30)], n_vertices=30)
    ck = str(tmp_path / "ck2")
    r1 = SuperstepRunner(spark, "pr", checkpoint_dir=ck, checkpoint_every=3)
    a = np.array([r["rank"] for r in pagerank(g, runner=r1).orderBy("vid").collect()])
    # simulate a kill: drop everything after the first durable checkpoint
    iters = sorted(glob.glob(ck + "/pr/iter=*"))
    for d in iters[1:]:
        shutil.rmtree(d)
    r2 = SuperstepRunner(spark, "pr", checkpoint_dir=ck, checkpoint_every=3)
    b = np.array([r["rank"] for r in pagerank(g, runner=r2).orderBy("vid").collect()])
    assert np.allclose(a, b, atol=1e-12)


def test_cc_resume_mid_run_exact(spark, tmp_path):
    """Kill CC after its first durable checkpoint: the resumed run
    restores labels and a full-set frontier (a safe superset — extra
    hash-min messages are no-ops) and must converge to identical
    labels through the hybrid general/broadcast round shapes."""
    import glob
    import shutil

    from essentials_spark.algos import connected_components

    pairs = [(i, i + 1) for i in range(25)] + [(40 + i, 40 + (i * 7 + 1) % 20) for i in range(20)]
    g = graph_from_edges(spark, pairs, n_vertices=60)
    ck = str(tmp_path / "ckcc")
    r1 = SuperstepRunner(spark, "cc", checkpoint_dir=ck, checkpoint_every=2)
    a = {r["vid"]: r["label"] for r in connected_components(g, runner=r1).collect()}
    iters = sorted(glob.glob(ck + "/cc/iter=*"))
    assert len(iters) >= 2, "need a mid-run checkpoint to delete after"
    for d in iters[1:]:
        shutil.rmtree(d)
    r2 = SuperstepRunner(spark, "cc", checkpoint_dir=ck, checkpoint_every=2)
    b = {r["vid"]: r["label"] for r in connected_components(g, runner=r2).collect()}
    assert a == b


def test_metrics_written(spark, tmp_path):
    g = graph_from_edges(spark, [(0, 1), (1, 2)], n_vertices=3)
    ck = str(tmp_path / "ck3")
    runner = SuperstepRunner(spark, "pr", checkpoint_dir=ck, checkpoint_every=1, log_partition_lineage=True)
    pagerank(g, runner=runner, max_iter=3, tol=0.0)
    m = spark.read.parquet(ck + "/pr/metrics")
    rows = m.collect()
    assert {r["iteration"] for r in rows} >= {1, 2, 3}
    assert any(r["linf_err"] is not None for r in rows)


def test_salted_join_equals_plain(spark):
    edges = spark.range(2000).select(
        (F.col("id") % 7).alias("src"), (F.col("id") % 97).alias("dst"), F.lit(1.0).alias("weight")
    )
    fr = spark.range(5).select(F.col("id").alias("src"))
    plain = edges.join(fr, "src").groupBy("src").count().collect()
    salted = salted_join(fr, edges, "src", n_salts=4).groupBy("src").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_join_rejects_outer_modes(spark):
    # right/full would emit each unmatched small-side row n_salts times
    import pytest as _pytest

    edges = spark.range(10).select((F.col("id") % 3).alias("src"), F.col("id").alias("dst"))
    fr = spark.range(5).select(F.col("id").alias("src"))
    for how in ("right", "full", "outer", "full_outer"):
        with _pytest.raises(ValueError):
            salted_join(fr, edges, "src", how=how)


def test_runner_resume_refuses_fingerprint_mismatch(spark, tmp_path):
    runner = SuperstepRunner(spark, "fp", checkpoint_dir=str(tmp_path), fingerprint="graph-A")
    df = spark.range(5).select(F.col("id").alias("vid"))
    runner.materialize(df, 5, force=True)
    assert runner.latest() is not None
    # same checkpoint dir + name, different input: must refuse stale state
    other = SuperstepRunner(spark, "fp", checkpoint_dir=str(tmp_path), fingerprint="graph-B")
    assert other.latest() is None
    same = SuperstepRunner(spark, "fp", checkpoint_dir=str(tmp_path), fingerprint="graph-A")
    assert same.latest() is not None


def test_ops_primitives(spark):
    g = graph_from_edges(spark, [(0, 1), (0, 2), (1, 2)], n_vertices=3)
    frontier = spark.createDataFrame([(0,)], "vid long")
    out = advance(g.edges, frontier)
    assert {r["vid"] for r in out.collect()} == {1, 2}
    # whole-graph advance (io_type graph) == full edge scan
    assert advance(g.edges, None, output="edges").count() == g.edges.count()
    # filter + uniquify
    f = filter_frontier(out, F.col("vid") > 1)
    assert {r["vid"] for r in f.collect()} == {2}
    dup = out.unionByName(out)
    assert uniquify(dup, ["vid"]).count() == 2
    assert uniquify(dup, ["vid"], best_effort=True).count() >= 2  # per-partition dedup
    # neighbor_reduce: pull sum of neighbor values
    vals = spark.createDataFrame([(0, 1.0), (1, 10.0), (2, 100.0)], "vid long, value double")
    nr = {r["vid"]: r["value"] for r in neighbor_reduce(g.edges, vals, direction="pull").collect()}
    assert nr[0] == 110.0 and nr[1] == 101.0 and nr[2] == 11.0
    # batch: concurrent actions
    results, elapsed = batch_execute([lambda: g.edges.count(), lambda: vals.count()])
    assert results == [6, 3] and elapsed > 0


def test_reap_stale_tables_age_gated(spark):
    """Crashed-run orphans get reaped; anything younger than the age
    gate (i.e. any live concurrent run) is never touched."""
    import os
    import time
    from urllib.parse import urlparse

    from essentials_spark.engine.static_table import persist_bucketed, reap_stale_tables

    st = persist_bucketed(
        spark.range(10).selectExpr("id as src", "id as dst"), "src", name_hint="reap_live"
    )
    # simulate a crashed run's orphan: a warehouse dir with no catalog entry
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(wh, "es_reap_orphan_xxxx")
    os.makedirs(orphan, exist_ok=True)
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    try:
        dropped = reap_stale_tables(spark, max_age_hours=1.0)
        assert "es_reap_orphan_xxxx" in dropped
        assert not os.path.exists(orphan)
        assert spark.catalog.tableExists(st.table)  # young + live: untouched
    finally:
        st.drop()


def test_ktruss_resume_mid_cascade_exact(spark, tmp_path):
    """Kill the delta peel after its first durable support checkpoint:
    the resumed run restores (edges, supports) mid-cascade and must
    finish with the identical k-truss edge set."""
    import glob
    import shutil

    from essentials_spark.algos import ktruss

    # window-3 chain (k=5 cascades d3 -> d2 -> d1 over 3+ rounds,
    # emptying the chain) + a K6 clique that survives (support 4)
    chain = [(i, i + d) for i in range(30) for d in (1, 2, 3) if i + d < 30]
    k6 = [(100 + a, 100 + b) for a in range(6) for b in range(a + 1, 6)]
    g = graph_from_edges(spark, chain + k6, n_vertices=106)
    ck = str(tmp_path / "ckkt")
    r1 = SuperstepRunner(spark, "ktruss", checkpoint_dir=ck, checkpoint_every=1)
    a = {(r["src"], r["dst"]) for r in ktruss(g, 5, runner=r1).collect()}
    assert a == set(k6)
    iters = sorted(glob.glob(ck + "/ktruss/iter=*"))
    assert len(iters) >= 2, "need a mid-cascade checkpoint to delete after"
    for d in iters[1:]:
        shutil.rmtree(d)
    r2 = SuperstepRunner(spark, "ktruss", checkpoint_dir=ck, checkpoint_every=1)
    b = {(r["src"], r["dst"]) for r in ktruss(g, 5, runner=r2).collect()}
    assert a == b


def test_truss_decomposition_resume_exact(spark, tmp_path):
    """Kill the ascending decomposition mid-peel: the single-DataFrame
    state (settled trussness union active supports, k in meta) must
    restore and finish with identical per-edge trussness."""
    import glob
    import shutil

    from essentials_spark.algos import truss_decomposition

    chain = [(i, i + d) for i in range(30) for d in (1, 2, 3) if i + d < 30]
    k6 = [(100 + a, 100 + b) for a in range(6) for b in range(a + 1, 6)]
    g = graph_from_edges(spark, chain + k6, n_vertices=106)
    want = {
        **{tuple(e): 4 for e in chain},
        **{tuple(e): 6 for e in k6},
    }
    ck = str(tmp_path / "cktd")
    r1 = SuperstepRunner(spark, "truss", checkpoint_dir=ck, checkpoint_every=1)
    a = {(r["src"], r["dst"]): r["trussness"]
         for r in truss_decomposition(g, runner=r1).collect()}
    assert a == want
    iters = sorted(glob.glob(ck + "/truss/iter=*"))
    assert len(iters) >= 2, "need a mid-run checkpoint to delete after"
    for d in iters[1:]:
        shutil.rmtree(d)
    r2 = SuperstepRunner(spark, "truss", checkpoint_dir=ck, checkpoint_every=1)
    b = {(r["src"], r["dst"]): r["trussness"]
         for r in truss_decomposition(g, runner=r2).collect()}
    assert a == b


def test_cc_contract_resume_phases_exact(spark, tmp_path):
    """Contraction CC resumability (phase granularity): (a) a
    completed run restores its 'done' checkpoint verbatim; (b) a run
    killed after phase 1 (done checkpoint deleted) resumes from the
    contract checkpoint — phase 1 never re-runs — and reproduces
    identical labels."""
    import glob
    import shutil

    from essentials_spark.algos import connected_components, connected_components_contract

    pairs = [(i, i + 1) for i in range(25)] + [(40 + i, 40 + (i * 7 + 1) % 20) for i in range(20)]
    g = graph_from_edges(spark, pairs, n_vertices=60)
    expect = {r["vid"]: r["label"] for r in connected_components(g).collect()}

    ck = str(tmp_path / "ckcct")
    r1 = SuperstepRunner(spark, "cct", checkpoint_dir=ck)
    a = {r["vid"]: r["label"] for r in connected_components_contract(g, n_buckets=4, runner=r1).collect()}
    assert a == expect
    iters = sorted(glob.glob(ck + "/cct/iter=*"))
    assert [d.rsplit("=", 1)[1] for d in iters] == ["000001", "000002"]

    # (a) completed-run restore: phase 'done' returned verbatim
    r2 = SuperstepRunner(spark, "cct", checkpoint_dir=ck)
    b = {r["vid"]: r["label"] for r in connected_components_contract(g, n_buckets=4, runner=r2).collect()}
    assert b == expect
    assert any(m.get("resumed") == "done" for m in r2.metrics)

    # (b) death after phase 1: remove the done checkpoint, resume from
    # the contract one
    shutil.rmtree(iters[-1])
    r3 = SuperstepRunner(spark, "cct", checkpoint_dir=ck)
    c = {r["vid"]: r["label"] for r in connected_components_contract(g, n_buckets=4, runner=r3).collect()}
    assert c == expect
    assert any(m.get("resumed") == "contract" for m in r3.metrics)
    assert not any(m.get("phase") == "contract" and "mapping_rows" in m for m in r3.metrics)


def test_random_walks_resume_per_step_exact(spark, tmp_path):
    """Walk resumability: kill after step k (delete newer step dirs) —
    the resumed run restores the walk prefix from the durable
    frontiers and continues to identical trajectories."""
    import glob
    import shutil

    from essentials_spark.sampling import random_walks

    pairs = [(0, 1), (1, 2), (2, 3), (1, 3), (3, 4), (4, 0)]
    rows = []
    for u, v in pairs:
        rows.append((u, v))
        rows.append((v, u))
    edges = spark.createDataFrame(rows, "src long, dst long").dropDuplicates(["src", "dst"])
    start = spark.createDataFrame([(f"r{i}#0", i) for i in range(5)], "wid string, vid long")

    ck = str(tmp_path / "ckwalks")
    r1 = SuperstepRunner(spark, "walks", checkpoint_dir=ck)
    a = sorted(map(tuple, random_walks(edges, start, length=5, runner=r1).collect()))
    iters = sorted(glob.glob(ck + "/walks/iter=*"))
    assert len(iters) == 6  # steps 0..5 all durable
    for d in iters[3:]:
        shutil.rmtree(d)  # kill after step 2
    r2 = SuperstepRunner(spark, "walks", checkpoint_dir=ck)
    b = sorted(map(tuple, random_walks(edges, start, length=5, runner=r2).collect()))
    assert a == b
    assert any(m.get("resumed") for m in r2.metrics)

    # completed-run restore: every step read back, no stepping
    r3 = SuperstepRunner(spark, "walks", checkpoint_dir=ck)
    c = sorted(map(tuple, random_walks(edges, start, length=5, runner=r3).collect()))
    assert a == c


def test_node2vec_resume_per_step_exact(spark, tmp_path):
    import glob
    import shutil

    from essentials_spark.sampling import node2vec_walks

    pairs = [(0, 1), (1, 2), (2, 3), (1, 3), (3, 4), (4, 0)]
    rows = []
    for u, v in pairs:
        rows.append((u, v))
        rows.append((v, u))
    edges = spark.createDataFrame(rows, "src long, dst long").dropDuplicates(["src", "dst"])
    start = spark.createDataFrame([(f"q{i}#0", i) for i in range(5)], "wid string, vid long")

    ck = str(tmp_path / "ckn2v")
    r1 = SuperstepRunner(spark, "n2v", checkpoint_dir=ck)
    a = sorted(map(tuple, node2vec_walks(edges, start, length=4, runner=r1).collect()))
    iters = sorted(glob.glob(ck + "/n2v/iter=*"))
    assert len(iters) == 5
    for d in iters[2:]:
        shutil.rmtree(d)  # kill after step 1 (prev matters from here)
    r2 = SuperstepRunner(spark, "n2v", checkpoint_dir=ck)
    b = sorted(map(tuple, node2vec_walks(edges, start, length=4, runner=r2).collect()))
    assert a == b
    assert any(m.get("resumed") for m in r2.metrics)


def test_cc_contract_resume_stitch_subrunner_exact(spark, tmp_path):
    """single_solve_max=0 forces the stitch phase through the inner
    dataframe connected_components — which must run on a DEDICATED
    sub-runner: inheriting the contraction's runner made the inner CC
    restore the (a,b,kind) contract table as a label state
    (AnalysisException) and shadow the contraction's phase markers.
    Covers full run, phase-1 resume, and completed-run restore in
    exactly the at-scale configuration the feature targets."""
    import glob
    import shutil

    from essentials_spark.algos import connected_components, connected_components_contract

    pairs = [(i, i + 1) for i in range(25)] + [(40 + i, 40 + (i * 7 + 1) % 20) for i in range(20)]
    g = graph_from_edges(spark, pairs, n_vertices=60)
    expect = {r["vid"]: r["label"] for r in connected_components(g).collect()}

    ck = str(tmp_path / "ckstitch")
    r1 = SuperstepRunner(spark, "ccts", checkpoint_dir=ck)
    a = {
        r["vid"]: r["label"]
        for r in connected_components_contract(g, n_buckets=4, runner=r1, single_solve_max=0).collect()
    }
    assert a == expect
    iters = sorted(glob.glob(ck + "/ccts/iter=*"))
    # contraction phase markers intact: exactly iter 1 (contract) and 2
    # (done) — the inner CC's higher converged iterations must land
    # under the sub-runner's namespace, not here
    assert [d.rsplit("=", 1)[1] for d in iters] == ["000001", "000002"]

    # completed-run restore
    r2 = SuperstepRunner(spark, "ccts", checkpoint_dir=ck)
    b = {
        r["vid"]: r["label"]
        for r in connected_components_contract(g, n_buckets=4, runner=r2, single_solve_max=0).collect()
    }
    assert b == expect
    assert any(m.get("resumed") == "done" for m in r2.metrics)

    # death after phase 1: remove 'done', resume through the stitch
    # (the first checkpointed pass through this branch — the inner CC
    # must not pick up the contract table via a shared fingerprint)
    shutil.rmtree(iters[-1])
    r3 = SuperstepRunner(spark, "ccts", checkpoint_dir=ck)
    c = {
        r["vid"]: r["label"]
        for r in connected_components_contract(g, n_buckets=4, runner=r3, single_solve_max=0).collect()
    }
    assert c == expect
    assert any(m.get("resumed") == "contract" for m in r3.metrics)


def test_walk_resume_refuses_cross_graph_prefix(spark, tmp_path):
    """A reused checkpoint_dir can hold a stale high step from graph A
    under overwritten low steps from graph B. The resume prefix loop
    must validate EVERY step's fingerprint — latest()-only validation
    silently splices graph B's frontiers into graph A's corpus."""
    from essentials_spark.sampling import random_walks

    def sym(pairs):
        rows = []
        for u, v in pairs:
            rows.append((u, v))
            rows.append((v, u))
        return spark.createDataFrame(rows, "src long, dst long").dropDuplicates(["src", "dst"])

    edges_a = sym([(0, 1), (1, 2), (2, 3), (1, 3), (3, 4), (4, 0)])
    edges_b = sym([(0, 4), (4, 2), (2, 1), (1, 0), (3, 0)])
    start = spark.createDataFrame([(f"x{i}#0", i) for i in range(5)], "wid string, vid long")

    ck = str(tmp_path / "ckcross")
    r1 = SuperstepRunner(spark, "wx", checkpoint_dir=ck)
    a = sorted(map(tuple, random_walks(edges_a, start, length=4, runner=r1).collect()))

    # graph B, same dir/name, shorter: refuses A's checkpoints (latest
    # fingerprint mismatch), runs fresh, OVERWRITES steps 0..2; A's
    # steps 3..4 survive with A's fingerprint
    r2 = SuperstepRunner(spark, "wx", checkpoint_dir=ck)
    random_walks(edges_b, start, length=2, runner=r2).collect()

    # graph A rerun: latest()=step 4 matches A's fingerprint, but the
    # prefix is B's — must fall back to a fresh start and still
    # reproduce A's corpus exactly
    r3 = SuperstepRunner(spark, "wx", checkpoint_dir=ck)
    c = sorted(map(tuple, random_walks(edges_a, start, length=4, runner=r3).collect()))
    assert c == a
    assert not any(m.get("resumed") for m in r3.metrics)


def test_random_walks_sink_streams_per_step_and_resumes(spark, tmp_path):
    """sink_path streams each step's (wid, vid) partition as soon as it
    materializes: a killed run leaves a READABLE partial corpus (the
    step prefix), and the resumed run completes only the missing steps
    — existing _SUCCESS step dirs are never rewritten."""
    import glob
    import os
    import shutil

    from essentials_spark.sampling import random_walks

    pairs = [(0, 1), (1, 2), (2, 3), (1, 3), (3, 4), (4, 0)]
    rows = []
    for u, v in pairs:
        rows.append((u, v))
        rows.append((v, u))
    edges = spark.createDataFrame(rows, "src long, dst long").dropDuplicates(["src", "dst"])
    start = spark.createDataFrame([(f"s{i}#0", i) for i in range(5)], "wid string, vid long")

    ck = str(tmp_path / "ckws")
    sink = str(tmp_path / "corpus")
    r1 = SuperstepRunner(spark, "ws", checkpoint_dir=ck)
    full = sorted(map(tuple, random_walks(edges, start, length=5, runner=r1, sink_path=sink).collect()))
    assert {int(d.rsplit("=", 1)[1]) for d in glob.glob(sink + "/step=*")} == set(range(6))

    # kill after step 2: drop newer checkpoints AND newer sink steps
    for d in sorted(glob.glob(ck + "/ws/iter=*"))[3:]:
        shutil.rmtree(d)
    for d in sorted(glob.glob(sink + "/step=*"))[3:]:
        shutil.rmtree(d)
    # the partial corpus is readable mid-run and is exactly the prefix
    partial = sorted(
        map(tuple, spark.read.option("basePath", sink).parquet(sink + "/step=*")
            .select("wid", "step", "vid").collect())
    )
    assert partial == [t for t in full if t[1] <= 2]

    mtimes = {d: os.path.getmtime(os.path.join(d, "_SUCCESS")) for d in glob.glob(sink + "/step=*")}
    r2 = SuperstepRunner(spark, "ws", checkpoint_dir=ck)
    again = sorted(map(tuple, random_walks(edges, start, length=5, runner=r2, sink_path=sink).collect()))
    assert again == full
    # surviving step dirs were not rewritten
    for d, t in mtimes.items():
        assert os.path.getmtime(os.path.join(d, "_SUCCESS")) == t
