"""Streaming ingestion: incremental edges == batch derivation; resume."""

import os

import pytest

from essentials_spark.io.transcripts import synth_transcripts
from essentials_spark.streaming.ingest import run_edges_to_parquet, stream_transcripts, windowed_tool_counts


def test_incremental_edges_match_batch(spark, tmp_path):
    from essentials_spark.graph.keyed import keyed_graph_from_transcripts

    t = synth_transcripts(spark, n_convs=40, seed=42)
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    # two arrival waves: first 25 convs, then the rest
    t.filter("conv_id < 'conv00000025'").write.parquet(in_dir)
    run_edges_to_parquet(spark, in_dir, out_dir, ckpt)
    t.filter("conv_id >= 'conv00000025'").write.mode("append").parquet(in_dir)
    run_edges_to_parquet(spark, in_dir, out_dir, ckpt)  # resumes from checkpoint

    streamed = {
        (r["src_key"], r["dst_key"]) for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["src_key"], r["dst_key"]) for r in keyed_graph_from_transcripts(t).key_edges.collect()
    }
    assert streamed == batch
    assert os.path.isdir(ckpt)


def test_windowed_tool_counts(spark, tmp_path):
    t = synth_transcripts(spark, n_convs=40, seed=42)
    in_dir = str(tmp_path / "in2")
    t.write.parquet(in_dir)
    stream = stream_transcripts(spark, in_dir)
    agg = windowed_tool_counts(stream, window="1 hour", watermark="2 hours")
    # complete mode: append would hold back windows the watermark has
    # not passed yet (bounded input never advances past the tail)
    q = (
        agg.writeStream.format("memory")
        .queryName("toolcounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from toolcounts").collect()
    total_stream = sum(r["n_calls"] for r in rows)
    total_batch = t.filter("tool is not null").count()
    assert total_stream == total_batch
    assert all(r["n_calls"] > 0 for r in rows)


def test_conversation_sessions_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: a conversation's summary
    row emits once the watermark (driven by later arrivals) passes its
    last turn + gap; its state is then gone."""
    import datetime as dt

    from essentials_spark.streaming.ingest import conversation_sessions

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def rows(conv, ts_list, tool_every=2):
        return [
            (conv, i, "user" if i % 2 == 0 else "assistant", f"text {i}",
             "search" if i % tool_every == 0 else None, ts)
            for i, ts in enumerate(ts_list)
        ]

    in_dir, out_dir, ckpt = (
        str(tmp_path / "sess_in"), str(tmp_path / "sess_out"), str(tmp_path / "sess_ck")
    )
    ddl = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    # wave 1: conv A, 4 turns within 2 minutes
    wave1 = rows("A", [t0 + dt.timedelta(seconds=30 * i) for i in range(4)])
    spark.createDataFrame(wave1, ddl).write.parquet(in_dir)

    def run_pass():
        from essentials_spark.streaming.ingest import stream_transcripts

        q = (
            conversation_sessions(stream_transcripts(spark, in_dir), gap_minutes=10)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_pass()
    # wave 2: conv B two hours later -> watermark passes A.last + 10min
    wave2 = rows("B", [t0 + dt.timedelta(hours=2, seconds=30 * i) for i in range(3)])
    spark.createDataFrame(wave2, ddl).write.mode("append").parquet(in_dir)
    run_pass()
    # wave 3: conv C later still, forces another batch so A's timeout fires
    wave3 = rows("C", [t0 + dt.timedelta(hours=4)])
    spark.createDataFrame(wave3, ddl).write.mode("append").parquet(in_dir)
    run_pass()

    got = {r["conv_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert "A" in got, f"A session not emitted: {got}"
    a = got["A"]
    assert a["n_turns"] == 4 and a["n_tool_calls"] == 2
    assert a["duration_s"] == 90.0
    assert "C" not in got  # tail session still open (state held, not emitted)


def test_graph_maintenance_stream_matches_batch(spark, tmp_path):
    # two arrival waves through the real stream path (availableNow +
    # checkpoint); maintained CC labels, TC corners, and MSF must equal
    # the batch algorithms on everything seen — and replaying a batch
    # (at-least-once delivery) must be a no-op on all three states
    from pyspark.sql import functions as F

    from essentials_spark.algos import connected_components, mst, triangle_count
    from essentials_spark.graph.derive import Graph
    from essentials_spark.graph.keyed import keyed_graph_from_transcripts
    from essentials_spark.streaming import GraphMaintenance

    t = synth_transcripts(spark, n_convs=40, seed=9)
    in_dir, ckpt = str(tmp_path / "gm_in"), str(tmp_path / "gm_ck")
    gm = GraphMaintenance(spark)
    t.filter("conv_id < 'conv00000020'").write.parquet(in_dir)
    gm.run_available(in_dir, ckpt)
    t.filter("conv_id >= 'conv00000020'").write.mode("append").parquet(in_dir)
    gm.run_available(in_dir, ckpt)
    assert gm.n_batches == 2

    # third wave folded directly: conv-membership edges (conv|x -> turn)
    # close triangles with the adjacency chain, so the TC state is
    # exercised non-trivially (the pure chain+tool-star graph has none)
    from essentials_spark.graph.keyed import _skey_turn

    member = t.select(
        F.concat(F.lit("conv|"), F.col("conv_id")).alias("src_key"),
        _skey_turn(F.col("conv_id"), F.col("turn_idx")).alias("dst_key"),
    )
    gm.fold(member)

    # batch truth on the same hashed-id graph
    ke = keyed_graph_from_transcripts(t).key_edges.unionByName(member)
    he = ke.select(
        F.xxhash64("src_key").alias("src"), F.xxhash64("dst_key").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    hv = (
        he.select(F.col("src").alias("vid"))
        .union(he.select(F.col("dst").alias("vid")))
        .distinct()
    )
    g = Graph(vertices=hv, edges=he)

    cc = connected_components(g)
    assert {(r["vid"], r["label"]) for r in cc.collect()} == {
        (r["vid"], r["label"]) for r in gm.labels.collect()
    }

    pv, _tot = triangle_count(g)
    want_tc = {r["vid"]: r["tc"] for r in pv.filter("tc > 0").collect()}
    got_tc = {r["vid"]: r["tc"] for r in gm.tc_per_vertex.filter("tc > 0").collect()}
    assert want_tc == got_tc
    assert want_tc  # membership edges DID close triangles

    wexpr = (F.pmod(F.xxhash64("src", "dst"), F.lit(1000)) / 100.0 + 1.0)
    gw = Graph(vertices=hv, edges=he.select("src", "dst", wexpr.alias("weight")))
    chosen, total = mst(gw)
    assert gm.msf_total == pytest.approx(total)
    assert gm.forest.count() == chosen.count()

    # idempotency: re-fold wave 2's key edges verbatim
    replay = ke.join(
        ke.filter(F.col("src_key") >= "turn|conv00000020"), ["src_key", "dst_key"], "left_semi"
    )
    labels0 = {(r["vid"], r["label"]) for r in gm.labels.collect()}
    tc0 = got_tc
    msf0 = gm.msf_total
    gm.fold(replay)
    assert {(r["vid"], r["label"]) for r in gm.labels.collect()} == labels0
    assert {r["vid"]: r["tc"] for r in gm.tc_per_vertex.filter("tc > 0").collect()} == tc0
    assert gm.msf_total == pytest.approx(msf0)


def test_sketch_maintenance_fold_equals_batch(spark, tmp_path):
    # count-min folded over streamed micro-batches == the batch table
    # over the union (the monoid property, through a real
    # foreachBatch-shaped fold), and point estimates never undercount
    from pyspark.sql import functions as F

    from essentials_spark.ops.sketch import count_min_query, count_min_table
    from essentials_spark.streaming.ingest import SketchMaintenance

    t = synth_transcripts(spark, n_convs=30, seed=3)
    toks = t.select(F.explode(F.split(F.trim("text"), " ")).alias("token"))
    sm = SketchMaintenance(spark, depth=3, width=256)
    # three arbitrary micro-batches split by token hash
    for p in range(3):
        sm.fold(toks.filter(F.pmod(F.xxhash64("token"), F.lit(3)) == p), batch_id=p)
    whole = count_min_table(toks, "token", depth=3, width=256)
    diff = (
        sm.table.join(whole, ["d", "b"], "full")
        .filter(F.coalesce(sm.table["c"], F.lit(0)) != F.coalesce(whole["c"], F.lit(0)))
        .count()
    )
    assert diff == 0
    est = {r.token: r.est for r in sm.query(toks).collect()}
    true = {r.token: r.c for r in toks.groupBy("token").agg(F.count("*").alias("c")).collect()}
    assert all(est[k] >= v for k, v in true.items())


def test_tumbling_rollup_stream_matches_batch(spark, tmp_path):
    # the SAME tumbling_rollup expression over readStream (availableNow,
    # complete mode) equals the batch run — the batch/stream parity
    # contract of streaming/windows.py
    from pyspark.sql import functions as F

    from essentials_spark.streaming.windows import tumbling_rollup

    # watermarks require TIMESTAMP (LTZ) event time — NTZ is rejected
    t = synth_transcripts(spark, n_convs=40, seed=42).select(
        "conv_id", "tool", F.col("ts").cast("timestamp").alias("ts")
    )
    in_dir = str(tmp_path / "win_in")
    t.write.parquet(in_dir)
    stream = (
        spark.readStream.schema(t.schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    agg = tumbling_rollup(stream, width="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["win_start_us"]: (r["n_turns"], r["n_convs"], r["n_tool_calls"])
        for r in spark.sql("SELECT * FROM win_parity").collect()
    }
    batch = {
        r["win_start_us"]: (r["n_turns"], r["n_convs"], r["n_tool_calls"])
        for r in tumbling_rollup(t, width="1 hour").collect()
    }
    # counts are exact in both modes; n_convs is HLL under the stream
    # (exact DISTINCT is illegal in streaming state), so compare it
    # against a batch HLL over the same windows — register merges are
    # order-independent, the estimates must be IDENTICAL
    hll = {
        r["ws"]: r["nc"]
        for r in t.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.approx_count_distinct("conv_id").alias("nc"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws_s"), "nc"
        )
        .withColumn("ws", F.col("ws_s") * 1_000_000)
        .collect()
    }
    assert len(batch) > 0 and set(streamed) == set(batch)
    for ws, (nt, nc, ntc) in streamed.items():
        assert nt == batch[ws][0] and ntc == batch[ws][2]
        assert nc == hll[ws]
