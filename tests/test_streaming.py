"""Streaming ingestion: incremental edges == batch derivation; resume."""

import os

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
