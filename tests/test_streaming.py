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
