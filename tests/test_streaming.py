"""Streaming semantics units beyond the oracle-checked drains: watermark
late-data drop across micro-batches, and a foreachBatch sink. Fixture
streams are written to tmp dirs (query-registry inputs stay the driver
corpus; these tests exercise the streaming machinery itself)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.streaming import windows as stream_win


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "ts string, k string").select(
        F.col("ts").cast("timestamp").alias("ts"), "k"
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_rows_across_restarts(spark, tmp_path):
    """A row older than the checkpointed watermark arriving after a restart
    is dropped from the aggregation — the bounded-state contract. Two
    drains share one checkpoint, so the second resumes offsets, state, and
    the event-time watermark (file-listing order within one drain is not
    deterministic, restarts are)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def agg_of(stream):
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("ws"), "n")
        )

    def stream_src():
        return spark.readStream.schema("ts timestamp, k string").parquet(src)

    sink = str(tmp_path / "sink")

    def drain():
        # file sink (memory sink can't recover a checkpoint): append-mode
        # parquet receives only watermark-finalized windows
        q = (
            agg_of(stream_src())
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # drain 1: max event time 12:00 → checkpointed watermark 11:00
    _write_batch(spark, src, [("2024-01-01 10:00:00", "a"), ("2024-01-01 12:00:00", "a")])
    drain()
    # drain 2 (same checkpoint): 09:00 is behind the watermark → dropped;
    # 12:30 advances it to 11:30, finalizing the 10:00–11:00 window
    _write_batch(spark, src, [("2024-01-01 09:00:00", "late"), ("2024-01-01 12:30:00", "b")])
    drain()
    out = {str(r["ws"]): r["n"] for r in spark.read.parquet(sink).collect()}
    # the dropped 09:00 row must not have created a 09:00–10:00 window
    assert not any("09:00" in k for k in out), out
    # the 10:00 window finalized with exactly its one on-time row
    assert any("10:00" in k and v == 1 for k, v in out.items()), out


def test_foreachbatch_sink_writes_each_microbatch(spark, tmp_path):
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    _write_batch(spark, src, [("2024-01-01 10:00:00", "a")])
    _write_batch(spark, src, [("2024-01-01 11:00:00", "b")])

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_id)
        batch_df.write.mode("append").parquet(out_dir)

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert len(seen) == 2
    assert spark.read.parquet(out_dir).count() == 2
