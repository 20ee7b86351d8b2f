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


def test_event_time_timeout_closes_idle_sessions(spark, tmp_path):
    """EventTimeTimeout lifecycle across checkpointed drains (timers are
    evaluated against the checkpointed watermark, so restarts make the
    firing deterministic):

    - drain 1: users 1,2 each get one 10:00 event → timers armed at 10:30;
      watermark ends at ~09:59 → nothing fires.
    - drain 2: user 2 gets a 12:30 event (timer re-arms to 13:00). The data
      batch runs at the checkpointed ~09:59 watermark, then the trailing
      no-data micro-batch (noDataMicroBatches, on by default) advances it
      to ~12:29 → past user 1's 10:30 timer only → user 1 closes with its
      final count, state removed.
    - drain 3: unrelated user 3 event advances the watermark to ~13:29 →
      past user 2's 13:00 timer → user 2 closes with n=2; user 3 is the
      only live session left (bounded state on an unbounded stream)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
        sessions = stream_win.stateful_session_close(stream, gap_ms=1_800_000)

        def sink(batch_df, _):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            sessions.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def closed_so_far():
        rows = spark.read.parquet(out_dir).collect()
        return {r["user_id"]: r["n_events"] for r in rows if r["closed"]}, rows

    write([(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:00:00")])
    drain()
    closed, rows = closed_so_far()
    assert closed == {}, rows

    write([(2, "2024-01-01 12:30:00")])
    drain()
    closed, rows = closed_so_far()
    assert closed == {1: 1}, rows

    write([(3, "2024-01-01 13:30:00")])
    drain()
    closed, rows = closed_so_far()
    assert closed == {1: 1, 2: 2}, rows
    open_counts = {r["user_id"]: r["n_events"] for r in rows if not r["closed"]}
    assert open_counts[3] == 1, rows


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


def test_stream_to_manifest_exactly_once(spark, tmp_path):
    """The exactly-once ingestion contract end to end: a stream drains into
    a manifest table; a second drain over the SAME checkpoint (the crash-
    replay shape) applies nothing; a direct replay of an already-applied
    batch id is refused by the manifest watermark; NEW data appends and
    interleaved maintenance preserves the watermark."""
    from geomesa_cassandra_tools_spark.operators import transactional
    from geomesa_cassandra_tools_spark.streaming import sinks

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [("2024-01-01 10:00:00", "a"), ("2024-01-01 11:00:00", "b")])
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    applied = sinks.stream_to_manifest(stream, table, "ingest", checkpoint=ckpt)
    assert applied >= 1
    assert transactional.read_table(spark, table).count() == 2

    # replayed drain over the same checkpoint: no new batches, no new rows
    stream2 = spark.readStream.schema(schema).parquet(src)
    assert sinks.stream_to_manifest(stream2, table, "ingest", checkpoint=ckpt) == 0
    assert transactional.read_table(spark, table).count() == 2

    # direct duplicate of an applied batch id -> watermark refuses it
    batch = spark.read.parquet(src)
    assert transactional.append_batch(batch, table, txn_app="ingest", txn_id=0) is None
    assert transactional.read_table(spark, table).count() == 2

    # new data arrives; the resumed checkpoint applies exactly the delta
    _write_batch(spark, src, [("2024-01-01 12:00:00", "c")])
    stream3 = spark.readStream.schema(schema).parquet(src)
    assert sinks.stream_to_manifest(stream3, table, "ingest", checkpoint=ckpt) == 1
    assert transactional.read_table(spark, table).count() == 3

    # maintenance interleaves under the same manifest: delete one key,
    # then a replay of ANY applied batch id still refuses (txns carried)
    transactional.delete_where(spark, table, F.col("k") == "a")
    assert transactional.read_table(spark, table).count() == 2
    assert transactional.append_batch(batch, table, txn_app="ingest", txn_id=1) is None


def test_stream_to_manifest_default_checkpoint(spark, tmp_path):
    """The DEFAULT checkpoint path (checkpoint=None) must work and must be
    durable — co-located under the table dir, not a RAM-backed scratch
    root — so a host reboot cannot orphan the manifest txn watermark from
    its checkpoint. A second default-path drain resumes the same
    checkpoint and applies nothing."""
    import os

    from geomesa_cassandra_tools_spark.operators import transactional
    from geomesa_cassandra_tools_spark.streaming import sinks

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    _write_batch(spark, src, [("2024-01-01 10:00:00", "a")])
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    assert sinks.stream_to_manifest(stream, table, "ingest") >= 1
    assert transactional.read_table(spark, table).count() == 1
    # the default checkpoint lives with the table (durable), underscore-
    # prefixed so directory-globbing readers treat it as hidden
    assert os.path.isdir(os.path.join(table, "_checkpoints", "manifest_ingest"))

    stream2 = spark.readStream.schema(schema).parquet(src)
    assert sinks.stream_to_manifest(stream2, table, "ingest") == 0
    assert transactional.read_table(spark, table).count() == 1


def test_stream_to_manifest_auto_compaction(spark, tmp_path):
    """compact_every: a drain of many one-file micro-batches keeps the
    live-file count bounded through inline OPTIMIZE commits, while data
    and the exactly-once contract stay intact."""
    from geomesa_cassandra_tools_spark.operators import transactional
    from geomesa_cassandra_tools_spark.streaming import sinks

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    for i in range(6):
        _write_batch(spark, src, [(f"2024-01-01 1{i}:00:00", f"k{i}")])
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    applied = sinks.stream_to_manifest(
        stream, table, "ingest", checkpoint=ckpt,
        compact_every=3, compact_target_bytes=64 << 20,
    )
    assert applied == 6
    man = transactional._read_manifest(table, transactional.current_version(table))
    # 6 one-file appends, compacted at batch 3 and 6 -> never more than
    # compact_every + 1 live files, and in the end exactly 1 packed file
    assert len(man["files"]) == 1
    assert {r["k"] for r in transactional.read_table(spark, table).collect()} == {
        f"k{i}" for i in range(6)
    }
    ops = [h["op"] for h in transactional.table_history(table)]
    assert ops.count("compact") == 2
    # the contract survives: a replayed applied batch id still refuses
    batch = spark.read.parquet(src)
    assert (
        transactional.append_batch(batch, table, txn_app="ingest", txn_id=0)
        is None
    )


def test_stream_to_manifest_merge_mode(spark, tmp_path):
    """merge_keys: a CDC-shaped stream upserts by key exactly once —
    later batches REPLACE earlier rows with the same key instead of
    duplicating them; a replayed drain applies nothing."""
    from geomesa_cassandra_tools_spark.operators import transactional
    from geomesa_cassandra_tools_spark.streaming import sinks

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    # three single-file batches; key "a" appears in batches 0 and 2
    _write_batch(spark, src, [("2024-01-01 10:00:00", "a")])
    _write_batch(spark, src, [("2024-01-01 11:00:00", "b")])
    _write_batch(spark, src, [("2024-01-01 12:00:00", "a")])
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    applied = sinks.stream_to_manifest(
        stream, table, "cdc", checkpoint=ckpt, merge_keys=["k"]
    )
    assert applied == 3
    rows = {r["k"]: str(r["ts"]) for r in transactional.read_table(spark, table).collect()}
    assert set(rows) == {"a", "b"}  # upserted, not appended
    assert rows["a"].startswith("2024-01-01 12")  # last write won
    # replayed drain: nothing applied, state unchanged
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    assert sinks.stream_to_manifest(
        stream2, table, "cdc", checkpoint=ckpt, merge_keys=["k"]
    ) == 0
    assert transactional.read_table(spark, table).count() == 2
    ops = [h["op"] for h in transactional.table_history(table)]
    assert ops.count("merge") == 2  # batch 0 created; batches 1,2 merged


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """Two independent arbitrary-state engines, one semantics: the
    transformWithStateInPandas running totals must emit exactly what the
    applyInPandasWithState implementation emits over the same bounded
    stream (and both must equal the batch aggregate).

    transformWithStateInPandas speaks a protobuf state protocol to its
    driver-side worker; this container ships no google.protobuf, so the
    cross-engine leg SKIPS here (same sandbox-constraint class as the
    live connector wire) — the operator itself is complete and this test
    certifies it wherever protobuf exists."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf (absent in sandbox)",
    )
    src = str(tmp_path / "src")
    rows = [(i % 5, float(i)) for i in range(40)]
    spark.createDataFrame(rows, "user_id bigint, value double").write.parquet(src)
    batch = {
        (r["user_id"]): (r["n"], r["s"])
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    def drain(op_name):
        stream = (
            spark.readStream.schema("user_id bigint, value double").parquet(src)
        )
        agg = getattr(stream_win, op_name)(stream)
        name = stream_win.run_availablenow_update(agg, op_name)
        return {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in spark.table(name).collect()
        }

    old = drain("stateful_user_totals")
    new = drain("stateful_user_totals_tws")
    assert old == new == batch


def test_stream_to_manifest_cdc_delete_mode(spark, tmp_path):
    """Full CDC apply: upserts AND delete events (delete_col marker) —
    deletes land as deletion-vector commits (zero data files rewritten),
    and a replayed drain is a no-op on both halves (watermark-refused
    merges, value-idempotent deletes — not even a version burned)."""
    from geomesa_cassandra_tools_spark.operators import transactional
    from geomesa_cassandra_tools_spark.streaming import sinks

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = "k bigint, v string, _deleted boolean"
    batches = [
        [(1, "a", False), (2, "b", False), (3, "c", False)],
        [(2, "B", False), (1, None, True)],
        [(3, None, True), (4, "d", False)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return sinks.stream_to_manifest(
            stream, table, "cdc_full", checkpoint=ckpt,
            merge_keys=["k"], delete_col="_deleted",
        )

    drain()
    got = {r["k"]: r["v"] for r in transactional.read_table(spark, table).collect()}
    assert got == {2: "B", 4: "d"}
    # delete commits are deletion-vector commits, not rewrites
    ops = [
        (h["op"], h["n_remove"], h["n_dv"])
        for h in transactional.table_history(table)
    ]
    assert any(op == "delete" and nrm == 0 and ndv > 0 for op, nrm, ndv in ops)
    v_after = transactional.current_version(table)

    # fresh checkpoint replays everything: both halves no-op — same rows,
    # and the delete side doesn't even burn a version
    import shutil

    shutil.rmtree(ckpt)
    drain()
    assert transactional.current_version(table) == v_after
    got2 = {r["k"]: r["v"] for r in transactional.read_table(spark, table).collect()}
    assert got2 == got


def test_cdc_delete_with_null_key_fails_loudly(spark, tmp_path):
    """A NULL-keyed CDC delete can never equality-match a live row — the
    sink must reject the batch instead of silently dropping the delete."""
    from geomesa_cassandra_tools_spark.operators import transactional
    from geomesa_cassandra_tools_spark.streaming import sinks

    table = str(tmp_path / "cdc_null")
    transactional.init_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"),
        table,
    )
    deletes = spark.createDataFrame([(None,), (1,)], "k bigint")
    with pytest.raises(ValueError, match="NULL"):
        sinks._apply_cdc_deletes(deletes, table, ["k"], [0], [0])
    # nothing applied: the good key must not have been half-applied either
    assert transactional.current_version(table) == 0


def test_stream_to_manifest_identity_allocation(spark, tmp_path):
    """r13: identity columns through the STREAMING sink — each
    foreachBatch append allocates past the high-water mark; a replayed
    drain over the same checkpoint allocates nothing (exactly-once
    extends to the allocated ranges: a replay can never burn or
    duplicate ids)."""
    from geomesa_cassandra_tools_spark.operators import transactional
    from geomesa_cassandra_tools_spark.streaming import sinks

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        spark, src,
        [("2024-01-01 10:00:00", "a"), ("2024-01-01 11:00:00", "b")],
    )
    schema = spark.read.parquet(src).schema
    transactional.init_table(
        spark.createDataFrame([], schema), table, identity=["row_id"]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    assert sinks.stream_to_manifest(stream, table, "ing", checkpoint=ckpt) >= 1
    got = transactional.read_table(spark, table)
    ids = sorted(r["row_id"] for r in got.collect())
    assert ids == [1, 2]
    man = transactional._read_manifest(
        table, transactional.current_version(table)
    )
    assert man["identity"]["row_id"]["high"] == 2

    # replayed drain: nothing applied, no ids burned
    stream2 = spark.readStream.schema(schema).parquet(src)
    assert sinks.stream_to_manifest(stream2, table, "ing", checkpoint=ckpt) == 0
    man2 = transactional._read_manifest(
        table, transactional.current_version(table)
    )
    assert man2["identity"]["row_id"]["high"] == 2

    # new data: the resumed checkpoint allocates exactly the delta
    _write_batch(spark, src, [("2024-01-01 12:00:00", "c")])
    stream3 = spark.readStream.schema(schema).parquet(src)
    assert sinks.stream_to_manifest(stream3, table, "ing", checkpoint=ckpt) == 1
    ids = sorted(
        r["row_id"]
        for r in transactional.read_table(spark, table).collect()
    )
    assert ids == [1, 2, 3]


def test_parquet_drain_sink_matches_memory_sink(spark, tmp_path):
    """r14: `_drain(sink="parquet")` must yield the identical drained
    multiset as the memory sink (parallel file write + columnar
    read-back instead of a driver-held batch), and releasing the sink
    must reclaim both the temp view and the RAM-disk output dir."""
    import os

    src = str(tmp_path / "psrc")
    _write_batch(
        spark, src,
        [("2024-01-01 10:00:00", "a"), ("2024-01-01 10:00:01", "b"),
         ("2024-01-01 10:00:02", "a")],
    )

    def stream():
        return spark.readStream.schema("ts timestamp, k string").parquet(src)

    mem = stream_win.run_appendmode(
        stream(), "psink_mem", state_partitions=None, no_data_batch=False
    )
    mem_rows = sorted(
        (str(r["ts"]), r["k"]) for r in spark.table(mem).collect()
    )
    pq = stream_win.run_appendmode(
        stream(), "psink_pq", state_partitions=None, no_data_batch=False,
        sink="parquet",
    )
    out_dirs = [d for (_s, n, d) in stream_win._DRAINED_SINKS if n == pq]
    assert out_dirs and out_dirs[0] and os.path.isdir(out_dirs[0])
    pq_rows = sorted(
        (str(r["ts"]), r["k"]) for r in spark.table(pq).collect()
    )
    assert pq_rows == mem_rows and len(pq_rows) == 3

    stream_win.release_drained_sinks()
    assert not os.path.exists(out_dirs[0])  # output dir reclaimed
    assert not any(
        v.name == pq for v in spark.catalog.listTables() if v.isTemporary
    )


def test_parquet_drain_sink_rejects_non_append(spark, tmp_path):
    """The file sink only supports append mode — the harness must refuse
    loudly, not let Spark fail deep in query start."""
    src = str(tmp_path / "psrc2")
    _write_batch(spark, src, [("2024-01-01 10:00:00", "a")])
    stream = spark.readStream.schema("ts timestamp, k string").parquet(src)
    with pytest.raises(ValueError, match="append mode only"):
        stream_win._drain(
            stream, "psink_bad", "complete", 60, None, True, "parquet"
        )


def test_nearest_cell_matches_window_assignment(spark):
    """r14: the map-only literal-centroid argmin must reproduce the
    window form (csim DESC NULLS LAST, cid ASC tie-break) row for row —
    including a zero vector (NULL cosine everywhere → smallest cid) and
    an exact tie (equidistant vector → smaller cid)."""
    from pyspark.sql import functions as F

    from geomesa_cassandra_tools_spark.functions.vectors import as_double, cosine
    from geomesa_cassandra_tools_spark.operators import relational, similarity

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    rows = [
        (10, [2.0, 0.1]),     # clearly cell 0
        (11, [0.1, 3.0]),     # clearly cell 1
        (12, [1.0, 1.0]),     # exact tie → cid 0
        (13, [0.0, 0.0]),     # zero vector → NULL csims → cid 0
        (14, [-1.0, -1.0]),   # negative tie → cid 0
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cent_df = spark.createDataFrame(
        cents, "cid bigint, centroid array<double>"
    )

    # window form (the pre-r14 mechanism)
    cent_b = F.broadcast(
        cent_df.select("cid", as_double(F.col("centroid")).alias("cv0"))
    )
    scored = df.select(
        "vec_id", as_double(F.col("embedding")).alias("cv")
    ).join(cent_b).select(
        "vec_id", "cid", cosine(F.col("cv"), F.col("cv0")).alias("csim")
    )
    want = {
        r["vec_id"]: r["cid"]
        for r in relational.top_k_per_group(
            scored, ["vec_id"], [F.col("csim").desc(), F.col("cid")], 1
        ).collect()
    }

    pick = similarity.nearest_cell(
        "cv", similarity.collect_centroids(cent_df)
    )
    got = {
        r["vec_id"]: r["cid"]
        for r in df.select(
            "vec_id", as_double(F.col("embedding")).alias("cv")
        ).select("vec_id", pick["cid"].alias("cid")).collect()
    }
    assert got == want
    assert got[12] == 0 and got[13] == 0 and got[14] == 0
