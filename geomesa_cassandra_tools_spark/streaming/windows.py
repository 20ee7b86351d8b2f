"""Structured Streaming surface: watermarked windows + sessionization.

The reference's streaming-shaped loops (poll-until-up with 300 s deadline,
/root/reference/node.py:57-65; continuous re-scan of compaction/snapshot
state, /root/reference/cluster.py:83-117) become declarative streaming
queries: a watermark bounds state exactly like the poll deadline bounds the
loop, and micro-batches are the re-scan.

Each builder takes a (possibly streaming) DataFrame so the identical plan
runs in batch tests (`spark.read`) and on streams (`spark.readStream`) —
Spark's unified-API contract. `run_availablenow` drains a file stream to a
memory sink for deterministic end-to-end tests.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
    group_extra: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts; late rows beyond the watermark
    are dropped (state stays bounded on an unbounded stream)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), width).alias("win"), *group_extra)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            *group_extra,
            "n_events",
            "sum_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), width, slide).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "n_events")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Gap-based session windows (built-in `session_window` — state merging
    handled by Spark; for custom state semantics use
    `applyInPandasWithState`)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
        )
    )


def stateful_user_totals(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful streaming operator (`applyInPandasWithState`): a
    per-key running (count, sum) kept in explicit group state — the escape
    hatch for semantics `session_window`/aggregations can't express
    (SURVEY.md §4.3). Each micro-batch updates the state and emits the
    current totals for keys seen in that batch; with a bounded source
    drained in one AvailableNow batch the emission is the final answer,
    which is what the differential oracle checks."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key} bigint, n_events bigint, sum_value double"
    state_schema = "n bigint, s double"

    def update(k, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({key: [k[0]], "n_events": [n], "sum_value": [s]})

    return events.select(key, "value").groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_session_close(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_ms: int = 1_800_000,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Sessionization with explicit state expiry (`EventTimeTimeout`): each
    key keeps a running event count; every event re-arms an event-time
    timer at (newest event + gap). When the watermark passes a key's timer
    with no new data, the update function is invoked with
    ``state.hasTimedOut`` — it emits the final closed-session row and
    removes the state. This is the custom-semantics analog of
    `session_window` (SURVEY.md §4.3) and the part of the
    applyInPandasWithState surface NoTimeout can't exercise: state
    LIFECYCLE, not just state storage. Timers are per-key and fire during
    a later micro-batch's planning, so state size stays bounded by live
    sessions — the property that matters on an unbounded 100 TB stream."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key} bigint, n_events bigint, closed boolean"
    state_schema = "n bigint"
    # applyInPandasWithState hands TIMESTAMP columns to pandas as NAIVE
    # session-timezone wall clocks, while setTimeoutTimestamp wants epoch
    # millis — localize with the session zone captured at plan time, or a
    # non-UTC session would arm every timer off by the zone offset (late
    # close, or an in-the-past timestamp Spark rejects outright).
    session_tz = events.sparkSession.conf.get("spark.sql.session.timeZone")

    def update(k, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame({key: [k[0]], "n_events": [n], "closed": [True]})
            return
        n = state.get[0] if state.exists else 0
        newest = None
        for pdf in pdfs:
            n += len(pdf)
            m = pd.to_datetime(pdf[ts_col]).max()
            # an all-null timestamp batch yields NaT (which IS not-None and
            # would crash .timestamp() below) — skip timer re-arm for it
            if pd.isna(m):
                continue
            newest = m if newest is None else max(newest, m)
        state.update((n,))
        if newest is not None:
            if newest.tzinfo is None:
                newest = newest.tz_localize(session_tz)
            state.setTimeoutTimestamp(int(newest.timestamp() * 1000) + gap_ms)
        yield pd.DataFrame({key: [k[0]], "n_events": [n], "closed": [False]})

    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.select(key, ts_col).groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
    )


_RUN_SEQ = [0]

#: Completed drains' sink view names, with the owning session and (for
#: parquet sinks) the output directory to reclaim. A memory sink holds
#: its rows on the DRIVER for as long as the temp view pins it — a
#: bench/driver session that runs many drain queries (11 registry
#: drains × N passes) would otherwise accumulate every drained batch in
#: driver memory for the session lifetime, inflating GC on everything
#: that follows. The registry's cache-release hook
#: (`queries.release_query_caches`) drops them once the consuming query's
#: result has been collected — the same lifecycle as per-query caches.
_DRAINED_SINKS: list[tuple] = []


def release_drained_sinks() -> None:
    """Drop the temp views of completed drains, freeing their driver-held
    rows (memory sinks) / their RAM-disk output files (parquet sinks).
    Safe once the consuming query's result has been collected; a view
    already dropped (or a stopped session) is ignored."""
    while _DRAINED_SINKS:
        spark, name, out_dir = _DRAINED_SINKS.pop()
        try:
            spark.catalog.dropTempView(name)
        except Exception:  # noqa: BLE001 — stopped session / already gone
            pass
        if out_dir:
            shutil.rmtree(out_dir, ignore_errors=True)


def _checkpoint_root() -> str:
    """Checkpoint base for drains: a RAM-backed dir when the host has one
    (state-store deltas + offset/commit WALs are many small synchronous
    writes — pure harness overhead for a bounded drain), else the system
    temp dir. On a real cluster streaming checkpoints MUST be durable
    shared storage (HDFS/S3) — callers there pass their own location via
    ``spark.sql.streaming.checkpointLocation`` instead."""
    for root in ("/dev/shm", tempfile.gettempdir()):
        if os.path.isdir(root) and os.access(root, os.W_OK):
            return os.path.join(root, f"spark_graft_ckpt_{os.getuid()}")
    return tempfile.gettempdir()


def _drain(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str,
    timeout_sec: int,
    state_partitions: int | None,
    no_data_batch: bool = True,
    sink: str = "memory",
):
    """Fault-isolated wrapper over `_drain_once`: retry EXACTLY once, and
    only for the transient Python-worker spawn failure ("Python worker
    failed to connect back" / "Python worker exited unexpectedly") — an
    environmental fork/connect flake, not a query property (it killed the
    round-8 driver bench at q159 and did not reproduce). Every attempt is
    a fresh drain with a fresh checkpoint and a fresh memory-sink name, so
    a retry can never consume a partial first attempt. All other failures
    propagate unchanged on the first throw."""
    try:
        return _drain_once(
            stream_df, query_name, output_mode, timeout_sec,
            state_partitions, no_data_batch, sink,
        )
    except Exception as exc:  # noqa: BLE001 — classify then re-raise
        msg = str(exc)
        transient = (
            "failed to connect back" in msg
            or "Python worker exited unexpectedly" in msg
        )
        if not transient:
            raise
        import time as _time

        _time.sleep(1.0)
        return _drain_once(
            stream_df, query_name, output_mode, timeout_sec,
            state_partitions, no_data_batch, sink,
        )


def _drain_once(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str,
    timeout_sec: int,
    state_partitions: int | None,
    no_data_batch: bool = True,
    sink: str = "memory",
):
    """Start an AvailableNow drain and block until done.

    ``sink="memory"`` (default) collects every batch to a driver-held
    memory-sink table. ``sink="parquet"`` (append mode only — the file
    sink's contract) writes batches as parquet under the RAM-backed
    checkpoint root and registers a read-back view: no driver collect
    on the write side, a parallel columnar scan on the read side — the
    production multi-hop shape, and measurably faster for the stateless
    pass-through drains whose whole payload otherwise funnels through
    one LocalTableScan (r14, guide §5: the driver should do no data
    work). The drained multiset is identical either way.

    ``state_partitions`` temporarily overrides shuffle partitions for the
    stream start: streaming state instantiates one store per shuffle
    partition, a per-partition fixed cost — size it to stream volume, not to
    the batch default (32 stores for a small drain is 3× pure overhead; a
    100 TB stream would set hundreds). The conf is captured when the query
    starts and restored right after (StreamExecution clones the session at
    start, so the override is frozen into the query and the restore cannot
    race a later micro-batch).

    ``no_data_batch=False`` disables the trailing no-data micro-batch for
    operators that EMIT eagerly (inner stream-stream joins, streaming
    dedup): there the extra batch only evicts state — measured at ~1 s of
    pure overhead per drain at sf0.1, near the cost of the data batch
    itself. Operators whose OUTPUT depends on the final watermark advance
    (event-time timers, append-mode window finalization) must keep it."""
    if sink not in ("memory", "parquet"):
        raise ValueError(f"unknown drain sink {sink!r}")
    if sink == "parquet" and output_mode != "append":
        raise ValueError(
            "the parquet drain sink supports append mode only (the file "
            f"sink contract); got output_mode={output_mode!r}"
        )
    _RUN_SEQ[0] += 1
    name = f"{query_name}_{_RUN_SEQ[0]}"
    spark = stream_df.sparkSession
    ckpt = os.path.join(_checkpoint_root(), f"{name}_{os.getpid()}")
    out_dir = None
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        if not no_data_batch:
            spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        writer = (
            stream_df.writeStream.outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        if sink == "parquet":
            out_dir = ckpt + "_out"
            q = writer.format("parquet").option("path", out_dir).start()
        else:
            q = writer.format("memory").queryName(name).start()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)
    # awaitTermination returns False on timeout with the query STILL
    # RUNNING — returning the sink name then would hand the caller a
    # nondeterministic partial table and leak the query. Fail loudly.
    # The memory-sink drain is ephemeral — nothing ever resumes this
    # checkpoint, so reclaim it (it may live in RAM) on EVERY exit path,
    # including a failing query raising StreamingQueryException. The
    # sink name is likewise registered for release on EVERY path: a
    # drain that raises after start() may already have created the
    # memory-sink temp view with partial batches, and an unregistered
    # view would hold those driver rows for the session lifetime.
    try:
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"streaming drain {name!r} did not finish within {timeout_sec}s"
            )
        if sink == "parquet":
            # explicit schema: a zero-row drain writes only the sink's
            # metadata log, where inference would fail
            spark.read.schema(stream_df.schema).parquet(
                out_dir
            ).createOrReplaceTempView(name)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        _DRAINED_SINKS.append((spark, name, out_dir))
    return name


def run_availablenow(
    stream_df: DataFrame,
    query_name: str,
    timeout_sec: int = 120,
    state_partitions: int | None = 8,
):
    """Drain a bounded stream (Trigger.AvailableNow) into a memory sink and
    return the session-queryable table name — the deterministic harness for
    streaming tests. Names are suffixed with a run counter so repeated
    invocations in one session (bench loops) never collide."""
    return _drain(stream_df, query_name, "complete", timeout_sec, state_partitions)


def run_appendmode(
    stream_df: DataFrame,
    query_name: str,
    timeout_sec: int = 120,
    state_partitions: int | None = 8,
    no_data_batch: bool = True,
    sink: str = "memory",
):
    """AvailableNow drain in `append` output mode: only rows whose window
    the watermark has finalized are emitted — the mode that exercises
    late-data drop (complete mode re-emits everything). For checkpointed
    restarts use a FILE sink — the memory sink cannot recover a checkpoint
    (see tests/test_streaming.py for the parquet-sink restart pattern).
    Pass ``no_data_batch=False`` ONLY for eagerly-emitting operators
    (inner joins, dedup) — see `_drain`. ``sink="parquet"`` drains to
    RAM-disk parquet instead of a driver-held memory table — prefer it
    for pass-through drains whose whole payload the consumer re-reads
    (see `_drain_once`)."""
    return _drain(
        stream_df, query_name, "append", timeout_sec, state_partitions,
        no_data_batch, sink,
    )


def run_availablenow_update(
    stream_df: DataFrame,
    query_name: str,
    timeout_sec: int = 120,
    state_partitions: int | None = 8,
):
    """AvailableNow drain in `update` output mode — required for arbitrary
    stateful operators (complete mode isn't supported there)."""
    return _drain(stream_df, query_name, "update", timeout_sec, state_partitions)


def stateful_user_totals_tws(events: DataFrame, key: str = "user_id") -> DataFrame:
    """`stateful_user_totals` re-expressed on `transformWithStateInPandas`
    (Spark 4's arbitrary-state API — typed ValueState handles instead of
    one opaque tuple, plus timers/TTL/ListState/MapState the old API
    lacks). Same semantics by construction: per-key running (count, sum)
    in a ValueState, the current totals emitted for every key seen in the
    micro-batch. The unit battery drains BOTH implementations over the
    same bounded stream and asserts identical results — two independent
    state engines (GroupState vs the StatefulProcessor ValueState store)
    certifying each other. New pipelines should prefer this API: state is
    schema'd and composable, and expiry is first-class timers rather than
    the single timeout channel.

    Sandbox note: the TWS runtime speaks protobuf to a driver-side state
    worker; this container ships no google.protobuf, so the equivalence
    unit importorskips here and the operator certifies wherever protobuf
    exists (no pip installs allowed — same constraint class as the live
    connector wire)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{key} bigint, n_events bigint, sum_value double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n bigint, s double")

        def handleInputRows(self, k, rows, timerValues):
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame({key: [k[0]], "n_events": [n], "sum_value": [s]})

        def close(self) -> None:
            pass

    return (
        events.select(key, "value")
        .groupBy(key)
        .transformWithStateInPandas(
            RunningTotals(), out_schema, "Update", "None"
        )
    )
