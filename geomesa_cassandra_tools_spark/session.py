"""SparkSession factory with scale-oriented defaults.

The reference tool's execution model is per-node asyncio fan-out with
barriers between stages (/root/reference/cluster.py:147-148,
/root/reference/geomesa_cassandra.py:66-85). On Spark that concurrency model
is the scheduler's job; what we configure here is what actually matters at
100 TB: AQE (runtime re-planning, skew-join splitting, partition coalescing),
sane shuffle parallelism, Arrow for any pandas-UDF exchange, and a UTC
session timezone so results are stable across engines and clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults tuned for the local[N] test harness; on a real cluster the same
#: keys apply — AQE re-derives shuffle parallelism from data size at runtime,
#: so `shuffle.partitions` is only an upper seed value.
_DEFAULT_CONF = {
    # Adaptive execution: coalesce small shuffle partitions, split skewed
    # ones, convert to broadcast joins at runtime. Essential at 100 TB where
    # static planning guesses wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic cross-engine timestamps (DuckDB oracle runs tz-naive).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for the few pandas-UDF paths (multimodal/geo refinement).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Spark's INT96 parquet-timestamp default writes NO column min/max
    # statistics, so neither parquet row-group pruning nor the manifest
    # layer's file skipping can act on timestamp predicates. INT64 micros
    # is the modern stats-bearing encoding (lossless for the engine's
    # microsecond timestamps); at 100 TB a time-bounded scan over an
    # INT96 table reads everything.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # 128 MB input splits — the right order of magnitude for parquet scans
    # both locally and on a cluster.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: dims like `nation`/`region`/`nodes` always fit.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # local[N] runs executors inside the driver JVM, whose default heap is
    # 1 GB — far too small for 32 concurrent tasks + caches on a 128 GiB
    # box (OOMs after enough cached stages). Only applies when this factory
    # launches the JVM; on a cluster the submitter sets executor memory.
    "spark.driver.memory": "16g",
    # No web UI for an engine/bench session: the UI's listener tracks every
    # stage/task for display, a per-task cost that is pure overhead on
    # many-small-stage workloads (measured ~5-8% of wall time on the
    # sub-second query fleet). Operators wanting the UI re-enable it via
    # extra_conf; the history server is the right tool on a cluster.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    # PySpark 4 wraps EVERY DataFrame/Column call with error call-site
    # capture: a conf.get RPC + a JVM origin set/clear RPC + a Python stack
    # walk per operation. For expression-heavy plan builders (z-curve
    # interleaves, unrolled polygon tests, sketch hash families) that is
    # 3× the Py4J traffic of the build itself — measured 2-5× faster plan
    # construction with it off. Cost: error messages lose the Python
    # call-site line, nothing else.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}

#: Shuffle-partition sizing policy (the 100 TB partitioning rule, applied
#: at any scale): target ~64 MB of input per reduce partition —
#:   partitions = clamp(corpus_bytes / 64 MB, floor=16, cap=2*cores)
#: - 64 MB/partition keeps a reduce task's working set comfortably inside
#:   executor memory with room for hash tables (the same order Spark's own
#:   maxPartitionBytes picks for scan splits);
#: - the floor of 16 keeps every stage a real multi-partition exercise
#:   (measured best of {8,16,32} at sf0.1 — below it, one straggler task
#:   serializes the stage);
#: - the 2×cores cap bounds pure scheduler overhead on small boxes and
#:   binds the floor too on tiny-core machines.
#: At 100 TB the same formula yields ~1.6M partitions — beyond AQE's
#: practical ceiling, which is why AQE coalescing stays on: this value is
#: only the pre-AQE seed, and the formula's job is the right ORDER OF
#: MAGNITUDE, not an exact count.
SHUFFLE_TARGET_BYTES_PER_PARTITION = 64 << 20
SHUFFLE_PARTITION_FLOOR = 16


def data_sized_shuffle_partitions(data_bytes: int, cpus: int) -> int:
    """Apply the documented sizing rule above to a corpus size + core count."""
    by_data = -(-data_bytes // SHUFFLE_TARGET_BYTES_PER_PARTITION)  # ceil div
    return min(2 * cpus, max(SHUFFLE_PARTITION_FLOOR, by_data))


def get_spark(
    app_name: str = "geomesa-cassandra-tools-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` when no cluster
    is configured; on a real deployment pass nothing and submit via
    spark-submit so the cluster manager decides.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
