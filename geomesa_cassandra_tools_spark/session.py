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
}


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
