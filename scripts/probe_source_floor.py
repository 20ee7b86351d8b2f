#!/usr/bin/env python
"""Per-SOURCE-TYPE streaming drain floor (r13 VERDICT #4): how much of a
bounded AvailableNow drain is the engine, and how much is the Python
data-source machinery Spark spawns per query start?

Three arms, identical sink/trigger/checkpoint handling, tiny inputs so
data cost ~0:
  rate    — JVM built-in rate source (pure engine floor)
  file    — JVM parquet file source
  pysrc   — a 5-row manifest-feed table (Python DataSource)

The pysrc gap over the JVM arms is per-QUERY-START machinery that is
hard-coded in Spark and not configurable from a user session:
PythonStreamingSourceRunner constructs a private
``PythonWorkerFactory(exec, module, envVars, useDaemon = false)`` and
calls ``createSimpleWorker`` — a FRESH ``python -m pyspark.sql.
streaming.python_streaming_source_runner`` process per query (cold
interpreter + pyspark import, ~0.5 s), destroyed at stop; the
lookup/create/plan data-source worker daemons DO persist across
queries (verified by pid stability), so this probe measures the
steady-state floor, not first-call daemon spawn.

Usage: python scripts/probe_source_floor.py [reps]
Writes bench_data/drain_source_floor.tsv.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drain(df, tag, i):
    name = f"floor_{tag}_{i}_{os.getpid()}"
    ckpt = os.path.join("/dev/shm", name)
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    dt = time.perf_counter() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return dt


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from geomesa_cassandra_tools_spark.operators import transactional as tx
    from geomesa_cassandra_tools_spark.session import get_spark
    from geomesa_cassandra_tools_spark.sources import manifestfeed

    spark = get_spark(
        app_name="probe-source-floor", master="local[32]",
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp()
    spark.range(10).write.parquet(os.path.join(d, "p"))
    tpath = os.path.join(d, "t")
    tx.init_table(spark.range(5).toDF("id"), tpath)
    arms = {
        "rate": lambda: spark.readStream.format("rate")
        .option("numPartitions", "1").option("rowsPerSecond", "1").load(),
        "file": lambda: spark.readStream.schema("id bigint")
        .parquet(os.path.join(d, "p")),
        "pysrc": lambda: manifestfeed.stream_feed(spark, tpath),
    }
    rows = []
    for tag, mk in arms.items():
        df = mk()
        ts = [drain(df, tag, i) for i in range(reps + 1)]
        rows.append((tag, round(min(ts[1:]), 3),
                     ",".join(f"{t:.2f}" for t in ts)))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_data", "drain_source_floor.tsv",
    )
    with open(out, "w") as fh:
        fh.write("source\tsteady_min_s\tall_including_first\n")
        for tag, mn, all_ts in rows:
            fh.write(f"{tag}\t{mn}\t{all_ts}\n")
    for r in rows:
        print(*r, sep="\t")
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
