#!/usr/bin/env python
"""Decompose the Python streaming-source drain floor (r8 VERDICT #8):
where do q156/q159/q76's ~2-3 s of per-drain machinery go?

Phases measured per drain, N repetitions each:
  define   — stream_feed()/operator construction (plan-only)
  start    — writeStream.start() returning (runner spawn + WAL init)
  drain    — awaitTermination (micro-batch execution)
plus the engine's own durationMs breakdown from the final progress
event (triggerExecution / queryPlanning / walCommit / addBatch /
getBatch / latestOffset), which attributes the in-batch time.

Usage: python scripts/probe_drain_floor.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(spark, label, make_stream, output_mode, state_partitions, reps):
    from geomesa_cassandra_tools_spark.streaming import windows as W

    rows = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = make_stream()
        t1 = time.perf_counter()
        W._RUN_SEQ[0] += 1
        name = f"probe_{label}_{W._RUN_SEQ[0]}"
        ckpt = os.path.join(W._checkpoint_root(), f"{name}_{os.getpid()}")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        t2 = time.perf_counter()
        assert q.awaitTermination(180)
        t3 = time.perf_counter()
        prog = q.recentProgress
        durs = prog[-1]["durationMs"] if prog else {}
        n_trig = len(prog)
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
        spark.catalog.dropTempView(name)
        rows.append(
            {
                "define": round(t1 - t0, 3),
                "start": round(t2 - t1, 3),
                "drain": round(t3 - t2, 3),
                "total": round(t3 - t0, 3),
                "n_triggers": n_trig,
                "durationMs": durs,
            }
        )
    best = min(rows, key=lambda r: r["total"])
    print(f"== {label}: best-of-{reps} " + json.dumps(best))
    for r in rows:
        print(f"   {label} " + json.dumps(r))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from geomesa_cassandra_tools_spark import queries as Q
    from geomesa_cassandra_tools_spark.session import get_spark
    from geomesa_cassandra_tools_spark.sources import manifestfeed as mf

    spark = get_spark(app_name="drain-floor-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    _ = F  # imported for parity with the query shapes

    # q156's exact shape: bare append-mode drain of the 4-commit fixture
    feed_path = Q._manifest_feed_fixture_path(spark, sf_dir)
    probe(
        spark, "q156_feed_drain",
        lambda: mf.stream_feed(spark, feed_path),
        "append", 8, reps,
    )

    # projected feed: does column width matter at all?
    probe(
        spark, "feed_1col",
        lambda: mf.stream_feed(spark, feed_path).select("event_id"),
        "append", 8, reps,
    )

    # a JVM-only rate stream as the engine-floor control (no Python
    # source runner at all)
    def rate_stream():
        return (
            spark.readStream.format("rate")
            .option("numPartitions", "1")
            .option("rowsPerSecond", "1")
            .load()
            .select("value")
        )

    probe(spark, "rate_control", rate_stream, "append", 2, reps)
    spark.stop()


if __name__ == "__main__":
    main()
