#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced through the noop sink (full computation of every
column, no driver collect) so Catalyst can't prune the work we're timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geomesa_cassandra_tools_spark.queries import QUERIES
from geomesa_cassandra_tools_spark.session import get_spark


def run_query_timed(fn, spark, sf_dir, retries: int = 1):
    """Time one query through the noop sink, fault-isolated.

    Returns (elapsed_seconds, None) on success or (None, short_error) after
    `retries` re-attempts. One transient failure (e.g. a Python worker
    spawn flake inside a streaming drain) must cost ONE query's number,
    never the whole bench artifact — round 8's driver run died at q159 and
    shipped zero timings because the loop was unprotected.
    """
    last_err = None
    for attempt in range(retries + 1):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3), None
        except KeyboardInterrupt:
            raise
        except BaseException as exc:  # noqa: BLE001 — Py4J raises broadly
            last_err = f"{type(exc).__name__}: {exc}"[:300]
            if attempt < retries:
                time.sleep(1.0)
    return None, last_err


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # Size shuffle parallelism to the DATA, not the core count — the
    # documented policy lives in session.py (64 MB/partition target,
    # floor 16, cap 2×cores); over-partitioning tiny shuffles was worth
    # ~20% of total wall time at sf0.1.
    from geomesa_cassandra_tools_spark.session import data_sized_shuffle_partitions

    data_bytes = 0
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    data_bytes += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    shuffle_parts = data_sized_shuffle_partitions(data_bytes, int(cpus))

    spark = get_spark(
        app_name="geomesa-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths once so per-query numbers measure the
    # queries, not first-call session setup: touch every table scan (footer
    # reads + plan cache) and run the flagship once. Query-specific work
    # (its own codegen, shuffles) still lands in that query's timing.
    from geomesa_cassandra_tools_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).write.format("noop").mode("overwrite").save()
    QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Per-query MIN over N full passes (default 3): a single pass's numbers
    # carry 30-40% box noise (GC, page cache, JIT) that reads as phantom
    # regressions; the minimum is the stable statistic BENCH.md tracks.
    from geomesa_cassandra_tools_spark.queries import (
        release_query_caches,
        release_shared_caches,
    )

    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # INDEX POLICY (r14, per the r13 verdict): the HEADLINE stat rebuilds
    # every shared index frame (embedding signatures, IVF assignments,
    # the exact-cosine baseline, document shingles/minhash, the
    # verified-dedup cluster map, the hashed classifier feature table,
    # the fixed-probe BM25 scored frame) EACH PASS — so the reported
    # min-over-passes prices build+serve for every index-family query
    # and stays comparable with the r12-and-earlier numbers and with the
    # DuckDB oracle (which re-derives per run). The r13 resident policy
    # (indexes persist across passes; minima price serving only — the
    # production shape where ingestion maintains the index) remains
    # available as the OPT-IN arm via SPARK_GRAFT_RESIDENT=1 and is
    # reported as the secondary table in bench_data/resident_index_ab*.
    rebuild_per_pass = os.environ.get("SPARK_GRAFT_RESIDENT") != "1"
    release_shared_caches()
    for _ in range(runs):
        if rebuild_per_pass:
            release_shared_caches()
        for name, fn in sorted(QUERIES.items()):
            # release the PREVIOUS query's caches OUTSIDE the timed region —
            # otherwise the registry wrapper charges query N's unpersist
            # round-trips to query N+1's wall clock
            release_query_caches()
            elapsed, err = run_query_timed(fn, spark, sf_dir)
            if elapsed is not None:
                if name not in timings or elapsed < timings[name]:
                    timings[name] = elapsed
                errors.pop(name, None)
            elif name not in timings:
                # only record an error if NO pass ever timed this query —
                # a later-pass success clears it (transient flake, not a
                # broken query)
                errors[name] = err or "unknown"

    # drop the shared signature index + the final query's caches
    release_query_caches()
    release_shared_caches()

    total = round(sum(timings.values()), 3)
    # The summary line uses the short qNN id per query (the full names are
    # in QUERIES/BENCH.md) and compact separators, so the single JSON line
    # stays within log-tail capture limits of whatever harness runs this.
    short = {name.split("_", 1)[0]: secs for name, secs in timings.items()}
    out = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": short,
        "sf": sf,
        "runs": runs,
        "stat": "min_per_query",
    }
    if errors:
        # queries that failed EVERY pass (after per-attempt retry); the
        # summary still ships — partial numbers beat no numbers
        out["errors"] = {
            name.split("_", 1)[0]: msg for name, msg in sorted(errors.items())
        }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
