#!/usr/bin/env python
"""Per-query Spark job/stage audit (r5 VERDICT item 6): how many JOBS and
STAGES each registry query launches for one noop-sink execution.

Why it matters: at sf0.1 the measured floor is ~25 ms per action and
~70-120 ms per shuffle stage, so a query's wall time is roughly
(jobs x action floor) + (stages x stage floor) + data work. A query
launching extra jobs for avoidable reasons (eager existence probes,
isEmpty checks, separate count actions, per-query index republish) pays
the floor multiple times; this audit makes those visible so the fix list
is data-driven instead of folklore.

Counting uses the public status tracker + job groups (no listener JNI):
each query runs inside its own job group; afterwards
`statusTracker().getJobIdsForGroup(group)` enumerates its jobs and
`getJobInfo(j).stageIds` its stages. Known limit: streaming drains spawn
their micro-batch jobs in Spark's stream-execution threads under the
STREAM's own job group, which the public tracker can only enumerate by
group id we don't know — so streaming queries' micro-batch jobs are NOT
counted here (their group-attributed rows undercount; the bench wall
time, not this audit, is their cost signal).

Usage: python scripts/audit_jobs.py [sf_dir] [> report.tsv]
Prints one TSV row per query: name, jobs, stages, tasks, flag.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomesa_cassandra_tools_spark.queries import (  # noqa: E402
    QUERIES,
    release_query_caches,
    release_shared_caches,
)
from geomesa_cassandra_tools_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="geomesa-spark-job-audit", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm scans once so footer/schema reads don't count as query jobs
    from geomesa_cassandra_tools_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).write.format("noop").mode("overwrite").save()

    release_shared_caches()
    print("query\tjobs\tstages\ttasks\tflag")
    rows = []
    for name, fn in sorted(QUERIES.items()):
        release_query_caches()
        group = f"audit-{name}"
        sc.setJobGroup(group, name)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            sc.setJobGroup("", "")
        jids = sorted(set(tracker.getJobIdsForGroup(group) or []))
        stages = 0
        tasks = 0
        seen_stages: set[int] = set()
        for j in jids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                if s in seen_stages:
                    continue
                seen_stages.add(s)
                stages += 1
                sinfo = tracker.getStageInfo(s)
                if sinfo is not None:
                    tasks += sinfo.numTasks
        flag = ""
        if len(jids) > 2:
            flag = "multi-job"
        rows.append((name, len(jids), stages, tasks, flag))
        print(f"{name}\t{len(jids)}\t{stages}\t{tasks}\t{flag}")
    release_query_caches()
    release_shared_caches()

    worst = sorted(rows, key=lambda r: (-r[1], -r[2]))[:15]
    print("\n# top by job count:", file=sys.stderr)
    for r in worst:
        print(f"#   {r[0]}: jobs={r[1]} stages={r[2]} tasks={r[3]}", file=sys.stderr)


if __name__ == "__main__":
    main()
