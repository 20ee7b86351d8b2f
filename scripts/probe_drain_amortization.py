#!/usr/bin/env python
"""Amortization proof for the streaming-drain floor (r9 VERDICT #5).

The r9 decomposition (scripts/probe_drain_floor.py, BENCH.md round-9
section) showed each ONE-SHOT availableNow drain pays ~0.5 s of engine
trigger machinery plus ~1.3 s of engine-managed Python source-runner
spawn. The claim to certify: that spawn is a per-QUERY cost, not a
per-BATCH cost — a long-lived processingTime stream pays it once, and
every subsequent micro-batch costs ≈ the engine trigger floor alone.

Method: ONE processingTime stream over a manifest feed; a writer
appends N commits, paced so each lands in its own micro-batch; the
engine's own recentProgress is read afterwards. Reported per batch:
triggerExecution (total in-batch ms), latestOffset + getBatch (the
Python source's share), addBatch (sink+exec). The first data batch
carries the spawn; the steady-state median is the amortized cost.

Usage: python scripts/probe_drain_amortization.py [n_commits] [out_tsv]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    out_tsv = (
        sys.argv[2] if len(sys.argv) > 2
        else "bench_data/drain_amortization.tsv"
    )
    from geomesa_cassandra_tools_spark.operators import transactional as tx
    from geomesa_cassandra_tools_spark.session import get_spark
    from geomesa_cassandra_tools_spark.sources import manifestfeed as mf

    spark = get_spark(app_name="drain-amortization-probe", master="local[8]")
    spark.conf.set("spark.sql.shuffle.partitions", "2")

    root = tempfile.mkdtemp(prefix="gcts_amort_")
    table = os.path.join(root, "t")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")
    tx.init_table(
        spark.createDataFrame([(0, "seed")], "k bigint, s string")
        .coalesce(1),
        table,
    )

    q = (
        mf.stream_feed(spark, table)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="400 milliseconds")
        .start()
    )
    t0 = time.perf_counter()
    try:
        # pace commits so each lands in its own trigger window
        for i in range(1, n_commits + 1):
            tx.append_batch(
                spark.createDataFrame([(i, f"r{i}")], "k bigint, s string")
                .coalesce(1),
                table,
            )
            time.sleep(0.55)
        # let the tail drain
        deadline = time.time() + 60
        while time.time() < deadline:
            got = q.lastProgress
            if got and got.get("sources") and str(
                got["sources"][0].get("endOffset")
            ).find(str(tx.current_version(table))) >= 0:
                break
            time.sleep(0.4)
        wall = time.perf_counter() - t0
        progress = [
            p if isinstance(p, dict) else json.loads(str(p))
            for p in q.recentProgress
        ]
    finally:
        q.stop()

    rows = []
    for p in progress:
        d = p.get("durationMs") or {}
        rows.append(
            {
                "batch": p.get("batchId"),
                "n_rows": p.get("numInputRows", 0),
                "trigger_ms": d.get("triggerExecution"),
                "source_ms": (d.get("latestOffset") or 0)
                + (d.get("getBatch") or 0),
                "add_batch_ms": d.get("addBatch"),
            }
        )
    data = [r for r in rows if r["n_rows"] > 0 and r["trigger_ms"] is not None]
    if not data:
        print("no data batches captured", file=sys.stderr)
        return 1
    first = data[0]
    steady = data[1:] or data
    med = statistics.median(r["trigger_ms"] for r in steady)
    med_src = statistics.median(r["source_ms"] for r in steady)
    os.makedirs(os.path.dirname(out_tsv), exist_ok=True)
    with open(out_tsv, "w") as f:
        f.write(
            "batch\tn_rows\ttrigger_ms\tsource_ms\tadd_batch_ms\n"
        )
        for r in rows:
            f.write(
                f"{r['batch']}\t{r['n_rows']}\t{r['trigger_ms']}\t"
                f"{r['source_ms']}\t{r['add_batch_ms']}\n"
            )
        f.write(
            f"# summary: n_commits={n_commits} data_batches={len(data)} "
            f"first_batch_ms={first['trigger_ms']} "
            f"steady_median_ms={med:.0f} steady_source_median_ms="
            f"{med_src:.0f} wall_s={wall:.1f}\n"
        )
    print(
        json.dumps(
            {
                "data_batches": len(data),
                "first_batch_ms": first["trigger_ms"],
                "steady_median_trigger_ms": med,
                "steady_median_source_ms": med_src,
                "one_shot_drain_comparison_ms": "~1800 (see BENCH.md r9)",
                "out": out_tsv,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
