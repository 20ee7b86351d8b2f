#!/usr/bin/env python
"""Per-query FLOOR decomposition (r10 VERDICT #1c: 'a committed proof
that the remainder is irreducible floor').

The bench fleet is 187 mostly-sub-second queries; the aggregate is
dominated by a per-query constant that no plan change removes. This
probe measures that constant directly: for each representative plan
SHAPE (0-shuffle scan, 1-shuffle agg, 2-shuffle agg+join, tiny
expression vs wide expression), build a FRESH DataFrame each iteration
(exactly what bench.py's registry does) and drive it through the noop
sink; report min/median over N runs. The difference between these
shapes and a cached re-collect isolates what is per-plan framework cost
(Py4J build + analysis + AQE stage scheduling + per-task expression
prep) versus data work.

Usage: python scripts/probe_query_floor.py [out_tsv]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geomesa_cassandra_tools_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("FLOOR_RUNS", "7"))


def main() -> None:
    out_tsv = (
        sys.argv[1] if len(sys.argv) > 1 else "bench_data/query_floor.tsv"
    )
    spark = get_spark(app_name="query-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    nation = os.path.join(SF_DIR, "nation.parquet")
    orders = os.path.join(SF_DIR, "orders.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    shapes = {
        "scan-0shuffle (25-row scan, project)":
            lambda: spark.read.parquet(nation).select("n_name"),
        "agg-1shuffle (groupBy count on 25 rows)":
            lambda: spark.read.parquet(nation).groupBy("n_regionkey").count(),
        "agg-1shuffle (orders sum, real column)":
            lambda: spark.read.parquet(orders).groupBy("o_orderstatus")
            .agg(F.sum("o_totalprice").alias("s")),
        "join+agg-2shuffle (orders x nation-sized dim)":
            lambda: spark.read.parquet(orders)
            .join(F.broadcast(spark.read.parquet(nation)),
                  F.col("o_orderkey") % 25 == F.col("n_nationkey"))
            .groupBy("n_name").count(),
        "wide-expression (20 chained arithmetic cols)":
            lambda: spark.read.parquet(orders).select(
                *[(F.col("o_totalprice") * i + i).alias(f"c{i}")
                  for i in range(20)]
            ).groupBy().sum("c1", "c2", "c3"),
    }
    rows = []
    for label, make in shapes.items():
        noop(make())  # warm shared caches (footer, codegen of the shape)
        walls = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            noop(make())  # FRESH plan each run — the bench registry shape
            walls.append(time.perf_counter() - t0)
        rows.append((label, min(walls), statistics.median(walls)))
    # the comparator: the SAME DataFrame object re-driven (plan +
    # AQE-materialized stages reused) — what execution alone costs
    df = shapes["agg-1shuffle (orders sum, real column)"]()
    noop(df)
    walls = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        noop(df)
        walls.append(time.perf_counter() - t0)
    rows.append(("CACHED-PLAN comparator (same DF re-driven)",
                 min(walls), statistics.median(walls)))

    header = (
        f"# per-query floor probe: sf_dir={SF_DIR} runs={N_RUNS} "
        "fresh-plan noop-sink walls (the bench registry shape)\n"
        "shape\tmin_s\tmedian_s"
    )
    lines = [header] + [f"{l}\t{mn:.3f}\t{md:.3f}" for l, mn, md in rows]
    print("\n".join(lines))
    os.makedirs(os.path.dirname(out_tsv), exist_ok=True)
    with open(out_tsv, "w") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
