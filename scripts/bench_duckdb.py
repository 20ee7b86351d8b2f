#!/usr/bin/env python
"""DuckDB-side timing of every oracle_sql() at $SPARK_GRAFT_SF_DIR — the
practical baseline named in BASELINE.md (the reference publishes no
numbers). Prints one JSON line mirroring bench.py's shape."""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomesa_cassandra_tools_spark.oracles import ORACLES
from geomesa_cassandra_tools_spark.sources.tables import TABLES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "4"))
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name, sql in sorted(ORACLES.items()):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_wall_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs": runs,
                "stat": "min_per_query",
            }
        )
    )


if __name__ == "__main__":
    main()
