"""A/B probe: streaming drain state_partitions default (8 vs 4 vs 2).

Streaming state instantiates one store per shuffle partition per
micro-batch; at sf0.1 the drains are small, so fewer stores may cut the
per-drain fixed cost. Interleaved within one tuned session, min-of-3 per
arm, mirroring bench.py's measurement.

Usage: python scripts/probe_state_partitions.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomesa_cassandra_tools_spark.session import get_spark
from geomesa_cassandra_tools_spark.queries import QUERIES, release_query_caches
from geomesa_cassandra_tools_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.1"
STREAMING = [
    "q32_stream_hourly_counts",
    "q33_stream_user_sessions",
    "q44_stream_stateful_totals",
    "q47_stream_sliding_rates",
    "q76_stream_session_expiry",
    "q80_stream_view_click_join",
    "q81_stream_dedup_watermark",
    "q118_stream_static_enrichment",
]


def set_default(n: int) -> None:
    # run_availablenow / run_availablenow_update: (timeout_sec, state_partitions)
    W.run_availablenow.__defaults__ = (120, n)
    W.run_availablenow_update.__defaults__ = (120, n)
    # run_appendmode: (timeout_sec, state_partitions, no_data_batch)
    W.run_appendmode.__defaults__ = (120, n, True)


def main() -> None:
    spark = get_spark(app_name="probe-state-partitions", master="local[32]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    arms = [8, 4, 2]
    results: dict[int, dict[str, float]] = {n: {} for n in arms}
    for rep in range(3):
        for n in arms:
            set_default(n)
            for q in STREAMING:
                release_query_caches()
                t0 = time.perf_counter()
                QUERIES[q](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                cur = results[n].get(q)
                results[n][q] = dt if cur is None else min(cur, dt)
        print(f"rep {rep} done", flush=True)
    set_default(8)
    print(f"{'query':38s}" + "".join(f"  sp={n:>2d}" for n in arms))
    for q in STREAMING:
        print(f"{q:38s}" + "".join(f"  {results[n][q]:5.2f}" for n in arms))
    for n in arms:
        print(f"total sp={n}: {sum(results[n].values()):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
