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


_ORIG_DRAIN = W._drain


def set_default(n: int) -> None:
    """Force EVERY drain to n state partitions by wrapping _drain — the
    run_* defaults are not enough since q80/q81/q118 now pass their tuned
    state_partitions explicitly (this probe exists to re-measure exactly
    those tunings, so it must override them)."""

    def patched(stream_df, query_name, output_mode, timeout_sec,
                state_partitions, no_data_batch=True):
        return _ORIG_DRAIN(stream_df, query_name, output_mode, timeout_sec,
                           n, no_data_batch)

    W._drain = patched


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
    W._drain = _ORIG_DRAIN
    print(f"{'query':38s}" + "".join(f"  sp={n:>2d}" for n in arms))
    for q in STREAMING:
        print(f"{q:38s}" + "".join(f"  {results[n][q]:5.2f}" for n in arms))
    for n in arms:
        print(f"total sp={n}: {sum(results[n].values()):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
