#!/usr/bin/env python
"""Interleaved A/B of the shared-index bench policy (r13 VERDICT #2/#3).

Arms, alternated per round to cancel thermal/GC drift:
  rebuild  — release_shared_caches() before every pass (the r10-r12
             bench policy: the first family consumer pays the index
             build inside its timed region every pass)
  resident — indexes persist across passes (built inside the first
             pass's first consumer, then served; the production shape:
             ingestion maintains the index, queries serve from it)

Prints one TSV row per (query, arm): min / all timings. Usage:
  python scripts/probe_resident_index.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomesa_cassandra_tools_spark.queries import (  # noqa: E402
    QUERIES,
    release_query_caches,
    release_shared_caches,
)
from geomesa_cassandra_tools_spark.session import (  # noqa: E402
    data_sized_shuffle_partitions,
    get_spark,
)

FAMILY = [
    "q126_minhash_accuracy",
    "q13_dedup_doc_buckets",
    "q132_incremental_lsh_dedup",
    "q146_ann_recall_calibration",
    "q15_minhash_signatures",
    "q16_lsh_near_dups",
    "q26_lsh_cosine_topk",
    "q57_lsh_multiprobe_topk",
    "q58_neardup_clusters",
    # r13 optimization round: the cluster map, classifier feature table
    # and BM25 scored frame joined the resident tier — their consumers
    # A/B under the same arms
    "q175_cluster_keeper_by_quality",
    "q204_classifier_cluster_keeper",
    "q206_langid_classifier",
    "q154_bm25_retrieval",
    "q158_hybrid_rrf_retrieval",
    "q62_decontaminate_train",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    data_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(sf_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    spark = get_spark(
        app_name="probe-resident-index",
        master=f"local[{cpus}]",
        shuffle_partitions=data_sized_shuffle_partitions(
            data_bytes, int(cpus)
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in FAMILY if n in QUERIES]
    # warm scans once
    for n in names:
        QUERIES[n](spark, sf_dir).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()
    release_query_caches()
    release_shared_caches()

    res: dict[tuple[str, str], list[float]] = {}
    for rnd in range(rounds):
        for arm in ("rebuild", "resident"):
            # arm boundary: always start the ARM from a cold index so
            # 'resident' pays exactly one build in its FIRST pass and
            # serves in later passes; 'rebuild' pays it every pass
            release_shared_caches()
            for pas in range(2):
                if arm == "rebuild":
                    release_shared_caches()
                for n in sorted(names):
                    release_query_caches()
                    t0 = time.perf_counter()
                    QUERIES[n](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    res.setdefault((n, arm), []).append(
                        round(time.perf_counter() - t0, 3)
                    )
    release_query_caches()
    release_shared_caches()
    print("query\tarm\tmin\tall")
    for (n, arm), ts in sorted(res.items()):
        print(f"{n}\t{arm}\t{min(ts)}\t{','.join(str(t) for t in ts)}")


if __name__ == "__main__":
    main()
