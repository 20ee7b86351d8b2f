#!/usr/bin/env python
"""Fixed-LM perplexity scoring at synthetic scale (the q208 production
regime): the CCNet gate trains its LM ONCE on a fixed curated corpus and
scores an ever-growing crawl — the LM does not grow with the data. The
scale_proof harness scales BOTH sides (its corpus replication rotates
the training slice too), which steepens the 100x slopes artificially.
This probe isolates the production shape: LM estimated on the BASE
sf0.1 src0 slice, scoring the 10x and 100x crawls, Spark vs DuckDB,
min over SPARK_GRAFT_RUNS (default 2).

Writes bench_data/fixed_lm_scale.tsv. Note the vocabulary-rotation
caveat: scaled copies rotate the vocab, so copies beyond the first hit
the unseen-context backoff path (uniform 1/V) — the WORST case for the
LM joins (nothing matches, every row still pays both probes), so the
timing is conservative.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "2"))

    from geomesa_cassandra_tools_spark.functions import lm
    from geomesa_cassandra_tools_spark.queries import PPL_THRESHOLD_MICRO
    from geomesa_cassandra_tools_spark.session import get_spark

    from scale_proof import build_scaled_dir

    spark = get_spark(
        app_name="probe-fixed-lm", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    base_docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    train = base_docs.where(F.col("source") == "src0")

    rows = []
    for copies in (10, 100):
        scaled = build_scaled_dir(base, copies)
        docs = spark.read.parquet(os.path.join(scaled, "documents.parquet"))
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            lm.perplexity_filter(docs, train, PPL_THRESHOLD_MICRO).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows.append((copies, "spark", best))

    spark.stop()

    import duckdb

    from scale_proof import build_scaled_dir

    for copies in (10, 100):
        scaled = build_scaled_dir(base, copies)
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        con.execute(
            "CREATE VIEW documents_base AS SELECT * FROM read_parquet("
            f"'{os.path.join(base, 'documents.parquet')}')"
        )
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(scaled, 'documents.parquet')}')"
        )
        sql = FIXED_LM_SQL.format(th=PPL_THRESHOLD_MICRO)
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows.append((copies, "duckdb", best))
        con.close()

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_data",
        "fixed_lm_scale.tsv",
    )
    with open(out, "w") as f:
        f.write("copies\tengine\tmin_s\n")
        for copies, eng, sec in rows:
            f.write(f"{copies}\t{eng}\t{sec:.2f}\n")
    for r in rows:
        print(r)
    print(f"# written: {out}")


FIXED_LM_SQL = """
WITH arr_t AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents_base
  WHERE source = 'src0'
),
train_bi AS (
  SELECT a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2,
         count(*) AS c
  FROM arr_t, unnest(range(1, len(a))) AS t(i)
  WHERE len(a) >= 2 GROUP BY 1, 2
),
ctx AS (SELECT w1, sum(c) AS n FROM train_bi GROUP BY w1),
vocab AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(a) AS tok FROM arr_t)
),
arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
corpus_bi AS (
  SELECT doc_id, a[CAST(i AS INTEGER)] AS w1, a[CAST(i AS INTEGER) + 1] AS w2
  FROM arr, unnest(range(1, len(a))) AS t(i) WHERE len(a) >= 2
),
scored AS (
  SELECT cb.doc_id,
         CAST(round(-ln(
           (COALESCE(tb.c, 0) + 1.0) / (COALESCE(cx.n, 0) + vocab.v)
         ) * 1000000.0) AS BIGINT) AS nll_micro
  FROM corpus_bi cb
  LEFT JOIN train_bi tb ON cb.w1 = tb.w1 AND cb.w2 = tb.w2
  LEFT JOIN ctx cx ON cb.w1 = cx.w1
  CROSS JOIN vocab
)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(CAST(sum(nll_micro) AS BIGINT) // count(*) AS BIGINT)
         AS avg_nll_micro,
       CAST(CASE WHEN CAST(sum(nll_micro) AS BIGINT) // count(*) <= {th}
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM scored GROUP BY doc_id
"""


if __name__ == "__main__":
    main()
