"""Synthesized text fixtures materialized once per (process, corpus dir).

Queries that reproduce the reference's text-ingestion surface (nodetool
output -> splitlines -> regex -> dict, /root/reference/node.py:110-114) need
raw command-output lines as input.  The driver corpus is parquet tables, so
the lines are synthesized deterministically from ``events`` — but that
synthesis is *fixture construction*, not the parse/aggregate operator under
test.  Materializing it here once per corpus dir mirrors the real
deployment shape (command output captured to storage, then ingested) and
keeps benchmarks timing the ingestion engine, not per-row fixture assembly.

The artifact is written to a process-local temp dir with an atomic
directory rename, so concurrent sessions of the same process reuse one
copy and a crashed half-write is never read back.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.sources.tables import load_table

_FIXTURE_ROOT = os.path.join(
    tempfile.gettempdir(), f"spark_graft_fixtures_{os.getuid()}"
)


#: bump when the fixture LAYOUT changes (file count, ordering): the tag
#: below keys the cached artifact, so an old-layout cache must miss.
_FIXTURE_LAYOUT_VERSION = 2

#: Files per stored fixture. Raw text lines are consumed by regex-heavy
#: parse operators whose map-side cost dwarfs the scan itself; a
#: single-file (single-row-group) artifact pins ALL of that regex work to
#: one task, so the write fans out into N files to let the read
#: parallelize — the ingest-side layout decision that at 100 TB is "land
#: command output in many objects, not one giant log file".
_FIXTURE_FILES = 8


def _fixture_path(sf_dir: str, name: str, source_table: str) -> str:
    """Keyed by corpus path AND the source table's (size, mtime) — a
    regenerated corpus at the same path must rebuild, never serve stale
    lines (same contract as queries._z_ordered_events_path)."""
    src = os.path.join(sf_dir, f"{source_table}.parquet")
    stat = f"{os.path.getsize(src)}_{int(os.path.getmtime(src))}"
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{stat}|v{_FIXTURE_LAYOUT_VERSION}".encode()
    ).hexdigest()[:12]
    return os.path.join(_FIXTURE_ROOT, tag, name)


def _materialize(df: DataFrame, path: str) -> None:
    """Write ``df`` to ``path`` with last-writer-wins atomicity: build in a
    pid-unique staging dir, then a single ``os.rename`` publishes it."""
    staging = f"{path}.tmp-{os.getpid()}"
    df.repartition(_FIXTURE_FILES).write.mode("overwrite").parquet(staging)
    try:
        os.rename(staging, path)
    except OSError:
        # another writer published first — its copy is identical (the
        # synthesis is deterministic); drop ours
        shutil.rmtree(staging, ignore_errors=True)


def compaction_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodetool-compactionstats-shaped raw lines for the corpus at
    ``sf_dir``: one data line per ``events`` row (UUID derived from md5 of
    the event id, keyspace/table from user_id residues) plus 50 noise
    header lines that the parser must drop.  Built and stored once; every
    subsequent call is a plain parquet scan."""
    path = _fixture_path(sf_dir, "compaction_lines.parquet", "events")
    if not os.path.isdir(path):
        ev = load_table(spark, sf_dir, "events")
        m = F.md5(F.encode(F.col("event_id").cast("string"), "UTF-8"))
        uid = F.concat_ws(
            "-",
            F.substring(m, 1, 8), F.substring(m, 9, 4), F.substring(m, 13, 4),
            F.substring(m, 17, 4), F.substring(m, 21, 12),
        )
        data_lines = ev.select(
            F.concat(
                F.lit("   "), uid, F.lit(" "), F.col("event_type"),
                F.lit(" ks"), (F.col("user_id") % 3).cast("string"),
                F.lit(" t"), (F.col("user_id") % 5).cast("string"),
                F.lit(" 1024 bytes 4096 total"),
            ).alias("value")
        )
        noise = ev.limit(50).select(F.lit("pending tasks: 7").alias("value"))
        _materialize(data_lines.unionAll(noise), path)
    return spark.read.parquet(path)
