"""Table-maintenance pipeline — the engine analog of the reference's
7-stage schema-removal flow (/root/reference/geomesa_cassandra.py:66-85:
flush → stop compactions → truncate → clear snapshots → repair → cleanup →
compact) and its TTL/gc_grace management (:259-290).

On a data platform those stages map to: identify physical tables from the
catalog → delete rows / truncate → compact small files (repartition+rewrite)
→ vacuum obsolete files → record an audit row per action. Every action
returns a `(stage, table, action, rows_or_files, ok)` record so the whole
pipeline's output is itself a queryable DataFrame — the reference's
`(stdout, stderr)` universal IR (/root/reference/remote.py:57-63) upgraded
to a typed audit log.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.catalog import GeoCatalog

AUDIT_SCHEMA = "stage int, table string, action string, detail string, ok boolean"


@dataclass
class MaintenanceRun:
    spark: SparkSession
    audit: list[tuple] = field(default_factory=list)

    def _log(self, stage: int, table: str, action: str, detail: str, ok: bool = True) -> None:
        self.audit.append((stage, table, action, detail, ok))

    def audit_df(self) -> DataFrame:
        return self.spark.createDataFrame(self.audit, AUDIT_SCHEMA)


def ttl_expire(df: DataFrame, ts_col: str, ttl_seconds: int, now_ts) -> DataFrame:
    """Row-TTL semantics (`ALTER TABLE … default_time_to_live`,
    /root/reference/geomesa_cassandra.py:259-273): Spark has no row TTL, so
    expiry is a scheduled job keeping rows newer than now-ttl. The predicate
    is partition-prunable when the table is date-partitioned on ``ts_col``."""
    cutoff = F.lit(now_ts) - F.make_interval(secs=F.lit(ttl_seconds))
    return df.where(F.col(ts_col) >= cutoff)


#: Per-table maintenance properties — the engine's row-store analog of
#: `ALTER TABLE … WITH default_time_to_live / gc_grace_seconds`. Kept as a
#: (tiny, always-broadcastable) DataFrame so maintenance jobs can join it.
PROPERTIES_SCHEMA = "keyspace string, table string, property string, value bigint"

GC_GRACE_PROPERTY = "gc_grace_seconds"
TTL_PROPERTY = "default_time_to_live"


def set_table_property(
    spark: SparkSession,
    props: DataFrame | None,
    keyspace: str,
    table: str,
    prop: str,
    value: int,
) -> DataFrame:
    """Upsert one `(keyspace, table, property) → value` row — the analog of
    one `ALTER TABLE … WITH <property> = <value>` statement
    (/root/reference/geomesa_cassandra.py:273-275, :288-290). Immutable
    frame in, immutable frame out; the caller persists."""
    row = spark.createDataFrame([(keyspace, table, prop, int(value))], PROPERTIES_SCHEMA)
    if props is None:
        return row
    kept = props.where(
        ~(
            (F.col("keyspace") == keyspace)
            & (F.col("table") == table)
            & (F.col("property") == prop)
        )
    )
    return kept.unionByName(row)


def set_schema_gc_grace(
    spark: SparkSession,
    catalog: GeoCatalog,
    props: DataFrame | None,
    keyspace: str,
    cat_name: str,
    sft: str,
    gc_grace_seconds: int,
) -> tuple[DataFrame, DataFrame]:
    """`change_gc_grace_seconds` (/root/reference/geomesa_cassandra.py:276-286):
    resolve the SFT's physical tables from the catalog, then set the
    retention property on each. The reference loops `ALTER TABLE` per table
    over the wire; here each becomes a property upsert plus an audit row.
    Returns (updated properties frame, audit frame)."""
    run = MaintenanceRun(spark)
    tables = [r["table"] for r in catalog.find_schema_tables(keyspace, cat_name, sft).collect()]
    run._log(0, "", "identify_schema_tables", f"found={len(tables)}")
    for t in tables:
        props = set_table_property(spark, props, keyspace, t, GC_GRACE_PROPERTY, gc_grace_seconds)
        run._log(1, t, "set_gc_grace_seconds", str(gc_grace_seconds))
    if props is None:
        props = spark.createDataFrame([], PROPERTIES_SCHEMA)
    return props, run.audit_df()


def vacuum_tombstones(
    df: DataFrame, deleted_ts_col: str, gc_grace_seconds: int, now_ts
) -> DataFrame:
    """The job that HONORS gc_grace: Cassandra keeps tombstones for
    gc_grace_seconds (so lagging replicas can repair) and purges them at the
    next compaction after the grace expires. The platform analog is
    soft-delete + vacuum: rows carry a nullable ``deleted_ts`` column;
    readers filter `deleted_ts IS NULL`; this vacuum pass physically drops
    rows whose tombstone is older than the grace cutoff and KEEPS both live
    rows and recent tombstones (still within their repair window).

    The predicate is a pure column expression — partition-prunable when the
    table is date-partitioned on the tombstone column, so at 100 TB the
    vacuum rewrites only partitions old enough to contain eligible rows."""
    cutoff = F.lit(now_ts) - F.make_interval(secs=F.lit(gc_grace_seconds))
    return df.where(F.col(deleted_ts_col).isNull() | (F.col(deleted_ts_col) >= cutoff))


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> tuple[int, int]:
    """Small-file compaction (`nodetool compact` analog,
    /root/reference/geomesa_cassandra.py:188-191): rewrite a parquet dir to
    ~target-sized files. Returns (files_before, files_after)."""
    df = spark.read.parquet(path)
    files_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    if files_before == 0:
        # hive-partitioned (part_day=…/ subdirs) or empty table: rewriting
        # it flat would silently DESTROY the partition layout — compaction
        # of a partitioned table is a per-partition job
        raise ValueError(
            f"compact_parquet: no top-level parquet files under {path!r} — "
            "partitioned tables must be compacted per partition directory"
        )
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n = max(1, total_bytes // (target_file_mb * 1024 * 1024))
    tmp = path.rstrip("/") + ".compact_tmp"
    df.repartition(int(n)).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    files_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    return files_before, files_after


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, granularity: str = "day"
) -> None:
    """Hive-partitioned layout by time bucket (`partitionBy` on a derived
    date column) — the coarse time binning GeoMesa's z3 applies INSIDE its
    key, externalized as directories. Queries filtering on the partition
    column scan only matching directories (PartitionFilters in the plan,
    asserted in tests/test_plans.py) — at 100 TB this is the difference
    between listing a day and listing a decade. Within each partition,
    finer layout (z2/z3 sort, `geo.write_z_ordered`) still applies.

    Sub-day granularities keep the truncated TIMESTAMP as the partition
    value — the previous unconditional cast-to-date silently collapsed
    'hour'/'minute' to day partitioning (directories identical to 'day',
    no error, no hourly pruning)."""
    trunc = F.date_trunc(granularity, F.col(ts_col))
    if granularity.lower() in ("day", "week", "month", "quarter", "year"):
        trunc = trunc.cast("date")
    part = trunc.alias("part_day")
    (
        df.withColumn("part_day", part)
        .repartition("part_day")
        .write.mode("overwrite")
        .partitionBy("part_day")
        .parquet(path)
    )


def remove_schema(
    spark: SparkSession,
    catalog: GeoCatalog,
    keyspace: str,
    cat_name: str,
    sft: str,
    table_paths: dict[str, str],
    fmt: str = "parquet",
) -> tuple[GeoCatalog, DataFrame]:
    """The full removal pipeline: resolve the SFT's physical tables from the
    catalog, verify existence (anti-join, not N probes), truncate each,
    compact/vacuum, and delete the catalog row. Stages that are pure
    Cassandra ops in the reference (flush/repair/cleanup/stop compactions)
    have no analytics content here (SURVEY.md §7.5) — they are recorded as
    no-op audit rows so the pipeline shape is preserved.

    ``fmt``:

    - ``"parquet"`` (default): plain directories — truncate is overwrite-
      with-empty + rmtree/rename. Correct SINGLE-WRITER semantics only: a
      concurrent reader listing the directory mid-rewrite sees a torn
      table.
    - ``"manifest"``: ``table_paths`` point at manifest tables
      (operators/transactional.py) — truncate is ONE atomic manifest
      commit (the analog of the reference's single-statement TRUNCATE) and
      the compact stage becomes a vacuum of the unreferenced data files.
      Concurrent readers keep their pinned snapshot throughout.
    """
    if fmt not in ("parquet", "manifest"):
        raise ValueError(f"unknown fmt {fmt!r}: expected 'parquet' or 'manifest'")
    from geomesa_cassandra_tools_spark.operators import transactional

    run = MaintenanceRun(spark)
    tables = [r["table"] for r in catalog.find_schema_tables(keyspace, cat_name, sft).collect()]
    run._log(0, "", "identify_schema_tables", f"found={len(tables)}")

    missing = [
        t
        for t in tables
        if t not in table_paths
        or (fmt == "manifest" and transactional.current_version(table_paths[t]) < 0)
    ]
    if missing:
        run._log(1, ",".join(missing), "tables_exist", "missing", ok=False)
        raise ValueError(f"tables do not exist: {missing}")
    run._log(1, ",".join(tables), "tables_exist", "all present")

    for t in tables:
        path = table_paths[t]
        storage = "manifest table" if fmt == "manifest" else "parquet"
        run._log(2, t, "flush", f"no-op on {storage}")
        run._log(3, t, "stop_compactions", f"no-op on {storage}")
        if fmt == "manifest":
            v = transactional.truncate_table(path)
            run._log(4, t, "truncate", f"atomic manifest commit v{v}")
            run._log(5, t, "clear_snapshots", "superseded snapshots held for vacuum")
            # the removal pipeline is a single-writer admin operation —
            # no concurrent appender can exist, so in-flight grace is off
            removed = transactional.vacuum(path, grace_seconds=0)
            run._log(6, t, "compact", f"vacuum removed {removed} data files")
        else:
            df = spark.read.parquet(path)
            empty = spark.createDataFrame([], df.schema)
            tmp = path.rstrip("/") + ".trunc_tmp"
            empty.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(path)
            os.rename(tmp, path)
            run._log(4, t, "truncate", "overwrote with empty frame")
            run._log(5, t, "clear_snapshots", "no-op on parquet")
            before, after = compact_parquet(spark, path)
            run._log(6, t, "compact", f"files {before}->{after}")

    new_catalog = catalog.remove_sft(keyspace, cat_name, sft)
    run._log(7, "", "remove_sft_from_catalog", sft)
    return new_catalog, run.audit_df()
