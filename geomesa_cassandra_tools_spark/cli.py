"""Console entry point — the reference's CLI verbs over the Spark engine.

The reference IS a command-line tool: every user interaction is
``python geomesa.py list-sfts -k ks -c cat`` or ``python cluster.py
find-table-compactions -k ks -t tbl`` (argparse ladders at
/root/reference/geomesa.py:10-30,144-161 and
/root/reference/cluster.py:13-28,190-236). This module keeps that UX —
same verb names, same short flags — but the verbs resolve to DataFrame
operations instead of SSH+cqlsh/nodetool calls:

- catalog verbs read a catalog parquet (``--catalog-path``) through
  `GeoCatalog`;
- cluster verbs ingest captured ``nodetool`` output text (``--log``)
  through `functions/parsing` — the deployment shape where command output
  is landed to storage and queried, rather than scraped live (the live
  Cassandra wire is out of scope here; see sources/ring.py);
- ``status`` reads a remotes.json-shaped registry
  (/root/reference/remotes.json.example) and, when ``--info-dir`` holds
  per-node ``nodetool info`` captures (<name>.txt), the reference's
  three-flag health predicate (/root/reference/node.py:48-55);
- ``sql`` is the reference's one-statement escape hatch
  (``-e/--cql-command``, /root/reference/geomesa.py:17, node.py:312) as
  Spark SQL over registered views; ``table-exists`` /
  ``truncate-table`` / ``remove-schema`` close the maintenance verb
  surface (/root/reference/node.py:316-322, geomesa.py:31-55) over the
  manifest-transactional or plain-parquet layouts (``--fmt``);
- manifest lifecycle verbs: ``versions`` (DESCRIBE HISTORY analog),
  ``read-table`` (snapshot read, ``--version`` pins time travel),
  ``vacuum`` (``--keep-versions``/``--grace-seconds``), and
  ``compact-table`` (the reference pipeline's final compact stage,
  /root/reference/geomesa_cassandra.py:188-191, as one atomic OPTIMIZE
  commit), ``merge-table`` (atomic upsert by key),
  ``table-changes`` (row-level change feed between commits —
  ``--from-version``/``--to-version``), ``delete-where``
  (transactional DELETE; ``--delete-mode dv`` marks rows in a
  deletion-vector sidecar instead of rewriting files), and
  ``restore-table`` (Delta RESTORE: roll back to ``--version`` as a
  new commit, history preserved), ``add-constraint`` /
  ``drop-constraint`` (ALTER TABLE ADD/DROP CONSTRAINT — ``--not-null
  COL`` or ``--check NAME=EXPR``; ADD validates existing data first),
  and ``clone-table`` (Delta SHALLOW CLONE: ``--target-path`` gets a
  zero-copy v0 referencing the source snapshot's files; compact-table
  on the clone materializes it).

Results print as TSV rows on stdout (header first), so the output pipes
into cut/awk the way the reference's log lines do.

Run as ``python -m geomesa_cassandra_tools_spark.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _parse_date(s: str):
    """ISO date literal for --scope typed equality (raises ValueError
    on non-dates, letting the conversion chain fall through)."""
    import datetime

    return datetime.date.fromisoformat(s)


def _typed_scope_literal(table_path: str, col: str, raw: str):
    """Resolve a --scope literal's Python type from the TABLE SCHEMA, not
    from its spelling: a numeric-looking value on a string-typed column
    must stay a string, or the file-skipping comparison turns mixed-type
    (int vs str span). Unknown columns and nested types pass the raw
    string through — `_file_survives` keeps files conservatively when a
    literal doesn't order against a span."""
    import datetime
    import json as _json

    from geomesa_cassandra_tools_spark.operators import transactional

    t = None
    v = transactional.current_version(table_path)
    if v >= 0:
        man = transactional._read_manifest(table_path, v)
        for f in _json.loads(man["schema"])["fields"]:
            if f["name"] == col and isinstance(f.get("type"), str):
                t = f["type"]
                break
    if t in ("byte", "short", "integer", "long"):
        return int(raw)
    if t in ("float", "double") or (t or "").startswith("decimal"):
        return float(raw)
    if t == "date":
        return _parse_date(raw)
    if t in ("timestamp", "timestamp_ntz"):
        return datetime.datetime.fromisoformat(raw)
    return raw  # string / boolean-as-text / unknown: verbatim


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="geomesa-cassandra-tools-spark",
        description="GeoMesa-cassandra tools, Spark engine edition.",
    )
    p.add_argument("command", help="The command to run")
    # reference short flags preserved (/root/reference/geomesa.py:13-16,
    # cluster.py:20-22)
    p.add_argument("-k", "--keyspace", help="the schema keyspace")
    p.add_argument("-c", "--catalog", help="the schema catalog")
    p.add_argument("-f", "--feature-name", help="the schema (SFT) name")
    p.add_argument("-t", "--table", help="the table to use")
    p.add_argument("--catalog-path", help="parquet path of the catalog table")
    p.add_argument(
        "--tables-file",
        help="text file of existing physical table names (one per line)",
    )
    p.add_argument("--log", help="captured nodetool output text file")
    p.add_argument(
        "--nodes-file", default="remotes.json", help="node registry JSON"
    )
    p.add_argument(
        "--info-dir", help="directory of per-node `nodetool info` captures"
    )
    # the reference's SQL escape hatch flag (-e/--cql-command,
    # /root/reference/geomesa.py:17, cluster.py:232, node.py:312)
    p.add_argument("-e", "--command-sql", help="SQL statement to execute")
    p.add_argument(
        "--data-dir",
        help="directory of the standard parquet tables to register as views",
    )
    p.add_argument("--table-path", help="path of one physical table")
    p.add_argument(
        "--tables-dir",
        help="directory holding each physical table at <dir>/<table-name>",
    )
    p.add_argument(
        "--fmt",
        default="parquet",
        choices=("parquet", "manifest"),
        help="physical table layout for maintenance verbs",
    )
    # manifest lifecycle verbs (versions / read-table / vacuum /
    # compact-table) — the library surface at operators/transactional.py
    p.add_argument(
        "--version", type=int, default=None,
        help="pin a read to this snapshot version (time travel)",
    )
    p.add_argument(
        "--limit", type=int, default=20,
        help="max rows read-table prints (0 = all)",
    )
    p.add_argument(
        "--keep-versions", type=int, default=1,
        help="vacuum: how many trailing snapshots stay time-travelable",
    )
    p.add_argument(
        "--grace-seconds", type=int, default=600,
        help="vacuum: age a file must reach before reclaim (in-flight guard)",
    )
    p.add_argument(
        "--target-bytes", type=int, default=128 << 20,
        help="compact-table: bin-pack files smaller than this",
    )
    p.add_argument(
        "--batch-path", help="merge-table: parquet path of the upsert batch"
    )
    p.add_argument(
        "--from-version", type=int, default=0,
        help="table-changes: first commit of the change range (inclusive)",
    )
    p.add_argument(
        "--to-version", type=int, default=None,
        help="table-changes: last commit of the range (default: latest)",
    )
    p.add_argument(
        "--merge-keys",
        help="merge-table: comma-separated key column names",
    )
    p.add_argument(
        "--where",
        help="delete-where: SQL boolean condition over the table's columns",
    )
    p.add_argument(
        "--delete-mode", choices=("rewrite", "dv"), default="rewrite",
        help="delete-where: rewrite hit files, or mark rows in a "
             "deletion-vector sidecar (no data file rewritten)",
    )
    p.add_argument(
        "--as-of", default=None, metavar="ISO_DATETIME|EPOCH",
        help="read-table: TIMESTAMP AS OF — read the latest snapshot "
             "committed at or before this instant",
    )
    p.add_argument(
        "--dry-run", action="store_true",
        help="vacuum: report what would be reclaimed without removing "
             "anything",
    )
    p.add_argument(
        "--scope", default=None, metavar="COL=VALUE",
        help="compact-table: OPTIMIZE ... WHERE — only files whose "
             "recorded span matches the equality rewrite (compact one "
             "partition of a date-partitioned table)",
    )
    p.add_argument(
        "--not-null", default=None, metavar="COL",
        help="add-constraint/drop-constraint: NOT NULL column",
    )
    p.add_argument(
        "--check", default=None, metavar="NAME=EXPR",
        help="add-constraint: named CHECK constraint (SQL boolean "
             "expression); drop-constraint takes just NAME",
    )
    p.add_argument(
        "--rename", default=None, metavar="OLD=NEW",
        help="rename-column: logical rename (metadata-only; the data "
             "files keep the physical name via column mapping)",
    )
    p.add_argument(
        "--column", default=None, metavar="COL",
        help="drop-column: the column to drop (metadata-only)",
    )
    p.add_argument(
        "--stats-cols", default=None, metavar="COL[,COL...]",
        help="convert-table: columns whose per-file min/max harvest "
             "from the footers for data skipping",
    )
    p.add_argument(
        "--add", default=None, metavar="COL=TYPE",
        help="add-column: net-new nullable column (metadata-only; "
             "Spark DDL type, e.g. note=string, amt=decimal(10,2))",
    )
    p.add_argument(
        "--target-path", default=None,
        help="clone-table: path of the new (shallow) clone",
    )
    p.add_argument(
        "--zorder-by", default=None, metavar="COL[,COL...]",
        help="compact-table: rewrite EVERY live file clustered by the "
             "multi-column z-order interleave and add the columns to the "
             "table's stats (OPTIMIZE ... ZORDER BY)",
    )
    p.add_argument(
        "--metastore", default=None, metavar="ROOT",
        help="sql/tables: attach the durable name->path metastore rooted "
             "here (operators/metastore.py) — every registered table "
             "binds by pure name, CREATE TABLE may omit LOCATION, and "
             "SHOW TABLES / DROP TABLE work",
    )
    p.add_argument(
        "--manifest-view", action="append", default=[],
        metavar="NAME=PATH[@VERSION]",
        help="sql: register a manifest table as view NAME before running "
             "the statement (repeatable; @VERSION pins a time-travel "
             "snapshot)",
    )
    return p


def _require(parser: argparse.ArgumentParser, args: argparse.Namespace, *names: str):
    missing = [n for n in names if getattr(args, n.replace("-", "_")) is None]
    if missing:
        parser.error(
            f"{args.command}: required arguments missing: "
            + ", ".join(f"--{n}" for n in missing)
        )


def _emit(df: DataFrame, out) -> int:
    """Print a (small) result frame as TSV and return its row count. CLI
    results are catalog/ops listings — bounded metadata, never data-scale —
    so the collect here is the same driver-bounded read the reference's
    log-print is."""
    cols = df.columns
    print("\t".join(cols), file=out)
    n = 0
    for row in df.collect():
        print("\t".join("" if row[c] is None else str(row[c]) for c in cols), file=out)
        n += 1
    return n


def _spark() -> SparkSession:
    from geomesa_cassandra_tools_spark.session import get_spark

    return get_spark(app_name="geomesa-cassandra-tools-cli")


def _swap_catalog(df: DataFrame, catalog_path: str) -> None:
    """Publish a rewritten catalog with a staged swap: write the new copy,
    move the ORIGINAL aside (atomic rename), publish the new copy (atomic
    rename), then delete the old — a crash at any point leaves the old
    catalog (possibly under the .old name, trivially recoverable) or the
    new one, never NO catalog at the path. Single-writer semantics, like
    the reference's one-admin CLI. The path may be a directory OR a single
    parquet file (GeoCatalog.load accepts both)."""
    staging = f"{catalog_path}.tmp-{os.getpid()}"
    backup = f"{catalog_path}.old-{os.getpid()}"
    df.write.mode("overwrite").parquet(staging)
    os.rename(catalog_path, backup)
    try:
        os.rename(staging, catalog_path)
    except OSError:
        os.rename(backup, catalog_path)  # restore; staging kept for debug
        raise
    if os.path.isdir(backup):
        shutil.rmtree(backup, ignore_errors=True)
    else:
        os.unlink(backup)


def main(argv: Sequence[str] | None = None, out=None) -> int:
    parser = _parser()
    args = parser.parse_args(argv)
    out = out if out is not None else sys.stdout

    from geomesa_cassandra_tools_spark.catalog import GeoCatalog, nodes_registry
    from geomesa_cassandra_tools_spark.functions import parsing

    cmd = args.command

    if cmd == "tables":
        # SHOW TABLES, CLI face: the durable metastore catalog
        _require(parser, args, "metastore")
        from geomesa_cassandra_tools_spark.operators.metastore import (
            Metastore,
        )

        ms = Metastore(args.metastore)
        _emit(ms.tables(_spark()).orderBy("name"), out)
        return 0

    if cmd == "list-sfts":
        _require(parser, args, "keyspace", "catalog", "catalog-path")
        cat = GeoCatalog.load(_spark(), args.catalog_path)
        _emit(cat.list_sfts(args.keyspace, args.catalog).orderBy("sft"), out)
        return 0

    if cmd == "find-schema-tables":
        _require(parser, args, "keyspace", "catalog", "feature-name", "catalog-path")
        cat = GeoCatalog.load(_spark(), args.catalog_path)
        _emit(
            cat.find_schema_tables(
                args.keyspace, args.catalog, args.feature_name
            ).orderBy("table"),
            out,
        )
        return 0

    if cmd == "schema-tables-exist":
        # reference: N concurrent DESCRIBEs + all() gate
        # (/root/reference/geomesa.py:61-67) -> one left-anti join; exit
        # code carries the boolean like any shell predicate
        _require(
            parser, args, "keyspace", "catalog", "feature-name",
            "catalog-path", "tables-file",
        )
        spark = _spark()
        cat = GeoCatalog.load(spark, args.catalog_path)
        existing = spark.read.text(args.tables_file).select(
            F.col("value").alias("table")
        )
        ok = cat.tables_exist(args.keyspace, args.catalog, args.feature_name, existing)
        print(str(ok).lower(), file=out)
        return 0 if ok else 1

    if cmd == "sql":
        # the reference's escape hatch: execute one statement verbatim
        # (`-e/--cql-command`, /root/reference/geomesa.py:17,
        # cluster.py:232, node.py:312) — here the statement is Spark SQL
        # over the registered views instead of CQL over the wire. q53
        # certifies the passthrough semantics; this verb is its CLI face.
        # DML verbs (INSERT/UPDATE/DELETE/MERGE) against --manifest-view
        # names route through the transactional layer (operators/sqldml)
        # — the CQL hatch was read-write, so is this one.
        _require(parser, args, "command-sql")
        spark = _spark()
        if args.data_dir:
            from geomesa_cassandra_tools_spark.sources.tables import load_tables

            for name, df in load_tables(spark, args.data_dir).items():
                df.createOrReplaceTempView(name)
        if args.catalog_path:
            GeoCatalog.load(spark, args.catalog_path).df.createOrReplaceTempView(
                "catalog"
            )
        for spec in args.manifest_view:
            # NAME=PATH[@VERSION]: the manifest-table face of the escape
            # hatch — snapshot-pinned, deletion vectors applied
            from geomesa_cassandra_tools_spark.operators import transactional

            if "=" not in spec:
                parser.error(
                    f"--manifest-view needs NAME=PATH[@VERSION], got {spec!r}"
                )
            vname, target = spec.split("=", 1)
            ver = None
            if "@" in target:
                head, vraw = target.rsplit("@", 1)
                # only treat the suffix as a version if it parses — a
                # path may legitimately contain '@'
                try:
                    ver = int(vraw)
                    target = head
                except ValueError:
                    parser.error(
                        f"--manifest-view: {spec!r} has a non-integer "
                        "@VERSION suffix (quote the path or drop the @)"
                    )
            transactional.register_manifest_view(
                spark, target, name=vname, version=ver
            )
        from geomesa_cassandra_tools_spark.operators import sqldml

        if args.metastore:
            from geomesa_cassandra_tools_spark.operators.metastore import (
                Metastore,
            )

            ms = Metastore(args.metastore)
            ms.attach(spark)
            sqldml.set_metastore(ms)
        try:
            res = sqldml.execute(spark, args.command_sql)
        finally:
            if args.metastore:
                sqldml.set_metastore(None)
        if isinstance(res, dict):
            print("key\tvalue", file=out)
            for k, v in res.items():
                print(f"{k}\t{v}", file=out)
        else:
            _emit(res, out)
        return 0

    if cmd == "table-exists":
        # reference node.py:316-322: DESCRIBE-based existence probe with
        # the boolean in the exit code. Two stores: a tables-file listing
        # (the captured-DESCRIBE deployment shape) or a physical path
        # (parquet dir / manifest table, per --fmt).
        _require(parser, args, "table")
        if args.table_path is None and args.tables_file is None:
            parser.error("table-exists: provide --table-path or --tables-file")
        if args.table_path is not None:
            if args.fmt == "manifest":
                from geomesa_cassandra_tools_spark.operators import transactional

                ok = transactional.current_version(args.table_path) >= 0
            else:
                ok = os.path.exists(args.table_path)
        else:
            spark = _spark()
            listing = spark.read.text(args.tables_file).select(
                F.col("value").alias("table")
            )
            ok = listing.where(F.col("table") == args.table).limit(1).count() > 0
        print(str(ok).lower(), file=out)
        return 0 if ok else 1

    if cmd == "truncate-table":
        # reference node.py:320-322 `TRUNCATE {table}`: one atomic
        # manifest commit (fmt=manifest) or the single-writer staged
        # overwrite (fmt=parquet) — the same split remove_schema uses.
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        if args.fmt == "manifest":
            v = transactional.truncate_table(args.table_path)
            print(f"truncated manifest table {args.table_path} at v{v}", file=out)
            return 0
        spark = _spark()
        df = spark.read.parquet(args.table_path)
        empty = spark.createDataFrame([], df.schema)
        # same staged swap as the catalog publish — including the
        # single-FILE table shape, where the backup needs unlink not rmtree
        _swap_catalog(empty, args.table_path.rstrip("/"))
        print(f"truncated parquet table {args.table_path}", file=out)
        return 0

    if cmd == "versions":
        # DESCRIBE HISTORY analog: one row per still-resolvable commit
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        print("version\top\tn_add\tn_remove\tn_dv\tcommitted_at", file=out)
        import datetime as _dt

        for h in transactional.table_history(args.table_path):
            ts = h.get("ts")
            when = (
                _dt.datetime.fromtimestamp(ts).isoformat(timespec="seconds")
                if ts else ""
            )
            print(
                f"{h['version']}\t{h['op']}\t{h['n_add']}\t{h['n_remove']}"
                f"\t{h.get('n_dv', 0)}\t{when}",
                file=out,
            )
        return 0

    if cmd == "read-table":
        # snapshot (or pinned-version time-travel) read of a manifest table
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        as_of = args.as_of
        if as_of is not None:
            try:
                as_of = float(as_of)
            except ValueError:
                pass  # ISO datetime string: parsed downstream
        df = transactional.read_table(
            _spark(), args.table_path, version=args.version, as_of=as_of
        )
        if args.limit:
            df = df.limit(args.limit)
        _emit(df, out)
        return 0

    if cmd == "table-changes":
        # row-level change feed between two commits (CDF analog) — the
        # incremental-consumer face of transactional.table_changes
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        df = transactional.table_changes(
            _spark(), args.table_path,
            from_version=args.from_version, to_version=args.to_version,
        )
        if args.limit:
            df = df.limit(args.limit)
        _emit(df, out)
        return 0

    if cmd == "vacuum":
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        if args.dry_run:
            rep = transactional.vacuum_report(
                args.table_path,
                keep_versions=args.keep_versions,
                grace_seconds=args.grace_seconds,
            )
            print(
                f"dry run: would remove {len(rep['data_files'])} data "
                f"file(s) and {len(rep['manifests'])} manifest(s); "
                f"{len(rep['grace_protected'])} file(s) grace-protected "
                f"(oldest kept version v{rep['oldest_kept']})",
                file=out,
            )
            for f in rep["data_files"]:
                print(f"would-remove	{f}", file=out)
            return 0
        removed = transactional.vacuum(
            args.table_path,
            keep_versions=args.keep_versions,
            grace_seconds=args.grace_seconds,
        )
        print(
            f"vacuumed {removed} data file(s) from {args.table_path} "
            f"(kept {args.keep_versions} version(s))",
            file=out,
        )
        return 0

    if cmd == "compact-table":
        # the reference pipeline's final compact stage
        # (/root/reference/geomesa_cassandra.py:188-191) on the manifest
        # layout: one atomic OPTIMIZE commit
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        zcols = (
            [c.strip() for c in args.zorder_by.split(",") if c.strip()]
            if args.zorder_by else None
        )
        where = None
        if args.scope:
            col, _, val = args.scope.partition("=")
            if not col or not val:
                parser.error("--scope takes COL=VALUE")
            # typed equality, resolved from the table schema so the
            # literal's Python type matches the recorded span's
            col = col.strip()
            try:
                lit = _typed_scope_literal(args.table_path, col, val.strip())
            except ValueError as e:
                parser.error(f"--scope value {val.strip()!r} does not parse "
                             f"as column {col!r}'s type: {e}")
            where = [(col, "=", lit)]
        res = transactional.compact_table(
            _spark(), args.table_path, target_bytes=args.target_bytes,
            zorder_by=zcols, where=where,
        )
        if res.get("aborted"):
            print(f"compact aborted: {res['aborted']}", file=out)
            return 1
        print(
            f"compacted {res['files_compacted']} file(s) into "
            f"{res['files_written']} at v{res['version']}",
            file=out,
        )
        return 0

    if cmd == "describe-table":
        # Delta's DESCRIBE DETAIL: the one-call operational summary
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        d = transactional.describe_table(args.table_path)
        print("key\tvalue", file=out)
        for k in (
            "version", "num_files", "size_bytes", "num_dvs", "stats_cols",
            "partition_cols", "not_null", "check_constraints", "columns",
            "renamed_columns", "generated_columns", "clone_source",
            "num_cloned_files", "table_features",
            "oldest_version", "num_commits_retained",
        ):
            v = d[k]
            if isinstance(v, list):
                v = ",".join(str(x) for x in v)
            print(f"{k}\t{v}", file=out)
        return 0

    if cmd == "add-constraint":
        # ALTER TABLE ADD CONSTRAINT: validates existing data first
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        if args.check:
            name, _, expr = args.check.partition("=")
            if not name or not expr:
                parser.error("--check takes NAME=EXPR")
            v = transactional.add_table_constraint(
                _spark(), args.table_path,
                check_name=name.strip(), check_expr=expr.strip(),
            )
            print(f"CHECK {name.strip()} added at v{v}", file=out)
        elif args.not_null:
            v = transactional.add_table_constraint(
                _spark(), args.table_path, not_null=args.not_null
            )
            print(f"NOT NULL {args.not_null} added at v{v}", file=out)
        else:
            parser.error("add-constraint needs --not-null or --check")
        return 0

    if cmd == "drop-constraint":
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        if args.check:
            name = args.check.partition("=")[0].strip()
            v = transactional.drop_table_constraint(
                args.table_path, check_name=name
            )
            print(f"CHECK {name} dropped at v{v}", file=out)
        elif args.not_null:
            v = transactional.drop_table_constraint(
                args.table_path, not_null=args.not_null
            )
            print(f"NOT NULL {args.not_null} dropped at v{v}", file=out)
        else:
            parser.error("drop-constraint needs --not-null or --check")
        return 0

    if cmd == "rename-column":
        # ALTER TABLE RENAME COLUMN: metadata-only via column mapping
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        if not args.rename or "=" not in args.rename:
            parser.error("rename-column needs --rename OLD=NEW")
        old_name, _, new_name = args.rename.partition("=")
        v = transactional.rename_column(
            args.table_path, old_name.strip(), new_name.strip()
        )
        print(
            f"renamed {old_name.strip()} -> {new_name.strip()} at v{v} "
            "(metadata-only)", file=out,
        )
        return 0

    if cmd == "drop-column":
        # ALTER TABLE DROP COLUMN: metadata-only via column mapping
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        if not args.column:
            parser.error("drop-column needs --column COL")
        v = transactional.drop_column(args.table_path, args.column.strip())
        print(f"dropped {args.column.strip()} at v{v} (metadata-only)", file=out)
        return 0

    if cmd == "convert-table":
        # CONVERT TO DELTA analog: in-place manifest conversion of a
        # plain parquet directory (zero data bytes rewritten)
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        stats = (
            [c.strip() for c in args.stats_cols.split(",")]
            if getattr(args, "stats_cols", None) else None
        )
        res = transactional.convert_to_manifest(
            _spark(), args.table_path, stats_cols=stats
        )
        print(
            f"converted {res['files_converted']} file(s) at v0 "
            f"(stats: {','.join(res['stats_cols']) or 'none'})", file=out,
        )
        return 0

    if cmd == "add-column":
        # ALTER TABLE ADD COLUMN: metadata-only schema evolution
        _require(parser, args, "table-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        if not args.add or "=" not in args.add:
            parser.error("add-column needs --add COL=TYPE")
        col, _, dtype = args.add.partition("=")
        v = transactional.add_column(
            args.table_path, col.strip(), dtype.strip()
        )
        print(
            f"added {col.strip()} {dtype.strip()} at v{v} (metadata-only)",
            file=out,
        )
        return 0

    if cmd == "merge-table":
        # atomic MERGE (upsert by key) from a parquet batch into a
        # manifest table — the CLI face of transactional.merge_upsert
        _require(parser, args, "table-path", "batch-path", "merge-keys")
        from geomesa_cassandra_tools_spark.operators import transactional

        spark = _spark()
        batch = spark.read.parquet(args.batch_path)
        res = transactional.merge_upsert(
            spark, args.table_path, batch,
            [k.strip() for k in args.merge_keys.split(",") if k.strip()],
        )
        if res is None:
            # merge_upsert returns None for an empty batch: no version burned
            print(
                f"batch {args.batch_path} is empty; nothing merged into "
                f"{args.table_path}",
                file=out,
            )
            return 0
        print(
            f"merged into {args.table_path} at v{res['version']}: "
            f"{res.get('files_rewritten', 0)} file(s) rewritten",
            file=out,
        )
        return 0

    if cmd == "restore-table":
        # Delta RESTORE: the rollback verb an operator reaches for after
        # a bad write — a NEW commit, so nothing is lost
        _require(parser, args, "table-path", "version")
        from geomesa_cassandra_tools_spark.operators import transactional

        res = transactional.restore_table(args.table_path, args.version)
        print(
            f"restored {args.table_path} to v{res.get('restored_to', args.version)} "
            f"as v{res['version']}: +{res['files_added']} / "
            f"-{res['files_removed']} file(s)",
            file=out,
        )
        return 0

    if cmd == "clone-table":
        # Delta SHALLOW CLONE: a zero-copy snapshot fork — new table, v0
        # references the source's files; compact-table on the clone
        # materializes it
        _require(parser, args, "table-path", "target-path")
        from geomesa_cassandra_tools_spark.operators import transactional

        res = transactional.clone_table(
            args.table_path, args.target_path,
            version=args.version, as_of=args.as_of,
        )
        print(
            f"cloned {args.table_path}@v{res['source_version']} to "
            f"{args.target_path} ({res['files_referenced']} file(s) "
            f"referenced, {res['vectors_carried']} vector(s) carried)",
            file=out,
        )
        return 0

    if cmd == "delete-where":
        # transactional DELETE over a manifest table; --delete-mode dv
        # marks rows in a deletion-vector sidecar instead of rewriting
        # the hit files (the 100 TB point-delete shape)
        _require(parser, args, "table-path", "where")
        from geomesa_cassandra_tools_spark.operators import transactional

        res = transactional.delete_where(
            _spark(), args.table_path, args.where, mode=args.delete_mode
        )
        if args.delete_mode == "dv":
            print(
                f"deleted from {args.table_path} at v{res['version']}: "
                f"{res.get('files_vectored', 0)} file(s) vectored, "
                "0 rewritten",
                file=out,
            )
        else:
            print(
                f"deleted from {args.table_path} at v{res['version']}: "
                f"{res.get('files_rewritten', 0)} file(s) rewritten, "
                f"{res.get('files_carried', 0)} carried",
                file=out,
            )
        return 0

    if cmd == "remove-schema":
        # the full 7-stage removal pipeline (reference geomesa.py:31-55 /
        # cluster.py drop path) over maintenance.remove_schema: verify,
        # truncate, compact/vacuum, drop the catalog row — then publish
        # the rewritten catalog with the same staged swap as
        # remove-sft-from-catalog. Emits the audit frame.
        _require(
            parser, args, "keyspace", "catalog", "feature-name",
            "catalog-path", "tables-dir",
        )
        from geomesa_cassandra_tools_spark.operators import maintenance

        spark = _spark()
        cat = GeoCatalog.load(spark, args.catalog_path)
        tables = [
            r["table"]
            for r in cat.find_schema_tables(
                args.keyspace, args.catalog, args.feature_name
            ).collect()
        ]
        table_paths = {t: os.path.join(args.tables_dir, t) for t in tables}
        new_cat, audit = maintenance.remove_schema(
            spark, cat, args.keyspace, args.catalog, args.feature_name,
            table_paths, fmt=args.fmt,
        )
        _swap_catalog(new_cat.df, args.catalog_path)
        _emit(audit.orderBy("stage", "table"), out)
        return 0

    if cmd == "remove-sft-from-catalog":
        # DELETE WHERE sft=… (/root/reference/geomesa.py:56-59) as
        # filter-and-rewrite published through the staged catalog swap.
        _require(parser, args, "keyspace", "catalog", "feature-name", "catalog-path")
        spark = _spark()
        cat = GeoCatalog.load(spark, args.catalog_path)
        removed = cat.remove_sft(args.keyspace, args.catalog, args.feature_name)
        _swap_catalog(removed.df, args.catalog_path)
        print(f"removed sft {args.feature_name!r} from {args.catalog_path}", file=out)
        return 0

    if cmd in ("compactionstats", "find-table-compactions"):
        _require(parser, args, "log")
        lines = _spark().read.text(args.log)
        rows = parsing.parse_compactions(lines)
        if cmd == "find-table-compactions":
            _require(parser, args, "keyspace", "table")
            rows = rows.where(
                (F.col("keyspace") == args.keyspace) & (F.col("table") == args.table)
            )
        _emit(rows.orderBy("id"), out)
        return 0

    if cmd in ("listsnapshots", "find-table-snapshots"):
        _require(parser, args, "log")
        lines = _spark().read.text(args.log)
        rows = parsing.parse_snapshots(lines)
        if cmd == "find-table-snapshots":
            _require(parser, args, "keyspace", "table")
            rows = rows.where(
                (F.col("keyspace") == args.keyspace) & (F.col("table") == args.table)
            )
        _emit(rows.orderBy("name"), out)
        return 0

    if cmd == "status":
        spark = _spark()
        nodes = nodes_registry(spark, args.nodes_file)
        if args.info_dir:
            # per-node `nodetool info` capture at <info-dir>/<name>.txt;
            # a node with no capture reports up=NULL (unknown), matching
            # the reference's failed-probe logging rather than guessing.
            # An EMPTY capture dir (all probes failed / job not yet run)
            # is the all-unknown case, not an error — Spark's glob read
            # would raise PATH_NOT_FOUND on zero matches, so probe first.
            has_captures = any(
                f.endswith(".txt") for f in os.listdir(args.info_dir)
            )
            if has_captures:
                infos = spark.read.text(
                    os.path.join(args.info_dir, "*.txt"), wholetext=True
                ).withColumn(
                    "name",
                    F.regexp_extract(
                        F.input_file_name(), r"([^/]+)\.txt$", 1
                    ),
                )
                nodes = nodes.join(infos, "name", "left").select(
                    "name", "host", "port", "user",
                    parsing.is_up(F.col("value")).alias("up"),
                )
            else:
                nodes = nodes.select(
                    "name", "host", "port", "user",
                    F.lit(None).cast("boolean").alias("up"),
                )
        _emit(nodes.orderBy("name"), out)
        return 0

    parser.error(f"Unknown command {cmd!r}")
    return 2  # pragma: no cover — parser.error raises


if __name__ == "__main__":
    raise SystemExit(main())
