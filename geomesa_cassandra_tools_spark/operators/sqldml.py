"""SQL DML router for manifest tables: INSERT / UPDATE / DELETE / MERGE
as *statements* against registered manifest views.

`register_manifest_view` makes a manifest table SQL-*readable*; this
module makes it SQL-*writable* — the four DML verbs are parsed and
dispatched to the transactional primitives (`append_batch`,
`update_where`, `delete_where`, `merge_upsert`), so a SQL user drives
the same atomic, constraint-gated, partition-aware commit path the
Python API does. This is the interface shape Delta users actually live
in (``MERGE INTO`` / ``DELETE FROM`` as SQL text), re-expressed over the
manifest layer; the reference's analogous surface is its one-statement
CQL escape hatch (/root/reference/geomesa.py:17, node.py:312), which
the CLI `sql` verb already mirrors for reads.

Design decisions:

- Statements resolve table names through `transactional._VIEW_REGISTRY`
  (written by `register_manifest_view`). A name not registered falls
  through to ``spark.sql`` verbatim — so SELECTs, DDL on real temp
  views, and DML against Spark-native tables keep working through one
  entry point. A *pinned* registration (version= / as_of= / where=) is
  a read-only face: DML against it is refused loudly rather than
  writing "through" a time-travel view.
- After a successful write the view is RE-REGISTERED to the new
  snapshot, so a follow-up SELECT through the same entry point sees the
  write — the session behaves like a normal SQL database.
- The parser is a deliberately small top-level scanner (quote-aware:
  ``'...'`` with ``''`` escape, ``"..."``, backticks), not a full SQL
  grammar. Everything INSIDE a clause (a WHERE condition, a SET
  expression, an INSERT source query) is handed to Spark SQL untouched
  — Spark parses the expressions, this module only finds the clause
  boundaries. Unsupported shapes refuse loudly naming the supported
  subset; nothing is silently misread.

MERGE supports the three production shapes:
  * ``WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``
    (the CDC upsert) -> `merge_upsert`
  * ``WHEN NOT MATCHED THEN INSERT *`` alone (insert-if-absent) ->
    anti-join + `append_batch`
  * ``WHEN MATCHED THEN DELETE`` alone (key-set purge) ->
    `delete_where(keys=...)`

Beyond DML, the router covers the whole table lifecycle as statements
(Delta's SQL surface, over the manifest layer):
  * ``CREATE TABLE name (col TYPE [NOT NULL] [GENERATED ALWAYS AS
    (expr)], ...) [PARTITIONED BY (...)] LOCATION 'path'`` and the CTAS
    form -> `init_table`
  * ``CREATE TABLE name SHALLOW CLONE view [VERSION|TIMESTAMP AS OF ...]
    LOCATION 'path'`` -> `clone_table`
  * ``RESTORE TABLE view TO VERSION|TIMESTAMP AS OF ...`` ->
    `restore_table`
  * ``OPTIMIZE view [WHERE col = lit] [ZORDER BY (c, ...)]`` ->
    `compact_table` (scope literals typed from the table schema)
  * ``VACUUM view [RETAIN n VERSIONS]`` -> `vacuum`
  * ``DESCRIBE HISTORY|DETAIL view`` -> DataFrames over
    `table_history` / `describe_table`
  * ``table_changes(view, from[, to])`` inside any SELECT — the CDF
    table-valued function; the call site rewrites to a registered feed
    view (pinned faces may read changes: it is read-only)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.operators import transactional as tx

__all__ = ["execute"]

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _quote_mask(s: str) -> list[bool]:
    """True at positions inside a quoted region ('' escapes inside
    single quotes; double quotes / backticks quote identifiers)."""
    mask = [False] * len(s)
    i, q = 0, None
    while i < len(s):
        c = s[i]
        if q is not None:
            mask[i] = True
            if c == q:
                if q == "'" and i + 1 < len(s) and s[i + 1] == "'":
                    mask[i + 1] = True
                    i += 2
                    continue
                q = None
            i += 1
        else:
            if c in ("'", '"', "`"):
                q = c
                mask[i] = True
            i += 1
    return mask


def _find_kw(s: str, mask: list[bool], kw: str, start: int = 0):
    """First top-level (unquoted) match of a keyword phrase; words in
    ``kw`` are separated by arbitrary whitespace. Returns the match or
    None."""
    pat = r"\b" + r"\s+".join(re.escape(w) for w in kw.split()) + r"\b"
    for m in re.finditer(pat, s, re.IGNORECASE):
        if not mask[m.start()]:
            return m
    return None


def _split_toplevel_commas(s: str) -> list[str]:
    """Split on commas at paren depth 0 outside quotes."""
    mask = _quote_mask(s)
    parts, depth, last = [], 0, 0
    for i, c in enumerate(s):
        if mask[i]:
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return [p.strip() for p in parts if p.strip()]


def _resolve(view: str) -> str:
    """View name -> table path; refuses pinned (read-only) views and
    unknown names (the caller falls through to spark.sql for those)."""
    entry = tx._VIEW_REGISTRY.get(view)
    if entry is None:
        raise KeyError(view)
    if entry["pinned"]:
        raise ValueError(
            f"view {view!r} is a pinned snapshot (version=/as_of=/where= "
            "registration) — a time-travel face is read-only; register "
            "the live table to write"
        )
    return entry["path"]


#: the session's active Metastore (operators/metastore.py), or None —
#: set with `use_metastore`/`set_metastore`. With one active: CREATE
#: TABLE may omit LOCATION (the catalog invents <root>/<name>),
#: CREATE/DROP register/unregister durably, SHOW TABLES lists the
#: catalog.
_ACTIVE_METASTORE = None


class use_metastore:
    """Context manager (or plain setter via `set_metastore`) activating
    a durable metastore for the SQL router."""

    def __init__(self, ms):
        self.ms = ms
        self.prev = None

    def __enter__(self):
        global _ACTIVE_METASTORE
        self.prev, _ACTIVE_METASTORE = _ACTIVE_METASTORE, self.ms
        return self.ms

    def __exit__(self, *exc):
        global _ACTIVE_METASTORE
        _ACTIVE_METASTORE = self.prev
        return False


def set_metastore(ms) -> None:
    global _ACTIVE_METASTORE
    _ACTIVE_METASTORE = ms


def _table_schema(path: str):
    from pyspark.sql.types import StructType
    import json

    man = tx._read_manifest(path, tx.current_version(path))
    return StructType.fromJson(json.loads(man["schema"]))


def _align_to_schema(
    batch: DataFrame, schema, what: str, leave_absent: set | None = None,
    defaults: dict | None = None,
) -> DataFrame:
    """Project a source frame to the table schema: columns matched BY
    NAME, cast to the table's types, missing nullable columns
    null-filled (standard INSERT column-list semantics) — or filled
    with the table's COLUMN DEFAULT expression when one is declared
    (``defaults``: Delta's allowColumnDefaults, write-time only) —
    extra columns refused loudly. ``leave_absent`` columns (the table's
    GENERATED columns) are NOT null-filled when the source omits them —
    the write path computes them; a null-fill here would read as a
    supplied (and diverging) value."""
    extra = set(batch.columns) - {f.name for f in schema.fields}
    if extra:
        raise ValueError(
            f"{what} carries column(s) {sorted(extra)} the table lacks; "
            "the DML router never evolves schema — use "
            "append_batch(merge_schema=True) for evolution"
        )
    cols = []
    for f in schema.fields:
        if f.name in batch.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif f.name in (leave_absent or ()):
            # generated wins over any (stale/invalid) defaults entry: a
            # default-filled generated column would read as a supplied
            # value and bypass the generation path
            continue
        elif f.name in (defaults or {}):
            cols.append(
                F.expr(defaults[f.name]).cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return batch.select(*cols)


def _repoint(spark: SparkSession, view: str, path: str) -> None:
    tx.register_manifest_view(spark, path, name=view)


def execute(spark: SparkSession, statement: str):
    """Execute one SQL statement. DML verbs (INSERT INTO / DELETE FROM /
    UPDATE / MERGE INTO) whose target is a live registered manifest view
    dispatch to the transactional layer and return a stats dict;
    everything else returns ``spark.sql(statement)``'s DataFrame."""
    s = statement.strip().rstrip(";").strip()
    mask = _quote_mask(s)

    m = re.match(
        rf"INSERT\s+OVERWRITE\s+(?:TABLE\s+)?({_IDENT})"
        rf"(?:\s+PARTITION\s*\(([^)]*)\))?\s+(.+)$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m and not mask[0]:
        return _insert_overwrite(
            spark, m.group(1), m.group(2), m.group(3), None, statement
        )

    m = re.match(
        rf"INSERT\s+INTO\s+({_IDENT})\s+REPLACE\s+WHERE\s+(.+)$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m and not mask[0]:
        # Databricks' replaceWhere form: the condition runs up to the
        # first top-level source keyword
        view, rest = m.group(1), m.group(2)
        cond, src = _split_cond_source(rest)
        return _insert_overwrite(spark, view, None, src, cond, statement)

    m = re.match(
        rf"INSERT\s+INTO\s+({_IDENT})\s*(\(([^)]*)\))?\s*(.+)$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m and not mask[0]:
        view, _, collist, query = m.groups()
        try:
            path = _resolve(view)
        except KeyError:
            return spark.sql(statement)
        q = query.strip()
        if not re.match(r"(VALUES|SELECT|TABLE|WITH|FROM|\()", q, re.IGNORECASE):
            raise ValueError(
                f"INSERT INTO {view}: source must be VALUES/SELECT/TABLE/"
                f"WITH, got {q[:40]!r}"
            )
        batch = spark.sql(q)
        if collist is not None:
            names = [c.strip().strip('`"') for c in collist.split(",")]
            if len(names) != len(batch.columns):
                raise ValueError(
                    f"INSERT column list names {len(names)} column(s) but "
                    f"the source produces {len(batch.columns)}"
                )
            batch = batch.toDF(*names)
        else:
            schema = _table_schema(path)
            if len(batch.columns) != len(schema.fields):
                raise ValueError(
                    f"INSERT without a column list must provide all "
                    f"{len(schema.fields)} table column(s); the source "
                    f"produces {len(batch.columns)} — name the columns"
                )
            batch = batch.toDF(*(f.name for f in schema.fields))
        man_ins = tx._read_manifest(path, tx.current_version(path))
        # generated AND identity columns stay absent: append_batch
        # computes/allocates them (a null-fill or default-fill here would
        # read as supplied and be refused by the GENERATED ALWAYS gate)
        gen_cols = set(man_ins.get("generated") or ()) | set(
            man_ins.get("identity") or ()
        )
        batch = _align_to_schema(
            batch, _table_schema(path), "INSERT source",
            leave_absent=gen_cols,
            defaults=man_ins.get("defaults"),
        )
        v = tx.append_batch(batch, path)
        _repoint(spark, view, path)
        return {"op": "insert", "table": view, "version": v}

    m = re.match(rf"DELETE\s+FROM\s+({_IDENT})\s*(.*)$", s,
                 re.IGNORECASE | re.DOTALL)
    if m and not mask[0]:
        view, rest = m.group(1), m.group(2).strip()
        try:
            path = _resolve(view)
        except KeyError:
            return spark.sql(statement)
        if rest:
            wm = re.match(r"WHERE\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
            if not wm:
                raise ValueError(
                    f"DELETE FROM {view}: expected WHERE <condition>, got "
                    f"{rest[:40]!r}"
                )
            res = tx.delete_where(spark, path, wm.group(1).strip())
        else:
            # DELETE without WHERE removes every row — the metadata-only
            # truncate, not a full rewrite of files about to be dropped
            res = {"version": tx.truncate_table(path), "files_rewritten": 0}
        _repoint(spark, view, path)
        return {"op": "delete", "table": view, **res}

    m = re.match(rf"UPDATE\s+({_IDENT})\s+SET\s+(.+)$", s,
                 re.IGNORECASE | re.DOTALL)
    if m and not mask[0]:
        view, rest = m.group(1), m.group(2)
        try:
            path = _resolve(view)
        except KeyError:
            return spark.sql(statement)
        rmask = _quote_mask(rest)
        wm = _find_kw(rest, rmask, "WHERE")
        if wm is not None:
            set_part, cond = rest[: wm.start()], rest[wm.end():].strip()
        else:
            set_part, cond = rest, None
        assignments = {}
        for a in _split_toplevel_commas(set_part):
            am = re.match(rf"({_IDENT})\s*=\s*(.+)$", a.strip(), re.DOTALL)
            if not am:
                raise ValueError(
                    f"UPDATE {view}: cannot parse assignment {a!r} "
                    "(expected col = <expression>)"
                )
            col = am.group(1)
            if col in assignments:
                raise ValueError(f"UPDATE {view}: column {col!r} assigned twice")
            assignments[col] = am.group(2).strip()
        res = tx.update_where(spark, path, assignments, cond)
        _repoint(spark, view, path)
        return {"op": "update", "table": view, **res}

    m = re.match(
        rf"MERGE\s+INTO\s+({_IDENT})(?:\s+AS\s+({_IDENT})|\s+({_IDENT}))?"
        rf"\s+USING\s+", s, re.IGNORECASE,
    )
    if m and not mask[0]:
        return _merge(spark, s, mask, m)

    m = re.match(
        rf"RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+"
        rf"(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')"
        rf"\s*$",
        s, re.IGNORECASE,
    )
    if m and not mask[0]:
        view, ver, ts = m.groups()
        try:
            path = _resolve(view)
        except KeyError:
            return spark.sql(statement)
        target = (
            int(ver) if ver is not None
            else tx.version_as_of(path, tx._parse_as_of(ts))
        )
        res = tx.restore_table(path, target)
        _repoint(spark, view, path)
        return {"op": "restore", "table": view, **res}

    m = re.match(
        rf"OPTIMIZE\s+({_IDENT})"
        rf"(?:\s+WHERE\s+(.+?))?"
        rf"(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?"
        rf"(\s+INCREMENTAL)?\s*$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m and not mask[0]:
        view, where_raw, zorder_raw, inc_raw = m.groups()
        try:
            path = _resolve(view)
        except KeyError:
            return spark.sql(statement)
        where = None
        if where_raw:
            # OPTIMIZE ... WHERE takes the partition-scope equality shape
            # (Delta's contract); literals type from the TABLE SCHEMA so
            # a numeric-looking string value stays a string
            wm = re.match(
                rf"({_IDENT})\s*=\s*('([^']*)'|[\w.-]+)\s*$",
                where_raw.strip(),
            )
            if not wm:
                raise ValueError(
                    f"OPTIMIZE {view}: WHERE takes one `col = literal` "
                    f"equality (the partition scope), got "
                    f"{where_raw.strip()[:40]!r}"
                )
            col = wm.group(1)
            raw = wm.group(3) if wm.group(3) is not None else wm.group(2)
            where = [(col, "=", _typed_literal(path, col, raw))]
        zorder_by = (
            [c.strip().strip('`"') for c in zorder_raw.split(",") if c.strip()]
            if zorder_raw else None
        )
        if inc_raw and not zorder_by:
            raise ValueError(
                f"OPTIMIZE {view}: INCREMENTAL applies to ZORDER BY "
                "(liquid-style clustering provenance)"
            )
        res = tx.compact_table(
            spark, path, where=where, zorder_by=zorder_by,
            incremental=bool(inc_raw),
        )
        _repoint(spark, view, path)
        return {"op": "optimize", "table": view, **res}

    m = re.match(
        rf"VACUUM\s+({_IDENT})(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*$",
        s, re.IGNORECASE,
    )
    if m and not mask[0]:
        view, keep = m.groups()
        try:
            path = _resolve(view)
        except KeyError:
            return spark.sql(statement)
        removed = tx.vacuum(path, keep_versions=int(keep) if keep else 1)
        return {
            "op": "vacuum", "table": view, "files_removed": removed,
            "keep_versions": int(keep) if keep else 1,
        }

    m = re.match(
        rf"DESCRIBE\s+(HISTORY|DETAIL)\s+({_IDENT})\s*$", s, re.IGNORECASE
    )
    if m and not mask[0]:
        kind, view = m.group(1).upper(), m.group(2)
        entry = tx._VIEW_REGISTRY.get(view)
        if entry is None:
            return spark.sql(statement)
        path = entry["path"]  # read-only: pinned faces may describe
        if kind == "HISTORY":
            rows = tx.table_history(path)
            return spark.createDataFrame(
                [(r["version"], r["op"], float(r["ts"] or 0), r["n_add"],
                  r["n_remove"], r["n_dv"]) for r in rows],
                "version bigint, op string, ts double, n_add bigint, "
                "n_remove bigint, n_dv bigint",
            )
        d = tx.describe_table(path)
        return spark.createDataFrame(
            [(k, ",".join(map(str, v)) if isinstance(v, list) else str(v))
             for k, v in d.items()],
            "key string, value string",
        )

    m = re.match(
        rf"CONVERT\s+TO\s+MANIFEST\s+'([^']+)'"
        rf"(?:\s+STATS\s*\(([^)]*)\))?"
        rf"(?:\s+AS\s+({_IDENT}))?\s*$",
        s, re.IGNORECASE,
    )
    if m and not mask[0]:
        # Delta's CONVERT TO DELTA, manifest dialect: in-place conversion
        # of a plain parquet directory (files renamed under data/, zero
        # bytes rewritten, stats harvested from footers); AS registers
        # the converted table for immediate SELECT/DML through the router
        loc, stats_raw, name = m.groups()
        stats = (
            [c.strip().strip('`"') for c in stats_raw.split(",") if c.strip()]
            if stats_raw else None
        )
        res = tx.convert_to_manifest(spark, loc, stats_cols=stats)
        if name:
            tx.register_manifest_view(spark, loc, name=name)
        return {"op": "convert", "path": loc, **res,
                **({"table": name} if name else {})}

    m = re.match(rf"ALTER\s+TABLE\s+({_IDENT})\s+(.+)$", s,
                 re.IGNORECASE | re.DOTALL)
    if m and not mask[0]:
        view, action = m.group(1), m.group(2).strip()
        try:
            path = _resolve(view)
        except KeyError:
            # not a registered manifest view: a Spark-catalog ALTER
            return spark.sql(statement)
        res = _alter_table(spark, view, path, action)
        _repoint(spark, view, path)
        return res

    m = re.match(r"SHOW\s+TABLES\s*$", s, re.IGNORECASE)
    if m and _ACTIVE_METASTORE is not None:
        return _ACTIVE_METASTORE.tables(spark)

    m = re.match(rf"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?({_IDENT})\s*$",
                 s, re.IGNORECASE)
    if m and _ACTIVE_METASTORE is not None:
        name = m.group(1)
        known = _ACTIVE_METASTORE.lookup(spark, name) is not None
        if not known and "IF" not in s.upper():
            raise ValueError(f"DROP TABLE {name}: not in the metastore")
        res = _ACTIVE_METASTORE.unregister(spark, name)
        tx._VIEW_REGISTRY.pop(name, None)
        spark.catalog.dropTempView(name)
        # catalog operation only: the table DATA stays on disk (the
        # unmanaged-table DROP semantics; vacuum/rm reclaim bytes)
        return {"op": "drop_table", "table": name, "dropped": known,
                "catalog_version": res.get("version")}

    m = re.match(
        rf"CREATE\s+TABLE\s+({_IDENT})\s*\(", s, re.IGNORECASE
    )
    if m and not mask[0]:
        # balanced-paren scan for the column list (a GENERATED ALWAYS AS
        # expression nests parens, so no single regex bounds it)
        depth, i = 1, m.end()
        while i < len(s) and depth:
            if not mask[i]:
                if s[i] == "(":
                    depth += 1
                elif s[i] == ")":
                    depth -= 1
            i += 1
        if depth:
            # unbalanced column list: not parseable as the manifest
            # dialect — let Spark's parser produce the canonical error
            return spark.sql(statement)
        cols_raw = s[m.end(): i - 1]
        tail = s[i:]
        tm = re.match(
            rf"\s*(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?"
            rf"(?:LOCATION\s+'([^']+)')?\s*$",
            tail, re.IGNORECASE | re.DOTALL,
        )
        if not tm or (tm.group(2) is None and _ACTIVE_METASTORE is None):
            # not the manifest dialect (no LOCATION tail and no active
            # metastore to invent one, or a USING/TBLPROPERTIES/…
            # clause): plain Spark CREATE TABLE — keep the documented
            # contract that non-manifest statements fall through to
            # spark.sql verbatim
            return spark.sql(statement)
        part_raw, loc = tm.groups()
        if loc is None:
            loc = _ACTIVE_METASTORE.table_location(m.group(1))
        return _create_table(spark, m.group(1), cols_raw, part_raw, loc, None)

    m = re.match(
        rf"CREATE\s+TABLE\s+({_IDENT})\s*"
        rf"(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?"
        rf"(?:LOCATION\s+'([^']+)'\s+)?AS\s+(.+)$",
        s, re.IGNORECASE | re.DOTALL,
    )
    if m and not mask[0] and (
        m.group(3) is not None or _ACTIVE_METASTORE is not None
    ):
        name, part_raw, loc, query = m.groups()
        if loc is None:
            loc = _ACTIVE_METASTORE.table_location(name)
        return _create_table(spark, name, None, part_raw, loc, query)

    m = re.match(
        rf"CREATE\s+TABLE\s+({_IDENT})\s+SHALLOW\s+CLONE\s+({_IDENT})"
        rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+)"
        rf"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?"
        rf"\s+LOCATION\s+'([^']+)'\s*$",
        s, re.IGNORECASE,
    )
    if m and not mask[0]:
        # Delta's CREATE TABLE ... SHALLOW CLONE, over the view registry:
        # the source resolves like any DML target (pinned faces allowed —
        # a clone of a time-travel view is just a pinned clone), the new
        # table lands at LOCATION (mandatory: there is no catalog to
        # invent paths), and the target name registers as a live view so
        # a follow-up SELECT sees the clone immediately
        name, srcview, ver, ts, loc = m.groups()
        reg = tx._VIEW_REGISTRY.get(srcview)
        if reg is None:
            return spark.sql(statement)
        src = reg["path"]
        # a pinned source view clones its pinned snapshot (unless the
        # statement pins explicitly); a where= face has no single
        # snapshot to clone — refuse loudly
        if reg.get("where"):
            raise ValueError(
                f"SHALLOW CLONE {srcview}: the source view is a filtered "
                "face (where=); clone the unfiltered table instead"
            )
        version = int(ver) if ver else reg.get("version")
        as_of = ts if ts else (None if ver else reg.get("as_of"))
        res = tx.clone_table(src, loc, version=version, as_of=as_of)
        tx.register_manifest_view(spark, loc, name=name)
        return {"op": "clone", "table": name, **res}

    # inline time travel in SELECT (Delta's `FROM t VERSION AS OF n` /
    # `TIMESTAMP AS OF 'ts'`): every registered-view reference carrying
    # an AS OF suffix rewrites to a PINNED temp-view registration (the
    # same read-only face register_manifest_view(version=/as_of=)
    # builds), so one SELECT can join two snapshots of the same table
    # without pre-pinning. References to names that are NOT registered
    # manifest views stay verbatim (Spark's own AS OF handles catalog
    # tables, or errors in its own words).
    asof = re.compile(
        rf"\b({_IDENT})\s+(?:VERSION\s+AS\s+OF\s+(\d+)"
        rf"|TIMESTAMP\s+AS\s+OF\s+'([^']+)')",
        re.IGNORECASE,
    )

    def _asof_sub(mm) -> str | None:
        view, ver, ts = mm.group(1), mm.group(2), mm.group(3)
        entry = tx._VIEW_REGISTRY.get(view)
        if entry is None:
            return None  # not ours: leave the reference untouched
        if ver is not None:
            tvname = f"__asof_{view}_v{ver}"
            tx.register_manifest_view(
                spark, entry["path"], name=tvname, version=int(ver)
            )
        else:
            # resolve the instant to a VERSION first so the temp-view
            # name is stable and the registration is a version pin
            # (epoch-seconds or ISO form, same contract as the feed's
            # startingTimestamp)
            try:
                inst = float(ts)
            except ValueError:
                inst = tx._parse_as_of(ts)
            v = tx.version_as_of(entry["path"], inst)
            tvname = f"__asof_{view}_v{v}"
            tx.register_manifest_view(
                spark, entry["path"], name=tvname, version=v
            )
        return tvname

    if asof.search(s) and any(
        not mask[mm.start()] for mm in asof.finditer(s)
    ):
        out, last, changed = [], 0, False
        for mm in asof.finditer(s):
            sub = None if mask[mm.start()] else _asof_sub(mm)
            if sub is None:
                continue
            out.append(s[last:mm.start()])
            out.append(sub)
            last = mm.end()
            changed = True
        out.append(s[last:])
        if changed:
            s = "".join(out)
            statement = s
            mask = _quote_mask(s)

    # the table_changes(view, from[, to]) table-valued function (Delta's
    # CDF TVF): each call registers the batch change feed as a temp view
    # and the statement rewrites to select from it — the one rewrite this
    # router performs inside an otherwise-verbatim statement. Pinned
    # faces may read changes (read-only).
    tvf = re.compile(
        rf"table_changes\s*\(\s*'?({_IDENT})'?\s*,\s*(\d+)"
        rf"\s*(?:,\s*(\d+))?\s*\)",
        re.IGNORECASE,
    )
    def _tvf_sub(mm):
        view, lo, hi = mm.group(1), int(mm.group(2)), mm.group(3)
        entry = tx._VIEW_REGISTRY.get(view)
        if entry is None:
            raise ValueError(
                f"table_changes: {view!r} is not a registered manifest "
                "view (register_manifest_view first)"
            )
        hi_v = int(hi) if hi is not None else None
        tvname = f"__tc_{view}_{lo}_{hi if hi is not None else 'latest'}"
        tx.table_changes(
            spark, entry["path"], from_version=lo, to_version=hi_v
        ).createOrReplaceTempView(tvname)
        return tvname
    if tvf.search(s) and any(
        not mask[mm.start()] for mm in tvf.finditer(s)
    ):
        out, last = [], 0
        for mm in tvf.finditer(s):
            if mask[mm.start()]:
                continue
            out.append(s[last:mm.start()])
            out.append(_tvf_sub(mm))
            last = mm.end()
        out.append(s[last:])
        return spark.sql("".join(out))

    return spark.sql(statement)


def _typed_literal(path: str, col: str, raw: str):
    """Type an OPTIMIZE-scope literal from the TABLE SCHEMA (never from
    its spelling — the CLI --scope lesson): quoted literals arrive
    already unquoted as strings; unquoted ones resolve to the column's
    declared type, falling back to the raw string (the file-skipping
    layer keeps files conservatively for un-orderable literals)."""
    import datetime
    import json as _json

    t = None
    v = tx.current_version(path)
    if v >= 0:
        man = tx._read_manifest(path, v)
        for f in _json.loads(man["schema"])["fields"]:
            if f["name"] == col and isinstance(f.get("type"), str):
                t = f["type"]
                break
    try:
        if t in ("byte", "short", "integer", "long"):
            return int(raw)
        if t in ("float", "double") or (t or "").startswith("decimal"):
            return float(raw)
        if t == "date":
            return datetime.date.fromisoformat(raw)
        if t in ("timestamp", "timestamp_ntz"):
            return datetime.datetime.fromisoformat(raw)
    except ValueError:
        pass  # unparseable for the declared type: keep the raw string
    return raw


def _merge(spark: SparkSession, s: str, mask: list[bool], head):
    """MERGE INTO tgt [AS t] USING (src | (subquery)) [AS s]
    ON <equi-conjunction> WHEN ... — the three supported clause shapes
    are documented in the module docstring."""
    view = head.group(1)
    tgt_alias = head.group(2) or head.group(3) or view
    try:
        path = _resolve(view)
    except KeyError:
        return spark.sql(s)
    rest = s[head.end():]
    rmask = _quote_mask(rest)

    # source: bare identifier or parenthesized subquery
    if rest.lstrip().startswith("("):
        start = rest.index("(")
        depth, i = 0, start
        while i < len(rest):
            if not rmask[i]:
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                    if depth == 0:
                        break
            i += 1
        if depth != 0:
            raise ValueError("MERGE: unbalanced parens in USING subquery")
        src_sql = rest[start + 1:i]
        src_df = spark.sql(src_sql)
        after = rest[i + 1:]
        src_alias = None
    else:
        sm = re.match(rf"\s*({_IDENT})", rest)
        if not sm:
            raise ValueError("MERGE: cannot parse USING source")
        src_df = spark.table(sm.group(1))
        src_alias = sm.group(1)
        after = rest[sm.end():]
    am = re.match(rf"\s+(?:AS\s+)?({_IDENT})\s+(?=ON\b)", after,
                  re.IGNORECASE)
    if am:
        src_alias = am.group(1)
        after = after[am.end():]
    if src_alias is None:
        raise ValueError("MERGE: a USING (subquery) needs an alias")

    amask = _quote_mask(after)
    om = _find_kw(after, amask, "ON")
    wm = _find_kw(after, amask, "WHEN")
    if om is None or wm is None or om.start() > wm.start():
        raise ValueError("MERGE: expected ON <condition> WHEN ...")
    on_sql = after[om.end():wm.start()].strip()
    clauses_sql = after[wm.start():].strip()

    # the ON condition must be an equi-conjunction naming both aliases —
    # that's what keys a manifest merge (and what makes it a shuffle
    # join, not a cross product, at 100 TB)
    key_cols = []
    for term in re.split(r"\bAND\b", on_sql, flags=re.IGNORECASE):
        tm = re.match(
            rf"\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*$",
            term,
        )
        if not tm:
            raise ValueError(
                f"MERGE ON: supported terms are t.col = s.col ANDed; got "
                f"{term.strip()!r}"
            )
        a1, c1, a2, c2 = tm.groups()
        if {a1, a2} != {tgt_alias, src_alias}:
            raise ValueError(
                f"MERGE ON term {term.strip()!r} must reference both "
                f"{tgt_alias!r} and {src_alias!r}"
            )
        tcol = c1 if a1 == tgt_alias else c2
        scol = c2 if a1 == tgt_alias else c1
        key_cols.append((tcol, scol))

    # rename source key columns to the target's names, then align
    for tcol, scol in key_cols:
        if scol != tcol:
            if tcol in src_df.columns:
                src_df = src_df.drop(tcol)
            src_df = src_df.withColumnRenamed(scol, tcol)
    keys = [t for t, _ in key_cols]

    c = re.sub(r"\s+", " ", clauses_sql).strip().upper().rstrip(";").strip()
    upsert = "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    insert_only = "WHEN NOT MATCHED THEN INSERT *"
    delete_only = "WHEN MATCHED THEN DELETE"
    schema = _table_schema(path)
    if c == upsert:
        batch = _align_to_schema(src_df, schema, "MERGE source")
        res = tx.merge_upsert(spark, path, batch, keys)
        _repoint(spark, view, path)
        return {"op": "merge_upsert", "table": view, **(res or {})}
    if c == insert_only:
        batch = _align_to_schema(src_df, schema, "MERGE source")
        existing = tx.read_table(spark, path).select(*keys)
        fresh = batch.join(existing, keys, "left_anti")
        v = tx.append_batch(fresh, path)
        _repoint(spark, view, path)
        return {"op": "merge_insert_only", "table": view, "version": v}
    if c == delete_only:
        res = tx.delete_where(
            spark, path, keys=src_df.select(*keys), key_cols=keys
        )
        _repoint(spark, view, path)
        return {"op": "merge_delete", "table": view, **res}
    # GENERAL CLAUSES (the full Delta MERGE surface): conditional
    # matched clauses with column-level SET, INSERT (cols) VALUES (...),
    # WHEN NOT MATCHED BY SOURCE DELETE/UPDATE — parsed from the
    # ORIGINAL-case text (identifiers/literals matter) and routed to
    # `tx.merge_clauses` (first-match-wins, one atomic commit)
    matched, not_matched, by_source = _parse_merge_clauses(
        clauses_sql, tgt_alias, src_alias,
        {scol: tcol for tcol, scol in key_cols if scol != tcol},
    )
    batch = src_df
    # key columns were renamed to target names above; clause expressions
    # reference source columns as __s_<target-side name> after the same
    # rename, so the engine sees one consistent namespace
    res = tx.merge_clauses(
        spark, path, batch, keys,
        matched=matched or None,
        not_matched=not_matched or None,
        not_matched_by_source=by_source or None,
    )
    _repoint(spark, view, path)
    return {"op": "merge_clauses", "table": view, **(res or {})}


_MERGE_WHEN_RE = re.compile(
    r"WHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED"
    r"(?:\s+BY\s+TARGET)?|MATCHED)\b",
    re.IGNORECASE,
)


def _rewrite_aliases(
    expr: str, tgt_alias: str, src_alias: str,
    renames: dict[str, str] | None = None,
) -> str:
    """Map ``t.col`` -> ``col`` and ``s.col`` -> ``__s_col`` (the
    `merge_clauses` expression namespace). ``renames`` maps original
    source key names to the target names `_merge` renamed them to, so
    ``s.skey`` resolves after the rename. Alias-unqualified identifiers
    pass through and resolve as target columns."""
    expr = re.sub(
        rf"\b{re.escape(tgt_alias)}\.({_IDENT})", r"\1", expr
    )
    ren = renames or {}
    return re.sub(
        rf"\b{re.escape(src_alias)}\.({_IDENT})",
        lambda m: f"__s_{ren.get(m.group(1), m.group(1))}",
        expr,
    )


def _parse_merge_clauses(
    clauses_sql: str, tgt_alias: str, src_alias: str,
    renames: dict[str, str] | None = None,
) -> tuple[list[dict], list[dict], list[dict]]:
    """Parse a general ``WHEN ... THEN ...`` clause list (original case)
    into the three `tx.merge_clauses` lists. Grammar per clause:

      WHEN MATCHED [AND cond] THEN UPDATE SET (* | a = e, ...) | DELETE
      WHEN NOT MATCHED [BY TARGET] [AND cond] THEN
          INSERT * | INSERT (a, b, ...) VALUES (e1, e2, ...)
      WHEN NOT MATCHED BY SOURCE [AND cond] THEN
          DELETE | UPDATE SET a = e, ...
    """
    mask = _quote_mask(clauses_sql)
    heads = [
        m for m in _MERGE_WHEN_RE.finditer(clauses_sql)
        if not mask[m.start()]
    ]
    if not heads:
        raise ValueError("MERGE: expected at least one WHEN clause")
    if heads[0].start() != 0:
        raise ValueError(
            f"MERGE: unparsable text before first WHEN clause: "
            f"{clauses_sql[:heads[0].start()][:40]!r}"
        )
    matched: list[dict] = []
    not_matched: list[dict] = []
    by_source: list[dict] = []
    for i, h in enumerate(heads):
        end = heads[i + 1].start() if i + 1 < len(heads) else len(clauses_sql)
        body = clauses_sql[h.end():end].strip().rstrip(";").strip()
        kind = re.sub(r"\s+", " ", h.group(1).upper())
        bm = re.match(r"(?:AND\s+(?P<cond>.*?))?\s*THEN\s+(?P<act>.+)$",
                      body, re.IGNORECASE | re.DOTALL)
        if not bm:
            raise ValueError(
                f"MERGE: cannot parse WHEN clause body {body[:60]!r}"
            )
        cond = bm.group("cond")
        cond = (
            _rewrite_aliases(cond.strip(), tgt_alias, src_alias, renames)
            if cond else None
        )
        act = bm.group("act").strip()
        if kind == "MATCHED" or kind == "NOT MATCHED BY SOURCE":
            into = matched if kind == "MATCHED" else by_source
            if re.fullmatch(r"DELETE", act, re.IGNORECASE):
                into.append({"cond": cond, "action": "delete"})
                continue
            um = re.match(r"UPDATE\s+SET\s+(.+)$", act,
                          re.IGNORECASE | re.DOTALL)
            if not um:
                raise ValueError(
                    f"MERGE WHEN {kind}: expected UPDATE SET ... or "
                    f"DELETE, got {act[:40]!r}"
                )
            spec = um.group(1).strip()
            if spec == "*":
                into.append({"cond": cond, "action": "update", "set": "*"})
                continue
            sets: dict[str, str] = {}
            for a in _split_toplevel_commas(spec):
                asm = re.match(
                    rf"\s*(?:{re.escape(tgt_alias)}\.)?({_IDENT})\s*=\s*(.+)$",
                    a, re.DOTALL,
                )
                if not asm:
                    raise ValueError(
                        f"MERGE UPDATE SET: cannot parse assignment "
                        f"{a.strip()[:40]!r}"
                    )
                sets[asm.group(1)] = _rewrite_aliases(
                    asm.group(2).strip(), tgt_alias, src_alias, renames
                )
            into.append({"cond": cond, "action": "update", "set": sets})
            continue
        # NOT MATCHED [BY TARGET] -> insert clause
        if re.fullmatch(r"INSERT\s+\*", act, re.IGNORECASE):
            not_matched.append({"cond": cond, "values": "*"})
            continue
        im = re.match(
            r"INSERT\s*\((?P<cols>[^)]+)\)\s*VALUES\s*\((?P<vals>.+)\)\s*$",
            act, re.IGNORECASE | re.DOTALL,
        )
        if not im:
            raise ValueError(
                f"MERGE WHEN NOT MATCHED: expected INSERT * or "
                f"INSERT (cols) VALUES (exprs), got {act[:40]!r}"
            )
        cols = [c.strip() for c in im.group("cols").split(",")]
        vals = _split_toplevel_commas(im.group("vals"))
        if len(cols) != len(vals):
            raise ValueError(
                f"MERGE INSERT: {len(cols)} column(s) vs {len(vals)} "
                "value(s)"
            )
        not_matched.append({
            "cond": cond,
            "values": {
                c: _rewrite_aliases(
                    v.strip(), tgt_alias, src_alias, renames
                )
                for c, v in zip(cols, vals)
            },
        })
    return matched, not_matched, by_source


def _split_cond_source(rest: str) -> tuple[str, str]:
    """Split ``<condition> <source-query>`` at the first TOP-LEVEL
    (quote- and paren-aware) source keyword (SELECT/VALUES/TABLE/WITH/
    FROM) — a subquery inside the condition stays inside its parens."""
    rmask = _quote_mask(rest)
    depth = 0
    kw = re.compile(r"(SELECT|VALUES|TABLE|WITH|FROM)\b", re.IGNORECASE)
    i = 0
    while i < len(rest):
        if not rmask[i]:
            ch = rest[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0:
                mm = kw.match(rest, i)
                if mm and (i == 0 or not (rest[i - 1].isalnum()
                                          or rest[i - 1] == "_")):
                    return rest[:i].strip(), rest[i:].strip()
        i += 1
    raise ValueError(
        "REPLACE WHERE: expected a source query (SELECT/VALUES/...) "
        "after the condition"
    )


def _insert_overwrite(
    spark: SparkSession,
    view: str,
    part_spec: str | None,
    source_sql: str,
    cond: str | None,
    original: str,
):
    """Route ``INSERT OVERWRITE view [PARTITION (...)] <source>`` and
    ``INSERT INTO view REPLACE WHERE cond <source>`` to
    `tx.overwrite_where` (ONE atomic commit — scope removed, batch in,
    out-of-scope files carried by name):

      * no PARTITION, no REPLACE WHERE -> full-table overwrite
        (layout/constraints/generated preserved, unlike init_table)
      * ``PARTITION (c = v, ...)`` -> static partition overwrite: the
        scope is the named partition, the constants are appended to the
        source rows (Hive syntax — the source omits them)
      * ``PARTITION (c, ...)`` (no values) -> DYNAMIC partition
        overwrite: exactly the partitions the source carries
      * ``REPLACE WHERE cond`` -> replaceWhere (every source row must
        satisfy the condition)
    """
    try:
        path = _resolve(view)
    except KeyError:
        return spark.sql(original)
    q = source_sql.strip()
    if not re.match(r"(VALUES|SELECT|TABLE|WITH|FROM|\()", q, re.IGNORECASE):
        raise ValueError(
            f"INSERT OVERWRITE {view}: source must be VALUES/SELECT/"
            f"TABLE/WITH, got {q[:40]!r}"
        )
    batch = spark.sql(q)
    schema = _table_schema(path)
    man = tx._read_manifest(path, tx.current_version(path))
    gen_cols = set(man.get("generated") or ())
    preds = None
    dynamic = False
    if part_spec is not None:
        entries = [e.strip() for e in part_spec.split(",") if e.strip()]
        withval = [e for e in entries if "=" in e]
        if withval and len(withval) != len(entries):
            raise ValueError(
                f"INSERT OVERWRITE {view}: PARTITION spec mixes static "
                "(c = v) and dynamic (bare c) entries"
            )
        pcols = man.get("partition_cols") or []
        if not withval:
            names = [e.strip().strip('`"') for e in entries]
            if sorted(names) != sorted(pcols):
                raise ValueError(
                    f"INSERT OVERWRITE {view}: dynamic PARTITION names "
                    f"{names} must equal the declared layout {pcols}"
                )
            dynamic = True
        else:
            preds = []
            for entry in withval:
                col, raw = entry.split("=", 1)
                col = col.strip().strip('`"')
                if col not in pcols:
                    raise ValueError(
                        f"INSERT OVERWRITE {view}: {col!r} is not a "
                        f"declared partition column ({pcols})"
                    )
                raw = raw.strip()
                if len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in "'\"":
                    raw = raw[1:-1]  # quoted literal -> string value
                preds.append((col, "=", _typed_literal(path, col, raw)))
    # Hive static-partition syntax: the source omits the static
    # partition constants — positional rename FIRST (source order =
    # schema order minus generated minus static-partition columns),
    # the constants appended after
    static_cols = {c for c, _op, _v in (preds or [])}
    names_needed = [
        f.name for f in schema.fields
        if f.name not in gen_cols and f.name not in static_cols
    ]
    if len(batch.columns) != len(names_needed):
        raise ValueError(
            f"INSERT OVERWRITE {view}: the source must produce all "
            f"{len(names_needed)} non-generated/non-static table "
            f"column(s); got {len(batch.columns)}"
        )
    batch = batch.toDF(*names_needed)
    for col, _op, val in preds or []:
        batch = batch.withColumn(col, F.lit(val))
    batch = _align_to_schema(
        batch, schema, "INSERT OVERWRITE source", leave_absent=gen_cols
    )
    res = tx.overwrite_where(
        spark, path, batch,
        condition=cond, preds=preds, dynamic=dynamic,
    )
    _repoint(spark, view, path)
    return {"op": "insert_overwrite", "table": view, **res}


def _alter_table(spark: SparkSession, view: str, path: str, action: str):
    """Dispatch one ``ALTER TABLE <view> <action>`` against a live
    registered manifest view (Delta's ALTER surface, over the manifest
    layer — the SQL face of the Python verbs that already exist):

      * ``ADD CONSTRAINT name CHECK (expr)``  -> `add_table_constraint`
      * ``DROP CONSTRAINT name``              -> `drop_table_constraint`
      * ``ALTER COLUMN c SET NOT NULL``       -> `add_table_constraint`
      * ``ALTER COLUMN c DROP NOT NULL``      -> `drop_table_constraint`
      * ``RENAME COLUMN old TO new``          -> `rename_column`
      * ``DROP COLUMN c``                     -> `drop_column`
      * ``ADD COLUMN c TYPE``                 -> `add_column`

    Anything else refuses loudly naming the supported subset — the
    target IS a manifest view, so falling through to spark.sql would
    alter a same-named catalog object or fail obscurely."""
    m = re.match(
        rf"ADD\s+CONSTRAINT\s+({_IDENT})\s+CHECK\s*\((.+)\)\s*$",
        action, re.IGNORECASE | re.DOTALL,
    )
    if m:
        name, expr = m.group(1), m.group(2).strip()
        v = tx.add_table_constraint(
            spark, path, check_name=name, check_expr=expr
        )
        return {"op": "add_constraint", "table": view, "constraint": name,
                "version": v}
    m = re.match(rf"DROP\s+CONSTRAINT\s+({_IDENT})\s*$", action,
                 re.IGNORECASE)
    if m:
        v = tx.drop_table_constraint(path, check_name=m.group(1))
        return {"op": "drop_constraint", "table": view,
                "constraint": m.group(1), "version": v}
    m = re.match(
        rf"ALTER\s+COLUMN\s+({_IDENT})\s+SET\s+DEFAULT\s+(.+)$",
        action, re.IGNORECASE | re.DOTALL,
    )
    if m:
        v = tx.set_column_default(path, m.group(1), m.group(2).strip())
        return {"op": "set_default", "table": view, "column": m.group(1),
                "version": v}
    m = re.match(
        rf"ALTER\s+COLUMN\s+({_IDENT})\s+DROP\s+DEFAULT\s*$",
        action, re.IGNORECASE,
    )
    if m:
        v = tx.set_column_default(path, m.group(1), None)
        return {"op": "drop_default", "table": view,
                "column": m.group(1), "version": v}
    m = re.match(
        rf"ALTER\s+COLUMN\s+({_IDENT})\s+(SET|DROP)\s+NOT\s+NULL\s*$",
        action, re.IGNORECASE,
    )
    if m:
        col, verb = m.group(1), m.group(2).upper()
        if verb == "SET":
            v = tx.add_table_constraint(spark, path, not_null=col)
            return {"op": "add_constraint", "table": view,
                    "not_null": col, "version": v}
        v = tx.drop_table_constraint(path, not_null=col)
        return {"op": "drop_constraint", "table": view,
                "not_null": col, "version": v}
    m = re.match(
        rf"RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})\s*$",
        action, re.IGNORECASE,
    )
    if m:
        v = tx.rename_column(path, m.group(1), m.group(2))
        return {"op": "rename_column", "table": view, "old": m.group(1),
                "new": m.group(2), "version": v}
    m = re.match(rf"DROP\s+COLUMN\s+({_IDENT})\s*$", action, re.IGNORECASE)
    if m:
        v = tx.drop_column(path, m.group(1))
        return {"op": "drop_column", "table": view, "column": m.group(1),
                "version": v}
    m = re.match(rf"ADD\s+COLUMNS?\s+(.+)$", action,
                 re.IGNORECASE | re.DOTALL)
    if m:
        spec = m.group(1).strip()
        # optional ADD COLUMNS (c TYPE) wrapping parens — strip only a
        # pair where the FIRST '(' matches the LAST ')' (depth scan), so
        # decimal(10,2)/array<...> survive and '(a int), (b int)' is not
        # garbled into a bogus name/type
        if spec.startswith("(") and spec.endswith(")"):
            depth = 0
            balanced = True
            for i, ch in enumerate(spec):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and i != len(spec) - 1:
                        balanced = False  # outer pair closes early
                        break
            if balanced:
                spec = spec[1:-1].strip()
            else:
                raise ValueError(
                    f"ALTER TABLE {view} ADD COLUMNS: one column per "
                    f"statement is supported, got {spec[:40]!r}"
                )
        dm = re.search(r"\s+DEFAULT\s+(.+)$", spec,
                       re.IGNORECASE | re.DOTALL)
        default = None
        if dm:
            default = dm.group(1).strip()
            spec = spec[: dm.start()].rstrip()
        cm = re.match(rf"({_IDENT})\s+(.+)$", spec, re.DOTALL)
        if not cm:
            raise ValueError(
                f"ALTER TABLE {view} ADD COLUMN: expected '<name> <type> "
                f"[DEFAULT expr]', got {spec[:40]!r}"
            )
        v = tx.add_column(
            path, cm.group(1), cm.group(2).strip(), default=default
        )
        return {"op": "add_column", "table": view, "column": cm.group(1),
                "type": cm.group(2).strip(), "version": v,
                "default": default}
    raise ValueError(
        f"ALTER TABLE {view}: unsupported action {action[:60]!r}; "
        "supported: ADD CONSTRAINT name CHECK (expr), DROP CONSTRAINT "
        "name, ALTER COLUMN c SET|DROP NOT NULL, RENAME COLUMN old TO "
        "new, DROP COLUMN c, ADD COLUMN c TYPE"
    )


def _create_table(
    spark: SparkSession,
    name: str,
    cols_raw: str | None,
    part_raw: str | None,
    loc: str,
    ctas_query: str | None,
):
    """CREATE TABLE <name> (...) / AS SELECT — the DDL face of
    `init_table`, completing the SQL lifecycle (a SQL user can now
    create, read, and write manifest tables without touching the Python
    API). Column defs support the manifest layer's write-time invariants
    inline: ``NOT NULL`` and ``GENERATED ALWAYS AS (expr)`` (Delta's
    syntax); ``PARTITIONED BY (col, ...)`` declares the hive layout
    (partition columns may be generated ones); LOCATION is mandatory —
    there is no catalog to invent paths. CTAS initializes from the
    query's rows; the column-list form initializes EMPTY with the
    declared schema. The new table registers as a live view."""
    if tx.current_version(loc) >= 0:
        raise ValueError(f"CREATE TABLE {name}: {loc!r} already exists")
    partition_by = (
        [c.strip().strip('`"') for c in part_raw.split(",") if c.strip()]
        if part_raw else None
    )
    not_null: list[str] = []
    generated: dict[str, str] = {}
    identity: dict[str, dict] = {}
    if ctas_query is not None:
        df = spark.sql(ctas_query.strip())
    else:
        plain_defs = []
        for coldef in _split_toplevel_commas(cols_raw):
            d = coldef.strip()
            # GENERATED ALWAYS AS IDENTITY [(START WITH s INCREMENT BY k)]
            # (Delta's identity syntax) — matched before the expression
            # form, which requires a parenthesized expr after AS
            im = re.search(
                r"\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY"
                r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)\s+INCREMENT\s+BY\s+"
                r"(-?\d+)\s*\))?\s*$",
                d, re.IGNORECASE,
            )
            ident_spec = None
            if im:
                ident_spec = {
                    "start": int(im.group(1) or 1),
                    "step": int(im.group(2) or 1),
                }
                d = d[: im.start()].rstrip()
            gm = re.search(
                r"\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\)\s*$",
                d, re.IGNORECASE | re.DOTALL,
            )
            if gm:
                expr = gm.group(1).strip()
                d = d[: gm.start()].rstrip()
            else:
                expr = None
            nn = re.search(r"\s+NOT\s+NULL\s*$", d, re.IGNORECASE)
            if nn:
                d = d[: nn.start()].rstrip()
            cm = re.match(rf"({_IDENT}|`[^`]+`)\s+(.+)$", d, re.DOTALL)
            if not cm:
                raise ValueError(
                    f"CREATE TABLE {name}: cannot parse column def "
                    f"{coldef.strip()!r} (expected: name TYPE [NOT NULL] "
                    "[GENERATED ALWAYS AS (expr) | GENERATED ALWAYS AS "
                    "IDENTITY [(START WITH s INCREMENT BY k)]])"
                )
            col = cm.group(1).strip("`")
            if nn:
                not_null.append(col)
            if expr is not None:
                generated[col] = expr
            if ident_spec is not None:
                if cm.group(2).strip().lower() not in ("bigint", "long"):
                    raise ValueError(
                        f"CREATE TABLE {name}: identity column {col!r} "
                        "must be BIGINT"
                    )
                # the identity column is NOT part of the init frame —
                # init_table appends it (allocation owns the column)
                identity[col] = ident_spec
                continue
            plain_defs.append(f"{col} {cm.group(2).strip()}")
        schema_ddl = ", ".join(plain_defs)
        df = spark.createDataFrame([], schema_ddl)
    v = tx.init_table(
        df, loc,
        partition_by=partition_by,
        not_null=not_null or None,
        generated=generated or None,
        identity=identity or None,
        only_if_absent=True,
    )
    tx.register_manifest_view(spark, loc, name=name)
    if _ACTIVE_METASTORE is not None:
        # durable catalog registration: a FRESH session attaches the
        # metastore and reaches this table by pure name, no path anywhere
        _ACTIVE_METASTORE.register(spark, name, loc)
    return {
        "op": "create", "table": name, "version": v, "path": loc,
        "partition_by": partition_by or [],
        "not_null": not_null, "generated": dict(generated),
        "identity": dict(identity),
        "registered": _ACTIVE_METASTORE is not None,
    }
