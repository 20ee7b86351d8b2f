"""SQL DML router (operators/sqldml): INSERT / UPDATE / DELETE / MERGE
statements against registered manifest views dispatch to the
transactional verbs — one entry point for reads AND writes, views
repointed after every write so the session behaves like a SQL database.
"""

from __future__ import annotations

import pytest

from geomesa_cassandra_tools_spark.operators import sqldml
from geomesa_cassandra_tools_spark.operators import transactional as tx


def _mk(spark, tmp_path, name="acct", **init_kw):
    path = str(tmp_path / name)
    ddl = "k bigint, s string, price double"
    tx.init_table(
        spark.createDataFrame([(1, "a", 10.0)], ddl), path, **init_kw
    )
    tx.register_manifest_view(spark, path, name=name)
    return path


def test_insert_values_and_select_roundtrip(spark, tmp_path):
    path = _mk(spark, tmp_path)
    res = sqldml.execute(
        spark, "INSERT INTO acct VALUES (2, 'b', 20.0), (3, 'c', 30.0)"
    )
    assert res["op"] == "insert" and res["version"] == 1
    # the view was repointed: a plain SELECT sees the write
    got = sqldml.execute(spark, "SELECT count(*) AS n FROM acct").collect()
    assert got[0]["n"] == 3
    assert tx.current_version(path) == 1


def test_insert_column_list_null_fills_and_casts(spark, tmp_path):
    _mk(spark, tmp_path)
    sqldml.execute(spark, "INSERT INTO acct (price, k) VALUES (5, 9)")
    row = [
        r for r in sqldml.execute(spark, "SELECT * FROM acct").collect()
        if r["k"] == 9
    ][0]
    assert row["s"] is None and row["price"] == 5.0  # int literal cast


def test_insert_select_source(spark, tmp_path):
    _mk(spark, tmp_path)
    spark.createDataFrame([(4, "d", 1.0)], "k bigint, s string, price double"
                          ).createOrReplaceTempView("stage_src")
    sqldml.execute(spark, "INSERT INTO acct SELECT * FROM stage_src")
    assert sqldml.execute(spark, "SELECT * FROM acct").count() == 2


def test_insert_without_column_list_requires_all_columns(spark, tmp_path):
    _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="all 3 table column"):
        sqldml.execute(spark, "INSERT INTO acct VALUES (2, 'b')")


def test_update_and_delete_where(spark, tmp_path):
    path = _mk(spark, tmp_path)
    sqldml.execute(spark, "INSERT INTO acct VALUES (2, 'b', 20.0)")
    res = sqldml.execute(
        spark, "UPDATE acct SET price = price * 2, s = upper(s) WHERE k = 2"
    )
    assert res["op"] == "update" and res["files_rewritten"] == 1
    res = sqldml.execute(spark, "DELETE FROM acct WHERE k = 1")
    assert res["op"] == "delete"
    got = [tuple(r) for r in sqldml.execute(spark, "SELECT * FROM acct").collect()]
    assert got == [(2, "B", 40.0)]
    # DELETE without WHERE is the metadata-only truncate
    sqldml.execute(spark, "DELETE FROM acct")
    assert sqldml.execute(spark, "SELECT * FROM acct").count() == 0
    assert tx.current_version(path) == 4


def test_update_where_clause_inside_string_literal_not_split(spark, tmp_path):
    """The clause scanner is quote-aware: a ' WHERE ' inside a string
    literal is data, not a clause boundary."""
    _mk(spark, tmp_path)
    sqldml.execute(spark, "UPDATE acct SET s = 'a WHERE b' WHERE k = 1")
    got = sqldml.execute(spark, "SELECT s FROM acct").collect()
    assert got[0]["s"] == "a WHERE b"


def test_merge_upsert_insert_only_and_delete(spark, tmp_path):
    _mk(spark, tmp_path)
    spark.createDataFrame(
        [(1, "A1", 99.0), (7, "g", 7.0)], "k bigint, s string, price double"
    ).createOrReplaceTempView("stage")
    res = sqldml.execute(
        spark,
        "MERGE INTO acct t USING stage s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    assert res["op"] == "merge_upsert"
    got = sorted(
        tuple(r) for r in sqldml.execute(spark, "SELECT * FROM acct").collect()
    )
    assert got == [(1, "A1", 99.0), (7, "g", 7.0)]

    # insert-only: existing key 7 skipped, new key 8 lands
    spark.createDataFrame(
        [(7, "dup", 0.0), (8, "h", 8.0)], "k bigint, s string, price double"
    ).createOrReplaceTempView("stage2")
    res = sqldml.execute(
        spark,
        "MERGE INTO acct t USING stage2 s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert res["op"] == "merge_insert_only"
    got = sorted(
        r["k"] for r in sqldml.execute(spark, "SELECT * FROM acct").collect()
    )
    assert got == [1, 7, 8]
    assert [
        r["s"] for r in sqldml.execute(
            spark, "SELECT s FROM acct WHERE k = 7"
        ).collect()
    ] == ["g"]  # not overwritten

    # delete: purge the staged keys
    res = sqldml.execute(
        spark,
        "MERGE INTO acct t USING stage2 s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE",
    )
    assert res["op"] == "merge_delete"
    assert sorted(
        r["k"] for r in sqldml.execute(spark, "SELECT * FROM acct").collect()
    ) == [1]


def test_merge_subquery_source_and_key_rename(spark, tmp_path):
    """USING (subquery) AS alias; ON columns with DIFFERENT names rename
    the source key to the target's."""
    _mk(spark, tmp_path)
    res = sqldml.execute(
        spark,
        "MERGE INTO acct AS t USING "
        "(SELECT 1 AS kk, 'via_sub' AS s, 0.5 AS price) AS src "
        "ON t.k = src.kk "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    assert res["op"] == "merge_upsert"
    got = [tuple(r) for r in sqldml.execute(spark, "SELECT * FROM acct").collect()]
    assert got == [(1, "via_sub", 0.5)]


def test_merge_unsupported_clause_named_loudly(spark, tmp_path):
    _mk(spark, tmp_path)
    spark.createDataFrame([(1,)], "k bigint").createOrReplaceTempView("s1")
    # column-level SET is supported (r12, the general clause router) —
    # it routes to merge_clauses, not the legacy upsert fast path
    res = sqldml.execute(
        spark,
        "MERGE INTO acct t USING s1 s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET price = 0",
    )
    assert res["op"] == "merge_clauses" and res["version"] == 1
    got = sqldml.execute(spark, "SELECT price FROM acct").collect()
    assert [r["price"] for r in got] == [0.0]
    # a garbled action still refuses loudly
    with pytest.raises(ValueError, match="UPDATE SET"):
        sqldml.execute(
            spark,
            "MERGE INTO acct t USING s1 s ON t.k = s.k "
            "WHEN MATCHED THEN FROBNICATE",
        )
    with pytest.raises(ValueError, match="supported terms"):
        sqldml.execute(
            spark,
            "MERGE INTO acct t USING s1 s ON t.k > s.k "
            "WHEN MATCHED THEN DELETE",
        )


def test_constraints_gate_sql_writes(spark, tmp_path):
    path = _mk(spark, tmp_path, not_null=["s"],
               check_constraints={"price_pos": "price > 0"})
    with pytest.raises(tx.ConstraintViolation, match="NOT NULL s"):
        sqldml.execute(spark, "INSERT INTO acct VALUES (2, NULL, 1.0)")
    with pytest.raises(tx.ConstraintViolation, match="price_pos"):
        sqldml.execute(spark, "UPDATE acct SET price = -1 WHERE k = 1")
    assert tx.current_version(path) == 0  # nothing burned


def test_partitioned_layout_preserved_by_sql_dml(spark, tmp_path):
    path = str(tmp_path / "events")
    ddl = "id bigint, day string"
    tx.init_table(
        spark.createDataFrame([(1, "d1"), (2, "d2")], ddl), path,
        partition_by=["day"],
    )
    tx.register_manifest_view(spark, path, name="events")
    sqldml.execute(spark, "INSERT INTO events VALUES (3, 'd1')")
    sqldml.execute(spark, "UPDATE events SET day = 'd3' WHERE id = 2")
    man = tx._read_manifest(path, tx.current_version(path))
    assert all(f.split("/")[0].startswith("day=") for f in man["files"])
    assert {f.split("/")[0] for f in man["files"]} == {"day=d1", "day=d3"}


def test_pinned_view_is_readonly(spark, tmp_path):
    path = _mk(spark, tmp_path)
    tx.register_manifest_view(spark, path, name="acct_v0", version=0)
    with pytest.raises(ValueError, match="read-only"):
        sqldml.execute(spark, "DELETE FROM acct_v0")
    # but SELECT through it still works
    assert sqldml.execute(spark, "SELECT * FROM acct_v0").count() == 1


def test_unregistered_names_pass_through_to_spark(spark, tmp_path):
    spark.createDataFrame([(1,)], "x bigint").createOrReplaceTempView(
        "plain_view"
    )
    got = sqldml.execute(spark, "SELECT x + 1 AS y FROM plain_view").collect()
    assert got[0]["y"] == 2


def test_exactly_once_history_ops(spark, tmp_path):
    """The SQL verbs land as ordinary manifest commits: history records
    them and time travel crosses them."""
    path = _mk(spark, tmp_path)
    sqldml.execute(spark, "INSERT INTO acct VALUES (2, 'b', 2.0)")
    sqldml.execute(spark, "UPDATE acct SET price = 0 WHERE k = 2")
    sqldml.execute(spark, "DELETE FROM acct WHERE k = 1")
    ops = [h["op"] for h in tx.table_history(path)]
    assert ops[-3:] == ["append", "update", "delete"]
    assert tx.read_table(spark, path, version=1).count() == 2


def test_create_table_non_manifest_falls_through(spark, tmp_path):
    """A CREATE TABLE whose tail is NOT the manifest dialect (USING
    clause, no LOCATION) is a plain Spark statement and must fall
    through to spark.sql, not raise — the router only intercepts its
    own dialect."""
    loc = str(tmp_path / "plain_spark_t")
    sqldml.execute(
        spark,
        f"CREATE TABLE plain_spark_t (a INT) USING parquet "
        f"LOCATION '{loc}'",
    )
    try:
        assert (
            spark.sql("SELECT count(*) AS n FROM plain_spark_t")
            .collect()[0]["n"] == 0
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS plain_spark_t")


def test_create_table_shallow_clone_statement(spark, tmp_path):
    """CREATE TABLE ... SHALLOW CLONE ... LOCATION: the source view
    resolves, the clone lands at LOCATION as v0, the target name is
    immediately SELECT-able, VERSION AS OF pins the snapshot, a pinned
    source view clones its own pin, and writes to the clone leave the
    source untouched."""
    path = _mk(spark, tmp_path, name="src_t")
    sqldml.execute(spark, "INSERT INTO src_t VALUES (2, 'b', 20.0)")

    loc = str(tmp_path / "clone_t")
    res = sqldml.execute(
        spark,
        f"CREATE TABLE clone_t SHALLOW CLONE src_t LOCATION '{loc}'",
    )
    assert res["op"] == "clone" and res["version"] == 0
    assert res["source_version"] == 1
    got = sqldml.execute(spark, "SELECT count(*) AS n FROM clone_t").collect()
    assert got[0]["n"] == 2
    # writes to the clone are independent of the source
    sqldml.execute(spark, "INSERT INTO clone_t VALUES (9, 'z', 90.0)")
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM clone_t"
    ).collect()[0]["n"] == 3
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM src_t"
    ).collect()[0]["n"] == 2

    # VERSION AS OF pins the pre-insert snapshot
    loc0 = str(tmp_path / "clone_v0")
    res0 = sqldml.execute(
        spark,
        f"CREATE TABLE clone_v0 SHALLOW CLONE src_t VERSION AS OF 0 "
        f"LOCATION '{loc0}'",
    )
    assert res0["source_version"] == 0
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM clone_v0"
    ).collect()[0]["n"] == 1

    # a pinned source view clones its own pin
    tx.register_manifest_view(spark, path, name="src_t_v0", version=0)
    locp = str(tmp_path / "clone_pin")
    resp = sqldml.execute(
        spark,
        f"CREATE TABLE clone_pin SHALLOW CLONE src_t_v0 LOCATION '{locp}'",
    )
    assert resp["source_version"] == 0

    # a filtered face cannot clone
    tx.register_manifest_view(
        spark, path, name="src_t_f", where=[("k", "=", 1)]
    )
    with pytest.raises(ValueError, match="filtered face"):
        sqldml.execute(
            spark,
            "CREATE TABLE x SHALLOW CLONE src_t_f LOCATION '/tmp/never'",
        )


def test_create_table_statement_and_ctas(spark, tmp_path):
    """CREATE TABLE (cols) with inline NOT NULL / GENERATED ALWAYS AS /
    PARTITIONED BY initializes an empty manifest table with those
    invariants live; CTAS initializes from the query; both register the
    name for immediate DML/SELECT through the router."""
    import datetime as _dt

    loc = str(tmp_path / "ddl_t")
    res = sqldml.execute(
        spark,
        f"""CREATE TABLE ddl_t (
              id BIGINT NOT NULL,
              ts TIMESTAMP_NTZ,
              event_date DATE GENERATED ALWAYS AS (to_date(ts))
            ) PARTITIONED BY (event_date) LOCATION '{loc}'""",
    )
    assert res["op"] == "create" and res["version"] == 0
    assert res["not_null"] == ["id"] and res["partition_by"] == ["event_date"]
    assert res["generated"] == {"event_date": "to_date(ts)"}
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM ddl_t"
    ).collect()[0]["n"] == 0
    # the invariants are LIVE: insert without the generated column
    # computes it; a NULL id is refused by the NOT NULL gate
    sqldml.execute(
        spark, "INSERT INTO ddl_t (id, ts) VALUES "
        "(1, TIMESTAMP_NTZ '2026-01-02 09:30:00')"
    )
    row = sqldml.execute(spark, "SELECT * FROM ddl_t").collect()[0]
    assert row["event_date"] == _dt.date(2026, 1, 2)
    with pytest.raises(tx.ConstraintViolation):
        sqldml.execute(
            spark, "INSERT INTO ddl_t (id, ts) VALUES "
            "(NULL, TIMESTAMP_NTZ '2026-01-03 09:30:00')"
        )
    man = tx._read_manifest(loc, tx.current_version(loc))
    assert man["partition_cols"] == ["event_date"]
    new = man["files"]
    assert all(f.startswith("event_date=2026-01-02/") for f in new)

    # CTAS
    loc2 = str(tmp_path / "ctas_t")
    res2 = sqldml.execute(
        spark,
        f"CREATE TABLE ctas_t LOCATION '{loc2}' AS "
        "SELECT id * 2 AS k FROM ddl_t",
    )
    assert res2["op"] == "create"
    assert sqldml.execute(
        spark, "SELECT sum(k) AS s FROM ctas_t"
    ).collect()[0]["s"] == 2
    # existing location refused
    with pytest.raises(ValueError, match="already exists"):
        sqldml.execute(
            spark, f"CREATE TABLE x (a BIGINT) LOCATION '{loc}'"
        )


def test_utility_statements_lifecycle(spark, tmp_path):
    """RESTORE TABLE / OPTIMIZE [WHERE] [ZORDER BY] / VACUUM / DESCRIBE
    HISTORY|DETAIL / table_changes(...) — the full table lifecycle as
    SQL statements through one entry point."""
    path = _mk(spark, tmp_path, name="life_t")
    sqldml.execute(spark, "INSERT INTO life_t VALUES (2, 'b', 20.0)")
    sqldml.execute(spark, "INSERT INTO life_t VALUES (3, 'c', 30.0)")

    # table_changes TVF: the statement rewrites to a registered feed view
    got = sqldml.execute(
        spark,
        "SELECT _change_type, count(*) AS n FROM table_changes(life_t, 1, 2) "
        "GROUP BY _change_type",
    ).collect()
    assert {(r["_change_type"], r["n"]) for r in got} == {("insert", 2)}

    # RESTORE TO VERSION AS OF 1 (post-first-insert snapshot)
    res = sqldml.execute(
        spark, "RESTORE TABLE life_t TO VERSION AS OF 1"
    )
    assert res["op"] == "restore" and res["restored_to"] == 1
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM life_t"
    ).collect()[0]["n"] == 2

    # OPTIMIZE bin-packs the small files in one commit
    res = sqldml.execute(spark, "OPTIMIZE life_t")
    assert res["op"] == "optimize" and res["files_compacted"] >= 2
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM life_t"
    ).collect()[0]["n"] == 2

    # DESCRIBE HISTORY / DETAIL come back as DataFrames
    hist = sqldml.execute(spark, "DESCRIBE HISTORY life_t").collect()
    assert [r["op"] for r in hist][:2] == ["init", "append"]
    assert hist[-1]["op"] == "compact"
    detail = {
        r["key"]: r["value"]
        for r in sqldml.execute(spark, "DESCRIBE DETAIL life_t").collect()
    }
    assert detail["version"] == str(tx.current_version(path))

    # VACUUM reclaims the superseded files
    res = sqldml.execute(spark, "VACUUM life_t RETAIN 1 VERSIONS")
    assert res["op"] == "vacuum"
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM life_t"
    ).collect()[0]["n"] == 2

    # OPTIMIZE ... WHERE types its literal from the schema (string col)
    p2 = str(tmp_path / "scoped")
    tx.init_table(
        spark.createDataFrame([(1, "d1")], "k bigint, day string"),
        p2, partition_by=["day"],
    )
    tx.append_batch(
        spark.createDataFrame([(2, "d1")], "k bigint, day string"), p2
    )
    tx.append_batch(
        spark.createDataFrame([(3, "d2")], "k bigint, day string"), p2
    )
    tx.register_manifest_view(spark, p2, name="scoped_t")
    res = sqldml.execute(spark, "OPTIMIZE scoped_t WHERE day = 'd1'")
    assert res["op"] == "optimize" and res["files_compacted"] == 2
    # ZORDER form parses and commits
    res = sqldml.execute(spark, "OPTIMIZE scoped_t ZORDER BY (k)")
    assert res["files_compacted"] >= 1


def test_alter_table_statements(spark, tmp_path):
    """ALTER TABLE as statements: ADD/DROP CONSTRAINT, SET/DROP NOT
    NULL, RENAME COLUMN, DROP COLUMN, ADD COLUMN all dispatch to the
    transactional verbs, re-register the view, and the constraints are
    LIVE; an unsupported action refuses loudly; an unregistered name
    falls through to spark.sql."""
    path = _mk(spark, tmp_path, name="alt")
    res = sqldml.execute(
        spark, "ALTER TABLE alt ADD CONSTRAINT pos_price CHECK (price > 0)"
    )
    assert res["op"] == "add_constraint" and res["version"] == 1
    with pytest.raises(tx.ConstraintViolation):
        sqldml.execute(spark, "INSERT INTO alt VALUES (2, 'b', -5.0)")
    sqldml.execute(spark, "ALTER TABLE alt DROP CONSTRAINT pos_price")
    sqldml.execute(spark, "INSERT INTO alt VALUES (2, 'b', -5.0)")

    res = sqldml.execute(spark, "ALTER TABLE alt ALTER COLUMN s SET NOT NULL")
    assert res["op"] == "add_constraint" and res["not_null"] == "s"
    with pytest.raises(tx.ConstraintViolation):
        sqldml.execute(spark, "INSERT INTO alt (k, price) VALUES (3, 1.0)")
    sqldml.execute(spark, "ALTER TABLE alt ALTER COLUMN s DROP NOT NULL")

    res = sqldml.execute(spark, "ALTER TABLE alt RENAME COLUMN s TO label")
    assert res["op"] == "rename_column"
    # the view was re-registered: SELECT sees the new name immediately
    assert "label" in sqldml.execute(
        spark, "SELECT * FROM alt"
    ).columns

    res = sqldml.execute(spark, "ALTER TABLE alt ADD COLUMN note string")
    assert res["op"] == "add_column"
    row = sqldml.execute(
        spark, "SELECT note FROM alt WHERE k = 1"
    ).collect()[0]
    assert row["note"] is None  # old files null-backfill

    res = sqldml.execute(spark, "ALTER TABLE alt DROP COLUMN note")
    assert res["op"] == "drop_column"
    assert "note" not in sqldml.execute(spark, "SELECT * FROM alt").columns

    with pytest.raises(ValueError, match="unsupported action"):
        sqldml.execute(spark, "ALTER TABLE alt SET TBLPROPERTIES (x=1)")
    # unregistered target: plain Spark path (errors as Spark, not ours)
    import pyspark.errors

    with pytest.raises(pyspark.errors.AnalysisException):
        sqldml.execute(
            spark, "ALTER TABLE no_such_view_xyz RENAME COLUMN a TO b"
        )


def test_add_column_on_mapped_table_gets_fresh_physical(spark, tmp_path):
    """ADD COLUMN on a column-mapped table assigns a fresh physical name
    (never resurrecting dropped bytes): drop a column, re-add the same
    logical name, and the old values must NOT come back."""
    path = _mk(spark, tmp_path, name="remap")
    sqldml.execute(spark, "ALTER TABLE remap RENAME COLUMN s TO tag")
    sqldml.execute(spark, "ALTER TABLE remap DROP COLUMN tag")
    sqldml.execute(spark, "ALTER TABLE remap ADD COLUMN tag string")
    row = sqldml.execute(
        spark, "SELECT tag FROM remap WHERE k = 1"
    ).collect()[0]
    assert row["tag"] is None  # 'a' must not resurrect
    man = tx._read_manifest(path, tx.current_version(path))
    assert man["column_map"]["tag"] != "s"


def test_inline_as_of_in_select(spark, tmp_path):
    """Inline `VERSION AS OF` / `TIMESTAMP AS OF` inside a SELECT: one
    statement can join two snapshots of the same view without
    pre-pinning; a string literal containing the phrase is untouched;
    unregistered names stay verbatim for Spark."""
    path = _mk(spark, tmp_path, name="tt")
    sqldml.execute(spark, "INSERT INTO tt VALUES (2, 'b', 20.0)")
    sqldml.execute(spark, "UPDATE tt SET price = 99.0 WHERE k = 1")

    got = sqldml.execute(
        spark, "SELECT count(*) AS n FROM tt VERSION AS OF 0"
    ).collect()
    assert got[0]["n"] == 1
    # two faces of the same view in ONE statement (the q163 diff shape)
    diff = sqldml.execute(
        spark,
        "SELECT cur.k, cur.price AS now, old.price AS was "
        "FROM tt cur JOIN tt VERSION AS OF 0 old ON cur.k = old.k",
    ).collect()
    assert [(r["k"], r["now"], r["was"]) for r in diff] == [(1, 99.0, 10.0)]
    # TIMESTAMP AS OF resolves through version_as_of: pin at v1's stamp
    ts1 = tx.table_history(path)[1]["ts"]
    got = sqldml.execute(
        spark,
        f"SELECT sum(price) AS s FROM tt TIMESTAMP AS OF '{ts1}'"
    ).collect()
    assert got[0]["s"] == 30.0  # v1 state: 10 + 20
    # quoted occurrences are data, not syntax
    row = sqldml.execute(
        spark, "SELECT 'tt VERSION AS OF 0' AS lit"
    ).collect()[0]
    assert row["lit"] == "tt VERSION AS OF 0"


def test_convert_to_manifest_statement(spark, tmp_path):
    """CONVERT TO MANIFEST 'path' STATS (...) AS name: in-place
    conversion through the router, registered for immediate SELECT and
    DML."""
    loc = str(tmp_path / "plainsql")
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k bigint, v double"
    ).coalesce(2).write.parquet(loc)
    res = sqldml.execute(
        spark, f"CONVERT TO MANIFEST '{loc}' STATS (k) AS conv_t"
    )
    assert res["op"] == "convert" and res["files_converted"] == 2
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM conv_t"
    ).collect()[0]["n"] == 10
    sqldml.execute(spark, "INSERT INTO conv_t VALUES (100, 1.5)")
    assert sqldml.execute(
        spark, "SELECT count(*) AS n FROM conv_t VERSION AS OF 0"
    ).collect()[0]["n"] == 10
    assert tx.describe_table(loc)["stats_cols"] == ["k"]
