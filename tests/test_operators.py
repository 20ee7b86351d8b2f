"""Unit tests for operator modules not exercised through the oracle gate:
catalog/metastore ops, the maintenance pipeline (side-effecting), text→struct
parsing on nodetool-shaped fixtures, join edge cases, geo cover properties,
and the multimodal plumbing contract (SURVEY.md §5 items 3–4)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.catalog import GeoCatalog, nodes_registry
from geomesa_cassandra_tools_spark.functions import parsing
from geomesa_cassandra_tools_spark.operators import dedup, geo, joins, maintenance, multimodal

# ------------------------------------------------------------------ catalog

CAT_ROWS = [
    ("ks", "cat", "roads", "Cat_roads_z3\ncat_roads_z2\n  CAT_ROADS_ID \nother_roads"),
    ("ks", "cat", "pois", "cat_pois_z2\ncat_pois_id"),
    ("ks", "other_cat", "roads", "other_cat_roads_z2"),
]


@pytest.fixture(scope="module")
def cat(spark) -> GeoCatalog:
    return GeoCatalog.from_rows(spark, CAT_ROWS)


def test_list_sfts_scopes_and_dedups(cat):
    got = {r["sft"] for r in cat.list_sfts("ks", "cat").collect()}
    assert got == {"roads", "pois"}


def test_find_schema_tables_normalizes_and_prefix_filters(cat):
    got = {r["table"] for r in cat.find_schema_tables("ks", "cat", "roads").collect()}
    # lower+trim applied, non-catalog-prefixed name dropped
    assert got == {"cat_roads_z3", "cat_roads_z2", "cat_roads_id"}


def test_missing_tables_anti_join(spark, cat):
    existing = spark.createDataFrame(
        [("cat_roads_z2",), ("cat_roads_id",)], "table string"
    )
    missing = {r["table"] for r in cat.missing_tables("ks", "cat", "roads", existing).collect()}
    assert missing == {"cat_roads_z3"}
    assert not cat.tables_exist("ks", "cat", "roads", existing)
    all_there = existing.union(spark.createDataFrame([("cat_roads_z3",)], "table string"))
    assert cat.tables_exist("ks", "cat", "roads", all_there)


def test_remove_sft_filters_only_target(cat):
    out = cat.remove_sft("ks", "cat", "roads").df
    assert out.count() == 2
    assert out.where((F.col("sft") == "roads") & (F.col("catalog") == "cat")).count() == 0


def test_nodes_registry(spark, tmp_path):
    p = tmp_path / "remotes.json"
    p.write_text(json.dumps({
        "n1": {"host": "10.0.0.1", "port": 22, "user": "a", "password": "x"},
        "n2": {"host": "10.0.0.2", "port": 2222, "user": "b", "password": "y"},
    }))
    reg = nodes_registry(spark, str(p))
    rows = {r["name"]: (r["host"], r["port"], r["user"]) for r in reg.collect()}
    assert rows == {"n1": ("10.0.0.1", 22, "a"), "n2": ("10.0.0.2", 2222, "b")}


# -------------------------------------------------------------- maintenance


def test_remove_schema_pipeline(spark, tmp_path):
    cat = GeoCatalog.from_rows(spark, [("ks", "cat", "roads", "cat_roads_z2\ncat_roads_id")])
    paths = {}
    for t in ("cat_roads_z2", "cat_roads_id"):
        path = str(tmp_path / t)
        spark.range(100).write.parquet(path)
        paths[t] = path
    new_cat, audit = maintenance.remove_schema(spark, cat, "ks", "cat", "roads", paths)
    assert new_cat.df.count() == 0
    for path in paths.values():
        assert spark.read.parquet(path).count() == 0
    acts = {r["action"] for r in audit.collect()}
    assert {"identify_schema_tables", "tables_exist", "truncate", "compact",
            "remove_sft_from_catalog"} <= acts
    assert audit.where(~F.col("ok")).count() == 0


def test_remove_schema_manifest_parity_with_parquet_path(spark, tmp_path):
    """The transactional variant must land in the SAME end state as the
    overwrite path on the same fixture — empty tables, same schema, same
    catalog — with the audit recording the atomic commits."""
    from geomesa_cassandra_tools_spark.operators import transactional

    def fixture(root, fmt):
        cat = GeoCatalog.from_rows(
            spark, [("ks", "cat", "roads", "cat_roads_z2\ncat_roads_id")]
        )
        paths = {}
        for t in ("cat_roads_z2", "cat_roads_id"):
            path = str(root / fmt / t)
            if fmt == "manifest":
                transactional.init_table(spark.range(100), path)
            else:
                spark.range(100).write.parquet(path)
            paths[t] = path
        return cat, paths

    cat_p, paths_p = fixture(tmp_path, "parquet")
    new_p, audit_p = maintenance.remove_schema(
        spark, cat_p, "ks", "cat", "roads", paths_p, fmt="parquet"
    )
    cat_m, paths_m = fixture(tmp_path, "manifest")
    new_m, audit_m = maintenance.remove_schema(
        spark, cat_m, "ks", "cat", "roads", paths_m, fmt="manifest"
    )
    assert new_p.df.count() == new_m.df.count() == 0
    for path in paths_p.values():
        assert spark.read.parquet(path).count() == 0
    for path in paths_m.values():
        t = transactional.read_table(spark, path)
        assert t.count() == 0 and t.schema == spark.range(1).schema
        # vacuum reclaimed the truncated snapshot's data files
        assert os.listdir(os.path.join(path, "data")) == []
    assert {r["action"] for r in audit_p.collect()} == {
        r["action"] for r in audit_m.collect()
    }
    assert audit_m.where(
        F.col("detail").startswith("atomic manifest commit")
    ).count() == 2
    with pytest.raises(ValueError, match="do not exist"):
        # a manifest path with no committed manifest is a missing table
        maintenance.remove_schema(
            spark, cat_m, "ks", "cat", "roads",
            {t: str(tmp_path / "nowhere" / t) for t in paths_m}, fmt="manifest",
        )


def test_transactional_delete_rewrites_only_hit_files(spark, tmp_path):
    """DELETE's file-level surgery: only files containing matching rows are
    rewritten; the rest carry over by reference — the property that makes a
    targeted delete O(hit files), not O(table), at 100 TB. NULL-condition
    rows survive (SQL DELETE semantics), and a reader pinned to the old
    snapshot is unaffected until its own re-resolve."""
    from geomesa_cassandra_tools_spark.operators import transactional as tx

    path = str(tmp_path / "t")
    # two files with disjoint id ranges: deletes in one must not touch the other
    df = spark.createDataFrame(
        [(i, None if i == 5 else i % 3) for i in range(10)], "id bigint, grp bigint"
    ).repartitionByRange(2, "id")
    tx.init_table(df, path)
    before = tx.read_table(spark, path)  # pinned snapshot
    stats = tx.delete_where(spark, path, (F.col("id") < 5) & (F.col("grp") == 0))
    assert stats["files_rewritten"] == 1 and stats["files_carried"] >= 1
    got = {r["id"] for r in tx.read_table(spark, path).collect()}
    # ids 0,3 deleted (grp=0, id<5); id 5 has NULL grp → survives
    assert got == {1, 2, 4, 5, 6, 7, 8, 9}
    assert {r["id"] for r in before.collect()} == set(range(10))  # old snapshot intact
    # vacuum drops the superseded file; the surviving table is unchanged
    removed = tx.vacuum(path, grace_seconds=0)  # single-writer test
    assert removed >= 1
    assert {r["id"] for r in tx.read_table(spark, path).collect()} == got
    # no-match delete is a metadata-only commit
    stats2 = tx.delete_where(spark, path, F.col("id") > 100)
    assert stats2["files_rewritten"] == 0 and stats2["files_carried"] >= 1


def test_transactional_commit_conflict_raises(spark, tmp_path):
    """Two writers racing to the same version: the second commit must fail
    loudly (optimistic concurrency), never silently replace the first."""
    from geomesa_cassandra_tools_spark.operators import transactional as tx

    path = str(tmp_path / "t")
    tx.init_table(spark.range(5), path)
    v = tx.current_version(path)
    tx._commit(path, v + 1, [], "{}")
    with pytest.raises(RuntimeError, match="concurrent commit conflict"):
        tx._commit(path, v + 1, [], "{}")


def test_remove_schema_missing_table_raises(spark, tmp_path):
    cat = GeoCatalog.from_rows(spark, [("ks", "cat", "roads", "cat_roads_z2")])
    with pytest.raises(ValueError, match="do not exist"):
        maintenance.remove_schema(spark, cat, "ks", "cat", "roads", {})


def test_ttl_expire(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-08 00:00:00",), ("2024-01-10 00:00:00",)],
        "ts string",
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    out = maintenance.ttl_expire(df, "ts", ttl_seconds=3 * 86400, now_ts="2024-01-10 00:00:00")
    assert out.count() == 2  # Jan 8 and Jan 10 survive a 3-day TTL


def test_set_schema_gc_grace_sets_property_per_table(spark):
    """change_gc_grace_seconds analog (/root/reference/geomesa_cassandra.py:
    276-290): every physical table of the SFT gets the retention property,
    an existing value is overwritten (upsert, not append), and the audit
    has one set row per table."""
    cat = GeoCatalog.from_rows(spark, [("ks", "cat", "roads", "cat_roads_z2\ncat_roads_id")])
    props = maintenance.set_table_property(
        spark, None, "ks", "cat_roads_z2", maintenance.GC_GRACE_PROPERTY, 864000
    )
    props, audit = maintenance.set_schema_gc_grace(spark, cat, props, "ks", "cat", "roads", 1200)
    got = {r["table"]: r["value"] for r in props.collect()}
    assert got == {"cat_roads_z2": 1200, "cat_roads_id": 1200}  # old 864000 overwritten
    acts = [r for r in audit.collect() if r["action"] == "set_gc_grace_seconds"]
    assert len(acts) == 2 and all(r["detail"] == "1200" and r["ok"] for r in acts)
    # mixed properties coexist: a TTL row on the same table is untouched
    props = maintenance.set_table_property(
        spark, props, "ks", "cat_roads_z2", maintenance.TTL_PROPERTY, 3600
    )
    assert props.count() == 3


def test_vacuum_tombstones_honors_gc_grace(spark):
    df = spark.createDataFrame(
        [
            (1, None),                      # live row
            (2, "2024-01-09 00:00:00"),     # recent tombstone (within grace)
            (3, "2024-01-01 00:00:00"),     # expired tombstone → purged
        ],
        "id int, deleted_ts string",
    ).select("id", F.col("deleted_ts").cast("timestamp_ntz").alias("deleted_ts"))
    out = maintenance.vacuum_tombstones(
        df, "deleted_ts", gc_grace_seconds=3 * 86400, now_ts="2024-01-10 00:00:00"
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_compact_parquet_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(1000).repartition(16).write.parquet(path)
    before, after = maintenance.compact_parquet(spark, path, target_file_mb=128)
    assert before == 16 and after == 1
    assert spark.read.parquet(path).count() == 1000


# ------------------------------------------------------------------ parsing

NODETOOL_COMPACTIONS = """\
pending tasks: 2
          id                                   compaction type keyspace table completed total unit progress
   59f80a30-member-of-noise
   8d9c6a70-0a1e-11ee-9c58-7b3a4d2e9f10 Compaction geomesa cat_roads_z2 12 100 bytes 12.00%
   9e0d7b81-1b2f-11ee-9c58-7b3a4d2e9f10 Compaction geomesa cat_roads_id 99 100 bytes 99.00%
   E3B0C442-98FC-11EE-9C58-7B3A4D2E9F10 Compaction geomesa cat_roads_up 1 100 bytes 1.00%
"""

NODETOOL_SNAPSHOTS = """\
Snapshot Details:
Snapshot name Keyspace name Column family name True size Size on disk
   snap1 geomesa cat_roads_z2 0 bytes 13 bytes
   snap2 othks othtbl 0 bytes 13 bytes
"""


def test_parse_compactions_drops_noise(spark):
    lines = spark.createDataFrame(
        [(l,) for l in NODETOOL_COMPACTIONS.splitlines()], "value string"
    )
    out = parsing.parse_compactions(lines).collect()
    # uppercase-hex ids parse too (reference node.py:111 accepts them);
    # noise, the pending-tasks line and the column header are all dropped
    assert {(r["keyspace"], r["table"]) for r in out} == {
        ("geomesa", "cat_roads_z2"),
        ("geomesa", "cat_roads_id"),
        ("geomesa", "cat_roads_up"),
    }


def test_parse_snapshots(spark):
    lines = spark.createDataFrame(
        [(l,) for l in NODETOOL_SNAPSHOTS.splitlines()], "value string"
    )
    out = parsing.parse_snapshots(lines)
    got = {(r["name"], r["keyspace"], r["table"]) for r in out.collect()}
    # header lines match the loose \S+ pattern too (the reference's regex is
    # equally permissive for the name group); data rows must all be present
    assert {("snap1", "geomesa", "cat_roads_z2"), ("snap2", "othks", "othtbl")} <= got


def test_is_up_predicate(spark):
    """ALL THREE flags must be true (reference node.py:48-53): a node with
    Thrift down is not up."""
    df = spark.createDataFrame(
        [
            ("Gossip active : true\nThrift active : true\nNative Transport active : true",),
            ("Gossip active : true\nThrift active : false\nNative Transport active : true",),
            ("Gossip active : false\nThrift active : true\nNative Transport active : true",),
        ],
        "info string",
    )
    got = [r[0] for r in df.select(parsing.is_up(F.col("info"))).collect()]
    assert got == [True, False, False]


def test_cqlsh_data_rows(spark):
    lines = spark.createDataFrame(
        [(" sft",), ("-----",), ("    roads ",), ("    pois",), ("(2 rows)",)],
        "value string",
    )
    got = {r["row"] for r in parsing.cqlsh_data_rows(lines).collect()}
    assert got == {"roads", "pois"}


# -------------------------------------------------------------------- joins


def test_asof_join_tie_is_inclusive(spark):
    left = spark.createDataFrame([(1, 100, "p1")], "user_id int, ts int, pid string")
    right = spark.createDataFrame(
        [(1, 100, "v_at"), (1, 90, "v_before"), (1, 101, "v_after")],
        "user_id int, ts int, vid string",
    )
    out = joins.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["vid"], how="inner",
    ).collect()
    assert len(out) == 1 and out[0]["vid_right"] == "v_at"


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame([(1, 50, "p1"), (2, 50, "p2")], "user_id int, ts int, pid string")
    right = spark.createDataFrame([(1, 40, "v1")], "user_id int, ts int, vid string")
    out = joins.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["vid"], how="inner",
    ).collect()
    assert [(r["pid"], r["vid_right"]) for r in out] == [("p1", "v1")]


def test_asof_join_null_right_columns_stay_row_atomic(spark):
    """Right columns must come from ONE right row even when some are NULL:
    per-column last(ignorenulls) would stitch vid from ts=90 with extra
    from ts=95. The matched row's values are (NULL, 'x95')."""
    left = spark.createDataFrame([(1, 100, "p1")], "user_id int, ts int, pid string")
    right = spark.createDataFrame(
        [(1, 90, "v90", None), (1, 95, None, "x95")],
        "user_id int, ts int, vid string, extra string",
    )
    out = joins.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["vid", "extra"], how="inner",
    ).collect()
    assert len(out) == 1
    assert (out[0]["vid_right"], out[0]["extra_right"]) == (None, "x95")


def test_asof_join_inner_keeps_match_with_all_null_right_cols(spark):
    """Inner-mode matched-ness probes the packed struct, not right_cols[0]:
    a genuinely matched right row whose payload columns are all NULL must
    survive, while a left row with no match at all is dropped."""
    left = spark.createDataFrame(
        [(1, 100, "p1"), (2, 100, "p2")], "user_id int, ts int, pid string"
    )
    right = spark.createDataFrame(
        [(1, 90, None, None)], "user_id int, ts int, vid string, extra string"
    )
    out = joins.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["vid", "extra"], how="inner",
    ).collect()
    assert [(r["pid"], r["vid_right"], r["extra_right"]) for r in out] == [("p1", None, None)]


def test_range_join_bucketed_equals_unbucketed(spark):
    left = spark.createDataFrame(
        [(1, i) for i in range(0, 100, 7)], "k int, p int"
    )
    right = spark.createDataFrame(
        [(1, 10, 30), (1, 25, 95), (2, 0, 100)], "k int, lo int, hi int"
    )
    plain = joins.range_join(left, right, on=["k"], left_point="p", right_lo="lo", right_hi="hi")
    bucketed = joins.range_join(
        left, right, on=["k"], left_point="p", right_lo="lo", right_hi="hi", bucket_width=16
    )
    key = lambda r: (r["k"], r["p"], r["lo"], r["hi"])
    assert sorted(map(key, plain.collect())) == sorted(map(key, bucketed.collect()))


# ---------------------------------------------------------------------- geo


def test_bbox_ranges_cover_all_inner_cells():
    lon_min, lon_max, lat_min, lat_max, res = -10.0, 40.0, 20.0, 60.0, 6
    ranges = geo.bbox_cell_ranges(lon_min, lon_max, lat_min, lat_max, res=res, max_ranges=8)
    assert len(ranges) <= 8

    def covered(z: int) -> bool:
        return any(lo <= z <= hi for lo, hi in ranges)

    x0 = geo._cell_index(lon_min, -180.0, 180.0, res)
    x1 = geo._cell_index(lon_max, -180.0, 180.0, res)
    y0 = geo._cell_index(lat_min, -90.0, 90.0, res)
    y1 = geo._cell_index(lat_max, -90.0, 90.0, res)
    assert all(
        covered(geo._interleave_int(x, y, res))
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    )


def test_z2_matches_driver_side_interleave(spark):
    pts = [(-180.0, -90.0), (0.0, 0.0), (179.9, 89.9), (-10.5, 42.25)]
    df = spark.createDataFrame(pts, "lon double, lat double").select(
        "lon", "lat", geo.z2(F.col("lon"), F.col("lat"), res=8).alias("z")
    )
    for r in df.collect():
        expected = geo._interleave_int(
            geo._cell_index(r["lon"], -180.0, 180.0, 8),
            geo._cell_index(r["lat"], -90.0, 90.0, 8),
            8,
        )
        assert r["z"] == expected


def test_write_z_ordered_files_have_tight_z_ranges(spark, tmp_path):
    df = spark.createDataFrame(
        [(float(i % 360 - 180), float((i * 7) % 180 - 90)) for i in range(2000)],
        "lon double, lat double",
    )
    path = str(tmp_path / "zord")
    geo.write_z_ordered(df, path, "lon", "lat", num_files=4)
    out = spark.read.parquet(path)
    spans = (
        out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.min("z2").alias("lo"), F.max("z2").alias("hi"))
        .collect()
    )
    # range-partitioned files must not overlap in z2 (tight min/max = skippable)
    ordered = sorted((r["lo"], r["hi"]) for r in spans)
    assert all(a[1] <= b[0] for a, b in zip(ordered, ordered[1:]))


# --------------------------------------------------------------- multimodal


def _media(spark):
    rows = [
        (0, "image", bytearray(b"abc"), "image/png", None, None, None),
        (1, "video", bytearray(b"xyz1234"), "video/mp4", None, None, 2500),
        (2, "audio", None, "audio/wav", None, None, None),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_contract(spark):
    out = multimodal.extract_features(_media(spark), feat_dim=4)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2}
    assert all(len(r["feature"]) == 4 for r in rows.values())
    assert rows[2]["n_bytes"] == 0 and rows[0]["n_bytes"] == 3
    assert out.schema["feature"].dataType.simpleString() == "array<double>"


def test_probe_dimensions_stub_is_deterministic(spark):
    out = multimodal.probe_dimensions(_media(spark))
    r0 = {r["media_id"]: (r["width"], r["height"]) for r in out.collect()}
    assert r0[0] == (64 + ord("a") % 64, 64 + ord("c") % 64)
    # non-image kinds keep their original metadata — the probe must not
    # clobber a video/audio row with payload-derived fake dimensions
    assert r0[1] == (None, None) and r0[2] == (None, None)


def test_sample_frames_cadence(spark):
    out = multimodal.sample_frames(_media(spark), every_ms=1000)
    ts = sorted(r["frame_ts_ms"] for r in out.collect())
    assert ts == [0, 1000, 2000]  # duration 2500 → frames at 0/1000/2000


# -------------------------------------------------------------------- dedup


def test_canonical_dedup_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "k string, v int"
    )
    out = {(r["k"], r["v"]) for r in dedup.canonical_dedup(df, ["k"], "v").collect()}
    assert out == {("a", 1), ("b", 9)}


def test_dedup_idempotent(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    once = dedup.exact_dedup(df, ["k"])
    twice = dedup.exact_dedup(once, ["k"])
    assert sorted(r["k"] for r in twice.collect()) == ["a", "b"]


def test_hashed_tid_matches_python_md5(spark):
    import hashlib

    rows = spark.createDataFrame([("alpha beta g",), ("x",), ("",)], "s string")
    got = {
        r["s"]: r["tid"]
        for r in rows.select("s", dedup.hashed_tid(F.col("s")).alias("tid")).collect()
    }
    for s, tid in got.items():
        want = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % dedup.MINHASH_PRIME
        assert tid == want, (s, tid, want)


def test_hashed_and_rank_vocab_pipelines_find_same_verified_pairs(spark, sf_smoke):
    """Pipeline equivalence of the two vocabulary paths: signatures differ
    (different tids) but the END result — LSH candidates that survive exact
    Jaccard verification — must agree on real near-dups. Exact Jaccard is
    vocab-independent, so any disagreement would be a candidate-recall
    artifact; on the test corpus both paths must surface the identical
    verified pair set."""
    from geomesa_cassandra_tools_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    sh = dedup.shingle_sets(docs).cache()

    def verified(vocab):
        sigs = dedup.minhash_signatures(sh, vocab, k=16)
        cands = dedup.lsh_candidate_pairs(sigs, bands=8, rows=2)
        pairs = dedup.jaccard_pairs(sh, candidates=cands).where(F.col("jaccard") >= 0.3)
        return {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}

    hashed = verified(None)
    ranked = verified(dedup.shingle_vocabulary(sh))
    sh.unpersist()
    assert hashed == ranked
    assert hashed, "expected at least one verified near-dup pair in the corpus"


def test_jaccard_max_df_drops_universal_shingle_from_pairing(spark):
    """A stop-shingle shared by every doc otherwise contributes C(n,2) pairs
    — `max_df` must keep the pairing linear in true near-dup candidates.
    Here docs 1/2 are real near-dups; docs 3/4/5 share ONLY the universal
    shingle, so with the cap they must produce no pair at all, and the
    surviving pair's jaccard becomes the documented lower bound (capped
    shingle excluded from the intersection, set sizes still exact)."""
    univ = "the same stop phrase"
    docs = spark.createDataFrame(
        [
            (1, f"{univ} alpha beta gamma delta"),
            (2, f"{univ} alpha beta gamma zeta"),
            (3, f"{univ} one two three four"),
            (4, f"{univ} cinq six sept huit"),
            (5, f"{univ} neun zehn elf zwolf"),
        ],
        "doc_id bigint, text string",
    )
    sh = dedup.shingle_sets(docs, n=4).cache()
    uncapped = dedup.jaccard_pairs(sh)
    assert uncapped.count() == 10  # every pair shares the universal 4-gram
    capped = dedup.jaccard_pairs(sh, max_df=2).collect()
    sh.unpersist()
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(1, 2)}
    (pair,) = capped
    # doc sizes stay exact (5 shingles each); intersection counts only the
    # uncapped shared shingles (3 of 4), so jaccard is the lower bound 3/7
    assert pair["union_sz"] == 7 and pair["inter"] == 3


def test_hashed_minhash_plan_has_no_global_sort(spark, sf_smoke):
    """The default dedup path must contain no unpartitioned window/sort:
    no Exchange SinglePartition anywhere in the physical plan."""
    from geomesa_cassandra_tools_spark.plans.inspect import explain_str
    from geomesa_cassandra_tools_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    sigs = dedup.minhash_signatures(dedup.shingle_sets(docs), k=16)
    plan = explain_str(sigs, "formatted")
    # (the doc_id-partitioned lead window from shingle_sets is fine; what
    # must never appear is a single-partition exchange — the global sort)
    assert "SinglePartition" not in plan, plan


def test_lsh_match_against_index_finds_delta_near_dup(spark):
    """Incremental dedup: a delta batch matched against a persisted corpus
    signature index finds the near-copy it contains, produces no candidate
    for an unrelated doc, and agrees with what the batch path would find."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "red orange yellow green blue indigo violet ultra"),
        ],
        "doc_id bigint, text string",
    )
    delta = spark.createDataFrame(
        [
            (101, "alpha beta gamma delta epsilon zeta eta iota"),  # near-copy of 1
            (102, "completely different words appear here only now"),
        ],
        "doc_id bigint, text string",
    )
    index_sigs = dedup.minhash_signatures(dedup.shingle_sets(corpus), k=16)
    new_sigs = dedup.minhash_signatures(dedup.shingle_sets(delta), k=16)
    got = {
        (r["new_doc"], r["index_doc"])
        for r in dedup.lsh_match_against_index(new_sigs, index_sigs, bands=8, rows=2).collect()
    }
    assert (101, 1) in got
    assert not any(nd == 102 for nd, _ in got)
    # equivalence with the batch path on the unioned corpus, restricted to
    # (delta, corpus) pairs
    both = dedup.minhash_signatures(dedup.shingle_sets(corpus.union(delta)), k=16)
    batch = {
        (max(r["doc_a"], r["doc_b"]), min(r["doc_a"], r["doc_b"]))
        for r in dedup.lsh_candidate_pairs(both, bands=8, rows=2).collect()
        if max(r["doc_a"], r["doc_b"]) > 100 and min(r["doc_a"], r["doc_b"]) <= 100
    }
    assert got == batch


# ------------------------------------------------- property-based (driver)

from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=200, deadline=None)
@given(
    lon1=hst.floats(-180, 179), lon2=hst.floats(-180, 179),
    lat1=hst.floats(-90, 89), lat2=hst.floats(-90, 89),
    res=hst.integers(3, 7), cap=hst.integers(4, 64),
)
def test_bbox_cover_is_complete_and_capped(lon1, lon2, lat1, lat2, res, cap):
    lon_min, lon_max = sorted((lon1, lon2))
    lat_min, lat_max = sorted((lat1, lat2))
    ranges = geo.bbox_cell_ranges(lon_min, lon_max, lat_min, lat_max, res=res, max_ranges=cap)
    assert len(ranges) <= cap
    assert all(lo <= hi for lo, hi in ranges)
    # every cell of the exact rectangle is covered (cover ⊇ bbox — the
    # invariant that makes cover-and-refine exact)
    x0 = geo._cell_index(lon_min, -180.0, 180.0, res)
    x1 = geo._cell_index(lon_max, -180.0, 180.0, res)
    y0 = geo._cell_index(lat_min, -90.0, 90.0, res)
    y1 = geo._cell_index(lat_max, -90.0, 90.0, res)
    for x in (x0, x1):
        for y in (y0, y1):
            z = geo._interleave_int(x, y, res)
            assert any(lo <= z <= hi for lo, hi in ranges)


@settings(max_examples=100, deadline=None)
@given(
    lon1=hst.floats(-180, 179), lon2=hst.floats(-180, 179),
    lat1=hst.floats(-90, 89), lat2=hst.floats(-90, 89),
    t1=hst.integers(0, 2_000_000), t2=hst.integers(0, 2_000_000),
    res=hst.integers(2, 5), cap=hst.integers(4, 64),
)
def test_z3_cover_is_complete_and_capped(lon1, lon2, lat1, lat2, t1, t2, res, cap):
    lon_min, lon_max = sorted((lon1, lon2))
    lat_min, lat_max = sorted((lat1, lat2))
    t_min, t_max = sorted((t1, t2))
    t_lo, t_hi = 0, 2_678_400  # one 31-day period
    ranges = geo.spacetime_cell_ranges(
        lon_min, lon_max, lat_min, lat_max, t_min, t_max, t_lo, t_hi,
        res=res, max_ranges=cap,
    )
    assert len(ranges) <= cap
    assert all(lo <= hi for lo, hi in ranges)
    # corner cells of the exact query box are covered (cover ⊇ box)
    x0 = geo._cell_index(lon_min, -180.0, 180.0, res)
    x1 = geo._cell_index(lon_max, -180.0, 180.0, res)
    y0 = geo._cell_index(lat_min, -90.0, 90.0, res)
    y1 = geo._cell_index(lat_max, -90.0, 90.0, res)
    tc0 = geo._cell_index(float(t_min), float(t_lo), float(t_hi), res)
    tc1 = geo._cell_index(float(t_max), float(t_lo), float(t_hi), res)
    for x in (x0, x1):
        for y in (y0, y1):
            for tc in (tc0, tc1):
                z = geo._interleave_int3(x, y, tc, res)
                assert any(lo <= z <= hi for lo, hi in ranges)


@settings(max_examples=200, deadline=None)
@given(
    lon=hst.floats(-180, 180, allow_nan=False),
    lat=hst.floats(-90, 90, allow_nan=False),
    t=hst.integers(0, 1_000_000),
    res=hst.integers(1, 20),
)
def test_z3_bit_interleave_roundtrip(lon, lat, t, res):
    x = geo._cell_index(lon, -180.0, 180.0, res)
    y = geo._cell_index(lat, -90.0, 90.0, res)
    tc = geo._cell_index(float(t), 0.0, 1_000_000.0, res)
    z = geo._interleave_int3(x, y, tc, res)
    xr = sum(((z >> (3 * i)) & 1) << i for i in range(res))
    yr = sum(((z >> (3 * i + 1)) & 1) << i for i in range(res))
    tr = sum(((z >> (3 * i + 2)) & 1) << i for i in range(res))
    assert (xr, yr, tr) == (x, y, tc)
    assert 0 <= z < 1 << (3 * res)


def test_z3_column_matches_driver_side_interleave(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "lon": [-179.9, 0.0, 12.5, 179.0],
            "lat": [-89.9, 0.0, 45.0, 89.0],
            "epoch": [0, 1_000_000, 1_500_000, 2_600_000],
        }
    )
    df = spark.createDataFrame(rows)
    t_lo, t_hi, res = 0, 2_678_400, 5
    got = (
        df.withColumn(
            "z3", geo.z3(F.col("lon"), F.col("lat"), F.col("epoch"), t_lo, t_hi, res)
        )
        .orderBy("epoch")
        .collect()
    )
    for r in got:
        expect = geo._interleave_int3(
            geo._cell_index(r["lon"], -180.0, 180.0, res),
            geo._cell_index(r["lat"], -90.0, 90.0, res),
            geo._cell_index(float(r["epoch"]), float(t_lo), float(t_hi), res),
            res,
        )
        assert r["z3"] == expect


@settings(max_examples=200, deadline=None)
@given(
    lon=hst.floats(-180, 180, allow_nan=False),
    lat=hst.floats(-90, 90, allow_nan=False),
    res=hst.integers(1, 16),
)
def test_z2_bit_interleave_roundtrip(lon, lat, res):
    x = geo._cell_index(lon, -180.0, 180.0, res)
    y = geo._cell_index(lat, -90.0, 90.0, res)
    z = geo._interleave_int(x, y, res)
    # de-interleave recovers the cell indices exactly
    xr = sum(((z >> (2 * i)) & 1) << i for i in range(res))
    yr = sum(((z >> (2 * i + 1)) & 1) << i for i in range(res))
    assert (xr, yr) == (x, y)
    assert 0 <= z < 1 << (2 * res)


# ------------------------------------------------------------- similarity


def test_blas_topk_equals_brute_force(spark):
    """blas_cosine_topk's candidates→exact-rerank must be bit-identical to
    the brute-force cosine_topk (the rerank recomputes cos with the same
    sequential JVM fold; BLAS only proposes candidates)."""
    from geomesa_cassandra_tools_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 16)
    brute = similarity.cosine_topk(q, emb, k=5).collect()
    blas = similarity.blas_cosine_topk(q, emb, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    b = {key(r): (r["cand_id"], r["cos"]) for r in brute}
    s = {key(r): (r["cand_id"], r["cos"]) for r in blas}
    assert b == s


def test_cosine_pairs_block_pruning_drops_far_blocks(spark):
    """The block-pair bound must prune: two tight antipodal clusters can
    never produce a cross-cluster pair above a positive threshold, so the
    verify stage must see no cross-cluster (mixed-parity id) pair — while
    within-cluster pairs (cos ~ 1) are all found."""
    import random

    from geomesa_cassandra_tools_spark.operators import similarity

    rnd = random.Random(7)
    base = [rnd.uniform(-1, 1) for _ in range(8)]
    rows = []
    for i in range(40):
        sign = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, [sign * (x + rnd.uniform(-0.01, 0.01)) for x in base]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = similarity.cosine_pairs_above(df, 0.5, n_blocks=4).collect()
    assert out, "expected within-cluster pairs"
    for r in out:
        assert r["vec_a"] % 2 == r["vec_b"] % 2, r
    # every same-parity pair qualifies: 2 * C(20,2) = 380
    assert len(out) == 380, len(out)


def test_bigram_array_short_docs_yield_empty(spark):
    """<2-token docs must produce an EMPTY bigram array — the naive
    sequence(1, size-1) DESCENDS to [1, 0] for one-token docs and
    element_at(tk, 0) is an invalid-index error under ANSI mode."""
    from geomesa_cassandra_tools_spark.functions.text import bigram_array

    df = spark.createDataFrame(
        [("alpha beta gamma",), ("single",), ("",)], "text string"
    )
    got = [r["b"] for r in df.select(bigram_array(F.col("text")).alias("b")).collect()]
    assert got == [["alpha beta", "beta gamma"], [], []]
    # struct payloads go through the same guard
    payload = lambda tk, i: F.struct(  # noqa: E731
        F.element_at(tk, i).alias("ctx"),
        F.element_at(tk, i + 1).alias("nxt"),
    )
    got2 = [
        r["b"] for r in df.select(bigram_array(F.col("text"), payload).alias("b")).collect()
    ]
    assert [len(x) for x in got2] == [2, 0, 0]


def test_parse_byte_conf_handles_unit_suffixes():
    """Spark byte confs come as '134217728', '134217728b', '128m', '1g'…
    — digit-stripping would read '128m' as 128 BYTES and silently break
    every threshold derived from it."""
    from geomesa_cassandra_tools_spark.operators.relational import _parse_byte_conf

    assert _parse_byte_conf("134217728") == 134217728
    assert _parse_byte_conf("134217728b") == 134217728
    assert _parse_byte_conf("128m") == 128 * 1024 * 1024
    assert _parse_byte_conf("128MB") == 128 * 1024 * 1024
    assert _parse_byte_conf("1g") == 1 << 30
    assert _parse_byte_conf("512k") == 512 * 1024
    assert _parse_byte_conf("junk") == 128 * 1024 * 1024


def test_snapshot_diff_classifies_all_change_types(spark):
    """added/removed/changed/unchanged, with NULL-safe comparisons:
    NULL→value and value→NULL are 'changed', NULL→NULL is 'unchanged'."""
    from geomesa_cassandra_tools_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, None), (3, 30.0, "C"), (4, None, "D")],
        "k int, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, None), (3, 31.0, "C"), (4, 40.0, "D"), (5, 50.0, "E")],
        "k int, price double, status string",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["price", "status"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "unchanged",  # NULL == NULL under null-safe equality
        3: "changed",
        4: "changed",    # NULL -> value is a change
        5: "added",
    }
    got_rm = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(new, old, ["k"], ["price", "status"]).collect()
    }
    assert got_rm[5] == "removed"


def test_dwithin_join_equals_brute_force(spark):
    """Cell-cover recall: the grid dwithin join must return EXACTLY the
    brute-force haversine pairs, including pairs straddling cell borders —
    random clustered points + a radius chosen so many pairs sit near cell
    boundaries."""
    import random

    rnd = random.Random(11)
    lrows = [
        (i, rnd.uniform(-30, 30) + rnd.choice([0.0, 120.0]), rnd.uniform(-59, 59))
        for i in range(120)
    ]
    rrows = [
        (i, rnd.uniform(-30, 30) + rnd.choice([0.0, 120.0]), rnd.uniform(-65, 65))
        for i in range(120)
    ]
    # antimeridian coverage: pairs straddling lon ±180 must be found (the
    # lon cells wrap mod N); 179.9W vs 179.9E at the same lat is ~22 km
    lrows += [(1000 + i, 179.9, 10.0 * i) for i in range(4)]
    rrows += [(1000 + i, -179.9, 10.0 * i + 0.05) for i in range(4)]
    # band-edge bound tightness: at lat 60 the max qualifying lon gap for
    # R=400 km exceeds what an equatorial-constant cell width would cover —
    # pairs right at the spherical bound must still be found
    lrows += [(2000 + i, 0.37 * i, 59.99) for i in range(30)]
    rrows += [(2000 + i, 0.37 * i + 7.18, 59.99) for i in range(30)]
    left = spark.createDataFrame(lrows, "l_id bigint, lon double, lat double")
    right = spark.createDataFrame(rrows, "r_id bigint, lon double, lat double")
    got = {
        (r["l_id"], r["r_id"])
        for r in geo.dwithin_join(left, right, 400.0, "l_id", "r_id").collect()
    }
    brute = {
        (r["l_id"], r["r_id"])
        for r in left.select("l_id", F.col("lon").alias("qlon"), F.col("lat").alias("qlat"))
        .where(F.abs(F.col("qlat")) <= 60)
        .crossJoin(right.where(F.abs(F.col("lat")) <= 60))
        .where(geo.st_dwithin_km(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat"), 400.0))
        .collect()
    }
    assert got == brute
    assert got, "expected at least one qualifying pair"


def test_cosine_pairs_zero_norm_and_empty_corpus(spark):
    """Zero-norm vectors have no cosine: they must be excluded before the
    centroid assignment (left in, their NaN unit-dots poison cid/rad and
    every threshold compare); an empty/all-zero corpus short-circuits to
    an empty result with the contract schema."""
    from geomesa_cassandra_tools_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),
        (2, [0.0, 0.0, 0.0]),  # zero vector — excluded, never NaN
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = similarity.cosine_pairs_above(df, 0.9, n_blocks=2).collect()
    assert [(r["vec_a"], r["vec_b"]) for r in out] == [(0, 1)]
    assert all(r["cos"] == r["cos"] for r in out)  # no NaNs

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    res = similarity.cosine_pairs_above(empty, 0.5, n_blocks=2)
    assert res.columns == ["vec_a", "vec_b", "cos"]
    assert res.count() == 0

    all_zero = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    assert similarity.cosine_pairs_above(all_zero, 0.5, n_blocks=2).count() == 0


# --------------------------------------------------------------- skew salting

def test_salted_join_equals_plain_join(spark):
    from geomesa_cassandra_tools_spark.operators.relational import salted_join

    # one hot key (90% of rows) + a long tail
    left = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], "k long, v long"
    )
    right = spark.createDataFrame([(i, f"d{i}") for i in range(100)], "k long, name string")
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, on=["k"], salt=4).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    from geomesa_cassandra_tools_spark.operators.relational import salted_join

    left = spark.createDataFrame([(1, 10), (99, 20)], "k long, v long")
    right = spark.createDataFrame([(1, "a")], "k long, name string")
    out = salted_join(left, right, on=["k"], how="left", salt=3).collect()
    got = {(r["k"], r["v"], r["name"]) for r in out}
    assert got == {(1, 10, "a"), (99, 20, None)}


# ------------------------------------------------------------- file sources

def test_read_text_lines_feeds_parsers(spark, tmp_path):
    from geomesa_cassandra_tools_spark.sources import files

    p = tmp_path / "compactions.txt"
    p.write_text(NODETOOL_COMPACTIONS)
    lines = files.read_text_lines(spark, str(p))
    out = parsing.parse_compactions(lines)
    assert out.count() == 3


def test_read_csv_permissive_captures_corrupt_rows(spark, tmp_path):
    from geomesa_cassandra_tools_spark.sources import files

    p = tmp_path / "data.csv"
    p.write_text("k,v\n1,alpha\nnot_an_int,beta\n3,gamma\n")
    df = files.read_csv(
        spark, str(p), "k int, v string, _bad string", permissive_column="_bad"
    )
    rows = df.collect()
    good = [(r["k"], r["v"]) for r in rows if r["_bad"] is None]
    bad = [r["_bad"] for r in rows if r["_bad"] is not None]
    assert sorted(good) == [(1, "alpha"), (3, "gamma")]
    assert bad == ["not_an_int,beta"]


def test_read_json_records_schema_declared(spark, tmp_path):
    from geomesa_cassandra_tools_spark.sources import files

    p = tmp_path / "recs.jsonl"
    p.write_text('{"name": "n1", "port": 22}\n{"name": "n2", "port": 2222}\n')
    df = files.read_json_records(spark, str(p), "name string, port int")
    assert {(r["name"], r["port"]) for r in df.collect()} == {("n1", 22), ("n2", 2222)}


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC source: write/read round trip preserves schema + values, and
    the vectorized ORC scan takes filter pushdown like parquet (the
    format-agnostic contract sources/files.py promises)."""
    from geomesa_cassandra_tools_spark.sources import files

    path = str(tmp_path / "orc_tbl")
    src = spark.range(100).selectExpr(
        "id", "id % 7 AS grp", "CAST(id AS STRING) AS label"
    )
    files.write_orc(src, path)
    back = files.read_orc(spark, path)
    # nullability is not round-tripped (ORC footers carry no not-null bit)
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in src.schema
    ]
    assert back.count() == 100
    filtered = back.where(F.col("grp") == 3)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "grp" in plan
    assert filtered.count() == 14  # ids 3,10,...,94


# ------------------------------------------------------- WKT ring parsing


def test_parse_wkt_ring_polygon_and_linestring(spark):
    df = spark.createDataFrame(
        [
            ("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))",),
            ("LINESTRING (1 1, 2 2)",),
            ("not wkt at all",),
        ],
        ["wkt"],
    )
    rings = [r.ring for r in df.select(geo.parse_wkt_ring(F.col("wkt")).alias("ring")).collect()]
    assert [(p.lon, p.lat) for p in rings[0]] == [(0, 0), (4, 0), (4, 3), (0, 3), (0, 0)]
    assert [(p.lon, p.lat) for p in rings[1]] == [(1, 1), (2, 2)]
    assert rings[2] == []  # malformed → empty array, schema-on-read contract


def test_ring_area_shoelace(spark):
    # 4x3 rectangle = 12; concave L-shape = 3; negative-coordinate triangle = 12.5
    df = spark.createDataFrame(
        [
            ("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))", 12.0),
            ("POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))", 3.0),
            ("POLYGON ((-5 0, 0 0, 0 5, -5 0))", 12.5),
        ],
        ["wkt", "expected"],
    )
    out = df.select(
        geo.ring_area(geo.parse_wkt_ring(F.col("wkt"))).alias("area"), "expected"
    ).collect()
    for r in out:
        assert r.area == r.expected


def test_ring_bbox_envelope(spark):
    df = spark.createDataFrame([("POLYGON ((-5 0, 0 0, 0 5, -5 0))",)], ["wkt"])
    b = df.select(geo.ring_bbox(geo.parse_wkt_ring(F.col("wkt"))).alias("b")).first().b
    assert (b.min_lon, b.min_lat, b.max_lon, b.max_lat) == (-5.0, 0.0, 0.0, 5.0)


# ------------------------------------------------------------- UDTF surface


def test_python_udtf_expands_rows(spark):
    """Python UDTF (Spark 4) — the table-function corner of the UDF
    surface (SURVEY.md §2.2; scalar pandas / grouped-agg / grouped-map /
    mapInPandas are exercised by q28-q31/q48/q50). UDTFs run row-at-a-time
    in Python, so they stay OUT of the registered query surface — the
    engine's hot paths are JVM expressions; this pins the escape hatch's
    contract only."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield tok, i

    rows = Tokenize(lit("scan filter agg")).collect()
    assert [(r["tok"], r["pos"]) for r in rows] == [
        ("scan", 0), ("filter", 1), ("agg", 2),
    ]


def test_map_in_arrow_batches(spark):
    """mapInArrow — the zero-copy sibling of mapInPandas: the UDF sees raw
    Arrow RecordBatches (no pandas conversion), the right surface when the
    Python side is itself Arrow-native (tokenizers, Lance/Vortex readers,
    DataFusion). Pins batch-shape semantics: schema maps 1:1 and row order
    within a partition is preserved."""
    import pyarrow as pa

    def double_vals(batches):
        for batch in batches:
            arr = batch.column(0)
            yield pa.RecordBatch.from_arrays(
                [pa.compute.multiply(arr, 2)], names=["doubled"]
            )

    df = spark.range(1000).repartition(4)
    out = df.mapInArrow(double_vals, "doubled bigint")
    assert sorted(r.doubled for r in out.collect()) == sorted(
        2 * i for i in range(1000)
    )


# ------------------------------------------------------- sketch tolerance


def test_hll_sketch_rollup_estimate_tolerance(spark):
    """q95 carries its tolerance check IN-PLAN since round 5 (approx_ok:
    merged union-of-daily-sketches estimate within 5% of exact; lgk=12
    keeps relative error ~1.6%). Pin that every group passes and that the
    exact side equals an independent countDistinct."""
    from geomesa_cassandra_tools_spark.queries import QUERIES
    from geomesa_cassandra_tools_spark.sources.tables import load_tables
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["q95_hll_sketch_rollup"](spark, sf).collect()
    assert rows and all(r["approx_ok"] for r in rows)
    got = {r["event_type"]: r["exact_users"] for r in rows}
    exact = {
        r["event_type"]: r["n"]
        for r in load_tables(spark, sf)["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


# ------------------------------------------------------ empty-input edges


def test_dedup_operators_on_empty_input(spark):
    """Empty partitions are routine at 100 TB (a filter can zero out a
    whole date range) — dedup/minhash/cc must degrade to empty results,
    not throw."""
    from pyspark.sql import functions as F

    empty_docs = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sh = dedup.shingle_sets(empty_docs)
    assert sh.count() == 0
    assert dedup.exact_dedup(empty_docs, ["text"]).count() == 0
    empty_pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert dedup.connected_components(empty_pairs).count() == 0


def test_connected_components_rejects_zero_iterations(spark):
    """max_iter=0 can never converge; it must fail loudly up front, not
    return unconverged labels or trip an unbound-variable error."""
    import pytest

    pairs = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    with pytest.raises(ValueError, match="max_iter"):
        dedup.connected_components(pairs, max_iter=0)


def test_geo_filters_on_empty_input(spark):
    empty = spark.createDataFrame([], "lon double, lat double")
    out = geo.bbox_filter(
        empty, "lon", "lat", lon_min=0.0, lon_max=1.0, lat_min=0.0, lat_max=1.0
    )
    assert out.count() == 0


def test_joins_asof_on_empty_sides(spark):
    from geomesa_cassandra_tools_spark.operators import joins

    left = spark.createDataFrame([], "k bigint, ts bigint, pid string")
    right = spark.createDataFrame([(1, 100, "v1")], "k bigint, ts bigint, vid string")
    out = joins.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["vid"]
    )
    assert out.count() == 0


# --------------------------------------------- token-ring connector (DSv2)


def _ring_fixture(tmp_path, n=40):
    p = tmp_path / "ring.jsonl"
    with open(p, "w") as fh:
        for i in range(n):
            fh.write(json.dumps({"pk": f"k{i}", "col": f"c{i % 3}", "val": i}) + "\n")
    return str(p)


def test_tokenring_source_full_scan_partitions(spark, tmp_path):
    """Full-table read through the Python Data Source: every row comes
    back exactly once, split across one task per token range."""
    from geomesa_cassandra_tools_spark.sources import ring

    path = _ring_fixture(tmp_path)
    df = ring.read_ring(spark, path, ranges=4)
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 40
    assert {r["pk"] for r in rows} == {f"k{i}" for i in range(40)}
    # ranges partition the ring: no row appears in two partitions
    sizes = df.rdd.glom().map(len).collect()
    assert sum(sizes) == 40


def test_tokenring_pushdown_prunes_to_owning_range(spark, tmp_path):
    """EqualTo(pk) reaches the connector and prunes the scan to the one
    token range owning that key — observable both in the result and in
    the planned partition count (reader-level contract)."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType
    from geomesa_cassandra_tools_spark.sources import ring

    path = _ring_fixture(tmp_path)
    df = ring.read_ring(spark, path, ranges=8).where(F.col("pk") == "k7")
    got = df.collect()
    assert len(got) == 1 and got[0]["val"] == 7
    # fresh relation per query (read_ring contract): a full scan after the
    # filtered one must see every row again
    assert ring.read_ring(spark, path, ranges=8).count() == 40

    schema = StructType.fromDDL("pk string, col string, val bigint")
    rdr = ring.TokenRingReader(schema, {"path": path, "ranges": "8"})
    leftover = list(rdr.pushFilters([EqualTo(("pk",), "k7")]))
    assert leftover == []
    parts = rdr.partitions()
    assert len(parts) == 1
    assert parts[0].lo <= ring.token_of("k7") < parts[0].hi


def test_tokenring_in_pushdown_prunes_to_owning_ranges(spark, tmp_path):
    """In(pk, vs) — the multi-get path — reaches the connector and prunes
    the scan to the union of the claimed keys' owning ranges; an In
    intersected with a disjoint EqualTo is unsatisfiable (degenerate
    partition, zero rows)."""
    from pyspark.sql.datasource import EqualTo, In
    from pyspark.sql.types import StructType
    from geomesa_cassandra_tools_spark.sources import ring

    path = _ring_fixture(tmp_path)
    # end-to-end: isin through the planner
    df = ring.read_ring(spark, path, ranges=8).where(F.col("pk").isin("k3", "k17"))
    assert sorted(r["val"] for r in df.collect()) == [3, 17]

    schema = StructType.fromDDL("pk string, col string, val bigint")
    rdr = ring.TokenRingReader(schema, {"path": path, "ranges": "8"})
    leftover = list(rdr.pushFilters([In(("pk",), ("k3", "k17"))]))
    assert leftover == []
    parts = rdr.partitions()
    width = ring.RING_SIZE // 8
    owning = {min(ring.token_of(k) // width, 7) for k in ("k3", "k17")}
    assert len(parts) == len(owning)
    for k in ("k3", "k17"):
        tok = ring.token_of(k)
        assert any(p.lo <= tok < p.hi for p in parts), k
    # In ∧ disjoint EqualTo → empty intersection → degenerate scan
    rdr2 = ring.TokenRingReader(schema, {"path": path, "ranges": "8"})
    list(rdr2.pushFilters([In(("pk",), ("k3", "k17")), EqualTo(("pk",), "k9")]))
    parts2 = list(rdr2.partitions())
    assert len(parts2) == 1 and parts2[0].lo == parts2[0].hi
    assert list(rdr2.read(parts2[0])) == []
    # In ∧ overlapping EqualTo narrows to the single shared key
    rdr3 = ring.TokenRingReader(schema, {"path": path, "ranges": "8"})
    list(rdr3.pushFilters([In(("pk",), ("k3", "k17")), EqualTo(("pk",), "k3")]))
    got = [r for p in rdr3.partitions() for r in rdr3.read(p)]
    assert [r[0] for r in got] == ["k3"]


def test_tokenring_token_range_pushdown_subsets_partitions(spark, tmp_path):
    """Range predicates on the connector-computed token column — the
    Cassandra full-ring-walk idiom (WHERE token(pk) > ? AND token(pk) <= ?)
    — subset the planned partitions to the ranges intersecting the claimed
    interval, and the scan result equals the post-hoc filter."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan
    from pyspark.sql.types import StructType
    from geomesa_cassandra_tools_spark.sources import ring

    path = _ring_fixture(tmp_path)
    ddl = "pk string, col string, val bigint, token bigint"
    width = ring.RING_SIZE // 8
    t_lo, t_hi = 2 * width, 5 * width  # spans ranges 2, 3, 4 of 8

    # reader-level contract: planned partitions are exactly the 3
    # intersecting ranges, and both claims are consumed
    rdr = ring.TokenRingReader(
        StructType.fromDDL(ddl), {"path": path, "ranges": "8"}
    )
    leftover = list(
        rdr.pushFilters(
            [GreaterThanOrEqual(("token",), t_lo), LessThan(("token",), t_hi)]
        )
    )
    assert leftover == []
    parts = rdr.partitions()
    assert [(p.lo, p.hi) for p in parts] == [
        (2 * width, 3 * width), (3 * width, 4 * width), (4 * width, 5 * width)
    ]
    rows = [r for p in parts for r in rdr.read(p)]
    expect = {f"k{i}" for i in range(40) if t_lo <= ring.token_of(f"k{i}") < t_hi}
    assert {r[0] for r in rows} == expect and expect
    # every emitted token is connector-computed and in-interval
    assert all(t_lo <= r[3] < t_hi and r[3] == ring.token_of(r[0]) for r in rows)

    # end-to-end through the planner, against the full-scan oracle
    def load():
        ring.register(spark)
        return (
            spark.read.format("tokenring")
            .option("path", path).option("ranges", "8").option("ddl", ddl)
            .load()
        )

    got = load().where((F.col("token") >= t_lo) & (F.col("token") < t_hi))
    assert {r["pk"] for r in got.collect()} == expect
    # an empty claimed interval plans the degenerate scan and returns 0 rows
    assert load().where((F.col("token") >= t_hi) & (F.col("token") < t_lo)).count() == 0


def test_tokenring_conjunctive_equalto_is_and_not_or(spark, tmp_path):
    """Claimed filters are a CONJUNCTION per the DataSource contract (Spark
    never re-checks them post-scan): two distinct pushed EqualTo(pk) values
    are unsatisfiable together → zero partitions, zero rows — NOT the union
    of both keys' rows."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType
    from geomesa_cassandra_tools_spark.sources import ring

    path = _ring_fixture(tmp_path)
    schema = StructType.fromDDL("pk string, col string, val bigint")
    rdr = ring.TokenRingReader(schema, {"path": path, "ranges": "8"})
    leftover = list(rdr.pushFilters([EqualTo(("pk",), "k7"), EqualTo(("pk",), "k9")]))
    assert leftover == []  # both claimed — and applied as an AND
    # one degenerate empty-range partition (NOT an empty list — pyspark
    # plans [None] for empty partition lists and read(None) would crash),
    # and executing the scan yields zero rows
    parts2 = list(rdr.partitions())
    assert len(parts2) == 1 and parts2[0].lo == parts2[0].hi
    assert list(rdr.read(parts2[0])) == []
    # duplicate pushes of the SAME value stay satisfiable: one owning range
    rdr2 = ring.TokenRingReader(schema, {"path": path, "ranges": "8"})
    list(rdr2.pushFilters([EqualTo(("pk",), "k7"), EqualTo(("pk",), "k7")]))
    parts = rdr2.partitions()
    assert len(parts) == 1
    assert [r[0] for p in parts for r in rdr2.read(p)] == ["k7"]
    # end-to-end: the planner accepts an empty partition list
    df = ring.read_ring(spark, path, ranges=8).where(
        (F.col("pk") == "k7") & (F.col("pk") == "k9")
    )
    assert df.count() == 0


# ------------------------------------------------------------------ sketches


def test_cms_estimate_upper_bounds_every_exact_count(spark):
    """Count-min's one-sided contract: est >= exact for EVERY item, and
    with width far above cardinality (no collisions) est == exact."""
    from geomesa_cassandra_tools_spark.operators import sketches

    rows = [(f"tok{i % 7}",) for i in range(100)] + [("rare",)]
    items = spark.createDataFrame(rows, "token string")
    exact = {r["token"]: r["n"] for r in items.groupBy("token").agg(
        F.count("*").alias("n")).collect()}

    # tight width -> collisions possible, bound must still hold
    cms = sketches.count_min_table(items, "token", depth=4, width=4)
    est = sketches.cms_estimate(items.distinct(), cms, "token", depth=4, width=4)
    for r in est.collect():
        assert r["cms_est"] >= exact[r["token"]]

    # wide sketch -> 8 distinct tokens cannot collide in all 4 rows
    cms_w = sketches.count_min_table(items, "token", depth=4, width=4096)
    est_w = sketches.cms_estimate(items.distinct(), cms_w, "token", depth=4, width=4096)
    assert {r["token"]: r["cms_est"] for r in est_w.collect()} == exact


def test_cms_tables_merge_cellwise(spark):
    """Mergeability — the property that makes the sketch a rollup/stream
    citizen: sketch(A ∪ B) == cellwise-sum(sketch(A), sketch(B))."""
    from geomesa_cassandra_tools_spark.operators import sketches

    a = spark.createDataFrame([(f"t{i % 5}",) for i in range(40)], "token string")
    b = spark.createDataFrame([(f"t{i % 9}",) for i in range(33)], "token string")
    whole = sketches.count_min_table(a.unionAll(b), "token", depth=4, width=64)
    merged = (
        sketches.count_min_table(a, "token", depth=4, width=64)
        .unionAll(sketches.count_min_table(b, "token", depth=4, width=64))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r["j"], r["bucket"]): r["cnt"] for r in merged.collect()}
    want = {(r["j"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert got == want


# ----------------------------------------------- review-fix regressions (r4)


def test_ring_ops_tolerate_malformed_wkt(spark):
    """parse_wkt_ring's malformed-input contract (empty array) must flow
    through area/containment as zero/false — not a Spark ANSI slice crash."""
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",), ("not wkt at all",)],
        "wkt string",
    )
    ring = geo.parse_wkt_ring(F.col("wkt"))
    out = df.select(
        geo.ring_area(ring).alias("area"),
        geo.ring_contains_point(ring, F.lit(5.0), F.lit(5.0)).alias("inside"),
    ).collect()
    assert out[0]["area"] == 100.0 and out[0]["inside"] is True
    assert out[1]["area"] == 0.0 and out[1]["inside"] is False


def test_parse_wkt_ring_ignores_polygon_holes(spark):
    """Only the OUTER ring parses: interior-ring coordinates leaking in
    would silently corrupt area and ray-cast containment."""
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",)],
        "wkt string",
    )
    ring = geo.parse_wkt_ring(F.col("wkt"))
    row = df.select(
        F.size(ring).alias("n"), geo.ring_area(ring).alias("area")
    ).collect()[0]
    assert row["n"] == 5 and row["area"] == 100.0


def test_cosine_topk_survives_zero_norm_vectors(spark):
    """A single zero embedding must not abort the job under Spark 4 ANSI
    division — it scores NULL and drops to the bottom of every ranking."""
    from geomesa_cassandra_tools_spark.operators import similarity

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0]), (4, [0.5, 0.5])]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    queries = corpus.where(F.col("vec_id") == 1)
    got = similarity.cosine_topk(queries, corpus, k=2).collect()
    ids = [r["cand_id"] for r in got]
    assert 3 not in ids and len(ids) == 2

    blas = similarity.blas_cosine_topk(queries, corpus, k=2)
    assert [r["cand_id"] for r in blas.collect()] == ids


def test_cms_estimate_returns_zero_for_unseen_items(spark):
    """The sparse counter table must not drop (or inflate) candidates whose
    cells are empty: a never-seen item estimates exactly 0."""
    from geomesa_cassandra_tools_spark.operators import sketches

    items = spark.createDataFrame([("a",), ("a",), ("b",)], "token string")
    cms = sketches.count_min_table(items, "token", depth=4, width=4096)
    cand = spark.createDataFrame([("a",), ("never_seen",)], "token string")
    got = {r["token"]: r["cms_est"] for r in
           sketches.cms_estimate(cand, cms, "token", depth=4, width=4096).collect()}
    assert got == {"a": 2, "never_seen": 0}


def test_banded_signatures_rejects_kb_mismatch(spark):
    from geomesa_cassandra_tools_spark.operators import dedup as dd

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    sigs = dd.minhash_signatures(dd.shingle_sets(docs), k=4)
    with pytest.raises(ValueError, match="bands\\*rows"):
        dd.banded_signatures(sigs, bands=4, rows=2)


def test_cms_weighted_build_equals_per_occurrence(spark):
    """(item, count)-weighted build must produce the identical counter
    table to hashing every occurrence — the telescoping-sum contract that
    lets pipelines feed an aggregate they already computed."""
    from geomesa_cassandra_tools_spark.operators import sketches

    items = spark.createDataFrame(
        [(f"t{i % 6}",) for i in range(50)], "token string"
    )
    per_occ = sketches.count_min_table(items, "token", depth=4, width=64)
    agg = items.groupBy("token").agg(F.count("*").alias("n"))
    weighted = sketches.count_min_table(
        agg, "token", depth=4, width=64, weight_col="n"
    )
    a = {(r["j"], r["bucket"]): r["cnt"] for r in per_occ.collect()}
    b = {(r["j"], r["bucket"]): r["cnt"] for r in weighted.collect()}
    assert a == b


def test_vacuum_never_deletes_newer_manifests(spark, tmp_path):
    """TOCTOU guard: a manifest committed concurrently AFTER vacuum reads
    its version snapshot is a live transaction and must survive."""
    import json as _json
    from geomesa_cassandra_tools_spark.operators import transactional as tx

    path = str(tmp_path / "t")
    tx.init_table(spark.range(5).toDF("id"), path)          # v0
    tx.append_batch(spark.range(5, 8).toDF("id"), path)     # v1
    # simulate a concurrent writer publishing v2 between vacuum's
    # version read and its manifest sweep
    man1 = _json.load(open(f"{path}/_manifest/v1.json"))
    man1["version"] = 2
    with open(f"{path}/_manifest/v2.json", "w") as fh:
        _json.dump(man1, fh)
    import os as _os

    # keep_versions=1 retains only the newest version's window; the sweep
    # must still treat v2 (newest) as live and only remove STRICTLY older
    tx.vacuum(path, keep_versions=1, grace_seconds=0)
    assert _os.path.exists(f"{path}/_manifest/v2.json")
    assert not _os.path.exists(f"{path}/_manifest/v0.json")


def test_noop_delete_and_truncate_burn_no_version(spark, tmp_path):
    from geomesa_cassandra_tools_spark.operators import transactional as tx

    path = str(tmp_path / "t")
    v0 = tx.init_table(spark.range(3).toDF("id"), path)
    stats = tx.delete_where(spark, path, F.col("id") > 100)
    assert stats["version"] == v0 and stats["files_rewritten"] == 0
    assert tx.current_version(path) == v0
    v1 = tx.truncate_table(path)
    assert v1 == v0 + 1
    assert tx.truncate_table(path) == v1  # already empty: no new version
    # empty append is a no-op too
    assert tx.append_batch(spark.range(0).toDF("id"), path) is None
    assert tx.current_version(path) == v1


def test_publish_layout_dir_racing_publishers(tmp_path):
    """Two publishers recovering from a torn leftover must never delete
    each other's just-published layout (the TOCTOU the lockfile closes):
    after both return, the path holds a complete, _SUCCESS-marked copy."""
    import os
    import threading

    from geomesa_cassandra_tools_spark.queries import _publish_layout_dir

    path = str(tmp_path / "layout")
    # a torn leftover from a crashed publish: files but no _SUCCESS
    os.makedirs(path)
    open(os.path.join(path, "part-0.parquet"), "w").write("torn")

    def stage(tag: str) -> str:
        s = str(tmp_path / f"staging-{tag}")
        os.makedirs(s)
        open(os.path.join(s, "part-0.parquet"), "w").write("data")
        open(os.path.join(s, "_SUCCESS"), "w").close()
        return s

    errs: list[BaseException] = []

    def publish(tag: str):
        try:
            _publish_layout_dir(stage(tag), path)
        except BaseException as e:
            errs.append(e)

    threads = [threading.Thread(target=publish, args=(f"t{i}",)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs, errs
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert open(os.path.join(path, "part-0.parquet")).read() == "data"
    assert not os.path.exists(path + ".lock")
    # no staging leftovers
    assert not [d for d in os.listdir(tmp_path) if d.startswith("staging-")]


def test_shard_plan_invariant_under_input_layout(spark, tmp_path):
    """q138's shard/position assignment is a pure function of doc_id — the
    checksum must not change when the input arrives in a different
    partition layout (a shuffled corpus re-shard must be reproducible)."""
    import os

    import pyspark.sql.functions as F

    from geomesa_cassandra_tools_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    base = QUERIES["q138_shard_shuffle_plan"](spark, sf)
    rows_a = {r["shard"]: r.asDict() for r in base.collect()}

    # same documents, scrambled into 7 partitions in descending id order;
    # other tables symlinked (load_tables plans every table eagerly)
    alt = str(tmp_path / "sfalt")
    os.makedirs(alt)
    for f in os.listdir(sf):
        if f != "documents.parquet":
            os.symlink(os.path.join(sf, f), os.path.join(alt, f))
    (
        spark.read.parquet(os.path.join(sf, "documents.parquet"))
        .repartition(7)
        .sortWithinPartitions(F.desc("doc_id"))
        .write.parquet(os.path.join(alt, "documents.parquet"))
    )
    rows_b = {
        r["shard"]: r.asDict()
        for r in QUERIES["q138_shard_shuffle_plan"](spark, alt).collect()
    }
    assert rows_a == rows_b


def test_kmeans_assign_ties_break_to_smaller_centroid(spark):
    """Duplicate vectors in the seed set produce exact distance ties; the
    production operator (similarity.kmeans_assign — the same code q140
    runs) must deterministically pick the smaller centroid id, matching
    the oracle's ORDER BY d2, cluster."""
    import pytest

    import pyspark.sql.functions as F

    from geomesa_cassandra_tools_spark.functions.vectors import as_double
    from geomesa_cassandra_tools_spark.operators import similarity

    # centroids 0 and 1 are identical; vector 10 sits exactly on them
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (10, [1.0, 0.0]),
        (11, [0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    v = df.select("vec_id", as_double(F.col("embedding")).alias("e"))
    seeds = {r["vec_id"]: r["e"] for r in v.where(F.col("vec_id") < 2).collect()}
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in similarity.kmeans_assign(v, seeds).collect()
    }
    assert got[10] == (0, 0.0)  # exact tie -> smaller centroid id
    assert got[11][0] in (0, 1)

    with pytest.raises(ValueError, match="empty seed set"):
        similarity.kmeans_assign(v, {})


def test_bloom_no_false_negatives_and_mergeable(spark):
    """The two Bloom contracts: (1) every inserted item probes
    maybe_member=True (no false negatives — the invariant q142 carries
    in-plan), (2) the filter over a union equals the union of the two
    slices' filters (set-bit merge algebra)."""
    import random

    import pyspark.sql.functions as F

    from geomesa_cassandra_tools_spark.operators import sketches

    rng = random.Random(1234)
    a = [f"item-{rng.randrange(10**9)}" for _ in range(300)]
    b = [f"other-{rng.randrange(10**9)}" for _ in range(300)]
    df_a = spark.createDataFrame([(x,) for x in a], "item string")
    df_b = spark.createDataFrame([(x,) for x in b], "item string")

    bloom_a = sketches.bloom_bits(df_a, "item", k=3, m=1024)
    # (1) no false negatives: probe the inserted set itself
    probed = sketches.bloom_maybe(
        df_a.withColumn("id", F.col("item")), bloom_a, "id", "item", k=3, m=1024
    )
    assert probed.where(~F.col("maybe_member")).count() == 0

    # (2) merge algebra: bits(A ∪ B) == distinct(bits(A) ∪ bits(B))
    bloom_union = sketches.bloom_bits(df_a.union(df_b), "item", k=3, m=1024)
    merged = bloom_a.union(sketches.bloom_bits(df_b, "item", k=3, m=1024)).distinct()
    assert {r["bit"] for r in bloom_union.collect()} == {
        r["bit"] for r in merged.collect()
    }


def test_kmeans_iterate_separates_two_blobs(spark):
    """Two well-separated synthetic blobs must end up in two pure clusters
    after a couple of Lloyd's rounds, regardless of the (adversarial) seed
    placement — both seeds start inside blob A, so the update step has to
    actually move a centroid for the test to pass. Also pins the
    empty-cluster rule: k=3 with only two blobs keeps the starved
    centroid alive (no renumbering)."""
    from geomesa_cassandra_tools_spark.operators import similarity

    blob_a = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(10)]
    blob_b = [(100 + i, [10.0 + 0.01 * i, 10.0]) for i in range(10)]
    df = spark.createDataFrame(
        blob_a + blob_b, "vec_id bigint, embedding array<float>"
    )
    out = similarity.kmeans_iterate(df, k=2, n_iter=3).collect()
    by_blob = {
        "a": {r["cluster"] for r in out if r["vec_id"] < 100},
        "b": {r["cluster"] for r in out if r["vec_id"] >= 100},
    }
    assert len(by_blob["a"]) == 1 and len(by_blob["b"]) == 1
    assert by_blob["a"] != by_blob["b"]

    # k=3: one centroid starves; assignment still covers every vector and
    # clusters stay numbered 0..2
    out3 = similarity.kmeans_iterate(df, k=3, n_iter=2).collect()
    assert len(out3) == 20
    assert {r["cluster"] for r in out3} <= {0, 1, 2}

    import pytest

    with pytest.raises(ValueError, match="need k="):
        similarity.kmeans_iterate(df.limit(1), k=2)


def test_bloom_mapside_probe_agrees_and_never_shuffles(spark):
    """The map-side bitmap probe must (1) return exactly the join form's
    verdicts and (2) plan ZERO exchanges — the production claim in
    bloom_maybe's docstring, checked against the executed plan."""
    import random

    import pyspark.sql.functions as F

    from geomesa_cassandra_tools_spark.operators import sketches

    rng = random.Random(99)
    inserted = [f"in-{rng.randrange(10**9)}" for _ in range(200)]
    probed = inserted[:50] + [f"out-{rng.randrange(10**9)}" for _ in range(200)]
    df_in = spark.createDataFrame([(x,) for x in inserted], "item string")
    df_probe = spark.createDataFrame(
        [(i, x) for i, x in enumerate(probed)], "id bigint, item string"
    )
    bloom = sketches.bloom_bits(df_in, "item", k=3, m=512)
    join_form = {
        r["id"]: r["maybe_member"]
        for r in sketches.bloom_maybe(df_probe, bloom, "id", "item", k=3, m=512).collect()
    }
    bits = [r["bit"] for r in bloom.collect()]
    mapside = sketches.bloom_maybe_mapside(df_probe, bits, "id", "item", k=3, m=512)
    assert {r["id"]: r["maybe_member"] for r in mapside.collect()} == join_form
    plan = mapside._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    import pytest

    with pytest.raises(ValueError, match="outside"):
        sketches.bloom_maybe_mapside(df_probe, [512], "id", "item", k=3, m=512)


def test_publish_layout_dir_breaks_only_aged_locks(tmp_path):
    """Lock-break discipline (r5 ADVICE): a lock is broken only when the
    lock FILE itself is older than the timeout (holder crashed), never
    merely because this waiter has waited long enough — so a fresh lock
    from a live publisher survives, while a crashed publisher's aged
    leftover is cleared and publish proceeds."""
    import os
    import threading
    import time

    from geomesa_cassandra_tools_spark.queries import _publish_layout_dir

    def torn(path: str) -> None:
        os.makedirs(path)
        open(os.path.join(path, "part-0.parquet"), "w").write("torn")

    def stage(s: str) -> str:
        os.makedirs(s)
        open(os.path.join(s, "part-0.parquet"), "w").write("data")
        open(os.path.join(s, "_SUCCESS"), "w").close()
        return s

    # (a) aged lock (crashed publisher) → broken immediately, publish wins
    path = str(tmp_path / "aged")
    torn(path)
    open(path + ".lock", "w").close()
    os.utime(path + ".lock", (time.time() - 1000, time.time() - 1000))
    _publish_layout_dir(stage(str(tmp_path / "s1")), path, lock_timeout=120.0)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(path + ".lock")

    # (b) fresh lock (live publisher) → waiter must NOT break it early
    path2 = str(tmp_path / "fresh")
    torn(path2)
    open(path2 + ".lock", "w").close()  # freshly created: mtime = now
    done = threading.Event()

    def publish():
        _publish_layout_dir(stage(str(tmp_path / "s2")), path2, lock_timeout=2.0)
        done.set()

    t = threading.Thread(target=publish)
    t.start()
    time.sleep(0.6)
    # lock is only 0.6 s old < 2 s timeout: still held, publish blocked
    assert os.path.exists(path2 + ".lock") and not done.is_set()
    t.join(timeout=30)  # after the lock AGES past 2 s it is broken
    assert done.is_set()
    assert os.path.exists(os.path.join(path2, "_SUCCESS"))
    assert not os.path.exists(path2 + ".lock")


def test_bloom_packed_m65536_matches_sparse_and_merges(spark):
    """The production-sized packing (r5 VERDICT item 8) at m=65536: the
    int64-word representation must hold EXACTLY the sparse bit set
    (unpack == bloom_bits, including words whose top bit 63 is set — the
    sign bit of the long), probe identically to the sparse join form with
    zero false negatives, and merge slice filters by word-wise bit_or to
    the same filter built over the union."""
    from geomesa_cassandra_tools_spark.operators import sketches as sk

    K, M = 4, 65536
    items = spark.range(3000).select(
        F.concat(F.lit("item-"), F.col("id")).alias("text")
    )
    sparse = {r["bit"] for r in sk.bloom_bits(items, "text", k=K, m=M).collect()}
    packed = sk.bloom_bits_packed(items, "text", k=K, m=M)
    unpacked = {r["bit"] for r in sk.bloom_unpack(packed).collect()}
    assert unpacked == sparse and len(sparse) > 1000
    # at 3000 items × 4 hashes over 65536 bits, some word uses bit 63
    assert any(b % 64 == 63 for b in sparse), "want a sign-bit word in play"
    # probe equivalence: members all true (no false negatives), and the
    # packed probe agrees with the sparse-join probe on a mixed candidate set
    cands = spark.range(2900, 3100).select(
        F.col("id").alias("cid"), F.concat(F.lit("item-"), F.col("id")).alias("text")
    )
    via_sparse = {
        r["cid"]: r["maybe_member"]
        for r in sk.bloom_maybe(
            cands, sk.bloom_bits(items, "text", k=K, m=M), "cid", "text", k=K, m=M
        ).collect()
    }
    via_packed = {
        r["cid"]: r["maybe_member"]
        for r in sk.bloom_maybe_packed(cands, packed, "cid", "text", k=K, m=M).collect()
    }
    assert via_packed == via_sparse
    assert all(via_packed[c] for c in range(2900, 3000)), "false negative!"
    # merge algebra: slice filters OR together to the union's filter
    a = sk.bloom_bits_packed(
        spark.range(1500).select(
            F.concat(F.lit("item-"), F.col("id")).alias("text")
        ),
        "text", k=K, m=M,
    )
    b = sk.bloom_bits_packed(
        spark.range(1500, 3000).select(
            F.concat(F.lit("item-"), F.col("id")).alias("text")
        ),
        "text", k=K, m=M,
    )
    merged = {
        (r["word"], r["bits"])
        for r in sk.bloom_merge_packed(a, b).collect()
    }
    whole = {(r["word"], r["bits"]) for r in packed.collect()}
    assert merged == whole


def test_lsh_multitable_recall_dominates_single(spark):
    """Multi-table LSH: L independent tables' candidate union must (a)
    return exactly the same schema/contract as ntables=1, (b) achieve
    recall >= the single table on the same corpus (a true neighbor escapes
    only by hashing apart in EVERY table), and (c) refuse a single-table
    corpus index when ntables > 1."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from geomesa_cassandra_tools_spark.operators import similarity as sim

    dim, n = 16, 400
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (
                F.sin(F.col("id") * j * 0.37) + F.cos(F.col("id") + j)
            ).cast("float"),
        ).alias("embedding"),
    )
    qv = base.where(F.col("vec_id") < 16)
    exact = sim.cosine_topk(qv, base, k=5).select("query_id", "cand_id")
    exact.persist()
    n_exact = exact.count()

    def recall(ntables: int) -> float:
        sigs = sim.corpus_hyperplane_signatures(
            base, dim=dim, nbits=12, ntables=ntables
        )
        approx = sim.lsh_cosine_topk(
            qv, base, k=5, dim=dim, nbits=12, corpus_sigs=sigs,
            ntables=ntables,
        )
        hits = exact.join(
            approx.select("query_id", "cand_id"),
            ["query_id", "cand_id"], "left_semi",
        ).count()
        return hits / n_exact

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 > 0.3  # 8 tables must find a real fraction of true neighbors

    # mismatched index shape refuses loudly
    single_sigs = sim.corpus_hyperplane_signatures(base, dim=dim, nbits=12)
    with _pytest.raises(ValueError, match="multi-table"):
        sim.lsh_cosine_topk(
            qv, base, k=5, dim=dim, nbits=12, corpus_sigs=single_sigs,
            ntables=8,
        )
    exact.unpersist()


def test_semdedup_prune_semantics(spark):
    """Earlier-id in-cluster near-dups suppress; cross-cluster near-dups
    never meet (the SemDeDup fence); a pruned suppressor still suppresses
    (per-vector screen, not transitive closure); zero-norm excluded."""
    from geomesa_cassandra_tools_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),    # cluster-0 seed / keeper
        (1, [0.99, 0.01, 0.0, 0.0]),  # near-dup of 0 -> dropped, keeper 0
        (2, [0.98, 0.02, 0.01, 0.0]), # near-dup of 0 AND 1 -> keeper 0, 2 sups
        (3, [0.0, 0.0, 1.0, 0.0]),    # cluster-1 seed, orthogonal to all
        (4, [0.01, 0.0, 0.99, 0.0]),  # near-dup of 3 in OTHER cluster
        (5, [0.0, 0.0, 0.0, 0.0]),    # zero norm: excluded entirely
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, e array<double>")
    seeds = {0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 0.0, 1.0, 0.0]}
    out = similarity.semdedup_prune(df, seeds, 0.9, id_col="vec_id", vec_col="e")
    got = {
        r["vec_id"]: (r["cluster"], r["n_suppressors"], r["keeper_id"])
        for r in out.collect()
    }
    assert got == {
        1: (0, 1, 0),
        2: (0, 2, 0),
        4: (1, 1, 3),
    }
    # the fence: 4 is cosine~0.0099.. to nothing in cluster 0; its only
    # suppressor is 3, in ITS cluster — no cross-cluster pair was scored
    # exact-threshold boundary: cos(a,b) == 0.9 within 1e-9 must count
    a = [1.0, 0.0]
    import math

    th = 0.9
    b = [th, math.sqrt(1 - th * th)]  # cos(a,b) == 0.9 up to rounding
    df2 = spark.createDataFrame(
        [(0, a), (1, b)], "vec_id bigint, e array<double>"
    )
    out2 = similarity.semdedup_prune(
        df2, {0: a}, th, id_col="vec_id", vec_col="e"
    )
    # decided by the sequential-fold recompute, deterministically
    got2 = [(r["vec_id"], r["keeper_id"]) for r in out2.collect()]
    seq = similarity._seq_cos(a, b)
    assert got2 == ([(1, 0)] if seq >= th else [])


def test_shared_run_pairs_semantics(spark):
    """Known runs: a verbatim 10-token run is reported at 10; two
    separate diagonals report the LONGEST; sub-threshold overlap and
    docs shorter than the window are excluded."""
    run10 = "a b c d e f g h i j"
    rows = [
        (0, run10 + " x1 x2 x3"),
        (1, "y1 y2 " + run10 + " y3"),              # shares the 10-run with 0
        (2, "a b c d e z1 z2 z3 f g h i j z4"),      # two 5-window runs vs 0
        (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),       # no overlap
        (4, "a b c"),                                 # shorter than w: excluded
    ]
    from geomesa_cassandra_tools_spark.operators import dedup as dd

    out = dd.shared_run_pairs(
        spark.createDataFrame(rows, "doc_id bigint, text string"),
        w=5, min_tokens=5,
    )
    got = {(r["doc_a"], r["doc_b"]): r["run_tokens"] for r in out.collect()}
    assert got[(0, 1)] == 10
    assert got[(0, 2)] == 5  # max of the two 5-token runs, not their sum
    assert (1, 2) in got and got[(1, 2)] == 5
    assert all(3 not in pair and 4 not in pair for pair in got)
    # the hashed-gram join (default) and the exact string join are the
    # same operator: identical pair set and run lengths
    exact = dd.shared_run_pairs(
        spark.createDataFrame(rows, "doc_id bigint, text string"),
        w=5, min_tokens=5, exact_grams=True,
    )
    got_exact = {
        (r["doc_a"], r["doc_b"]): r["run_tokens"] for r in exact.collect()
    }
    assert got_exact == got
    # min_tokens fences: at 11 nothing survives
    assert dd.shared_run_pairs(
        spark.createDataFrame(rows, "doc_id bigint, text string"),
        w=5, min_tokens=11,
    ).count() == 0


def test_duplicated_span_removal_semantics(spark):
    """ExactSubstr removal: the shared 10-token run is cut from BOTH of
    its carriers (corpus-frequency marking, not pairing); sub-threshold
    runs survive; self-repeats within one document count as duplication;
    unchanged documents are not emitted; hashed and exact gram paths
    agree; a fully-duplicated document comes back as empty text."""
    from geomesa_cassandra_tools_spark.operators import dedup as dd

    run10 = "a b c d e f g h i j"
    rows = [
        (0, run10 + " x1 x2 x3"),
        (1, "y1 y2 " + run10 + " y3"),
        # two 5-window overlaps with doc 0 -> below min_tokens=8, kept
        (2, "a b c d e z1 z2 z3 f g h i j z4"),
        (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),  # unique: not emitted
        (4, "a b c"),  # shorter than w: not emitted
        # self-repeat: the same 5-gram twice INSIDE one doc; run = 5 < 8
        (5, "s1 s2 s3 s4 s5 m1 m2 s1 s2 s3 s4 s5"),
        (6, run10),  # the run IS the whole doc -> fully erased
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in dd.duplicated_span_removal(df, w=5, min_tokens=8).collect()
    }
    assert set(out) == {0, 1, 6}
    assert out[0]["clean_text"] == "x1 x2 x3"
    assert out[0]["n_removed"] == 10 and out[0]["n_spans"] == 1
    assert out[1]["clean_text"] == "y1 y2 y3"
    assert out[6]["clean_text"] == "" and out[6]["n_removed"] == 10
    assert out[6]["n_tokens"] == 10
    # the self-repeat doc IS cut once min_tokens admits 5-token runs
    low = {
        r["doc_id"]: r.asDict()
        for r in dd.duplicated_span_removal(df, w=5, min_tokens=5).collect()
    }
    assert 5 in low and low[5]["n_spans"] == 2 and low[5]["n_removed"] == 10
    assert low[5]["clean_text"] == "m1 m2"
    # hashed-key (default) and exact string paths are the same operator
    exact = {
        r["doc_id"]: r.asDict()
        for r in dd.duplicated_span_removal(
            df, w=5, min_tokens=8, exact_grams=True
        ).collect()
    }
    assert exact == out


def _span_removal_ref(texts, w, min_tokens):
    """Pure-Python reference for duplicated_span_removal: count every
    w-gram's corpus sites, mark windows, take maximal consecutive-pos
    runs, keep runs covering >= min_tokens tokens, union coverage, drop
    covered tokens. Returns {doc_id: (n_tokens, n_spans, n_removed,
    clean_text)} for changed docs only."""
    from collections import Counter

    grams = Counter()
    wins = {}
    for did, text in texts:
        toks = text.split(" ")
        ws = [
            " ".join(toks[p : p + w]) for p in range(len(toks) - w + 1)
        ]
        wins[did] = (toks, ws)
        grams.update(ws)
    out = {}
    for did, (toks, ws) in wins.items():
        dup = [p for p, g in enumerate(ws) if grams[g] >= 2]
        spans = []
        i = 0
        while i < len(dup):
            j = i
            while j + 1 < len(dup) and dup[j + 1] == dup[j] + 1:
                j += 1
            s, e = dup[i], dup[j] + w - 1  # 0-based token coverage
            if e - s + 1 >= min_tokens:
                spans.append((s, e))
            i = j + 1
        if not spans:
            continue
        covered = set()
        for s, e in spans:
            covered.update(range(s, e + 1))
        clean = " ".join(t for p, t in enumerate(toks) if p not in covered)
        out[did] = (len(toks), len(spans), len(covered), clean)
    return out


def test_duplicated_span_removal_model(spark):
    """Model check: the operator equals the pure-Python reference on a
    seeded collision-rich corpus (tiny vocabulary forces real duplicated
    runs, self-repeats, and overlapping spans; lengths straddle w)."""
    import random

    from geomesa_cassandra_tools_spark.operators import dedup as dd

    rng = random.Random(1307)
    vocab = [f"t{i}" for i in range(12)]
    texts = []
    for did in range(40):
        n = rng.randint(1, 30)
        texts.append((did, " ".join(rng.choice(vocab) for _ in range(n))))
    # inject verbatim cross-doc plagiarism so long runs certainly exist
    texts[7] = (7, texts[3][1] + " zz " + texts[11][1])
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    for w, mt in [(5, 8), (3, 4)]:
        ref = _span_removal_ref(texts, w, mt)
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["n_spans"], r["n_removed"], r["clean_text"]
            )
            for r in dd.duplicated_span_removal(
                df, w=w, min_tokens=mt
            ).collect()
        }
        assert got == ref, f"mismatch at w={w} min_tokens={mt}"


# ---------------------------------------------------------------------------
# Product quantization (similarity.pq_*)
# ---------------------------------------------------------------------------


def _pq_python_encode(vec, books):
    codes = []
    sub = len(books[0][0])
    for s, words in enumerate(books):
        best = None
        for ci, w in enumerate(words):
            d = 0.0
            for i in range(sub):
                diff = float(vec[s * sub + i]) - w[i]
                d += diff * diff
            if best is None or d < best[0]:
                best = (d, ci)
        codes.append(best[1])
    return codes


def _pq_python_adc(qv, codes, books):
    sub = len(books[0][0])
    dist = 0.0
    for s, words in enumerate(books):
        w = words[codes[s]]
        d = 0.0
        for i in range(sub):
            diff = float(qv[s * sub + i]) - w[i]
            d += diff * diff
        dist += d
    return dist


def test_pq_codebooks_shape_determinism_and_validation():
    from geomesa_cassandra_tools_spark.operators import similarity

    cb = similarity.pq_codebooks(8, 2, 4)
    assert len(cb) == 2 and len(cb[0]) == 4 and len(cb[0][0]) == 4
    assert cb == similarity.pq_codebooks(8, 2, 4)
    assert cb != similarity.pq_codebooks(8, 2, 4, seed=99)
    with pytest.raises(ValueError, match="divide"):
        similarity.pq_codebooks(10, 3, 4)


def test_pq_encode_hand_case(spark):
    from geomesa_cassandra_tools_spark.operators import similarity

    # two 2-dim subspaces, two codewords each — answers computable by eye
    cb = [
        [[0.0, 0.0], [1.0, 1.0]],
        [[0.0, 0.0], [-1.0, -1.0]],
    ]
    df = spark.createDataFrame(
        [(0, [0.9, 1.1, -0.9, -1.2]), (1, [0.1, -0.1, 0.2, 0.1])],
        "vec_id bigint, embedding array<double>",
    )
    got = {r["vec_id"]: list(r["codes"]) for r in
           similarity.pq_encode(df, cb).collect()}
    assert got == {0: [1, 1], 1: [0, 0]}


def test_pq_encode_tie_breaks_to_smaller_code(spark):
    from geomesa_cassandra_tools_spark.operators import similarity

    cb = [[[1.0], [-1.0]]]  # equidistant from 0.0
    df = spark.createDataFrame([(0, [0.0])], "vec_id bigint, embedding array<double>")
    assert similarity.pq_encode(df, cb).first()["codes"] == [0]


def test_pq_adc_topk_matches_python_reference(spark):
    from geomesa_cassandra_tools_spark.operators import similarity

    cb = similarity.pq_codebooks(8, 2, 4, seed=5)
    rows = [
        (i, [((i * 7 + j * 3) % 11) / 5.0 - 1.0 for j in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    codes = similarity.pq_encode(df, cb)
    got = similarity.pq_adc_topk(codes, df.where("vec_id < 2"), cb, 3).collect()

    py_codes = {i: _pq_python_encode(v, cb) for i, v in rows}
    for qid in (0, 1):
        qv = rows[qid][1]
        ranked = sorted(
            ((_pq_python_adc(qv, py_codes[i], cb), i) for i, _ in rows if i != qid),
        )[:3]
        mine = sorted(
            (r["d2"], r["cand_id"]) for r in got if r["query_id"] == qid
        )
        assert [c for _, c in mine] == [c for _, c in ranked]
        for (da, _), (db, _) in zip(mine, ranked):
            assert da == pytest.approx(db, abs=1e-12)


def test_pq_adc_topk_query_guard(spark):
    from geomesa_cassandra_tools_spark.operators import similarity

    cb = similarity.pq_codebooks(4, 2, 2)
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, 0.5]) for i in range(5)],
        "vec_id bigint, embedding array<double>",
    )
    codes = similarity.pq_encode(df, cb)
    with pytest.raises(ValueError, match="max_queries"):
        similarity.pq_adc_topk(codes, df, cb, 2, max_queries=2)


def test_pq_train_reduces_quantization_error(spark, sf_smoke):
    from geomesa_cassandra_tools_spark.operators import similarity
    from geomesa_cassandra_tools_spark.sources.tables import load_tables

    emb = load_tables(spark, sf_smoke)["embeddings"]
    vecs = [list(r["embedding"]) for r in emb.select("embedding").collect()]
    dim = len(vecs[0])

    random_cb = similarity.pq_codebooks(dim, 8, 16)
    trained_cb = similarity.pq_train(emb, dim, 8, 16, rounds=2)

    def err(books):
        total = 0.0
        for v in vecs:
            codes = _pq_python_encode(v, books)
            total += _pq_python_adc(v, codes, books)
        return total / len(vecs)

    e_rand, e_train = err(random_cb), err(trained_cb)
    assert e_train < e_rand * 0.75, (e_rand, e_train)


def test_pq_train_is_deterministic(spark):
    from geomesa_cassandra_tools_spark.operators import similarity

    rows = [
        (i, [((i * 13 + j * 5) % 17) / 8.0 - 1.0 for j in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    a = similarity.pq_train(df, 8, 2, 4, rounds=2)
    b = similarity.pq_train(df.repartition(7), 8, 2, 4, rounds=2)
    assert a == b  # int64-quantized update: partitioning-independent


def test_pq_adc_recall_on_separated_blobs(spark):
    from geomesa_cassandra_tools_spark.operators import similarity

    # 3 well-separated blobs in dim 8: ADC must keep neighbors in-blob
    centers = [[0.0] * 8, [10.0] * 8, [-10.0] * 8]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [c[j] + ((i * 31 + j * 7) % 13) / 13.0 for j in range(8)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = similarity.pq_train(df, 8, 4, 8, rounds=2)
    codes = similarity.pq_encode(df, cb)
    got = similarity.pq_adc_topk(codes, df.where("vec_id < 3"), cb, 5).collect()
    for r in got:
        # query i's blob is i % 3; every returned neighbor must share it
        assert r["cand_id"] % 3 == r["query_id"] % 3, r


def test_pq_encode_blas_equals_jvm_fold(spark):
    from geomesa_cassandra_tools_spark.operators import similarity

    cb = similarity.pq_codebooks(8, 2, 4, seed=5)
    rows = [
        (i, [((i * 7 + j * 3) % 11) / 5.0 - 1.0 for j in range(8)])
        for i in range(50)
    ]
    # adversarial tie rows: exactly equidistant between two codewords in
    # a hand codebook exercise the boundary recompute + (d2, code) rule
    tie_cb = [[[1.0], [-1.0], [3.0], [5.0]], [[0.0], [2.0], [4.0], [6.0]]]
    tie_rows = [(100 + i, [0.0, 1.0]) for i in range(3)]

    for books, data, ddl in (
        (cb, rows, "vec_id bigint, embedding array<double>"),
        (tie_cb, tie_rows, "vec_id bigint, embedding array<double>"),
    ):
        df = spark.createDataFrame(data, ddl)
        jvm = {r["vec_id"]: list(r["codes"]) for r in
               similarity.pq_encode(df, books).collect()}
        blas = {r["vec_id"]: list(r["codes"]) for r in
                similarity.pq_encode_blas(df, books).collect()}
        assert jvm == blas


def test_pq_encode_delta_encodes_only_fresh_rows(spark):
    """Incremental index maintenance: rows already in the stored codes
    index are NOT re-encoded; fresh rows' codes equal the full encode."""
    from geomesa_cassandra_tools_spark.operators import similarity

    cb = similarity.pq_codebooks(8, 2, 4, seed=5)
    rows = [
        (i, [((i * 7 + j * 3) % 11) / 5.0 - 1.0 for j in range(8)])
        for i in range(20)
    ]
    ddl = "vec_id bigint, embedding array<double>"
    full = spark.createDataFrame(rows, ddl)
    index = similarity.pq_encode_blas(
        full.where("vec_id % 3 != 0"), cb
    )
    # the delta batch OVERLAPS the index (ids 0..9): only %3==0 are fresh
    delta = full.where("vec_id < 10")
    fresh = similarity.pq_encode_delta(delta, index, cb)
    got = {r["vec_id"]: list(r["codes"]) for r in fresh.collect()}
    assert sorted(got) == [0, 3, 6, 9]
    want = {r["vec_id"]: list(r["codes"]) for r in
            similarity.pq_encode(full.where("vec_id in (0,3,6,9)"), cb).collect()}
    assert got == want
    # union(index, fresh) == full encode: the convergence contract
    union = {**{r["vec_id"]: list(r["codes"]) for r in index.collect()},
             **got}
    missing_delta = similarity.pq_encode_delta(
        full.where("vec_id >= 10 and vec_id % 3 = 0"), index, cb
    )
    union.update({r["vec_id"]: list(r["codes"]) for r in missing_delta.collect()})
    want_full = {r["vec_id"]: list(r["codes"]) for r in
                 similarity.pq_encode(full, cb).collect()}
    assert union == want_full


def test_ivf_residuals_reconstruct_and_assign(spark):
    """residual + assigned centroid == original vector (exact double
    arithmetic), and the assignment is the nearest-by-cosine cell with
    ties to the smaller cid — ivf_topk's contract."""
    from geomesa_cassandra_tools_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [0.9, 0.1, 0.0, 0.0]),   # nearer cell 0
        (11, [0.2, 0.8, 0.0, 0.0]),   # nearer cell 1
        (12, [0.5, 0.5, 0.0, 0.0]),   # exact tie -> cell 0
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cid bigint, centroid array<double>",
    )
    got = {
        r["vec_id"]: (r["cid"], list(r["residual"]))
        for r in similarity.ivf_residuals(df, cent).collect()
    }
    assert {k: v[0] for k, v in got.items()} == {0: 0, 1: 1, 10: 0, 11: 1, 12: 0}
    cents = {0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0, 0.0]}
    for vid, emb in rows:
        cid, res = got[vid]
        assert [res[i] + cents[cid][i] for i in range(4)] == emb


def test_ivf_pq_residual_topk_matches_python_reference(spark):
    """Residual ADC end to end on a hand-checkable set: codes are
    residual codes, distance tables are per-(query, cell), and the
    result equals a sequential-fold Python replay."""
    from geomesa_cassandra_tools_spark.operators import similarity

    dim, m, k = 8, 2, 4
    rows = [
        (i, [((i * 13 + j * 5) % 17) / 8.0 - 1.0 for j in range(dim)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cent_rows = [(0, rows[0][1]), (1, rows[1][1])]
    cent = spark.createDataFrame(
        cent_rows, "cid bigint, centroid array<double>"
    )
    res = similarity.ivf_residuals(df, cent)
    books = similarity.pq_train(res, dim, m, k, rounds=1, vec_col="residual")
    codes = similarity.pq_encode(res, books, vec_col="residual").join(
        res.select("vec_id", "cid"), "vec_id"
    )
    got = similarity.ivf_pq_residual_topk(
        df.where("vec_id >= 10"), cent, books, codes, k=3, nprobe=2
    ).collect()

    # python reference over the collected pieces
    resl = {r["vec_id"]: (r["cid"], list(r["residual"])) for r in res.collect()}
    codl = {r["vec_id"]: list(r["codes"]) for r in
            similarity.pq_encode(res, books, vec_col="residual").collect()}
    cents = dict(cent_rows)
    sub = dim // m
    expect = {}
    for qid, qv in rows:
        if qid < 10:
            continue
        cand_d = []
        for cid in (0, 1):  # nprobe=2 of 2 cells
            qres = [qv[i] - cents[cid][i] for i in range(dim)]
            for vid, (vcid, _r) in resl.items():
                if vcid != cid or vid == qid:
                    continue
                d = 0.0
                for s in range(m):  # per-subspace partial, then fold — the
                    w = books[s][codl[vid][s]]  # table-lookup grouping
                    ds = 0.0
                    for i in range(sub):
                        diff = qres[s * sub + i] - w[i]
                        ds += diff * diff
                    d += ds
                cand_d.append((d, vid))
        cand_d.sort()
        expect[qid] = [vid for _d, vid in cand_d[:3]]
    got_by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_by_q.setdefault(r["query_id"], []).append(r["cand_id"])
    assert got_by_q == expect


def test_gram_windows_udtf_matches_jvm_builder(spark):
    """The UDTF escape hatch reproduces the JVM transform-over-sequence
    window builder row for row (same windows `dedup.shared_run_pairs`
    plans JVM-side) — the API-surface twin, not a hot-path replacement."""
    from geomesa_cassandra_tools_spark.functions import tablefuncs

    tablefuncs.register(spark)
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "one two three")],
        "doc_id bigint, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT d.doc_id, g.pos, g.gram "
            "FROM udtf_docs d, LATERAL gram_windows(d.text, 3) g"
        ).collect()
    )
    jvm = sorted(
        tuple(r)
        for r in docs.where(F.size(F.split("text", " ")) >= 3)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.size(F.split("text", " ")) - F.lit(2)
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.split(F.col("text"), " "), i, 3)
                    ),
                )
            ).alias("p0", "gram"),
        )
        .select("doc_id", (F.col("p0") + 1).cast("int").alias("pos"), "gram")
        .collect()
    )
    assert got == jvm and len(got) == 4


def test_redact_pii_order_and_counts(spark):
    """Redaction masks IN ORDER (email first: its domain never feeds the
    IP pattern), counts match replacements, clean text is untouched."""
    from pyspark.sql import functions as F

    from geomesa_cassandra_tools_spark.functions import text as T

    rows = [
        (1, "mail a.b@x.io or c@d-e.org now"),
        (2, "ip 10.1.2.3 and phone 555-123-4567"),
        (3, "clean words only"),
        (4, "weird user9@10.1.2.3.example.com tail 10.9.8.7"),
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    got = {
        r["id"]: (r["red"], (r["c"]["email"], r["c"]["ip"], r["c"]["phone"]))
        for r in df.select(
            "id",
            T.redact_pii(F.col("t")).alias("red"),
            T.pii_counts(F.col("t")).alias("c"),
        ).collect()
    }
    assert got[1] == ("mail <EMAIL> or <EMAIL> now", (2, 0, 0))
    assert got[2] == ("ip <IP> and phone <PHONE>", (0, 1, 1))
    assert got[3] == ("clean words only", (0, 0, 0))
    # the email eats its whole dotted domain (leftmost-first greedy in
    # BOTH dialects), so only the standalone IP remains for the IP pass
    assert got[4] == ("weird <EMAIL> tail <IP>", (1, 1, 0))


def test_repetition_metrics_edges(spark):
    """Gopher repetition gates on the degenerate shapes: one-token docs
    (no grams -> 0bp dup, 10000bp top-token), all-same-token docs
    (everything duplicate), and an alternating doc where 2-grams repeat
    but 3-grams don't all."""
    from pyspark.sql import functions as F

    from geomesa_cassandra_tools_spark.functions import text as T

    rows = [
        (1, "solo"),
        (2, "a a a a"),
        (3, "a b a b a"),
        (4, "w x y z"),
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    got = {
        r["id"]: (r["top1"], r["d2"], r["d3"])
        for r in df.select(
            "id",
            T.top_token_bp(F.col("t")).alias("top1"),
            T.dup_ngram_bp(F.col("t"), 2).alias("d2"),
            T.dup_ngram_bp(F.col("t"), 3).alias("d3"),
        ).collect()
    }
    assert got[1] == (10000, 0, 0)
    # "a a a a": 3 identical 2-grams -> 2/3 dup; 2 identical 3-grams -> 1/2
    assert got[2] == (10000, 6666, 5000)
    # "a b a b a": top token 3/5; 2-grams [ab,ba,ab,ba] -> 2/4 dup;
    # 3-grams [aba,bab,aba] -> 1/3 dup
    assert got[3] == (6000, 5000, 3333)
    assert got[4] == (2500, 0, 0)


def test_gopher_char_fraction_gates(spark):
    """Character-fraction gates (q187 primitives): hand-computed shapes
    for top-n-gram char share (smallest-string tie rule), duplicated-
    element char share (overlap double-counting), and the deterministic
    k-token line segmentation."""
    from pyspark.sql import functions as F

    from geomesa_cassandra_tools_spark.functions import text as T

    rows = [
        (1, "a b a b a"),      # g2: [a b, b a, a b, b a]; len(text)=9
        (2, "x y z"),          # no repeats
        (3, "p q p q p q p q"),  # lines(2): [p q, p q, p q, p q]
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    tk = F.col("tk")
    out = {
        r["id"]: r
        for r in df.withColumn("tk", T.tokens(F.col("t")))
        .withColumn("g2", T.shingles_t(tk, 2))
        .withColumn("lines", T.token_chunk_lines(tk, 2))
        .select(
            "id",
            T.top_elem_char_bp_t(F.col("g2"), F.col("t")).alias("topc"),
            T.dup_elem_char_bp_t(F.col("g2"), F.col("t")).alias("dupc"),
            T._dup_bp_from_grams(F.col("lines")).alias("dupl"),
            F.col("lines"),
        )
        .collect()
    }
    # doc1: 'a b' and 'b a' both occur 2x; tie -> smallest = 'a b'
    # (len 3): topc = floor(2*3*10000/9) = 6666; dup chars = 2*3 + 2*3
    # = 12 -> floor(12*10000/9) = 13333 (>10000: overlaps double-count)
    assert out[1]["topc"] == 6666 and out[1]["dupc"] == 13333
    # lines(2) of 5 tokens: ['a b', 'a b', 'a'] -> 1 dup of 3
    assert out[1]["lines"] == ["a b", "a b", "a"]
    assert out[1]["dupl"] == 3333
    # doc2 'x y z' (len 5): every gram once -> top run 1, smallest
    # gram 'x y' (len 3): topc = floor(1*3*10000/5) = 6000; no dups
    assert out[2]["topc"] == 6000
    assert out[2]["dupc"] == 0 and out[2]["dupl"] == 0
    # doc3 (len 15): lines(2) = 4x 'p q' -> dupl = floor(3*10000/4)
    # = 7500; g2 = 'p q' x4 + 'q p' x3, dup chars = 4*3 + 3*3 = 21
    # -> dupc = floor(21*10000/15) = 14000
    assert out[3]["dupl"] == 7500
    assert out[3]["dupc"] == 14000


# ------------------------------------------------ real media header decode


def test_parse_media_header_roundtrips_every_builder():
    """Byte-level writer/parser round trip for all four real containers,
    including the BMP top-down (negative height) form and RIFF chunk
    padding."""
    import struct

    assert multimodal.parse_media_header(
        multimodal.build_bmp(509, 383, b"xx")
    ) == {"mime": "image/bmp", "width": 509, "height": 383,
          "duration_ms": None}
    q = bytearray(multimodal.build_bmp(10, 20))
    q[22:26] = struct.pack("<i", -20)  # top-down DIB
    assert multimodal.parse_media_header(bytes(q))["height"] == 20
    assert multimodal.parse_media_header(
        multimodal.build_png(1920, 1080)
    ) == {"mime": "image/png", "width": 1920, "height": 1080,
          "duration_ms": None}
    assert multimodal.parse_media_header(
        multimodal.build_ppm(17, 23, b"rgb")
    ) == {"mime": "image/x-portable-pixmap", "width": 17, "height": 23,
          "duration_ms": None}
    # WAV: exact integer duration; odd-sized chunk padding walked
    wav = multimodal.parse_media_header(multimodal.build_wav(8000, 2, 4001))
    assert wav == {"mime": "audio/wav", "width": None, "height": None,
                   "duration_ms": 4001 * 1000 // 8000}
    # unknowns and truncation return None, never raise
    assert multimodal.parse_media_header(b"garbage bytes") is None
    assert multimodal.parse_media_header(None) is None
    assert multimodal.parse_media_header(b"BM") is None
    assert multimodal.parse_media_header(b"P6 malformed!") is None


def test_decode_headers_fills_only_recognized_rows(spark):
    rows = [
        (1, "image", bytearray(multimodal.build_bmp(100, 50)), None, None,
         None, None),
        (2, "audio", bytearray(multimodal.build_wav(16000, 1, 16000)),
         None, None, None, None),
        (3, "video", bytearray(b"opaque-codec-bytes"), "video/mp4", 640,
         480, 9000),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.decode_headers(media).collect()}
    assert (got[1]["mime"], got[1]["width"], got[1]["height"]) == (
        "image/bmp", 100, 50
    )
    assert (got[2]["mime"], got[2]["duration_ms"]) == ("audio/wav", 1000)
    # unrecognized payload: stored metadata untouched
    assert (got[3]["mime"], got[3]["width"], got[3]["height"],
            got[3]["duration_ms"]) == ("video/mp4", 640, 480, 9000)


def test_bpe_train_and_encode_paths_agree(spark):
    """functions/bpe: training learns the classic merges on the Sennrich
    toy corpus; the window (relational) and fold (array) encode paths
    produce identical tokenizations, including left-to-right
    non-overlapping runs (the a+a case) and unseen words."""
    from pyspark.sql import functions as F

    from geomesa_cassandra_tools_spark.functions import bpe

    docs = spark.createDataFrame(
        [("low low low low low lower lower newest newest newest "
          "newest newest newest widest widest widest",)],
        "text string",
    )
    merges, _state = bpe.train(spark, docs, top_v=10, n_merges=6)
    assert [(m["left"], m["right"]) for m in merges[:4]] == [
        ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
    ]
    words = spark.createDataFrame(
        [(1, 1, "lowest"), (1, 2, "newest"), (1, 3, "aaaa"),
         (1, 4, "wilder")],
        "doc_id int, widx int, word string",
    )
    rel = bpe.encode(
        bpe.char_seqs(words, ["doc_id", "widx"]), ["doc_id", "widx"],
        merges,
    )
    rel_toks = {
        (r["doc_id"], r["widx"]): None
        for r in rel.select("doc_id", "widx").distinct().collect()
    }
    got_rel = {
        k: [r["sym"] for r in rel.where(
            (F.col("doc_id") == k[0]) & (F.col("widx") == k[1])
        ).orderBy("pos").collect()]
        for k in rel_toks
    }
    fold = bpe.encode_words(words, merges)
    got_fold = {
        (r["doc_id"], r["widx"]): list(r["toks"])
        for r in fold.collect()
    }
    assert got_rel == got_fold
    assert got_fold[(1, 1)] == ["low", "est"]  # BPE's canonical example
    # run-parity: merge (a,a)-style non-overlap — no merges learned for
    # 'a' here, so 'aaaa' stays chars; check the pass itself directly
    seqs = bpe.char_seqs(
        spark.createDataFrame([(1, 1, "aaaa")],
                              "doc_id int, widx int, word string"),
        ["doc_id", "widx"],
    )
    one = bpe.apply_merge(seqs, ["doc_id", "widx"], "a", "a")
    assert [r["sym"] for r in one.orderBy("pos").collect()] == ["aa", "aa"]
    three = bpe.apply_merge(
        bpe.char_seqs(
            spark.createDataFrame([(1, 1, "aaa")],
                                  "doc_id int, widx int, word string"),
            ["doc_id", "widx"],
        ),
        ["doc_id", "widx"], "a", "a",
    )
    assert [r["sym"] for r in three.orderBy("pos").collect()] == ["aa", "a"]


def test_image_pixel_decode_and_ahash(spark):
    """multimodal r12: full pixel decode round-trips all three
    containers byte-identically (BMP bottom-up+padding, top-down BMP
    via negative height, PPM, real-zlib PNG), ahash is stable across
    them, undecodable payloads emit null, and the banded near-pair op
    finds exactly the Hamming<=3 pairs."""
    import struct
    import zlib

    from geomesa_cassandra_tools_spark.operators import multimodal as M

    W = H = 16
    rgb = bytes(
        (3 * x + 5 * y + (x * y) % 13) % 256
        for y in range(H) for x in range(W) for _ in range(3)
    )
    payloads = {
        "bmp": M.build_bmp_pixels(W, H, rgb),
        "ppm": M.build_ppm_pixels(W, H, rgb),
        "png": M.build_png_pixels(W, H, rgb),
    }
    hashes = set()
    for fmt, p in payloads.items():
        w, h, out = M.decode_pixels(p)
        assert (w, h, out) == (W, H, rgb), fmt
        hashes.add(M.ahash_hex(out, w, h))
    assert len(hashes) == 1

    # top-down BMP (negative height field) decodes to the same pixels
    td = bytearray(M.build_bmp_pixels(W, H, rgb))
    # rebuild body rows in top-down order and flip the height sign
    stride = W * 3 + ((-(W * 3)) % 4)
    body = td[54:]
    flipped = b"".join(
        bytes(body[(H - 1 - y) * stride:(H - y) * stride])
        for y in range(H)
    )
    td = td[:54] + flipped
    struct.pack_into("<i", td, 22, -H)
    assert M.decode_pixels(bytes(td))[2] == rgb

    # undecodable payloads -> null hash rows (not dropped)
    media = spark.createDataFrame(
        [(1, bytearray(payloads["png"])), (2, bytearray(b"garbage"))],
        "media_id bigint, payload binary",
    )
    got = {r["media_id"]: r["ahash"]
           for r in M.image_ahash(media, ["media_id"]).collect()}
    assert got[1] is not None and got[2] is None

    # banded pairs: hamming 0 and 2 found, hamming 8 excluded
    h0 = "00ff00ff00ff00ff"
    h2 = "00ff00fc00ff00ff"  # last nibble of band 2 flips 2 bits
    h8 = "ffff00ff00ff0000"
    frame = spark.createDataFrame(
        [(1, h0), (2, h0), (3, h2), (4, h8)], "doc_id bigint, ahash string"
    )
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in M.ahash_near_pairs(frame, "doc_id").collect()
    }
    assert pairs == {(1, 2): 0, (1, 3): 2, (2, 3): 2}


def test_wav_pcm_decode_and_stats(spark):
    """r13 audio PCM content analysis: build_wav_pcm/decode_wav_pcm
    round-trip real samples; audio_pcm_stats computes the all-integer
    triage and emits -1 sentinels for undecodable payloads."""
    import array

    from geomesa_cassandra_tools_spark.operators import multimodal as mm

    samples = [0, 100, -200, 32767, -32768, 5, -5, 300, 0, 0, 0, -1]
    arr = array.array("h", samples)
    import sys as _sys
    if _sys.byteorder == "big":
        arr.byteswap()
    payload = mm.build_wav_pcm(16000, 1, arr.tobytes())
    rate, ch, got = mm.decode_wav_pcm(payload)
    assert (rate, ch) == (16000, 1) and list(got) == samples
    # header walk still agrees (duration from frame count)
    meta = mm.parse_media_header(payload)
    assert meta["mime"] == "audio/wav"
    assert meta["duration_ms"] == int(len(samples) / 16000 * 1000)
    # non-PCM refusals return None (compressed fmt tag, truncated)
    assert mm.decode_wav_pcm(payload[:20]) is None
    bad_fmt = bytearray(payload)
    bad_fmt[20] = 2  # fmt tag != 1 (not uncompressed PCM)
    assert mm.decode_wav_pcm(bytes(bad_fmt)) is None

    media = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not a wav"))],
        "id bigint, payload binary",
    )
    rows = {
        r["id"]: r
        for r in mm.audio_pcm_stats(media, ["id"]).collect()
    }
    r1 = rows[1]
    assert r1["sample_rate"] == 16000
    assert r1["n_samples"] == len(samples)
    assert r1["peak"] == 32768
    assert r1["sum_sq"] == sum(v * v for v in samples)
    assert r1["n_clipped"] == 2
    # signs: + + - + - + - + + + + -  (initial prev = +1) -> 7 changes
    assert r1["n_zero_cross"] == 7
    # |s| < 256 runs: [0,100,-200]=3 then [5,-5]=2 then [0,0,0,-1]=4
    assert r1["max_silence_run"] == 4
    r2 = rows[2]
    assert all(
        r2[k] == -1
        for k in ("sample_rate", "n_samples", "peak", "sum_sq",
                  "n_clipped", "n_zero_cross", "max_silence_run")
    )


def test_perceptron_classifier_trains_and_scores(spark):
    """r13 trained quality classifier: the batch perceptron separates a
    linearly separable hashed-feature problem, training is
    bit-deterministic across re-runs, and scoring is consistent with
    the final weights."""
    from geomesa_cassandra_tools_spark.functions import classifier

    rows = []
    for d in range(20):
        y = 1 if d % 2 == 0 else -1
        # positives carry 'order' words, negatives carry 'junk'
        w = "order" if y == 1 else "junk"
        rows.extend((d, w) for _ in range(3 + d % 3))
    words = spark.createDataFrame(rows, "doc_id bigint, word string")
    feats = classifier.hashed_features(words)
    labels = spark.createDataFrame(
        [(d, 1 if d % 2 == 0 else -1) for d in range(20)],
        "doc_id bigint, y int",
    )
    h1 = classifier.perceptron_train(feats, labels, rounds=3)
    h2 = classifier.perceptron_train(feats, labels, rounds=3)
    assert h1 == h2  # bit-deterministic
    assert h1[0]["n_errors"] == 20  # w0 = 0: every doc errs
    # separable two-word problem converges: last round has no errors
    assert h1[-1]["n_errors"] == 0
    final = h1[-1]["weights"]
    margins = {
        r["doc_id"]: r["margin"]
        for r in classifier.score(feats, final).collect()
    }
    for d in range(20):
        assert (margins[d] > 0) == (d % 2 == 0), (d, margins[d])


def test_avi_frame_decode_and_hash(spark):
    """r13 video content decode: build_avi/decode_avi_frames round-trip
    real uncompressed frames; header probe reads avih; compressed and
    truncated payloads refuse; video_frame_ahash samples on the
    container's own cadence and emits sentinels for undecodables."""
    import struct as _struct

    from geomesa_cassandra_tools_spark.operators import multimodal as mm

    frames = [
        bytes((d * 7 + 3 * x + 5 * y) % 256
              for y in range(16) for x in range(16) for _ in range(3))
        for d in range(4)
    ]
    avi = mm.build_avi(16, 16, 4, frames)
    meta = mm.parse_media_header(avi)
    assert meta == {"mime": "video/x-msvideo", "width": 16, "height": 16,
                    "duration_ms": 1000}
    w, h, uspf, got = mm.decode_avi_frames(avi)
    assert (w, h, uspf) == (16, 16, 250000)
    assert got == frames  # row flip + BGR swap + padding all undone
    # compressed streams refuse loudly (biCompression != 0)
    bad = bytearray(avi)
    i = avi.index(b"strf")
    _struct.pack_into("<I", bad, i + 8 + 16, 1)
    assert mm.decode_avi_frames(bytes(bad)) is None
    # truncated frame refuses
    assert mm.decode_avi_frames(avi[:-10]) is None

    media = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"junk"))],
        "id bigint, payload binary",
    )
    rows = mm.video_frame_ahash(media, ["id"], every_ms=500).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # 500 ms cadence over a 1000 ms 4 fps clip -> frames 0 and 2
    assert sorted(r["frame_idx"] for r in by_id[1]) == [0, 2]
    assert all(r["ahash"] is not None for r in by_id[1])
    assert [(r["frame_idx"], r["frame_ts_ms"], r["ahash"])
            for r in by_id[2]] == [(-1, -1, None)]


def test_multiclass_perceptron_langid_shape(spark):
    """r13 multiclass (one-vs-rest) perceptron: separable three-class
    marker problem converges, ties break to the smallest class name,
    training is deterministic across re-runs."""
    from geomesa_cassandra_tools_spark.functions import classifier

    marker = {"aa": "alpha", "bb": "beta", "cc": "gamma"}
    rows, labs = [], []
    for d in range(30):
        cls = ["aa", "bb", "cc"][d % 3]
        labs.append((d, cls))
        rows.extend((d, marker[cls]) for _ in range(2 + d % 2))
    words = spark.createDataFrame(rows, "doc_id bigint, word string")
    feats = classifier.hashed_features(words)
    labels = spark.createDataFrame(labs, "doc_id bigint, cls string")
    classes = ["aa", "bb", "cc"]
    h1 = classifier.multiclass_perceptron_train(
        spark, feats, labels, classes, rounds=3
    )
    h2 = classifier.multiclass_perceptron_train(
        spark, feats, labels, classes, rounds=3
    )
    assert h1 == h2
    # round 1 cold start: all margins 0 -> everyone predicts 'aa';
    # exactly the 20 non-aa docs err
    assert h1[0]["n_errors"] == 20
    assert h1[-1]["n_errors"] == 0  # separable -> converges
    pred = {
        r["doc_id"]: r["pred"]
        for r in classifier.multiclass_score(
            spark, feats, h1[-1]["weights"], classes
        ).collect()
    }
    for d, cls in labs:
        assert pred[d] == cls, (d, cls, pred[d])


def test_perplexity_filter_semantics(spark):
    """Hand-computed add-1 bigram LM: train 'a b a b c' gives
    c(a,b)=2, c(b,a)=1, c(b,c)=1, ctx(a)=ctx(b)=2, V=3. Doc 'a b c'
    averages -ln(3/5), -ln(2/5) in micro-nats; an all-unseen doc backs
    off to the uniform 1/V; single-token docs are excluded; the kept
    flag is an integer threshold comparison."""
    import math

    from geomesa_cassandra_tools_spark.functions import lm

    train = spark.createDataFrame(
        [(100, "a b a b c")], "doc_id bigint, text string"
    )
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "z z z"), (3, "only")],
        "doc_id bigint, text string",
    )
    exp_1 = (
        round(-math.log(3 / 5) * 1e6) + round(-math.log(2 / 5) * 1e6)
    ) // 2
    exp_2 = round(-math.log(1 / 3) * 1e6)  # both bigrams unseen: 1/V
    out = {
        r["doc_id"]: r.asDict()
        for r in lm.perplexity_filter(docs, train, 1_000_000).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 2 and out[1]["avg_nll_micro"] == exp_1
    assert out[2]["n_bigrams"] == 2 and out[2]["avg_nll_micro"] == exp_2
    assert out[1]["kept"] == 1 and out[2]["kept"] == 0


def test_connected_components_small_graph_matches_distributed(spark):
    """r14: the bounded driver union-find (small-graph shortcut) must
    produce exactly the distributed min-label loop's (node, cluster_id)
    rows — chains (pointer-jump territory), disjoint components,
    singleton-free pairs, and the min-id representative rule."""
    pairs = spark.createDataFrame(
        [(5, 6), (2, 3), (3, 4), (4, 9), (11, 10), (7, 8), (8, 5)],
        "doc_a bigint, doc_b bigint",
    )
    small = {
        (r["node"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["cluster_id"])
        for r in dedup.connected_components(
            pairs, small_graph_edges=0
        ).collect()
    }
    assert small == dist
    assert (9, 2) in small and (6, 5) in small and (11, 10) in small
