"""The manifestfeed streaming SOURCE battery: manifest tables consumed
incrementally via ``spark.readStream`` (sources/manifestfeed.py) — the
read-side twin of the exactly-once manifest sink. Covers the full-drain
identity, checkpointed incremental resume, replay stability, the three
``onDelete`` policies against delete / rewrite commits, startingVersion
(numeric and "latest"), schema pinned across a merge_schema evolution in
both directions, timestamp round-trip, and the vacuum-horizon
diagnostics."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.operators import transactional as tx
from geomesa_cassandra_tools_spark.sources import manifestfeed as mf


def _mk(spark, rows, ddl="k bigint, s string"):
    return spark.createDataFrame(rows, ddl)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "feed_table")
    tx.init_table(_mk(spark, [(1, "a"), (2, "b")]), path)
    tx.append_batch(_mk(spark, [(3, "c")]), path)
    tx.append_batch(_mk(spark, [(4, "d"), (5, "e")]), path)
    return path


def _drain(spark, path, ckpt, out, **feed_kw):
    q = (
        mf.stream_feed(spark, path, **feed_kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "feed drain timed out"
    from pyspark.errors import AnalysisException

    try:
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())
    except AnalysisException:
        return []  # nothing emitted yet -> sink dir has no parquet files


def test_feed_full_drain_equals_table(spark, tmp_path, table):
    got = _drain(spark, table, str(tmp_path / "c"), str(tmp_path / "o"))
    want = sorted(tuple(r) for r in tx.read_table(spark, table).collect())
    assert got == want == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]


def test_feed_schema_comes_from_manifest(spark, table):
    feed = mf.stream_feed(spark, table)
    assert feed.schema.simpleString() == "struct<k:bigint,s:string>"


def test_feed_incremental_resume_and_replay_stability(spark, tmp_path, table):
    ckpt, out = str(tmp_path / "c"), str(tmp_path / "o")
    first = _drain(spark, table, ckpt, out)
    assert len(first) == 5
    tx.append_batch(_mk(spark, [(6, "f")]), table)
    second = _drain(spark, table, ckpt, out)
    assert sorted(second) == sorted(first + [(6, "f")])
    # no new commits -> a third drain must be a no-op, not a re-emit
    third = _drain(spark, table, ckpt, out)
    assert third == second


def test_feed_starting_version(spark, tmp_path, table):
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        starting_version=2,
    )
    assert got == [(4, "d"), (5, "e")]


def test_feed_starting_latest_sees_only_new_commits(spark, tmp_path, table):
    # "latest" anchors at query START (Delta semantics): the first drain
    # subscribes and emits nothing; commits after that checkpoint stream.
    ckpt, out = str(tmp_path / "c"), str(tmp_path / "o")
    first = _drain(spark, table, ckpt, out, starting_version="latest")
    assert first == []
    tx.append_batch(_mk(spark, [(9, "z")]), table)
    second = _drain(spark, table, ckpt, out, starting_version="latest")
    assert second == [(9, "z")]


def test_feed_on_delete_fail_names_the_commit(spark, tmp_path, table):
    tx.delete_where(spark, table, "k = 1")
    with pytest.raises(Exception, match="onDelete"):
        _drain(spark, table, str(tmp_path / "c"), str(tmp_path / "o"))


def test_feed_on_delete_ignore_skips_delete_only(spark, tmp_path, table):
    # TRUNCATE is the remove-only commit shape (delete_where stages
    # survivor files, so even a whole-file delete is a rewrite commit)
    tx.truncate_table(table)
    tx.append_batch(_mk(spark, [(8, "h")]), table)
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        on_delete="ignore",
    )
    # every commit's ADDS stream; the truncate contributes nothing —
    # the documented trade of ignore (downstream keeps pre-truncate rows)
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (8, "h")]


def test_feed_on_delete_ignore_refuses_rewrites(spark, tmp_path, table):
    tx.compact_table(spark, table, target_bytes=256 << 20)
    with pytest.raises(Exception, match="REWROTE|additive"):
        _drain(
            spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
            on_delete="ignore",
        )


def test_feed_on_delete_additive_streams_rewrites(spark, tmp_path, table):
    tx.compact_table(spark, table, target_bytes=256 << 20)
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        on_delete="additive",
    )
    # documented ignoreChanges semantics: the compaction re-emits every
    # carried row, so each of the 5 rows appears exactly twice
    want = sorted([(k, s) for k, s in
                   [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]] * 2)
    assert got == want


def test_feed_schema_pinned_across_evolution(spark, tmp_path, table):
    # stream DEFINED pre-evolution: new files project through the old
    # schema (extra column dropped)
    feed_old = mf.stream_feed(spark, table)
    tx.append_batch(
        _mk(spark, [(7, "g", 70)], "k bigint, s string, extra bigint"),
        table, merge_schema=True,
    )
    q = (
        feed_old.writeStream.format("parquet")
        .option("path", str(tmp_path / "o1"))
        .option("checkpointLocation", str(tmp_path / "c1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    old_view = spark.read.parquet(str(tmp_path / "o1"))
    assert old_view.columns == ["k", "s"]
    assert (7, "g") in {tuple(r) for r in old_view.collect()}

    # stream DEFINED post-evolution: old files null-backfill the new column
    got = _drain(spark, table, str(tmp_path / "c2"), str(tmp_path / "o2"))
    by_k = {r[0]: r for r in got}
    assert by_k[7] == (7, "g", 70)
    assert by_k[1] == (1, "a", None)


def test_feed_timestamp_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ts_table")
    t0 = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    tx.init_table(
        spark.createDataFrame([(1, t0)], "k bigint, ts timestamp_ntz"), path
    )
    tx.append_batch(
        spark.createDataFrame(
            [(2, t0 + datetime.timedelta(hours=1))], "k bigint, ts timestamp_ntz"
        ),
        path,
    )
    got = _drain(spark, path, str(tmp_path / "c"), str(tmp_path / "o"))
    assert got == sorted(tuple(r) for r in tx.read_table(spark, path).collect())
    assert got[0][1] == t0


def test_feed_below_vacuum_horizon_is_named(spark, tmp_path, table):
    tx.delete_where(spark, table, "k = 3")
    tx.vacuum(table, keep_versions=1, grace_seconds=0)
    with pytest.raises(Exception, match="vacuum|retention"):
        _drain(
            spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
            on_delete="additive",
        )


def test_feed_requires_existing_table(spark, tmp_path):
    with pytest.raises(Exception, match="manifest"):
        mf.stream_feed(spark, str(tmp_path / "nope"))


def test_feed_chains_into_manifest_sink(spark, tmp_path, table):
    """Bronze -> silver multi-hop: the feed source drains into the
    exactly-once manifest SINK, and the downstream table converges to the
    upstream's live rows (append-only upstream)."""
    from geomesa_cassandra_tools_spark.streaming import sinks

    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "c")
    sinks.stream_to_manifest(
        mf.stream_feed(spark, table).withColumn("s2", F.upper("s")),
        silver, query_name="feed_hop", checkpoint=ckpt,
    )
    tx.append_batch(_mk(spark, [(6, "f")]), table)
    sinks.stream_to_manifest(
        mf.stream_feed(spark, table).withColumn("s2", F.upper("s")),
        silver, query_name="feed_hop", checkpoint=ckpt,
    )
    got = sorted(tuple(r) for r in tx.read_table(spark, silver).collect())
    assert got == [
        (1, "a", "A"), (2, "b", "B"), (3, "c", "C"),
        (4, "d", "D"), (5, "e", "E"), (6, "f", "F"),
    ]


def test_feed_cdf_images_fold_to_final_state(spark, tmp_path, table):
    """CDF mode streams delete/merge/compact commits as file-level change
    images; folding (+1 insert / -1 delete) per row must land exactly on
    the final snapshot — same net as the batch table_changes feed."""
    tx.delete_where(spark, table, "k = 2")
    tx.merge_upsert(
        spark, table, _mk(spark, [(3, "c2"), (9, "i")]), key_cols=["k"]
    )
    tx.compact_table(spark, table, target_bytes=256 << 20)

    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"), feed="cdf"
    )
    from collections import Counter

    net: Counter = Counter()
    for k, s, change, _v in got:
        net[(k, s)] += 1 if change == "insert" else -1
    assert all(v in (0, 1) for v in net.values())
    folded = sorted(key for key, v in net.items() if v == 1)
    final = sorted(tuple(r) for r in tx.read_table(spark, table).collect())
    assert folded == final
    # a pure compaction's images cancel COMPLETELY
    last = tx.current_version(table)
    compact_rows = [r for r in got if r[3] == last]
    cnet: Counter = Counter()
    for k, s, change, _v in compact_rows:
        cnet[(k, s)] += 1 if change == "insert" else -1
    assert compact_rows and all(v == 0 for v in cnet.values())


def test_feed_cdf_append_only_is_all_inserts(spark, tmp_path, table):
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"), feed="cdf"
    )
    assert {r[2] for r in got} == {"insert"}
    assert sorted((r[0], r[1]) for r in got) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")
    ]
    # commit attribution: k=3 arrived in commit 1, (4,5) in commit 2
    by_version = {(r[0], r[1]): r[3] for r in got}
    assert by_version[(3, "c")] == 1
    assert by_version[(4, "d")] == by_version[(5, "e")] == 2


def test_feed_cdf_incremental_resume(spark, tmp_path, table):
    ckpt, out = str(tmp_path / "c"), str(tmp_path / "o")
    first = _drain(spark, table, ckpt, out, feed="cdf")
    assert len(first) == 5
    tx.delete_where(spark, table, "k = 1")
    second = _drain(spark, table, ckpt, out, feed="cdf")
    fresh = [r for r in second if r not in first or second.count(r) > first.count(r)]
    # the delete commit rewrote the (1,2) file: images are 1 delete-file
    # worth of rows (both) + the survivor rewrite (just 2)
    new_rows = sorted(second)
    for r in sorted(first):
        new_rows.remove(r)
    assert ((1, "a", "delete") in {(k, s, c) for k, s, c, _ in new_rows})
    net = {}
    for k, s, c, _ in new_rows:
        net[(k, s)] = net.get((k, s), 0) + (1 if c == "insert" else -1)
    # layout-agnostic: the only NET change is the deleted row; any row the
    # rewrite carried (file-layout dependent) must cancel exactly
    assert {kv: v for kv, v in net.items() if v != 0} == {(1, "a"): -1}


def test_feed_append_mode_fails_on_dv_commit(spark, tmp_path, table):
    tx.delete_where(spark, table, "k = 3", mode="dv")
    with pytest.raises(Exception, match="vectored|onDelete"):
        _drain(spark, table, str(tmp_path / "c"), str(tmp_path / "o"))


def test_feed_cdf_dv_delta_images(spark, tmp_path, table):
    """Two cumulative vector commits stream as POSITION-DELTA deletes —
    each row deleted exactly once, and a later rewrite of the vectored
    file doesn't re-delete the masked rows."""
    tx.delete_where(spark, table, "k in (2, 4)", mode="dv")
    tx.delete_where(spark, table, "k in (4, 5)", mode="dv")  # overlap
    tx.compact_table(spark, table, target_bytes=256 << 20)  # materialize
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"), feed="cdf"
    )
    from collections import Counter

    net: Counter = Counter()
    dv_deletes = []
    for k, s, change, v in got:
        net[(k, s)] += 1 if change == "insert" else -1
        if change == "delete" and v in (3, 4):
            dv_deletes.append((k, v))
    assert sorted(dv_deletes) == [(2, 3), (4, 3), (5, 4)]
    folded = sorted(kv for kv, n in net.items() if n == 1)
    assert all(n in (0, 1) for n in net.values()), net
    final = sorted(tuple(r) for r in tx.read_table(spark, table).collect())
    assert folded == final == [(1, "a"), (3, "c")]


def test_feed_cdf_restore_emits_resurrect_inserts(spark, tmp_path, table):
    """A RESTORE below a dv commit un-deletes the masked rows; the CDF
    feed must stream those as INSERT images (the swapped position
    delta), and the full fold must land on the restored state."""
    tx.delete_where(spark, table, "k in (2, 4)", mode="dv")
    tx.restore_table(table, tx.current_version(table) - 1)
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"), feed="cdf"
    )
    from collections import Counter

    last = tx.current_version(table)
    restore_rows = sorted(
        (k, c) for k, s, c, v in got if v == last
    )
    assert restore_rows == [(2, "insert"), (4, "insert")]
    net: Counter = Counter()
    for k, s, c, _v in got:
        net[(k, s)] += 1 if c == "insert" else -1
    folded = sorted(kv for kv, n in net.items() if n == 1)
    final = sorted(tuple(r) for r in tx.read_table(spark, table).collect())
    assert folded == final
    assert len(final) == 5  # everything back


def test_feed_cdf_vacuumed_prev_manifest_is_named(spark, tmp_path, table):
    """CDF planning resolves v-1's dv map; when that manifest is below the
    retention horizon the stream fails with the named retention message,
    never a bare FileNotFoundError."""
    import os

    tx.delete_where(spark, table, "k = 3", mode="dv")  # v3: set_dv commit
    os.remove(os.path.join(tx._manifest_dir(table), "v0.json"))
    with pytest.raises(Exception, match="retention|vacuum"):
        _drain(
            spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
            feed="cdf", starting_version=3,
        )


# ---------------------------------------------------------------------------
# Admission control: maxFilesPerTrigger / maxBytesPerTrigger (r8)
# ---------------------------------------------------------------------------


def _drain_capped(spark, path, ckpt, out, max_runs=10, **feed_kw):
    """availableNow + a capped feed consumes ONE bounded batch per run
    (Python sources have no AvailableNow support; the fallback fixes its
    target at start) — re-run until no new batch is planned. Returns
    (rows, number of batches)."""
    import os as _os

    from pyspark.errors import AnalysisException

    def batches():
        d = _os.path.join(ckpt, "offsets")
        return (
            len([f for f in _os.listdir(d) if not f.startswith(".")])
            if _os.path.isdir(d)
            else 0
        )

    for _ in range(max_runs):
        before = batches()
        q = (
            mf.stream_feed(spark, path, **feed_kw)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "capped drain run timed out"
        if batches() == before:
            break
    try:
        rows = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    except AnalysisException:
        rows = []
    return rows, batches()


def test_feed_capped_backlog_drains_in_bounded_batches(spark, tmp_path, table):
    """A 3-commit backlog (4 files) under maxFilesPerTrigger=2 drains in
    >1 batches with the same final rows as the uncapped drain — and every
    run is a fresh reader, so the position handshake across restarts is
    exercised on each hop."""
    got, n_batches = _drain_capped(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        max_files_per_trigger=2,
    )
    want = sorted(tuple(r) for r in tx.read_table(spark, table).collect())
    assert got == want
    assert n_batches >= 2  # not one unbounded batch


def test_feed_capped_single_oversized_commit_still_flows(spark, tmp_path):
    path = str(tmp_path / "big")
    tx.init_table(
        _mk(spark, [(i, f"s{i}") for i in range(8)]).repartition(4), path
    )
    got, n_batches = _drain_capped(
        spark, path, str(tmp_path / "c"), str(tmp_path / "o"),
        max_files_per_trigger=1,
    )
    assert len(got) == 8  # the 4-file commit exceeded the cap but flowed
    assert n_batches == 1


def test_feed_capped_bytes(spark, tmp_path, table):
    got, n_batches = _drain_capped(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        max_bytes_per_trigger=1,  # every commit exceeds it -> 1 commit/batch
    )
    want = sorted(tuple(r) for r in tx.read_table(spark, table).collect())
    assert got == want
    assert n_batches == 3  # one per commit


def test_feed_capped_cdf_matches_uncapped(spark, tmp_path, table):
    tx.delete_where(spark, table, "k = 3", mode="dv")
    capped, n_capped = _drain_capped(
        spark, table, str(tmp_path / "cc"), str(tmp_path / "oc"),
        feed="cdf", max_files_per_trigger=1,
    )
    uncapped, n_uncapped = _drain_capped(
        spark, table, str(tmp_path / "cu"), str(tmp_path / "ou"),
        feed="cdf",
    )
    assert capped == uncapped
    assert n_capped > n_uncapped == 1


def test_feed_cap_option_validated(spark, table):
    ds = mf.ManifestFeedDataSource(
        options={"path": table, "maxFilesPerTrigger": "0"}
    )
    with pytest.raises(ValueError, match="positive"):
        ds.streamReader(ds.schema())


def test_feed_capped_continuous_trigger_single_query(spark, tmp_path, table):
    """Under a processingTime trigger ONE query drains the whole backlog
    in capped batches (no restarts involved) — the in-flight position
    tracking, not just the restart handshake."""
    import time

    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        mf.stream_feed(spark, table, max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        want = sorted(tuple(r) for r in tx.read_table(spark, table).collect())
        got = []
        while time.time() < deadline:
            from pyspark.errors import AnalysisException

            try:
                got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
            except AnalysisException:
                got = []
            if got == want:
                break
            time.sleep(1)
        assert got == want
    finally:
        q.stop()
    n_batches = len(
        [f for f in os.listdir(os.path.join(ckpt, "offsets")) if not f.startswith(".")]
    )
    assert n_batches >= 3  # 3 commits, 1 file each, cap=1 -> >=3 batches


# ---------------------------------------------------------------------------
# apply_cdf_to_manifest: the APPLY CHANGES INTO consumer (r8)
# ---------------------------------------------------------------------------


def _apply(spark, bronze, silver, name, **kw):
    from geomesa_cassandra_tools_spark.streaming import sinks

    feed = mf.stream_feed(spark, bronze, feed="cdf")
    return sinks.apply_cdf_to_manifest(
        feed, silver, ["k"], name, timeout_sec=180, **kw
    )


def _rows(spark, path):
    return sorted(tuple(r) for r in tx.read_table(spark, path).collect())


def test_cdf_apply_converges_and_resumes(spark, tmp_path):
    bronze = str(tmp_path / "b")
    silver = str(tmp_path / "s")
    tx.init_table(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]), bronze)
    _apply(spark, bronze, silver, "t1")
    assert _rows(spark, silver) == _rows(spark, bronze)
    # more lifecycle: update via merge (rewrite pairs), dv delete, append
    tx.merge_upsert(spark, bronze, _mk(spark, [(2, "B"), (9, "z")]), ["k"])
    tx.delete_where(spark, bronze, "k = 1", mode="dv")
    tx.append_batch(_mk(spark, [(7, "g")]), bronze)
    # incremental resume on the same checkpoint: only new commits apply
    _apply(spark, bronze, silver, "t1")
    assert _rows(spark, silver) == _rows(spark, bronze) == [
        (2, "B"), (3, "c"), (7, "g"), (9, "z"),
    ]
    # caught-up re-drain is a no-op (exactly-once under replays)
    v = tx.current_version(silver)
    assert _apply(spark, bronze, silver, "t1") == 0
    assert tx.current_version(silver) == v


def test_cdf_apply_delete_then_reinsert_across_commits(spark, tmp_path):
    bronze = str(tmp_path / "b")
    silver = str(tmp_path / "s")
    tx.init_table(_mk(spark, [(1, "a"), (2, "b")]), bronze)
    tx.delete_where(spark, bronze, "k = 1", mode="dv")
    tx.append_batch(_mk(spark, [(1, "a2")]), bronze)  # resurrect with new value
    _apply(spark, bronze, silver, "t2")
    # latest image per key wins even when one batch spans all commits
    assert _rows(spark, silver) == [(1, "a2"), (2, "b")]


def test_cdf_apply_restore_resurrects_rows(spark, tmp_path):
    bronze = str(tmp_path / "b")
    silver = str(tmp_path / "s")
    tx.init_table(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]), bronze)
    tx.delete_where(spark, bronze, "k <= 2", mode="dv")  # v1
    _apply(spark, bronze, silver, "t3")
    assert _rows(spark, silver) == [(3, "c")]
    tx.restore_table(bronze, 0)  # un-deletes via unset_dv
    _apply(spark, bronze, silver, "t3")
    assert _rows(spark, silver) == [(1, "a"), (2, "b"), (3, "c")]


def test_cdf_apply_capped_feed_same_result(spark, tmp_path):
    """Admission control composes with the apply consumer: a capped feed
    applies the same commits over more batches, same final table."""
    from geomesa_cassandra_tools_spark.streaming import sinks

    bronze = str(tmp_path / "b")
    tx.init_table(_mk(spark, [(1, "a")]), bronze)
    tx.append_batch(_mk(spark, [(2, "b")]), bronze)
    tx.merge_upsert(spark, bronze, _mk(spark, [(1, "A"), (4, "d")]), ["k"])
    tx.delete_where(spark, bronze, "k = 2", mode="dv")
    uncapped = str(tmp_path / "s1")
    _apply(spark, bronze, uncapped, "t4")
    capped = str(tmp_path / "s2")
    for _ in range(8):  # availableNow + cap = one bounded batch per run
        feed = mf.stream_feed(
            spark, bronze, feed="cdf", max_files_per_trigger=1
        )
        sinks.apply_cdf_to_manifest(feed, capped, ["k"], "t4c", timeout_sec=180)
    assert _rows(spark, capped) == _rows(spark, uncapped) == [(1, "A"), (4, "d")]


def test_feed_pq_encode_on_ingest(spark, tmp_path):
    """Encode-on-ingest: the PQ codes index rides the streaming feed —
    new embedding batches stream out of the bronze manifest table,
    encode via the BLAS kernel (stateless mapInPandas composes with the
    streaming frame), and land exactly-once in the codes table. The
    stored index equals a batch full-encode after every hop."""
    from geomesa_cassandra_tools_spark.operators import similarity
    from geomesa_cassandra_tools_spark.streaming import sinks

    cb = similarity.pq_codebooks(8, 2, 4, seed=5)
    bronze = str(tmp_path / "emb")
    codes_path = str(tmp_path / "codes")

    def emb_df(lo, hi):
        return spark.createDataFrame(
            [(i, [((i * 7 + j * 3) % 11) / 5.0 - 1.0 for j in range(8)])
             for i in range(lo, hi)],
            "vec_id bigint, embedding array<double>",
        )

    tx.init_table(emb_df(0, 10), bronze)

    def hop():
        feed = mf.stream_feed(spark, bronze)
        codes = similarity.pq_encode_blas(feed, cb)
        sinks.stream_to_manifest(
            codes, codes_path, "pq_ingest",
            checkpoint=str(tmp_path / "ck"), timeout_sec=180,
        )

    hop()
    tx.append_batch(emb_df(10, 16), bronze)
    hop()  # incremental: only the new commit's files encode
    got = {r["vec_id"]: list(r["codes"])
           for r in tx.read_table(spark, codes_path).collect()}
    want = {r["vec_id"]: list(r["codes"])
            for r in similarity.pq_encode(emb_df(0, 16), cb).collect()}
    assert got == want


def test_cdf_apply_rejects_duplicate_key_inserts(spark, tmp_path):
    """A non-key-unique upstream commit has no well-defined final image
    per key — the apply must reject loudly, not pick arbitrarily."""
    from geomesa_cassandra_tools_spark.streaming import sinks

    bronze = str(tmp_path / "b")
    tx.init_table(_mk(spark, [(1, "a"), (1, "A"), (2, "b")]), bronze)
    feed = mf.stream_feed(spark, bronze, feed="cdf")
    with pytest.raises(Exception, match="duplicate insert images|key-unique"):
        sinks.apply_cdf_to_manifest(
            feed, str(tmp_path / "s"), ["k"], "tdup", timeout_sec=180
        )


def test_feed_starting_timestamp(spark, tmp_path, table):
    """startingTimestamp (Delta semantics): commits strictly AFTER the
    instant stream; a pre-table instant streams everything."""
    import time as _time

    _time.sleep(0.05)
    t_mid = _time.time()
    _time.sleep(0.05)
    tx.append_batch(_mk(spark, [(9, "z")]), table)
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        starting_timestamp=t_mid,
    )
    assert got == [(9, "z")]
    got_all = _drain(
        spark, table, str(tmp_path / "c2"), str(tmp_path / "o2"),
        starting_timestamp=1.0,
    )
    assert len(got_all) == 6  # pre-table instant -> the whole history


def test_feed_ending_version_available_now_contract(spark, tmp_path, table):
    """endingVersion (r8 VERDICT #6 — Delta Trigger.AvailableNow's
    contract): the drain target pins at query start; commits landing
    after the pin are NOT consumed; the drain terminates at the pin;
    a later run on the same checkpoint picks up the rest exactly once;
    composes with the admission caps."""
    ckpt, out = str(tmp_path / "c"), str(tmp_path / "o")
    pin = tx.current_version(table)

    # reader-level: the pin caps latestOffset even as commits land
    import geomesa_cassandra_tools_spark.sources.manifestfeed as mfm

    reader = mfm.ManifestFeedStreamReader(
        tx.read_table(spark, table).schema,
        {"path": table, "endingVersion": "latest"},
    )
    tx.append_batch(_mk(spark, [(50, "later")]), table)  # lands AFTER pin
    assert reader.latestOffset() == {"version": pin}

    # query-level: drain stops at the pin — the during-drain commit
    # stays unconsumed on this checkpoint run
    got = _drain(
        spark, table, ckpt, out, ending_version=pin,
    )
    assert (50, "later") not in got and len(got) == 5

    # exactly-once across runs: the next pinned drain on the SAME
    # checkpoint consumes only the newer commit
    got2 = _drain(spark, table, ckpt, out, ending_version="latest")
    assert sorted(got2) == sorted(got + [(50, "later")])

    # composes with caps: capped re-run loop terminates at the pin even
    # as yet another commit lands between runs
    pin2 = tx.current_version(table)
    ck2, out2 = str(tmp_path / "c2"), str(tmp_path / "o2")
    rows, batches = _drain_capped(
        spark, table, ck2, out2, max_files_per_trigger=1,
        ending_version=pin2,
    )
    tx.append_batch(_mk(spark, [(60, "even later")]), table)
    rows2, _ = _drain_capped(
        spark, table, ck2, out2, max_files_per_trigger=1,
        ending_version=pin2,
    )
    assert (60, "even later") not in rows2
    assert sorted(rows2) == sorted(got2)


def test_feed_where_prunes_files_before_planning(spark, tmp_path):
    """where= on the feed (tier-1 pruning inside the stream): only files
    whose recorded span can match become scan tasks; missing stats keep
    the file; CDF + where refused; rows are the SUPERSET contract."""
    import datetime as _dt

    import geomesa_cassandra_tools_spark.sources.manifestfeed as mfm

    path = str(tmp_path / "pt")
    rows = [
        (i, _dt.date(2024, 1, 1 + (i % 3)), float(i)) for i in range(30)
    ]
    tx.init_table(
        spark.createDataFrame(rows, "id bigint, d date, v double")
        .repartition(3, "d"),
        path, partition_by=["d"],
    )
    day = _dt.date(2024, 1, 2)
    schema = tx.read_table(spark, path).schema

    reader = mfm.ManifestFeedStreamReader(
        schema,
        {"path": path, "where": mfm._encode_where([("d", "=", day)])},
    )
    slices = reader.partitions({"version": -1}, {"version": 0})
    all_slices = mfm.ManifestFeedStreamReader(
        schema, {"path": path}
    ).partitions({"version": -1}, {"version": 0})
    assert 0 < len(slices) < len(all_slices)
    assert all("d=2024-01-02" in s.file_path for s in slices)

    # CDF + where on a column with NO partition tier, NO generated
    # derivation and NO declared stats is refused loudly (r11: stats-
    # column CDF pruning is allowed — span-safe; this table declares
    # no stats_cols, so 'v' has no spans and pruning could never act)
    with pytest.raises(ValueError, match="none of these"):
        mfm.ManifestFeedStreamReader(
            schema,
            {"path": path, "feed": "cdf",
             "where": mfm._encode_where([("v", ">", 3.0)])},
        )

    # end-to-end: drained rows == exactly the matching day (each file
    # holds one day here, so the superset IS the exact set)
    got = _drain(
        spark, path, str(tmp_path / "c"), str(tmp_path / "o"),
        where=[("d", "=", day)],
    )
    assert sorted(r[0] for r in got) == [i for i in range(30) if i % 3 == 1]


def test_feed_starting_timestamp_boundary_is_inclusive(spark, tmp_path, table):
    """r8-ADVICE regression: Delta's startingTimestamp is INCLUSIVE —
    'changes committed at or after the timestamp'. A commit stamped
    EXACTLY at the given instant must stream."""
    v = tx.append_batch(_mk(spark, [(9, "z")]), table)
    exact_ts = tx._read_json(table, f"v{v}.json")["ts"]
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        starting_timestamp=exact_ts,
    )
    assert got == [(9, "z")]


def test_feed_where_encoding_roundtrip():
    """Tagged-JSON predicate transport: temporal literals survive the
    option string for every op shape, incl. nested 'ranges' pairs."""
    import datetime

    import geomesa_cassandra_tools_spark.sources.manifestfeed as mfm

    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 5)
    ts = datetime.datetime(2024, 1, 3, 12, 0)
    w = [
        ("d", "ranges", [(d1, d2), (d2, d2)]),
        ("ts", "between", (ts, ts)),
        ("k", "in", [1, 2]),
        ("s", "=", "x"),
        ("d", "<=", d2),
    ]
    assert mfm._decode_where(mfm._encode_where(w)) == w


def test_feed_streams_across_layout_replacement(spark, tmp_path, table):
    """Partition evolution does not strand a subscriber: a re-layout is
    a rewrite commit, so the default onDelete='fail' consumer refuses
    loudly, and an onDelete='additive' consumer streams across the
    boundary (the rewrite's adds re-emit — the documented additive
    trade) and keeps receiving post-boundary appends."""
    tx.replace_table_layout(spark, table, ["s"])
    with pytest.raises(Exception, match="REWROTE|additive"):
        _drain(spark, table, str(tmp_path / "cf"), str(tmp_path / "of"))
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        on_delete="additive",
    )
    base = [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
    assert sorted(set(got)) == base  # pre-boundary + re-emitted adds
    tx.append_batch(_mk(spark, [(6, "f")]), table)
    got = _drain(
        spark, table, str(tmp_path / "c"), str(tmp_path / "o"),
        on_delete="additive",
    )
    assert (6, "f") in got  # the SAME checkpoint keeps consuming


def test_feed_cdf_partition_scoped_subscription(spark, tmp_path):
    """Partition-scoped CDF feed (r9 VERDICT #4): a per-tenant
    subscriber (where= on the partition column) sees exactly that
    tenant's change images across append / upsert / dv-delete / restore
    — delete/insert pairs prune TOGETHER (exact [v,v] partition spans),
    the fold lands on the tenant's final snapshot, and file-level
    pruning is observable in the planned slices."""
    import geomesa_cassandra_tools_spark.sources.manifestfeed as mfm

    path = str(tmp_path / "t")
    ddl = "id bigint, tenant string, v double"
    tx.init_table(
        spark.createDataFrame(
            [(1, "ta", 1.0), (2, "tb", 2.0), (3, "ta", 3.0)], ddl
        ),
        path, partition_by=["tenant"],
    )
    tx.append_batch(
        spark.createDataFrame([(4, "ta", 4.0), (5, "tb", 5.0)], ddl), path
    )  # v1
    tx.merge_upsert(
        spark, path,
        spark.createDataFrame([(3, "ta", 33.0), (6, "tb", 6.0)], ddl),
        ["id"],
    )  # v2: rewrite inside ta + insert into tb
    tx.delete_where(spark, path, "id = 1", mode="dv")  # v3: dv in ta
    tx.delete_where(spark, path, "id = 5")  # v4: rewrite in tb
    tx.restore_table(path, 2)  # v5: un-deletes across both tenants

    where = [("tenant", "=", "ta")]
    got = _drain(
        spark, path, str(tmp_path / "c"), str(tmp_path / "o"),
        feed="cdf", where=where,
    )
    # every image the subscriber sees is tenant ta's
    assert got and all(r[1] == "ta" for r in got)
    from collections import Counter

    net: Counter = Counter()
    for id_, tenant, v, change, _cv in got:
        net[(id_, tenant, v)] += 1 if change == "insert" else -1
    folded = sorted(key for key, n in net.items() if n == 1)
    want = sorted(
        tuple(r) for r in tx.read_table(
            spark, path, where=where
        ).collect()
    )
    assert folded == want
    assert all(n in (0, 1) for n in net.values())

    # the pruning is file-level, not post-hoc: fewer planned slices
    schema = mf.stream_feed(spark, path, feed="cdf").schema
    pruned_reader = mfm.ManifestFeedStreamReader(
        schema,
        {"path": path, "feed": "cdf", "where": mfm._encode_where(where)},
    )
    full_reader = mfm.ManifestFeedStreamReader(
        schema, {"path": path, "feed": "cdf"}
    )
    last = tx.current_version(path)
    n_pruned = len(pruned_reader.partitions({"version": -1}, {"version": last}))
    n_full = len(full_reader.partitions({"version": -1}, {"version": last}))
    assert 0 < n_pruned < n_full

    # capped and uncapped drains agree (admission control composes)
    got_capped, n_batches = _drain_capped(
        spark, path, str(tmp_path / "cc"), str(tmp_path / "oc"),
        feed="cdf", where=where, max_files_per_trigger=1,
    )
    assert sorted(got_capped) == sorted(got)
    assert n_batches > 1  # the cap actually split the drain


def test_feed_where_derives_generated_partition_predicates(spark, tmp_path):
    """A ts-range subscription over a to_date(ts)-generated,
    date-partitioned table prunes at the partition tier without naming
    the partition column — append feed AND partition-scoped CDF (the
    derived predicate is partition-column, so image pairs prune
    together); a non-derivable non-partition predicate still refuses
    CDF."""
    import datetime as _dt

    import geomesa_cassandra_tools_spark.sources.manifestfeed as mfm
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    path = str(tmp_path / "gt")
    rows = [
        (i, _dt.datetime(2024, 1, 1 + (i % 3), 9 + (i % 8), 0))
        for i in range(30)
    ]
    tx.init_table(
        spark.createDataFrame(rows, "id bigint, ts timestamp_ntz")
        .repartition(3, F.to_date("ts")),
        path,
        generated={"event_date": "to_date(ts)"},
        partition_by=["event_date"],
    )
    schema = tx.read_table(spark, path).schema
    w = [
        ("ts", ">=", _dt.datetime(2024, 1, 2, 0, 0)),
        ("ts", "<", _dt.datetime(2024, 1, 3, 0, 0)),
    ]
    reader = mfm.ManifestFeedStreamReader(
        schema, {"path": path, "where": mfm._encode_where(w)}
    )
    slices = reader.partitions({"version": -1}, {"version": 0})
    all_slices = mfm.ManifestFeedStreamReader(
        schema, {"path": path}
    ).partitions({"version": -1}, {"version": 0})
    assert 0 < len(slices) < len(all_slices)
    assert all("event_date=2024-01-02" in s.file_path for s in slices)

    # CDF mode: the ts predicate DERIVES a partition predicate -> legal,
    # and the prune set is the derived (partition) predicate only
    cdf_reader = mfm.ManifestFeedStreamReader(
        StructType(
            [*schema.fields,
             StructField("_change_type", StringType()),
             StructField("_commit_version", LongType())]
        ),
        {"path": path, "feed": "cdf", "where": mfm._encode_where(w)},
    )
    cdf_slices = cdf_reader.partitions({"version": -1}, {"version": 0})
    assert 0 < len(cdf_slices) < len(all_slices)
    assert all(
        "event_date=2024-01-02" in s.file_path for s in cdf_slices
    )
    # a non-partition, non-derivable, span-free column still refuses CDF
    with pytest.raises(ValueError, match="none of these"):
        mfm.ManifestFeedStreamReader(
            schema,
            {"path": path, "feed": "cdf",
             "where": mfm._encode_where([("id", ">", 3)])},
        )


def test_feed_rederives_prune_preds_across_overwrite(spark, tmp_path):
    """Derived generated-column prune predicates are NOT immutable for
    the stream's life: an overwrite init_table can redefine the
    generator mid-history. The feed must re-derive per metadata-carrying
    commit — a stale to_date(ts) derivation applied to files written
    under a date_trunc('month', ts) layout would prune (DROP) matching
    files; and symmetrically, a replay of pre-overwrite commits must use
    the OLD definitions, not the latest manifest's."""
    import datetime as _dt

    import geomesa_cassandra_tools_spark.sources.manifestfeed as mfm

    path = str(tmp_path / "ow")
    rows = [
        (i, _dt.datetime(2024, 1, 1 + (i % 3), 9 + (i % 8), 0))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp_ntz")
    # v0: per-day generated partitioning
    tx.init_table(
        df.repartition(3, F.to_date("ts")), path,
        generated={"event_date": "to_date(ts)"},
        partition_by=["event_date"],
    )
    # v1: append under the per-day layout
    tx.append_batch(
        spark.createDataFrame(
            [(100, _dt.datetime(2024, 1, 2, 12, 0))],
            "id bigint, ts timestamp_ntz",
        ),
        path,
    )
    schema = tx.read_table(spark, path).schema
    # v2: OVERWRITE with month-floor generated partitioning — every row
    # now lands in event_date=2024-01-01
    tx.init_table(
        df.repartition(1), path,
        generated={"event_date": "date_trunc('month', ts)"},
        partition_by=["event_date"],
    )
    # v3: append under the month layout (Jan-2 timestamps, month bucket)
    tx.append_batch(
        spark.createDataFrame(
            [(200, _dt.datetime(2024, 1, 2, 15, 0))],
            "id bigint, ts timestamp_ntz",
        ),
        path,
    )
    w = [
        ("ts", ">=", _dt.datetime(2024, 1, 2, 0, 0)),
        ("ts", "<", _dt.datetime(2024, 1, 3, 0, 0)),
    ]
    reader = mfm.ManifestFeedStreamReader(
        schema,
        {"path": path, "where": mfm._encode_where(w),
         "onDelete": "additive"},
    )
    slices = reader.partitions({"version": -1}, {"version": 3})
    by_v = {}
    for s in slices:
        by_v.setdefault(s.commit_version, []).append(s.file_path)
    # pre-overwrite commits prune under the OLD per-day derivation
    assert by_v.get(0) and all(
        "event_date=2024-01-02" in f for f in by_v[0]
    )
    assert by_v.get(1)
    # post-overwrite commits survive under the RE-DERIVED month-floor
    # derivation (a stale per-day derivation would have dropped them:
    # their partition value is 2024-01-01, not 2024-01-02)
    assert by_v.get(2) and all(
        "event_date=2024-01-01" in f for f in by_v[2]
    )
    assert by_v.get(3) and all(
        "event_date=2024-01-01" in f for f in by_v[3]
    )


def test_feed_cdf_stats_column_pruning(spark, tmp_path):
    """r11: the CDF feed admits predicates on DECLARED STATS COLUMNS —
    span pruning never drops a file containing a matching row, so with
    the consumer's row refine the fold over the pruned stream nets
    exactly the batch state; files whose span cannot match never become
    scan tasks."""
    import geomesa_cassandra_tools_spark.sources.manifestfeed as mfm
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    path = str(tmp_path / "sp")
    tx.init_table(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(30)], "id bigint, s string"
        ).repartitionByRange(3, "id"),
        path, stats_cols=["id"],
    )
    # v1: a REWRITE commit (delete+insert images) touching the low range
    tx.delete_where(spark, path, "id % 5 = 1")
    schema = tx.read_table(spark, path).schema
    cdf_schema = StructType(
        [*schema.fields,
         StructField("_change_type", StringType()),
         StructField("_commit_version", LongType())]
    )
    w = [("id", "<", 10)]
    pruned = mfm.ManifestFeedStreamReader(
        cdf_schema,
        {"path": path, "feed": "cdf", "where": mfm._encode_where(w)},
    )
    unpruned = mfm.ManifestFeedStreamReader(
        cdf_schema, {"path": path, "feed": "cdf"}
    )
    slices = pruned.partitions({"version": -1}, {"version": 1})
    all_slices = unpruned.partitions({"version": -1}, {"version": 1})
    assert 0 < len(slices) < len(all_slices)  # pruning actually acted
    # fold the ROW-REFINED pruned stream: net(+insert/-delete) per id
    net = {}
    for sl in slices:
        for batch in pruned.read(sl):
            t = batch.to_pydict()
            for i, ct in zip(t["id"], t["_change_type"]):
                if i < 10:  # the consumer's row refine
                    net[i] = net.get(i, 0) + (1 if ct == "insert" else -1)
    survivors = sorted(i for i, n in net.items() if n == 1)
    assert all(n in (0, 1) for n in net.values())
    expect = sorted(
        r["id"] for r in tx.read_table(
            spark, path, where=w
        ).collect()
    )
    assert survivors == expect == [i for i in range(10) if i % 5 != 1]


def test_feed_and_cdf_over_converted_hive_table(spark, tmp_path):
    """pathPartitionValues (r12): a hive-partitioned directory converted
    in place streams through BOTH feeds with the partition constants
    injected per file from the key=value dir names — the append feed's
    rows carry the column, and the CDF feed's pre-image deletes of a
    post-convert rewrite carry it too."""
    path = str(tmp_path / "hive")
    spark.createDataFrame(
        [(i, f"d{i % 2}", i * 10) for i in range(20)],
        "k bigint, day string, v bigint",
    ).write.partitionBy("day").parquet(path)
    res = tx.convert_to_manifest(spark, path, stats_cols=["k"])
    assert res["partition_by"] == ["day"]

    got = _drain(spark, path, str(tmp_path / "c1"), str(tmp_path / "o1"))
    want = sorted(
        tuple(r) for r in tx.read_table(spark, path).collect()
    )
    # discovery appends the partition column last: (k, v, day)
    assert got == want and all(r[2] in ("d0", "d1") for r in got)

    # post-convert delete rewrites files; CDF images (incl. the
    # pre-image deletes of CONVERTED files) carry the injected column
    tx.delete_where(spark, path, "k >= 15")
    ch = tx.table_changes(spark, path, 1, 1)
    dels = ch.where("_change_type = 'delete'").collect()
    assert dels and all(r["day"] in ("d0", "d1") for r in dels)
    cdf = mf.stream_feed(spark, path, feed="cdf", starting_version=0)
    q = (
        cdf.writeStream.format("parquet")
        .option("path", str(tmp_path / "o2"))
        .option("checkpointLocation", str(tmp_path / "c2"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    rows = spark.read.parquet(str(tmp_path / "o2")).collect()
    assert rows and all(r["day"] in ("d0", "d1") for r in rows)
    # folding the stream nets the live table (constants included)
    from collections import Counter

    fold = Counter()
    for r in rows:
        d = (r["k"], r["day"], r["v"])
        fold[d] += 1 if r["_change_type"] == "insert" else -1
    live = Counter(
        (r["k"], r["day"], r["v"])
        for r in tx.read_table(spark, path).collect()
    )
    assert +fold == live
