"""CommitProtocol battery + multi-writer stress for the manifest layer.

The conflict/durability/exactly-once battery runs against BOTH shipped
protocols (PosixLinkProtocol, ConditionalPutProtocol) — the layer above
the publish primitive must not care which store it sits on. The stress
test races append/delete/vacuum writers on one table and asserts the
optimistic-concurrency invariants: no lost updates, no duplicated rows,
strictly monotonic versions, no orphaned-live files after vacuum.
"""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.operators import transactional as tx

PROTOCOLS = [tx.PosixLinkProtocol(), tx.ConditionalPutProtocol()]
IDS = ["posix-link", "conditional-put"]


@pytest.fixture(params=PROTOCOLS, ids=IDS)
def protocol(request):
    with tx.use_commit_protocol(request.param):
        yield request.param


def test_battery_roundtrip_append_delete_truncate(spark, tmp_path, protocol):
    path = str(tmp_path / "t")
    v0 = tx.init_table(spark.range(10).toDF("id"), path)
    assert v0 == 0
    assert tx.append_batch(spark.range(10, 15).toDF("id"), path) == 1
    assert {r["id"] for r in tx.read_table(spark, path).collect()} == set(range(15))
    stats = tx.delete_where(spark, path, F.col("id") >= 12)
    assert stats["version"] == 2
    assert {r["id"] for r in tx.read_table(spark, path).collect()} == set(range(12))
    v = tx.truncate_table(path)
    assert v == 3 and tx.read_table(spark, path).count() == 0
    removed = tx.vacuum(path, grace_seconds=0)
    assert removed >= 1 and os.listdir(os.path.join(path, "data")) == []


def test_battery_conflict_raises(spark, tmp_path, protocol):
    path = str(tmp_path / "t")
    tx.init_table(spark.range(3), path)
    v = tx.current_version(path)
    tx._commit(path, v + 1, [], "{}")
    with pytest.raises(tx.CommitConflict, match="concurrent commit conflict"):
        tx._commit(path, v + 1, [], "{}")
    # CommitConflict subclasses RuntimeError — existing callers' handlers hold
    assert issubclass(tx.CommitConflict, RuntimeError)


def test_battery_exactly_once_replay(spark, tmp_path, protocol):
    """The idempotent-writer watermark (txn_app/txn_id) under each
    protocol: replays refuse, maintenance commits carry the watermark."""
    path = str(tmp_path / "t")
    batch = spark.range(5).toDF("id")
    assert tx.append_batch(batch, path, txn_app="ing", txn_id=0) == 0
    assert tx.append_batch(batch, path, txn_app="ing", txn_id=0) is None  # replay
    assert tx.append_batch(batch, path, txn_app="ing", txn_id=1) == 1
    tx.delete_where(spark, path, F.col("id") == 0)  # maintenance interleaves
    assert tx.append_batch(batch, path, txn_app="ing", txn_id=1) is None  # carried
    assert tx.read_table(spark, path).count() == 8


def _retrying(fn, max_tries=50):
    for _ in range(max_tries):
        try:
            return fn()
        except tx.CommitConflict:
            time.sleep(0.01)
    raise AssertionError("commit starved: conflict on every retry")


def test_transactional_concurrency(spark, tmp_path):
    """Threads racing append_batch/delete_where/vacuum on ONE table, >=100
    racing commits. Invariants under optimistic concurrency:
    - every acknowledged append's rows are present exactly once until
      explicitly deleted (no lost updates, no duplication);
    - committed versions are unique and strictly monotonic;
    - vacuum during the storm (with grace) never breaks a reader;
    - after a final grace-0 vacuum, data/ holds exactly the live files."""
    path = str(tmp_path / "t")
    tx.init_table(spark.createDataFrame([(-1,)], "id bigint"), path)

    n_threads, n_appends = 4, 30  # 120 racing append commits + deletes
    versions: list[int] = []
    vlock = threading.Lock()
    errors: list[BaseException] = []

    def appender(tid: int):
        try:
            for i in range(n_appends):
                batch = spark.createDataFrame([(tid * 1000 + i,)], "id bigint")
                v = _retrying(lambda: tx.append_batch(batch, path))
                assert v is not None
                with vlock:
                    versions.append(v)
        except BaseException as e:  # surfaced in the main thread
            errors.append(e)

    def vacuumer(stop: threading.Event):
        try:
            while not stop.is_set():
                # generous retention + grace: safe against in-flight
                # commits; the sweep itself must never throw mid-storm
                tx.vacuum(path, keep_versions=10, grace_seconds=600)
                # concurrent snapshot reads stay self-consistent
                df = tx.read_table(spark, path)
                assert df.count() == df.select("id").distinct().count()
                time.sleep(0.05)
        except BaseException as e:
            errors.append(e)

    stop = threading.Event()
    threads = [threading.Thread(target=appender, args=(t,)) for t in range(n_threads)]
    vt = threading.Thread(target=vacuumer, args=(stop,))
    for t in threads:
        t.start()
    vt.start()
    for t in threads:
        t.join(timeout=600)
    stop.set()
    vt.join(timeout=60)
    assert not errors, errors[:3]

    # racing deletes of disjoint ranges, with retry on conflict
    def deleter(lo, hi):
        try:
            _retrying(
                lambda: tx.delete_where(
                    spark, path, (F.col("id") >= lo) & (F.col("id") < hi)
                )
            )
        except BaseException as e:
            errors.append(e)

    d1 = threading.Thread(target=deleter, args=(0, 10))
    d2 = threading.Thread(target=deleter, args=(1000, 1010))
    d1.start(); d2.start(); d1.join(600); d2.join(600)
    assert not errors, errors[:3]

    expected = {-1}
    for tid in range(n_threads):
        for i in range(n_appends):
            expected.add(tid * 1000 + i)
    expected -= set(range(0, 10)) | set(range(1000, 1010))

    rows = [r["id"] for r in tx.read_table(spark, path).collect()]
    assert len(rows) == len(set(rows)), "duplicated rows after racing commits"
    assert set(rows) == expected, "lost or resurrected updates"

    # versions: unique per acknowledged commit, and the final version is
    # at least the count of acknowledged commits (deletes/retries add more)
    assert len(versions) == n_threads * n_appends
    assert len(set(versions)) == len(versions), "two appends share a version"
    assert tx.current_version(path) >= max(versions)

    # final vacuum with no writers: data/ must hold exactly the live files
    tx.vacuum(path, keep_versions=1, grace_seconds=0)
    man = tx._read_manifest(path, tx.current_version(path))
    on_disk = set(os.listdir(os.path.join(path, "data")))
    assert on_disk == set(man["files"]), "orphaned or missing live files"
    assert {r["id"] for r in tx.read_table(spark, path).collect()} == expected


def test_time_travel_reads_pre_delete_snapshot(spark, tmp_path, protocol):
    """read_table(version=) pins an older manifest: after a DELETE the
    latest snapshot shrinks but v0 still serves the original rows; out-of
    -range versions and vacuumed snapshots fail with clear errors."""
    path = str(tmp_path / "tt")
    assert tx.init_table(spark.range(10).toDF("id"), path) == 0
    tx.delete_where(spark, path, "id >= 5")

    assert tx.read_table(spark, path).count() == 5
    v0 = tx.read_table(spark, path, version=0)
    assert sorted(r["id"] for r in v0.collect()) == list(range(10))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="out of range"):
        tx.read_table(spark, path, version=99)

    # vacuum (keep_versions=1, no grace) reclaims v0's manifest and any
    # files only it references -> time travel to v0 must fail loudly with
    # the vacuum explanation, and the latest snapshot still reads fine
    tx.vacuum(path, grace_seconds=0)
    assert tx.read_table(spark, path).count() == 5
    with _pytest.raises(ValueError, match="vacuumed"):
        tx.read_table(spark, path, version=0)
