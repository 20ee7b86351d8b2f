"""Manifest-committed parquet tables: atomic DELETE / TRUNCATE / VACUUM.

The reference's deletes are single atomic CQL statements
(/root/reference/geomesa.py:57-59 `DELETE FROM {catalog} WHERE ...`), and
its removal pipeline truncates physical tables in one wire call. The plain
parquet analogs in `maintenance.py` (filter-and-overwrite, rmtree+rename)
are correct only for a single writer with no concurrent readers: a reader
listing the directory mid-rewrite sees a torn table.

This module closes that gap with the core mechanism every table format
(Delta, Iceberg, Hudi) builds on — an immutable-data-files + versioned
manifest layout with an ATOMIC commit:

- ``<path>/data/``            immutable parquet files, never mutated
- ``<path>/_manifest/vN.json``  snapshot N: the live file list + schema

Readers resolve the highest committed manifest ONCE and read exactly the
files it lists — a concurrent commit cannot tear their snapshot, because
data files are never rewritten in place. Writers stage new files, then
publish the next manifest through a `CommitProtocol` whose one primitive
is atomic create-if-absent: two racing writers cannot both commit version
N — the loser gets `CommitConflict`, exactly Delta's optimistic-
concurrency contract. Two protocols ship: `PosixLinkProtocol` (os.link +
file/dir fsync — local FS, HDFS-like stores) and `ConditionalPutProtocol`
(the S3/GCS conditional-PUT shape, here as a local test double); porting
to a new store implements only that one method.

DELETE rewrites ONLY the files that contain matching rows (located with
one ``input_file_name()`` scan); untouched files carry over into the new
manifest by reference — at 100 TB a targeted delete touches a handful of
files, not the table. The container has no Delta/Iceberg jars (and this
repo takes no third-party deps), so the protocol is implemented directly;
on a cluster with Delta available, `maintenance.remove_schema(fmt=...)`
swaps in transparently. Scale note: at very large file counts the JSON
manifest itself becomes the bottleneck — production formats checkpoint it
to parquet; the commit protocol is unchanged.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import threading
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic concurrency).
    Retry by re-reading the current version and re-applying."""


class CommitProtocol:
    """The one storage primitive the whole layer stands on: atomically
    create ``dirpath/filename`` with ``payload`` IF ABSENT, else raise
    `CommitConflict`. Everything above this line (snapshot isolation,
    file-granular DELETE, idempotent appends, vacuum) is storage-agnostic;
    porting the layer to a new store means implementing exactly this one
    method — the same factoring Delta uses (LogStore) for the same reason."""

    def publish(self, dirpath: str, filename: str, payload: bytes) -> None:
        raise NotImplementedError


class PosixLinkProtocol(CommitProtocol):
    """POSIX filesystems: write a temp file, fsync it, ``os.link`` to the
    final name (link — not rename — because rename silently REPLACES an
    existing target; link fails with EEXIST, which IS the conflict check),
    then fsync the directory so the entry itself is durable. Valid on
    local/ext4/XFS and HDFS-like stores with atomic create; NOT on S3/GCS
    (no link) or NFS (link semantics are implementation-shaky) — use a
    conditional-put protocol there."""

    def publish(self, dirpath: str, filename: str, payload: bytes) -> None:
        tmp = os.path.join(dirpath, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, os.path.join(dirpath, filename))
        except FileExistsError:
            raise CommitConflict(filename) from None
        finally:
            os.unlink(tmp)
        # fsync the DIRECTORY too: the link's content is durable (file
        # fsync above) but the directory entry itself is not until the dir
        # flushes — without this, a crash after an acknowledged commit can
        # lose the manifest while e.g. a streaming checkpoint remembers the
        # batch as done (a permanently dropped batch). Same reason
        # Delta/Iceberg fsync their log directory after the atomic publish.
        dfd = os.open(dirpath, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)


class ConditionalPutProtocol(CommitProtocol):
    """Object-store shape: a single conditional PUT (S3 ``If-None-Match: *``
    / GCS ``ifGenerationMatch=0``), where the STORE serializes the
    exists-check-and-write. This local stand-in reproduces that contract
    with a process-wide mutex playing the store's server-side serialization
    (S3 gives the atomicity; the lock is only the test-double for it) and a
    write-then-rename so readers never observe a half-written manifest.
    The layer's unit battery runs against BOTH protocols — swapping the
    real S3 client in changes only this class."""

    _lock = threading.Lock()

    def publish(self, dirpath: str, filename: str, payload: bytes) -> None:
        dest = os.path.join(dirpath, filename)
        with self._lock:
            if os.path.exists(dest):
                raise CommitConflict(filename)
            tmp = os.path.join(dirpath, f".put-{uuid.uuid4().hex}.json")
            with open(tmp, "wb") as fh:
                fh.write(payload)
            os.rename(tmp, dest)


_PROTOCOL: CommitProtocol = PosixLinkProtocol()


@contextlib.contextmanager
def use_commit_protocol(protocol: CommitProtocol):
    """Scope a different commit protocol (e.g. the conditional-put one)
    over every table commit in the block — protocol choice is per-STORE,
    not per-table, which is why it is module state and not a table param."""
    global _PROTOCOL
    prev = _PROTOCOL
    _PROTOCOL = protocol
    try:
        yield
    finally:
        _PROTOCOL = prev


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifest")


def _data_dir(path: str) -> str:
    return os.path.join(path, "data")


def current_version(path: str) -> int:
    """Highest committed snapshot version, or -1 for no table."""
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return -1
    versions = [
        int(m.group(1)) for f in os.listdir(d) if (m := _MANIFEST_RE.match(f))
    ]
    return max(versions, default=-1)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version}.json")) as fh:
        return json.load(fh)


def _commit(
    path: str,
    version: int,
    files: list[str],
    schema_ddl: str,
    txns: dict[str, int] | None = None,
) -> None:
    """Atomically publish snapshot ``version`` through the active
    `CommitProtocol`. A same-version race loses with `CommitConflict` —
    the optimistic-concurrency conflict, surfaced loudly. ``txns`` is the
    idempotent-writer watermark map (app -> highest applied transaction
    id, the Delta txnAppId/txnVersion pattern); every commit carries it
    forward so maintenance commits never forget an append's watermark."""
    d = _manifest_dir(path)
    os.makedirs(d, exist_ok=True)
    payload = json.dumps(
        {
            "version": version,
            "files": sorted(files),
            "schema": schema_ddl,
            "txns": txns or {},
        }
    ).encode()
    try:
        _PROTOCOL.publish(d, f"v{version}.json", payload)
    except CommitConflict:
        raise CommitConflict(
            f"concurrent commit conflict: version {version} of {path!r} "
            "already committed by another writer"
        ) from None


def _stage_files(df: DataFrame, path: str) -> list[str]:
    """Write ``df`` as new immutable data files; return their names.
    Files land under data/ with a commit-unique prefix, so a failed commit
    leaves only unreferenced files (cleaned by vacuum), never a torn table."""
    token = uuid.uuid4().hex[:12]
    staging = os.path.join(path, f".staging-{token}")
    df.write.mode("overwrite").parquet(staging)
    os.makedirs(_data_dir(path), exist_ok=True)
    names = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            name = f"{token}-{f}"
            os.rename(os.path.join(staging, f), os.path.join(_data_dir(path), name))
            names.append(name)
    # remove staging leftovers (_SUCCESS etc.)
    for f in os.listdir(staging):
        os.unlink(os.path.join(staging, f))
    os.rmdir(staging)
    return names


def init_table(df: DataFrame, path: str) -> int:
    """Create (or overwrite, as a new snapshot) a manifest table from a
    frame. Returns the committed version."""
    prior = current_version(path)
    txns = _read_manifest(path, prior).get("txns", {}) if prior >= 0 else {}
    version = prior + 1
    files = _stage_files(df, path)
    _commit(path, version, files, df.schema.json(), txns)
    return version


def _schema_sig(schema_json: str) -> list[tuple]:
    """(name, type) per field — nullability and metadata excluded, so a
    batch whose optimizer inferred tighter nullability still appends."""
    return [
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in json.loads(schema_json)["fields"]
    ]


def append_batch(
    df: DataFrame,
    path: str,
    txn_app: str | None = None,
    txn_id: int | None = None,
    max_commit_retries: int = 40,
) -> int | None:
    """Transactional APPEND with idempotent-writer semantics: stage new
    immutable files, carry every existing file by reference, and commit —
    recording (txn_app -> txn_id) in the manifest. A REPLAY of an already-
    applied transaction (txn_id <= the recorded watermark for txn_app) is
    a no-op returning None: exactly the Delta txnAppId/txnVersion contract
    that makes foreachBatch sinks exactly-once under Structured Streaming
    retries (the checkpoint replays a batch, the table refuses the
    duplicate).

    Concurrency: files are staged ONCE (they are immutable and not bound
    to any version), then the metadata merge+publish loops on
    `CommitConflict` — re-reading the current manifest and recommitting is
    microseconds, so concurrent appenders interleave instead of livelocking
    the way a stage-again-per-retry design would (the same reason Delta
    retries only its log write, never the data write). An append is
    commutative with any interleaved commit: carried files are re-read
    from the WINNER's manifest each attempt, so a racing DELETE/TRUNCATE
    is never un-done, and the replay watermark is re-checked per attempt.
    After ``max_commit_retries`` conflicts it raises — the caller is
    racing a pathological commit storm and should back off."""
    if (txn_app is None) != (txn_id is None):
        # a half-specified transaction would either skip the replay check
        # or poison the watermark map with None — refuse loudly
        raise ValueError("txn_app and txn_id must be provided together")
    if df.isEmpty():
        # an empty batch appends nothing: committing it would burn a
        # version and store a zero-row file per source hiccup; skipping is
        # replay-safe (a replayed empty batch is equally a no-op)
        return None
    staged: list[str] | None = None  # staged lazily, exactly once
    for _ in range(max_commit_retries):
        version = current_version(path)
        if version < 0:
            txns = {txn_app: txn_id} if txn_app is not None else {}
            if staged is None:
                staged = _stage_files(df, path)
            try:
                _commit(path, 0, staged, df.schema.json(), txns)
                return 0
            except CommitConflict:
                continue  # another writer created the table — append to it
        try:
            man = _read_manifest(path, version)
        except FileNotFoundError:
            # a concurrent commit advanced the table AND a vacuum already
            # swept the version we resolved — re-read the new current
            # version (vacuum() guards the same race on its side)
            continue
        if _schema_sig(df.schema.json()) != _schema_sig(man["schema"]):
            raise ValueError(
                f"append schema does not match table schema at {path!r}; "
                "align the frame's columns/types before appending"
            )
        txns = dict(man.get("txns", {}))
        if txn_app is not None and txns.get(txn_app, -1) >= txn_id:
            return None
        if txn_app is not None:
            txns[txn_app] = txn_id
        if staged is None:
            staged = _stage_files(df, path)
        try:
            _commit(path, version + 1, man["files"] + staged, man["schema"], txns)
            return version + 1
        except CommitConflict:
            continue
    raise CommitConflict(
        f"append to {path!r} lost {max_commit_retries} consecutive commit "
        "races; back off and retry"
    )


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot-isolated read: resolve one manifest once; the returned
    frame is pinned to that file list no matter what commits after.

    ``version`` pins the read to an OLDER snapshot (time travel — audit a
    DELETE, reproduce exactly the corpus a training run consumed). Every
    version since table creation is addressable until VACUUM reclaims the
    files an old manifest references; a time-travel read whose files were
    vacuumed fails here with the missing list rather than mid-job with a
    task-level FileNotFound — the same contract Delta's versionAsOf has
    after VACUUM. The latest-version hot path skips the existence sweep
    (its files are live by definition)."""
    latest = current_version(path)
    if latest < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    if version is None:
        version = latest
    elif not 0 <= version <= latest:
        raise ValueError(
            f"version {version} out of range: {path!r} has versions 0..{latest}"
        )
    try:
        man = _read_manifest(path, version)
    except FileNotFoundError:
        # VACUUM removes superseded manifests along with their files
        raise ValueError(
            f"snapshot v{version} of {path!r} was vacuumed (manifest "
            "removed); only snapshots newer than the last VACUUM are "
            "time-travelable"
        ) from None
    if version != latest:
        missing = [
            f
            for f in man["files"]
            if not os.path.exists(os.path.join(_data_dir(path), f))
        ]
        if missing:
            raise ValueError(
                f"snapshot v{version} of {path!r} references "
                f"{len(missing)} vacuumed file(s) (e.g. {missing[0]!r}); "
                "only snapshots newer than the last VACUUM grace window "
                "are time-travelable"
            )
    if not man["files"]:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(json.loads(man["schema"])))
    return spark.read.parquet(
        *[os.path.join(_data_dir(path), f) for f in man["files"]]
    )


def delete_where(spark: SparkSession, path: str, condition: Column | str) -> dict:
    """Transactional ``DELETE FROM <path> WHERE condition`` (the engine
    analog of /root/reference/geomesa.py:57-59). SQL DELETE semantics: rows
    where the condition is TRUE are removed; FALSE and NULL rows survive.

    Only files CONTAINING matching rows are rewritten; the rest carry over
    by reference. Readers see the old snapshot until the single atomic
    manifest link — never a partial delete. Returns stats."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    version = current_version(path)
    if version < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    man = _read_manifest(path, version)
    if not man["files"]:
        # nothing to delete from — no state change, no version burned
        return {"version": version, "files_rewritten": 0, "files_carried": 0}
    abs_files = [os.path.join(_data_dir(path), f) for f in man["files"]]
    df = spark.read.parquet(*abs_files)
    # locate the files that actually hold matching rows — one scan, and the
    # pushed condition prunes it like any filter
    hits = (
        df.where(cond)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    hit_names = {os.path.basename(r["f"]) for r in hits}
    if not hit_names:
        # zero matching rows: the table is unchanged — returning the
        # CURRENT version instead of committing an identical snapshot
        # keeps periodic no-match maintenance from churning readers'
        # pinned versions out of the retention window
        return {
            "version": version,
            "files_rewritten": 0,
            "files_carried": len(man["files"]),
        }
    carried = [f for f in man["files"] if f not in hit_names]
    survivors = spark.read.parquet(
        *[os.path.join(_data_dir(path), f) for f in sorted(hit_names)]
    ).where(~F.coalesce(cond, F.lit(False)))
    new_files = _stage_files(survivors, path)
    _commit(
        path, version + 1, carried + new_files, man["schema"], man.get("txns", {})
    )
    return {
        "version": version + 1,
        "files_rewritten": len(hit_names),
        "files_carried": len(carried),
    }


def truncate_table(path: str) -> int:
    """Atomic TRUNCATE: commit an empty file list. O(1) metadata — no data
    file is touched (vacuum reclaims them later), which is exactly how the
    reference's one-statement `TRUNCATE {table}` behaves operationally."""
    version = current_version(path)
    if version < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    man = _read_manifest(path, version)
    if not man["files"]:
        return version  # already empty — no version burned
    _commit(path, version + 1, [], man["schema"], man.get("txns", {}))
    return version + 1


def vacuum(path: str, keep_versions: int = 1, grace_seconds: int = 600) -> int:
    """Physically remove data files unreferenced by the ``keep_versions``
    most recent manifests, and the superseded manifests themselves.
    Returns the number of data files removed. The retention window is the
    snapshot-isolation grace period (same role as gc_grace_seconds for
    tombstones): a reader pinned to a retained snapshot stays consistent;
    vacuuming with keep_versions=1 assumes no reader predates the current
    commit. ``grace_seconds`` additionally protects IN-FLIGHT commits:
    `_stage_files` renames new files into data/ BEFORE the manifest link,
    so an unreferenced file younger than the grace may belong to a commit
    about to land — deleting it would corrupt that writer's table. Pass 0
    only when no concurrent writer can exist."""
    version = current_version(path)
    if version < 0:
        return 0
    keep = range(max(0, version - keep_versions + 1), version + 1)
    live: set[str] = set()
    for v in keep:
        try:
            live |= set(_read_manifest(path, v)["files"])
        except FileNotFoundError:
            continue
    removed = 0
    data = _data_dir(path)
    now = time.time()
    if os.path.isdir(data):
        for f in os.listdir(data):
            if f in live:
                continue
            full = os.path.join(data, f)
            try:
                if grace_seconds > 0 and now - os.path.getmtime(full) < grace_seconds:
                    continue  # possibly staged by an in-flight commit
                os.unlink(full)
            except FileNotFoundError:
                continue
            removed += 1
    mdir = _manifest_dir(path)
    # only SUPERSEDED manifests (strictly older than the retention window)
    # are removed — a manifest committed concurrently AFTER this vacuum's
    # version snapshot is a live transaction, and deleting it would revert
    # the table and orphan its data files (permanent loss)
    oldest_kept = max(0, version - keep_versions + 1)
    for f in os.listdir(mdir):
        m = _MANIFEST_RE.match(f)
        if m and int(m.group(1)) < oldest_kept:
            os.unlink(os.path.join(mdir, f))
    return removed
