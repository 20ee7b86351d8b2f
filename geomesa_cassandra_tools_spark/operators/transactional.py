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
swaps in transparently.

Log layout (the Delta-log shape, sized for 100 TB file counts):

- each ``vN.json`` is a DELTA — the files added/removed by that commit
  plus the (small) schema/txns/stats-cols header — so committing is
  O(batch), never O(table). A v1-era manifest that carries a full
  ``files`` list still resolves (it acts as its own base snapshot).
- every `CHECKPOINT_INTERVAL` commits the committer also publishes
  ``checkpoint-vN.json``: the full resolved state at N. Readers resolve
  a version by loading the nearest base at-or-below it (checkpoint or
  legacy full snapshot) and replaying at most `CHECKPOINT_INTERVAL`
  delta tails — the O(files)-per-read driver cost the v1 format
  disclosed is gone. Checkpoints are deterministic for a given version,
  so two writers racing the same checkpoint publish identical bytes and
  the conflict is ignorable.
- DELETION VECTORS (``delete_where(mode="dv")``): a delete can mark row
  positions in a small sidecar parquet instead of rewriting data files —
  the commit carries ``set_dv: {file -> dv_file}`` (cumulative
  positions), reads anti-join the vector, and any later rewrite of the
  file (delete/merge/OPTIMIZE) materializes and drops it. At 100 TB this
  is the difference between rewriting a 1 GB file to drop 3 rows and
  writing a 3-row sidecar; OPTIMIZE treats vectored files as always
  eligible, so vectors never accumulate past the next compaction.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import shutil
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


#: A checkpoint (full resolved state) is published every this-many
#: commits; reads replay at most this many delta tails past a base.
CHECKPOINT_INTERVAL = 16

#: TABLE FEATURES this build can read (Delta's reader-feature protocol):
#: feature-introducing commits record their feature name in the manifest
#: (monotone — features only ever grow), and `_read_manifest` refuses a
#: table that requires one this build does not know, naming it — a
#: future-format table fails loudly up front instead of being silently
#: misread (resurrected dv rows, misnamed mapped columns, ...).
SUPPORTED_FEATURES = frozenset({
    "deletionVectors",
    "columnMapping",
    "partitionColumns",
    "generatedColumns",
    "shallowClone",
    "checkConstraints",
    "inCommitTimestamps",
    # converted-in-place hive layouts: partition values live in key=value
    # path segments, not file bytes — a reader unaware of the feature
    # would scan those columns as null (see convert_to_manifest)
    "pathPartitionValues",
})

#: TABLE FEATURES this build can WRITE (Delta's writer-feature protocol,
#: the pair to the reader gate above): a table may carry WRITER-ONLY
#: features (``writer_features`` in the manifest — read-safe for old
#: builds, but mutating it requires understanding the feature, e.g. a
#: generated column the writer must compute, a row-tracking column it
#: must maintain). Every reader feature is implicitly required of
#: writers too (a writer that can't read the table can't maintain it),
#: so `_commit` gates on the UNION of both sets; reads never consult
#: ``writer_features``. Monotone like the reader set; carried by
#: checkpoints and clones.
SUPPORTED_WRITER_FEATURES = frozenset(
    # columnDefaults is WRITER-ONLY (Delta's allowColumnDefaults):
    # defaults materialize at write time, so old readers stay safe.
    # identityColumns is writer-only too: files carry plain bigints; the
    # invariant (uniqueness, the high-water mark) lives in the write path
    SUPPORTED_FEATURES | {"columnDefaults", "identityColumns"}
)

#: Column names the deletion-vector read path claims for itself; a table
#: schema using one would make every post-dv read ambiguous, so _commit
#: rejects them up front.
_RESERVED_META_COLS = {
    "__file", "__pos", "__dv_file", "__dv_pos", "__nulls__", "__rows__",
    # transient clustering key _zorder_cluster materializes during
    # ZORDER rewrites — a user column of this name would be silently
    # overwritten by the interleave and dropped from the rewritten files
    "__zorder",
}

_CHECKPOINT_RE = re.compile(r"^checkpoint-v(\d+)\.json$")

#: sentinel distinguishing "not an init commit: carry the table's
#: constraints" from "init with no constraints: reset to null"
_UNSET = object()


def _read_json(path: str, name: str) -> dict:
    with open(os.path.join(_manifest_dir(path), name)) as fh:
        return json.load(fh)


def _empty_state() -> dict:
    return {
        "version": -1, "files": [], "schema": None, "txns": {},
        "stats_cols": None, "stats": None, "dvs": {},
        "partition_cols": None, "constraints": None,
        "column_map": None, "column_map_seq": 0, "generated": None,
        "features": None, "writer_features": None, "path_values": {},
        "zcube": {}, "defaults": None, "identity": None,
    }


def _apply_delta(state: dict, delta: dict) -> dict:
    """Fold one delta commit into a resolved state (in place)."""
    removed = set(delta.get("remove", ()))
    files = [f for f in state["files"] if f not in removed]
    files.extend(delta.get("add", ()))
    files.sort()
    state["version"] = delta["version"]
    state["files"] = files
    state["schema"] = delta["schema"]
    state["txns"] = delta.get("txns", {})
    # deletion vectors: a removed/rewritten file's vector dies with it
    # (the rewrite materialized it); added files are born vector-free; a
    # set_dv entry (CUMULATIVE positions) replaces the file's mapping;
    # an unset_dv entry clears it (only RESTORE emits these — rolling
    # back below a dv commit un-deletes the masked rows)
    file_set = set(files)
    dvs = {
        f: d for f, d in (state.get("dvs") or {}).items() if f in file_set
    }
    for f, d in (delta.get("set_dv") or {}).items():
        if f in file_set:
            dvs[f] = d
    for f in delta.get("unset_dv") or ():
        dvs.pop(f, None)
    state["dvs"] = dvs
    # path-derived partition values (hive CONVERT): an entry dies with
    # its file (a rewrite materializes the column INTO the new file);
    # only convert commits add entries
    pv = {
        f: v for f, v in (state.get("path_values") or {}).items()
        if f in file_set
    }
    for f, v in (delta.get("path_values") or {}).items():
        if f in file_set:
            pv[f] = v
    state["path_values"] = pv
    # clustering provenance (liquid-style ZCube tags): an entry names
    # the clustering spec that WROTE the file; it dies with the file,
    # so incremental OPTIMIZE sees exactly the not-yet-clustered set
    zc = {
        f: v for f, v in (state.get("zcube") or {}).items()
        if f in file_set
    }
    for f, v in (delta.get("zcube") or {}).items():
        if f in file_set:
            zc[f] = v
    state["zcube"] = zc
    # partition layout is IMMUTABLE after init and constraints change
    # only through the explicit ALTER verbs: ordinary deltas omit both
    # keys and the state values carry; a delta that carries one sets it
    if "partition_cols" in delta:
        state["partition_cols"] = delta["partition_cols"]
    if "constraints" in delta:
        state["constraints"] = delta["constraints"]
    # generated columns are IMMUTABLE after init (like the partition
    # layout): ordinary deltas omit the key and the state value carries
    if "generated" in delta:
        state["generated"] = delta["generated"]
    # table features are MONOTONE: a feature-introducing commit adds its
    # name; nothing ever removes one (Delta's reader-feature contract)
    if delta.get("features"):
        state["features"] = sorted(
            set(state.get("features") or ()) | set(delta["features"])
        )
    if delta.get("writer_features"):
        state["writer_features"] = sorted(
            set(state.get("writer_features") or ())
            | set(delta["writer_features"])
        )
    # column DEFAULTs change only through the explicit verbs (ADD
    # COLUMN ... DEFAULT / SET DEFAULT / DROP DEFAULT): ordinary deltas
    # omit the key and the state value carries
    if "defaults" in delta:
        state["defaults"] = delta["defaults"]
    # IDENTITY columns: the spec (start/step) is immutable after init,
    # but every allocating commit advances the per-column HIGH-WATER
    # mark — allocating commits carry the whole updated map; ordinary
    # commits omit the key and the state carries
    if "identity" in delta:
        state["identity"] = delta["identity"]
    # column mapping changes only through the explicit verbs (rename /
    # drop / evolution assigning fresh physical names): ordinary deltas
    # omit the key and the state values carry
    if "column_map" in delta:
        state["column_map"] = delta["column_map"]
        state["column_map_seq"] = delta.get(
            "column_map_seq", state.get("column_map_seq", 0)
        )
    stats_cols = delta.get("stats_cols")
    state["stats_cols"] = stats_cols
    if stats_cols:
        prev = state.get("stats") or {}
        add_stats = delta.get("add_stats") or {}
        state["stats"] = {
            f: add_stats.get(f, prev.get(f)) for f in files
        }
    else:
        state["stats"] = None
    return state


def _as_state(body: dict) -> dict:
    """Normalize a checkpoint / legacy full-snapshot body to state shape."""
    return {
        "version": body["version"],
        "files": list(body.get("files", [])),
        "schema": body.get("schema"),
        "txns": body.get("txns", {}),
        "stats_cols": body.get("stats_cols"),
        "stats": body.get("stats") if body.get("stats_cols") else None,
        "dvs": body.get("dvs", {}),
        "partition_cols": body.get("partition_cols"),
        "constraints": body.get("constraints"),
        "column_map": body.get("column_map"),
        "column_map_seq": body.get("column_map_seq", 0),
        "generated": body.get("generated"),
        "features": body.get("features"),
        "writer_features": body.get("writer_features"),
        "path_values": body.get("path_values") or {},
        "zcube": body.get("zcube") or {},
        "defaults": body.get("defaults"),
        "identity": body.get("identity"),
    }


def _read_manifest(path: str, version: int) -> dict:
    """Resolve the FULL table state at ``version``: walk back from the
    target collecting delta commits until a base (checkpoint or legacy
    full-snapshot manifest) is found, then replay forward. The walk is at
    most `CHECKPOINT_INTERVAL` reads — O(tail), never O(history) — and
    the returned dict always carries files/schema/txns/stats_cols/stats.
    Raises FileNotFoundError if a needed commit was vacuumed."""
    d = _manifest_dir(path)
    try:
        have_cp = {
            int(m.group(1))
            for f in os.listdir(d) if (m := _CHECKPOINT_RE.match(f))
        }
    except FileNotFoundError:
        raise FileNotFoundError(f"no manifest directory under {path!r}") from None
    deltas: list[dict] = []
    state = _empty_state()
    v = version
    while v >= 0:
        if v in have_cp:
            try:
                state = _as_state(_read_json(path, f"checkpoint-v{v}.json"))
                break
            except FileNotFoundError:
                pass  # checkpoint vacuumed between listdir and read
        body = _read_json(path, f"v{v}.json")  # FileNotFoundError -> vacuumed
        if "files" in body:  # legacy full-snapshot manifest: its own base
            state = _as_state(body)
            break
        deltas.append(body)
        v -= 1
    for delta in reversed(deltas):
        _apply_delta(state, delta)
    unknown = set(state.get("features") or ()) - SUPPORTED_FEATURES
    if unknown:
        # the reader-feature gate: refuse up front with the feature named
        # rather than silently misreading a future-format table
        raise ValueError(
            f"table {path!r} requires reader feature(s) "
            f"{sorted(unknown)} this build does not support "
            f"(supported: {sorted(SUPPORTED_FEATURES)}); upgrade the "
            "engine to read this table"
        )
    return state


def _commit(
    path: str,
    version: int,
    schema_ddl: str,
    txns: dict[str, int] | None = None,
    stats_cols: list[str] | None = None,
    add: list[str] | None = None,
    remove: list[str] | None = None,
    add_stats: dict[str, dict] | None = None,
    op: str = "commit",
    set_dv: dict[str, str] | None = None,
    unset_dv: list[str] | None = None,
    partition_cols: list[str] | None = None,
    constraints: dict | None = _UNSET,
    column_map: dict | None = _UNSET,
    column_map_seq: int | None = None,
    extra: dict | None = None,
    generated: dict | None = _UNSET,
    features: list[str] | None = None,
    writer_features: list[str] | None = None,
    prev_state: dict | None = None,
    path_values: dict | None = None,
    zcube: dict | None = None,
    defaults: dict | None = _UNSET,
    identity: dict | None = _UNSET,
) -> None:
    """Atomically publish DELTA ``version`` through the active
    `CommitProtocol`. A same-version race loses with `CommitConflict` —
    the optimistic-concurrency conflict, surfaced loudly. ``txns`` is the
    idempotent-writer watermark map (app -> highest applied transaction
    id, the Delta txnAppId/txnVersion pattern); every commit carries it
    forward so maintenance commits never forget an append's watermark.
    ``add_stats`` holds per-file min/max for the ADDED files only (see
    `_collect_file_stats`) — carried stats live in the resolved state,
    never re-written per commit. After a successful publish, a checkpoint
    is published every `CHECKPOINT_INTERVAL` versions (best-effort: the
    commit is already durable; a racing identical checkpoint is fine)."""
    try:
        fields = json.loads(schema_ddl).get("fields", ())
        # the whole extraction stays inside the tolerance try: a payload
        # like {"fields": "abc"} or {"fields": [1]} must skip the screen,
        # not raise from the comprehension
        names = {
            f.get("name")
            for f in fields
            if isinstance(f, dict)
        } if isinstance(fields, (list, tuple)) else set()
    except (TypeError, ValueError, AttributeError):
        names = set()  # non-standard schema payload: nothing to screen
    reserved = _RESERVED_META_COLS & names
    if reserved:
        raise ValueError(
            f"schema for {path!r} uses reserved metadata column name(s) "
            f"{sorted(reserved)}; __file/__pos/__dv_file/__dv_pos are "
            "claimed by the deletion-vector read path and __zorder by "
            "the ZORDER rewrite — rename them"
        )
    if version > 0:
        # the WRITER-FEATURE GATE (pair of the reader gate in
        # _read_manifest): refuse mutating a table that carries a
        # writer feature this build does not understand — an oblivious
        # writer would silently break the feature's invariant (e.g.
        # append without computing a generated column it doesn't know,
        # fail to maintain a row-tracking column). Reader features bind
        # writers too (a writer that can't read the state can't
        # maintain it), hence the union. Reads never consult
        # ``writer_features`` — a writer-only feature stays read-safe
        # for old builds, exactly Delta's readerFeatures/writerFeatures
        # split. Callers that just resolved version-1 pass it via
        # ``prev_state`` so the gate costs zero extra manifest I/O (it
        # otherwise doubled per-commit resolution, and re-ran on every
        # iteration of the 40-attempt retry loops).
        if prev_state is None:
            prev_state = _read_manifest(path, version - 1)
        unknown_w = (
            set(prev_state.get("writer_features") or ())
            | set(prev_state.get("features") or ())
        ) - SUPPORTED_WRITER_FEATURES
        if unknown_w:
            raise ValueError(
                f"table {path!r} requires writer feature(s) "
                f"{sorted(unknown_w)} this build does not support "
                f"(supported: {sorted(SUPPORTED_WRITER_FEATURES)}); "
                "upgrade the engine to write this table (reads may "
                "still work if the feature is writer-only)"
            )
    d = _manifest_dir(path)
    os.makedirs(d, exist_ok=True)
    # IN-COMMIT TIMESTAMPS (Delta's ICT table feature, default-on here):
    # the stamped ts is max(wall clock, predecessor ts + 1ms), so commit
    # timestamps are STRICTLY MONOTONE in version order no matter how
    # skewed the writers' clocks are. That upgrades version_as_of's
    # latest-downward early stop from "effectively monotone" (Delta's
    # file-mtime caveat) to exact on any history written by this code.
    # Cost: one predecessor delta-body read per commit — noise next to
    # parquet staging. A vacuumed/checkpoint-only predecessor falls back
    # to the wall clock (legacy contract, disclosed in version_as_of).
    now = time.time()
    if version > 0:
        try:
            prev_ts = _read_json(path, f"v{version - 1}.json").get("ts")
        except (FileNotFoundError, ValueError):
            prev_ts = None
        if prev_ts is not None and now <= prev_ts:
            now = prev_ts + 0.001
    body = {
        "version": version,
        "op": op,
        "ts": now,
        "add": sorted(add or []),
        "remove": sorted(remove or []),
        "schema": schema_ddl,
        "txns": txns or {},
    }
    if set_dv:
        body["set_dv"] = dict(sorted(set_dv.items()))
    if unset_dv:
        body["unset_dv"] = sorted(unset_dv)
    if stats_cols:
        body["stats_cols"] = list(stats_cols)
        body["add_stats"] = {f: (add_stats or {}).get(f) for f in body["add"]}
    if partition_cols is not None:
        # written by init/overwrite only (None elsewhere => the resolved
        # state carries); an explicit [] RESETS a prior layout on overwrite
        body["partition_cols"] = list(partition_cols) or None
    if constraints is not _UNSET:
        body["constraints"] = constraints  # null on overwrite = reset
    if column_map is not _UNSET:
        body["column_map"] = column_map  # null on overwrite = reset
        if column_map_seq is not None:
            body["column_map_seq"] = column_map_seq
    if generated is not _UNSET:
        body["generated"] = generated  # null on overwrite = reset
    if features:
        body["features"] = sorted(set(features))
    if writer_features:
        body["writer_features"] = sorted(set(writer_features))
    if path_values:
        body["path_values"] = path_values
    if zcube:
        body["zcube"] = zcube
    if defaults is not _UNSET:
        body["defaults"] = defaults
    if identity is not _UNSET:
        body["identity"] = identity
    if extra:
        # informational commit metadata (e.g. clone lineage) — read by
        # table_history/DESCRIBE, never by state resolution
        body.update(extra)
    payload = json.dumps(body).encode()
    try:
        _PROTOCOL.publish(d, f"v{version}.json", payload)
    except CommitConflict:
        raise CommitConflict(
            f"concurrent commit conflict: version {version} of {path!r} "
            "already committed by another writer"
        ) from None
    if version > 0 and version % CHECKPOINT_INTERVAL == 0:
        try:
            checkpoint_table(path, version)
        except (CommitConflict, OSError):
            pass  # another writer checkpointed (identical bytes) / IO blip


def checkpoint_table(path: str, version: int | None = None) -> int:
    """Publish ``checkpoint-vN.json`` — the full resolved state at N
    (default: current version). Readers then replay only the delta tail
    past it; `vacuum` prunes checkpoints older than the retention window.
    Deterministic content per version, so checkpointing is IDEMPOTENT: a
    checkpoint that already exists (a racing checkpointer, or a caller
    retrying) is byte-identical by construction and the duplicate publish
    is absorbed as a no-op — the model-based log test exercises the
    double-checkpoint path directly. Returns the checkpointed version."""
    if version is None:
        version = current_version(path)
        if version < 0:
            raise ValueError(f"no committed manifest under {path!r}")
    state = _read_manifest(path, version)
    body = {
        "version": version,
        "files": state["files"],
        "schema": state["schema"],
        "txns": state["txns"],
    }
    if state.get("dvs"):
        body["dvs"] = state["dvs"]
    if state["stats_cols"]:
        body["stats_cols"] = state["stats_cols"]
        body["stats"] = state["stats"]
    if state.get("partition_cols"):
        body["partition_cols"] = state["partition_cols"]
    if state.get("constraints"):
        body["constraints"] = state["constraints"]
    if state.get("column_map"):
        body["column_map"] = state["column_map"]
        body["column_map_seq"] = state.get("column_map_seq", 0)
    if state.get("generated"):
        body["generated"] = state["generated"]
    if state.get("features"):
        body["features"] = state["features"]
    if state.get("writer_features"):
        body["writer_features"] = state["writer_features"]
    if state.get("path_values"):
        body["path_values"] = state["path_values"]
    if state.get("zcube"):
        body["zcube"] = state["zcube"]
    if state.get("defaults"):
        body["defaults"] = state["defaults"]
    if state.get("identity"):
        body["identity"] = state["identity"]
    try:
        _PROTOCOL.publish(
            _manifest_dir(path), f"checkpoint-v{version}.json",
            json.dumps(body).encode(),
        )
    except CommitConflict:
        pass  # identical bytes already published — idempotent by design
    return version


def _cmap(man: dict | None) -> dict[str, str]:
    """A snapshot's COLUMN MAPPING (logical name -> physical file-column
    name; Delta's column-mapping-by-id shape, names instead of ids so
    manifests stay greppable). Empty dict = identity: the table was
    never renamed/dropped, files carry the logical names directly — the
    legacy layout, and the zero-cost common case."""
    return (man or {}).get("column_map") or {}


def _phys_pred(pred: tuple, cmap: dict[str, str]) -> tuple:
    """Translate a skipping predicate's column to its PHYSICAL name for
    stats lookup (stats/footers are keyed physical — rename is then a
    pure metadata commit, no stats restatement)."""
    if not cmap:
        return pred
    col, op, val = pred
    p = cmap.get(col, col)
    return pred if p == col else (p, op, val)


def _fresh_physical(logical: str, cmap: dict[str, str], seq: int) -> tuple[str, int]:
    """A physical name for a NEW logical column on a mapped table: never
    reuses a live physical (a re-added column must not resurrect a
    dropped column's bytes) and never collides with a logical name."""
    taken = set(cmap) | set(cmap.values())
    while True:
        cand = f"c{seq}__{logical}"
        seq += 1
        if cand not in taken and cand not in _RESERVED_META_COLS:
            return cand, seq


def _stage_files(
    df: DataFrame, path: str, partition_by: list[str] | None = None,
    column_map: dict[str, str] | None = None,
) -> list[str]:
    """Write ``df`` as new immutable data files; return their names
    (data/-relative paths). Files land under data/ with a commit-unique
    prefix, so a failed commit leaves only unreferenced files (cleaned by
    vacuum), never a torn table.

    ``partition_by=None`` self-wires: the table's declared
    ``partition_cols`` (if any) are looked up from the current manifest,
    so every rewrite path (append/delete/merge/compact/sink) preserves
    the hive layout without threading the list through each caller. Pass
    ``[]`` to force a flat write. A frame MISSING one of the partition
    columns (a dv sidecar's (file, pos) shape) stages flat — sidecars
    are commit metadata, not table data.

    Layout note: files are partitioned hive-style
    (``data/col=value/…parquet``) but the partition columns STAY IN the
    data files (written through ``__part_``-prefixed duplicates that
    name the directories, then stripped from the dir names) — unlike
    Delta's column-stripping layout. That choice keeps every reader
    (snapshot scan, dv anti-join, CDF, the Arrow streaming feed)
    byte-compatible with unpartitioned tables, and makes partition
    pruning ride the SAME per-file stats machinery: a one-value file's
    footer min==max==value, an exact span."""
    if partition_by is None or column_map is None:
        v = current_version(path)
        man = None
        if v >= 0:
            try:
                man = _read_manifest(path, v)
            except FileNotFoundError:
                man = None
        if partition_by is None:
            partition_by = (man or {}).get("partition_cols")
        if column_map is None:
            column_map = _cmap(man)
    # column mapping: files store PHYSICAL names — rename the frame's
    # mapped columns before writing (sidecar/metadata frames carry none
    # of them and pass through untouched). Partition dirs are named by
    # the physical column too, so a rename never relocates data.
    ren = {
        l: p for l, p in (column_map or {}).items()
        if l != p and l in df.columns
    }
    if ren:
        df = df.select(
            *(F.col(c).alias(ren.get(c, c)) for c in df.columns)
        )
    cols = [
        (column_map or {}).get(c, c) for c in (partition_by or [])
    ]
    if cols and not set(cols) <= set(df.columns):
        cols = []  # metadata/sidecar frame: stage flat
    token = uuid.uuid4().hex[:12]
    staging = os.path.join(path, f".staging-{token}")
    names: list[str] = []
    if cols:
        dup = [f"__part_{c}" for c in cols]
        out = df
        for c, d in zip(cols, dup):
            out = out.withColumn(d, F.col(c))
        out.write.mode("overwrite").partitionBy(*dup).parquet(staging)
        os.makedirs(_data_dir(path), exist_ok=True)
        for root, _dirs, fs in os.walk(staging):
            rel = os.path.relpath(root, staging)
            relparts = [] if rel == "." else rel.split(os.sep)
            clean = [
                p[len("__part_"):] if p.startswith("__part_") else p
                for p in relparts
            ]
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                destdir = os.path.join(_data_dir(path), *clean)
                name = "/".join([*clean, f"{token}-{f}"])
                # a concurrent vacuum may rmdir a just-created EMPTY hive
                # dir between our makedirs and the rename — re-create and
                # retry; once the rename lands the dir is non-empty and
                # immune to the sweep
                for attempt in (0, 1):
                    os.makedirs(destdir, exist_ok=True)
                    try:
                        os.rename(
                            os.path.join(root, f),
                            os.path.join(destdir, f"{token}-{f}"),
                        )
                        break
                    except FileNotFoundError:
                        if attempt:
                            raise
                names.append(name)
        shutil.rmtree(staging, ignore_errors=True)
        return sorted(names)
    df.write.mode("overwrite").parquet(staging)
    os.makedirs(_data_dir(path), exist_ok=True)
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


def _norm_stat(v, side: str | None = None):
    """Normalize a statistics value (from a parquet footer OR a user
    predicate literal) into a JSON-safe, totally-ordered primitive so the
    driver-side interval checks compare like the engine would: timestamps
    -> epoch microseconds (int, exact integer arithmetic — float
    ``total_seconds()`` has ~0.5 µs ulp at 2026 epochs, enough to flip a
    strict bound), dates -> proleptic ordinal (int), int/float/str pass
    through. Unsupported types -> None (the file is then never skipped on
    that column — skipping must only ever be a superset of the true
    answer).

    ``side`` handles lossy float conversion (Decimal) with DIRECTED
    rounding: ``"lo"`` rounds a file minimum DOWN one ulp, ``"hi"`` rounds
    a maximum UP, so the recorded span always CONTAINS the true decimal
    span. Predicate literals (side=None) use round-to-nearest, which is
    monotone — combined with the widened span every interval check stays
    strictly conservative even for '<'/'>' on decimals that collapse to
    the same float."""
    import datetime
    import decimal
    import math

    if isinstance(v, bool) or v is None:
        return None  # bool min/max skipping is pointless; None = no stat
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        # aware values subtract a UTC epoch: the timedelta between two
        # aware datetimes is offset-correct, so any zone normalizes to
        # the same INSTANT micros (an epoch built in v's own tzinfo would
        # yield wall-clock-in-that-offset micros — a +05:00 literal would
        # land 5h away from the same instant written as UTC and wrongly
        # skip files). Naive values use the naive epoch (wall domain).
        if v.tzinfo is not None:
            epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        else:
            epoch = datetime.datetime(1970, 1, 1)
        d = v - epoch  # timedelta holds exact integer (days, s, µs)
        return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds
    if isinstance(v, datetime.date):
        return v.toordinal()
    if isinstance(v, decimal.Decimal):
        f = float(v)  # round-to-nearest (monotone)
        if side == "lo":
            return f if decimal.Decimal(f) <= v else math.nextafter(f, -math.inf)
        if side == "hi":
            return f if decimal.Decimal(f) >= v else math.nextafter(f, math.inf)
        return f
    return None


def _stat_kind(v) -> str | None:
    """Timestamp statistics carry a comparison-domain tag: ``"instant"``
    for tz-aware values (parquet isAdjustedToUTC columns — Spark
    TIMESTAMP) and ``"wall"`` for naive ones (TIMESTAMP_NTZ). A predicate
    literal only prunes against a span in the SAME domain: a naive
    literal vs an instant span differs by the session-timezone offset
    (Spark's row filter interprets it in the session zone, the footer is
    UTC-adjusted), so mixed comparisons never prune — the file is kept
    and the exact row filter decides."""
    import datetime

    if isinstance(v, datetime.datetime):
        return "instant" if v.tzinfo is not None else "wall"
    return None


def _norm_literal(val, kind: str | None, side: str | None = None):
    """Normalize a predicate literal against a span recorded with
    ``kind`` (see `_stat_kind`). A datetime literal whose domain does not
    match the span's returns None — the predicate then keeps the file.
    ``side`` directs lossy (Decimal) rounding the CONSERVATIVE way for
    the comparison at hand: a literal compared against a span's upper
    bound rounds DOWN ("lo"), against a lower bound rounds UP ("hi") —
    otherwise a decimal literal and a file extreme that collapse to the
    same double can defeat a strict bound and wrongly skip the file."""
    import datetime

    if isinstance(val, datetime.datetime):
        if _stat_kind(val) != kind:
            return None
        return _norm_stat(val)
    return _norm_stat(val, side)


def _collect_file_stats(
    path: str, names: list[str], stats_cols: list[str]
) -> dict[str, dict]:
    """Per-file min/max for ``stats_cols``, read from the parquet FOOTERS
    of just-staged files (no extra Spark job — the writer already computed
    row-group statistics; this is how Delta/Iceberg harvest file stats).
    A column missing from a file, or any row group without min/max
    (e.g. all-null), records null for that column: the file is then
    always kept by the pruner — skipping stays strictly conservative.
    Spans are ``[lo, hi]`` (directed-rounded for lossy types, see
    `_norm_stat`) or ``[lo, hi, kind]`` for timestamps (see
    `_stat_kind`)."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for name in names:
        md = pq.ParquetFile(os.path.join(_data_dir(path), name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        col_stats: dict[str, list | None] = {}
        nulls: dict[str, int] = {}
        for col in stats_cols:
            if col not in idx:
                col_stats[col] = None
                continue
            lo = hi = kind = None
            ok = True
            n_null: int | None = 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if n_null is not None and st is not None and st.null_count is not None:
                    n_null += st.null_count
                else:
                    n_null = None  # one silent row group poisons the count
                if st is None or not st.has_min_max:
                    ok = False
                    continue  # keep harvesting null counts from later rgs
                mn, mx = _norm_stat(st.min, "lo"), _norm_stat(st.max, "hi")
                if mn is None or mx is None:
                    ok = False
                    continue
                kind = kind or _stat_kind(st.min)
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if ok and lo is not None:
                col_stats[col] = [lo, hi, kind] if kind else [lo, hi]
            else:
                col_stats[col] = None
            if n_null is not None:
                nulls[col] = n_null
        if nulls:
            # per-column null counts + the file's row count (Delta's
            # nullCount stats): IS NULL prunes files with zero nulls,
            # IS NOT NULL prunes all-null files. Reserved keys inside the
            # per-file stats dict — they ride state resolution/checkpoints
            # like any carried stats.
            col_stats["__nulls__"] = nulls
            col_stats["__rows__"] = md.num_rows
        out[name] = col_stats
    return out


def _file_survives(col_stats: dict | None, pred: tuple) -> bool:
    """Interval check: can a file whose ``stats_cols`` span ``col_stats``
    contain a row satisfying ``pred``? Missing/None stats -> True (keep).
    Predicates are the simple pushdown shapes: (col, op, value) with op in
    {'=', '<', '<=', '>', '>=', 'between', 'in', 'ranges', 'isnull',
    'isnotnull'} — 'between' takes (lo, hi), 'in' a value list, 'ranges'
    a list of (lo, hi) pairs (the z-cover shape: keep the file if ANY
    range intersects its span); 'isnull'/'isnotnull' take value None and
    prune on the per-file null counts."""
    col, op, val = pred
    if not col_stats:
        return True
    if op in ("isnull", "isnotnull"):
        # null-count skipping is independent of the min/max span: an
        # all-null column has NO span but a known null count
        nulls = (col_stats.get("__nulls__") or {}).get(col)
        rows = col_stats.get("__rows__")
        if nulls is None:
            return True  # count unknown -> keep (conservative)
        if op == "isnull":
            return nulls > 0
        return rows is None or nulls < rows
    span = col_stats.get(col)
    if span is None:
        return True
    lo, hi = span[0], span[1]
    kind = span[2] if len(span) > 2 else None

    def interval_hits(v) -> bool:
        """Can [lo, hi] contain v? Both-sided directed literal rounding."""
        v_lo, v_hi = _norm_literal(v, kind, "lo"), _norm_literal(v, kind, "hi")
        return v_lo is None or v_hi is None or (lo <= v_hi and v_lo <= hi)

    try:
        if op in ("=", "=="):
            return interval_hits(val)
        if op == "<":
            v = _norm_literal(val, kind, "hi")  # vs lower bound: round UP
            return v is None or lo < v
        if op == "<=":
            v = _norm_literal(val, kind, "hi")
            return v is None or lo <= v
        if op == ">":
            v = _norm_literal(val, kind, "lo")  # vs upper bound: round DOWN
            return v is None or hi > v
        if op == ">=":
            v = _norm_literal(val, kind, "lo")
            return v is None or hi >= v
        if op == "between":
            a, b = _norm_literal(val[0], kind, "lo"), _norm_literal(val[1], kind, "hi")
            return a is None or b is None or (hi >= a and lo <= b)
        if op == "in":
            return any(interval_hits(v) for v in val)
        if op == "ranges":
            return any(
                _norm_literal(a, kind, "lo") is None
                or _norm_literal(b, kind, "hi") is None
                or (hi >= _norm_literal(a, kind, "lo") and lo <= _norm_literal(b, kind, "hi"))
                for a, b in val
            )
    except TypeError:
        # a literal whose Python type doesn't order against the stored
        # span (e.g. an int literal against a string column's span, from
        # an untyped caller like the CLI): undecidable -> keep the file,
        # the same conservative-superset rule as missing stats — the
        # row-level refine filter on top keeps results exact
        return True
    raise ValueError(f"unsupported skipping predicate op: {op!r}")


def _predicate_column(pred: tuple) -> Column:
    """The row-level filter for a skipping predicate — pruning is always
    cover-and-refine: the pruned file list is a superset of the files
    holding matches, and this exact filter runs on top, so results are
    identical with or without stats."""
    col, op, val = pred
    c = F.col(col)
    if op == "isnull":
        return c.isNull()
    if op == "isnotnull":
        return c.isNotNull()
    if op in ("=", "=="):
        return c == F.lit(val)
    if op == "<":
        return c < F.lit(val)
    if op == "<=":
        return c <= F.lit(val)
    if op == ">":
        return c > F.lit(val)
    if op == ">=":
        return c >= F.lit(val)
    if op == "between":
        return c.between(F.lit(val[0]), F.lit(val[1]))
    if op == "in":
        return c.isin(list(val))
    if op == "ranges":
        cover = None
        for a, b in val:
            term = c.between(F.lit(a), F.lit(b))
            cover = term if cover is None else (cover | term)
        return cover if cover is not None else F.lit(False)
    raise ValueError(f"unsupported skipping predicate op: {op!r}")


class ConstraintViolation(ValueError):
    """A write-time constraint (NOT NULL / CHECK) refused a batch."""


def _normalize_constraints(
    not_null: list[str] | None, check_constraints: dict[str, str] | None
) -> dict | None:
    if not not_null and not check_constraints:
        return None
    return {
        "not_null": sorted(not_null or []),
        "checks": dict(sorted((check_constraints or {}).items())),
    }


def _enforce_constraints(df: DataFrame, constraints: dict | None, path: str):
    """The write-time gate (Delta's NOT NULL / CHECK invariants): ONE
    aggregate pass over the batch counts every constraint's violations
    before a single byte stages; any violation refuses the whole batch
    loudly — naming the constraint and the count — and burns no version.
    A NOT NULL column missing from the batch frame entirely is refused
    the same way (evolution would null-backfill it, i.e. every row
    violates). CHECK follows the SQL standard: a NULL predicate result
    passes (compose with NOT NULL to refuse nulls) — violation means the
    expression is definitively FALSE."""
    if not constraints:
        return
    aggs, labels = [], []
    for c in constraints.get("not_null") or []:
        if c not in df.columns:
            raise ConstraintViolation(
                f"batch for {path!r} omits NOT NULL column {c!r} "
                "(every row would null-backfill) — refused"
            )
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"__nn_{len(labels)}"
            )
        )
        labels.append(f"NOT NULL {c}")
    for name, expr in (constraints.get("checks") or {}).items():
        # pre-screen: a CHECK referencing a column the batch omits (legal
        # under merge_schema evolution — it would null-backfill) must be
        # a loud ConstraintViolation naming the constraint, not an
        # unresolved-column AnalysisException from the aggregate below.
        # The select is analysis-only — no job runs.
        try:
            df.select(F.expr(expr))
        except Exception as e:
            raise ConstraintViolation(
                f"batch for {path!r} cannot evaluate CHECK {name} ({expr}) "
                f"— a referenced column is missing from the batch "
                f"(evolution would null-backfill it, leaving the check "
                f"unverifiable at write time) — refused "
                f"[{e.__class__.__name__}]"
            ) from None
        aggs.append(
            F.sum(
                F.when(F.expr(expr) == F.lit(False), 1).otherwise(0)
            ).alias(f"__ck_{len(labels)}")
        )
        labels.append(f"CHECK {name} ({expr})")
    if not aggs:
        return
    counts = list(df.agg(*aggs).collect()[0])
    bad = [
        f"{label}: {int(n)} violating row(s)"
        for label, n in zip(labels, counts)
        if n  # None (empty batch) and 0 both pass
    ]
    if bad:
        raise ConstraintViolation(
            f"write to {path!r} refused by table constraints — "
            + "; ".join(bad)
        )


#: GENERATED COLUMN expression patterns whose partition predicates can be
#: DERIVED from a predicate on the source column (each is order-preserving
#: / monotone on its input — the property the derivation relies on).
#: Delta's generated-column partition pruning supports the same family.
_GEN_TO_DATE_RE = re.compile(r"^\s*to_date\(\s*([A-Za-z_][\w]*)\s*\)\s*$")
_GEN_DATE_TRUNC_RE = re.compile(
    r"^\s*date_trunc\(\s*'(year|month|week|day|hour)'\s*,"
    r"\s*([A-Za-z_][\w]*)\s*\)\s*$",
    re.IGNORECASE,
)
_GEN_SUBSTR_RE = re.compile(
    r"^\s*substr(?:ing)?\(\s*([A-Za-z_][\w]*)\s*,\s*1\s*,\s*(\d+)\s*\)\s*$"
)


def _parse_generator(expr: str):
    """(source_column, conv, conv_strict_hi) for a derivable
    generated-column expression, or (None, None, None). ``conv`` maps a
    predicate literal on the SOURCE column to the generated column's
    value; because every supported expression is monotone,
    ``src OP lit`` implies ``gen OP' conv(lit)`` with ``<``/``>`` relaxed
    to ``<=``/``>=``. ``conv_strict_hi`` sharpens the strict upper bound:
    the LARGEST generated value reachable by inputs strictly below the
    literal — so ``ts < midnight`` derives ``date <= day - 1`` instead of
    ``<= day`` (the dashboard [day, day+1) shape prunes exactly)."""
    import datetime

    def _as_dt(v):
        if isinstance(v, datetime.datetime):
            return v
        if isinstance(v, datetime.date):
            return datetime.datetime(v.year, v.month, v.day)
        if isinstance(v, str):
            try:
                return datetime.datetime.fromisoformat(v)
            except ValueError:
                return None
        return None

    m = _GEN_TO_DATE_RE.match(expr)
    if m:
        def conv(v):
            dt = _as_dt(v)
            return dt.date() if dt is not None else None

        def strict_hi(v):
            dt = _as_dt(v)
            if dt is None:
                return None
            if (dt.hour, dt.minute, dt.second, dt.microsecond) == (0, 0, 0, 0):
                return dt.date() - datetime.timedelta(days=1)
            return dt.date()
        return m.group(1), conv, strict_hi
    m = _GEN_DATE_TRUNC_RE.match(expr)
    if m:
        unit = m.group(1).lower()

        def _trunc(dt, unit=unit):
            if unit == "year":
                return dt.replace(month=1, day=1, hour=0, minute=0,
                                  second=0, microsecond=0)
            if unit == "month":
                return dt.replace(day=1, hour=0, minute=0, second=0,
                                  microsecond=0)
            if unit == "week":  # Spark: truncate to the Monday
                base = dt.replace(hour=0, minute=0, second=0, microsecond=0)
                return base - datetime.timedelta(days=base.weekday())
            if unit == "day":
                return dt.replace(hour=0, minute=0, second=0, microsecond=0)
            return dt.replace(minute=0, second=0, microsecond=0)  # hour

        def conv(v):
            dt = _as_dt(v)
            return _trunc(dt) if dt is not None else None

        def strict_hi(v):
            dt = _as_dt(v)
            if dt is None:
                return None
            t = _trunc(dt)
            if t == dt:  # exactly on a boundary: previous bucket is max
                return _trunc(t - datetime.timedelta(microseconds=1))
            return t
        return m.group(2), conv, strict_hi
    m = _GEN_SUBSTR_RE.match(expr)
    if m:
        n = int(m.group(2))

        def conv(v, n=n):
            return v[:n] if isinstance(v, str) else None
        return m.group(1), conv, conv  # prefix strict bound is unsharpenable
    return None, None, None


def _derived_generated_preds(
    where: list[tuple], man: dict
) -> list[tuple]:
    """PRUNING-ONLY predicates on generated columns, derived from ``where``
    predicates on their source columns (Delta's generated-column partition
    pruning): a table generated AS event_date = to_date(ts) and a read
    filtered on ts gets the matching event_date partition predicate for
    free — the user never names the partition column. Derived predicates
    feed ONLY the file pruner; the caller's original predicate remains the
    exact row filter, so results are identical with or without the
    derivation (cover-and-refine, like all skipping)."""
    gen = man.get("generated") or {}
    if not gen or not where:
        return []
    out: list[tuple] = []
    for gcol, expr in gen.items():
        src, conv, strict_hi = _parse_generator(expr)
        if src is None:
            continue
        for col, op, val in where:
            if col != src:
                continue
            if op in ("isnull", "isnotnull"):
                # every supported generator is null-iff-null on its input
                out.append((gcol, op, None))
                continue
            try:
                if op in ("=", "=="):
                    d = conv(val)
                    if d is not None:
                        out.append((gcol, "=", d))
                elif op in (">", ">="):
                    d = conv(val)
                    if d is not None:
                        out.append((gcol, ">=", d))  # monotone: relax >
                elif op == "<":
                    d = strict_hi(val)
                    if d is not None:
                        out.append((gcol, "<=", d))
                elif op == "<=":
                    d = conv(val)
                    if d is not None:
                        out.append((gcol, "<=", d))
                elif op == "between":
                    a, b = conv(val[0]), conv(val[1])
                    if a is not None and b is not None:
                        out.append((gcol, "between", (a, b)))
                elif op == "in":
                    ds = [conv(v) for v in val]
                    if all(d is not None for d in ds):
                        out.append((gcol, "in", ds))
                elif op == "ranges":
                    rs = [(conv(a), conv(b)) for a, b in val]
                    if all(a is not None and b is not None for a, b in rs):
                        out.append((gcol, "ranges", rs))
            except (TypeError, ValueError):
                continue  # underivable literal: prune nothing, stay exact
    return out


def _apply_generated(
    df: DataFrame, generated: dict | None, path: str
) -> DataFrame:
    """GENERATED COLUMNS at the write boundary (Delta's GENERATED ALWAYS
    AS): a batch missing a generated column gets it COMPUTED (one
    withColumn — stays in codegen); a batch that supplies it is VALIDATED
    against the expression in one aggregate pass and refused loudly on
    the first divergence (Delta's invariant check) — silently trusting a
    producer's hand-computed partition value would corrupt pruning for
    every later read."""
    if not generated:
        return df
    to_check = []
    for col, expr in generated.items():
        if col not in df.columns:
            df = df.withColumn(col, F.expr(expr))
        else:
            to_check.append((col, expr))
    if to_check:
        aggs = [
            F.sum(
                F.when(
                    ~F.col(c).eqNullSafe(F.expr(e)), 1
                ).otherwise(0)
            ).alias(f"__gen_{i}")
            for i, (c, e) in enumerate(to_check)
        ]
        row = df.agg(*aggs).collect()[0]
        bad = [
            f"GENERATED {c} AS ({e}): {row[f'__gen_{i}']} row(s) diverge"
            for i, (c, e) in enumerate(to_check)
            if (row[f"__gen_{i}"] or 0) > 0
        ]
        if bad:
            raise ConstraintViolation(
                f"write to {path!r} refused — supplied generated-column "
                "value(s) diverge from their expression: " + "; ".join(bad)
            )
    return df


def _normalize_identity(identity) -> dict | None:
    """Normalize an IDENTITY spec to ``{col: {start, step, high}}``.
    Accepts a list of names (start 1, step 1), or a dict of col ->
    {"start": s, "step": k} / col -> None. ``high`` is the high-water
    mark — the LAST allocated value; ``start - step`` means nothing
    allocated yet."""
    if not identity:
        return None
    if isinstance(identity, (list, tuple, set)):
        identity = {c: None for c in identity}
    out = {}
    for col, spec in identity.items():
        spec = spec or {}
        start = int(spec.get("start", 1))
        step = int(spec.get("step", 1))
        if step == 0:
            raise ValueError(f"identity column {col!r}: step must be nonzero")
        out[col] = {"start": start, "step": step, "high": start - step}
    return out


def _assign_identity(
    df: DataFrame, ident: dict | None, path: str
) -> tuple[DataFrame, dict | None]:
    """GENERATED ALWAYS AS IDENTITY at the write boundary (Delta's
    identity-columns contract): a batch SUPPLYING an identity column is
    refused (ALWAYS, never BY DEFAULT — a producer-supplied id would
    break the uniqueness invariant silently); a batch omitting it gets
    CONTIGUOUS values allocated past the table's high-water mark.

    Allocation is exact and distributed: one cached pass counts rows per
    input partition (a collect of O(partitions) tiny rows), the driver
    prefix-sums the offsets, and a window keyed on the partition id
    assigns ``high + step * (offset + local_rank)`` — the shuffle hashes
    on the partition id, so parallelism equals the input partition count
    at any scale (never a single-partition global window). Values are
    CONTIGUOUS per commit, so the allocated SET is deterministic
    regardless of partitioning (the row->value MAPPING is not — Delta
    guarantees uniqueness/monotonicity, not assignment order).

    Returns (df_with_values, updated identity map). The caller owns the
    returned frame's persistence (unpersist after staging)."""
    if not ident:
        return df, None
    supplied = [c for c in ident if c in df.columns]
    if supplied:
        raise ValueError(
            f"write to {path!r} refused — column(s) {sorted(supplied)} "
            "are GENERATED ALWAYS AS IDENTITY; omit them and the write "
            "path allocates values"
        )
    from pyspark.sql.window import Window

    # pin partitioning + row order between the count pass and the
    # assignment pass (arbitrary upstream frames are not re-read-stable)
    df = df.persist()
    counts = {
        r["__pid"]: r["cnt"]
        for r in df.groupBy(
            F.spark_partition_id().alias("__pid")
        ).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(counts.values())
    new_ident = {
        c: {**spec, "high": spec["high"] + spec["step"] * n}
        for c, spec in ident.items()
    }
    if n == 0:
        for c, spec in ident.items():
            df = df.withColumn(c, F.lit(None).cast("long"))
        return df, new_ident
    offsets, acc = [], 0
    for p in sorted(counts):
        offsets.append((p, acc))
        acc += counts[p]
    omap = F.create_map(
        *[F.lit(x) for p, o in offsets for x in (p, o)]
    )
    df = df.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    idx = (
        F.row_number().over(w).cast("long") - 1
        + F.element_at(omap, F.col("__pid")).cast("long")
    )
    for c, spec in ident.items():
        df = df.withColumn(
            c,
            (
                F.lit(spec["high"]).cast("long")
                + F.lit(spec["step"]).cast("long") * (idx + F.lit(1))
            ).alias(c),
        )
    return df.drop("__pid"), new_ident


def _refuse_identity(man: dict | None, path: str, verb: str) -> None:
    """Mutation paths that REPLACE rows wholesale (merge_upsert's
    batch-wins contract, merge_clauses SET *) cannot preserve an
    existing row's identity value nor allocate for inserts without
    per-row matched/insert provenance — refuse loudly rather than
    corrupt the uniqueness invariant. Append/INSERT/streaming-sink and
    rewrite-in-place paths (delete/update/compact) support identity
    tables fully."""
    if man and man.get("identity"):
        raise ValueError(
            f"{verb} on {path!r} refused — the table has IDENTITY "
            f"column(s) {sorted(man['identity'])}; use append_batch / "
            "INSERT INTO (allocation) and delete/update (preservation) "
            "instead"
        )


def _init_features(partition_by, constraints, generated) -> list[str]:
    """The feature names an init/overwrite commit must declare for the
    capabilities it switches on (see SUPPORTED_FEATURES)."""
    feats = ["inCommitTimestamps"]
    if partition_by:
        feats.append("partitionColumns")
    if constraints:
        feats.append("checkConstraints")
    if generated:
        feats.append("generatedColumns")
    return feats


def table_constraints(path: str) -> dict | None:
    """The table's declared write-time constraints (or None)."""
    v = current_version(path)
    if v < 0:
        return None
    return _read_manifest(path, v).get("constraints")


def add_table_constraint(
    spark: SparkSession,
    path: str,
    not_null: str | None = None,
    check_name: str | None = None,
    check_expr: str | None = None,
    max_commit_retries: int = 40,
) -> int:
    """ALTER TABLE ADD CONSTRAINT (Delta semantics): validate the
    EXISTING data against the new constraint first — adding a constraint
    the current rows violate is refused with the violation named, no
    version burned — then publish a metadata-only commit carrying the
    updated constraint set. Pass either ``not_null=`` (a column name) or
    ``check_name=`` + ``check_expr=``. Existing-data validation is one
    aggregate pass over the live snapshot (dv-applied), the same gate
    every write already runs.

    Concurrency: per retry the CURRENT state is re-read and re-validated
    — a row landing between validation and publish could otherwise
    smuggle a violation under the new constraint."""
    if (not_null is None) == (check_name is None):
        raise ValueError(
            "pass exactly one of not_null= or check_name=/check_expr="
        )
    if (check_name is None) != (check_expr is None):
        raise ValueError("check_name and check_expr go together")
    for _ in range(max_commit_retries):
        version = current_version(path)
        if version < 0:
            raise ValueError(f"no committed manifest under {path!r}")
        man = _read_manifest(path, version)
        cons = man.get("constraints") or {"not_null": [], "checks": {}}
        cons = {
            "not_null": list(cons.get("not_null") or []),
            "checks": dict(cons.get("checks") or {}),
        }
        if not_null is not None:
            if not_null in cons["not_null"]:
                return version  # already declared — idempotent
            trial = _normalize_constraints(
                [*cons["not_null"], not_null], cons["checks"]
            )
        else:
            if cons["checks"].get(check_name) == check_expr:
                return version  # identical constraint — idempotent
            if check_name in cons["checks"]:
                raise ValueError(
                    f"constraint {check_name!r} already exists with a "
                    "different expression; drop it first"
                )
            trial = _normalize_constraints(
                cons["not_null"], {**cons["checks"], check_name: check_expr}
            )
        # existing data must satisfy the new constraint (Delta validates
        # on ADD) — the snapshot pinned to the version we will CAS over
        _enforce_constraints(read_table(spark, path, version=version), trial, path)
        try:
            _commit(
                path, version + 1, man["schema"], man.get("txns", {}),
                man.get("stats_cols"), add=[], remove=[],
                op="add_constraint", constraints=trial,
                features=["checkConstraints"], prev_state=man,
            )
            return version + 1
        except CommitConflict:
            continue  # racing commit: re-read, re-validate, retry
    raise CommitConflict(
        f"add_table_constraint on {path!r} lost {max_commit_retries} "
        "consecutive commit races; back off and retry"
    )


def drop_table_constraint(
    path: str,
    not_null: str | None = None,
    check_name: str | None = None,
    max_commit_retries: int = 40,
) -> int:
    """ALTER TABLE DROP CONSTRAINT: metadata-only commit removing the
    named constraint (missing constraint -> no-op returning the current
    version — DROP IF EXISTS semantics, idempotent under replays)."""
    if (not_null is None) == (check_name is None):
        raise ValueError("pass exactly one of not_null= or check_name=")
    for _ in range(max_commit_retries):
        version = current_version(path)
        if version < 0:
            raise ValueError(f"no committed manifest under {path!r}")
        man = _read_manifest(path, version)
        cons = man.get("constraints") or {"not_null": [], "checks": {}}
        nn = [c for c in (cons.get("not_null") or []) if c != not_null]
        checks = {
            n: e for n, e in (cons.get("checks") or {}).items()
            if n != check_name
        }
        if nn == list(cons.get("not_null") or []) and checks == dict(
            cons.get("checks") or {}
        ):
            return version  # nothing to drop
        try:
            _commit(
                path, version + 1, man["schema"], man.get("txns", {}),
                man.get("stats_cols"), add=[], remove=[],
                op="drop_constraint",
                constraints=_normalize_constraints(nn, checks),
                prev_state=man,
            )
            return version + 1
        except CommitConflict:
            continue
    raise CommitConflict(
        f"drop_table_constraint on {path!r} lost {max_commit_retries} "
        "consecutive commit races; back off and retry"
    )


def _identity_map_from_schema(schema_json: str) -> dict[str, str]:
    return {
        f["name"]: f["name"] for f in json.loads(schema_json)["fields"]
    }


def _constraint_refs(constraints: dict | None, col: str) -> list[str]:
    """Constraint labels that reference ``col`` — conservative
    word-boundary match for CHECK expressions (a false positive refuses
    a rename/drop the user can still do after DROP CONSTRAINT; a false
    negative would silently break the gate)."""
    import re as _re

    if not constraints:
        return []
    out = []
    if col in (constraints.get("not_null") or ()):
        out.append(f"NOT NULL {col}")
    pat = _re.compile(rf"\b{_re.escape(col)}\b")
    for name, expr in (constraints.get("checks") or {}).items():
        if pat.search(expr):
            out.append(f"CHECK {name} ({expr})")
    return out


def rename_column(
    path: str, old: str, new: str, max_commit_retries: int = 40
) -> int:
    """ALTER TABLE RENAME COLUMN as a METADATA-ONLY commit (Delta's
    column mapping): the first rename upgrades the table to an explicit
    logical->physical column map (identity for every existing column);
    the renamed column keeps its PHYSICAL file-column name, so not one
    data byte moves — files, footer stats, hive partition directories
    all stay keyed by the physical name and predicates on the NEW name
    translate at plan time. Time travel across the boundary serves each
    snapshot's own names (every version carries its own schema + map).

    Renaming a column a CHECK constraint references is refused (drop the
    constraint first — rewriting user SQL text silently is worse); a
    NOT NULL entry and the partition-column list follow the rename.
    Idempotent-shaped errors stay loud: missing ``old`` or an already-
    taken ``new`` raise."""
    if old == new:
        raise ValueError("rename_column: old and new names are identical")
    for _ in range(max_commit_retries):
        version = current_version(path)
        if version < 0:
            raise ValueError(f"no committed manifest under {path!r}")
        man = _read_manifest(path, version)
        schema = json.loads(man["schema"])
        names = [f["name"] for f in schema["fields"]]
        if old not in names:
            raise ValueError(
                f"rename_column: no column {old!r} in {path!r} "
                f"(columns: {names})"
            )
        if new in names:
            raise ValueError(
                f"rename_column: column {new!r} already exists in {path!r}"
            )
        refs = [
            r for r in _constraint_refs(man.get("constraints"), old)
            if r.startswith("CHECK")
        ]
        if refs:
            raise ValueError(
                f"rename_column: {old!r} is referenced by {refs}; drop the "
                "constraint first, rename, then re-add it under the new name"
            )
        gen = man.get("generated") or {}
        if old in gen or any(
            re.search(rf"\b{re.escape(old)}\b", e) for e in gen.values()
        ):
            # Delta's rule: generated columns and their source columns
            # cannot be renamed — the stored expression would dangle
            raise ValueError(
                f"rename_column: {old!r} is a generated column or is "
                "referenced by a generated-column expression; generated "
                "definitions are immutable after init"
            )
        cmap = dict(_cmap(man) or _identity_map_from_schema(man["schema"]))
        seq = man.get("column_map_seq", 0)
        cmap[new] = cmap.pop(old)
        new_schema = json.dumps(
            {
                **schema,
                "fields": [
                    {**f, "name": new} if f["name"] == old else f
                    for f in schema["fields"]
                ],
            }
        )
        parts = man.get("partition_cols")
        new_parts = (
            [new if c == old else c for c in parts] if parts else None
        )
        cons = man.get("constraints")
        if cons and old in (cons.get("not_null") or ()):
            cons = {
                "not_null": sorted(
                    new if c == old else c for c in cons["not_null"]
                ),
                "checks": dict(cons.get("checks") or {}),
            }
        dfl = man.get("defaults")
        dfl_kw = {}
        if dfl and old in dfl:
            dfl_kw = {"defaults": {
                (new if c == old else c): e for c, e in dfl.items()
            }}
        try:
            _commit(
                path, version + 1, new_schema, man.get("txns", {}),
                man.get("stats_cols"), add=[], remove=[],
                op="rename_column",
                partition_cols=new_parts,
                features=["columnMapping"],
                constraints=cons if cons is not man.get("constraints") else _UNSET,
                column_map=cmap, column_map_seq=seq, prev_state=man,
                **dfl_kw,
            )
            return version + 1
        except CommitConflict:
            continue  # racing commit: re-read, re-validate, retry
    raise CommitConflict(
        f"rename_column on {path!r} lost {max_commit_retries} consecutive "
        "commit races; back off and retry"
    )


def set_column_default(
    path: str, col: str, default: str | None,
    max_commit_retries: int = 40,
) -> int:
    """ALTER TABLE ALTER COLUMN ... SET DEFAULT expr / DROP DEFAULT
    (``default=None``): metadata-only commit updating the table's
    column-DEFAULT map (write-time fills for omitted columns; existing
    rows are untouched — Delta's allowColumnDefaults contract). Setting
    a default records the writer-only ``columnDefaults`` feature."""
    for _ in range(max_commit_retries):
        version = current_version(path)
        if version < 0:
            raise ValueError(f"no committed manifest under {path!r}")
        man = _read_manifest(path, version)
        names = {
            f["name"] for f in json.loads(man["schema"])["fields"]
        }
        if col not in names:
            raise ValueError(
                f"set_column_default: no column {col!r} in {path!r}"
            )
        if default is not None and (
            col in (man.get("generated") or {})
            or col in (man.get("identity") or {})
        ):
            # a default on a GENERATED (expression or IDENTITY) column
            # would pre-fill it in _align_to_schema and bypass (or fail)
            # the generation contract — Delta refuses the same combination
            raise ValueError(
                f"set_column_default: {col!r} is a generated column; its "
                "value comes from the generation path, never a DEFAULT"
            )
        cur = dict(man.get("defaults") or {})
        if default is None:
            if col not in cur:
                return version  # nothing to drop — idempotent
            cur.pop(col)
        else:
            if cur.get(col) == default:
                return version  # identical — idempotent
            cur[col] = default
        try:
            _commit(
                path, version + 1, man["schema"], man.get("txns", {}),
                man.get("stats_cols"), add=[], remove=[],
                op="set_default", defaults=cur or None,
                writer_features=["columnDefaults"] if default else None,
                prev_state=man,
            )
            return version + 1
        except CommitConflict:
            continue
    raise CommitConflict(
        f"set_column_default on {path!r} lost {max_commit_retries} "
        "consecutive commit races; back off and retry"
    )


def drop_column(
    path: str, col: str, max_commit_retries: int = 40
) -> int:
    """ALTER TABLE DROP COLUMN as a METADATA-ONLY commit: the column
    leaves the schema and the column map; its physical bytes stay in the
    files (readers simply never project them — vacuum-by-rewrite, i.e.
    OPTIMIZE, eventually drops them). A column RE-ADDED later (evolution
    or an explicit append) gets a FRESH physical name, so the dropped
    column's old bytes can never resurrect under the new one.

    Refused while the column is a partition column, is referenced by a
    constraint, or is the table's last column."""
    for _ in range(max_commit_retries):
        version = current_version(path)
        if version < 0:
            raise ValueError(f"no committed manifest under {path!r}")
        man = _read_manifest(path, version)
        schema = json.loads(man["schema"])
        names = [f["name"] for f in schema["fields"]]
        if col not in names:
            raise ValueError(
                f"drop_column: no column {col!r} in {path!r} (columns: {names})"
            )
        if len(names) == 1:
            raise ValueError("drop_column: cannot drop the last column")
        if col in (man.get("partition_cols") or ()):
            raise ValueError(
                f"drop_column: {col!r} is a partition column; re-layout "
                "the table first (replace_table_layout)"
            )
        gen = man.get("generated") or {}
        if col in gen or any(
            re.search(rf"\b{re.escape(col)}\b", e) for e in gen.values()
        ):
            raise ValueError(
                f"drop_column: {col!r} is a generated column or is "
                "referenced by a generated-column expression; generated "
                "definitions are immutable after init"
            )
        refs = _constraint_refs(man.get("constraints"), col)
        if refs:
            raise ValueError(
                f"drop_column: {col!r} is referenced by {refs}; drop the "
                "constraint first"
            )
        cmap = dict(_cmap(man) or _identity_map_from_schema(man["schema"]))
        seq = man.get("column_map_seq", 0)
        phys = cmap.pop(col)
        new_schema = json.dumps(
            {
                **schema,
                "fields": [f for f in schema["fields"] if f["name"] != col],
            }
        )
        stats_cols = man.get("stats_cols")
        new_stats_cols = (
            [c for c in stats_cols if c != phys] if stats_cols else None
        )
        dfl = man.get("defaults")
        dfl_kw = {}
        if dfl and col in dfl:
            # purge the dropped column's default — a stale entry would
            # silently re-apply to a later same-named ADD COLUMN
            dfl_kw = {"defaults": {
                c: e for c, e in dfl.items() if c != col
            } or None}
        try:
            _commit(
                path, version + 1, new_schema, man.get("txns", {}),
                new_stats_cols or None, add=[], remove=[],
                op="drop_column",
                column_map=cmap, column_map_seq=seq,
                features=["columnMapping"], prev_state=man,
                **dfl_kw,
            )
            return version + 1
        except CommitConflict:
            continue
    raise CommitConflict(
        f"drop_column on {path!r} lost {max_commit_retries} consecutive "
        "commit races; back off and retry"
    )


def add_column(
    path: str, col: str, dtype: str, max_commit_retries: int = 40,
    default: str | None = None,
) -> int:
    """ALTER TABLE ADD COLUMN as a METADATA-ONLY commit — the explicit
    twin of `append_batch(merge_schema=True)`'s net-new-field evolution
    (same merged-schema shape: the new field appends after the existing
    ones, forced nullable since every existing file lacks it and reads
    it as null). On a column-mapped table the new logical name gets a
    FRESH physical name (`_fresh_physical`), so it can never resurrect a
    dropped column's bytes. ``dtype`` is a Spark DDL type string
    (``bigint``, ``decimal(10,2)``, ``array<string>``, ...)."""
    from pyspark.sql import types as T

    key = dtype.strip().lower()
    simple = {
        "string": T.StringType(), "boolean": T.BooleanType(),
        "tinyint": T.ByteType(), "byte": T.ByteType(),
        "smallint": T.ShortType(), "short": T.ShortType(),
        "int": T.IntegerType(), "integer": T.IntegerType(),
        "bigint": T.LongType(), "long": T.LongType(),
        "float": T.FloatType(), "real": T.FloatType(),
        "double": T.DoubleType(), "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(), "binary": T.BinaryType(),
    }
    dm = re.match(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", key)
    if key in simple:
        dt = simple[key]
    elif dm:
        dt = T.DecimalType(int(dm.group(1)), int(dm.group(2)))
    else:
        # complex types (array<...>, struct<...>, map<...>) go through
        # Spark's DDL parser — needs an active session (the atomic types
        # above stay session-free so the CLI verb parses them cold)
        dt = T.StructType.fromDDL(f"`{col}` {dtype}").fields[0].dataType
    fjson = {"name": col, "type": dt.jsonValue(), "nullable": True,
             "metadata": {}}
    # ``default`` (a SQL expression string) records a COLUMN DEFAULT:
    # future writes that omit the column fill it with the expression
    # instead of null (Delta's allowColumnDefaults — write-time only;
    # EXISTING rows still read null, exactly Delta's contract). Carried
    # in the manifest as the writer-only columnDefaults feature.
    for _ in range(max_commit_retries):
        version = current_version(path)
        if version < 0:
            raise ValueError(f"no committed manifest under {path!r}")
        man = _read_manifest(path, version)
        schema = json.loads(man["schema"])
        names = [f["name"] for f in schema["fields"]]
        if col in names:
            raise ValueError(
                f"add_column: column {col!r} already exists in {path!r}"
            )
        new_schema = json.dumps(
            {**schema, "fields": [*schema["fields"], fjson]}
        )
        extra = {}
        cmap = _cmap(man)
        if cmap:
            cmap = dict(cmap)
            phys, seq = _fresh_physical(
                col, cmap, man.get("column_map_seq", 0)
            )
            cmap[col] = phys
            extra = {
                "column_map": cmap, "column_map_seq": seq,
                "features": ["columnMapping"],
            }
        if default is not None:
            extra["defaults"] = {
                **(man.get("defaults") or {}), col: default,
            }
            extra["writer_features"] = ["columnDefaults"]
        try:
            _commit(
                path, version + 1, new_schema, man.get("txns", {}),
                man.get("stats_cols") or None, add=[], remove=[],
                op="add_column", prev_state=man, **extra,
            )
            return version + 1
        except CommitConflict:
            continue
    raise CommitConflict(
        f"add_column on {path!r} lost {max_commit_retries} consecutive "
        "commit races; back off and retry"
    )


def init_table(
    df: DataFrame,
    path: str,
    stats_cols: list[str] | None = None,
    only_if_absent: bool = False,
    partition_by: list[str] | None = None,
    not_null: list[str] | None = None,
    check_constraints: dict[str, str] | None = None,
    generated: dict[str, str] | None = None,
    identity: dict | list | None = None,
) -> int:
    """Create (or overwrite, as a new snapshot) a manifest table from a
    frame. Returns the committed version. ``stats_cols`` declares the
    columns whose per-file min/max are recorded in every manifest from
    here on (the Delta `dataSkippingNumIndexedCols` analog, explicit
    instead of positional): reads with a ``where=`` predicate on those
    columns open only the files whose span intersects it. Declare the
    clustering columns (z2/z3, event date, tenant id) — stats on a column
    the layout does not cluster by skip nothing.

    ``partition_by`` declares PARTITION COLUMNS (Delta/hive
    ``partitionBy``): files land under ``data/col=value/`` directories,
    every file holds exactly one value per partition column, the layout
    is recorded in the manifest (immutable after init) and PRESERVED by
    append/merge/delete-rewrite/compact/the streaming sink. Partition
    columns are automatically prepended to ``stats_cols``, so their
    per-file spans are exact points ([v, v]) and a ``where=`` equality
    or range predicate on them prunes at the manifest level BEFORE the
    scan plans — directory-level pruning semantics through the one
    skipping code path (see `_stage_files` for why the columns also stay
    IN the files). Date-partitioned event tables — the default 100 TB
    shape — then pay one partition's I/O for one partition's query.

    ``not_null`` / ``check_constraints`` declare WRITE-TIME constraints
    (Delta's NOT NULL and named CHECK invariants): every later
    `append_batch` / `merge_upsert` / streaming-sink batch passes one
    aggregate violation-count gate before staging; a violating batch is
    refused loudly — constraint named, count reported — with no version
    burned. Constraints are immutable after init, survive checkpoints,
    and keep enforcing across `merge_schema` evolution. Without them a
    CDC sink admits poison rows silently; with them the refusal happens
    at the table boundary, where it is attributable. Constraints evolve
    only through `add_table_constraint` (which validates existing data
    first, Delta's ADD CONSTRAINT) / `drop_table_constraint`.

    ``only_if_absent=True`` commits at version 0 UNCONDITIONALLY — if the
    table exists (any version), the publish conflicts instead of
    overwriting. This closes the check-then-init race for idempotent
    build-once fixtures: a racing builder that already committed v0 (and
    possibly more) can never be silently overwritten by a stale second
    builder whose existence check passed moments earlier.

    ``identity`` declares GENERATED ALWAYS AS IDENTITY column(s)
    (Delta's identity columns — creation-time only, like Delta): a list
    of names (START WITH 1 INCREMENT BY 1) or ``{col: {"start": s,
    "step": k}}``. The initial frame must OMIT them (values are
    allocated, never supplied); every later append/INSERT allocates a
    contiguous block past the manifest's per-column high-water mark,
    with commit races re-allocating so concurrent writers never
    collide. Uniqueness and |step|-monotonicity are the contract;
    consecutiveness across commits is not (Delta's contract too)."""
    ident = _normalize_identity(identity)
    if ident:
        clash = set(ident) & set(generated or ())
        if clash:
            raise ValueError(
                f"column(s) {sorted(clash)} cannot be both IDENTITY and "
                "GENERATED AS expression"
            )
        if set(ident) & set(partition_by or ()):
            raise ValueError(
                "identity columns cannot be partition columns"
            )
        df, ident = _assign_identity(df, ident, path)
        # identity columns are natural skipping columns (monotone per
        # commit): record their spans like generated columns
        stats_cols = [
            *(stats_cols or []),
            *[c for c in ident if c not in set(stats_cols or [])],
        ]
    if generated:
        # GENERATED ALWAYS AS: compute-if-absent / validate-if-present —
        # BEFORE the partition check, so `partition_by` may name a
        # generated column the batch never carries (the 100 TB idiom:
        # event_date GENERATED AS to_date(ts), partitioned by it, and
        # every ts-range read prunes without naming event_date)
        df = _apply_generated(df, generated, path)
        # generated columns are skipping columns by construction — record
        # their spans even when not partitioned on
        stats_cols = [
            *(stats_cols or []),
            *[c for c in generated if c not in set(stats_cols or [])],
        ]
    if partition_by:
        missing = set(partition_by) - set(df.columns)
        if missing:
            raise ValueError(
                f"partition_by columns {sorted(missing)} not in frame "
                f"columns {df.columns}"
            )
        stats_cols = [
            *partition_by,
            *[c for c in (stats_cols or []) if c not in set(partition_by)],
        ]
    constraints = _normalize_constraints(not_null, check_constraints)
    # the initial data passes through the same gate every later write
    # does (Delta validates existing data when a constraint is added)
    _enforce_constraints(df, constraints, path)
    if only_if_absent:
        files = _stage_files(
            df, path, partition_by=list(partition_by or []), column_map={}
        )
        stats = (
            _collect_file_stats(path, files, stats_cols) if stats_cols else None
        )
        _commit(
            path, 0, df.schema.json(), {}, stats_cols,
            add=files, add_stats=stats, op="init",
            partition_cols=list(partition_by or []),
            constraints=constraints, column_map=None,
            generated=dict(generated) if generated else None,
            features=_init_features(partition_by, constraints, generated),
            identity=ident,
            writer_features=["identityColumns"] if ident else None,
        )
        if ident:
            df.unpersist()
        return 0
    prior = current_version(path)
    if prior >= 0:
        st = _read_manifest(path, prior)
        txns, remove = st["txns"], st["files"]
    else:
        st, txns, remove = None, {}, []
    version = prior + 1
    # overwrite RESETS column mapping (a fresh logical schema; staged
    # files carry their own names verbatim) — stage untranslated even
    # when the prior snapshot was mapped
    files = _stage_files(
        df, path, partition_by=list(partition_by or []), column_map={}
    )
    stats = _collect_file_stats(path, files, stats_cols) if stats_cols else None
    _commit(
        path, version, df.schema.json(), txns, stats_cols,
        add=files, remove=remove, add_stats=stats,
        op="overwrite" if prior >= 0 else "init",
        partition_cols=list(partition_by or []),
        constraints=constraints, column_map=None,
        generated=dict(generated) if generated else None,
        features=_init_features(partition_by, constraints, generated),
        prev_state=st,
        identity=ident,
        writer_features=["identityColumns"] if ident else None,
    )
    if ident:
        df.unpersist()
    return version


def init_table_z_ordered(
    df: DataFrame,
    path: str,
    lon_col: str,
    lat_col: str,
    res: int = 6,
    num_files: int | None = None,
    extra_stats_cols: list[str] | None = None,
    only_if_absent: bool = False,
) -> int:
    """`geo.write_z_ordered` composed with the manifest layer: materialize
    the z2 column, range-cluster the files by it, and declare it a stats
    column — so a bbox read over the MANIFEST table skips whole files from
    the manifest's min/max (driver-side, before the scan even plans), then
    parquet row-group stats skip inside the survivors, then the exact
    refine runs. The same three-tier cover-and-refine as the raw
    z-ordered layout (reference z2 side-tables,
    /root/reference/geomesa.py:52), now with snapshot isolation on top."""
    from geomesa_cassandra_tools_spark.operators import geo
    from geomesa_cassandra_tools_spark.operators.relational import (
        _estimated_scan_partitions,
    )

    out = df.withColumn("z2", geo.z2(F.col(lon_col), F.col(lat_col), res))
    parts = num_files or max(_estimated_scan_partitions(df), 1)
    clustered = out.repartitionByRange(parts, F.col("z2")).sortWithinPartitions("z2")
    return init_table(
        clustered, path, stats_cols=["z2", *(extra_stats_cols or [])],
        only_if_absent=only_if_absent,
    )


def _zorder_cluster(
    df: DataFrame,
    zorder_cols: list[str],
    res: int | None,
    strategy: str,
    n_parts: int,
) -> DataFrame:
    """The one clustering recipe both init_table_zorder_by and
    compact_table(zorder_by=) use: materialize the transient interleave,
    range-cluster + sort by it, drop it."""
    from geomesa_cassandra_tools_spark.operators import geo

    zcol = geo.zorder_by(df, zorder_cols, res=res, strategy=strategy)
    return (
        df.withColumn("__zorder", zcol)
        .repartitionByRange(n_parts, F.col("__zorder"))
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )


def init_table_zorder_by(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    res: int | None = None,
    strategy: str = "minmax",
    num_files: int | None = None,
    extra_stats_cols: list[str] | None = None,
    only_if_absent: bool = False,
) -> int:
    """Delta's ``ZORDER BY (a, b, ...)`` for manifest tables: cluster the
    files by the GENERAL N-column interleave (`geo.zorder_by` — z2/z3
    generalized to arbitrary numeric columns) and record per-file min/max
    stats on every participating column. Because the layout co-locates
    rows that are close on ALL the z-order columns at once, each file's
    span is tight on each column — a multi-column predicate then prunes
    files multiplicatively where a single-column sort would only prune on
    its leading column. The transient z value is layout-only and NOT
    stored (Delta's choice too): readers skip via the per-COLUMN spans,
    so no z-range arithmetic ever appears on the read path."""
    from geomesa_cassandra_tools_spark.operators.relational import (
        _estimated_scan_partitions,
    )

    parts = num_files or max(_estimated_scan_partitions(df), 1)
    clustered = _zorder_cluster(df, zorder_cols, res, strategy, parts)
    return init_table(
        clustered, path,
        stats_cols=[*zorder_cols, *(extra_stats_cols or [])],
        only_if_absent=only_if_absent,
    )


def _schema_sig(schema_json: str) -> list[tuple]:
    """(name, type) per field — nullability and metadata excluded, so a
    batch whose optimizer inferred tighter nullability still appends."""
    return [
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in json.loads(schema_json)["fields"]
    ]


def _merge_schemas(table_schema_json: str, batch_schema_json: str) -> str:
    """Schema evolution for appends (the Delta ``mergeSchema`` analog):
    the merged schema is the TABLE's fields in their existing order, plus
    any net-new batch fields appended after them. A common field whose
    type differs is refused — type widening silently rewrites history
    (old files would re-read under a different type), so it stays an
    explicit offline migration. Nullability always merges to nullable:
    old files lack the new columns (read as null), and new files may omit
    old ones."""
    table = json.loads(table_schema_json)
    batch = json.loads(batch_schema_json)
    batch_by_name = {f["name"]: f for f in batch["fields"]}
    merged = []
    for f in table["fields"]:
        b = batch_by_name.get(f["name"])
        if b is not None and json.dumps(b["type"], sort_keys=True) != json.dumps(
            f["type"], sort_keys=True
        ):
            raise ValueError(
                f"merge_schema cannot change the type of column {f['name']!r} "
                f"({f['type']} -> {b['type']}); type changes are an explicit "
                "table rewrite, not an append — see rewrite_table_schema()"
            )
        merged.append({**f, "nullable": True})
    table_names = {f["name"] for f in table["fields"]}
    for f in batch["fields"]:
        if f["name"] not in table_names:
            merged.append({**f, "nullable": True})
    return json.dumps({**table, "fields": merged})


def append_batch(
    df: DataFrame,
    path: str,
    txn_app: str | None = None,
    txn_id: int | None = None,
    max_commit_retries: int = 40,
    merge_schema: bool = False,
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
    commutative with any interleaved commit: its delta only ADDS the
    staged files (existing files are never restated), so a racing
    DELETE/TRUNCATE is never un-done, and the replay watermark and schema
    are re-merged from the winner's state per attempt. After
    ``max_commit_retries`` conflicts it raises — the caller is racing a
    pathological commit storm and should back off.

    ``merge_schema=True`` opts into schema EVOLUTION (`_merge_schemas`):
    net-new batch columns are added to the table schema (old files read
    them as null), batch-missing table columns null-backfill in the new
    files, and a type change is refused. Default False keeps the strict
    signature check — accidental drift from an upstream producer should
    fail loudly, same default as Delta."""
    if (txn_app is None) != (txn_id is None):
        # a half-specified transaction would either skip the replay check
        # or poison the watermark map with None — refuse loudly
        raise ValueError("txn_app and txn_id must be provided together")
    if df.isEmpty():
        # an empty batch appends nothing: committing it would burn a
        # version and store a zero-row file per source hiccup; skipping is
        # replay-safe (a replayed empty batch is equally a no-op)
        return None
    # write-time constraints gate BEFORE any staging: a refused batch
    # burns no version and stages no file. Constraints are MUTABLE
    # (ALTER TABLE ADD CONSTRAINT), so the set validated here is
    # remembered and the retry loop re-runs the gate whenever the
    # resolved manifest carries a DIFFERENT set — otherwise a constraint
    # added between this read and our publish would let the retry
    # re-commit an already-staged violating batch past the gate.
    # The partition-column check rides the same read: a batch missing a
    # partition column would stage FLAT and silently degrade the hive
    # layout (evolution would null-backfill the value) — refuse loudly,
    # Delta's rule.
    _UNCHECKED = object()
    validated_cons = _UNCHECKED  # sentinel: no gate has run yet
    # IDENTITY bookkeeping: values are allocated from the high-water
    # marks of the manifest we read; if a racing commit advances them
    # before our publish wins, our staged values would collide with the
    # winner's — the retry loop re-allocates and restages (the loser
    # pays the restage; the winner's range is never violated)
    ident_new: dict | None = None   # updated map to commit
    ident_base: dict | None = None  # highs we allocated FROM
    ident_df: DataFrame | None = None  # persisted handle to release
    raw_df = df  # the producer's frame, before identity assignment
    _v0 = current_version(path)
    if _v0 >= 0:
        try:
            _man0 = _read_manifest(path, _v0)
        except FileNotFoundError:
            _man0 = None  # vacuumed under us — the loop below re-resolves
        if _man0 is not None:
            # generated columns compute/validate FIRST: a batch omitting
            # a generated partition column must be completed, not refused
            # by the partition check below (generated sets are immutable
            # after init, so no per-retry re-run is needed — the loop's
            # v0-race guard covers the one path that skips this read)
            df = _apply_generated(df, _man0.get("generated"), path)
            raw_df = df
            if _man0.get("identity"):
                ident_base = {
                    c: s["high"] for c, s in _man0["identity"].items()
                }
                df, ident_new = _assign_identity(
                    df, _man0["identity"], path
                )
                ident_df = df
            missing_parts = set(_man0.get("partition_cols") or ()) - set(
                df.columns
            )
            if missing_parts:
                raise ValueError(
                    f"append to {path!r} omits partition column(s) "
                    f"{sorted(missing_parts)}; partition columns are part "
                    "of the table layout and every batch must carry them"
                )
            _enforce_constraints(df, _man0.get("constraints"), path)
            validated_cons = _man0.get("constraints")
    staged: list[str] | None = None  # staged lazily, exactly once
    staged_stats: dict[str, dict] | None = None  # footer stats, read once
    staged_map: dict | None = None  # the column map the staging used
    for _ in range(max_commit_retries):
        version = current_version(path)
        if version < 0:
            txns = {txn_app: txn_id} if txn_app is not None else {}
            if staged is None:
                staged = _stage_files(df, path)
                staged_map = {}
            try:
                _commit(path, 0, df.schema.json(), txns, add=staged, op="append")
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
        if validated_cons is _UNCHECKED or man.get("constraints") != validated_cons:
            # the constraint set changed under us (ADD/DROP CONSTRAINT
            # raced this append), or this attempt follows the v0-race
            # path where another writer created the table and we never
            # read its constraints: re-run the gate against the winner's
            # set before (re)committing. Cheap dict compare per attempt;
            # the aggregate pass only re-runs on actual change.
            _enforce_constraints(df, man.get("constraints"), path)
            validated_cons = man.get("constraints")
        missing_gen = set(man.get("generated") or ()) - set(df.columns)
        if missing_gen:
            # only reachable via the v0-race path (another writer created
            # a generated-columns table between our pre-loop read and this
            # attempt): the staged files lack the generated columns, so
            # refuse loudly rather than degrade the layout — the caller
            # retries and the pre-loop generation then completes the batch
            raise ValueError(
                f"append to {path!r} lost a create race to a table with "
                f"generated column(s) {sorted(missing_gen)}; retry the "
                "append (generation will compute them)"
            )
        man_ident = man.get("identity")
        if man_ident and ident_base is None:
            # the v0-race twin for identity: the table came into existence
            # with identity columns after our pre-loop read — the caller
            # retries and the pre-loop allocation completes the batch
            raise ValueError(
                f"append to {path!r} lost a create race to a table with "
                f"identity column(s) {sorted(man_ident)}; retry the append"
            )
        if man_ident and {
            c: s["high"] for c, s in man_ident.items()
        } != ident_base:
            # a racing allocator advanced the high-water marks past the
            # base we assigned from: our staged values would collide with
            # the winner's range — re-allocate from the fresh marks and
            # restage (staged orphans are vacuum-swept)
            if ident_df is not None:
                ident_df.unpersist()
            ident_base = {c: s["high"] for c, s in man_ident.items()}
            df, ident_new = _assign_identity(raw_df, man_ident, path)
            ident_df = df
            staged, staged_stats, staged_map = None, None, None
        if merge_schema:
            # evolution is validated (and re-merged) per attempt: a racing
            # append may itself have evolved the schema we merge into
            schema = _merge_schemas(man["schema"], df.schema.json())
        else:
            if _schema_sig(df.schema.json()) != _schema_sig(man["schema"]):
                raise ValueError(
                    f"append schema does not match table schema at {path!r}; "
                    "align the frame's columns/types before appending, or "
                    "pass merge_schema=True to evolve the table schema"
                )
            schema = man["schema"]
        txns = dict(man.get("txns", {}))
        if txn_app is not None and txns.get(txn_app, -1) >= txn_id:
            return None
        if txn_app is not None:
            txns[txn_app] = txn_id
        # column mapping: a mapped table's evolution assigns every
        # net-new logical column a FRESH physical name (a re-added
        # column never resurrects a dropped column's bytes), and staging
        # must write under the EFFECTIVE map — if a racing commit
        # changed the map since we staged (rename is physical-stable and
        # safe, but an upgrade/evolution/restore can change what our
        # columns map to), the staged files are abandoned (vacuum sweeps
        # them) and restaged under the winner's map.
        eff_map = dict(_cmap(man))
        eff_seq = man.get("column_map_seq", 0)
        map_changed = False
        if eff_map:
            for fld in json.loads(schema)["fields"]:
                if fld["name"] not in eff_map:
                    phys, eff_seq = _fresh_physical(
                        fld["name"], eff_map, eff_seq
                    )
                    eff_map[fld["name"]] = phys
                    map_changed = True
        stage_map = {
            l: p for l, p in eff_map.items() if l in df.columns and l != p
        }
        if staged is not None and stage_map != staged_map:
            staged, staged_stats = None, None  # restage under the new map
        if staged is None:
            staged = _stage_files(df, path, column_map=eff_map)
            staged_map = stage_map
        stats_cols = man.get("stats_cols")
        if stats_cols and staged_stats is None:
            staged_stats = _collect_file_stats(path, staged, stats_cols)
        try:
            _commit(
                path, version + 1, schema, txns, stats_cols,
                add=staged, add_stats=staged_stats if stats_cols else None,
                op="append", prev_state=man,
                **(
                    {"column_map": eff_map, "column_map_seq": eff_seq}
                    if map_changed else {}
                ),
                **({"identity": ident_new} if ident_new else {}),
            )
            if ident_df is not None:
                ident_df.unpersist()
            return version + 1
        except CommitConflict:
            continue
    if ident_df is not None:
        ident_df.unpersist()
    raise CommitConflict(
        f"append to {path!r} lost {max_commit_retries} consecutive commit "
        "races; back off and retry"
    )


def version_as_of(path: str, ts: float, inclusive: bool = True) -> int:
    """TIMESTAMP AS OF resolution (Delta's semantics): the LATEST commit
    whose timestamp is <= ``ts`` (``inclusive=False`` resolves strictly
    < ``ts`` — the boundary the streaming feed's startingTimestamp needs
    so a commit stamped exactly at the instant still STREAMS, matching
    Delta's inclusive 'changes committed at or after the timestamp'). Commit timestamps are stamped at
    publish (``ts`` in the delta body); legacy commits without one fall
    back to the manifest file's mtime — same contract Delta has (commit
    file modification time), same caveat (wall clocks, not a logical
    clock; a skewed writer can reorder neighbors). Raises if ``ts``
    predates the table.

    Cost: O(commits newer than ``ts``), not O(history) — versions are
    walked from latest DOWNWARD and the walk stops at the first commit
    stamped <= ``ts``. Commits written by this code carry IN-COMMIT
    TIMESTAMPS (``_commit`` stamps max(wall, predecessor + 1ms) — Delta's
    ICT feature), so timestamps are STRICTLY monotone in version order
    and the early stop is exact regardless of writer clock skew. Only a
    legacy/mixed history (commits stamped before ICT, or mtime
    fallbacks after a vacuum) retains Delta's documented wall-clock
    caveat: there the walk resolves by the same commit-file-time
    contract, picking the highest version at-or-before the instant
    along the monotone prefix."""
    latest = current_version(path)
    if latest < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    mdir = _manifest_dir(path)
    versions = sorted(
        (
            int(m.group(1))
            for f in os.listdir(mdir)
            if (m := _MANIFEST_RE.match(f))
        ),
        reverse=True,
    )
    for v in versions:
        try:
            body = _read_json(path, f"v{v}.json")
            commit_ts = body.get("ts")
            if commit_ts is None:
                commit_ts = os.path.getmtime(os.path.join(mdir, f"v{v}.json"))
        except FileNotFoundError:
            continue  # vacuumed between listdir and read
        if (commit_ts <= ts) if inclusive else (commit_ts < ts):
            return v
    raise ValueError(
        f"timestamp {ts} predates every resolvable commit of {path!r} "
        "(or the older commits were vacuumed)"
    )


def _resolve_manifest(path: str, version: int | None) -> dict:
    """Resolve ONE manifest (latest or pinned), with the vacuumed-snapshot
    diagnostics read_table documents."""
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
        # sweep data files AND deletion-vector sidecars: a pinned read
        # whose vector was vacuumed must fail with the same up-front
        # diagnostic, not a task-level FileNotFound mid-job
        referenced = list(man["files"]) + sorted(
            set((man.get("dvs") or {}).values())
        )
        missing = [
            f
            for f in referenced
            if not os.path.exists(os.path.join(_data_dir(path), f))
        ]
        if missing:
            raise ValueError(
                f"snapshot v{version} of {path!r} references "
                f"{len(missing)} vacuumed file(s) (e.g. {missing[0]!r}); "
                "only snapshots newer than the last VACUUM grace window "
                "are time-travelable"
            )
    return man


def resolve_files(
    path: str, where: list[tuple] | None = None, version: int | None = None
) -> list[str]:
    """The file list a read with ``where`` will open, AFTER manifest-level
    min/max pruning — the observable data-skipping surface (unit tests
    assert on it; `read_table` consumes it). Predicates on columns without
    recorded stats prune nothing; every kept file still goes through the
    exact row filter, so the list is always a superset of the files that
    contain matches."""
    man = _resolve_manifest(path, version)
    files = man["files"]
    if where and man.get("stats_cols"):
        stats = man.get("stats") or {}
        part_cols = set(man.get("partition_cols") or ())
        cm = _cmap(man)  # stats/footers are keyed PHYSICAL
        # generated-column derivation (Delta's generated-column partition
        # pruning): predicates on a generator's SOURCE column imply
        # pruning-only predicates on the generated column — a ts-range
        # read over a to_date(ts)-partitioned table prunes to the matching
        # date partitions without the caller ever naming them
        derived = _derived_generated_preds(where, man)
        # partition predicates prune FIRST (Delta's partition-pruning
        # tier): their spans are exact points, so the check is cheap and
        # maximally selective; the surviving files then go through the
        # ordinary min/max stats checks
        part_preds = [
            _phys_pred(p, cm)
            for p in (*where, *derived)
            if p[0] in part_cols
        ]
        stat_preds = [
            _phys_pred(p, cm)
            for p in (*where, *derived)
            if p[0] not in part_cols
        ]
        if part_preds:
            files = [
                f
                for f in files
                if all(_file_survives(stats.get(f), p) for p in part_preds)
            ]
        if stat_preds:
            files = [
                f
                for f in files
                if all(_file_survives(stats.get(f), p) for p in stat_preds)
            ]
    return files


def _file_identity_col(data: str, files: list[str]):
    """The manifest-key identity of a scanned row's source file.

    Common (all-relative) layout: the data/-RELATIVE name — NOT the
    basename: partitioned tables key manifest entries (and dv rows) as
    "col=value/file.parquet", so the identity must carry the partition
    dirs. The last "/data/" in the path is always the table's data root:
    hive dir components are "col=value" (never a bare "data") and Spark
    %-escapes "/" inside partition values.

    A SHALLOW-CLONED snapshot additionally references files by ABSOLUTE
    path (outside this table's data root). Those rows key by their
    scheme-stripped absolute path, byte-identical to the manifest entry,
    so deletion-vector joins and the mutation paths' hit-file resolution
    work unchanged across the clone boundary. The branch only exists
    when the scanned file list actually carries an absolute entry — the
    everyday plan is untouched."""
    rel = F.substring_index(F.col("_metadata.file_path"), "/data/", -1)
    if not any(os.path.isabs(f) for f in files):
        return rel.alias("__file")
    own_prefix = os.path.abspath(data).replace(os.sep, "/") + "/"
    spath = F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
    return (
        F.when(spath.startswith(own_prefix), rel).otherwise(spath)
    ).alias("__file")


def _scan_live_rows(
    spark: SparkSession,
    path: str,
    man: dict,
    files: list[str],
    schema,
    keep_meta: bool = False,
) -> DataFrame:
    """Read ``files`` projected through ``schema`` with the snapshot's
    DELETION VECTORS applied: files carrying a vector are read with
    Spark's `_metadata` (file_name, row_index) and anti-joined against
    the broadcast (file, pos) vector rows; vector-free files scan plain
    (zero overhead on the common path). A newer cumulative vector is a
    SUPERSET of any older vector rows still present in shared dv files,
    so loading every referenced dv file and filtering by file name is
    exact. ``keep_meta=True`` keeps ``__file``/``__pos`` columns on ALL
    rows (the mutation paths need positions to build new vectors)."""
    data = _data_dir(path)
    file_set = set(files)
    dvs = {f: d for f, d in (man.get("dvs") or {}).items() if f in file_set}
    need_meta = keep_meta or bool(dvs)
    meta_cols = [
        # manifest-key identity (data/-relative, or the absolute path for
        # shallow-cloned entries) — see _file_identity_col
        _file_identity_col(data, files),
        F.col("_metadata.row_index").alias("__pos"),
    ]
    # column mapping: files carry PHYSICAL names; read with the physical
    # twin of the snapshot schema and project back to the snapshot's
    # LOGICAL names in the same select (so `_metadata` is still in scope)
    cmap = _cmap(man)
    ren = {
        f.name: cmap[f.name]
        for f in schema.fields
        if f.name in cmap and cmap[f.name] != f.name
    }
    if ren:
        from pyspark.sql.types import StructField, StructType

        read_schema = StructType(
            [
                StructField(
                    ren.get(f.name, f.name), f.dataType, f.nullable, f.metadata
                )
                for f in schema.fields
            ]
        )
    else:
        read_schema = schema

    pvals = man.get("path_values") or {}

    def _read_group(names: list[str], base_path: str | None) -> DataFrame:
        reader = spark.read.schema(read_schema)
        if base_path is not None:
            # converted-in-place hive files: the partition columns are
            # NOT in the file bytes — basePath partition discovery fills
            # them from the key=value path segments (cast to the
            # manifest schema's declared types), per-file constants
            reader = reader.option("basePath", base_path)
        df = reader.parquet(*[os.path.join(data, f) for f in names])
        proj = [
            F.col(ren.get(f.name, f.name)).alias(f.name)
            for f in schema.fields
        ] if ren else [F.col(f.name) for f in schema.fields]
        if need_meta:
            return df.select(*proj, *meta_cols)
        if ren or base_path is not None:
            return df.select(*proj)
        return df

    def _hive_base(f: str) -> str:
        # a path-valued file's OWN hive base: strip the filename plus
        # every trailing key=value segment. For data/-relative convert
        # entries this is exactly `data`; for a shallow clone's absolute
        # entries it is the SOURCE table's base, so partition discovery
        # works without materializing the values into the clone
        d = os.path.dirname(os.path.join(data, f))
        while "=" in os.path.basename(d):
            d = os.path.dirname(d)
        return d

    def _read(names: list[str]) -> DataFrame:
        pv = [f for f in names if f in pvals]
        plain_files = [f for f in names if f not in pvals]
        groups = []
        if plain_files:
            groups.append(_read_group(plain_files, None))
        by_base: dict[str, list[str]] = {}
        for f in pv:
            by_base.setdefault(_hive_base(f), []).append(f)
        for base in sorted(by_base):
            groups.append(_read_group(by_base[base], base))
        out = groups[0]
        for g in groups[1:]:
            out = out.unionByName(g)
        return out

    plain = [f for f in files if f not in dvs]
    parts = []
    if plain:
        parts.append(_read(plain))
    if dvs:
        # sidecar columns renamed BEFORE the join: a table whose own
        # schema carries a column named `file`/`pos` must not make the
        # anti-join condition ambiguous (the reserved __dv_* / __file /
        # __pos names themselves are rejected at commit time)
        dv_rows = (
            spark.read.parquet(
                *[os.path.join(data, n) for n in sorted(set(dvs.values()))]
            )
            .where(F.col("file").isin(list(dvs)))
            .select(
                F.col("file").alias("__dv_file"),
                F.col("pos").alias("__dv_pos"),
            )
        )
        kept = _read(sorted(dvs)).join(
            F.broadcast(dv_rows),
            (F.col("__file") == F.col("__dv_file"))
            & (F.col("__pos") == F.col("__dv_pos")),
            "left_anti",
        )
        parts.append(kept)
    if not parts:
        df = spark.createDataFrame([], schema)
        if keep_meta:
            df = df.select(
                "*",
                F.lit(None).cast("string").alias("__file"),
                F.lit(None).cast("bigint").alias("__pos"),
            )
        return df
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if need_meta and not keep_meta:
        out = out.drop("__file", "__pos")
    return out


def _parse_as_of(as_of: float | str) -> float:
    """Accept epoch seconds or an ISO datetime string (naive = local)."""
    if isinstance(as_of, (int, float)):
        return float(as_of)
    from datetime import datetime

    return datetime.fromisoformat(as_of).timestamp()


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    where: list[tuple] | None = None,
    as_of: float | str | None = None,
) -> DataFrame:
    """Snapshot-isolated read: resolve one manifest once; the returned
    frame is pinned to that file list no matter what commits after.

    ``version`` pins the read to an OLDER snapshot (time travel — audit a
    DELETE, reproduce exactly the corpus a training run consumed);
    ``as_of`` (epoch seconds or an ISO datetime string) is TIMESTAMP AS
    OF — resolved to the latest commit at-or-before that instant via
    `version_as_of`, mutually exclusive with ``version``. Every
    version since table creation is addressable until VACUUM reclaims the
    files an old manifest references; a time-travel read whose files were
    vacuumed fails here with the missing list rather than mid-job with a
    task-level FileNotFound — the same contract Delta's versionAsOf has
    after VACUUM. The latest-version hot path skips the existence sweep
    (its files are live by definition).

    ``where`` (a list of simple ANDed predicates, see `_file_survives`)
    is the data-skipping read: files whose recorded min/max span cannot
    contain a match are dropped from the scan BEFORE Spark ever plans it
    (manifest-level skipping, tier 1), parquet row-group stats skip inside
    the survivors (tier 2), and the same predicates are applied as an
    exact row filter (tier 3, the refine) — so results are byte-identical
    to an unfiltered read + filter, just cheaper. At 100 TB tier 1 is the
    difference between opening 3 files and opening 30,000.

    Reads always project through the MANIFEST schema (not file inference),
    so after a `merge_schema` append the old files' missing columns read
    as null and every snapshot reads under exactly the schema it
    committed."""
    from pyspark.sql.types import StructType

    if as_of is not None:
        if version is not None:
            raise ValueError("read_table takes at most one of version=/as_of=")
        version = version_as_of(path, _parse_as_of(as_of))
    man = _resolve_manifest(path, version)
    schema = StructType.fromJson(json.loads(man["schema"]))
    files = man["files"]
    if where and man.get("stats_cols"):
        stats = man.get("stats") or {}
        cm = _cmap(man)  # stats/footers are keyed PHYSICAL
        files = [
            f
            for f in files
            if all(_file_survives(stats.get(f), _phys_pred(p, cm)) for p in where)
        ]
    if not files:
        df = spark.createDataFrame([], schema)
    else:
        df = _scan_live_rows(spark, path, man, files, schema)
    if where:
        for p in where:
            df = df.where(_predicate_column(p))
    return df


def register_manifest_view(
    spark: SparkSession,
    path: str,
    name: str | None = None,
    version: int | None = None,
    where: list[tuple] | None = None,
    as_of: float | str | None = None,
) -> str:
    """Make a manifest table SQL-addressable: register a snapshot-isolated
    `read_table` frame as a temp view, so ``spark.sql`` (and the CLI's
    ``sql`` verb) reach transactional tables and time travel the way
    ``SELECT * FROM t VERSION AS OF n`` does in Delta — the view IS the
    pinned snapshot (deletion vectors applied, manifest schema projected,
    optional ``where`` manifest-level skipping baked in). Returns the view
    name (default: the table directory's basename, non-identifier
    characters mapped to ``_``). Re-registering the same name repoints it
    — register once per snapshot you want addressable."""
    if name is None:
        base = os.path.basename(os.path.normpath(path))
        name = "".join(c if c.isalnum() or c == "_" else "_" for c in base)
        if not name or name[0].isdigit():
            name = "t_" + name
    df = read_table(spark, path, version=version, where=where, as_of=as_of)
    df.createOrReplaceTempView(name)
    # record the binding so the SQL DML router (operators/sqldml.py) can
    # resolve INSERT/UPDATE/DELETE/MERGE statements against this view to
    # the underlying table path. Pinned registrations (version / as_of /
    # where) are read-only faces — DML against them is refused there.
    _VIEW_REGISTRY[name] = {
        "path": path,
        "pinned": version is not None or as_of is not None or where is not None,
        # the pin itself, for consumers that can honor it (SHALLOW CLONE
        # of a pinned view clones the pinned snapshot)
        "version": version,
        "as_of": as_of,
        "where": where,
    }
    return name


#: view name -> {"path": table path, "pinned": bool}; written by
#: `register_manifest_view`, read by the SQL DML router.
_VIEW_REGISTRY: dict[str, dict] = {}


def delete_where(
    spark: SparkSession,
    path: str,
    condition: Column | str | None = None,
    mode: str = "rewrite",
    keys: DataFrame | None = None,
    key_cols: list[str] | None = None,
) -> dict:
    """Transactional ``DELETE FROM <path> WHERE condition`` (the engine
    analog of /root/reference/geomesa.py:57-59). SQL DELETE semantics: rows
    where the condition is TRUE are removed; FALSE and NULL rows survive.

    ``mode="rewrite"`` (default): only files CONTAINING matching rows are
    rewritten; the rest carry over by reference. ``mode="dv"``: NO data
    file is rewritten at all — the matching rows' (file, position) pairs
    are recorded in a DELETION VECTOR (Delta's DV shape: one small
    sidecar parquet per delete commit, each affected file's manifest
    entry remapped to its cumulative vector), and every read anti-joins
    the vector before returning rows. At 100 TB this is the difference
    between rewriting a 1 GB file to drop 3 rows and writing a
    3-row sidecar; rewrites (delete/merge/OPTIMIZE) materialize and drop
    vectors naturally, so a vector's lifetime is bounded by the next
    touch of its file. Either way readers see the old snapshot until the
    single atomic manifest link — never a partial delete. Returns stats.

    ``keys=`` + ``key_cols=`` (instead of ``condition``) is the
    DISTRIBUTED key-set delete — ``DELETE ... WHERE key IN (SELECT ...)``
    as a semi-join against the keys frame, never a driver-collected
    predicate: the CDC/CDF apply path deletes arbitrary-size key batches
    this way (a million-key delete is one shuffle join, not a million-
    term IN list). NULL-keyed rows in ``keys`` are rejected loudly — a
    NULL never equality-matches, so the delete would silently drop."""
    if mode not in ("rewrite", "dv"):
        raise ValueError(f"delete_where mode must be rewrite|dv, got {mode!r}")
    if (condition is None) == (keys is None):
        raise ValueError("delete_where takes exactly one of condition= or keys=")
    if keys is not None:
        if not key_cols:
            raise ValueError("keys= requires key_cols=")
        kdf = keys.select(*key_cols).distinct()
        null_cond = None
        for k in key_cols:
            c = F.col(k).isNull()
            null_cond = c if null_cond is None else (null_cond | c)
        if kdf.where(null_cond).limit(1).count() > 0:
            raise ValueError(
                f"delete keys frame carries NULL value(s) in {key_cols}; "
                "NULL never equality-matches a live row — clean the key "
                "column upstream"
            )

        def _hit_filter(frame: DataFrame) -> DataFrame:
            return frame.join(kdf, key_cols, "left_semi")

        def _survivor_filter(frame: DataFrame) -> DataFrame:
            return frame.join(kdf, key_cols, "left_anti")

    else:
        cond = F.expr(condition) if isinstance(condition, str) else condition

        def _hit_filter(frame: DataFrame) -> DataFrame:
            return frame.where(cond)

        def _survivor_filter(frame: DataFrame) -> DataFrame:
            return frame.where(~F.coalesce(cond, F.lit(False)))
    version = current_version(path)
    if version < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    man = _read_manifest(path, version)
    if not man["files"]:
        # nothing to delete from — no state change, no version burned
        return {"version": version, "files_rewritten": 0, "files_carried": 0}
    from pyspark.sql.types import StructType

    # always project through the MANIFEST schema (same rule as read_table):
    # after a merge_schema append the live files carry MIXED physical
    # schemas, and plain inference would pick one file's — the rewrite
    # below must preserve evolved columns (null where a file lacks them)
    schema = StructType.fromJson(json.loads(man["schema"]))
    df = _scan_live_rows(
        spark, path, man, man["files"], schema, keep_meta=True
    )

    if mode == "dv":
        hits = _hit_filter(df).select(
            F.col("__file").alias("file"), F.col("__pos").alias("pos")
        )
        affected = sorted(
            r["file"] for r in hits.select("file").distinct().collect()
        )
        if not affected:
            return {
                "version": version, "files_rewritten": 0,
                "files_carried": len(man["files"]), "rows_deleted": 0,
            }
        new_dv = hits
        old_map = {f: d for f, d in (man.get("dvs") or {}).items()
                   if f in affected}
        if old_map:
            old_rows = spark.read.parquet(
                *[os.path.join(_data_dir(path), n)
                  for n in sorted(set(old_map.values()))]
            ).where(F.col("file").isin(list(old_map)))
            new_dv = new_dv.unionByName(old_rows).distinct()
        staged = _stage_files(new_dv.coalesce(1), path)
        if len(staged) != 1:  # coalesce(1) stages exactly one part file
            raise RuntimeError(f"dv staging produced {len(staged)} files")
        _commit(
            path, version + 1, man["schema"], man.get("txns", {}),
            man.get("stats_cols"), add=[], remove=[], op="delete",
            set_dv={f: staged[0] for f in affected},
            features=["deletionVectors"], prev_state=man,
        )
        return {
            "version": version + 1,
            "files_rewritten": 0,
            "files_carried": len(man["files"]),
            "files_vectored": len(affected),
            "dv_file": staged[0],
        }

    # locate the files that actually hold matching rows — one scan, and the
    # pushed condition prunes it like any filter
    hits = _hit_filter(df).select("__file").distinct().collect()
    hit_names = {r["__file"] for r in hits}
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
    survivors = _survivor_filter(
        _scan_live_rows(spark, path, man, sorted(hit_names), schema)
    )
    new_files = _stage_files(survivors, path)
    stats_cols = man.get("stats_cols")
    # carried files keep their recorded spans BY REFERENCE (the delta
    # never re-writes them); only the rewritten files' footers are read
    new_stats = (
        _collect_file_stats(path, new_files, stats_cols) if stats_cols else None
    )
    _commit(
        path, version + 1, man["schema"], man.get("txns", {}), stats_cols,
        add=new_files, remove=sorted(hit_names), add_stats=new_stats,
        op="delete", prev_state=man,
    )
    return {
        "version": version + 1,
        "files_rewritten": len(hit_names),
        "files_carried": len(carried),
    }


def update_where(
    spark: SparkSession,
    path: str,
    assignments: dict[str, "str | Column"],
    condition: "Column | str | None" = None,
) -> dict:
    """Transactional ``UPDATE <path> SET col = expr, ... [WHERE cond]``
    (Delta's UPDATE): only files CONTAINING matched rows are rewritten —
    each matched row gets every assignment applied (expressions evaluate
    against the row's OLD values, SQL semantics, so ``SET a = b, b = a``
    swaps); unmatched rows in those files carry through the rewrite
    verbatim; untouched files carry by reference. ``condition=None``
    updates every row. FALSE and NULL condition rows are untouched.

    Assignments cast to the column's EXISTING type (Delta's rule: an
    UPDATE never changes the table schema). Write-time constraints gate
    the rewritten frame before staging — an UPDATE that would break a
    CHECK/NOT NULL refuses loudly, no version burned. Assigning a
    PARTITION column is legal: the staged rewrite re-buckets rows into
    their new ``col=value`` directories (the hive layout is self-wired
    in `_stage_files`), so rows move partitions atomically with the
    commit. Zero matched rows -> no version burned, same contract as
    `delete_where`."""
    if not assignments:
        raise ValueError("update_where needs at least one SET assignment")
    version = current_version(path)
    if version < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    man = _read_manifest(path, version)
    if not man["files"]:
        return {"version": version, "files_rewritten": 0, "files_carried": 0}
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(man["schema"]))
    by_name = {f.name: f for f in schema.fields}
    for col in assignments:
        if col in _RESERVED_META_COLS:
            raise ValueError(f"cannot assign reserved metadata column {col!r}")
        if col not in by_name:
            raise ValueError(
                f"UPDATE assigns unknown column {col!r}; table columns are "
                f"{sorted(by_name)}"
            )
    cond = (
        F.lit(True) if condition is None
        else F.expr(condition) if isinstance(condition, str) else condition
    )
    matched = F.coalesce(cond, F.lit(False))  # NULL rows stay untouched
    df = _scan_live_rows(spark, path, man, man["files"], schema, keep_meta=True)
    hits = df.where(matched).select("__file").distinct().collect()
    hit_names = {r["__file"] for r in hits}
    if not hit_names:
        return {
            "version": version,
            "files_rewritten": 0,
            "files_carried": len(man["files"]),
        }
    carried = [f for f in man["files"] if f not in hit_names]
    hit_rows = _scan_live_rows(spark, path, man, sorted(hit_names), schema)
    # one projection applies every assignment simultaneously against the
    # old row (all when() branches read the SOURCE columns)
    out = hit_rows.select(
        *(
            F.when(
                matched,
                (
                    F.expr(a) if isinstance((a := assignments[f.name]), str)
                    else a
                ).cast(f.dataType),
            ).otherwise(F.col(f.name)).alias(f.name)
            if f.name in assignments
            else F.col(f.name)
            for f in schema.fields
        )
    )
    # generated-column interplay (Delta's UPDATE rule): assigning a
    # generated column directly is refused — it is always computed; an
    # assignment to a generator's SOURCE column recomputes the generated
    # value in the same rewrite (recompute is idempotent on untouched
    # rows, whose invariant already held), so a rewritten row can never
    # leave its partition value stale against its new source value
    gen = man.get("generated") or {}
    bad_gen = sorted(c for c in assignments if c in gen)
    if bad_gen:
        raise ValueError(
            f"UPDATE assigns generated column(s) {bad_gen}; generated "
            "columns are always computed — assign the source column and "
            "the generated value follows"
        )
    # identity columns are GENERATED ALWAYS: assigning one is refused;
    # the rewrite naturally PRESERVES values on updated/carried rows
    bad_ident = sorted(c for c in assignments if c in (man.get("identity") or {}))
    if bad_ident:
        raise ValueError(
            f"UPDATE assigns identity column(s) {bad_ident}; identity "
            "values are allocated at insert and immutable after"
        )
    for g, e in gen.items():
        if any(re.search(rf"\b{re.escape(c)}\b", e) for c in assignments):
            out = out.withColumn(g, F.expr(e).cast(by_name[g].dataType))
    # the rewritten frame (updated + carried-through rows of hit files)
    # must satisfy the table's invariants — same gate as append/merge
    _enforce_constraints(out, man.get("constraints"), path)
    new_files = _stage_files(out, path)
    stats_cols = man.get("stats_cols")
    new_stats = (
        _collect_file_stats(path, new_files, stats_cols) if stats_cols else None
    )
    _commit(
        path, version + 1, man["schema"], man.get("txns", {}), stats_cols,
        add=new_files, remove=sorted(hit_names), add_stats=new_stats,
        op="update", prev_state=man,
    )
    return {
        "version": version + 1,
        "files_rewritten": len(hit_names),
        "files_carried": len(carried),
    }


def merge_upsert(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    key_cols: list[str],
    txn_app: str | None = None,
    txn_id: int | None = None,
) -> dict | None:
    """Atomic MERGE by key (the Delta ``MERGE INTO`` upsert shape): rows
    of ``batch`` REPLACE existing rows with the same key, everything else
    appends — in ONE commit, so readers never observe the half-state a
    delete-then-append pair exposes between its two commits.

    File-granular like DELETE: one scan locates the files holding matched
    keys; only those are rewritten (their unmatched rows carried through
    the rewrite, matched rows replaced by the batch versions); untouched
    files carry by reference. A batch with duplicate keys is refused —
    "which version wins" must be resolved upstream (q115's latest-wins
    shape), not silently here.

    ``txn_app``/``txn_id`` give the same idempotent-writer watermark as
    `append_batch` — a replayed CDC micro-batch is a no-op returning
    None — making exactly-once streaming UPSERT a foreachBatch one-liner.
    Single-attempt commit like `delete_where`: a concurrent writer
    surfaces as `CommitConflict`; re-running re-reads current state and
    is key-idempotent. Returns stats, or None for a watermark-refused
    replay."""
    from pyspark.sql.types import StructType

    if (txn_app is None) != (txn_id is None):
        raise ValueError("txn_app and txn_id must be provided together")
    if not key_cols:
        raise ValueError("merge_upsert needs at least one key column")
    if batch.isEmpty():
        # same rule as append_batch: an empty batch merges nothing —
        # committing would burn a version per source hiccup; replay-safe
        return None
    version = current_version(path)
    if version < 0:
        raise ValueError(
            f"no committed manifest under {path!r}; use init_table/"
            "append_batch to create the table first"
        )
    man = _read_manifest(path, version)
    txns = dict(man.get("txns", {}))
    if txn_app is not None and txns.get(txn_app, -1) >= txn_id:
        return None  # replayed batch — the watermark refuses it
    if txn_app is not None:
        txns[txn_app] = txn_id
    schema = StructType.fromJson(json.loads(man["schema"]))
    _refuse_identity(man, path, "merge_upsert")
    # generated columns complete the batch BEFORE the schema check (a CDC
    # producer never carries them; computing them here keeps the strict
    # signature contract for everything else)
    batch = _apply_generated(batch, man.get("generated"), path)
    if _schema_sig(batch.schema.json()) != _schema_sig(man["schema"]):
        raise ValueError(
            f"merge batch schema does not match table schema at {path!r}; "
            "align the frame's columns/types before merging"
        )
    # same write-time gate as append_batch: a poison CDC batch is refused
    # before any scan or staging, no version burned
    _enforce_constraints(batch, man.get("constraints"), path)
    dup = batch.groupBy(*key_cols).count().where(F.col("count") > 1).limit(1)
    if dup.count() > 0:
        raise ValueError(
            "merge batch carries duplicate keys; resolve which version "
            "wins upstream (e.g. latest-wins by timestamp) before merging"
        )
    keys = batch.select(*key_cols)
    if not man["files"]:
        new_files = _stage_files(batch, path)
        stats_cols = man.get("stats_cols")
        stats = (
            _collect_file_stats(path, new_files, stats_cols)
            if stats_cols else None
        )
        _commit(
            path, version + 1, man["schema"], txns, stats_cols,
            add=new_files, add_stats=stats, op="merge", prev_state=man,
        )
        return {"version": version + 1, "files_rewritten": 0,
                "rows_inserted_files": len(new_files)}
    # dv-filtered scan (a row deleted by a deletion vector must neither
    # count as a match nor be resurrected by the rewrite); `__file` comes
    # from `_metadata`, which — unlike input_file_name() — is a real
    # column and survives above the semi-join
    table = _scan_live_rows(
        spark, path, man, man["files"], schema, keep_meta=True
    )
    # semi-join locates the hit files; AQE broadcasts a small batch's key
    # side at runtime — no forced hint, so a huge CDC batch can't be
    # collected to the driver.
    hits = (
        table.join(keys, key_cols, "left_semi")
        .select("__file")
        .distinct()
        .collect()
    )
    hit_names = {r["__file"] for r in hits}
    carried = [f for f in man["files"] if f not in hit_names]
    if hit_names:
        hit_rows = _scan_live_rows(
            spark, path, man, sorted(hit_names), schema
        )
        survivors = hit_rows.join(keys, key_cols, "left_anti")
        out = survivors.unionByName(batch.select(*schema.fieldNames()))
    else:
        out = batch.select(*schema.fieldNames())
    new_files = _stage_files(out, path)
    stats_cols = man.get("stats_cols")
    stats = (
        _collect_file_stats(path, new_files, stats_cols) if stats_cols else None
    )
    _commit(
        path, version + 1, man["schema"], txns, stats_cols,
        add=new_files, remove=sorted(hit_names), add_stats=stats, op="merge",
        prev_state=man,
    )
    return {
        "version": version + 1,
        "files_rewritten": len(hit_names),
        "files_carried": len(carried),
    }


def merge_clauses(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    matched: list[dict] | None = None,
    not_matched: list[dict] | None = None,
    not_matched_by_source: list[dict] | None = None,
    txn_app: str | None = None,
    txn_id: int | None = None,
) -> dict | None:
    """General MERGE (the full Delta ``MERGE INTO`` clause surface, which
    `merge_upsert` special-cases): conditional matched clauses with
    column-level assignments, insert clauses, and BY SOURCE clauses —
    ONE atomic commit, file-granular like DELETE/UPDATE (only files
    holding a row some clause CHANGES are rewritten; untouched files
    carry by reference).

    Clause lists — each entry a dict, evaluated in order,
    FIRST-MATCH-WINS per row (a row no clause accepts is carried /
    skipped, SQL MERGE semantics):

      * ``matched``: ``{"cond": sql|None, "action": "update"|"delete",
        "set": {col: sql} | "*"}`` — applied to target rows with a
        source match. ``"*"`` assigns every non-generated column from
        the source row.
      * ``not_matched``: ``{"cond": sql|None, "values":
        {col: sql} | "*"}`` — applied to source rows matching no target
        row; unassigned columns insert as null, ``"*"`` inserts the
        schema-aligned source row.
      * ``not_matched_by_source``: ``{"cond": sql|None, "action":
        "delete"|"update", "set": {col: sql}}`` — applied to target rows
        with no source match (Delta's table-sync shape: purge or flag
        rows that left the source).

    EXPRESSION NAMESPACE: target columns by bare name; source columns as
    ``__s_<name>`` (the SQL router rewrites ``t.col``/``s.col`` to this
    form). ``not_matched`` conditions/values see only source columns;
    ``not_matched_by_source`` expressions see only target columns.

    Source rows carrying duplicate keys are refused (which version wins
    must be resolved upstream) — stricter than Delta, which only refuses
    duplicates that actually match. NULL keys never match (SQL join
    semantics): such source rows flow to ``not_matched``, target rows to
    ``not_matched_by_source``.

    Explicitly assigning a GENERATED column is refused; generated
    columns recompute from their expressions for updated and inserted
    rows (the `update_where` rule). Constraints gate the full rewritten
    frame before staging. Zero changed rows and zero inserts -> returns
    with no version burned; ``txn_app``/``txn_id`` give the idempotent
    replay watermark (returns None on a replayed batch).

    Scale: the match is ONE equi-join on the merge keys (AQE broadcasts
    a small CDC batch); classification/assignment are pure JVM CASE
    chains inside the join's projection — no Python boundary, no second
    corpus pass. BY SOURCE clauses inspect every target row by nature
    (as in Delta); without them the scan stays bounded by the matched
    files."""
    from pyspark.sql.types import StructType

    if (txn_app is None) != (txn_id is None):
        raise ValueError("txn_app and txn_id must be provided together")
    if not key_cols:
        raise ValueError("merge_clauses needs at least one key column")
    if not (matched or not_matched or not_matched_by_source):
        raise ValueError("merge_clauses needs at least one WHEN clause")
    version = current_version(path)
    if version < 0:
        raise ValueError(
            f"no committed manifest under {path!r}; use init_table/"
            "append_batch to create the table first"
        )
    man = _read_manifest(path, version)
    _refuse_identity(man, path, "merge_clauses")
    txns = dict(man.get("txns", {}))
    if txn_app is not None and txns.get(txn_app, -1) >= txn_id:
        return None  # replayed batch — the watermark refuses it
    if txn_app is not None:
        txns[txn_app] = txn_id
    schema = StructType.fromJson(json.loads(man["schema"]))
    by_name = {f.name: f for f in schema.fields}
    gen = man.get("generated") or {}
    missing_keys = [k for k in key_cols if k not in by_name]
    if missing_keys:
        raise ValueError(f"merge keys {missing_keys} not in table schema")
    for k in key_cols:
        if k not in source.columns:
            raise ValueError(f"merge source is missing key column {k!r}")

    def _resolved_set(cl: dict) -> dict[str, str]:
        sets = cl.get("set") if "set" in cl else cl.get("values")
        if sets == "*":
            return {
                c: f"__s_{c}" for c in by_name
                if c not in gen
            }
        out = dict(sets or {})
        for c in out:
            if c not in by_name:
                raise ValueError(
                    f"MERGE assigns unknown column {c!r}; table columns "
                    f"are {sorted(by_name)}"
                )
            if c in gen:
                raise ValueError(
                    f"MERGE cannot assign generated column {c!r}; it "
                    "recomputes from its expression"
                )
            if c in _RESERVED_META_COLS:
                raise ValueError(f"cannot assign reserved column {c!r}")
        return out

    def _star_requires_source_cols(cl: dict) -> None:
        sets = cl.get("set") if "set" in cl else cl.get("values")
        if sets == "*":
            need = [
                c for c in by_name if c not in gen
                and c not in source.columns
            ]
            if need:
                raise ValueError(
                    f"MERGE ... SET/INSERT * needs source column(s) "
                    f"{need}; align the source frame first"
                )

    for cl in (*(matched or ()), *(not_matched or ())):
        _star_requires_source_cols(cl)
    for cl in not_matched_by_source or ():
        if (cl.get("set") or None) == "*":
            raise ValueError(
                "WHEN NOT MATCHED BY SOURCE has no source row; SET * is "
                "meaningless there — assign explicit expressions"
            )

    src = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in source.columns],
        F.lit(True).alias("__s___m"),
    )
    dup = (
        src.groupBy(*[f"__s_{k}" for k in key_cols]).count()
        .where(F.col("count") > 1).limit(1)
    )
    if dup.count() > 0:
        raise ValueError(
            "merge source carries duplicate keys; resolve which version "
            "wins upstream (e.g. latest-wins by timestamp) before merging"
        )

    def _cond_col(cl: dict) -> Column:
        c = cl.get("cond")
        return (
            F.lit(True) if not c
            else F.coalesce(F.expr(c), F.lit(False))
        )

    def _chain(whens: list[tuple[str, Column]]) -> Column:
        out = F.lit("carry")
        for label, cond in reversed(whens):
            out = F.when(cond, F.lit(label)).otherwise(out)
        return out

    m_list = [(f"m{i}", _cond_col(cl), cl)
              for i, cl in enumerate(matched or [])]
    s_list = [(f"s{i}", _cond_col(cl), cl)
              for i, cl in enumerate(not_matched_by_source or [])]
    del_labels = [
        lab for lab, _c, cl in (*m_list, *s_list)
        if cl.get("action") == "delete"
    ]
    upd_list = [
        (lab, cl) for lab, _c, cl in (*m_list, *s_list)
        if cl.get("action") == "update"
    ]
    for _lab, cl in upd_list:
        if not cl.get("set"):
            raise ValueError("MERGE UPDATE clause needs a SET map or '*'")

    tbl = _scan_live_rows(
        spark, path, man, man["files"], schema, keep_meta=True
    )
    join_cond = None
    for k in key_cols:
        term = tbl[k] == src[f"__s_{k}"]
        join_cond = term if join_cond is None else (join_cond & term)
    joined = tbl.join(src, join_cond, "left_outer")
    is_matched = F.coalesce(F.col("__s___m"), F.lit(False))
    action = F.when(is_matched, _chain([(l, c) for l, c, _ in m_list])) \
        .otherwise(_chain([(l, c) for l, c, _ in s_list]))
    joined = joined.withColumn("__action", action)

    # files holding at least one row some clause CHANGES — only these
    # are rewritten (Delta's touched-file set)
    hits = (
        joined.where(F.col("__action") != "carry")
        .select("__file").distinct().collect()
    )
    hit_names = {r["__file"] for r in hits}

    # insert candidates: source rows matching NO live target key
    ins = None
    if not_matched:
        tgt_keys = tbl.select(
            *[F.col(k).alias(f"__s_{k}") for k in key_cols]
        ).distinct()
        src_only = src.join(tgt_keys, [f"__s_{k}" for k in key_cols],
                            "left_anti")
        n_list = [(f"n{i}", _cond_col(cl), cl)
                  for i, cl in enumerate(not_matched)]
        src_only = src_only.withColumn(
            "__action", _chain([(l, c) for l, c, _ in n_list])
        ).where(F.col("__action") != "carry")
        cols = []
        table_defaults = man.get("defaults") or {}
        for f in schema.fields:
            if f.name in gen:
                continue  # recomputed below by _apply_generated
            # unassigned columns fill with the table's COLUMN DEFAULT
            # when one is declared (constant expressions — Delta's
            # allowColumnDefaults), else null
            val = (
                F.expr(table_defaults[f.name]).cast(f.dataType)
                if f.name in table_defaults
                else F.lit(None).cast(f.dataType)
            )
            for lab, _c, cl in n_list:
                vals = _resolved_set(cl)
                if f.name in vals:
                    val = F.when(
                        F.col("__action") == lab,
                        F.expr(vals[f.name]).cast(f.dataType),
                    ).otherwise(val)
            cols.append(val.alias(f.name))
        ins = src_only.select(*cols)
        ins = _apply_generated(ins, gen, path).select(
            *[f.name for f in schema.fields]
        )
        if ins.isEmpty():
            ins = None

    if not hit_names and ins is None:
        return {
            "version": version, "files_rewritten": 0,
            "files_carried": len(man["files"]), "inserted": False,
        }

    parts = []
    if hit_names:
        rew = joined.where(F.col("__file").isin(sorted(hit_names)))
        if del_labels:
            rew = rew.where(~F.col("__action").isin(del_labels))
        out_cols = []
        assigned: set[str] = set()
        for f in schema.fields:
            val = F.col(f.name)
            for lab, cl in upd_list:
                sets = _resolved_set(cl)
                if f.name in sets:
                    assigned.add(f.name)
                    val = F.when(
                        F.col("__action") == lab,
                        F.expr(sets[f.name]).cast(f.dataType),
                    ).otherwise(val)
            out_cols.append(val.alias(f.name))
        rew = rew.select(*out_cols)
        # generated columns whose inputs were assigned recompute (the
        # update_where rule; carried rows recompute to the same value)
        for g, e in gen.items():
            if any(re.search(rf"\b{re.escape(c)}\b", e) for c in assigned):
                rew = rew.withColumn(g, F.expr(e).cast(by_name[g].dataType))
        parts.append(rew)
    if ins is not None:
        parts.append(ins)
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    _enforce_constraints(out, man.get("constraints"), path)
    new_files = _stage_files(out, path)
    stats_cols = man.get("stats_cols")
    stats = (
        _collect_file_stats(path, new_files, stats_cols)
        if stats_cols else None
    )
    _commit(
        path, version + 1, man["schema"], txns, stats_cols,
        add=new_files, remove=sorted(hit_names), add_stats=stats,
        op="merge", prev_state=man,
    )
    return {
        "version": version + 1,
        "files_rewritten": len(hit_names),
        "files_carried": len(man["files"]) - len(hit_names),
        "inserted": ins is not None,
    }


def _file_all_match(col_stats: dict | None, pred: tuple) -> bool:
    """Can we PROVE every live row of a file satisfies ``pred`` from its
    recorded span alone? (The dual of `_file_survives`: that one proves
    NO row matches; this one proves ALL rows do.) Used by
    `overwrite_where` to drop fully-replaced files WITHOUT scanning them
    — the difference between reading one partition and reading zero
    bytes when replacing ``day = X`` on a day-clustered table. Every
    unknown (no stats, unknown null count, nulls present, lossy/unknown
    types, unsupported op) returns False: the file then takes the exact
    rewrite path, never a wrong answer. Containment survives the span's
    directed rounding — the recorded span is a SUPERSET of the true
    span, so recorded ⊆ predicate ⟹ true ⊆ predicate."""
    col, op, val = pred
    if not col_stats:
        return False
    nulls = (col_stats.get("__nulls__") or {}).get(col)
    if op == "isnull":
        rows = col_stats.get("__rows__")
        return nulls is not None and rows is not None and nulls == rows
    if nulls is None or nulls > 0:
        return False  # a NULL row satisfies no comparison -> it survives
    if op == "isnotnull":
        return True  # zero nulls proven above
    span = col_stats.get(col)
    if span is None:
        return False
    lo, hi = span[0], span[1]
    kind = span[2] if len(span) > 2 else None
    try:
        # literals round INTO the predicate's interval (opposite of
        # _file_survives): proving hi <= b needs b rounded DOWN
        if op in ("=", "=="):
            v_lo = _norm_literal(val, kind, "lo")
            v_hi = _norm_literal(val, kind, "hi")
            return (
                v_lo is not None and v_hi is not None
                and v_hi <= lo and hi <= v_lo
            )
        if op == "<":
            v = _norm_literal(val, kind, "lo")
            return v is not None and hi < v
        if op == "<=":
            v = _norm_literal(val, kind, "lo")
            return v is not None and hi <= v
        if op == ">":
            v = _norm_literal(val, kind, "hi")
            return v is not None and lo > v
        if op == ">=":
            v = _norm_literal(val, kind, "hi")
            return v is not None and lo >= v
        if op == "between":
            a = _norm_literal(val[0], kind, "hi")
            b = _norm_literal(val[1], kind, "lo")
            return a is not None and b is not None and a <= lo and hi <= b
        if op == "in":
            # point span equal to one of the IN values
            return any(
                (va := _norm_literal(v, kind, "lo")) is not None
                and (vb := _norm_literal(v, kind, "hi")) is not None
                and vb <= lo and hi <= va
                for v in val
            )
    except TypeError:
        return False
    return False


def overwrite_where(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    condition: "Column | str | None" = None,
    preds: list[tuple] | None = None,
    dynamic: bool = False,
) -> dict:
    """``INSERT OVERWRITE`` / Delta's ``replaceWhere`` as ONE atomic
    commit: rows matching the predicate are removed and ``batch`` takes
    their place — readers flip from old scope to new scope atomically,
    never observing the half-state a DELETE-commit + INSERT-commit pair
    exposes between its two versions (the production backfill idiom:
    "replace this day's partition").

    Scope forms (exactly one):
      * ``condition=None``, ``dynamic=False`` — full-table overwrite
        preserving table metadata (layout, constraints, generated
        columns, column mapping — unlike `init_table`'s overwrite,
        which may reset them).
      * ``condition=`` a SQL string / Column — replaceWhere. Every
        ``batch`` row must satisfy it (Delta's gate; refused loudly, no
        version burned, otherwise rows outside the scope would silently
        vanish into it).
      * ``preds=`` read_table-shape ``(col, op, value)`` tuples (ANDed)
        — same semantics, plus STATS-PROVEN classification: files whose
        recorded span shows every row matches (`_file_all_match`) are
        removed WITHOUT being scanned; only genuinely straddling files
        are rewritten for their surviving rows. At 100 TB replacing one
        day of a day-clustered table reads zero old bytes.
      * ``dynamic=True`` — dynamic partition overwrite: replaces exactly
        the partitions ``batch`` carries (requires a declared
        ``partition_by``; Spark's partitionOverwriteMode=dynamic).

    The batch passes the same write gates as append: generated columns
    computed/validated, constraints enforced, schema signature matched.
    An EMPTY batch with a matching scope still commits (scoped truncate);
    empty batch + empty scope burns no version."""
    n_scopes = sum(
        [condition is not None, preds is not None, bool(dynamic)]
    )
    if n_scopes > 1:
        raise ValueError(
            "overwrite_where takes at most one of condition=/preds=/"
            "dynamic=True"
        )
    version = current_version(path)
    if version < 0:
        raise ValueError(
            f"no committed manifest under {path!r}; use init_table to "
            "create the table first"
        )
    man = _read_manifest(path, version)
    _refuse_identity(man, path, "overwrite_where")
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(man["schema"]))
    batch = _apply_generated(batch, man.get("generated"), path)
    if _schema_sig(batch.schema.json()) != _schema_sig(man["schema"]):
        raise ValueError(
            f"overwrite batch schema does not match table schema at "
            f"{path!r}; align the frame's columns/types first"
        )
    _enforce_constraints(batch, man.get("constraints"), path)

    if dynamic:
        pcols = man.get("partition_cols") or []
        if not pcols:
            raise ValueError(
                "dynamic partition overwrite needs a declared "
                "partition_by layout"
            )
        tuples = [tuple(r) for r in batch.select(*pcols).distinct().collect()]
        if not tuples:
            return {
                "version": version, "files_removed": 0,
                "files_rewritten": 0,
                "files_carried": len(man["files"]),
            }
        if any(any(v is None for v in t) for t in tuples):
            raise ValueError(
                "dynamic overwrite batch carries NULL partition values; "
                "replace those partitions with an explicit condition"
            )
        if len(pcols) == 1:
            preds = [(pcols[0], "in", [t[0] for t in tuples])]
            condition = F.col(pcols[0]).isin([t[0] for t in tuples])
        else:
            cond = None
            for t in tuples:
                term = None
                for c, v in zip(pcols, t):
                    e = F.col(c) == F.lit(v)
                    term = e if term is None else (term & e)
                cond = term if cond is None else (cond | term)
            condition = cond
            preds = None  # multi-col tuples don't fold to ANDed preds

    if preds is not None:
        cond_col = None
        for pr in preds:
            e = _predicate_column(pr)
            cond_col = e if cond_col is None else (cond_col & e)
        if cond_col is None:
            raise ValueError("preds= needs at least one predicate")
    elif condition is not None:
        cond_col = (
            F.expr(condition) if isinstance(condition, str) else condition
        )
    else:
        cond_col = None  # full overwrite

    # replaceWhere gate: every batch row inside the scope (skipped for
    # full overwrite — everything is in scope)
    if cond_col is not None:
        outside = batch.where(
            ~F.coalesce(cond_col, F.lit(False))
        ).limit(1)
        if outside.count() > 0:
            raise ConstraintViolation(
                f"INSERT OVERWRITE into {path!r} refused: batch rows "
                "fall outside the replace scope — widen the predicate "
                "or filter the batch (Delta's replaceWhere rule)"
            )

    files = man["files"]
    stats = man.get("stats") or {}
    cmap = _cmap(man)
    if cond_col is None:
        removed, full, partial = list(files), list(files), []
    else:
        # tier 1: stats classify each file NO-MATCH (carry) /
        # ALL-MATCH (remove unscanned) / straddling (scan + rewrite)
        if preds is not None:
            phys = [_phys_pred(p, cmap) for p in preds]
            carried0 = [
                f for f in files
                if not all(_file_survives(stats.get(f), p) for p in phys)
            ]
            candidates = [f for f in files if f not in set(carried0)]
            full = [
                f for f in candidates
                if all(_file_all_match(stats.get(f), p) for p in phys)
            ]
            partial_cand = [f for f in candidates if f not in set(full)]
        else:
            full = []
            partial_cand = list(files)
        # tier 2: one scan of the undecided files locates actual hits
        if partial_cand:
            df = _scan_live_rows(
                spark, path, man, partial_cand, schema, keep_meta=True
            )
            hit = (
                df.where(F.coalesce(cond_col, F.lit(False)))
                .select("__file").distinct().collect()
            )
            partial = sorted({r["__file"] for r in hit})
        else:
            partial = []
        removed = sorted({*full, *partial})
        if not removed and batch.isEmpty():
            return {
                "version": version, "files_removed": 0,
                "files_rewritten": 0,
                "files_carried": len(files),
            }

    parts = [batch.select(*[f.name for f in schema.fields])]
    if cond_col is not None and partial:
        survivors = _scan_live_rows(
            spark, path, man, partial, schema
        ).where(~F.coalesce(cond_col, F.lit(False)))
        parts.append(survivors)
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    new_files = _stage_files(out, path)
    stats_cols = man.get("stats_cols")
    new_stats = (
        _collect_file_stats(path, new_files, stats_cols)
        if stats_cols else None
    )
    _commit(
        path, version + 1, man["schema"], man.get("txns", {}), stats_cols,
        add=new_files, remove=removed, add_stats=new_stats,
        op="overwrite_where", prev_state=man,
    )
    return {
        "version": version + 1,
        "files_removed": len(removed),
        "files_rewritten": len(partial) if cond_col is not None else 0,
        "files_carried": len(files) - len(removed),
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
    _commit(
        path, version + 1, man["schema"], man.get("txns", {}),
        man.get("stats_cols"), remove=man["files"], op="truncate",
        prev_state=man,
    )
    return version + 1


def compact_table(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    min_input_files: int = 2,
    cluster_by: str | None = None,
    zorder_by: list[str] | None = None,
    zorder_res: int | None = None,
    zorder_strategy: str = "minmax",
    max_commit_retries: int = 40,
    where: list[tuple] | None = None,
    incremental: bool = False,
) -> dict:
    """OPTIMIZE: bin-pack live files smaller than ``target_bytes`` into
    ~target-sized rewrites, published as ONE atomic commit (remove the
    inputs, add the packed files) under the same optimistic-concurrency
    loop as `append_batch`. This is what the reference's pipeline-final
    `compact_table` (/root/reference/geomesa_cassandra.py:188-191) maps
    to on the manifest layout — and what a long-lived streamed table
    (`streaming/sinks.stream_to_manifest` appends one file set per
    micro-batch forever) needs to stay readable: without it the scan
    opens thousands of tiny files.

    Clustering: rewrites are range-clustered + sorted on ``cluster_by``
    (default: the table's first declared stats column, if any), so
    compaction also REPAIRS data-skipping locality — interleaved small
    appends each spanning the whole key range become tight disjoint
    spans. With no cluster key the inputs are coalesced (no shuffle).

    ``zorder_by=[a, b, ...]`` turns the compaction into Delta's
    ``OPTIMIZE ... ZORDER BY``: EVERY live file is rewritten, clustered
    by the general N-column interleave (`geo.zorder_by`), and the named
    columns are added to the table's declared stats columns — an
    append-only table accumulated in arrival order becomes multi-column
    skippable in one atomic commit (deletion vectors materialize and
    drop on the way, like any rewrite).

    ``where`` scopes the compaction (Delta's ``OPTIMIZE ... WHERE``):
    only files whose recorded span can match the predicates — same
    (col, op, value) shapes as `read_table(where=)` — are eligible
    inputs; everything else carries by reference. The operational shape
    at 100 TB: a streamed date-partitioned table compacts TODAY'S
    partition each night without touching the other ten thousand, so
    the rewrite cost is O(day), not O(table). Composes with
    ``zorder_by`` (re-layout just the scoped slice) and with partition
    columns (whose spans are exact, so a partition predicate scopes
    exactly). Rows never change — the scope changes only which files
    rewrite.

    ``incremental=True`` (with ``zorder_by``) is LIQUID-STYLE
    incremental clustering: every z-order rewrite tags its output files
    with the clustering spec (a ZCube-provenance entry in the manifest,
    carried by state resolution, dying with the file), and an
    incremental pass SKIPS files already tagged with the same spec —
    so repeated OPTIMIZE on a mostly-clustered 100 TB table rewrites
    O(new files), not O(table). The skipped cubes and the fresh cube
    are independently curve-clustered (pruning rides per-file stats
    either way — Delta liquid clustering's exact tradeoff); a changed
    key/resolution/strategy invalidates the tags and the next pass
    rewrites everything. dv-carrying files always participate (the
    rewrite is their sanctioned materialization route).

    Concurrency: data files are staged once; only the metadata commit
    retries. A conflicting commit is re-read and checked — if any input
    file is no longer live (a racing DELETE/TRUNCATE rewrote it),
    committing would resurrect its removed rows, so the compaction
    ABORTS cleanly instead (staged files stay unreferenced; vacuum
    reclaims them). Racing appends are commutative and the retry simply
    lands on the next version. Returns stats (with an ``aborted`` reason
    when applicable)."""
    from pyspark.sql.types import StructType

    version = current_version(path)
    if version < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    man = _read_manifest(path, version)
    data = _data_dir(path)
    sizes: dict[str, int] = {}
    for f in man["files"]:
        try:
            sizes[f] = os.path.getsize(os.path.join(data, f))
        except FileNotFoundError:
            sizes[f] = target_bytes  # unexpected; treat as not-compactable
    dv_map = man.get("dvs") or {}
    # files carrying a deletion vector are ALWAYS eligible: compaction is
    # the sanctioned dv-materialization route (rewrite without the
    # deleted rows, mapping dropped by _apply_delta), Delta's
    # OPTIMIZE-purges-DVs behavior
    scope = man["files"]
    if where and man.get("stats_cols"):
        # OPTIMIZE ... WHERE: only span-matching files are inputs; the
        # check is the same conservative _file_survives the reads use,
        # so a file with missing stats stays IN scope (superset — it may
        # hold matching rows, and rewriting it is always value-safe)
        stats = man.get("stats") or {}
        cm = _cmap(man)  # stats/footers are keyed PHYSICAL
        scope = [
            f for f in scope
            if all(_file_survives(stats.get(f), _phys_pred(p, cm)) for p in where)
        ]
    zspec = (
        f"z:{','.join(zorder_by)}:{zorder_res}:{zorder_strategy}"
        if zorder_by else None
    )
    if zorder_by and incremental:
        # liquid-style: skip files a previous pass already clustered
        # under the SAME spec (their tag dies with any rewrite, so the
        # tag set is exactly the still-valid cubes)
        tags = man.get("zcube") or {}
        inputs = sorted(
            f for f in scope
            if tags.get(f) != zspec or f in dv_map
        )
        if not inputs:
            return {
                "version": version, "files_compacted": 0,
                "files_written": 0, "files_skipped_clustered": len(scope),
            }
    elif zorder_by:
        # OPTIMIZE ZORDER: a re-layout, not a bin-pack — every scoped
        # live file participates so the slice ends up curve-clustered
        inputs = sorted(scope)
    else:
        inputs = sorted(
            f for f in scope if sizes[f] < target_bytes or f in dv_map
        )
    if not inputs or (
        not zorder_by
        and len(inputs) < max(2, min_input_files)
        and not any(f in dv_map for f in inputs)
    ):
        return {"version": version, "files_compacted": 0, "files_written": 0}
    schema = StructType.fromJson(json.loads(man["schema"]))
    total = sum(sizes[f] for f in inputs)
    n_out = max(1, -(-total // target_bytes))  # ceil
    df = _scan_live_rows(spark, path, man, inputs, schema)
    input_dvs = {f: dv_map.get(f) for f in inputs}
    stats_cols = man.get("stats_cols")
    if zorder_by:
        missing_z = [c for c in zorder_by if c not in schema.fieldNames()]
        if missing_z:
            raise ValueError(
                f"zorder_by column(s) {missing_z} not in table schema"
            )
        packed = _zorder_cluster(df, zorder_by, zorder_res, zorder_strategy, n_out)
        stats_cols = list(
            dict.fromkeys([*(stats_cols or []), *zorder_by])
        )
    else:
        key = cluster_by or next(iter(man.get("stats_cols") or ()), None)
        if key is not None and key in schema.fieldNames():
            packed = df.repartitionByRange(n_out, F.col(key)).sortWithinPartitions(key)
        else:
            # no cluster key: pure bin-packing — coalesce is shuffle-free (the
            # scan already groups small files into ~maxPartitionBytes splits)
            packed = df.coalesce(n_out)
    staged = _stage_files(packed, path)
    new_stats = (
        _collect_file_stats(path, staged, stats_cols) if stats_cols else None
    )
    input_set = set(inputs)
    for _ in range(max_commit_retries):
        try:
            _commit(
                path, version + 1, man["schema"], man["txns"], stats_cols,
                add=staged, remove=inputs, add_stats=new_stats, op="compact",
                prev_state=man,
                # clustering provenance: z-order outputs tag with the
                # spec so a later incremental pass can skip them
                zcube=(
                    {f: zspec for f in staged} if zspec else None
                ),
            )
            return {
                "version": version + 1,
                "files_compacted": len(inputs),
                "files_written": len(staged),
                **(
                    {"files_skipped_clustered": len(scope) - len(inputs)}
                    if zorder_by and incremental else {}
                ),
            }
        except CommitConflict:
            version = current_version(path)
            man = _read_manifest(path, version)
            if not input_set <= set(man["files"]):
                return {
                    "version": version, "files_compacted": 0,
                    "files_written": 0,
                    "aborted": "input files rewritten by a concurrent commit",
                }
            if any(
                (man.get("dvs") or {}).get(f) != input_dvs[f] for f in inputs
            ):
                # a racing dv-delete marked rows in an input AFTER we
                # staged its rewrite; committing would resurrect them
                return {
                    "version": version, "files_compacted": 0,
                    "files_written": 0,
                    "aborted": "input deletion vectors changed by a "
                               "concurrent delete",
                }
            # a racing merge_schema append may have evolved the schema: the
            # packed files were written under the OLD schema, which stays
            # valid — reads project through the manifest schema and
            # null-backfill the added columns — so carry the winner's
            # schema/txns and recommit
    raise CommitConflict(
        f"compact of {path!r} lost {max_commit_retries} consecutive commit "
        "races; back off and retry"
    )


def replace_table_layout(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None,
    zorder_by: list[str] | None = None,
    zorder_res: int | None = None,
    zorder_strategy: str = "minmax",
) -> dict:
    """PARTITION EVOLUTION (Delta's ``REPLACE TABLE ... PARTITIONED BY``
    shape): one full-rewrite commit that re-buckets the LIVE snapshot
    under a new ``partition_by`` (``None``/``[]`` = de-partition to a
    flat layout), optionally z-ordering inside the new layout. History
    is preserved and travelable — every older version still reads under
    the layout it committed with (layout is per-snapshot state, and the
    old files are only de-referenced, not touched) — and the new layout
    governs every later write through `_stage_files`' self-wiring.

    The rewrite is value-neutral: deletion vectors are applied by the
    scan (and therefore materialized — same as OPTIMIZE), write-time
    constraints are untouched, txn watermarks carry. Partition columns
    must exist in the schema; they are prepended to ``stats_cols`` so
    the new layout's exact [v, v] spans prune immediately.

    Single-attempt commit with the same conflict posture as OPTIMIZE: a
    commit racing the rewrite aborts it cleanly (the staged files are
    left for vacuum) rather than resurrecting its deletes."""
    from pyspark.sql.types import StructType

    version = current_version(path)
    if version < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    man = _read_manifest(path, version)
    schema = StructType.fromJson(json.loads(man["schema"]))
    new_parts = list(partition_by or [])
    missing = [c for c in new_parts if c not in schema.fieldNames()]
    if missing:
        raise ValueError(
            f"replace_table_layout: partition column(s) {missing} not in "
            f"table schema {schema.fieldNames()}"
        )
    old_parts = list(man.get("partition_cols") or [])
    stats_cols = man.get("stats_cols")
    cmap = _cmap(man)
    if new_parts:
        # the new partition columns' PHYSICAL names join stats_cols so
        # the hive spans prune from the first read
        phys_parts = [cmap.get(c, c) for c in new_parts]
        stats_cols = list(dict.fromkeys([*phys_parts, *(stats_cols or [])]))
    df = _scan_live_rows(spark, path, man, man["files"], schema)
    input_dvs = dict(man.get("dvs") or {})
    if zorder_by:
        missing_z = [c for c in zorder_by if c not in schema.fieldNames()]
        if missing_z:
            raise ValueError(
                f"zorder_by column(s) {missing_z} not in table schema"
            )
        n_out = max(1, df.rdd.getNumPartitions())
        df = _zorder_cluster(df, zorder_by, zorder_res, zorder_strategy, n_out)
        stats_cols = list(
            dict.fromkeys([*(stats_cols or []),
                           *[cmap.get(c, c) for c in zorder_by]])
        )
    staged = _stage_files(df, path, partition_by=new_parts)
    new_stats = (
        _collect_file_stats(path, staged, stats_cols) if stats_cols else None
    )
    try:
        _commit(
            path, version + 1, man["schema"], man["txns"], stats_cols,
            add=staged, remove=man["files"], add_stats=new_stats,
            op="replace_layout", partition_cols=new_parts,
            features=["partitionColumns"] if new_parts else None,
            prev_state=man,
        )
    except CommitConflict:
        cur = current_version(path)
        cur_man = _read_manifest(path, cur)
        if set(man["files"]) <= set(cur_man["files"]) and all(
            (cur_man.get("dvs") or {}).get(f) == input_dvs.get(f)
            for f in man["files"]
        ):
            # the race only appended: the staged rewrite misses the new
            # rows, so re-running is required — but nothing is corrupted
            raise CommitConflict(
                f"replace_table_layout on {path!r} lost a commit race; "
                "re-run (the table is unchanged)"
            ) from None
        raise CommitConflict(
            f"replace_table_layout on {path!r} raced a commit that "
            "rewrote or dv-masked its inputs; re-run against the new state"
        ) from None
    return {
        "version": version + 1,
        "old_partition_by": old_parts,
        "new_partition_by": new_parts,
        "files_rewritten": len(man["files"]),
        "files_written": len(staged),
    }


#: widening-only casts `rewrite_table_schema` accepts, by Spark
#: simpleString: every value representable in the source type is exactly
#: representable in the target (int->double is exact: |int| < 2^53;
#: long->double is NOT and is refused).
_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
    ("tinyint", "float"), ("smallint", "float"),
    ("date", "timestamp_ntz"),
}

_DECIMAL_RE = re.compile(r"^decimal\((\d+),(\d+)\)$")


def _is_widening(src: str, dst: str) -> bool:
    if src == dst:
        return True
    if (src, dst) in _WIDENINGS:
        return True
    ms, md = _DECIMAL_RE.match(src), _DECIMAL_RE.match(dst)
    if ms and md:
        # same scale, no smaller precision: every old value fits exactly
        return int(md.group(2)) == int(ms.group(2)) and int(md.group(1)) >= int(
            ms.group(1)
        )
    return False


def rewrite_table_schema(
    spark: SparkSession, path: str, cast_map: dict[str, str]
) -> int:
    """The explicit type-widening migration `_merge_schemas`' refusal
    points at: rewrite EVERY live file with the requested column casts
    and commit the result (with the new schema) as one new version.
    Only lossless widenings are accepted (`_is_widening`) — a narrowing
    or lossy cast raises before any data is written. Time travel across
    the boundary keeps working because every version carries its own
    schema. Single-attempt commit: a concurrent writer surfaces as
    `CommitConflict` — rerun the migration (it is idempotent in effect)."""
    version = current_version(path)
    if version < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    man = _read_manifest(path, version)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(man["schema"]))
    names = schema.fieldNames()
    unknown = sorted(set(cast_map) - set(names))
    if unknown:
        raise ValueError(f"rewrite_table_schema: no such column(s): {unknown}")
    src_types = {f.name: f.dataType.simpleString() for f in schema.fields}
    # normalize the requested type through Spark's parser so synonyms
    # (integer/int, long/bigint) compare canonically
    empty = spark.createDataFrame([], schema)
    target = empty.select(
        *[
            F.col(n).cast(cast_map[n]).alias(n) if n in cast_map else F.col(n)
            for n in names
        ]
    )
    dst_types = {f.name: f.dataType.simpleString() for f in target.schema.fields}
    for col in cast_map:
        if not _is_widening(src_types[col], dst_types[col]):
            raise ValueError(
                f"rewrite_table_schema: {src_types[col]} -> {dst_types[col]} "
                f"on column {col!r} is not a lossless widening; refusing "
                "(narrowings/lossy casts need an explicit transform + "
                "init_table)"
            )
    df = read_table(spark, path)
    out = df.select(
        *[
            F.col(n).cast(cast_map[n]).alias(n) if n in cast_map else F.col(n)
            for n in names
        ]
    )
    staged = _stage_files(out, path)
    stats_cols = man.get("stats_cols")
    new_stats = (
        _collect_file_stats(path, staged, stats_cols) if stats_cols else None
    )
    _commit(
        path, version + 1, out.schema.json(), man["txns"], stats_cols,
        add=staged, remove=man["files"], add_stats=new_stats,
        op="rewrite-schema", prev_state=man,
    )
    return version + 1


def convert_to_manifest(
    spark: SparkSession,
    path: str,
    stats_cols: list[str] | None = None,
) -> dict:
    """Delta's ``CONVERT TO DELTA`` for the manifest layer: take an
    EXISTING plain-parquet directory and commit a v0 manifest that
    references its files — not one data byte is rewritten (each file is
    renamed into the table's ``data/`` dir: same-filesystem inode moves,
    O(files) metadata ops). Per-file min/max stats for ``stats_cols``
    harvest from the footers the original writer already produced, so
    file skipping works from the first read. After conversion the full
    transactional surface applies (DML, time travel, OPTIMIZE, CDF, the
    streaming feed).

    HIVE-PARTITIONED layouts (``key=value`` dirs) convert in place too:
    the partition keys (which the writer stripped from the file bytes)
    are harvested from the directory names into (a) a declared
    ``partition_by`` layout, (b) per-file EXACT ``[v, v]`` stats spans —
    so partition pruning equals a native partitioned table's — and
    (c) a ``path_values`` manifest map that makes snapshot reads inject
    the constants via basePath partition discovery (the
    ``pathPartitionValues`` reader feature; see `_scan_live_rows`). New
    files written after conversion carry the columns IN the files like
    any engine-native partitioned table; the path-injected set only ever
    shrinks as rewrites touch the converted files.

    CRASH/RACE SAFE and RESUMABLE: files already under ``data/`` (a
    previous crashed or racing conversion) are enumerated and carried to
    the commit; a rename that disappears mid-flight (the racing
    converter moved it) is tolerated when the file turned up under
    ``data/``; a lost v0 commit race degrades to the winner's result
    when the winner references the same files. Delta's CONVERT is
    retryable for the same reason.

    Refused: an already-converted path (a manifest exists — idempotent
    callers catch the ValueError), an empty directory, and a MIXED
    layout (some files under ``key=value`` dirs, some not, or differing
    key lists — no coherent partition declaration exists for it)."""
    import urllib.parse

    if current_version(path) >= 0:
        raise ValueError(
            f"convert_to_manifest: {path!r} already has a manifest "
            f"(v{current_version(path)})"
        )
    data = _data_dir(path)

    def _walk(root_dir: str, skip_engine_dirs: bool) -> list[str]:
        out: list[str] = []
        for root, dirs, files in os.walk(root_dir):
            rel_root = os.path.relpath(root, root_dir)
            if skip_engine_dirs and rel_root.split(os.sep)[0] in (
                "_manifest", "data",
            ):
                continue
            if rel_root.split(os.sep)[0].startswith(".staging-"):
                continue
            for f in files:
                if f.endswith(".parquet"):
                    out.append(
                        f if rel_root == "." else os.path.join(rel_root, f)
                    )
        return out

    outside = _walk(path, True)
    already_moved = _walk(data, False) if os.path.isdir(data) else []
    names = sorted(set(outside) | set(already_moved))
    if not names:
        raise ValueError(
            f"convert_to_manifest: no parquet files under {path!r}"
        )

    def _partition_pairs(name: str) -> list[tuple[str, str]]:
        segs = name.split(os.sep)[:-1]
        return [
            (seg.split("=", 1)[0], urllib.parse.unquote(seg.split("=", 1)[1]))
            for seg in segs if "=" in seg
        ]

    first = _partition_pairs(names[0])
    part_cols = [k for k, _ in first]
    path_values: dict[str, dict] = {}
    for name in names:
        pairs = _partition_pairs(name)
        if [k for k, _ in pairs] != part_cols or (
            part_cols and len(name.split(os.sep)) != len(part_cols) + 1
        ):
            raise ValueError(
                f"convert_to_manifest: {path!r} mixes partition layouts "
                f"({names[0]!r} vs {name!r}); no coherent partition "
                "declaration covers both — rewrite through "
                "init_table(partition_by=...) instead"
            )
        if part_cols:
            path_values[name] = dict(pairs)

    moved_set = set(already_moved)
    for name in sorted(set(outside) - moved_set):
        dst = os.path.join(data, name)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.rename(os.path.join(path, name), dst)
        except FileNotFoundError:
            # a racing converter moved it first — fine iff it actually
            # landed under data/ (otherwise the file vanished: re-raise)
            if not os.path.exists(dst):
                raise

    # schema inference AFTER the moves, over data/ itself: basePath
    # partition discovery types the harvested keys (int/date/... per
    # Spark's partitionColumnTypeInference) and appends them to the
    # file schema — exactly what the manifest must declare
    schema_json = (
        spark.read.option("basePath", data).parquet(data).schema.json()
        if part_cols
        # flat layouts may nest plain subdirs — list the files explicitly
        # (a bare directory read does not recurse without discovery)
        else spark.read.parquet(
            *[os.path.join(data, f) for f in names]
        ).schema.json()
    )
    by_name = {
        f["name"]: f["type"]
        for f in json.loads(schema_json).get("fields", [])
        if isinstance(f, dict)
    }
    eff_stats = list(
        dict.fromkeys([*(stats_cols or []), *part_cols])
    ) or None
    add = names
    add_stats = (
        _collect_file_stats(path, add, eff_stats) if eff_stats else None
    )
    if part_cols and add_stats is not None:
        for name in add:
            vals = path_values.get(name) or {}
            for col in part_cols:
                add_stats[name][col] = _partition_span(
                    vals.get(col), by_name.get(col)
                )
    features = []
    if part_cols:
        features = ["partitionColumns", "pathPartitionValues"]
    try:
        _commit(
            path, 0, schema_json, {}, eff_stats,
            add=add, add_stats=add_stats, op="convert",
            partition_cols=part_cols or None,
            features=features or None,
            path_values=path_values or None,
        )
    except CommitConflict:
        # a racing converter published v0 first; when it references the
        # same files this conversion already succeeded — return its shape
        st = _read_manifest(path, current_version(path))
        if set(add) <= set(st["files"]):
            return {
                "version": st["version"],
                "files_converted": len(add),
                "stats_cols": list(st.get("stats_cols") or []),
                "partition_by": list(st.get("partition_cols") or []),
                "raced": True,
            }
        raise
    return {
        "version": 0,
        "files_converted": len(add),
        "stats_cols": list(eff_stats or []),
        "partition_by": list(part_cols),
    }


def _partition_span(raw: str | None, spark_type) -> list | None:
    """An EXACT ``[v, v]`` stats span for one hive partition value,
    typed to the declared column so `_file_survives` compares it the
    same way footer-harvested spans compare. Undecodable values (the
    null partition, exotic types) return None — never skipped, always
    conservative."""
    import datetime

    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    t = spark_type if isinstance(spark_type, str) else None
    try:
        if t in ("integer", "long", "short", "byte"):
            v = int(raw)
        elif t in ("float", "double"):
            v = float(raw)
        elif t == "date":
            v = _norm_stat(datetime.date.fromisoformat(raw))
        elif t == "string":
            v = raw
        else:
            return None
    except (ValueError, TypeError):
        return None
    return [v, v]


def restore_table(path: str, version: int) -> dict:
    """RESTORE TABLE ... TO VERSION AS OF ``version`` (the Delta RESTORE
    shape): roll the table back to an older snapshot AS A NEW COMMIT —
    history is preserved (the bad commits stay auditable and
    time-travelable until vacuum), readers flip atomically, and a racing
    writer conflicts instead of interleaving. The commit re-adds the
    target's files that were dropped since, removes the ones added
    since, restores the target's SCHEMA and deletion-vector map (set_dv
    for files the target masked, unset_dv for files vectored after the
    target — the masked rows un-delete, which the change feed reports as
    position-delta INSERT images), and carries the CURRENT txn
    watermarks forward so replayed producer batches stay refused across
    the restore. Fails with the time-travel diagnostics if the target's
    manifests or data files were vacuumed. Returns stats."""
    latest = current_version(path)
    if latest < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    if version == latest:
        return {"version": latest, "files_added": 0, "files_removed": 0}
    target = _resolve_manifest(path, version)  # named vacuum diagnostics
    cur = _read_manifest(path, latest)
    cur_files, tgt_files = set(cur["files"]), set(target["files"])
    add = sorted(tgt_files - cur_files)
    remove = sorted(cur_files - tgt_files)
    tgt_dvs = target.get("dvs") or {}
    cur_dvs = cur.get("dvs") or {}
    # shared files whose vector must change: set to the target's mapping
    # where it differs, clear where the target had none
    set_dv = {
        f: d for f, d in tgt_dvs.items() if cur_dvs.get(f) != d
    }
    unset_dv = [
        f for f in cur_dvs
        if f in tgt_files and f not in tgt_dvs
    ]
    stats_cols = target.get("stats_cols")
    add_stats = (
        {f: (target.get("stats") or {}).get(f) for f in add}
        if stats_cols else None
    )
    # re-added files bring back their provenance maps: a converted-hive
    # file's path_values entry died with the file in _apply_delta when a
    # later commit dropped it, so the restore must re-state it or the
    # partition columns (absent from the file bytes) silently read NULL;
    # same for clustering zcube tags (incremental OPTIMIZE would
    # otherwise re-cluster files the target had already clustered)
    tgt_pv = target.get("path_values") or {}
    tgt_zc = target.get("zcube") or {}
    _commit(
        path, latest + 1, target["schema"], cur.get("txns", {}), stats_cols,
        add=add, remove=remove, add_stats=add_stats, op="restore",
        set_dv=set_dv, unset_dv=unset_dv, prev_state=cur,
        path_values={f: tgt_pv[f] for f in add if f in tgt_pv} or None,
        zcube={f: tgt_zc[f] for f in add if f in tgt_zc} or None,
        # the TARGET's defaults map comes back with its schema: leaving
        # the CURRENT map in force would keep a stale default for a
        # column the rollback removed, which would silently re-apply to
        # a later same-named ADD COLUMN (the hazard drop_column purges)
        defaults=target.get("defaults"),
        # identity: the SPEC follows the target schema, but the
        # HIGH-WATER marks stay monotone across the rollback (never
        # reissue a value — rows allocated by the rolled-back commits
        # may live in downstream systems; same rule as column_map_seq)
        identity=(
            {
                c: {
                    **spec,
                    "high": max(
                        spec["high"],
                        ((cur.get("identity") or {}).get(c) or spec)["high"],
                    ),
                }
                for c, spec in target["identity"].items()
            }
            if target.get("identity") else target.get("identity")
        ),
        # the PARTITION LAYOUT comes back with the target's files: a
        # restore across a replace_table_layout boundary re-adds files
        # staged under the OLD layout, so the declaration must follow
        # them or the layout invariant breaks (hive dirs vs a flat
        # declaration) — [] resets to flat when the target was flat
        partition_cols=target.get("partition_cols") or [],
        # the target's logical names come back with its schema, so its
        # column map must come back too; the physical-name SEQUENCE stays
        # monotone across the rollback (never reissue a physical id)
        column_map=target.get("column_map"),
        column_map_seq=max(
            cur.get("column_map_seq", 0), target.get("column_map_seq", 0)
        ),
    )
    return {
        "version": latest + 1,
        "restored_to": version,
        "files_added": len(add),
        "files_removed": len(remove),
        "vectors_set": len(set_dv),
        "vectors_cleared": len(unset_dv),
    }


def clone_table(
    src: str,
    dst: str,
    version: int | None = None,
    as_of: float | str | None = None,
) -> dict:
    """SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW CLONE src``): a
    new table whose v0 manifest REFERENCES the source snapshot's data
    files (and deletion-vector sidecars) by absolute path — a
    metadata-only commit, zero bytes of data copied. Schema, per-file
    stats (skipping works immediately), deletion vectors, partition
    layout, constraints, and the column map all carry over; the clone's
    history starts fresh at v0 (op="clone", the source path recorded in
    the body for lineage).

    Divergence contract: the clone is a full read-write table. Appends,
    deletes (rewrite AND dv mode), updates, merges, compaction, and
    restore all work; rewrites land in the CLONE's own data dir and drop
    the absolute references they replace — the source is never written.
    `compact_table` doubles as CLONE MATERIALIZATION: one call rewrites
    every still-referenced source file locally and the clone owns all
    its bytes. Vacuum on the CLONE can never delete source bytes
    structurally (its sweep walks only the clone's own data dir);
    vacuum on the SOURCE does not know about clones and can invalidate
    them — Delta documents the same shallow-clone caveat, and
    `compact_table(dst)` before vacuuming the source closes it.

    The streaming feed refuses commits carrying absolute references
    (materialize first, or start the feed past v0); batch reads, time
    travel, CDF, and SQL views are clone-transparent.

    ``version``/``as_of`` pin the source snapshot (mutually exclusive,
    same contract as `read_table`). Fails if ``dst`` already exists."""
    if version is not None and as_of is not None:
        raise ValueError("pass at most one of version= / as_of=")
    if current_version(dst) >= 0:
        raise ValueError(f"clone target {dst!r} already exists")
    if as_of is not None:
        version = version_as_of(src, _parse_as_of(as_of))
    man = _resolve_manifest(src, version)
    src_data = os.path.abspath(_data_dir(src))

    def _abs(f: str) -> str:
        return f if os.path.isabs(f) else os.path.join(src_data, f)

    add = sorted(_abs(f) for f in man["files"])
    stats_cols = man.get("stats_cols")
    add_stats = (
        {_abs(f): (man.get("stats") or {}).get(f) for f in man["files"]}
        if stats_cols else None
    )
    set_dv = None
    src_dvs = man.get("dvs") or {}
    if src_dvs:
        # deletion-vector rows key files by the SOURCE's data/-relative
        # names; the clone's identities are absolute, so the sidecar is
        # re-keyed into one clone-owned parquet (rows are (file, pos)
        # pairs — KBs, the only bytes a shallow clone writes). Pure
        # pyarrow: no Spark session needed for a metadata operation.
        import pyarrow as pa
        import pyarrow.parquet as pq

        files_out, pos_out = [], []
        for sidecar in sorted(set(src_dvs.values())):
            t = pq.read_table(
                _abs(sidecar) if not os.path.isabs(sidecar) else sidecar,
                columns=["file", "pos"],
            )
            for f, p in zip(
                t.column("file").to_pylist(), t.column("pos").to_pylist()
            ):
                # keep only rows for files this sidecar still masks in
                # the cloned snapshot (cumulative sidecars can carry
                # rows for files since rewritten)
                if src_dvs.get(f) == sidecar:
                    files_out.append(_abs(f))
                    pos_out.append(p)
        # commit-unique sidecar name (same discipline as _stage_files): a
        # racing cloner that loses the v0 commit must leave only an
        # orphan file, never overwrite the winner's referenced sidecar —
        # two racers with different source/pinned args would otherwise
        # silently corrupt the winner's deletion vectors
        dv_name = f"dv-clone-v0-{uuid.uuid4().hex[:12]}.parquet"
        os.makedirs(_data_dir(dst), exist_ok=True)
        pq.write_table(
            pa.table(
                {"file": pa.array(files_out, pa.string()),
                 "pos": pa.array(pos_out, pa.int64())}
            ),
            os.path.join(_data_dir(dst), dv_name),
        )
        set_dv = {_abs(f): dv_name for f in src_dvs}
    _commit(
        dst, 0, man["schema"], {}, stats_cols,
        add=add, add_stats=add_stats, op="clone", set_dv=set_dv,
        partition_cols=man.get("partition_cols") or [],
        constraints=man.get("constraints"),
        generated=man.get("generated"),
        # converted-hive provenance rides the clone re-keyed absolute:
        # without it the pathPartitionValues feature flag carries with no
        # data behind it and the partition columns read NULL (the scan
        # groups path-valued files by their own hive base dir, so
        # absolute source entries resolve against the SOURCE's layout)
        path_values={
            _abs(f): v for f, v in (man.get("path_values") or {}).items()
        } or None,
        zcube={
            _abs(f): v for f, v in (man.get("zcube") or {}).items()
        } or None,
        # column DEFAULTs carry with the columnDefaults writer feature —
        # a clone keeping the flag but losing the map would refuse
        # nothing and fill nothing
        defaults=man.get("defaults"),
        # identity spec + high-water marks carry: appends to the clone
        # allocate past the source snapshot's marks, never colliding
        # with the cloned rows' values
        identity=man.get("identity"),
        features=sorted(
            set(man.get("features") or ()) | {"shallowClone"}
        ),
        writer_features=man.get("writer_features") or None,
        column_map=man.get("column_map"),
        column_map_seq=man.get("column_map_seq") or None,
        # lineage rides the v0 body (greppable, shows in table_history;
        # readers never consult it)
        extra={
            "clone_source": os.path.abspath(src),
            "clone_source_version": man["version"],
        },
    )
    return {
        "version": 0,
        "source": os.path.abspath(src),
        "source_version": man["version"],
        "files_referenced": len(add),
        "vectors_carried": len(set_dv or {}),
    }


def table_history(path: str) -> list[dict]:
    """DESCRIBE HISTORY analog: one row per still-resolvable commit,
    oldest first — version, operation verb, files added/removed, and
    whether the version can still be time-traveled to (False once vacuum
    pruned its delta). Reads only the commit files themselves (O(1) each,
    never a full state resolution)."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        raise ValueError(f"no committed manifest under {path!r}")
    rows = []
    versions = sorted(
        int(m.group(1)) for f in os.listdir(mdir) if (m := _MANIFEST_RE.match(f))
    )
    for v in versions:
        try:
            body = _read_json(path, f"v{v}.json")
        except FileNotFoundError:
            continue  # vacuumed between listdir and read
        ts = body.get("ts")
        if "files" in body:  # legacy full-snapshot manifest
            rows.append(
                {"version": v, "op": body.get("op", "snapshot"),
                 "n_add": len(body["files"]), "n_remove": 0, "n_dv": 0,
                 "ts": ts}
            )
        else:
            rows.append(
                {"version": v, "op": body.get("op", "commit"),
                 "n_add": len(body.get("add", ())),
                 "n_remove": len(body.get("remove", ())),
                 "n_dv": len(body.get("set_dv") or ()),
                 "ts": ts}
            )
    return rows


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int = 0,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level Change Data Feed between snapshots (the Delta
    ``table_changes(start, end)`` shape, both versions INCLUSIVE): every
    row inserted or deleted by each commit in the range, tagged with
    ``_change_type`` ('insert' | 'delete') and ``_commit_version``. An
    upsert's update surfaces as its full before-image delete plus its
    after-image insert — the honest representation without per-row
    tracking metadata (Delta's CDF does the same when the writer recorded
    no change files).

    The diff is computed from the delta log, not by comparing snapshots:
    a commit's changed rows are ``rows(added files) EXCEPT ALL
    rows(removed files)`` (inserts) and the reverse (deletes) — so rows
    that a file-granular rewrite carried through UNCHANGED (delete_where /
    merge_upsert rewrite whole files; OPTIMIZE rewrites everything it
    bin-packs) cancel exactly, and a pure-compaction commit yields ZERO
    change rows. Append-only commits short-circuit: no removed side means
    the added files ARE the inserts — no shuffle at all, which keeps the
    common case (streamed ingestion) a metadata-priced scan.

    Cost is O(data changed in the range), never O(table): only the files
    each commit added or removed are opened, and the EXCEPT ALL shuffle
    runs over those rows alone — the property that makes incremental
    downstream consumption (the reason CDF exists) viable at 100 TB.

    Both sides of one commit are projected through that commit's POST
    schema, so across a `merge_schema` evolution the carried rows still
    cancel (old files read the new columns as null on both sides); frames
    from different commits align by name with missing columns null, and
    the output's data columns follow the ``to_version`` schema.

    Raises ValueError for out-of-range versions and for commits or data
    files the range needs that VACUUM already reclaimed — the same
    diagnostics contract as time travel."""
    from pyspark.sql.types import StructField, StructType

    latest = current_version(path)
    if latest < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    if to_version is None:
        to_version = latest
    if not 0 <= from_version <= to_version <= latest:
        raise ValueError(
            f"bad change range [{from_version}, {to_version}]: {path!r} "
            f"has versions 0..{latest}"
        )

    def _state_files(v: int) -> set[str]:
        if v < 0:
            return set()
        try:
            return set(_read_manifest(path, v)["files"])
        except FileNotFoundError:
            raise ValueError(
                f"snapshot v{v} of {path!r} was vacuumed; changes are "
                "readable only for commits newer than the last VACUUM"
            ) from None

    data = _data_dir(path)

    # converted-in-place hive files need their partition constants
    # injected from the key=value path segments (pathPartitionValues).
    # Any pv file alive anywhere in the range is alive at from_version
    # (pv entries are born at the CONVERT v0 and only ever die), so one
    # state resolves the full set; the fallback keeps legacy tables and
    # vacuumed-base corner cases on the unchanged path.
    try:
        _pv_all = _read_manifest(path, from_version).get("path_values") or {}
    except (FileNotFoundError, ValueError):
        _pv_all = {}

    def _read(
        files: list[str], schema, cmap: dict[str, str],
        with_meta: bool = False,
    ) -> DataFrame:
        missing = [f for f in files if not os.path.exists(os.path.join(data, f))]
        if missing:
            raise ValueError(
                f"change feed of {path!r} needs {len(missing)} vacuumed "
                f"data file(s) (e.g. {missing[0]!r}); only commits newer "
                "than the last VACUUM grace window are readable"
            )
        ren = {
            f.name: cmap[f.name]
            for f in schema.fields
            if f.name in cmap and cmap[f.name] != f.name
        }
        if ren:
            read_schema = StructType(
                [
                    StructField(
                        ren.get(f.name, f.name), f.dataType, f.nullable,
                        f.metadata,
                    )
                    for f in schema.fields
                ]
            )
        else:
            read_schema = schema
        proj = [
            F.col(ren.get(f.name, f.name)).alias(f.name)
            for f in schema.fields
        ]

        def _grp(names: list[str], from_paths: bool) -> DataFrame:
            reader = spark.read.schema(read_schema)
            if from_paths:
                reader = reader.option("basePath", data)
            df = reader.parquet(*[os.path.join(data, f) for f in names])
            meta = [
                # manifest-key identity, matching _scan_live_rows'
                # contract (clone-aware: absolute entries key by
                # absolute path)
                _file_identity_col(data, names),
                F.col("_metadata.row_index").alias("__pos"),
            ]
            if with_meta:
                return df.select(*proj, *meta)
            return df.select(*proj) if (ren or from_paths) else df

        pv = [f for f in files if f in _pv_all]
        plain_files = [f for f in files if f not in _pv_all]
        groups = []
        if plain_files:
            groups.append(_grp(plain_files, False))
        if pv:
            groups.append(_grp(pv, True))
        return (
            groups[0] if len(groups) == 1
            else groups[0].unionByName(groups[1])
        )

    def _prev_state(v: int) -> dict:
        try:
            return _read_manifest(path, v - 1) if v > 0 else _empty_state()
        except FileNotFoundError:
            raise ValueError(
                f"snapshot v{v - 1} of {path!r} was vacuumed; changes are "
                "readable only for commits newer than the last VACUUM"
            ) from None

    def _dv_positions(dv_map: dict[str, str], files: list[str]) -> DataFrame:
        """(file, pos) rows the given mapping masks for ``files``."""
        names = sorted({dv_map[f] for f in files if f in dv_map})
        if not names:
            return spark.createDataFrame([], "file string, pos bigint")
        missing = [
            n for n in names if not os.path.exists(os.path.join(data, n))
        ]
        if missing:
            raise ValueError(
                f"change feed of {path!r} needs vacuumed deletion-vector "
                f"file(s) (e.g. {missing[0]!r}); only commits newer than "
                "the last VACUUM grace window are readable"
            )
        return spark.read.parquet(
            *[os.path.join(data, n) for n in names]
        ).where(F.col("file").isin([f for f in files if f in dv_map]))

    # column mapping: frames are unioned in PHYSICAL column space so a
    # rename mid-range keeps one column's rows in ONE output column (the
    # Delta column-mapping CDF contract); identity tables skip all of it.
    try:
        cur_map = _cmap(_read_manifest(path, from_version))
    except FileNotFoundError:
        # the range start state is unresolvable (vacuumed base). For an
        # unmapped table the delta-only walk below stays exact; a MAPPED
        # table's reads would misproject, so refuse with the standard
        # vacuum diagnostics.
        if _cmap(_read_manifest(path, current_version(path))):
            raise ValueError(
                f"change feed of {path!r} needs the vacuumed snapshot "
                f"v{from_version} to resolve its column mapping; only "
                "commits newer than the last VACUUM are readable"
            ) from None
        cur_map = {}

    def _to_phys(df: DataFrame, m: dict[str, str]) -> DataFrame:
        if not m:
            return df
        return df.select(
            *(F.col(c).alias(m.get(c, c)) for c in df.columns)
        )

    frames: list[DataFrame] = []
    final_schema_json = None
    for v in range(from_version, to_version + 1):
        try:
            body = _read_json(path, f"v{v}.json")
        except FileNotFoundError:
            raise ValueError(
                f"commit v{v} of {path!r} was vacuumed; changes are "
                "readable only for commits newer than the last VACUUM"
            ) from None
        if "column_map" in body:
            cur_map = body["column_map"] or {}
        if "files" in body:  # legacy full-snapshot commit: diff vs v-1
            # resolved lazily so a delta-only range stays readable even
            # when everything before it was vacuumed
            prev_files = _state_files(v - 1)
            now_files = set(body["files"])
            added = sorted(now_files - prev_files)
            removed = sorted(prev_files - now_files)
            set_dv: dict[str, str] = {}
            unset_dv: list[str] = []
        else:
            added = sorted(body.get("add", ()))
            removed = sorted(body.get("remove", ()))
            set_dv = body.get("set_dv") or {}
            unset_dv = list(body.get("unset_dv") or ())
        final_schema_json = body["schema"]
        schema = StructType.fromJson(json.loads(body["schema"]))
        if set_dv or unset_dv:
            # deletion-vector commit: the changed rows are the POSITION
            # DELTAS — vector growth is delete images (a dv delete),
            # vector shrink/clear is INSERT images (only RESTORE shrinks:
            # the masked rows un-delete)
            prev = _prev_state(v)
            files = sorted(set(set_dv) | set(unset_dv))
            new_pos = _dv_positions(set_dv, files)
            old_pos = _dv_positions(prev.get("dvs") or {}, files)
            rows = _read(files, schema, cur_map, with_meta=True)
            for delta, kind in (
                (new_pos.exceptAll(old_pos), "delete"),
                (old_pos.exceptAll(new_pos), "insert"),
            ):
                imgs = rows.join(
                    F.broadcast(delta),
                    (F.col("__file") == F.col("file"))
                    & (F.col("__pos") == F.col("pos")),
                    "left_semi",
                ).drop("__file", "__pos")
                frames.append(_to_phys(
                    imgs.withColumn("_change_type", F.lit(kind))
                    .withColumn("_commit_version", F.lit(v)),
                    cur_map,
                ))
        if removed:
            # the removed side reads files AS OF v-1: rows a deletion
            # vector already masked were deleted by THAT commit, not by
            # this rewrite — filter them or they surface as spurious
            # deletes here. The data-file existence check runs FIRST (its
            # diagnostic names what vacuum actually reclaimed); if only
            # the v-1 MANIFEST was pruned while the removed files
            # survive (the thin window edge), fall back to a no-vector
            # read — pre-DV behavior, exact whenever the file carried no
            # vector
            missing = [
                f for f in removed
                if not os.path.exists(os.path.join(data, f))
            ]
            if missing:
                raise ValueError(
                    f"change feed of {path!r} needs {len(missing)} vacuumed "
                    f"data file(s) (e.g. {missing[0]!r}); only commits newer "
                    "than the last VACUUM grace window are readable"
                )
            try:
                prev = _prev_state(v)
            except ValueError:
                prev = _empty_state()
            _dv_positions(prev.get("dvs") or {}, removed)  # named dv check
            rems = _scan_live_rows(spark, path, prev, removed, schema)
        if added and removed:
            adds = _read(added, schema, cur_map)
            ins: DataFrame | None = adds.exceptAll(rems)
            dels: DataFrame | None = rems.exceptAll(adds)
        elif added:
            ins, dels = _read(added, schema, cur_map), None
        elif removed:
            ins, dels = None, rems
        else:
            continue  # metadata-only / dv-only commit
        for df, kind in ((ins, "insert"), (dels, "delete")):
            if df is not None:
                frames.append(_to_phys(
                    df.withColumn("_change_type", F.lit(kind))
                    .withColumn("_commit_version", F.lit(v)),
                    cur_map,
                ))
    out_schema = StructType.fromJson(
        json.loads(final_schema_json or _read_manifest(path, to_version)["schema"])
    )
    cols = list(out_schema.fieldNames()) + ["_change_type", "_commit_version"]
    if not frames:
        empty = spark.createDataFrame([], out_schema)
        return empty.withColumn("_change_type", F.lit("insert")).withColumn(
            "_commit_version", F.lit(0)
        ).where(F.lit(False)).select(*cols)
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f, allowMissingColumns=True)
    if cur_map:
        # back from physical space to the FINAL snapshot's logical names;
        # a column added late in the range may have no physical column in
        # any unioned frame - it reads null (same as unmapped evolution)
        sel = []
        for f in out_schema.fields:
            phys = cur_map.get(f.name, f.name)
            if phys in union.columns:
                sel.append(F.col(phys).alias(f.name))
            else:
                sel.append(F.lit(None).cast(f.dataType).alias(f.name))
        return union.select(*sel, "_change_type", "_commit_version")
    return union.select(*cols)


def _reclaim_plan(
    path: str, keep_versions: int, grace_seconds: int,
    at_version: int | None = None,
) -> dict:
    """The ONE retention computation `vacuum` acts on and `vacuum_report`
    prints: live set = every file (and dv sidecar) referenced by the
    retained versions; removable = unreferenced data files older than the
    grace window; manifests = deltas/checkpoints strictly below the
    window. Keeping this in one place is the dry-run contract — the
    report can never drift from the action.

    ``at_version`` pins the whole computation to a caller-supplied
    version snapshot. `vacuum` MUST pass the version it pinned its
    checkpoint for: if the plan re-read current_version and a commit
    landed between the pin and the plan, oldest_kept would rise above the
    pinned checkpoint and the plan would delete checkpoint-v{pin} plus
    every delta below the new horizon — with no surviving base in the
    retained window, NO retained version could be resolved (permanent
    metadata loss under exactly the concurrent-writer conditions the
    storm tests exercise). `vacuum_report` keeps the self-reading form
    (it mutates nothing, so a racing commit only staleness-shifts the
    report)."""
    version = current_version(path) if at_version is None else at_version
    if version < 0:
        return {
            "version": -1, "oldest_kept": None, "data_files": [],
            "grace_protected": [], "manifests": [],
        }
    oldest_kept = max(0, version - keep_versions + 1)
    live: set[str] = set()
    for v in range(oldest_kept, version + 1):
        try:
            state = _read_manifest(path, v)
        except FileNotFoundError:
            continue
        live |= set(state["files"])
        # deletion-vector sidecars referenced by retained snapshots are
        # as load-bearing as the data files they mask
        live |= set((state.get("dvs") or {}).values())
    removable, protected = [], []
    data = _data_dir(path)
    now = time.time()
    if os.path.isdir(data):
        # recursive walk with data/-relative names: partitioned tables
        # nest files under col=value/ directories
        rel_files = []
        for root, _dirs, fs in os.walk(data):
            rel = os.path.relpath(root, data)
            prefix = "" if rel == "." else rel.replace(os.sep, "/") + "/"
            rel_files.extend(prefix + f for f in fs)
        for f in sorted(rel_files):
            if f in live:
                continue
            full = os.path.join(data, f)
            try:
                young = (
                    grace_seconds > 0
                    and now - os.path.getmtime(full) < grace_seconds
                )
            except FileNotFoundError:
                continue
            (protected if young else removable).append(f)
    manifests = []
    mdir = _manifest_dir(path)
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            m = _MANIFEST_RE.match(f) or _CHECKPOINT_RE.match(f)
            if m and int(m.group(1)) < oldest_kept:
                manifests.append(f)
    return {
        "version": version,
        "oldest_kept": oldest_kept,
        "data_files": removable,
        "grace_protected": protected,
        "manifests": manifests,
    }


def vacuum_report(
    path: str, keep_versions: int = 1, grace_seconds: int = 600
) -> dict:
    """DRY-RUN vacuum (Delta's ``VACUUM ... DRY RUN``): the reclaim
    report — which data files / manifests a real vacuum with the same
    parameters would remove, and which unreferenced files the grace
    window is still protecting — with NO filesystem mutation. The
    operator's pre-flight before an irreversible retention cut; computed
    by the same `_reclaim_plan` the real vacuum executes."""
    return _reclaim_plan(path, keep_versions, grace_seconds)

def describe_table(path: str) -> dict:
    """DESCRIBE DETAIL for a manifest table: current version, live
    file/byte counts, deletion-vector count, declared stats columns,
    schema field names, and total addressable history — the one-call
    operational summary (Delta's DESCRIBE DETAIL shape)."""
    version = current_version(path)
    if version < 0:
        raise ValueError(f"no committed manifest under {path!r}")
    man = _read_manifest(path, version)
    data = _data_dir(path)
    size = 0
    for f in man["files"]:
        try:
            size += os.path.getsize(os.path.join(data, f))
        except FileNotFoundError:
            pass
    fields = [f["name"] for f in json.loads(man["schema"])["fields"]]
    mdir = _manifest_dir(path)
    versions = sorted(
        int(m.group(1))
        for f in os.listdir(mdir)
        if (m := _MANIFEST_RE.match(f))
    )
    return {
        "version": version,
        "num_files": len(man["files"]),
        "size_bytes": size,
        "num_dvs": len(man.get("dvs") or {}),
        "stats_cols": list(man.get("stats_cols") or []),
        "partition_cols": list(man.get("partition_cols") or []),
        "not_null": list((man.get("constraints") or {}).get("not_null") or []),
        "check_constraints": [
            f"{n}: {e}"
            for n, e in ((man.get("constraints") or {}).get("checks") or {}).items()
        ],
        "columns": fields,
        "renamed_columns": [
            f"{l} (physical: {p})"
            for l, p in sorted(_cmap(man).items())
            if l != p
        ],
        "table_features": list(man.get("features") or []),
        "writer_features": list(man.get("writer_features") or []),
        "generated_columns": [
            f"{c} AS ({e})"
            for c, e in sorted((man.get("generated") or {}).items())
        ],
        # shallow-clone observability: lineage from the v0 body, plus the
        # count of still-unmaterialized absolute references (0 after
        # compact_table — the materialization progress gauge)
        "clone_source": _clone_lineage(path),
        "num_cloned_files": sum(
            1 for f in man["files"] if os.path.isabs(f)
        ),
        "oldest_version": versions[0] if versions else version,
        "num_commits_retained": len(versions),
        # r12 observability: write-time column defaults, the count of
        # converted-hive files still serving partition values from their
        # key=value paths (drops as rewrites materialize the column),
        # and the count of files carrying liquid-clustering provenance
        "column_defaults": [
            f"{c} DEFAULT {e}"
            for c, e in sorted((man.get("defaults") or {}).items())
        ],
        "num_path_valued_files": len(man.get("path_values") or {}),
        "num_clustered_files": len(man.get("zcube") or {}),
        # r13: GENERATED ALWAYS AS IDENTITY — spec + current high-water
        "identity_columns": [
            f"{c} START WITH {s['start']} INCREMENT BY {s['step']} "
            f"(high-water {s['high']})"
            for c, s in sorted((man.get("identity") or {}).items())
        ],
    }


def _clone_lineage(path: str) -> str | None:
    """``src@vN`` when the table began life as a shallow clone (recorded
    in the v0 commit body), else None. Vacuumed/checkpointed-away v0
    bodies read as None — lineage is informational, never load-bearing."""
    try:
        body = _read_json(path, "v0.json")
    except (FileNotFoundError, ValueError):
        return None
    src = body.get("clone_source")
    if not src:
        return None
    return f"{src}@v{body.get('clone_source_version', 0)}"


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
    oldest_kept = max(0, version - keep_versions + 1)
    # before any delta older than the window is pruned, pin a BASE the
    # retained versions can resolve from: a checkpoint at oldest_kept
    # (idempotent — a racing vacuum publishes identical bytes)
    if oldest_kept > 0:
        try:
            checkpoint_table(path, oldest_kept)
        except CommitConflict:
            pass  # already checkpointed
        except FileNotFoundError:
            # a racing vacuum with a NARROWER window already pruned the
            # deltas below its own (higher) pin — our retained versions
            # resolve from that newer checkpoint; nothing to pin here
            pass
    # the plan is computed from the SAME version snapshot the checkpoint
    # was pinned for — a commit racing in between must not raise the
    # plan's horizon above the pin (see _reclaim_plan's at_version note)
    plan = _reclaim_plan(path, keep_versions, grace_seconds, at_version=version)
    removed = 0
    data = _data_dir(path)
    for f in plan["data_files"]:
        try:
            os.unlink(os.path.join(data, f))
        except FileNotFoundError:
            continue
        removed += 1
    # hive partition dirs the reclaim emptied: sweep bottom-up; a racing
    # writer staging into the dir makes rmdir fail non-empty — ignored,
    # the dir is simply live again (never an error, never data touched)
    for root, dirs, _fs in os.walk(data, topdown=False):
        for d in dirs:
            with contextlib.suppress(OSError):
                os.rmdir(os.path.join(root, d))
    mdir = _manifest_dir(path)
    # only SUPERSEDED manifests (strictly older than the retention window)
    # are removed — a manifest committed concurrently AFTER this vacuum's
    # version snapshot is a live transaction, and deleting it would revert
    # the table and orphan its data files (permanent loss). Checkpoints
    # older than the window are superseded by the one pinned above.
    for f in plan["manifests"]:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(os.path.join(mdir, f))
    return removed
