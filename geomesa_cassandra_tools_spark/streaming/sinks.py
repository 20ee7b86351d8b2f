"""Streaming sinks beyond the memory-sink test harness: exactly-once
append into a manifest-committed transactional table.

Structured Streaming's delivery contract is at-least-once per micro-batch
at the sink boundary — after a crash the checkpoint REPLAYS the last
unacknowledged batch. File/Kafka sinks dedup internally; arbitrary sinks
get `foreachBatch(batch_df, batch_id)` and must make the write idempotent
themselves. This module wires that to `operators/transactional.py`: each
batch commits through ``append_batch(txn_app=query, txn_id=batch_id)``,
so a replayed batch id is refused by the manifest watermark and the table
observes every batch EXACTLY once — the same txnAppId/txnVersion design
Delta ships for this exact problem.

At 100 TB this is the streaming-ingestion landing path: micro-batches
append immutable files with an atomic metadata commit, maintenance
(DELETE/VACUUM) interleaves safely under the same optimistic-concurrency
manifest, and readers stay snapshot-isolated throughout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from geomesa_cassandra_tools_spark.operators import transactional


def _apply_cdc_deletes(
    deletes: DataFrame,
    table_path: str,
    merge_keys: list[str],
    applied: list[int],
    since_compact: list[int],
    count_applied: bool = True,
) -> None:
    """Apply a CDC batch's DELETE events as one deletion-vector delete —
    the DISTRIBUTED key-set form (`delete_where(keys=)`): the delete keys
    semi-join the live rows, never a driver-collected predicate, so batch
    size is unbounded (a backlogged CDF drain can carry a whole table's
    deletes in one micro-batch). Idempotent by value: a replayed batch's
    keys match zero live rows and `delete_where` burns no version.
    Deletes against a not-yet-created table are no-ops (nothing to
    delete). NULL-keyed delete rows are rejected loudly inside
    `delete_where` — NULL never equality-matches, so the delete would
    otherwise silently drop."""
    if transactional.current_version(table_path) < 0:
        return
    if deletes.isEmpty():
        return
    res = transactional.delete_where(
        deletes.sparkSession, table_path, mode="dv",
        keys=deletes, key_cols=merge_keys,
    )
    if count_applied and res.get("files_vectored"):
        applied[0] += 1
        since_compact[0] += 1


def stream_to_manifest(
    stream_df: DataFrame,
    table_path: str,
    query_name: str,
    checkpoint: str | None = None,
    timeout_sec: int = 120,
    compact_every: int | None = None,
    compact_target_bytes: int = 128 << 20,
    merge_keys: list[str] | None = None,
    delete_col: str | None = None,
) -> int:
    """Drain a bounded stream (Trigger.AvailableNow) into the manifest
    table at ``table_path`` exactly once, and return how many micro-batch
    COMMITS were applied (replayed/empty batches excluded by the
    watermark). ``checkpoint`` defaults to a deterministic per-(query,
    table) location so a RESTART of the same drain resumes the same
    checkpoint — paired with the manifest watermark, reprocessing after a
    mid-drain crash cannot double-append.

    ``compact_every=N`` runs `transactional.compact_table` inline after
    every N applied batches (and once more at drain end if anything
    applied since the last one): the self-maintenance that keeps a
    long-lived streamed table from degrading into one-file-per-batch
    without an external scheduler. Safe with the exactly-once contract by
    construction — compaction is its own commit that never touches the
    txn watermark, a replayed batch still refuses, and a compaction that
    races a concurrent delete aborts cleanly inside `compact_table`. The
    count returned stays the number of APPEND commits.

    ``merge_keys=[...]`` switches each batch from APPEND to the atomic
    MERGE (`transactional.merge_upsert`): matched keys replaced, new
    keys appended, exactly once under replays — the streaming CDC-upsert
    landing path. The source must emit at most one row per key per
    micro-batch (dedupe upstream, e.g. latest-wins by timestamp);
    `merge_upsert` refuses duplicate-key batches loudly.

    ``delete_col="..."`` (requires ``merge_keys``) completes the CDC
    apply: rows whose boolean marker is true are DELETE events — their
    keys are removed via a deletion-vector delete
    (`delete_where(mode="dv", keys=)`, zero data files rewritten), the
    rest upsert as usual. Exactly-once composes from two halves: the
    upsert is watermark-refused on replay, and the key-delete is
    IDEMPOTENT by value (a replayed delete matches zero live rows and
    burns no version), so a crash anywhere between the two commits
    converges on replay. Delete batches are UNBOUNDED: the keys
    semi-join the live rows distributed-side (never a driver-collected
    predicate); NULL-keyed deletes are rejected loudly."""
    if checkpoint is None:
        # Default to DURABLE storage next to the table, not a RAM-backed
        # scratch root: the manifest txn watermark persists across host
        # reboots, so a lost checkpoint would replay the whole source under
        # fresh batch ids and the watermark would refuse batches bundling
        # genuinely new rows (silent data loss). Co-locating with the table
        # ties the checkpoint's lifetime to the data it feeds. (Changing
        # the default location is safe: the previous default-path code
        # raised NameError before ever creating a checkpoint, so no table
        # can have a watermark produced through the old default — explicit
        # checkpoint= callers are untouched.)
        checkpoint = os.path.join(
            table_path, "_checkpoints", f"manifest_{query_name}"
        )
    if delete_col and not merge_keys:
        raise ValueError("delete_col requires merge_keys (CDC apply is keyed)")
    applied = [0]
    since_compact = [0]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        deletes = None
        if delete_col:
            marker = F.coalesce(F.col(delete_col), F.lit(False))
            deletes = batch_df.where(marker).drop(delete_col)
            batch_df = batch_df.where(~marker).drop(delete_col)
        if merge_keys:
            if batch_df.isEmpty():
                if deletes is None:
                    return
                _apply_cdc_deletes(
                    deletes, table_path, merge_keys, applied, since_compact
                )
                return
            if transactional.current_version(table_path) < 0:
                # first batch creates the table (merge needs a base
                # schema) — but under the SAME duplicate-key contract
                # merge_upsert enforces: an append here would silently
                # seed the "upserted" table with duplicate key rows
                from pyspark.sql import functions as F

                dup = (
                    batch_df.groupBy(*merge_keys).count()
                    .where(F.col("count") > 1).limit(1)
                )
                if dup.count() > 0:
                    raise ValueError(
                        "merge batch carries duplicate keys; resolve which "
                        "version wins upstream before merging"
                    )
                committed = transactional.append_batch(
                    batch_df, table_path, txn_app=query_name, txn_id=batch_id
                )
            else:
                res = transactional.merge_upsert(
                    batch_df.sparkSession, table_path, batch_df, merge_keys,
                    txn_app=query_name, txn_id=batch_id,
                )
                committed = None if res is None else res["version"]
        else:
            committed = transactional.append_batch(
                batch_df, table_path, txn_app=query_name, txn_id=batch_id
            )
        if committed is not None:
            applied[0] += 1
            since_compact[0] += 1
        if deletes is not None:
            _apply_cdc_deletes(
                deletes, table_path, merge_keys, applied, since_compact,
                count_applied=committed is None,
            )
        if compact_every and since_compact[0] >= compact_every:
            transactional.compact_table(
                batch_df.sparkSession, table_path,
                target_bytes=compact_target_bytes,
            )
            since_compact[0] = 0

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"manifest drain {query_name!r} did not finish within {timeout_sec}s"
        )
    if compact_every and since_compact[0]:
        # final sweep so the drain never leaves a tail of tiny files
        spark = stream_df.sparkSession
        transactional.compact_table(
            spark, table_path, target_bytes=compact_target_bytes
        )
    return applied[0]


def apply_cdf_to_manifest(
    cdf_stream: DataFrame,
    table_path: str,
    keys: list[str],
    query_name: str,
    checkpoint: str | None = None,
    timeout_sec: int = 120,
) -> int:
    """APPLY CHANGES INTO (Delta Live Tables' verb) for the manifest
    feed's CDF stream: maintain a downstream manifest table as a keyed
    MATERIALIZATION of an upstream table's change images — the full
    multi-hop loop: upstream commits → ``stream_feed(feed="cdf")`` →
    this sink → downstream converges to the upstream's live rows.

    Per micro-batch, each key's FINAL image decides its fate (the
    standard CDF-consumer rule): batches align with whole upstream
    commits (versions are the feed's offsets), so ordering by
    ``(_commit_version, insert-over-delete)`` per key is exact —
    a rewrite commit's cancelling delete+insert pair resolves to the
    insert (an idempotent same-value upsert), an update's old-delete /
    new-insert pair resolves to the new row, a dv or rewrite delete
    leaves a delete image only (→ key removed), and a RESTORE's
    resurrect-insert upserts the row back.

    Exactly-once composes from the established halves: upserts commit
    through `merge_upsert(txn_app=query_name, txn_id=batch_id)` (replays
    watermark-refused), deletes are value-idempotent dv deletes (a
    replayed delete matches nothing and burns no version). Returns the
    number of batches that changed the table."""
    if checkpoint is None:
        checkpoint = os.path.join(
            table_path, "_checkpoints", f"cdfapply_{query_name}"
        )
    applied = [0]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if batch_df.isEmpty():
            return
        # a key with TWO insert images in one commit has no well-defined
        # final image (Delta's APPLY CHANGES requires SEQUENCE BY for the
        # same reason) — reject loudly instead of materializing an
        # arbitrary pick that replays could flip
        dup = (
            batch_df.where(F.col("_change_type") == "insert")
            .groupBy(*keys, "_commit_version")
            .count()
            .where(F.col("count") > 1)
            .limit(1)
        )
        if dup.count() > 0:
            raise ValueError(
                "CDF batch carries duplicate insert images for one key "
                "within a single commit — the upstream table is not "
                f"key-unique on {keys}; dedupe upstream before applying"
            )
        w = Window.partitionBy(*keys).orderBy(
            F.col("_commit_version").desc(),
            (F.col("_change_type") == "insert").desc(),
        )
        picked = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        upserts = picked.where(F.col("_change_type") == "insert").drop(
            "_change_type", "_commit_version"
        )
        deletes = picked.where(F.col("_change_type") == "delete").select(*keys)
        committed = None
        if transactional.current_version(table_path) < 0:
            # first batch creates the table; `picked` is one-row-per-key
            # by construction, so the merge duplicate contract holds
            committed = transactional.append_batch(
                upserts, table_path, txn_app=query_name, txn_id=batch_id
            )
        else:
            res = transactional.merge_upsert(
                upserts.sparkSession, table_path, upserts, keys,
                txn_app=query_name, txn_id=batch_id,
            )
            committed = None if res is None else res["version"]
        if committed is not None:
            applied[0] += 1
        _apply_cdc_deletes(
            deletes, table_path, keys, applied, [0],
            count_applied=committed is None,
        )

    q = (
        cdf_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"cdf apply {query_name!r} did not finish within {timeout_sec}s"
        )
    return applied[0]
