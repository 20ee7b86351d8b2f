"""Core relational helpers the rest of the engine composes.

Everything here stays declarative so Catalyst keeps pushdown/pruning/reorder
freedom; these helpers only standardize shapes the reference computes
(SURVEY.md §2.1): per-group top-k, existence anti-joins, bool_and health
gates, and scatter-gather union flatten.
"""

from __future__ import annotations

import os
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: (session, input-file tuple) → estimated scan partition count, so the
#: per-query floor never repeats the file stat pass for the same scan. The
#: session OBJECT is part of the value and identity-checked on lookup: a
#: bare id() key could collide when CPython recycles a stopped session's
#: address (and holding the reference pins the address, making the check
#: sound).
#: key = (session id, resolved maxPartitionBytes, input files) — the conf
#: component is load-bearing (a retuned split size must re-estimate).
_SCAN_PARTS_CACHE: dict[tuple[int, int, tuple[str, ...]], tuple[object, int]] = {}

_SIZE_SUFFIXES = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_byte_conf(raw: str, default: int = 128 * 1024 * 1024) -> int:
    """Parse Spark byte-size conf strings: plain bytes ('134217728'), a
    trailing 'b' ('134217728b'), or unit suffixes ('128m', '1g', '512k',
    optionally with 'b' as in '128mb'). Digit-stripping would read '128m'
    as 128 BYTES and silently break every threshold derived from it."""
    s = raw.strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in _SIZE_SUFFIXES:
        mult = _SIZE_SUFFIXES[s[-1]]
        s = s[:-1]
    try:
        return int(s) * mult
    except ValueError:
        return default


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Estimate the frame's scan parallelism WITHOUT converting the plan to
    an RDD (``df.rdd.getNumPartitions()`` forces a full logical→RDD
    translation per call — measurable on the query-construction hot path).

    Local file scans: ceil(total bytes / spark.sql.files.maxPartitionBytes),
    the same arithmetic FilePartition planning uses (modulo small-file
    coalescing — an over-estimate never triggers a spurious repartition of a
    big scan, which is the failure mode that matters). Non-local or fileless
    plans (in-memory test frames): the file count, so a thousand-split remote
    dataset is already "parallel enough" and a literal frame estimates 1."""
    try:
        files = tuple(df.inputFiles())
    except Exception:
        return 1
    if not files:
        return 1
    spark = df.sparkSession
    try:
        max_bytes = _parse_byte_conf(
            str(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        )
    except Exception:
        max_bytes = 128 * 1024 * 1024
    # the resolved maxPartitionBytes is part of the key: a session that
    # retunes the conf mid-run must not be served estimates computed under
    # the old split size
    key = (id(spark), max_bytes, files)
    cached = _SCAN_PARTS_CACHE.get(key)
    if cached is not None and cached[0] is spark:
        return cached[1]
    if len(_SCAN_PARTS_CACHE) >= 512:
        # bound the cache (and the sessions it pins): distinct scans per
        # process are few; a workload churning temp dirs must not leak
        _SCAN_PARTS_CACHE.clear()
    total = 0
    for uri in files:
        if uri.startswith("file:"):
            path = uri[5:]
            if path.startswith("//"):  # file:///p → ///p → /p
                path = path[2:]
            try:
                total += os.path.getsize(path)
            except OSError:
                total = -1
                break
        else:
            total = -1  # remote store — can't stat cheaply from the driver
            break
    if total < 0:
        est = len(files)
    else:
        est = max(1, -(-total // max_bytes))
    _SCAN_PARTS_CACHE[key] = (spark, est)
    return est


def sized_parallelism(df: DataFrame, bytes_per_task: int = 4 << 20) -> DataFrame:
    """Widen a NARROW scan to ~one partition per ``bytes_per_task`` of
    input, capped at the cluster slots — the vectorized-kernel variant of
    `ensure_parallelism`. BLAS/pandas passes want batches big enough to
    amortize the Python round trip: fanning a tiny corpus out to one
    sliver per core costs more in task/IPC overhead than the kernel saves
    (q28's assign pass over a 1 MB embedding corpus measured ~0.5 s slower
    at 32 one-sliver tasks than at its size-fitted width). A frame whose
    scan is already at least the target width is returned unchanged — at
    real scale every corpus scan is, so this is a local-artifact guard,
    not a tuning knob."""
    try:
        files = tuple(df.inputFiles())
    except Exception:
        files = ()
    total = -1
    if files:
        total = 0
        for uri in files:
            if uri.startswith("file:"):
                path = uri[5:]
                if path.startswith("//"):
                    path = path[2:]
                try:
                    total += os.path.getsize(path)
                except OSError:
                    total = -1
                    break
            else:
                total = -1
                break
    cores = df.sparkSession.sparkContext.defaultParallelism
    if total < 0:
        # remote/fileless plan: defer to the standard widening rule
        return ensure_parallelism(df)
    target = max(1, min(cores, -(-total // bytes_per_task)))
    if _estimated_scan_partitions(df) >= target:
        return df
    return df.repartition(target)


def ensure_parallelism(
    df: DataFrame, min_parts: int | None = None, by: Sequence[str] | None = None
) -> DataFrame:
    """Repartition IF the frame's scan is narrower than the cluster has
    slots. Small single-file scans otherwise serialize every
    expression-heavy downstream op onto one core; at real scale (thousands
    of input splits) this is a no-op, so it's safe to leave in the path.

    With ``by`` set, partitions by hash of those columns instead of round-
    robin — downstream windows/aggregations keyed on the same columns then
    reuse the partitioning (sort only, no second shuffle of the much larger
    post-explode frame).

    Intended for SCAN-ROOTED frames: the estimate reflects the file scan
    only, so a frame already repartitioned upstream may be judged "narrow"
    and re-shuffled redundantly (correct, but a wasted exchange) — call it
    where the frame comes straight off a source read."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if _estimated_scan_partitions(df) < target:
        if by:
            return df.repartition(target, *[F.col(c) for c in by])
        return df.repartition(target)
    return df


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with explicit key salting for hot keys: the (large, skewed)
    left side derives a deterministic salt from its full row hash; the small
    right side replicates ``salt`` times. The physical join key becomes
    (key, salt), splitting any hot key's rows across ``salt`` tasks.

    AQE's skew-join split handles most cases at runtime; explicit salting is
    for the ones it can't — aggregations after the join keyed on the hot key,
    or sort-merge partitions a single key overflows. Deterministic salt
    (xxhash64 of the row, not rand()) keeps results reproducible.

    Only ``inner`` and ``left`` are supported: the right side is replicated
    ``salt`` times, so right/full outer would emit one null-padded row per
    UNMATCHED salted copy (up to salt-1 spurious rows per right key) —
    refused rather than silently wrong.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: the "
            "replicated right side makes right/full outer emit spurious "
            "null-padded rows per unmatched salted copy"
        )
    on = list(on)
    lcols = left.columns
    lsalted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt))
    )
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return lsalted.join(rsalted, on + ["__salt"], how).drop("__salt")


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Deterministic per-group top-k via row_number.

    Callers must make ``order_by`` a total order (tie-break on a key) or the
    result is nondeterministic under shuffle. Window + filter beats
    groupBy+collect_list+slice: no array materialization, and AQE can split
    skewed partitions.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def missing_keys(required: DataFrame, existing: DataFrame, on: str | list[str]) -> DataFrame:
    """Left-anti existence check — the engine form of the reference's
    N-concurrent-DESCRIBE probe (/root/reference/geomesa_cassandra.py:55-58)."""
    return required.join(existing, on=on, how="left_anti")


def all_exist(required: DataFrame, existing: DataFrame, on: str | list[str]) -> bool:
    """all() gate (/root/reference/geomesa_cassandra.py:35-37)."""
    return missing_keys(required, existing, on).isEmpty()


def bool_all(df: DataFrame, group_by: Sequence[str], predicate: Column, alias: str) -> DataFrame:
    """Grouped bool_and — 'every node up / every table exists' aggregation
    (/root/reference/cluster.py:56-59). Partial aggregation is map-side, so
    at scale this is one small shuffle of booleans."""
    return df.groupBy(*group_by).agg(F.bool_and(predicate).alias(alias))


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """Scatter-gather flatten (/root/reference/cluster.py:84-93) — unionByName
    so column order never silently reorders data."""
    return reduce(lambda a, b: a.unionByName(b), frames)


def distinct_values(df: DataFrame, *cols: str) -> DataFrame:
    """Projection + distinct (list_sfts shape, /root/reference/geomesa.py:39-43)."""
    return df.select(*cols).distinct()


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Keyed diff of two table snapshots — the reconciliation primitive
    behind CDC backfills, replica anti-entropy (the engine form of the
    reference's repair stage) and data-migration sign-off: one full-outer
    hash join on the key, change classified per row as
    ``added`` (key only in new), ``removed`` (key only in old),
    ``changed`` (key in both, any compare column differs — NULL-safe
    equality, so NULL→value and value→NULL count as changes) or
    ``unchanged``. Returns key columns + ``change_type``. ``key_cols``
    must be non-NULL (a key, not a payload): NULL keys would null-safe
    match each other and misclassify — pre-filter or surrogate them.

    At 100 TB both sides shuffle once on the key (or zero times if both
    snapshots are bucketed on it — the layout `test_bucketed_tables_*`
    pins); the classification itself is a codegen'd projection."""
    key_cols = list(key_cols)
    o = old.select(*key_cols, *compare_cols).alias("o")
    n = new.select(*key_cols, *compare_cols).alias("n")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols],
    )
    joined = o.join(n, cond, "full_outer")
    in_old = reduce(
        lambda a, b: a | b, [F.col(f"o.{k}").isNotNull() for k in key_cols]
    )
    in_new = reduce(
        lambda a, b: a | b, [F.col(f"n.{k}").isNotNull() for k in key_cols]
    )
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols],
    )
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    return joined.select(*keys, change.alias("change_type"))


def global_rank(
    df: DataFrame,
    order_by: Sequence[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    reliable: bool = False,
) -> tuple[DataFrame, int]:
    """Exact dense global row-number over ``order_by`` WITHOUT a
    single-partition sort — the scalable total-ordering pattern:

    1. ``repartitionByRange`` on the order key (sampled range boundaries,
       the same exchange a distributed sort uses),
    2. one tiny counting pass → cumulative partition offsets (≤ #partitions
       longs on the driver),
    3. per-partition ``row_number`` (window partitioned by the range
       partition id — a balanced hash exchange, never SinglePartition)
       plus the partition's offset.

    The repartitioned frame is materialized once so the counting pass and
    the rank pass see identical range boundaries. ``reliable=False``
    (default, right for local mode) uses ``localCheckpoint`` — blocks live
    on executor local storage, so an executor loss mid-job fails the query;
    on a real cluster pass ``reliable=True`` to write the cut to the
    configured reliable checkpoint dir (``sc.setCheckpointDir`` to
    HDFS/object storage first) and survive executor churn. Returns
    (frame + rank_col, total_rows) — callers get n for free from the
    offsets, e.g. for percent_rank/ntile arithmetic.

    ``order_by`` must be a deterministic total order (include a tiebreaker
    key) or ranks within ties are partition-placement-dependent.
    """
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_by]
    rp = (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    rp = rp.checkpoint(eager=True) if reliable else rp.localCheckpoint(eager=True)
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in rp.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    mapping = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    ranked = rp.withColumn(
        rank_col,
        (F.row_number().over(w) + mapping[F.col("__pid")]).cast("bigint"),
    ).drop("__pid")
    return ranked, acc


def ntile_from_rank(rank: Column, n: int, buckets: int) -> Column:
    """Exact ``ntile(buckets)`` computed from a global row number and the
    total row count — SQL ntile semantics: the first n mod buckets tiles
    get one extra row. Lets ntile ride on ``global_rank`` instead of a
    single-partition window."""
    base, rem = divmod(n, buckets)
    threshold = rem * (base + 1)
    first = F.floor((rank - 1) / (base + 1)) + 1
    if base == 0:
        return first.cast("int")
    rest = F.lit(rem) + F.floor((rank - 1 - threshold) / base) + 1
    return F.when(rank <= threshold, first).otherwise(rest).cast("int")
