"""Core relational helpers the rest of the engine composes.

Everything here stays declarative so Catalyst keeps pushdown/pruning/reorder
freedom; these helpers only standardize shapes the reference computes
(SURVEY.md §2.1): per-group top-k, existence anti-joins, bool_and health
gates, and scatter-gather union flatten.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ensure_parallelism(
    df: DataFrame, min_parts: int | None = None, by: Sequence[str] | None = None
) -> DataFrame:
    """Repartition IF the frame has fewer partitions than the cluster has
    slots. Small single-file scans otherwise serialize every
    expression-heavy downstream op onto one core; at real scale (thousands
    of input splits) this is a no-op, so it's safe to leave in the path.

    With ``by`` set, partitions by hash of those columns instead of round-
    robin — downstream windows/aggregations keyed on the same columns then
    reuse the partitioning (sort only, no second shuffle of the much larger
    post-explode frame)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
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
    """
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
