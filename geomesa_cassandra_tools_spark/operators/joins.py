"""Join operators Spark lacks as single primitives: as-of join and
range join, built as compositions of built-in DataFrame ops.

Both stay inside Catalyst (union/window/filter — no Python), so they scale
like any other shuffle: partitioned by the equi-key, AQE-skew-splittable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` group (inclusive).

    Implementation: tag + union + `last(..., ignorenulls)` over a window
    ordered by (ts, side) — ONE shuffle on the equi-key, versus the naive
    inequality-join + groupBy which is a near-cross-product per key. At
    100 TB this is the difference between a sort within partitions and an
    O(n·m) explosion on hot keys.

    Ties on the timestamp resolve to the right row (inclusive >=), matching
    standard ASOF JOIN semantics; among equal right timestamps the last by
    row order within (ts) wins — callers wanting total determinism should
    make ``right_ts`` unique per group (e.g. tie-break column folded into an
    ordering column beforehand).

    ``how`` accepts exactly 'inner' or 'left' (validated — Spark join
    strings like 'left_outer' would otherwise silently behave as 'left').
    Right rows with a NULL ``right_ts`` are excluded up front: a NULL
    timestamp can never satisfy right_ts <= left_ts, but Spark's
    NULLS-FIRST ascending sort would otherwise make such a row an
    "infinitely early" match for every left row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    right = right.where(F.col(right_ts).isNotNull())
    # ROW ATOMICITY: right columns travel as ONE struct so the window's
    # last(ignorenulls) can never stitch values from different right rows
    # (per-column fill would, whenever a right column holds NULLs), and so
    # matched-ness probes the struct itself — a matched row whose right
    # columns are all legitimately NULL still survives an inner join.
    from pyspark.sql import types as T

    rstruct_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in right_cols])
    l_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__rvals", F.lit(None).cast(rstruct_type))
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rvals"),
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged)

    # right rows (side=0) sort before left rows at the same timestamp →
    # a right row AT left_ts is visible to that left row (inclusive).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__rvals", F.last(F.col("__rvals"), ignorenulls=True).over(w))
    out = filled.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__rvals").isNotNull())
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__rvals").getField(c))
    return out.drop("__ts", "__side", "__rvals")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Join left points into right [lo, hi] intervals sharing equi-keys.

    With ``bucket_width`` set, both sides are bucketized so the physical
    join is equi (key, bucket) + residual range filter — turning Spark's
    default BroadcastNestedLoop/cartesian plan for pure inequality joins
    into a hash join. Intervals spanning b buckets fan out b times
    (bounded, explicit). Choose bucket_width ≈ typical interval width.
    """
    on = list(on)
    cond = (F.col(f"l.{left_point}") >= F.col(f"r.{right_lo}")) & (
        F.col(f"l.{left_point}") <= F.col(f"r.{right_hi}")
    )
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    if bucket_width is None:
        return left.alias("l").join(right.alias("r"), cond)

    lb = left.withColumn("__bucket", (F.col(left_point) / bucket_width).cast("bigint"))
    # fan-out guard: one corrupt/open-ended interval (hi in the wrong unit,
    # a sentinel far-future hi) would otherwise sequence() millions of
    # bucket ids for a single row and OOM the executor — fail fast with
    # the actual contract violation instead. 10k buckets per interval is
    # far beyond any sane width choice (pick bucket_width near the typical
    # interval length).
    max_buckets = 10_000
    b_lo = (F.col(right_lo) / bucket_width).cast("bigint")
    b_hi = (F.col(right_hi) / bucket_width).cast("bigint")
    rb = right.withColumn(
        "__span", (b_hi - b_lo + 1)
    ).withColumn(
        "__bucket",
        F.explode(
            F.when(
                F.col("__span") <= max_buckets,
                F.sequence(b_lo, b_hi),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "range_join: interval spans more than "
                            f"{max_buckets} buckets (width={bucket_width}); "
                            "check interval units or raise bucket_width"
                        )
                    )
                )
            )
        ),
    ).drop("__span")
    cond = cond & (F.col("l.__bucket") == F.col("r.__bucket"))
    return lb.alias("l").join(rb.alias("r"), cond).drop("__bucket")
