"""Frequency sketches: count-min over a token stream.

Completes the engine's mergeable-sketch family (HLL distinct counting —
q43/q95; Greenwald-Khanna percentiles — q78) with the heavy-hitters
sketch: a depth×width counter table whose size is FIXED regardless of
stream cardinality. At 100 TB the exact per-token groupBy this module's
tests compare against needs a shuffle proportional to the vocabulary;
the sketch needs depth×width integers per partition (map-side combined),
and sketches from different corpus slices merge by cell-wise addition —
the same algebra that makes it a streaming/rollup citizen.

Hashing reuses the dedup family's portable primitives
(`hashed_tid` md5 fold + `minhash_params` LCG pairwise hashes), so a SQL
oracle can reproduce every cell exactly — estimates here are
deterministic, not probabilistic-per-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.operators.dedup import (
    MINHASH_PRIME,
    hashed_tid,
    minhash_params,
)

#: Seed decorrelated from the MinHash family (seed=42) so sharing a corpus
#: with dedup queries never correlates sketch collisions with signatures.
CMS_SEED = 7


def _buckets(tid: Column, depth: int, width: int) -> list[Column]:
    """One bucket index per hash row: ((a·tid + b) mod P) mod width."""
    return [
        ((F.lit(a) * tid + F.lit(b)) % MINHASH_PRIME % width).cast("int")
        for (a, b) in minhash_params(depth, seed=CMS_SEED)
    ]


def count_min_table(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the count-min counter table for a stream of items: one row per
    non-empty (hash row j, bucket) cell, ``cnt`` = how many items hashed
    there. depth×width cells total — constant space; map-side partial
    aggregation means each scan partition contributes at most depth×width
    rows to the shuffle no matter how many items it holds. Tables from
    different slices merge by summing cnt per (j, bucket).

    ``weight_col`` feeds PRE-AGGREGATED counts: pass (item, count) rows —
    e.g. an exact per-item aggregate a pipeline already computed — and
    each item hashes ONCE with its weight instead of once per occurrence.
    The resulting table is identical to the per-occurrence build (the
    cell sum telescopes), with the depth× row expansion paid per distinct
    item rather than per row."""
    tid = hashed_tid(F.col(item_col))
    w = F.col(weight_col) if weight_col is not None else F.lit(1)
    cells = items.select(
        w.alias("__w"),
        F.posexplode(F.array(*_buckets(tid, depth, width))).alias("j", "bucket"),
    )
    return cells.groupBy("j", "bucket").agg(F.sum("__w").alias("cnt"))


def cms_estimate(
    candidates: DataFrame,
    cms: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch for each candidate item: est = min over the
    depth rows of the item's cell counts — the classic one-sided bound
    (est >= true count, overshoot only from collisions). ``candidates``
    must be distinct items; the join touches depth rows per candidate
    against the fixed-size table (broadcastable at any corpus scale).

    The counter table is SPARSE (only non-empty cells exist as rows), so
    the probe join is LEFT and an unmatched cell counts 0 — an inner join
    would silently DROP a never-seen candidate (all cells empty) and
    over-estimate one whose cells are only partially occupied, breaking
    the min-over-depth contract exactly for the items a caller most wants
    to know about."""
    tid = hashed_tid(F.col(item_col))
    probes = candidates.select(
        item_col,
        F.posexplode(F.array(*_buckets(tid, depth, width))).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


#: Bloom seed decorrelated from both the MinHash family (42) and CMS (7).
BLOOM_SEED = 11


def _bloom_positions(tid: Column, k: int, m: int) -> list[Column]:
    """k bit positions in one m-bit space: ((a_j·tid + b_j) mod P) mod m."""
    return [
        ((F.lit(a) * tid + F.lit(b)) % MINHASH_PRIME % m).cast("int")
        for (a, b) in minhash_params(k, seed=BLOOM_SEED)
    ]


def bloom_bits(items: DataFrame, item_col: str, k: int = 4, m: int = 4096) -> DataFrame:
    """Build a Bloom filter over an item column as its SPARSE set-bit rows
    (`bit` int, ≤ m rows) — the membership-prefilter sketch that completes
    the family (HLL counts distincts, CMS counts frequencies, GK ranks;
    Bloom answers "possibly seen?" with zero false negatives).

    The sparse-rows representation keeps the sketch a first-class
    DataFrame: filters from different corpus slices merge by plain
    `union().distinct()` (set-bit union — the Bloom merge algebra), and
    the build is one explode + distinct whose shuffle is capped at k rows
    per item and m rows total. A deployment chasing the last constant
    packs the bits into m/64 int64 words per slice (`groupBy(bit div 64)`
    + `bit_or(1 << (bit % 64))`); the sparse form is chosen here because
    it keeps probes expressible as joins a SQL oracle reproduces exactly.

    Hashing reuses `hashed_tid` + `minhash_params` (seed decorrelated
    from MinHash/CMS), so estimates are deterministic, not
    probabilistic-per-run. Size ``m`` to expected distinct items n:
    fpr ≈ (1 - e^(-k·n/m))^k."""
    tid = hashed_tid(F.col(item_col))
    return (
        items.select(F.explode(F.array(*_bloom_positions(tid, k, m))).alias("bit"))
        .distinct()
    )


def bloom_maybe(
    candidates: DataFrame,
    bloom: DataFrame,
    id_col: str,
    item_col: str,
    k: int = 4,
    m: int = 4096,
) -> DataFrame:
    """Probe the filter: (id, maybe_member) per candidate, where
    maybe_member is TRUE iff every one of the candidate's k bit positions
    is set. LEFT join against the sparse bit rows (an inner join would
    silently drop never-seen candidates — same trap as `cms_estimate`);
    `bool_and` tolerates two hash rows landing on the same bit.

    Plan shape: the bit-match join is BROADCAST (the filter is ≤ m rows
    regardless of corpus size), so matching itself never shuffles; the
    per-candidate AND-reduction is one hash shuffle on the candidate id
    carrying k rows per candidate. At 100 TB the last constant goes too:
    pack the ≤ m set bits into a bitmap broadcast variable and evaluate
    membership map-side inside the scan — the shape Spark's own runtime
    bloom-filter join pushdown uses — leaving zero probe-side shuffles.
    The join form is kept here because it stays a pure DataFrame plan a
    SQL oracle reproduces exactly. No false negatives by construction
    (property-tested); false positives are the fpr trade-off."""
    tid = hashed_tid(F.col(item_col))
    probes = candidates.select(
        id_col, F.explode(F.array(*_bloom_positions(tid, k, m))).alias("bit")
    )
    marked = bloom.withColumn("__set", F.lit(True))
    return (
        probes.join(F.broadcast(marked), "bit", "left")
        .groupBy(id_col)
        .agg(F.bool_and(F.col("__set").isNotNull()).alias("maybe_member"))
    )


def bloom_bits_packed(
    items: DataFrame, item_col: str, k: int = 4, m: int = 4096
) -> DataFrame:
    """The PRODUCTION-SIZED Bloom representation: the m-bit space packed
    into ``m/64`` int64 words — (`word` int, `bits` long) rows, word i
    holding bits [64i, 64i+64). This is how the filter scales to m ≈ 1e9
    (decontaminating a 100 TB corpus against a large benchmark suite needs
    ~1.2e9 bits for n=1e8 held-out items at 1% fpr with k=7): 1e9 bits =
    ~15.6M words ≈ 125 MB — streamable as a DataFrame, shippable as a
    broadcast, NOT expressible as the sparse per-bit rows `bloom_bits`
    uses for oracle-portable certification (1e9 rows of overhead) nor as
    the literal array `bloom_maybe_mapside` packs (expression size).

    Same hash family and positions as `bloom_bits` — `unpack` of this
    frame equals the sparse frame exactly (unit-tested at m=65536), so
    the two representations are interchangeable mid-pipeline. Merging
    filters from corpus slices stays one line of algebra:
    ``union().groupBy("word").agg(bit_or("bits"))`` (`bloom_merge_packed`)
    — the bitwise-OR merge, still associative/commutative, exactly
    Spark's own BloomFilterAggregate merge. (On a cluster where the
    built-in is acceptable, `bloom_filter_agg`/`might_contain` is the
    zero-maintenance choice; this explicit form exists so the filter is a
    queryable, mergeable TABLE with a portable hash family rather than an
    opaque binary blob.)

    Scale shape: explode k positions per item, one partial-agg shuffle
    keyed on word index (map-side bit_or combine collapses each partition
    to ≤ m/64 rows before the exchange)."""
    tid = hashed_tid(F.col(item_col))
    pos = F.explode(F.array(*_bloom_positions(tid, k, m))).alias("bit")
    return (
        items.select(pos)
        .select(
            (F.col("bit") / 64).cast("int").alias("word"),
            F.expr("shiftleft(1L, int(bit % 64))").alias("one"),
        )
        .groupBy("word")
        .agg(F.bit_or("one").alias("bits"))
    )


def bloom_merge_packed(*filters: DataFrame) -> DataFrame:
    """Merge packed Bloom filters (same k/m/seed) by word-wise OR — the
    Bloom merge algebra over the int64-word representation. Associative
    and commutative, so slices/streams/days merge in any order."""
    if not filters:
        raise ValueError("bloom_merge_packed: no filters to merge")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_unpack(packed: DataFrame) -> DataFrame:
    """Packed (word, bits) rows -> sparse (`bit`) rows, `bloom_bits`'s
    representation — the bridge that lets the certification oracle and
    the production packing share one identity (the m=65536 unit asserts
    unpack(packed) == sparse bit-for-bit)."""
    return packed.select(
        F.explode(
            F.expr(
                "filter(transform(sequence(0, 63),"
                " i -> CASE WHEN (shiftright(bits, i) & 1L) = 1L"
                " THEN word * 64L + i END), x -> x IS NOT NULL)"
            )
        ).alias("b")
    ).select(F.col("b").cast("int").alias("bit"))


def bloom_maybe_packed(
    candidates: DataFrame,
    packed: DataFrame,
    id_col: str,
    item_col: str,
    k: int = 4,
    m: int = 4096,
) -> DataFrame:
    """Probe a PACKED filter: k probes per candidate join the word table
    on the word index (≤ m/64 rows — broadcast), and membership tests
    ``(bits >> (pos % 64)) & 1`` per probe, AND-reduced per candidate.
    Values identical to `bloom_maybe` on the sparse form (unit-tested);
    no false negatives by construction. At m ≈ 1e9 the word table is a
    ~125 MB broadcast — heavy but legal; past that, range-partition the
    probes by word index instead of broadcasting."""
    tid = hashed_tid(F.col(item_col))
    probes = candidates.select(
        id_col, F.explode(F.array(*_bloom_positions(tid, k, m))).alias("pos")
    ).select(
        id_col,
        "pos",
        (F.col("pos") / 64).cast("int").alias("word"),
    )
    return (
        probes.join(F.broadcast(packed), "word", "left")
        .select(
            id_col,
            F.coalesce(
                F.expr("(shiftright(bits, int(pos % 64)) & 1L) = 1L"),
                F.lit(False),
            ).alias("hit"),
        )
        .groupBy(id_col)
        .agg(F.bool_and("hit").alias("maybe_member"))
    )


def bloom_maybe_mapside(
    candidates: DataFrame,
    set_bits: list[int],
    id_col: str,
    item_col: str,
    k: int = 4,
    m: int = 4096,
) -> DataFrame:
    """The zero-shuffle probe variant `bloom_maybe`'s docstring describes:
    the filter's set bits arrive as a driver-side list (bounded by m —
    collect `bloom_bits` once, exactly like broadcasting k-means
    centroids), are packed into an m-slot boolean literal array, and every
    candidate row evaluates `element_at(bitmap, pos + 1)` for its k
    positions MAP-SIDE — no join, no exchange, the shape Spark's own
    runtime bloom-filter pushdown uses. Returns (id, maybe_member),
    identical values to `bloom_maybe` (unit-tested equal).

    Use this form when m is expression-sized (≲ tens of thousands of
    slots); past that, ship the bitmap as a broadcast variable into a
    pandas UDF instead of a literal. The join form remains the
    SQL-oracle-portable default."""
    bitmap = [False] * m
    for b in set_bits:
        if not (0 <= b < m):
            raise ValueError(f"bloom_maybe_mapside: bit {b} outside [0, {m})")
        bitmap[b] = True
    lit_bitmap = F.array(*[F.lit(x) for x in bitmap])
    tid = hashed_tid(F.col(item_col))
    checks = [
        F.element_at(lit_bitmap, pos + 1)
        for pos in _bloom_positions(tid, k, m)
    ]
    maybe = checks[0]
    for c in checks[1:]:
        maybe = maybe & c
    return candidates.select(F.col(id_col), maybe.alias("maybe_member"))
