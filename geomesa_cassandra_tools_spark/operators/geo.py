"""Geospatial layer: z2 space-filling-curve layout + bbox cover-and-refine.

The reference manages GeoMesa's z2/z3 index *tables* (its catalog values
name `{catalog}_{sft}_z2`-style physical tables; prefix filter at
/root/reference/geomesa.py:52). On Spark those side tables become *layout*
of one table: a `z2 bigint` column computed by bit-interleaving lon/lat,
used both for write-time clustering (`repartitionByRange(z2)` + sort) and
read-time pruning (bbox → set of z2 cell ranges → `z2 BETWEEN` filters that
Catalyst pushes into the parquet scan as row-group skipping).

Cover-and-refine contract (SURVEY.md §7.3): the z2 cell cover is a superset
of the bbox, so every pruned read is followed by the exact lon/lat
predicate. Results are therefore exactly equal to a full-scan bbox filter —
the cover only changes how much data is read.

No Scala, no custom Catalyst rule: the API layer builds ordinary range
filters, the optimizer does the rest (§4.3 of SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension for the z2 cell id (2*RES bits total).
DEFAULT_RES = 8


def _scale(coord: Column, lo: float, hi: float, res: int) -> Column:
    """Coordinate → integer cell index in [0, 2^res)."""
    cells = 1 << res
    idx = F.floor((coord - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells)).cast("bigint")
    return F.least(F.greatest(idx, F.lit(0)), F.lit(cells - 1))


def _interleave_bits(x: Column, y: Column, res: int) -> Column:
    """Morton/Z-order interleave of two res-bit integers (x even bits, y odd)."""
    z = F.lit(0).cast("bigint")
    for i in range(res):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        z = z + (xbit * F.lit(1 << (2 * i))) + (ybit * F.lit(1 << (2 * i + 1)))
    return z


def _interleave_bits_n(cols: list[Column], res: int) -> Column:
    """N-way Morton interleave: bit ``i`` of dimension ``d`` lands at
    position ``i*N + d`` — the z2/z3 interleaves generalized to any
    dimension count (Delta's ``ZORDER BY a, b, ...``)."""
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for i in range(res):
        for d, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * n + d))
    return z


def zorder_by(
    df: DataFrame,
    cols: list[str],
    res: int | None = None,
    strategy: str = "minmax",
) -> Column:
    """A bigint Z-value interleaving arbitrary NUMERIC stats columns —
    the general form of z2/z3 for non-geo layouts (Delta's
    ``OPTIMIZE ... ZORDER BY (a, b)``): cluster files by this column and
    per-file min/max spans become tight on EVERY participating column, so
    manifest skipping composes across multi-column predicates.

    Each column is mapped to a ``res``-bit cell index first
    (``res`` defaults to ``min(12, 62 // len(cols))`` so the interleave
    fits a bigint): ``strategy="minmax"`` scales linearly between the
    column's observed min/max (one tiny 2N-scalar aggregate — right for
    roughly uniform columns); ``strategy="quantile"`` buckets by
    equi-depth boundaries from `percentile_approx` (the skew-robust
    form — Delta's range_partition_id analog; boundary arrays are
    2^res-1 literals, so keep res ≤ 8 there). Cast date/timestamp
    columns to a numeric epoch upstream."""
    if not cols:
        raise ValueError("zorder_by needs at least one column")
    n = len(cols)
    # quantile ships 2^res - 1 boundary literals per column into the
    # plan, so its safe default is lower than minmax's
    res = res or max(1, min(8 if strategy == "quantile" else 12, 62 // n))
    if n * res > 62:
        raise ValueError(
            f"zorder_by: {n} cols x {res} bits = {n * res} bits "
            "overflows a bigint; lower res"
        )
    if strategy == "minmax":
        aggs = []
        for c in cols:
            aggs += [F.min(c).cast("double"), F.max(c).cast("double")]
        row = df.agg(*aggs).collect()[0]  # bounded: 2N scalars
        scaled = []
        for d, c in enumerate(cols):
            lo, hi = row[2 * d], row[2 * d + 1]
            if lo is None or hi is None or lo == hi:
                scaled.append(F.lit(0).cast("bigint"))
                continue
            # nudge hi so the max value lands in the top cell, not past it
            span = hi - lo
            scaled.append(
                _scale(F.col(c).cast("double"), lo, hi + span * 1e-9, res)
            )
    elif strategy == "quantile":
        cuts = [i / (1 << res) for i in range(1, 1 << res)]
        aggs = [
            F.percentile_approx(F.col(c).cast("double"), cuts, 10_000)
            for c in cols
        ]
        row = df.agg(*aggs).collect()[0]  # bounded: N * (2^res - 1)
        scaled = []
        for d, c in enumerate(cols):
            bounds = row[d]
            if not bounds:
                scaled.append(F.lit(0).cast("bigint"))
                continue
            blit = F.array(*[F.lit(float(b)) for b in bounds])
            # cell = number of boundaries <= value (equi-depth bucket)
            scaled.append(
                F.size(
                    F.filter(blit, lambda b: b <= F.col(c).cast("double"))
                ).cast("bigint")
            )
    else:
        raise ValueError(f"unknown zorder strategy {strategy!r}")
    return _interleave_bits_n(scaled, res)


def z2(lon: Column, lat: Column, res: int = DEFAULT_RES) -> Column:
    """z2 cell id of a point at ``res`` bits/dimension."""
    return _interleave_bits(
        _scale(lon, -180.0, 180.0, res), _scale(lat, -90.0, 90.0, res), res
    )


def _interleave_bits3(x: Column, y: Column, t: Column, res: int) -> Column:
    """3-way Morton interleave (x bit→3i, y→3i+1, t→3i+2), res bits/dim."""
    z = F.lit(0).cast("bigint")
    for i in range(res):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        tbit = F.shiftright(t, i).bitwiseAND(F.lit(1))
        z = (
            z
            + (xbit * F.lit(1 << (3 * i)))
            + (ybit * F.lit(1 << (3 * i + 1)))
            + (tbit * F.lit(1 << (3 * i + 2)))
        )
    return z


#: bits per dimension for z3 (3*res bits total; 5 → 32 cells per dimension).
Z3_RES = 5


def epoch_seconds(ts: Column) -> Column:
    """Whole seconds since 1970-01-01 in the timestamp's own wall-clock
    frame — TZ-independent for TIMESTAMP_NTZ (parquet naive timestamps),
    matching DuckDB's treatment of the same column. `cast(ts as double)`
    is illegal on NTZ in Spark 4 and `unix_timestamp` shifts by session
    timezone; timestampdiff against an NTZ literal does neither."""
    return F.timestamp_diff(
        "SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), ts
    )


def z3(
    lon: Column,
    lat: Column,
    epoch_s: Column,
    t_lo: int,
    t_hi: int,
    res: int = Z3_RES,
) -> Column:
    """z3 spatio-temporal cell id — lon/lat plus epoch-seconds within the
    fixed period [t_lo, t_hi). The reference manages GeoMesa's z3 index
    tables (`{catalog}_{sft}_z3`, SURVEY.md §1.1 row 3); here the curve is
    a computed bigint column, usable for layout and range pruning exactly
    like z2."""
    return _interleave_bits3(
        _scale(lon, -180.0, 180.0, res),
        _scale(lat, -90.0, 90.0, res),
        _scale(epoch_s.cast("double"), float(t_lo), float(t_hi), res),
        res,
    )


def _cell_index(v: float, lo: float, hi: float, res: int) -> int:
    cells = 1 << res
    i = int((v - lo) / (hi - lo) * cells)
    return min(max(i, 0), cells - 1)


def _interleave_int(x: int, y: int, res: int) -> int:
    z = 0
    for i in range(res):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def bbox_cell_ranges(
    lon_min: float,
    lon_max: float,
    lat_min: float,
    lat_max: float,
    res: int = DEFAULT_RES,
    max_ranges: int = 32,
) -> list[tuple[int, int]]:
    """z2 ranges covering a bbox (driver-side, tiny), capped at
    ``max_ranges`` by merging the smallest gaps between runs.

    The cap trades read amplification for predicate size: a merged range
    covers some cells outside the bbox (slack), which the exact refine
    filters out — results never change, and the filter stays small enough
    for codegen (a 2000-term OR blows Janino's 64 KB method limit).
    GeoMesa's recursive range decomposition makes the same tradeoff.
    """
    x0 = _cell_index(lon_min, -180.0, 180.0, res)
    x1 = _cell_index(lon_max, -180.0, 180.0, res)
    y0 = _cell_index(lat_min, -90.0, 90.0, res)
    y1 = _cell_index(lat_max, -90.0, 90.0, res)
    zs = sorted(
        _interleave_int(x, y, res) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)
    )
    return _merge_ranges(zs, max_ranges)


def _merge_ranges(zs: list[int], max_ranges: int) -> list[tuple[int, int]]:
    """Collapse a sorted cell list into contiguous [lo, hi] runs, then — if
    over ``max_ranges`` — merge across the SMALLEST gaps first. Shared by
    the z2 and z3 covers so the slack/predicate-size tradeoff (and any
    future fix to it) stays identical on both paths. Merged slack is
    filtered by the exact refine; results never change."""
    ranges: list[tuple[int, int]] = []
    for v in zs:
        if ranges and v == ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], v)
        else:
            ranges.append((v, v))
    if len(ranges) > max_ranges:
        gaps = sorted(
            (ranges[i + 1][0] - ranges[i][1], i) for i in range(len(ranges) - 1)
        )
        merge_after = {i for _, i in gaps[: len(ranges) - max_ranges]}
        merged: list[tuple[int, int]] = []
        for i, r in enumerate(ranges):
            if merged and (i - 1) in merge_after:
                merged[-1] = (merged[-1][0], r[1])
            else:
                merged.append(r)
        ranges = merged
    return ranges


def _between_cover(z: Column, ranges: list[tuple[int, int]]) -> Column:
    """OR-of-BETWEENs over a STORED z column — the pushable form (each
    BETWEEN reaches the parquet reader as min/max-skippable range
    predicates). Shared by the z2 and z3 stored paths."""
    cover = None
    for lo, hi in ranges:
        term = z.between(lo, hi)
        cover = term if cover is None else (cover | term)
    return cover


def bbox_filter(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    lon_min: float,
    lon_max: float,
    lat_min: float,
    lat_max: float,
    z2_col: str | None = None,
    res: int = DEFAULT_RES,
    z2_stored: bool = True,
) -> DataFrame:
    """Exact bbox filter, pruned by z2 ranges when a z2 column exists.

    ``z2_stored=True`` (a physical column, the write_z_ordered layout):
    the cover is an OR-of-BETWEENs — a pushable parquet predicate (min/max
    row-group skipping on the clustered column).

    ``z2_stored=False`` (z2 derived in the same plan): the cover binds the
    computed z2 ONCE as a higher-order-function lambda variable —
    `exists(array(z2), zz -> exists(ranges, r -> lo<=zz<=hi))`. A plain
    OR-chain (or an exists that references the column by name) is a
    codegen trap: Catalyst collapses the projection into the filter and
    re-inlines the whole bit-interleave expression into every disjunct —
    no CSE across short-circuited branches, 2·|ranges| evaluations per row
    and a Janino 64 KB overflow. Lambda variables are the one Catalyst
    construct substitution cannot reach through. Nothing pushes to the
    scan either way (the column doesn't exist there), so no pruning is
    lost.

    Either way the exact lon/lat refine runs after — cover-and-refine,
    results identical to the full scan.
    """
    exact = (
        (F.col(lon_col) >= lon_min)
        & (F.col(lon_col) <= lon_max)
        & (F.col(lat_col) >= lat_min)
        & (F.col(lat_col) <= lat_max)
    )
    if z2_col is not None:
        ranges = bbox_cell_ranges(lon_min, lon_max, lat_min, lat_max, res)
        if ranges and z2_stored:
            return df.where(_between_cover(F.col(z2_col), ranges)).where(exact)
        if ranges:
            # COMPUTED z: the cover cannot skip I/O (the column is not at
            # the scan), so evaluate the CHEAP exact refine first — the
            # combined Filter short-circuits left-to-right, and the big
            # interleave+ranges expression then runs only on rows already
            # inside the box (r14, guide §1.2: don't compute what you
            # throw away). Stored covers stay cover-first: there the
            # BETWEENs are the pushable scan predicate.
            cover = _ranges_cover_bound_once(F.col(z2_col), ranges)
            return df.where(exact).where(cover)
    return df.where(exact)


def _ranges_cover_bound_once(z: Column, ranges: list[tuple[int, int]]) -> Column:
    """`exists(array(z), zz -> exists(ranges, r -> lo<=zz<=hi))` — the
    single-element array binds the (possibly huge) z expression to a lambda
    variable, so Catalyst's projection-collapse cannot re-inline it into
    every range comparison. z is evaluated exactly once per row."""
    bounds = F.array(
        *[F.struct(F.lit(lo).alias("lo"), F.lit(hi).alias("hi")) for lo, hi in ranges]
    )
    return F.exists(
        F.array(z),
        lambda zz: F.exists(bounds, lambda r: (zz >= r["lo"]) & (zz <= r["hi"])),
    )


def _interleave_int3(x: int, y: int, t: int, res: int) -> int:
    z = 0
    for i in range(res):
        z |= ((x >> i) & 1) << (3 * i)
        z |= ((y >> i) & 1) << (3 * i + 1)
        z |= ((t >> i) & 1) << (3 * i + 2)
    return z


def spacetime_cell_ranges(
    lon_min: float,
    lon_max: float,
    lat_min: float,
    lat_max: float,
    t_min: int,
    t_max: int,
    t_lo: int,
    t_hi: int,
    res: int = Z3_RES,
    max_ranges: int = 32,
) -> list[tuple[int, int]]:
    """z3 ranges covering a (bbox × time-interval) query box — the
    GeoMesa-z3 decomposition, driver-side over ≤2^(3·res) cells. Same
    merge-smallest-gaps cap as bbox_cell_ranges: slack is refined away by
    the exact predicate, never a correctness concern."""
    x0 = _cell_index(lon_min, -180.0, 180.0, res)
    x1 = _cell_index(lon_max, -180.0, 180.0, res)
    y0 = _cell_index(lat_min, -90.0, 90.0, res)
    y1 = _cell_index(lat_max, -90.0, 90.0, res)
    t0 = _cell_index(float(t_min), float(t_lo), float(t_hi), res)
    t1 = _cell_index(float(t_max), float(t_lo), float(t_hi), res)
    zs = sorted(
        _interleave_int3(x, y, t, res)
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
        for t in range(t0, t1 + 1)
    )
    return _merge_ranges(zs, max_ranges)


def spacetime_filter(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    epoch_col: Column,
    lon_min: float,
    lon_max: float,
    lat_min: float,
    lat_max: float,
    t_min: int,
    t_max: int,
    t_lo: int,
    t_hi: int,
    z3_col: str | Column,
    res: int = Z3_RES,
    z3_stored: bool = False,
) -> DataFrame:
    """Cover-and-refine for a space-time box over a z3 column (name or
    expression). Same stored-vs-computed split as bbox_filter: stored →
    OR-of-BETWEENs (pushable, row-group skipping); computed → the
    bind-once higher-order cover (`_ranges_cover_bound_once`) so the big
    interleave expression is evaluated once per row, not per range."""
    exact = (
        (F.col(lon_col) >= lon_min)
        & (F.col(lon_col) <= lon_max)
        & (F.col(lat_col) >= lat_min)
        & (F.col(lat_col) <= lat_max)
        & (epoch_col >= t_min)
        & (epoch_col < t_max)
    )
    z = F.col(z3_col) if isinstance(z3_col, str) else z3_col
    ranges = spacetime_cell_ranges(
        lon_min, lon_max, lat_min, lat_max, t_min, t_max, t_lo, t_hi, res
    )
    if not ranges:
        return df.where(exact)
    if z3_stored:
        return df.where(_between_cover(z, ranges)).where(exact)
    # computed z3: exact refine first, big interleave cover second — same
    # short-circuit rationale as bbox_filter's computed branch
    return df.where(exact).where(_ranges_cover_bound_once(z, ranges))


def cell_of(coord: Column, lo: float, hi: float, res: int) -> Column:
    """Public column form of the per-dimension cell index (same clamped
    scale as `_cell_index`) — building block for in-plan cell covers."""
    return _scale(coord, lo, hi, res)


def z2_of_cells(x: Column, y: Column, res: int = DEFAULT_RES) -> Column:
    """z2 id from per-dimension cell indices already computed in-plan."""
    return _interleave_bits(x, y, res)


def ring_contains_point(ring: Column, lon: Column, lat: Column) -> Column:
    """Ray-cast point-in-polygon where the polygon is a PER-ROW
    `array<struct<lon,lat>>` (open ring, first vertex NOT repeated) — the
    join-shaped variant of `st_contains_polygon` (whose ring is a fixed
    driver-side literal). Edges are the ring zipped with its rotation;
    crossings counted with `filter`+`size`, parity = inside. All array
    expressions — no UDF, no explode; the per-row cost is O(vertices).
    Horizontal edges (y1 == y2) never satisfy the spans test, and the
    division they'd break on is unreachable under SQL's false-AND-anything
    short circuit in every engine that evaluates doubles (inf/NaN compare
    false), but supply rings without horizontal edges when bit-exact
    cross-engine parity matters. Degenerate rings (< 3 vertices — the
    malformed-WKT empty array included) contain nothing rather than
    crashing: slice() with a negative length is a runtime error under
    Spark 4 ANSI semantics, so the guard is load-bearing."""
    rotated = F.concat(F.slice(ring, 2, F.size(ring) - 1), F.slice(ring, 1, 1))
    edges = F.zip_with(
        ring,
        rotated,
        lambda p, q: F.struct(
            p["lon"].alias("x1"), p["lat"].alias("y1"),
            q["lon"].alias("x2"), q["lat"].alias("y2"),
        ),
    )
    crossing = F.size(
        F.filter(
            edges,
            lambda e: ((e["y1"] > lat) != (e["y2"] > lat))
            & (
                lon
                < e["x1"]
                + (lat - e["y1"]) * (e["x2"] - e["x1"]) / (e["y2"] - e["y1"])
            ),
        )
    )
    return F.when(F.size(ring) >= 3, crossing % 2 == 1).otherwise(F.lit(False))


def st_contains_bbox(
    lon: Column, lat: Column, lon_min: float, lon_max: float, lat_min: float, lat_max: float
) -> Column:
    return (
        (lon >= lon_min) & (lon <= lon_max) & (lat >= lat_min) & (lat <= lat_max)
    )


def st_contains_convex(
    lon: Column, lat: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Point-in-convex-polygon via half-plane tests: for a counter-clockwise
    vertex ring, the point is inside iff every edge cross-product is >= 0
    (boundary inclusive). Pure arithmetic — k sign tests, unrolled as Column
    expressions, codegen-friendly and bit-identical in any SQL engine.
    General (concave/holed) polygons need ray casting — that variant belongs
    in a pandas UDF; convex covers the common query-region case."""
    cond = None
    k = len(vertices)
    for i in range(k):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % k]
        cross = (F.lit(x2 - x1) * (lat - F.lit(y1))) - (
            F.lit(y2 - y1) * (lon - F.lit(x1))
        )
        term = cross >= 0
        cond = term if cond is None else (cond & term)
    return cond


#: WKT point literal, e.g. "POINT (12.5 -45)".
WKT_POINT_RE = r"POINT \((-?[0-9.]+) (-?[0-9.]+)\)"


def parse_wkt_point(wkt: Column) -> Column:
    """Parse a WKT POINT string to a (lon, lat) struct — regexp_extract per
    coordinate, JVM-side; rows that don't match yield nulls (schema-on-read,
    same silent-drop contract as functions/parsing.py)."""
    lon = F.regexp_extract(wkt, WKT_POINT_RE, 1)
    lat = F.regexp_extract(wkt, WKT_POINT_RE, 2)
    return F.struct(
        F.when(lon != "", lon).cast("double").alias("lon"),
        F.when(lat != "", lat).cast("double").alias("lat"),
    )


#: One "lon lat" coordinate pair inside a WKT ring.
WKT_COORD_RE = r"(-?[0-9.]+) (-?[0-9.]+)"


def parse_wkt_ring(wkt: Column) -> Column:
    """Parse the outer ring of a WKT POLYGON (or LINESTRING) into an
    `array<struct<lon double, lat double>>` — closes the gap left by
    parse_wkt_point, which only handles POINT. Pure JVM string machinery:
    `regexp_extract_all` pulls every coordinate pair, `transform` + `split`
    types them; no Python UDF, so at 100 TB this stays inside whole-stage
    codegen on the scan. WKT closes rings by repeating the first vertex —
    the duplicate is kept (callers that need the open ring slice it off).
    Malformed input yields an empty array (schema-on-read contract of
    functions/parsing.py)."""
    # isolate the OUTER ring's text before extracting pairs: a POLYGON
    # with holes carries interior rings whose coordinates must NOT leak
    # into the result (they would corrupt area/containment silently) —
    # the first '('-group up to the first ')' is the outer ring for both
    # POLYGON ((...), (...)) and LINESTRING (...)
    outer = F.regexp_extract(wkt, r"\(\s*\(?([^()]*)\)", 1)
    coords = F.regexp_extract_all(outer, F.lit(WKT_COORD_RE), 0)
    return F.transform(
        coords,
        lambda c: F.struct(
            F.split(c, " ")[0].cast("double").alias("lon"),
            F.split(c, " ")[1].cast("double").alias("lat"),
        ),
    )


def ring_area(ring: Column) -> Column:
    """Shoelace area of a closed ring (array<struct<lon,lat>> whose last
    vertex repeats the first): |Σ (x_i·y_{i+1} − x_{i+1}·y_i)| / 2 over the
    n−1 edges. `aggregate` over `zip_with`-style adjacent pairs, expressed
    with slice() so the whole thing is one codegen'd expression per row —
    no explode, no shuffle, no UDF. Degenerate rings (< 2 vertices — the
    malformed-WKT empty array included) have zero area rather than
    crashing: slice() with a negative length is a runtime error under
    Spark 4 ANSI semantics, so the guard is load-bearing."""
    edges = F.zip_with(
        F.slice(ring, 1, F.size(ring) - 1),
        F.slice(ring, 2, F.size(ring) - 1),
        lambda p, q: p["lon"] * q["lat"] - q["lon"] * p["lat"],
    )
    total = F.aggregate(edges, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(F.size(ring) >= 2, F.abs(total) / F.lit(2.0)).otherwise(
        F.lit(0.0)
    )


def ring_bbox(ring: Column) -> Column:
    """(min_lon, min_lat, max_lon, max_lat) of a parsed ring — array math
    only, the envelope every spatial index keys on."""
    lons = F.transform(ring, lambda p: p["lon"])
    lats = F.transform(ring, lambda p: p["lat"])
    return F.struct(
        F.array_min(lons).alias("min_lon"),
        F.array_min(lats).alias("min_lat"),
        F.array_max(lons).alias("max_lon"),
        F.array_max(lats).alias("max_lat"),
    )


def st_contains_polygon(
    lon: Column, lat: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Point-in-polygon for an arbitrary (possibly concave) fixed ring via
    ray casting: count edges whose span crosses the point's latitude and
    whose intersection with the horizontal ray lies east of the point; odd
    crossing count = inside. Unrolled per-vertex into plain arithmetic —
    same expression the SQL oracle states, so results are bit-identical.
    Boundary points follow the ray-casting convention (edge-dependent)."""
    crossings = None
    k = len(vertices)
    for i in range(k):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % k]
        spans = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        x_at = F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        term = F.when(spans & (lon < x_at), 1).otherwise(0)
        crossings = term if crossings is None else (crossings + term)
    return crossings % 2 == 1


def st_dwithin_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column, km: float) -> Column:
    """Great-circle proximity predicate (haversine, built-in math only)."""
    return haversine_km(lon1, lat1, lon2, lat2) <= km


def dwithin_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_id: str,
    right_id: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """Distance-bounded point-point JOIN — "every (l, r) within R km" — as
    a grid-cell cover-and-refine, never a cross join.

    Cover: the cell bounds come straight from the haversine identity the
    refine stage uses — sin²(d/2Rₑ) = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)
    on the Rₑ = 6371.0088 km sphere — so cover and refine can never
    disagree (an approximate km-per-degree constant here once dropped
    boundary pairs the refine would have accepted):

    - latitude: Δφ ≤ d/Rₑ exactly, so δlat = degrees(R/Rₑ) with a small
      safety factor;
    - longitude: cosφ₁·cosφ₂ ≥ cos²(max_abs_lat) inside the band, giving
      Δλ ≤ 2·asin(sin(R/2Rₑ)/cos(max_abs_lat)) exactly. Cells are
      N = floor(360/δλ) EQUAL widths ≥ δλ and wrap MOD N at the
      antimeridian (a pair straddling lon ±180 lands in circularly-
      adjacent cells and is still found).

    Any pair within R km therefore differs by < 1 cell per axis; the left
    side probes its 3×3 neighborhood (lon neighbors mod N,
    `array_distinct` so tiny N never emits a duplicate probe → no
    duplicate pairs), making the physical join a hash equi-join on
    (cx, cy). A right point lives in exactly one cell. Refine: exact
    haversine ≤ R.

    Rows with |lat| > max_abs_lat are excluded — the Δλ bound needs
    cos(max_abs_lat) > sin(R/2Rₑ) (cells degenerate toward the poles); a
    production deployment adds polar-cap buckets. Returns
    (left_id, right_id, km).

    At 100 TB: shuffle is keyed on the cell — spatially co-located points
    hash together, AQE splits hot cells, and the 9× probe fan-out applies
    to the (smaller) probe side only."""
    import math

    r_e = 6371.0088  # same sphere radius as haversine_km
    margin = 1.0 + 1e-9
    dlat = math.degrees(radius_km / r_e) * margin
    sin_half = math.sin(radius_km / (2.0 * r_e))
    cos_band = math.cos(math.radians(max_abs_lat))
    if sin_half * margin >= cos_band:
        # radius spans any longitude inside the band — one lon cell
        n_lon = 1
    else:
        dlon_min = math.degrees(2.0 * math.asin(sin_half / cos_band)) * margin
        n_lon = max(1, int(360.0 // dlon_min))
        while n_lon > 1 and 360.0 / n_lon < dlon_min:
            n_lon -= 1
    dlon = 360.0 / n_lon

    def prep(df: DataFrame, idc: str, pre: str) -> DataFrame:
        bounded = df.where(F.abs(F.col(lat_col)) <= max_abs_lat)
        cx = F.least(
            F.floor((F.col(lon_col) + 180.0) / dlon), F.lit(n_lon - 1)
        )  # lon=+180 exactly folds into the last cell
        return bounded.select(
            F.col(idc),
            F.col(lon_col).alias(f"{pre}lon"),
            F.col(lat_col).alias(f"{pre}lat"),
            cx.alias("cx"),
            F.floor(F.col(lat_col) / dlat).alias("cy"),
        )

    lon_probes = F.array_distinct(
        F.array(
            F.pmod(F.col("cx") - 1, F.lit(n_lon)),
            F.col("cx"),
            F.pmod(F.col("cx") + 1, F.lit(n_lon)),
        )
    )
    l9 = (
        prep(left, left_id, "l")
        .withColumn("cx", F.explode(lon_probes))
        .withColumn("cy", F.explode(F.array(F.col("cy") - 1, F.col("cy"), F.col("cy") + 1)))
    )
    r1 = prep(right, right_id, "r")
    km = haversine_km(F.col("llon"), F.col("llat"), F.col("rlon"), F.col("rlat"))
    return (
        l9.join(r1, ["cx", "cy"])
        .withColumn("km", km)
        .where(F.col("km") <= radius_km)
        .select(left_id, right_id, "km")
    )


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    r = 6371.0088
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * r) * F.asin(F.sqrt(a))


def write_z_ordered(df: DataFrame, path: str, lon_col: str, lat_col: str,
                    res: int = DEFAULT_RES, num_files: int | None = None) -> None:
    """Write a table clustered by z2 — the engine's replacement for the
    reference's z2 side-tables. `repartitionByRange(z2)` + in-partition sort
    gives each parquet file a tight z2 min/max, which is what makes
    `bbox_filter`'s range predicates skip row groups at read time."""
    from geomesa_cassandra_tools_spark.operators.relational import (
        _estimated_scan_partitions,
    )

    out = df.withColumn("z2", z2(F.col(lon_col), F.col(lat_col), res))
    # derive the default file count WITHOUT a full logical→RDD conversion
    parts = num_files or max(_estimated_scan_partitions(df), 1)
    (
        out.repartitionByRange(parts, F.col("z2"))
        .sortWithinPartitions("z2")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_z3_ordered(
    df: DataFrame,
    path: str,
    lon_col: str,
    lat_col: str,
    epoch_col: Column,
    t_lo: int,
    t_hi: int,
    res: int = Z3_RES,
    num_files: int | None = None,
) -> None:
    """Write a table clustered by z3 — the engine's replacement for the
    reference's `{catalog}_{sft}_z3` space-TIME side-tables
    (/root/reference/geomesa.py:52). Same mechanics as `write_z_ordered`
    with the time dimension interleaved: `repartitionByRange(z3)` +
    in-partition sort give each file a tight z3 span, so
    `spacetime_filter(z3_stored=True)`'s OR-of-BETWEENs skip row groups
    on BOTH the spatial and temporal axes of the query box."""
    from geomesa_cassandra_tools_spark.operators.relational import (
        _estimated_scan_partitions,
    )

    out = df.withColumn(
        "z3", z3(F.col(lon_col), F.col(lat_col), epoch_col, t_lo, t_hi, res)
    )
    parts = num_files or max(_estimated_scan_partitions(df), 1)
    (
        out.repartitionByRange(parts, F.col("z3"))
        .sortWithinPartitions("z3")
        .write.mode("overwrite")
        .parquet(path)
    )
