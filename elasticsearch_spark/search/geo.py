"""geo_point query surface: distance, bounding box, polygon, grid cells,
and a geo_shape MVP (WKT query shapes vs point fields).

Reference: index/query/GeoDistanceQueryBuilder.java (arc distance via
Lucene's haversin), sort/GeoDistanceSortBuilder.java,
GeoBoundingBoxQueryBuilder.java / GeoPolygonQueryBuilder.java
(registered in SearchModule.java:810-826), the geohash_grid /
geotile_grid bucket sources (SearchModule.java:437-448,
bucket/geogrid/GeoHashGridAggregationBuilder.java), and geo_shape
(GeoShapeQueryBuilder.java + x-pack/plugin/spatial ShapeQueryBuilder):
this engine supports WKT POINT/POLYGON (with holes)/MULTIPOLYGON/
ENVELOPE query shapes with intersects/within/disjoint relations against
geo_point fields — full BKD-indexed doc-side geometries stay out of
scope.

The haversine great-circle distance is written as ONE fixed sequence of
double ops so the DuckDB oracle can reproduce it bit-for-bit-ish
(matching op order; trig libm differences are sub-ulp and the contract
rounds to 4 decimals):

    d = 2 R asin(sqrt(sin^2(dlat/2) + cos(lat1) cos(lat2) sin^2(dlon/2)))
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * (F.sin(dlon) * F.sin(dlon))
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The identical expression as DuckDB SQL (same op order)."""
    dlat = f"radians({lat2} - {lat1}) / 2.0"
    dlon = f"radians({lon2} - {lon1}) / 2.0"
    a = (
        f"sin({dlat}) * sin({dlat})"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * (sin({dlon}) * sin({dlon}))"
    )
    return f"{2.0 * EARTH_RADIUS_KM} * asin(sqrt({a}))"


def geo_distance(
    df: DataFrame,
    origin: tuple[float, float],
    distance_km: float | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    sort: bool = True,
    k: int | None = None,
) -> DataFrame:
    """geo_distance filter (docs within ``distance_km`` of origin) plus
    the geo-distance sort (nearest first, the _geo_distance sort mode).
    Emits a ``distance_km`` column. The distance predicate is a plain
    Catalyst expression, so Parquet min/max pruning on lat/lon bounding
    columns still applies upstream when callers pre-filter with a
    bounding box (the reference's two-phase approach)."""
    olat, olon = float(origin[0]), float(origin[1])
    d = haversine_km(F.col(lat_col), F.col(lon_col), F.lit(olat), F.lit(olon))
    out = df.withColumn("distance_km", d)
    if distance_km is not None:
        out = out.filter(F.col("distance_km") <= F.lit(float(distance_km)))
    if sort:
        out = out.orderBy(F.asc("distance_km"))
    if k is not None:
        out = out.limit(k)
    return out

def geo_bounding_box(
    df: DataFrame,
    top_left: tuple[float, float],
    bottom_right: tuple[float, float],
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str | None = None,
    precision: int = 3,
) -> DataFrame:
    """geo_bounding_box filter (GeoBoundingBoxQueryBuilder.java).

    Corners are (lat, lon). A box whose left longitude is GREATER than
    its right longitude crosses the antimeridian and matches the union
    of the two hemispheric strips (the reference's date-line split) —
    expressed as an OR of two range predicates, so Parquet min/max
    pruning on the lon column still applies to each leg.

    If the table was laid out with :func:`write_geo_partitioned`, pass
    its ``cell_col``/``precision``: the driver computes the covering
    geohash cell set of the box (grid arithmetic, no data pass) and
    adds an IN predicate on the partition column — Catalyst turns it
    into PartitionFilters, so non-covering directories are never even
    listed (the two-phase grid-prune + exact-verify shape of the
    reference's BKD-backed LatLonPoint queries)."""
    top, left = float(top_left[0]), float(top_left[1])
    bottom, right = float(bottom_right[0]), float(bottom_right[1])
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    lat_ok = (lat >= F.lit(bottom)) & (lat <= F.lit(top))
    if left <= right:
        lon_ok = (lon >= F.lit(left)) & (lon <= F.lit(right))
    else:  # crosses the 180 meridian
        lon_ok = (lon >= F.lit(left)) | (lon <= F.lit(right))
    if cell_col is not None:
        cover = geohash_cover_bbox(top_left, bottom_right, precision)
        if cover is not None:  # None = box too big for pruning to help
            df = df.filter(F.col(cell_col).isin(cover))
    return df.filter(lat_ok & lon_ok)


def geo_polygon(
    df: DataFrame,
    points: list[tuple[float, float]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """geo_polygon filter (GeoPolygonQueryBuilder.java): point-in-polygon
    by even-odd ray casting. ``points`` are (lat, lon) vertices.

    The polygon is a query-time constant, so the crossing test unrolls
    into a static Catalyst expression (one CASE per edge, summed, parity
    checked) — pure JVM whole-stage-codegen arithmetic, no UDF. The SQL
    twin (``geo_polygon_sql``) emits the identical per-edge expressions
    in the identical order."""
    y = F.col(lat_col).cast("double")
    x = F.col(lon_col).cast("double")
    crossings = F.lit(0)
    n = len(points)
    for i in range(n):
        yi, xi = float(points[i][0]), float(points[i][1])
        yj, xj = float(points[(i + 1) % n][0]), float(points[(i + 1) % n][1])
        if yi == yj:
            continue  # horizontal edge can never cross a horizontal ray
        straddles = (F.lit(yi) > y) != (F.lit(yj) > y)
        # x-coordinate where the edge crosses the ray at height y
        x_cross = (
            F.lit(xj - xi) * (y - F.lit(yi)) / F.lit(yj - yi) + F.lit(xi)
        )
        crossings = crossings + F.when(straddles & (x < x_cross), 1).otherwise(0)
    return df.filter(crossings % 2 == 1)


def geo_polygon_sql(
    points: list[tuple[float, float]], lat: str, lon: str
) -> str:
    """DuckDB twin of ``geo_polygon``'s crossing-parity predicate —
    generated from the same vertex walk so the float expressions match
    op-for-op."""
    terms = []
    n = len(points)
    for i in range(n):
        yi, xi = float(points[i][0]), float(points[i][1])
        yj, xj = float(points[(i + 1) % n][0]), float(points[(i + 1) % n][1])
        if yi == yj:
            continue
        straddles = f"(({yi!r} > {lat}) != ({yj!r} > {lat}))"
        x_cross = f"({xj - xi!r} * ({lat} - {yi!r}) / {yj - yi!r} + {xi!r})"
        terms.append(
            f"CASE WHEN {straddles} AND ({lon} < {x_cross}) THEN 1 ELSE 0 END"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


# --- geo_shape (WKT query shapes vs point fields) ---------------------

def parse_wkt(wkt: str):
    """Minimal WKT parser for the geo_shape query surface: POINT,
    POLYGON (outer ring + holes), MULTIPOLYGON, ENVELOPE (the CQL/ES
    bbox extension: minlon, maxlon, maxlat, minlat). WKT coordinate
    order is (lon, lat). Returns (kind, payload)."""
    import re as _re

    s = wkt.strip()
    m = _re.match(r"(?is)^\s*(POINT|POLYGON|MULTIPOLYGON|ENVELOPE)\s*\((.*)\)\s*$", s)
    if not m:
        raise ValueError(f"unsupported WKT: {wkt[:60]!r}")
    kind, body = m.group(1).upper(), m.group(2)

    def nums(txt: str) -> list[float]:
        return [float(v) for v in _re.findall(r"[-+0-9.eE]+", txt)]

    def ring(txt: str) -> list[tuple[float, float]]:
        vals = nums(txt)
        if len(vals) % 2 or len(vals) < 6:
            raise ValueError("WKT ring needs >= 3 (lon, lat) pairs")
        return list(zip(vals[0::2], vals[1::2]))

    if kind == "POINT":
        lon, lat = nums(body)
        return "point", (lon, lat)
    if kind == "ENVELOPE":
        minlon, maxlon, maxlat, minlat = nums(body)
        return "envelope", (minlon, maxlon, maxlat, minlat)
    if kind == "POLYGON":
        rings = [ring(r) for r in _re.findall(r"\(([^()]*)\)", body)]
        return "polygon", rings
    # MULTIPOLYGON (((...)),((...), (...)))
    polys = [
        [ring(r) for r in _re.findall(r"\(([^()]*)\)", poly)]
        for poly in _re.findall(r"\((\([^)]*\)(?:\s*,\s*\([^)]*\))*)\)", body)
    ]
    return "multipolygon", polys


def _rings_crossings(rings, y: Column, x: Column) -> Column:
    """Summed ray crossings over a ring set; even-odd parity covers
    holes for free (a point inside outer+hole crosses both)."""
    crossings = F.lit(0)
    for pts in rings:
        n = len(pts)
        for i in range(n):
            xi, yi = float(pts[i][0]), float(pts[i][1])
            xj, yj = float(pts[(i + 1) % n][0]), float(pts[(i + 1) % n][1])
            if yi == yj:
                continue
            straddles = (F.lit(yi) > y) != (F.lit(yj) > y)
            x_cross = (
                F.lit(xj - xi) * (y - F.lit(yi)) / F.lit(yj - yi) + F.lit(xi)
            )
            crossings = crossings + F.when(straddles & (x < x_cross), 1).otherwise(0)
    return crossings


def _rings_crossings_sql(rings, lat: str, lon: str) -> list[str]:
    terms = []
    for pts in rings:
        n = len(pts)
        for i in range(n):
            xi, yi = float(pts[i][0]), float(pts[i][1])
            xj, yj = float(pts[(i + 1) % n][0]), float(pts[(i + 1) % n][1])
            if yi == yj:
                continue
            straddles = f"(({yi!r} > {lat}) != ({yj!r} > {lat}))"
            x_cross = f"({xj - xi!r} * ({lat} - {yi!r}) / {yj - yi!r} + {xi!r})"
            terms.append(
                f"CASE WHEN {straddles} AND ({lon} < {x_cross}) THEN 1 ELSE 0 END"
            )
    return terms


def geo_shape_predicate(
    wkt: str, lat_col: str = "lat", lon_col: str = "lon"
) -> Column:
    """intersects-predicate for a WKT query shape against a point
    field, unrolled to a static whole-stage-codegen expression (the
    shape is a query-time constant, like geo_polygon)."""
    y = F.col(lat_col).cast("double")
    x = F.col(lon_col).cast("double")
    kind, payload = parse_wkt(wkt)
    if kind == "point":
        lon, lat = payload
        return (y == F.lit(float(lat))) & (x == F.lit(float(lon)))
    if kind == "envelope":
        minlon, maxlon, maxlat, minlat = payload
        lon_ok = (
            (x >= F.lit(minlon)) & (x <= F.lit(maxlon))
            if minlon <= maxlon
            # dateline-crossing envelope, as GeoBoundingBox allows
            else (x >= F.lit(minlon)) | (x <= F.lit(maxlon))
        )
        return lon_ok & (y >= F.lit(minlat)) & (y <= F.lit(maxlat))
    if kind == "polygon":
        return _rings_crossings(payload, y, x) % 2 == 1
    # multipolygon: union of per-polygon parities
    pred = F.lit(False)
    for rings in payload:
        pred = pred | (_rings_crossings(rings, y, x) % 2 == 1)
    return pred


def geo_shape(
    df: DataFrame,
    wkt: str,
    relation: str = "intersects",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """geo_shape query for point fields (GeoShapeQueryBuilder.java
    relations): for a point doc, ``within`` coincides with
    ``intersects`` (a point intersecting a shape lies within it);
    ``disjoint`` is the strict complement over non-null coordinates
    (ES: docs without the field never match any relation)."""
    pred = geo_shape_predicate(wkt, lat_col, lon_col)
    not_null = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    if relation in ("intersects", "within"):
        return df.filter(not_null & pred)
    if relation == "disjoint":
        return df.filter(not_null & ~pred)
    raise ValueError(f"unsupported geo_shape relation {relation!r}")


def geo_shape_sql(
    wkt: str, lat: str = "lat", lon: str = "lon",
    relation: str = "intersects",
) -> str:
    """DuckDB twin of geo_shape's predicate — generated from the same
    vertex walk so the float expressions match op-for-op."""
    kind, payload = parse_wkt(wkt)
    if kind == "point":
        lon_v, lat_v = payload
        pred = f"({lat} = {float(lat_v)!r} AND {lon} = {float(lon_v)!r})"
    elif kind == "envelope":
        minlon, maxlon, maxlat, minlat = payload
        lon_ok = (
            f"({lon} >= {minlon!r} AND {lon} <= {maxlon!r})"
            if minlon <= maxlon
            else f"({lon} >= {minlon!r} OR {lon} <= {maxlon!r})"
        )
        pred = (f"({lon_ok} AND {lat} >= {minlat!r} AND {lat} <= {maxlat!r})")
    elif kind == "polygon":
        terms = _rings_crossings_sql(payload, lat, lon)
        pred = f"(({' + '.join(terms)}) % 2 = 1)"
    else:
        parts = []
        for rings in payload:
            terms = _rings_crossings_sql(rings, lat, lon)
            parts.append(f"(({' + '.join(terms)}) % 2 = 1)")
        pred = "(" + " OR ".join(parts) + ")"
    base = f"({lat} IS NOT NULL AND {lon} IS NOT NULL)"
    if relation in ("intersects", "within"):
        return f"({base} AND {pred})"
    if relation == "disjoint":
        return f"({base} AND NOT {pred})"
    raise ValueError(f"unsupported geo_shape relation {relation!r}")


# --- doc-side shapes (WKT shape FIELDS, shape-vs-shape relations) -----
#
# The reference indexes geo_shape fields as BKD triangle trees
# (server/.../index/mapper/GeoShapeFieldMapper.java) and evaluates
# ShapeRelation INTERSECTS/DISJOINT/WITHIN/CONTAINS against them. The
# Spark re-expression evaluates the relation per document over a WKT
# column with a vectorized Arrow-batched UDF: the query shape is a
# constant, each unique doc WKT is parsed and tested ONCE per batch
# (shape vocabularies repeat), and the geometry kernel is the classic
# even-odd parity + segment-orientation test — no external geo library.


def _shape_polys(kind, payload):
    """Normalize a parse_wkt result to a list of polygons, each a list
    of rings (first outer, rest holes); a point becomes None (handled
    separately)."""
    if kind == "point":
        return None
    if kind == "envelope":
        minlon, maxlon, maxlat, minlat = payload
        return [[[(minlon, minlat), (maxlon, minlat),
                  (maxlon, maxlat), (minlon, maxlat)]]]
    if kind == "polygon":
        return [payload]
    return payload  # multipolygon


def _pt_in_polys(polys, pt) -> bool:
    """Even-odd parity over every ring of any polygon (holes for free,
    same rule as _rings_crossings)."""
    x, y = pt
    for rings in polys:
        crossings = 0
        for ring in rings:
            n = len(ring)
            for i in range(n):
                xi, yi = ring[i]
                xj, yj = ring[(i + 1) % n]
                if yi == yj:
                    continue
                if (yi > y) != (yj > y) and \
                        x < (xj - xi) * (y - yi) / (yj - yi) + xi:
                    crossings += 1
        if crossings % 2 == 1:
            return True
    return False


def _segs_cross(a, b, c, d) -> bool:
    """Proper or touching intersection of segments ab and cd
    (orientation signs + collinear-overlap bounds)."""
    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    if o1 != o2 and o3 != o4:
        return True

    def on_seg(p, q, r):
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

    return ((o1 == 0 and on_seg(a, b, c)) or (o2 == 0 and on_seg(a, b, d))
            or (o3 == 0 and on_seg(c, d, a)) or (o4 == 0 and on_seg(c, d, b)))


def _iter_segs(polys):
    for rings in polys:
        for ring in rings:
            n = len(ring)
            for i in range(n):
                yield ring[i], ring[(i + 1) % n]


def _any_edge_cross(pa, pb) -> bool:
    segs_b = list(_iter_segs(pb))
    for a1, a2 in _iter_segs(pa):
        for b1, b2 in segs_b:
            if _segs_cross(a1, a2, b1, b2):
                return True
    return False


def shapes_relation(query_wkt: str, doc_wkt: str, relation: str) -> bool:
    """ShapeRelation semantics between a constant query shape and one
    document shape (both WKT). ``within`` = doc within query,
    ``contains`` = doc contains query, as GeoShapeQueryBuilder defines
    them. Point docs: within == intersects == point-in-shape."""
    qk, qp = parse_wkt(query_wkt)
    dk, dp = parse_wkt(doc_wkt)
    qpolys, dpolys = _shape_polys(qk, qp), _shape_polys(dk, dp)

    def intersects() -> bool:
        if dpolys is None and qpolys is None:
            return dp == qp
        if dpolys is None:
            return _pt_in_polys(qpolys, dp)
        if qpolys is None:
            return _pt_in_polys(dpolys, qp)
        if _any_edge_cross(qpolys, dpolys):
            return True
        # no crossings: either disjoint or one part fully inside the
        # other — probe one vertex per POLYGON part of each shape
        return (any(_pt_in_polys(qpolys, rings[0][0]) for rings in dpolys)
                or any(_pt_in_polys(dpolys, rings[0][0])
                       for rings in qpolys))

    if relation == "intersects":
        return intersects()
    if relation == "disjoint":
        return not intersects()
    if relation == "within":
        # doc within query: no boundary crossing, every doc vertex
        # inside, and no query vertex strictly inside the doc (a query
        # HOLE poking into the doc region has its ring inside the doc)
        if dpolys is None:
            return qpolys is not None and _pt_in_polys(qpolys, dp)
        if qpolys is None:
            return False
        if _any_edge_cross(qpolys, dpolys):
            return False
        return (all(_pt_in_polys(qpolys, v)
                    for rings in dpolys for ring in rings for v in ring)
                and not any(_pt_in_polys(dpolys, v)
                            for rings in qpolys for ring in rings
                            for v in ring))
    if relation == "contains":
        return shapes_relation(doc_wkt, query_wkt, "within")
    raise ValueError(f"unsupported geo_shape relation {relation!r}")


def doc_geo_shape(
    df: DataFrame,
    wkt: str,
    shape_col: str = "shape",
    relation: str = "intersects",
) -> DataFrame:
    """geo_shape query against a WKT shape FIELD. Vectorized: one
    Arrow-batched pandas UDF, the relation computed once per UNIQUE
    doc WKT per batch (docs without the field never match, as ES)."""
    from pyspark.sql.functions import pandas_udf

    rel = relation

    @pandas_udf("boolean")
    def _match(shapes: pd.Series) -> pd.Series:
        cache: dict[str, bool] = {}
        out = []
        for s in shapes:
            if s is None:
                out.append(False)
                continue
            hit = cache.get(s)
            if hit is None:
                hit = cache[s] = shapes_relation(wkt, s, rel)
            out.append(hit)
        return pd.Series(out, dtype="boolean")

    return df.filter(F.col(shape_col).isNotNull() & _match(F.col(shape_col)))


# --- grid cells -------------------------------------------------------

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _grid_indices(precision: int) -> tuple[int, int, int]:
    total = 5 * precision
    return total, (total + 1) // 2, total // 2  # total, lon bits, lat bits


def geohash(lat_col, lon_col, precision: int = 4):
    """Geohash cell id (base-32 string) as pure Catalyst arithmetic.

    Classic geohash = bit-interleave of the lon/lat cell indices (lon
    first), 5 bits per output character. The successive-bisection loop
    of the textbook encoder is equivalent to taking the bits of
    idx = floor((coord - lo) / range * 2^nbits); multiplying by a power
    of two is exact in IEEE doubles, so the engine and the SQL twin
    (``geohash_sql``) compute identical doubles before the floor."""
    total, nlon, nlat = _grid_indices(precision)
    lon_idx = F.least(
        F.floor(
            (F.col(lon_col).cast("double") + F.lit(180.0))
            / F.lit(360.0) * F.lit(float(1 << nlon))
        ).cast("long"),
        F.lit((1 << nlon) - 1),
    )
    lat_idx = F.least(
        F.floor(
            (F.col(lat_col).cast("double") + F.lit(90.0))
            / F.lit(180.0) * F.lit(float(1 << nlat))
        ).cast("long"),
        F.lit((1 << nlat) - 1),
    )
    combined = F.lit(0).cast("long")
    for i in range(total):
        src, nbits = (lon_idx, nlon) if i % 2 == 0 else (lat_idx, nlat)
        src_bit = nbits - 1 - i // 2
        out_shift = total - 1 - i
        bit = F.shiftright(src, src_bit).bitwiseAND(F.lit(1))
        combined = combined + bit * F.lit(1 << out_shift)
    chars = [
        F.substring(
            F.lit(GEOHASH32),
            (F.shiftright(combined, total - 5 * (c + 1))
             .bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def _geohash_of_indices(lon_idx: int, lat_idx: int, precision: int) -> str:
    """Geohash string for integer grid indices — the same interleave
    the Catalyst encoder performs, in driver-side Python."""
    total, nlon, nlat = _grid_indices(precision)
    combined = 0
    for i in range(total):
        src, nbits = (lon_idx, nlon) if i % 2 == 0 else (lat_idx, nlat)
        bit = (src >> (nbits - 1 - i // 2)) & 1
        combined |= bit << (total - 1 - i)
    return "".join(
        GEOHASH32[(combined >> (total - 5 * (c + 1))) & 31]
        for c in range(precision)
    )


def geohash_cover_bbox(
    top_left: tuple[float, float],
    bottom_right: tuple[float, float],
    precision: int = 3,
    max_cells: int = 4096,
) -> list[str] | None:
    """Geohash cells covering a bounding box — pure driver-side grid
    arithmetic, no data pass (the grid-cover step of the reference's
    LatLonPoint BKD query, server/.../index/query/GeoBoundingBoxQueryBuilder.java).

    Index math is bit-identical to :func:`geohash`: ``floor((coord -
    lo) / range * 2^nbits)`` in IEEE doubles, so any point inside the
    box lands in a returned cell (floor of a monotone map is monotone,
    and Python and the JVM evaluate the same double ops). Antimeridian
    crossing (left > right) covers the two hemispheric strips.

    Returns ``None`` when the cover would exceed ``max_cells`` — a box
    that big touches most partitions anyway, so the caller should skip
    the IN predicate rather than ship a giant literal list.
    """
    import math

    top, left = float(top_left[0]), float(top_left[1])
    bottom, right = float(bottom_right[0]), float(bottom_right[1])
    total, nlon, nlat = _grid_indices(precision)

    def _idx(coord: float, lo: float, rng: float, nbits: int) -> int:
        return min(int(math.floor((coord - lo) / rng * float(1 << nbits))),
                   (1 << nbits) - 1)

    lat_lo = _idx(bottom, -90.0, 180.0, nlat)
    lat_hi = _idx(top, -90.0, 180.0, nlat)
    if left <= right:
        lon_ranges = [(_idx(left, -180.0, 360.0, nlon),
                       _idx(right, -180.0, 360.0, nlon))]
    else:  # crosses the 180 meridian: two strips
        lon_ranges = [(_idx(left, -180.0, 360.0, nlon), (1 << nlon) - 1),
                      (0, _idx(right, -180.0, 360.0, nlon))]
    n_cells = sum((hi - lo + 1) for lo, hi in lon_ranges) * (lat_hi - lat_lo + 1)
    if n_cells > max_cells:
        return None
    cells: list[str] = []
    for lo, hi in lon_ranges:
        for lon_i in range(lo, hi + 1):
            for lat_i in range(lat_lo, lat_hi + 1):
                cells.append(_geohash_of_indices(lon_i, lat_i, precision))
    return cells


def write_geo_partitioned(
    df: DataFrame,
    path: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    precision: int = 3,
    cell_col: str = "geo_cell",
    mode: str = "overwrite",
) -> None:
    """Persist a table geohash-partitioned so bbox/distance queries get
    directory-level partition pruning — the Spark-native stand-in for
    the reference's per-segment BKD tree (the tree prunes blocks inside
    a segment; this prunes whole files before the scan is scheduled).

    Scale notes: precision 3 is <=32768 cells globally (real data
    occupies far fewer); each cell directory gets files sized by the
    upstream partitioning, so a 100 TB corpus stays at sane file
    counts. Rows with a null coordinate go to the literal cell
    '__none__' so exists-style queries can still find them.
    """
    cell = F.when(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull(),
        geohash(lat_col, lon_col, precision),
    ).otherwise(F.lit("__none__"))
    (df.withColumn(cell_col, cell)
       .write.mode(mode).partitionBy(cell_col).parquet(path))


def geohash_sql(lat: str, lon: str, precision: int = 4) -> str:
    """DuckDB twin of ``geohash`` — same index formula, same interleave."""
    total, nlon, nlat = _grid_indices(precision)
    lon_idx = (
        f"least(floor(({lon} + 180.0) / 360.0 * {float(1 << nlon)!r})::BIGINT,"
        f" {(1 << nlon) - 1})"
    )
    lat_idx = (
        f"least(floor(({lat} + 90.0) / 180.0 * {float(1 << nlat)!r})::BIGINT,"
        f" {(1 << nlat) - 1})"
    )
    bits = []
    for i in range(total):
        src, nbits = (lon_idx, nlon) if i % 2 == 0 else (lat_idx, nlat)
        src_bit = nbits - 1 - i // 2
        out_shift = total - 1 - i
        bits.append(f"(({src} >> {src_bit}) & 1) * {1 << out_shift}")
    combined = "(" + " + ".join(bits) + ")"
    chars = [
        f"substr('{GEOHASH32}',"
        f" ((({combined} >> {total - 5 * (c + 1)}) & 31) + 1)::INT, 1)"
        for c in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"


def geotile(lat_col, lon_col, zoom: int = 7):
    """geotile_grid cell key '<zoom>/<x>/<y>' (Web-Mercator tiles, the
    reference's GeoTileUtils.longEncode arithmetic)."""
    import math

    n = float(1 << zoom)
    lon = F.col(lon_col).cast("double")
    lat = F.col(lat_col).cast("double")
    xf = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long")
    lat_r = F.radians(lat)
    yf = F.floor(
        (F.lit(1.0) - F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r))
         / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)
    ).cast("long")
    clamp = lambda c: F.greatest(F.lit(0).cast("long"),
                                 F.least(c, F.lit((1 << zoom) - 1)))
    return F.concat_ws("/", F.lit(str(zoom)), clamp(xf).cast("string"),
                       clamp(yf).cast("string"))


def geotile_sql(lat: str, lon: str, zoom: int = 7) -> str:
    """DuckDB twin of ``geotile`` (same op order; pi() == math.pi)."""
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    x = f"floor(({lon} + 180.0) / 360.0 * {n!r})::BIGINT"
    y = (
        f"floor((1.0 - ln(tan(radians({lat})) + 1.0 / cos(radians({lat})))"
        f" / pi()) / 2.0 * {n!r})::BIGINT"
    )
    cx = f"greatest(0, least({x}, {hi}))"
    cy = f"greatest(0, least({y}, {hi}))"
    return f"('{zoom}' || '/' || {cx}::VARCHAR || '/' || {cy}::VARCHAR)"


# --- doc-side shape coarse index (BKD-tree analogue) -------------------
#
# The reference indexes geo_shape fields into a BKD tree of triangles
# (server/src/main/java/org/elasticsearch/index/mapper/
# GeoShapeIndexer.java; queried via LatLonShape) so a shape query
# visits only tree blocks whose extents can match.  Spark-first
# analogue: at index time each doc shape gets the geohash cell cover of
# its bounding box as an array<string> column (vectorized Arrow UDF,
# one cover per UNIQUE WKT per batch); at query time the query shape's
# cover — computed driver-side, no data pass — feeds an
# `arrays_overlap` prefilter that runs JVM-side in whole-stage codegen,
# so the exact Python relation check only sees candidate rows.  The
# cover is conservative (grid floors are monotone, identical math to
# `geohash`), so prefilter+verify returns exactly the scan+verify
# answer.

SHAPE_COVER_ANY = "*"  # sentinel: cover larger than max_cells


def wkt_bbox(wkt: str) -> tuple[float, float, float, float]:
    """(minlon, minlat, maxlon, maxlat) of any supported WKT shape."""
    kind, payload = parse_wkt(wkt)
    if kind == "point":
        lon, lat = payload
        return lon, lat, lon, lat
    if kind == "envelope":
        minlon, maxlon, maxlat, minlat = payload
        return minlon, minlat, maxlon, maxlat
    polys = _shape_polys(kind, payload)
    pts = [p for poly in polys for ring in poly for p in ring]
    lons = [p[0] for p in pts]
    lats = [p[1] for p in pts]
    return min(lons), min(lats), max(lons), max(lats)


def shape_cover_cells_py(
    wkt: str, precision: int = 2, max_cells: int = 64,
) -> list[str]:
    """Geohash cover of a WKT shape's bounding box; ``[SHAPE_COVER_ANY]``
    when the cover would exceed ``max_cells`` (a shape that big touches
    most of the grid, so the prefilter degrades to pass-through for it
    rather than shipping a huge cell list)."""
    minlon, minlat, maxlon, maxlat = wkt_bbox(wkt)
    cover = geohash_cover_bbox(
        (maxlat, minlon), (minlat, maxlon), precision, max_cells)
    return [SHAPE_COVER_ANY] if cover is None else cover


def index_doc_shapes(
    df: DataFrame,
    shape_col: str = "shape",
    cells_col: str = "shape_cells",
    precision: int = 2,
    max_cells: int = 64,
) -> DataFrame:
    """Index-time step: add the coarse-cover cells column next to the
    WKT shape field (persist both — the cells column is the BKD
    analogue the query-side prefilter reads)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _cells(shapes: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for s0 in shapes:
            if s0 is None:
                out.append(None)
                continue
            v = cache.get(s0)
            if v is None:
                v = cache[s0] = shape_cover_cells_py(s0, precision, max_cells)
            out.append(v)
        return pd.Series(out)

    return df.withColumn(cells_col, _cells(F.col(shape_col)))


def doc_geo_shape_indexed(
    df: DataFrame,
    wkt: str,
    shape_col: str = "shape",
    cells_col: str = "shape_cells",
    relation: str = "intersects",
    precision: int = 2,
    max_cells: int = 4096,
) -> DataFrame:
    """geo_shape query over an indexed shape field: cover-cell
    prefilter (JVM, codegen) then exact relation verify (Arrow UDF) on
    the candidates only.  For ``disjoint`` the prefilter works in
    reverse: a doc whose cover cannot overlap the query cover is
    disjoint with NO exact check at all."""
    qcells = shape_cover_cells_py(wkt, precision, max_cells)
    has_shape = F.col(shape_col).isNotNull()
    if qcells == [SHAPE_COVER_ANY]:
        cand = has_shape  # query too big for a useful prefilter
    else:
        cand = has_shape & (
            F.arrays_overlap(
                F.col(cells_col), F.array(*[F.lit(c) for c in qcells]))
            | F.array_contains(F.col(cells_col), SHAPE_COVER_ANY))
    if relation == "disjoint":
        sure = df.filter(has_shape & ~cand)
        check = doc_geo_shape(df.filter(cand), wkt,
                              shape_col=shape_col, relation="disjoint")
        return sure.unionByName(check)
    return doc_geo_shape(df.filter(cand), wkt,
                         shape_col=shape_col, relation=relation)
