"""geo_distance query + geo-distance sort.

Reference: index/query/GeoDistanceQueryBuilder.java (arc distance via
Lucene's haversin) and sort/GeoDistanceSortBuilder.java. This covers
the distance slice of the geo surface — shapes/polygons (geo_shape,
BKD-backed) stay out of scope.

The haversine great-circle distance is written as ONE fixed sequence of
double ops so the DuckDB oracle can reproduce it bit-for-bit-ish
(matching op order; trig libm differences are sub-ulp and the contract
rounds to 4 decimals):

    d = 2 R asin(sqrt(sin^2(dlat/2) + cos(lat1) cos(lat2) sin^2(dlon/2)))
"""

from __future__ import annotations

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
