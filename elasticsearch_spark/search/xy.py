"""Cartesian ``point`` / ``shape`` field types and the ``shape`` query
(x-pack spatial plugin).

Reference behavior:
  x-pack/plugin/spatial/src/main/java/org/elasticsearch/xpack/spatial/
    index/query/ShapeQueryBuilder.java        (relations, field dispatch)
    index/query/ShapeQueryPointProcessor.java (point-field path)
    index/mapper/PointFieldMapper.java        (cartesian point type)
    index/mapper/ShapeFieldMapper.java        (cartesian shape type)

The cartesian types share the geo types' query surface but use planar
(x, y) float math with NO antimeridian wrap and NO latitude clamping.
The even-odd parity kernel in ``search/geo.py`` is already planar, so
the point-field predicate delegates to it with (y, x) standing in for
(lat, lon); the single divergence is ENVELOPE: a cartesian envelope
requires minX <= maxX (the geo variant reads minlon > maxlon as a
dateline-crossing box, which has no cartesian meaning — reference
rejects it in ShapeQueryBuilder via the standard XYEnvelope parse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elasticsearch_spark.search.geo import (
    doc_geo_shape,
    geo_shape_predicate,
    geo_shape_sql,
    parse_wkt,
)


def _check_cartesian(wkt: str) -> None:
    kind, payload = parse_wkt(wkt)
    if kind == "envelope":
        minx, maxx, _maxy, _miny = payload
        if minx > maxx:
            raise ValueError(
                "cartesian ENVELOPE requires minX <= maxX (no antimeridian "
                f"wrap in planar space): {wkt!r}"
            )


def xy_shape_predicate(wkt: str, x_col: str = "x", y_col: str = "y") -> Column:
    """intersects-predicate of a constant WKT query shape against a
    cartesian ``point`` field — a static whole-stage-codegen expression
    (no UDF), same parity kernel as the geo path."""
    _check_cartesian(wkt)
    return geo_shape_predicate(wkt, lat_col=y_col, lon_col=x_col)


def xy_shape(
    df: DataFrame,
    wkt: str,
    relation: str = "intersects",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """``shape`` query over a cartesian point field
    (ShapeQueryPointProcessor.java): for point docs ``within`` equals
    ``intersects``; ``disjoint`` is the complement over non-null
    coordinates; ``contains`` only holds when the query shape is a
    POINT equal to the doc point (a point cannot contain area)."""
    _check_cartesian(wkt)
    not_null = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    if relation == "contains":
        kind, payload = parse_wkt(wkt)
        if kind != "point":
            return df.filter(F.lit(False))
        qx, qy = payload
        return df.filter(
            not_null
            & (F.col(x_col).cast("double") == F.lit(float(qx)))
            & (F.col(y_col).cast("double") == F.lit(float(qy)))
        )
    pred = geo_shape_predicate(wkt, lat_col=y_col, lon_col=x_col)
    if relation in ("intersects", "within"):
        return df.filter(not_null & pred)
    if relation == "disjoint":
        return df.filter(not_null & ~pred)
    raise ValueError(f"unsupported shape relation {relation!r}")


def xy_shape_sql(
    wkt: str, x: str = "x", y: str = "y", relation: str = "intersects"
) -> str:
    """DuckDB twin of ``xy_shape``'s predicate, generated from the same
    vertex walk (geo_shape_sql with y/x bound to lat/lon)."""
    _check_cartesian(wkt)
    if relation == "contains":
        kind, payload = parse_wkt(wkt)
        if kind != "point":
            return "FALSE"
        qx, qy = payload
        return (
            f"({x} IS NOT NULL AND {y} IS NOT NULL AND "
            f"{x} = {float(qx)!r} AND {y} = {float(qy)!r})"
        )
    return geo_shape_sql(wkt, lat=y, lon=x, relation=relation)


def doc_xy_shape(
    df: DataFrame,
    wkt: str,
    shape_col: str = "shape",
    relation: str = "intersects",
) -> DataFrame:
    """``shape`` query against a cartesian shape FIELD (WKT column),
    all four ShapeRelation values (ShapeFieldMapper.java +
    ShapeQueryBuilder.java). The relation kernel is planar already, so
    this shares the geo doc-shape evaluator (one Arrow-batched pandas
    UDF, relation computed once per unique WKT per batch)."""
    _check_cartesian(wkt)
    return doc_geo_shape(df, wkt, shape_col=shape_col, relation=relation)
