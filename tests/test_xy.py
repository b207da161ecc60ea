"""Cartesian shape/point query surface (x-pack spatial plugin):
planar parity vs a pure-Python oracle, envelope wrap rejection,
all four relations on shape fields."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.search.xy import (
    doc_xy_shape,
    xy_shape,
    xy_shape_sql,
)


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, float((i * 37) % 200 - 100), float((i * 91) % 200 - 100))
            for i in range(400)]
    return spark.createDataFrame(rows, "id long, x double, y double").cache()


TRI = "POLYGON ((-50 -50, 60 -40, 0 70, -50 -50))"
HOLED = ("POLYGON ((-80 -80, 80 -80, 80 80, -80 80, -80 -80), "
         "(-20 -20, 20 -20, 20 20, -20 20, -20 -20))")


def _inside_tri(x: float, y: float) -> bool:
    pts = [(-50.0, -50.0), (60.0, -40.0), (0.0, 70.0)]
    c = 0
    for i in range(3):
        xi, yi = pts[i]
        xj, yj = pts[(i + 1) % 3]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            c += 1
    return c % 2 == 1


def test_xy_polygon_intersects_matches_raycast_oracle(points):
    got = {r["id"] for r in xy_shape(points, TRI).collect()}
    want = {r["id"] for r in points.collect()
            if _inside_tri(r["x"], r["y"])}
    assert got == want and got


def test_xy_disjoint_is_complement(points):
    hit = {r["id"] for r in xy_shape(points, TRI, "intersects").collect()}
    miss = {r["id"] for r in xy_shape(points, TRI, "disjoint").collect()}
    assert hit | miss == {r["id"] for r in points.collect()}
    assert not hit & miss


def test_xy_envelope_no_wrap(points):
    # ENVELOPE(minX, maxX, maxY, minY)
    got = {r["id"] for r in
           xy_shape(points, "ENVELOPE (-30, 40, 50, -10)").collect()}
    want = {r["id"] for r in points.collect()
            if -30 <= r["x"] <= 40 and -10 <= r["y"] <= 50}
    assert got == want and got
    with pytest.raises(ValueError, match="minX <= maxX"):
        xy_shape(points, "ENVELOPE (40, -30, 50, -10)")


def test_xy_hole_excluded(points):
    got = {r["id"] for r in xy_shape(points, HOLED).collect()}
    for r in points.collect():
        x, y = r["x"], r["y"]
        inside = (-80 < x < 80 and -80 < y < 80) and not (
            -20 < x < 20 and -20 < y < 20)
        if abs(abs(x) - 80) > 1e-9 and abs(abs(y) - 80) > 1e-9 \
                and abs(abs(x) - 20) > 1e-9 and abs(abs(y) - 20) > 1e-9:
            assert (r["id"] in got) == inside


def test_xy_contains_point_only(points):
    row = points.limit(1).collect()[0]
    pt = f"POINT ({row['x']} {row['y']})"
    got = {r["id"] for r in xy_shape(points, pt, "contains").collect()}
    assert row["id"] in got
    # area shapes can never be contained by a point doc
    assert xy_shape(points, TRI, "contains").count() == 0


def test_xy_sql_twin_agrees(points, spark):
    import duckdb

    pdf = points.toPandas()
    duck = duckdb.connect()
    duck.register("pts", pdf)
    for rel in ("intersects", "disjoint"):
        pred = xy_shape_sql(HOLED, x="x", y="y", relation=rel)
        want = {r[0] for r in duck.execute(
            f"SELECT id FROM pts WHERE {pred}").fetchall()}
        got = {r["id"] for r in xy_shape(points, HOLED, rel).collect()}
        assert got == want


def test_doc_xy_shape_relations(spark):
    docs = spark.createDataFrame(
        [
            (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),     # inside q
            (2, "POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5))"),   # crosses q edge? no: inside too
            (3, "POLYGON ((100 100, 120 100, 110 120, 100 100))"),  # far away
            (4, "POINT (3 3)"),
            (5, None),
        ],
        "doc_id long, shape string",
    )
    q = "POLYGON ((-20 -20, 40 -20, 40 40, -20 40, -20 -20))"
    inter = {r["doc_id"] for r in doc_xy_shape(docs, q, "shape").collect()}
    assert inter == {1, 2, 4}
    within = {r["doc_id"] for r in
              doc_xy_shape(docs, q, "shape", "within").collect()}
    assert within == {1, 2, 4}
    disj = {r["doc_id"] for r in
            doc_xy_shape(docs, q, "shape", "disjoint").collect()}
    assert disj == {3}
    # contains: doc polygon containing the (smaller) query polygon
    q_small = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    cont = {r["doc_id"] for r in
            doc_xy_shape(docs, q_small, "shape", "contains").collect()}
    assert cont == {1, 2}
