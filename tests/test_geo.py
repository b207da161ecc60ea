"""geo_point surface: bbox (incl. date line), polygon ray-cast,
geohash/geotile cell encodings (vs known reference values)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.search.geo import (
    geo_bounding_box,
    geo_polygon,
    geohash,
    geotile,
    haversine_km,
)


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, float((i * 37) % 171 - 85), float((i * 91) % 360 - 180))
            for i in range(400)]
    return spark.createDataFrame(rows, "id long, lat double, lon double").cache()


def test_bbox_plain(points):
    got = {r["id"] for r in geo_bounding_box(
        points, top_left=(50.0, -30.0), bottom_right=(-10.0, 60.0)
    ).collect()}
    want = {r["id"] for r in points.collect()
            if -10.0 <= r["lat"] <= 50.0 and -30.0 <= r["lon"] <= 60.0}
    assert got == want and got


def test_bbox_crosses_dateline(points):
    """left lon > right lon selects the UNION of the two strips around
    the antimeridian (GeoBoundingBoxQueryBuilder date-line handling)."""
    got = {r["id"] for r in geo_bounding_box(
        points, top_left=(80.0, 160.0), bottom_right=(-80.0, -160.0)
    ).collect()}
    want = {r["id"] for r in points.collect()
            if -80.0 <= r["lat"] <= 80.0
            and (r["lon"] >= 160.0 or r["lon"] <= -160.0)}
    assert got == want and got


def _pip(lat, lon, poly):
    """Plain-Python even-odd ray cast (independent re-implementation)."""
    inside = False
    n = len(poly)
    for i in range(n):
        yi, xi = poly[i]
        yj, xj = poly[(i + 1) % n]
        if (yi > lat) != (yj > lat):
            if lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
                inside = not inside
    return inside


def test_polygon_matches_reference_raycast(points):
    poly = [(10.0, -50.0), (60.0, 0.0), (20.0, 70.0), (-40.0, 30.0),
            (-20.0, -60.0)]
    got = {r["id"] for r in geo_polygon(points, poly).collect()}
    want = {r["id"] for r in points.collect()
            if _pip(r["lat"], r["lon"], poly)}
    assert got == want and got


def test_polygon_concave(points):
    # concave "arrow" — exercises multiple crossings per ray
    poly = [(0.0, -60.0), (50.0, 0.0), (0.0, 60.0), (20.0, 0.0)]
    got = {r["id"] for r in geo_polygon(points, poly).collect()}
    want = {r["id"] for r in points.collect()
            if _pip(r["lat"], r["lon"], poly)}
    assert got == want


def test_geohash_known_values(spark):
    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-25.382708, -49.265506), (0.0, 0.0)],
        "lat double, lon double",
    )
    out = [r["gh"] for r in df.select(
        geohash("lat", "lon", 6).alias("gh")).collect()]
    assert out == ["u4pruy", "6gkzwg", "s00000"]
    out5 = [r["gh"] for r in df.select(
        geohash("lat", "lon", 5).alias("gh")).collect()]
    assert out5 == ["u4pru", "6gkzw", "s0000"]


def test_geotile_known_values(spark):
    df = spark.createDataFrame(
        [(51.5, 0.0), (0.0, 0.0), (40.7, -74.0)],
        "lat double, lon double",
    )
    out = [r["t"] for r in df.select(
        geotile("lat", "lon", 7).alias("t")).collect()]
    # verified against the slippy-map tile formula
    assert out == ["7/64/42", "7/64/64", "7/37/48"]


def test_geo_exprs_are_codegen_no_udf(points):
    """The whole geo slice must stay JVM-side (no BatchEvalPython)."""
    import io, contextlib

    poly = [(10.0, -50.0), (60.0, 0.0), (20.0, 70.0), (-40.0, 30.0)]
    df = geo_polygon(points, poly).select(
        geohash("lat", "lon", 4).alias("gh"),
        geotile("lat", "lon", 5).alias("gt"),
        haversine_km(F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0)),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_geo_distance_agg_rings(spark):
    from elasticsearch_spark.aggs.analytics import geo_distance_agg

    # origin-centric rings over 3 fixed points: 0 km, ~1113 km, ~5004 km
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 0.0), (3, 45.0, 0.0)],
        "id long, lat double, lon double")
    out = geo_distance_agg(df, "lat", "lon", origin=(0.0, 0.0),
                           ranges=[(None, 500.0), (500.0, 2000.0),
                                   (2000.0, None)])
    got = {r["key"]: r["doc_count"] for r in out.collect()}
    assert got == {"*-500": 1, "500-2000": 1, "2000-*": 1}


def test_parse_wkt():
    from elasticsearch_spark.search.geo import parse_wkt

    assert parse_wkt("POINT (30 10)") == ("point", (30.0, 10.0))
    k, rings = parse_wkt(
        "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10), (20 30, 35 35, 30 20, 20 30))")
    assert k == "polygon" and len(rings) == 2 and len(rings[0]) == 5
    k, env = parse_wkt("ENVELOPE (10, 40, 45, -10)")
    assert k == "envelope" and env == (10.0, 40.0, 45.0, -10.0)
    k, polys = parse_wkt(
        "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
        "((15 5, 40 10, 10 20, 5 10, 15 5)))")
    assert k == "multipolygon" and len(polys) == 2
    import pytest

    with pytest.raises(ValueError):
        parse_wkt("LINESTRING (30 10, 10 30)")


def test_geo_shape_relations(spark):
    from elasticsearch_spark.search.geo import geo_shape, geo_shape_sql

    pts = [
        (1, 25.0, 25.0),    # inside outer ring (clear of hole)
        (2, 30.0, 30.0),    # inside the hole -> not intersecting
        (3, 0.0, 120.0),    # far outside
        (4, None, None),    # missing field: matches NO relation
    ]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    wkt = ("POLYGON ((10 10, 50 10, 50 50, 10 50, 10 10), "
           "(27 27, 33 27, 33 33, 27 33, 27 27))")
    inter = sorted(r["doc_id"] for r in geo_shape(df, wkt).collect())
    disj = sorted(r["doc_id"]
                  for r in geo_shape(df, wkt, "disjoint").collect())
    assert inter == [1]
    assert disj == [2, 3]
    # within == intersects for point fields
    assert sorted(r["doc_id"] for r in
                  geo_shape(df, wkt, "within").collect()) == [1]
    # DuckDB twin agrees row-for-row
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", pts)
    got = [r[0] for r in con.execute(
        "SELECT doc_id FROM t WHERE "
        + geo_shape_sql(wkt, "lat", "lon") + " ORDER BY doc_id").fetchall()]
    assert got == inter
    # envelope across the dateline
    env = "ENVELOPE (150, -120, 60, -20)"
    df2 = spark.createDataFrame(
        [(1, 0.0, 170.0), (2, 0.0, -150.0), (3, 0.0, 0.0)],
        "doc_id long, lat double, lon double")
    assert sorted(r["doc_id"] for r in geo_shape(df2, env).collect()) == [1, 2]


def test_geo_shape_multipolygon(spark):
    from elasticsearch_spark.search.geo import geo_shape

    wkt = ("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
           "((20 20, 30 20, 30 30, 20 30, 20 20)))")
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 25.0, 25.0), (3, 15.0, 15.0)],
        "doc_id long, lat double, lon double")
    assert sorted(r["doc_id"] for r in geo_shape(df, wkt).collect()) == [1, 2]


def test_shapes_relation_kernel():
    from elasticsearch_spark.search.geo import shapes_relation as rel

    Q = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert rel(Q, "POINT (5 5)", "intersects")
    assert not rel(Q, "POINT (15 5)", "intersects")
    assert rel(Q, "ENVELOPE (2, 4, 4, 2)", "within")
    assert rel(Q, "ENVELOPE (8, 12, 4, 2)", "intersects")
    assert not rel(Q, "ENVELOPE (8, 12, 4, 2)", "within")
    assert rel(Q, "ENVELOPE (20, 30, 5, 1)", "disjoint")
    assert rel(Q, "ENVELOPE (-5, 15, 15, -5)", "contains")
    # doc fully inside a query HOLE is disjoint; beside the hole, within
    QH = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
          "(3 3, 7 3, 7 7, 3 7, 3 3))")
    assert rel(QH, "ENVELOPE (4, 6, 6, 4)", "disjoint")
    assert rel(QH, "ENVELOPE (1, 2, 2, 1)", "within")
    # multipolygon doc with one part inside: intersects but not within
    MD = ("MULTIPOLYGON (((1 1, 2 1, 2 2, 1 2, 1 1)), "
          "((20 20, 21 20, 21 21, 20 21, 20 20)))")
    assert rel(Q, MD, "intersects")
    assert not rel(Q, MD, "within")


def test_doc_geo_shape(spark):
    from pyspark.sql import functions as F

    from elasticsearch_spark.search.geo import doc_geo_shape

    rows = [(1, "ENVELOPE (2, 4, 4, 2)"),        # inside
            (2, "ENVELOPE (8, 12, 4, 2)"),       # straddles
            (3, "ENVELOPE (20, 30, 5, 1)"),      # outside
            (4, None)]                            # missing field
    df = spark.createDataFrame(rows, "doc_id long, shape string")
    q = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    got = lambda r: sorted(
        x["doc_id"] for x in doc_geo_shape(df, q, relation=r).collect())
    assert got("intersects") == [1, 2]
    assert got("within") == [1]
    assert got("disjoint") == [3]  # null-shape docs never match


def test_geohash_cover_contains_every_point_cell(points):
    """Every point inside the bbox lands in a covered cell (the cover
    formula is bit-identical to the Catalyst encoder), and filtering
    with cell_col gives exactly the plain-bbox result."""
    from elasticsearch_spark.search.geo import geohash_cover_bbox

    tl, br = (50.0, -30.0), (-10.0, 60.0)
    cover = set(geohash_cover_bbox(tl, br, precision=2))
    cells = points.withColumn("cell", geohash("lat", "lon", 2))
    inside = cells.filter(
        (F.col("lat") <= 50.0) & (F.col("lat") >= -10.0)
        & (F.col("lon") >= -30.0) & (F.col("lon") <= 60.0))
    assert {r["cell"] for r in inside.collect()} <= cover
    got = {r["id"] for r in geo_bounding_box(
        cells, tl, br, cell_col="cell", precision=2).collect()}
    want = {r["id"] for r in geo_bounding_box(cells, tl, br).collect()}
    assert got == want and got


def test_geohash_cover_dateline_and_cap():
    from elasticsearch_spark.search.geo import geohash_cover_bbox

    cover = geohash_cover_bbox((80.0, 160.0), (-80.0, -160.0), precision=1)
    # two hemispheric strips, no wraparound duplicates
    assert len(cover) == len(set(cover))
    assert all(len(c) == 1 for c in cover)
    # a cover bigger than max_cells signals "don't bother"
    assert geohash_cover_bbox((85.0, -179.0), (-85.0, 179.0),
                              precision=4, max_cells=10) is None


def test_write_geo_partitioned_prunes(points, tmp_path):
    """The geohash-partitioned layout turns a bbox into directory-level
    PartitionFilters: the pruned scan reads strictly fewer files and
    returns exactly the plain-filter result (incl. null-coord rows
    routed to the __none__ cell)."""
    from elasticsearch_spark.search.geo import write_geo_partitioned

    with_null = points.union(
        points.sparkSession.createDataFrame(
            [(9999, None, None)], "id long, lat double, lon double"))
    path = str(tmp_path / "geo_part")
    write_geo_partitioned(with_null, path, precision=2)
    back = points.sparkSession.read.parquet(path)
    assert back.count() == 401
    tl, br = (50.0, -30.0), (-10.0, 60.0)
    pruned = geo_bounding_box(back, tl, br, cell_col="geo_cell", precision=2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "geo_cell" in plan.split(
        "PartitionFilters:")[1].split("]")[0]
    got = {r["id"] for r in pruned.collect()}
    want = {r["id"] for r in geo_bounding_box(back, tl, br).collect()}
    assert got == want and got
    # the IN-list excludes real on-disk directories (incl. __none__)
    import os

    from elasticsearch_spark.search.geo import geohash_cover_bbox
    on_disk = {d.split("=", 1)[1] for d in os.listdir(path)
               if d.startswith("geo_cell=")}
    cover = set(geohash_cover_bbox(tl, br, precision=2))
    assert "__none__" in on_disk and on_disk - cover


def test_doc_geo_shape_indexed_matches_scan(spark):
    """Cover-cell prefilter + verify == plain scan+verify on all four
    relations (BKD analogue, GeoShapeIndexer.java)."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.search.geo import (
        doc_geo_shape, doc_geo_shape_indexed, index_doc_shapes,
        shape_cover_cells_py, SHAPE_COVER_ANY)

    rows = [
        (1, "ENVELOPE (-10, 10, 10, -10)"),
        (2, "ENVELOPE (100, 120, 50, 30)"),
        (3, "POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5))"),
        (4, "POINT (0 0)"),
        (5, "ENVELOPE (-179, 179, 89, -89)"),   # huge -> '*' sentinel
        (6, None),
        (7, "MULTIPOLYGON (((30 30, 40 30, 40 40, 30 40, 30 30)))"),
    ]
    df = index_doc_shapes(
        spark.createDataFrame(rows, "doc_id int, shape string"),
        precision=2, max_cells=32).cache()

    assert shape_cover_cells_py(rows[4][1], 2, 32) == [SHAPE_COVER_ANY]

    query = "ENVELOPE (-8, 8, 8, -8)"
    for rel in ("intersects", "within", "contains", "disjoint"):
        exact = {r["doc_id"] for r in doc_geo_shape(
            df, query, relation=rel).select("doc_id").collect()}
        fast = {r["doc_id"] for r in doc_geo_shape_indexed(
            df, query, relation=rel, precision=2, max_cells=32)
            .select("doc_id").collect()}
        assert fast == exact, rel

    # the prefilter actually prunes: doc 2 (far east) is not a
    # candidate for the western query window
    qcells = shape_cover_cells_py(query, 2, 4096)
    cand = df.filter(F.arrays_overlap(
        "shape_cells", F.array(*[F.lit(c) for c in qcells]))
        | F.array_contains("shape_cells", SHAPE_COVER_ANY))
    ids = {r["doc_id"] for r in cand.select("doc_id").collect()}
    assert 2 not in ids and 1 in ids and 5 in ids
