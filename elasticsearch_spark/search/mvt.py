"""_search_mvt — vector-tile search (reference:
x-pack/plugin/vector-tile/src/main/java/org/elasticsearch/xpack/
vectortile/rest/RestVectorTileAction.java): given a tile z/x/y, return
a Mapbox Vector Tile with an "aggs" layer = the geotile_grid cells
(zoom z + grid_precision) that fall inside the tile, each cell a
square feature carrying its doc count.

Spark shape: the gridding is pure Catalyst arithmetic (WebMercator
projection → fine-tile index → in-tile cell coordinates) feeding ONE
hash aggregation keyed by (cell_x, cell_y) — bounded at 4^grid_precision
cells regardless of doc count, so collecting the aggregated cells to
encode the tile is a constant-size driver step, never a doc collect.
The MVT encoding itself (protobuf varints, zigzag command integers) is
a driver-side pure function over those ≤65k cells.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

MERCATOR_LAT_MAX = 85.05112878


def mvt_grid(
    df: DataFrame,
    z: int,
    x: int,
    y: int,
    grid_precision: int = 8,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """The aggs layer's cells: geotile cells at zoom ``z +
    grid_precision`` clipped to tile (z, x, y), as rows
    (cell_x, cell_y, count) with cell coords in [0, 2**grid_precision).
    """
    n_fine = 1 << (z + grid_precision)
    lat = F.greatest(
        F.least(F.col(lat_col).cast("double"), F.lit(MERCATOR_LAT_MAX)),
        F.lit(-MERCATOR_LAT_MAX),
    )
    rad = F.radians(lat)
    wx = (F.col(lon_col).cast("double") + 180.0) / 360.0
    wy = (
        F.lit(1.0)
        - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(math.pi)
    ) / 2.0
    fx = F.floor(wx * n_fine).cast("long")
    fy = F.floor(wy * n_fine).cast("long")
    # a point exactly on the antimeridian / pole edge belongs to the
    # last tile, same clamp as the reference's GeoTileUtils.longEncode
    fx = F.least(fx, F.lit(n_fine - 1))
    fy = F.least(fy, F.lit(n_fine - 1))
    gp = grid_precision
    return (
        df.select(fx.alias("_fx"), fy.alias("_fy"))
        .filter(
            (F.shiftright("_fx", gp) == x) & (F.shiftright("_fy", gp) == y)
        )
        .groupBy(
            (F.col("_fx") - F.lit(x << gp)).alias("cell_x"),
            (F.col("_fy") - F.lit(y << gp)).alias("cell_y"),
        )
        .agg(F.count("*").alias("count"))
    )


# --- Mapbox Vector Tile encoding (spec 2.1, driver-side) --------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def encode_mvt(
    cells: list[tuple[int, int, int]],
    grid_precision: int = 8,
    extent: int = 4096,
    layer_name: str = "aggs",
) -> bytes:
    """Encode (cell_x, cell_y, count) rows as one MVT layer of square
    polygon features, each with a "count" attribute — the wire format
    RestVectorTileAction streams. Pure function, no Spark."""
    side = extent >> grid_precision  # pixels per cell
    values = sorted({c for _, _, c in cells})
    vindex = {c: i for i, c in enumerate(values)}

    feats = b""
    for cx, cy, cnt in sorted(cells):
        px, py = cx * side, cy * side
        # MoveTo(1,cmd) + LineTo(3) + ClosePath(7); deltas zigzagged
        geom = [
            (1 << 3) | 1, _zigzag(px), _zigzag(py),
            (3 << 3) | 2,
            _zigzag(side), _zigzag(0),
            _zigzag(0), _zigzag(side),
            _zigzag(-side), _zigzag(0),
            (1 << 3) | 7,
        ]
        body = (
            _len_field(2, _varint(0) + _varint(vindex[cnt]))  # tags
            + _key(3, 0) + _varint(3)                         # POLYGON
            + _len_field(4, b"".join(_varint(g) for g in geom))
        )
        feats += _len_field(2, body)

    keys = _len_field(3, b"count")
    vals = b"".join(
        _len_field(4, _key(5, 0) + _varint(c)) for c in values  # uint
    )
    layer = (
        _key(15, 0) + _varint(2)                 # version
        + _len_field(1, layer_name.encode())
        + feats + keys + vals
        + _key(5, 0) + _varint(extent)
    )
    return _len_field(3, layer)


def search_mvt(
    df: DataFrame,
    z: int,
    x: int,
    y: int,
    grid_precision: int = 8,
    extent: int = 4096,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> bytes:
    """The full _search_mvt aggs layer: grid on the executors, encode
    the bounded cell set on the driver."""
    rows = mvt_grid(df, z, x, y, grid_precision, lat_col, lon_col).collect()
    cells = [(r["cell_x"], r["cell_y"], r["count"]) for r in rows]
    return encode_mvt(cells, grid_precision, extent)
