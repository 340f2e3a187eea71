"""Web-Mercator (slippy-map) raster tiling -- pure column math, zero UDF.

tile_assign is the engine's raster-tile <-> vector assignment primitive
(net-new vs the reference, mandated by BASELINE.json north_star). It is
deliberately expressed as built-in column functions so it stays inside
whole-stage codegen; the identical closed-form formula is the DuckDB oracle
in __spark_entry__.py.

Formulas (OSM slippy map):
    n      = 2^z
    tile_x = floor((lon + 180) / 360 * n)
    tile_y = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * n)
with lat clamped to the Web-Mercator domain +-85.05112878 and indices clamped
to [0, n-1] (lon = +180 maps to the last column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERCATOR_MAX_LAT = 85.05112878


def tile_x(lon: Column, zoom: int) -> Column:
    n = F.lit(float(2 ** zoom))
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(2 ** zoom - 1)).cast("long")


def tile_y(lat: Column, zoom: int) -> Column:
    n = F.lit(float(2 ** zoom))
    lat_c = F.least(F.greatest(lat, F.lit(-MERCATOR_MAX_LAT)), F.lit(MERCATOR_MAX_LAT))
    lat_rad = F.radians(lat_c)
    # asinh(tan(x)) = ln(tan(x) + 1/cos(x)) -- sec form keeps DuckDB parity
    merc = F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad))
    raw = F.floor((F.lit(1.0) - merc / F.lit(3.141592653589793)) / F.lit(2.0) * n)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(2 ** zoom - 1)).cast("long")


def tile_assign(df: DataFrame, lon_col: str, lat_col: str, zoom: int,
                out_prefix: str = "tile") -> DataFrame:
    lon, lat = F.col(lon_col), F.col(lat_col)
    return (
        df.withColumn(f"{out_prefix}_z", F.lit(zoom).cast("int"))
        .withColumn(f"{out_prefix}_x", tile_x(lon, zoom))
        .withColumn(f"{out_prefix}_y", tile_y(lat, zoom))
    )


def tile_id(zoom: int, tx: Column, ty: Column) -> Column:
    """Single-long tile key (z in high bits) for groupBy/partitioning."""
    return (F.lit(zoom).cast("long") * F.lit(2 ** 58)) + tx * F.lit(float(2 ** 29)).cast("long") + ty


def tile_assign_oracle_sql(lon_expr: str, lat_expr: str, zoom: int) -> tuple[str, str]:
    """The same closed-form formulas as ANSI SQL (DuckDB oracle)."""
    n = float(2 ** zoom)
    mx = 2 ** zoom - 1
    tx = (f"CAST(LEAST(GREATEST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}), 0), {mx}) AS BIGINT)")
    lat_c = f"LEAST(GREATEST({lat_expr}, -85.05112878), 85.05112878)"
    merc = f"LN(TAN(RADIANS({lat_c})) + 1.0 / COS(RADIANS({lat_c})))"
    ty = (f"CAST(LEAST(GREATEST(FLOOR((1.0 - {merc} / PI()) / 2.0 * {n}), 0), {mx}) AS BIGINT)")
    return tx, ty


def tile_cover(df: DataFrame, geom_col: str, zoom: int,
               out_prefix: str = "tile") -> DataFrame:
    """Vector -> raster-tile assignment: one output row per z/x/y tile whose
    extent intersects the geometry's bbox at ``zoom``.

    The other direction of tile_assign (point -> its tile). Pure column
    math: bbox corners -> tile index ranges -> sequence() cross-explode,
    all JVM-side. Tile y grows southward, so the min tile row comes from the
    bbox's MAX latitude. Exact (non-bbox) coverage, when needed, is this
    followed by a PIP refine of tile centers/corners against the geometry --
    same pattern as the spatial join's cover-then-refine."""
    from .kernels import geom_bbox_cols

    minx, miny, maxx, maxy = geom_bbox_cols(F.col(geom_col))
    txa, txb = tile_x(minx, zoom), tile_x(maxx, zoom)
    tya, tyb = tile_y(maxy, zoom), tile_y(miny, zoom)
    return (
        df.withColumn(f"{out_prefix}_z", F.lit(zoom).cast("int"))
        .withColumn(f"{out_prefix}_x",
                    F.explode(F.sequence(txa, txb)))
        .withColumn(f"{out_prefix}_y",
                    F.explode(F.sequence(tya, tyb)))
    )
