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


def tile_pyramid(df: DataFrame, lon_col: str, lat_col: str,
                 base_zoom: int, min_zoom: int = 0) -> DataFrame:
    """Raster z-pyramid rollup: per-tile point counts at ``base_zoom``,
    then every coarser level down to ``min_zoom`` -- one output row per
    (tile_z, tile_x, tile_y) with ``n_points``.

    Scale shape: the raw points are scanned and shuffled ONCE (the
    base-zoom aggregate); each coarser level aggregates the LEVEL BELOW
    (4 children per parent via ``tx >> 1, ty >> 1``), so levels cost
    #tiles -- not #points -- per step. The naive form (re-assign + re-agg
    the corpus per zoom) scans 100 TB once per level.

    Exactness of the hierarchical rollup: tile indices are
    floor(v * 2^z) with clamping; scaling by a power of two only shifts
    the float exponent (no rounding), so floor(v * 2^(z-1)) ==
    floor(v * 2^z) >> 1 identically, and the clamped edges map
    (n-1) >> 1 == parent n/2 - 1. The DuckDB oracle computes every level
    DIRECTLY from the raw points -- different plan, identical integers."""
    base = (
        tile_assign(df, lon_col, lat_col, base_zoom)
        .groupBy("tile_z", "tile_x", "tile_y")
        .agg(F.count("*").alias("n_points"))
    )
    cols = ["tile_z", "tile_x", "tile_y", "n_points"]
    levels = [base.select(*cols)]
    cur = base
    for z in range(base_zoom - 1, min_zoom - 1, -1):
        cur = (
            cur.groupBy(
                F.shiftright(F.col("tile_x"), 1).alias("tile_x"),
                F.shiftright(F.col("tile_y"), 1).alias("tile_y"))
            .agg(F.sum("n_points").alias("n_points"))
            .withColumn("tile_z", F.lit(z).cast("int"))
        )
        levels.append(cur.select(*cols))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
