"""SQL surface: register the engine's kernels as named Spark SQL functions.

A user of the reference works at the SQL/field boundary (geometry columns in
queries); this module exposes the engine the same way -- after
``register_sql_functions(spark)`` every codec and measure kernel is callable
from ``spark.sql``:

    SELECT st_area(st_geomfromewkb(hex)) FROM pages_geo
    SELECT st_astext(g), st_srid(g), st_isvalid(g) FROM shapes
    SELECT st_cell(lon, lat, 10) AS cell ... GROUP BY cell

Naming follows PostGIS where an equivalent exists. Registration is explicit
(no import side effects); everything stays the same vectorized Arrow kernels
-- ``spark.sql`` and the DataFrame API compile to identical plans.

st_cell is registered at fixed common levels via closures (SQL UDFs cannot
take a literal-only arg); DataFrame users should prefer cells.with_cell
(pure JVM, no Python crossing).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_sql_functions(spark: SparkSession,
                           cell_levels: tuple = (8, 10, 12)) -> list[str]:
    """Register the engine surface for spark.sql use; returns the names."""
    from .ewkb import ewkb_decode, ewkb_encode
    from .geojson import from_geojson, to_geojson
    from .kernels import (st_area_udf, st_centroid_udf, st_clip_bbox_udf,
                          st_convexhull_udf, st_distance_udf, st_isvalid_udf,
                          st_length_udf, st_simplify_udf)
    from .wkt import wkt_decode, wkt_encode
    from .cells import make_cell_of

    names = []

    def reg(name, fn):
        spark.udf.register(name, fn)
        names.append(name)

    # codecs (PostGIS naming)
    reg("st_geomfromewkb", ewkb_decode)
    reg("st_asewkb", ewkb_encode)
    reg("st_geomfromtext", wkt_decode)
    reg("st_astext", wkt_encode)
    reg("st_geomfromgeojson", from_geojson)
    reg("st_asgeojson", to_geojson)
    # measures / predicates / transforms
    reg("st_area", st_area_udf())
    reg("st_length", st_length_udf())
    reg("st_centroid", st_centroid_udf())
    reg("st_isvalid", st_isvalid_udf())
    reg("st_convexhull", st_convexhull_udf())
    reg("st_distance", st_distance_udf())
    # fixed-parameter kernels (SQL UDFs take columns only)
    reg("st_simplify_01", st_simplify_udf(0.1))
    reg("st_clip_unit", st_clip_bbox_udf(0.0, 0.0, 1.0, 1.0))
    for lvl in cell_levels:
        reg(f"st_cell_{lvl}", make_cell_of(lvl))
    return names
