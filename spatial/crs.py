"""SRID reprojection: EPSG:4326 (lon/lat) <-> EPSG:3857 (Web-Mercator).

The reference carries SRID per geometry (`SRID = Maybe Int`,
/root/reference/src/Database/Postgis/Geometry.hs:19) but never transforms
between systems; a tiling engine needs at least the 4326<->3857 pair (the
tile pyramid lives in 3857). Spherical-Mercator closed forms as pure column
expressions -- whole-stage codegen, zero UDF:

    x = R * radians(lon)
    y = R * ln(tan(pi/4 + radians(lat)/2))
    lon = degrees(x / R)
    lat = degrees(2 * atan(exp(y / R)) - pi/2)

with R = 6378137 (WGS84 semi-major axis; EPSG:3857 is spherical by
definition) and lat clamped to the Mercator domain +-85.05112878.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

R_3857 = 6378137.0
PI = 3.141592653589793
MERC_MAX_LAT = 85.05112878


def lonlat_to_mercator(lon: Column, lat: Column) -> tuple[Column, Column]:
    lat_c = F.least(F.greatest(lat, F.lit(-MERC_MAX_LAT)), F.lit(MERC_MAX_LAT))
    x = F.lit(R_3857) * F.radians(lon)
    y = F.lit(R_3857) * F.log(F.tan(F.lit(PI / 4.0) + F.radians(lat_c) / F.lit(2.0)))
    return x, y


def mercator_to_lonlat(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / F.lit(R_3857))
    lat = F.degrees(F.lit(2.0) * F.atan(F.exp(y / F.lit(R_3857))) - F.lit(PI / 2.0))
    return lon, lat


def st_transform(lon: Column, lat: Column, from_srid: int,
                 to_srid: int) -> tuple[Column, Column]:
    """Coordinate-pair reprojection between the supported SRIDs."""
    if from_srid == to_srid:
        return lon, lat
    if (from_srid, to_srid) == (4326, 3857):
        return lonlat_to_mercator(lon, lat)
    if (from_srid, to_srid) == (3857, 4326):
        return mercator_to_lonlat(lon, lat)
    raise ValueError(f"unsupported transform {from_srid} -> {to_srid}")


def st_transform_geom(geom: Column, from_srid: int, to_srid: int) -> Column:
    """GEOMETRY-struct reprojection: the same closed forms applied to the
    whole coordinate arrays via F.transform + arrays_zip -- pure JVM,
    works for every geometry kind (offsets/flags carried through, srid
    restamped). Mirrors the reference's per-geometry SRID carry
    (Geometry.hs:19) with an actual transform attached."""
    if from_srid == to_srid:
        return geom
    pairs = F.arrays_zip(geom["xs"].alias("x"), geom["ys"].alias("y"))

    def _tx(p):
        x, y = st_transform(p["x"], p["y"], from_srid, to_srid)
        return x

    def _ty(p):
        x, y = st_transform(p["x"], p["y"], from_srid, to_srid)
        return y

    return F.struct(
        geom["gtype"].alias("gtype"),
        F.when(geom["gtype"].isNotNull(), F.lit(to_srid)).alias("srid"),
        geom["has_z"].alias("has_z"),
        geom["has_m"].alias("has_m"),
        F.transform(pairs, _tx).alias("xs"),
        F.transform(pairs, _ty).alias("ys"),
        geom["zs"].alias("zs"),
        geom["ms"].alias("ms"),
        geom["ring_offsets"].alias("ring_offsets"),
        geom["part_offsets"].alias("part_offsets"),
    )
