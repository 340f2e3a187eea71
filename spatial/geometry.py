"""Columnar geometry model: one struct column holding any OGC simple feature.

This is the Spark-native re-expression of the reference's algebraic
``Geometry`` sum type (/root/reference/src/Database/Postgis/Geometry.hs:98-104).
Instead of one boxed value per row, geometry is a struct-of-arrays
(GeoArrow-offsets style): flat coordinate arrays plus two offset vectors, so a
whole Arrow batch of geometries is a handful of contiguous primitive buffers
that NumPy can slice without any per-row Python.

Layout (uniform across all six kinds, mirroring the closed sum type):

* ``gtype``        -- 1..6, same codes as Geometry.hs:39,53,66,73,80,87
                      (Point, LineString, Polygon, MultiPoint,
                       MultiLineString, MultiPolygon)
* ``srid``         -- nullable int; null <=> the reference's ``SRID = Nothing``
                      (Geometry.hs:19)
* ``has_z/has_m``  -- explicit booleans. The reference derives these
                      structurally from ``V.head`` (Geometry.hs:51-52 etc.),
                      which crashes on empty geometries; here empties are legal.
* ``xs/ys/zs/ms``  -- flat little-endian double arrays over ALL coordinates of
                      the geometry; ``zs``/``ms`` null when absent.
* ``ring_offsets`` -- prefix offsets into the coordinate arrays delimiting
                      rings / linestrings / individual points
                      (length = n_rings + 1, starts at 0).
* ``part_offsets`` -- prefix offsets into ``ring_offsets`` delimiting parts
                      (polygons of a multipolygon, lines of a multilinestring,
                      points of a multipoint; length = n_parts + 1).

Per-kind conventions (n = coordinate count):

=================  =========================  =========================
kind               ring_offsets               part_offsets
=================  =========================  =========================
Point              [0, 1]                     [0, 1]
LineString         [0, n]                     [0, 1]
Polygon (r rings)  [0, c1, c1+c2, ...]        [0, r]
MultiPoint (m)     [0, 1, 2, ..., m]          [0, 1, ..., m]
MultiLineString    one span per line          [0, 1, ..., m]
MultiPolygon       one span per ring          ring-count prefix per polygon
=================  =========================  =========================

An empty geometry has ring_offsets=[0], part_offsets=[0] (and empty coords).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

# WKB geometry type codes (Geometry.hs:39,53,66,73,80,87)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
# WKB 7: not a 7th leaf kind -- a collection decodes to an ARRAY of GEOMETRY
# structs (ewkb.decode_collection_hex), since one struct row holds one
# homogeneous simple feature. The reference ``error``s on code 7
# (Serialize.hs:164); the engine round-trips it (parity-plus).
GEOMETRYCOLLECTION = 7

GTYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
}

# EWKB header flag bits (Serialize.hs:22-25)
WKB_Z = 0x80000000
WKB_M = 0x40000000
WKB_SRID = 0x20000000
EWKB_TYPE_MASK = 0x1FFFFFFF

GEOMETRY = StructType(
    [
        StructField("gtype", IntegerType()),
        StructField("srid", IntegerType()),
        StructField("has_z", BooleanType()),
        StructField("has_m", BooleanType()),
        StructField("xs", ArrayType(DoubleType())),
        StructField("ys", ArrayType(DoubleType())),
        StructField("zs", ArrayType(DoubleType())),
        StructField("ms", ArrayType(DoubleType())),
        StructField("ring_offsets", ArrayType(IntegerType())),
        StructField("part_offsets", ArrayType(IntegerType())),
    ]
)

GEOMETRY_FIELDS = [f.name for f in GEOMETRY.fields]


@dataclass
class Geom:
    """Driver/test-side value mirroring one GEOMETRY struct row.

    This is NOT used in any hot path -- kernels operate on NumPy views of the
    Arrow buffers directly. It exists for fixtures, property tests, and
    building literal geometries (regions, gazetteer shapes).
    """

    gtype: int
    srid: Optional[int] = None
    has_z: bool = False
    has_m: bool = False
    xs: list = field(default_factory=list)
    ys: list = field(default_factory=list)
    zs: Optional[list] = None
    ms: Optional[list] = None
    ring_offsets: list = field(default_factory=lambda: [0])
    part_offsets: list = field(default_factory=lambda: [0])

    def as_row(self) -> dict:
        return {
            "gtype": self.gtype,
            "srid": self.srid,
            "has_z": self.has_z,
            "has_m": self.has_m,
            "xs": list(self.xs),
            "ys": list(self.ys),
            "zs": list(self.zs) if self.zs is not None else None,
            "ms": list(self.ms) if self.ms is not None else None,
            "ring_offsets": list(self.ring_offsets),
            "part_offsets": list(self.part_offsets),
        }

    # -- structural accessors ------------------------------------------------
    @property
    def n_coords(self) -> int:
        return len(self.xs)

    @property
    def n_rings(self) -> int:
        return len(self.ring_offsets) - 1

    @property
    def n_parts(self) -> int:
        return len(self.part_offsets) - 1

    def ring(self, i: int):
        """Coordinate span [(x, y, z?, m?)] of ring i."""
        a, b = self.ring_offsets[i], self.ring_offsets[i + 1]
        cols = [self.xs[a:b], self.ys[a:b]]
        if self.has_z:
            cols.append(self.zs[a:b])
        if self.has_m:
            cols.append(self.ms[a:b])
        return list(zip(*cols))

    def coords(self):
        cols = [self.xs, self.ys]
        if self.has_z:
            cols.append(self.zs)
        if self.has_m:
            cols.append(self.ms)
        return list(zip(*cols))


def _unzip(positions: Sequence[Sequence[float]], has_z: bool, has_m: bool):
    xs, ys, zs, ms = [], [], [], []
    dims = 2 + int(has_z) + int(has_m)
    for p in positions:
        if len(p) != dims:
            raise ValueError(f"position {p!r} has {len(p)} dims, expected {dims}")
        xs.append(float(p[0]))
        ys.append(float(p[1]))
        k = 2
        if has_z:
            zs.append(float(p[k]))
            k += 1
        if has_m:
            ms.append(float(p[k]))
    return xs, ys, (zs if has_z else None), (ms if has_m else None)


def point(x: float, y: float, z: float | None = None, m: float | None = None,
          srid: int | None = None) -> Geom:
    pos = [x, y] + ([z] if z is not None else []) + ([m] if m is not None else [])
    xs, ys, zs, ms = _unzip([pos], z is not None, m is not None)
    return Geom(POINT, srid, z is not None, m is not None, xs, ys, zs, ms,
                [0, 1], [0, 1])


def linestring(positions, srid=None, has_z=False, has_m=False) -> Geom:
    xs, ys, zs, ms = _unzip(positions, has_z, has_m)
    return Geom(LINESTRING, srid, has_z, has_m, xs, ys, zs, ms,
                [0, len(xs)], [0, 1])


def polygon(rings, srid=None, has_z=False, has_m=False) -> Geom:
    """rings: list of position-lists; ring 0 is the shell, rest holes
    (convention documented at Geometry.hs:13-17)."""
    xs, ys, zs, ms = [], [], ([] if has_z else None), ([] if has_m else None)
    roffs = [0]
    for ring in rings:
        rx, ry, rz, rm = _unzip(ring, has_z, has_m)
        xs += rx
        ys += ry
        if has_z:
            zs += rz
        if has_m:
            ms += rm
        roffs.append(len(xs))
    return Geom(POLYGON, srid, has_z, has_m, xs, ys, zs, ms,
                roffs, [0, len(rings)])


def multipoint(positions, srid=None, has_z=False, has_m=False) -> Geom:
    xs, ys, zs, ms = _unzip(positions, has_z, has_m)
    n = len(xs)
    return Geom(MULTIPOINT, srid, has_z, has_m, xs, ys, zs, ms,
                list(range(n + 1)), list(range(n + 1)))


def multilinestring(lines, srid=None, has_z=False, has_m=False) -> Geom:
    xs, ys, zs, ms = [], [], ([] if has_z else None), ([] if has_m else None)
    roffs = [0]
    for line in lines:
        lx, ly, lz, lm = _unzip(line, has_z, has_m)
        xs += lx
        ys += ly
        if has_z:
            zs += lz
        if has_m:
            ms += lm
        roffs.append(len(xs))
    return Geom(MULTILINESTRING, srid, has_z, has_m, xs, ys, zs, ms,
                roffs, list(range(len(lines) + 1)))


def multipolygon(polys, srid=None, has_z=False, has_m=False) -> Geom:
    """polys: list of polygons, each a list of rings."""
    xs, ys, zs, ms = [], [], ([] if has_z else None), ([] if has_m else None)
    roffs, poffs = [0], [0]
    for rings in polys:
        for ring in rings:
            rx, ry, rz, rm = _unzip(ring, has_z, has_m)
            xs += rx
            ys += ry
            if has_z:
                zs += rz
            if has_m:
                ms += rm
            roffs.append(len(xs))
        poffs.append(len(roffs) - 1)
    return Geom(MULTIPOLYGON, srid, has_z, has_m, xs, ys, zs, ms, roffs, poffs)


def bbox(g: Geom):
    """(minx, miny, maxx, maxy); None for empty geometry."""
    if not g.xs:
        return None
    return (min(g.xs), min(g.ys), max(g.xs), max(g.ys))
