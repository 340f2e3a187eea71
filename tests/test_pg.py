"""JDBC/PostGIS field-boundary contract (reference README.md:13-34).

No Postgres/JDBC driver exists in this sandbox, so these tests pin the
FIELD-LEVEL contract: the exact bytes to_pg_field ships equal what PostGIS
stores for that geometry, and from_pg_field(to_pg_field(g)) == g for every
geometry kind the reference supports -- the same boundary the reference's
ToField/FromField instances and GeoSpec fixtures pin."""

import pytest
from pyspark.sql import functions as F

from spatial.geometry import (GEOMETRY, linestring, multilinestring,
                              multipoint, multipolygon, point, polygon)
from spatial.ewkb import decode_hex, encode_hex
from spatial.pg import from_pg_field, to_pg_field


def _geoms():
    return {
        "point": point(1.5, -2.25, srid=4326),
        "point_zm": point(1.0, 2.0, 3.0, 4.0, srid=3857),
        "linestring": linestring([(0, 0), (1, 1), (2, 0.5)], srid=4326),
        "polygon_hole": polygon(
            [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
             [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]], srid=4326),
        "multipoint": multipoint([(0, 0), (5, 5)], srid=4326),
        "multilinestring": multilinestring(
            [[(0, 0), (1, 1)], [(2, 2), (3, 3), (4, 4)]], srid=4326),
        "multipolygon": multipolygon(
            [[[(0, 0), (1, 0), (1, 1), (0, 0)]],
             [[(5, 5), (6, 5), (6, 6), (5, 5)]]], srid=4326),
    }


def test_pg_field_roundtrip_all_kinds(spark):
    rows = [(name, g.as_row()) for name, g in _geoms().items()]
    df = spark.createDataFrame(rows, f"name string, geom {GEOMETRY.simpleString()}")
    out = df.select("name",
                    to_pg_field(F.col("geom")).alias("field"),
                    from_pg_field(to_pg_field(F.col("geom"))).alias("back"))
    for r in out.collect():
        g = _geoms()[r["name"]]
        # the shipped field text equals the codec's canonical hex EWKB --
        # what PostGIS stores verbatim for an ingested hex literal
        assert r["field"] == encode_hex(g)
        back = r["back"]
        assert back["gtype"] == g.gtype
        assert back["srid"] == g.srid
        assert list(back["xs"]) == [float(v) for v in g.xs]
        assert list(back["ys"]) == [float(v) for v in g.ys]
        assert list(back["ring_offsets"]) == [int(v) for v in g.ring_offsets]
        assert list(back["part_offsets"]) == [int(v) for v in g.part_offsets]


def test_pg_field_accepts_postgis_returned_forms(spark):
    """PostGIS text protocol returns UPPERCASE hex; the reference's tests
    normalize case the same way (GeoSpec.hs:23-24). Both cases decode."""
    g = _geoms()["polygon_hole"]
    hx = encode_hex(g)
    df = spark.createDataFrame([(hx,), (hx.upper(),), (None,), ("zznothex",)],
                               "field string")
    rows = df.select(from_pg_field(F.col("field")).alias("g")).collect()
    assert rows[0]["g"]["gtype"] == 3
    assert rows[1]["g"]["gtype"] == 3
    assert list(rows[0]["g"]["xs"]) == list(rows[1]["g"]["xs"])
    # NULL / malformed fields -> null struct rows, not job failure
    assert rows[2]["g"]["gtype"] is None
    assert rows[3]["g"]["gtype"] is None


def test_jdbc_path_fails_cleanly_without_driver(spark):
    """The live JDBC path needs a driver this sandbox lacks; it must raise
    a recognizable error, not silently no-op."""
    from spatial.pg import read_jdbc

    with pytest.raises(Exception):
        read_jdbc(spark, "jdbc:postgresql://localhost:5432/nope", "t").collect()
