from spatial import linestring, multilinestring, multipoint, multipolygon, point, polygon
from spatial.geometry import Geom, POINT
from spatial.wkt import decode_wkt, encode_wkt, wkt_decode, wkt_encode


def test_point():
    g = point(1.0, 2.0)
    assert encode_wkt(g) == "POINT (1 2)"
    g2 = decode_wkt("POINT (1 2)")
    assert g2.xs == [1.0] and g2.ys == [2.0] and g2.srid is None


def test_point_z_m_zm():
    assert encode_wkt(point(1.0, 2.0, 3.0)) == "POINT Z (1 2 3)"
    g = decode_wkt("POINT Z (1 2 3)")
    assert g.has_z and g.zs == [3.0]
    g = decode_wkt("POINTZ (1 2 3)")
    assert g.has_z
    g = decode_wkt("POINT ZM (1 2 3 4)")
    assert g.has_z and g.has_m and g.ms == [4.0]
    g = decode_wkt("POINT M (1 2 4)")
    assert g.has_m and not g.has_z and g.ms == [4.0]


def test_ewkt_srid():
    g = point(1.5, 2.5, srid=4326)
    assert encode_wkt(g) == "SRID=4326;POINT (1.5 2.5)"
    g2 = decode_wkt("SRID=4326;POINT (1.5 2.5)")
    assert g2.srid == 4326
    assert encode_wkt(g, ewkt=False) == "POINT (1.5 2.5)"


def test_dims_inferred_without_marker():
    g = decode_wkt("LINESTRING (1 2 3, 4 5 6)")
    assert g.has_z and not g.has_m


def test_polygon_roundtrip():
    g = polygon(
        [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)],
         [(1.0, 1.0), (2.0, 1.0), (1.0, 2.0), (1.0, 1.0)]],
        srid=4326,
    )
    t = encode_wkt(g)
    assert t == "SRID=4326;POLYGON ((0 0, 4 0, 4 4, 0 0), (1 1, 2 1, 1 2, 1 1))"
    g2 = decode_wkt(t)
    assert g2.ring_offsets == g.ring_offsets and g2.xs == g.xs


def test_multi_kinds_roundtrip():
    geoms = [
        multipoint([(1.0, 2.0), (3.0, 4.0)], srid=4326),
        multilinestring([[(0.0, 0.0), (1.0, 1.0)], [(2.0, 2.0), (3.0, 3.0), (4.0, 4.0)]]),
        multipolygon([[[(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0)]],
                      [[(9.0, 9.0), (8.0, 9.0), (9.0, 8.0), (9.0, 9.0)],
                       [(8.8, 8.8), (8.9, 8.8), (8.8, 8.9), (8.8, 8.8)]]]),
    ]
    for g in geoms:
        g2 = decode_wkt(encode_wkt(g))
        assert g2.gtype == g.gtype and g2.xs == g.xs and g2.ys == g.ys
        assert g2.ring_offsets == g.ring_offsets
        assert g2.part_offsets == g.part_offsets


def test_multipoint_bare_form():
    g = decode_wkt("MULTIPOINT (1 2, 3 4)")
    assert g.xs == [1.0, 3.0]


def test_empty():
    g = decode_wkt("POINT EMPTY")
    assert g.gtype == POINT and g.xs == []
    assert encode_wkt(Geom(POINT)) == "POINT EMPTY"


def test_malformed():
    assert decode_wkt("PONT (1 2)") is None
    assert decode_wkt("POINT (1)") is None
    assert decode_wkt(None) is None


def test_spark_udfs(spark):
    df = spark.createDataFrame([("SRID=4326;POINT (1.5 2.5)",), ("junk",)], "t string")
    rows = (
        df.withColumn("g", wkt_decode("t"))
        .withColumn("t2", wkt_encode("g"))
        .collect()
    )
    assert rows[0]["t2"] == "SRID=4326;POINT (1.5 2.5)"
    assert rows[1]["t2"] is None


def test_wkt_collection_roundtrip():
    from spatial.wkt import decode_wkt_collection, encode_wkt_collection

    children = [point(1.5, -2.0), linestring([(0.0, 0.0), (3.0, 4.0)]),
                polygon([[(0, 0), (4, 0), (0, 4), (0, 0)]])]
    t = encode_wkt_collection(children, srid=4326)
    assert t.startswith("SRID=4326;GEOMETRYCOLLECTION (POINT (1.5 -2), ")
    back = decode_wkt_collection(t)
    assert [g.gtype for g in back] == [1, 2, 3]
    assert all(g.srid == 4326 for g in back)
    for orig, got in zip(children, back):
        assert got.xs == [float(v) for v in orig.xs]
        assert got.ys == [float(v) for v in orig.ys]
    # nested collection flattens; inner child keeps its own structure
    nested = ("GEOMETRYCOLLECTION (POINT (1 2), "
              "GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1)))")
    flat = decode_wkt_collection(nested)
    assert [g.gtype for g in flat] == [1, 2]
    # EMPTY, plain-geometry passthrough, malformed
    assert decode_wkt_collection("GEOMETRYCOLLECTION EMPTY") == []
    assert encode_wkt_collection([]) == "GEOMETRYCOLLECTION EMPTY"
    assert [g.gtype for g in decode_wkt_collection("POINT (1 2)")] == [1]
    assert decode_wkt_collection("GEOMETRYCOLLECTION (POINT)") is None
    assert decode_wkt_collection(None) is None
