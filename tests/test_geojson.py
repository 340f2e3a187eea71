"""GeoJSON byte-identity against the reference fixtures
(/root/reference/tests/GeoSpec.hs:21,45-46 and tests/JsonSpec.hs:13-21)."""

import json

from spatial import linestring, multipolygon, point, polygon
from spatial.geojson import (
    decode_geojson,
    encode_geojson,
    from_geojson,
    to_geojson,
    to_geojson_reference_compat,
)
from tests.test_ewkb import LS1_COORDS

# verbatim fixture, GeoSpec.hs:21 (including the "ESPG" typo from JSON.hs:115)
LINESTRING1_JSON = (
    '{"coordinates":[[-118.18710930120324,34.11608092875346],'
    "[-118.1870938785014,34.11611814440357],"
    "[-118.18702254850541,34.116310928176546],"
    "[-118.18697267618151,34.116445876817636],"
    "[-118.18691484104963,34.11651846409913]],"
    '"crs":{"type":"name","properties":{"name":"ESPG:4326"}},'
    '"type":"LineString"}'
)


def test_byte_identity_reference_compat():
    g = linestring(LS1_COORDS, srid=4326)
    assert encode_geojson(g, compat="reference") == LINESTRING1_JSON


def test_standard_mode_fixes_typo():
    g = linestring(LS1_COORDS, srid=4326)
    out = encode_geojson(g)
    assert '"EPSG:4326"' in out and "ESPG" not in out


def test_decode_accepts_typo_and_extracts_srid():
    # JsonSpec.hs semantics: decode extracts srid=4326 from crs member even
    # with the ESPG authority (parseCRS accepts any prefix, JSON.hs:118-128)
    g = decode_geojson(LINESTRING1_JSON)
    assert g.gtype == 2 and g.srid == 4326
    assert g.coords() == LS1_COORDS


def test_jsonspec_33_position_linestring():
    # JsonSpec.hs:13-21 -- 33-position real-world linestring, srid extraction
    coords = [[-118.00461121305374 + i * 1e-4, 35.973406736404876 - i * 1e-4]
              for i in range(33)]
    doc = json.dumps({
        "coordinates": coords,
        "crs": {"type": "name", "properties": {"name": "ESPG:4326"}},
        "type": "LineString",
    })
    g = decode_geojson(doc)
    assert g.srid == 4326 and g.n_coords == 33


def test_roundtrip_all_kinds():
    geoms = [
        point(1.5, -2.25, srid=4326),
        point(1.5, -2.25, 10.0, srid=None),
        polygon([[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)],
                 [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]]),
        multipolygon([[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]],
                      [[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0)]]], srid=3857),
    ]
    for g in geoms:
        j = encode_geojson(g)
        g2 = decode_geojson(j)
        assert g2.gtype == g.gtype and g2.srid == g.srid
        assert g2.xs == g.xs and g2.ys == g.ys
        assert encode_geojson(g2) == j


def test_keys_alphabetical_no_srid():
    g = point(1.0, 2.0)
    assert encode_geojson(g) == '{"coordinates":[1.0,2.0],"type":"Point"}'


def test_malformed_returns_none():
    assert decode_geojson("{") is None
    assert decode_geojson('{"type":"Nope","coordinates":[]}') is None
    assert decode_geojson(None) is None


def test_spark_udfs(spark):
    g = linestring(LS1_COORDS, srid=4326)
    df = spark.createDataFrame([(LINESTRING1_JSON,)], "j string")
    row = (
        df.withColumn("g", from_geojson("j"))
        .withColumn("ref", to_geojson_reference_compat("g"))
        .withColumn("std", to_geojson("g"))
        .collect()[0]
    )
    assert row["ref"] == LINESTRING1_JSON
    assert "EPSG:4326" in row["std"]
    assert row["g"]["srid"] == 4326


def test_geojson_collection_roundtrip():
    from spatial.geojson import (decode_geojson_collection,
                                 encode_geojson_collection)

    children = [point(1.5, -2.0), linestring([(0.0, 0.0), (3.0, 4.0)])]
    t = encode_geojson_collection(children, srid=4326)
    # byte contract: alphabetical keys, no whitespace, collection-level crs
    assert t.startswith('{"crs":{"type":"name","properties":'
                        '{"name":"EPSG:4326"}},"geometries":[')
    assert t.endswith('],"type":"GeometryCollection"}')
    assert json.loads(t)  # well-formed
    back = decode_geojson_collection(t)
    assert [g.gtype for g in back] == [1, 2]
    assert all(g.srid == 4326 for g in back)
    assert back[0].xs == [1.5] and back[1].ys == [0.0, 4.0]
    # nested flatten, plain passthrough, malformed
    nested = ('{"geometries":[{"coordinates":[1.0,2.0],"type":"Point"},'
              '{"geometries":[{"coordinates":[[0.0,0.0],[1.0,1.0]],'
              '"type":"LineString"}],"type":"GeometryCollection"}],'
              '"type":"GeometryCollection"}')
    flat = decode_geojson_collection(nested)
    assert [g.gtype for g in flat] == [1, 2]
    assert [g.gtype for g in decode_geojson_collection(
        '{"coordinates":[1.0,2.0],"type":"Point"}')] == [1]
    assert decode_geojson_collection('{"type":"GeometryCollection"}') is None
    assert decode_geojson_collection("nope") is None
