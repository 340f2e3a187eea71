"""Golden hex-EWKB fixtures (verbatim from the reference test suite,
/root/reference/tests/GeoSpec.hs:17-21,37-44) + round-trip property tests
realizing the reference's commented-out QuickCheck intent (GeoSpec.hs:5)."""

import random

import pytest
from pyspark.sql import functions as F

from spatial import (
    Geom,
    decode_hex,
    encode_hex,
    ewkb_decode,
    ewkb_encode,
    linestring,
    multilinestring,
    multipoint,
    multipolygon,
    point,
    polygon,
)
from spatial.ewkb import encode_geom, decode_wkb

POINT1_HEX = "0101000020E6100000BCF36F97FDDA53C042E207420D254540"
LINESTRING1_HEX = (
    "0102000020E610000005000000805C4A99F98B5DC0BC5768BDDB0E4140805C9A58F98B5DC0"
    "C05798F5DC0E4140805C6C2DF88B5DC0C457C846E30E41407E5C3E5CF78B5DC0C857D0B2E7"
    "0E41407E5CAA69F68B5DC0CC57B813EA0E4140"
)
LS1_COORDS = [
    (-118.18710930120324, 34.11608092875346),
    (-118.1870938785014, 34.11611814440357),
    (-118.18702254850541, 34.116310928176546),
    (-118.18697267618151, 34.116445876817636),
    (-118.18691484104963, 34.11651846409913),
]


def test_golden_point_decode():
    g = decode_hex(POINT1_HEX)
    assert g.gtype == 1
    assert g.srid == 4326
    assert not g.has_z and not g.has_m
    assert g.xs == [-79.4217280000002]
    assert g.ys == [42.289467099999925]


def test_golden_linestring_decode():
    g = decode_hex(LINESTRING1_HEX)
    assert g.gtype == 2 and g.srid == 4326
    assert g.coords() == LS1_COORDS


def test_golden_point_encode():
    g = point(-79.4217280000002, 42.289467099999925, srid=4326)
    assert encode_hex(g).upper() == POINT1_HEX


def test_golden_linestring_encode():
    g = linestring(LS1_COORDS, srid=4326)
    assert encode_hex(g).upper() == LINESTRING1_HEX


def _rand_pos(rng, has_z, has_m):
    p = [rng.uniform(-180, 180), rng.uniform(-90, 90)]
    if has_z:
        p.append(rng.uniform(-1000, 1000))
    if has_m:
        p.append(rng.uniform(0, 1e6))
    return tuple(p)


def _rand_ring(rng, has_z, has_m, n=None):
    n = n or rng.randint(4, 8)
    ring = [_rand_pos(rng, has_z, has_m) for _ in range(n - 1)]
    ring.append(ring[0])
    return ring


def _random_geoms():
    rng = random.Random(42)
    geoms = []
    for has_z in (False, True):
        for has_m in (False, True):
            for srid in (None, 4326, 3857):
                kw = dict(srid=srid, has_z=has_z, has_m=has_m)
                x, y, *rest = _rand_pos(rng, has_z, has_m)
                z = rest[0] if has_z else None
                m = rest[-1] if has_m else None
                geoms.append(point(x, y, z, m, srid=srid))
                geoms.append(linestring([_rand_pos(rng, has_z, has_m) for _ in range(5)], **kw))
                geoms.append(polygon([_rand_ring(rng, has_z, has_m), _rand_ring(rng, has_z, has_m)], **kw))
                geoms.append(multipoint([_rand_pos(rng, has_z, has_m) for _ in range(3)], **kw))
                geoms.append(multilinestring([[_rand_pos(rng, has_z, has_m) for _ in range(4)] for _ in range(2)], **kw))
                geoms.append(multipolygon([[_rand_ring(rng, has_z, has_m)], [_rand_ring(rng, has_z, has_m), _rand_ring(rng, has_z, has_m)]], **kw))
    return geoms


@pytest.mark.parametrize("compat", ["standard", "reference"])
def test_roundtrip_property(compat):
    for g in _random_geoms():
        h = encode_hex(g, compat)
        g2 = decode_hex(h)
        assert g2 is not None, h
        assert g2.gtype == g.gtype and g2.srid == g.srid
        assert g2.has_z == g.has_z and g2.has_m == g.has_m
        assert g2.xs == g.xs and g2.ys == g.ys
        assert (g2.zs or None) == (g.zs or None)
        assert (g2.ms or None) == (g.ms or None)
        assert g2.ring_offsets == g.ring_offsets
        assert g2.part_offsets == g.part_offsets
        # second law: encode(decode(h)) == h (same compat)
        assert encode_hex(g2, compat) == h


def test_big_endian_decode():
    # synthesize a big-endian SRID point by hand: byte order 00
    import struct

    buf = b"\x00" + struct.pack(">I", 0x20000000 | 1) + struct.pack(">i", 4326)
    buf += struct.pack(">dd", -79.5, 42.25)
    g = decode_wkb(buf)
    assert g.gtype == 1 and g.srid == 4326
    assert g.xs == [-79.5] and g.ys == [42.25]
    # engine re-encodes little-endian (deterministic output, unlike
    # the reference's host-endianness stamp at Serialize.hs:94)
    assert encode_hex(g).startswith("01")


def test_iso_wkb_type_codes():
    import struct

    # ISO Point Z = code 1001, no flag bits
    buf = b"\x01" + struct.pack("<I", 1001) + struct.pack("<ddd", 1.0, 2.0, 3.0)
    g = decode_wkb(buf)
    assert g.gtype == 1 and g.has_z and not g.has_m
    assert g.zs == [3.0]


def test_malformed_returns_none():
    assert decode_hex("zz") is None
    assert decode_hex("01070000") is None  # truncated + unsupported type 7
    assert decode_hex("") is None
    assert decode_hex(None) is None


def test_reference_compat_multipoint_bare_positions():
    g = multipoint([(1.0, 2.0), (3.0, 4.0)], srid=4326)
    ref_hex = encode_hex(g, "reference")
    std_hex = encode_hex(g, "standard")
    assert ref_hex != std_hex
    # both decode to the same value
    for h in (ref_hex, std_hex):
        d = decode_hex(h)
        assert d.xs == [1.0, 3.0] and d.ys == [2.0, 4.0]
        assert d.gtype == 4


def test_spark_udf_roundtrip(spark):
    geoms = _random_geoms()
    hexes = [encode_hex(g) for g in geoms] + [POINT1_HEX, LINESTRING1_HEX, "nothex", None]
    df = spark.createDataFrame([(h,) for h in hexes], "ewkb_hex string")
    out = (
        df.withColumn("geom", ewkb_decode("ewkb_hex"))
        .withColumn("rehex", ewkb_encode("geom"))
        .select("ewkb_hex", "rehex", "geom.gtype", "geom.srid")
        .collect()
    )
    ok = 0
    for r in out:
        if r["ewkb_hex"] in ("nothex", None):
            assert r["rehex"] is None
            continue
        assert r["rehex"].upper() == r["ewkb_hex"].upper()
        ok += 1
    assert ok == len(geoms) + 2


def test_spark_fast_point_path(spark):
    # batch of uniform SRID 2D points exercises the vectorized fast path
    pts = [point(float(i) / 7, float(-i) / 11, srid=4326) for i in range(500)]
    hexes = [encode_hex(g).upper() for g in pts]
    df = spark.createDataFrame([(h,) for h in hexes], "h string")
    rows = (
        df.withColumn("g", ewkb_decode("h"))
        .select(F.col("g.xs")[0].alias("x"), F.col("g.srid").alias("srid"))
        .collect()
    )
    assert [r["x"] for r in rows] == [float(i) / 7 for i in range(500)]
    assert all(r["srid"] == 4326 for r in rows)


def test_big_endian_encode_roundtrip():
    """encode(endian='big') -> decode round-trips every kind (decode already
    accepted BE input; this closes the encode side of wire parity with
    big-endian writers -- the reference stamps host endianness on write,
    Serialize.hs:94)."""
    from spatial.ewkb import decode_hex, encode_hex
    from spatial.geometry import (linestring, multilinestring, multipoint,
                                  multipolygon, point, polygon)

    geoms = [
        point(1.5, -2.25, srid=4326),
        point(1.0, 2.0, 3.0, 4.0, srid=3857),
        linestring([(0, 0), (1, 1), (2, 0.5)], srid=4326),
        polygon([[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                 [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]], srid=4326),
        multipoint([(0, 0), (5, 5)], srid=4326),
        multilinestring([[(0, 0), (1, 1)], [(2, 2), (3, 3), (4, 4)]]),
        multipolygon([[[(0, 0), (1, 0), (1, 1), (0, 0)]],
                      [[(5, 5), (6, 5), (6, 6), (5, 5)]]], srid=4326),
    ]
    for g in geoms:
        hx = encode_hex(g, endian="big")
        assert hx.startswith("00")  # big-endian byte-order marker
        back = decode_hex(hx)
        assert back.gtype == g.gtype and back.srid == g.srid
        assert [float(v) for v in back.xs] == [float(v) for v in g.xs]
        assert [float(v) for v in back.ys] == [float(v) for v in g.ys]
        assert list(back.ring_offsets) == list(g.ring_offsets)
        assert list(back.part_offsets) == list(g.part_offsets)
        # BE and LE encodings decode to the same geometry
        le = decode_hex(encode_hex(g))
        assert [float(v) for v in le.xs] == [float(v) for v in back.xs]


def test_grouped_decode_falls_back_on_mixed_dims_nested(spark):
    """Regression (review r2): 4+ same-prefix MULTIPOINT rows whose nested
    points have MIXED Z flags crashed the grouped template decode; it must
    fall back to the scalar parser and decode every row."""
    import struct

    import pandas as pd

    from spatial.ewkb import _decode_series, decode_hex

    # multipoint with 2 nested points: first Z, second 2D (valid per parser)
    hx_parts = [
        "01", "04000000",            # LE, MultiPoint, no flags
        "02000000",                  # 2 points
        "01", "01000080", struct.pack("<3d", 1.0, 2.0, 3.0).hex(),  # Z point
        "01", "01000000", struct.pack("<2d", 4.0, 5.0).hex(),       # 2D point
    ]
    hx = "".join(hx_parts)
    assert decode_hex(hx) is not None  # scalar parser accepts it
    out = _decode_series(pd.Series([hx] * 6))
    assert len(out) == 6
    for i in range(6):
        assert out.iloc[i]["gtype"] == 4
        assert list(out.iloc[i]["xs"]) == [1.0, 4.0]


def test_geometry_collection_roundtrip():
    """WKB 7 (the reference errors, Serialize.hs:164): encode a mixed
    collection, decode back to the flat child list with per-child gtype as
    the part-kind array; SRID inherited from the collection header."""
    from spatial.ewkb import decode_collection_hex, encode_collection_hex

    children = [
        point(1.5, -2.25),
        linestring([(0.0, 0.0), (3.0, 4.0), (5.0, 6.0)]),
        polygon([[(0, 0), (4, 0), (4, 4), (0, 0)], [(1, 1), (2, 1), (1, 2), (1, 1)]]),
        multipoint([(7.0, 8.0), (9.0, 10.0)]),
    ]
    hx = encode_collection_hex(children, srid=4326)
    assert hx.startswith("0107000020e6100000")  # LE, type 7, SRID flag, 4326
    back = decode_collection_hex(hx)
    assert [g.gtype for g in back] == [1, 2, 3, 4]
    assert all(g.srid == 4326 for g in back)
    for orig, got in zip(children, back):
        assert [float(v) for v in got.xs] == [float(v) for v in orig.xs]
        assert [float(v) for v in got.ys] == [float(v) for v in orig.ys]
        assert list(got.ring_offsets) == list(orig.ring_offsets)
        assert list(got.part_offsets) == list(orig.part_offsets)
    # nested collection flattens recursively
    inner = encode_collection_hex([point(11.0, 12.0)])
    nested = encode_collection_hex(children[:1]) 
    import struct as _s
    outer = ("01" + "07000000" + _s.pack("<I", 2).hex()
             + nested + inner)
    flat = decode_collection_hex(outer)
    assert [g.gtype for g in flat] == [1, 1]
    assert flat[1].xs == [11.0]
    # non-collection input -> one-element list; malformed -> None
    assert [g.gtype for g in decode_collection_hex(encode_hex(point(1, 2)))] == [1]
    assert decode_collection_hex("0107000000ff") is None
    assert decode_collection_hex(None) is None
    # single-struct decode still nulls code 7 (one row can't hold a mix)
    assert decode_hex(hx) is None


def test_geometry_collection_spark_udf(spark):
    from spatial.ewkb import (decode_collection_hex, encode_collection_hex,
                              ewkb_decode_collection, ewkb_encode_collection)

    rows = [
        (0, encode_collection_hex([point(1.0, 2.0),
                                   linestring([(0.0, 1.0), (2.0, 3.0)])],
                                  srid=4326)),
        (1, encode_hex(point(5.0, 6.0, srid=3857))),  # plain geom -> 1 child
        (2, "deadbeef"),                              # malformed -> null
    ]
    df = spark.createDataFrame(rows, "id long, hex string")
    out = (df.withColumn("parts", ewkb_decode_collection(F.col("hex")))
             .select("id", F.col("parts.gtype").alias("kinds"),
                     F.size("parts").alias("n"), "parts")
             .orderBy("id").collect())
    assert list(out[0]["kinds"]) == [1, 2] and out[0]["n"] == 2
    assert list(out[1]["kinds"]) == [1]
    assert out[2]["kinds"] is None
    # Spark-side re-encode round-trips byte-identically for the collection row
    enc = (df.where("id = 0")
             .withColumn("parts", ewkb_decode_collection(F.col("hex")))
             .withColumn("hex2", ewkb_encode_collection(F.col("parts"), srid=4326))
             .first())
    assert enc["hex2"] == enc["hex"]
