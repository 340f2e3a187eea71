import math

import numpy as np
import pytest

from spatial import polygon, multipolygon, linestring
from spatial.kernels import (
    dump_points,
    haversine_col,
    haversine_m,
    pip_even_odd,
    ring_is_closed,
)

SQUARE = polygon([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]])
SQUARE_HOLE = polygon([
    [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
    [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)],
])


def _pip(g, pts):
    px = np.asarray([p[0] for p in pts])
    py = np.asarray([p[1] for p in pts])
    return pip_even_odd(px, py, g.xs, g.ys, g.ring_offsets).tolist()


def test_pip_square():
    assert _pip(SQUARE, [(5, 5), (0.1, 0.1), (9.9, 9.9)]) == [True, True, True]
    assert _pip(SQUARE, [(-1, 5), (11, 5), (5, -1), (5, 11), (20, 20)]) == [False] * 5


def test_pip_hole():
    assert _pip(SQUARE_HOLE, [(5, 5)]) == [False]      # inside the hole
    assert _pip(SQUARE_HOLE, [(2, 2), (4.5, 3.0)]) == [True, True]
    assert _pip(SQUARE_HOLE, [(4.5, 4.5)]) == [False]


def test_pip_concave():
    # C-shape
    g = polygon([[(0.0, 0.0), (10.0, 0.0), (10.0, 3.0), (3.0, 3.0),
                  (3.0, 7.0), (10.0, 7.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]])
    assert _pip(g, [(5, 5)]) == [False]   # in the notch
    assert _pip(g, [(1, 5), (5, 1), (5, 9)]) == [True, True, True]


def test_pip_multipolygon_even_odd():
    g = multipolygon([
        [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]],
        [[(5.0, 5.0), (7.0, 5.0), (7.0, 7.0), (5.0, 7.0), (5.0, 5.0)]],
    ])
    assert _pip(g, [(1, 1), (6, 6), (3.5, 3.5)]) == [True, True, False]


def test_pip_unclosed_ring_autocloses():
    g = polygon([[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]])  # no repeat
    assert _pip(g, [(5, 5), (15, 5)]) == [True, False]


def test_pip_vs_bruteforce_oracle():
    # random concave-ish polygon, compare against an independent scalar
    # implementation (matplotlib-free, shoelace-style crossing count)
    rng = np.random.default_rng(7)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 12))
    radii = rng.uniform(2, 8, 12)
    ring = [(float(r * np.cos(a)), float(r * np.sin(a))) for a, r in zip(angles, radii)]
    ring.append(ring[0])
    g = polygon([ring])
    px = rng.uniform(-10, 10, 3000)
    py = rng.uniform(-10, 10, 3000)

    def scalar_pip(x, y):
        inside = False
        for i in range(len(ring) - 1):
            x1, y1 = ring[i]
            x2, y2 = ring[i + 1]
            if (y1 > y) != (y2 > y):
                if x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                    inside = not inside
        return inside

    got = pip_even_odd(px, py, g.xs, g.ys, g.ring_offsets)
    want = np.asarray([scalar_pip(x, y) for x, y in zip(px, py)])
    assert (got == want).all()


def test_ring_is_closed():
    assert ring_is_closed(SQUARE.xs, SQUARE.ys, SQUARE.ring_offsets) == [True]
    open_ring = polygon([[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]])
    assert ring_is_closed(open_ring.xs, open_ring.ys, open_ring.ring_offsets) == [False]


def test_haversine_known_distance():
    # LAX (-118.4085, 33.9416) to JFK (-73.7781, 40.6413) ~ 3974 km
    d = haversine_m(-118.4085, 33.9416, -73.7781, 40.6413)
    assert abs(float(d) / 1000.0 - 3974) < 15
    assert float(haversine_m(10, 20, 10, 20)) == 0.0


def test_haversine_col_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "lon1": rng.uniform(-180, 180, 200), "lat1": rng.uniform(-89, 89, 200),
        "lon2": rng.uniform(-180, 180, 200), "lat2": rng.uniform(-89, 89, 200),
    })
    df = spark.createDataFrame(pdf)
    got = np.asarray(
        df.select(haversine_col(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d"))
        .toPandas()["d"]
    )
    want = haversine_m(pdf.lon1, pdf.lat1, pdf.lon2, pdf.lat2)
    assert np.allclose(got, want, rtol=1e-9)


def test_dump_points(spark):
    g = linestring([(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)], srid=4326)
    df = spark.createDataFrame([(1, g.as_row())], "id long, geom struct<gtype:int,srid:int,has_z:boolean,has_m:boolean,xs:array<double>,ys:array<double>,zs:array<double>,ms:array<double>,ring_offsets:array<int>,part_offsets:array<int>>")
    rows = dump_points(df).select("point_idx", "pt_x", "pt_y").collect()
    assert [(r["point_idx"], r["pt_x"], r["pt_y"]) for r in rows] == [
        (0, 1.0, 2.0), (1, 3.0, 4.0), (2, 5.0, 6.0)]


def test_ring_self_intersects():
    from spatial.kernels import ring_self_intersects

    # bowtie
    assert ring_self_intersects([0, 2, 2, 0, 0], [0, 2, 0, 2, 0])
    # simple square
    assert not ring_self_intersects([0, 1, 1, 0, 0], [0, 0, 1, 1, 0])
    # concave but simple
    assert not ring_self_intersects([0, 4, 4, 2, 4, 4, 0, 0],
                                    [0, 0, 1, 2, 3, 4, 4, 0])


def test_geom_is_valid():
    from spatial.kernels import geom_is_valid

    assert geom_is_valid(SQUARE.xs, SQUARE.ys, SQUARE.ring_offsets)
    assert geom_is_valid(SQUARE_HOLE.xs, SQUARE_HOLE.ys, SQUARE_HOLE.ring_offsets)
    open_ring = polygon([[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]])
    assert not geom_is_valid(open_ring.xs, open_ring.ys, open_ring.ring_offsets)
    bowtie = polygon([[(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0), (0.0, 0.0)]])
    assert not geom_is_valid(bowtie.xs, bowtie.ys, bowtie.ring_offsets)


def test_convex_hull():
    from spatial.kernels import convex_hull

    rng = np.random.default_rng(12)
    pts = rng.uniform(-10, 10, size=(200, 2))
    hx, hy = convex_hull(pts[:, 0], pts[:, 1])
    assert (hx[0], hy[0]) == (hx[-1], hy[-1])
    # every input point is inside or on the hull: use PIP with tiny shrink
    from spatial.kernels import pip_even_odd

    cx, cy = np.mean(hx[:-1]), np.mean(hy[:-1])
    grown_x = [cx + (x - cx) * 1.0001 for x in hx]
    grown_y = [cy + (y - cy) * 1.0001 for y in hy]
    inside = pip_even_odd(pts[:, 0], pts[:, 1], grown_x, grown_y, [0, len(grown_x)])
    assert inside.all()
    # hull of collinear points degenerates gracefully
    hx2, hy2 = convex_hull([0.0, 1.0, 2.0], [0.0, 1.0, 2.0])
    assert len(hx2) >= 2


def test_st_isvalid_and_hull_udfs(spark):
    from spatial.kernels import st_convexhull_udf, st_isvalid_udf
    from spatial.geometry import GEOMETRY

    bowtie = polygon([[(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0), (0.0, 0.0)]], srid=4326)
    schema = "id long, geom struct<" + ",".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in GEOMETRY.fields) + ">"
    df = spark.createDataFrame(
        [(1, SQUARE.as_row()), (2, bowtie.as_row())], schema)
    valid = st_isvalid_udf()
    hull = st_convexhull_udf()
    rows = df.withColumn("ok", valid("geom")).withColumn("h", hull("geom")).collect()
    assert [r["ok"] for r in rows] == [True, False]
    assert rows[1]["h"]["gtype"] == 3 and rows[1]["h"]["srid"] == 4326


def test_measures_pure():
    from spatial.kernels import geom_area, geom_centroid, geom_length

    # 2x1 rectangle, CCW
    assert geom_area([0, 2, 2, 0, 0], [0, 0, 1, 1, 0], [0, 5]) == 2.0
    # rectangle with CW hole: 4 - 1
    assert geom_area([0, 2, 2, 0, 0, 0.5, 0.5, 1.5, 1.5, 0.5],
                     [0, 0, 2, 2, 0, 0.5, 1.5, 1.5, 0.5, 0.5],
                     [0, 5, 10]) == 3.0
    # L-path 3 across + 4 up
    assert geom_length([0, 3, 3], [0, 0, 4], [0, 3]) == 7.0
    # right triangle centroid
    cx, cy = geom_centroid([0, 2, 0, 0], [0, 0, 1, 0], [0, 4], 3)
    assert abs(cx - 2 / 3) < 1e-12 and abs(cy - 1 / 3) < 1e-12
    # linestring centroid = midpoint for a single segment
    assert geom_centroid([0, 2], [0, 0], [0, 2], 2) == (1.0, 0.0)
    # multipoint centroid = mean
    assert geom_centroid([0, 4], [0, 2], [0, 2], 4) == (2.0, 1.0)


def test_measure_udfs(spark):
    import pyspark.sql.functions as F

    from spatial.geometry import linestring, polygon
    from spatial.kernels import st_area_udf, st_centroid_udf, st_length_udf

    rows = [
        (1, polygon([[(0, 0), (2, 0), (2, 1), (0, 1), (0, 0)]]).as_row()),
        (2, linestring([(0, 0), (3, 0), (3, 4)]).as_row()),
    ]
    from spatial.geometry import GEOMETRY
    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([StructField("id", LongType()),
                         StructField("geom", GEOMETRY)])
    df = spark.createDataFrame(rows, schema)
    out = {r["id"]: r for r in df.select(
        "id", st_area_udf()(F.col("geom")).alias("area"),
        st_length_udf()(F.col("geom")).alias("length"),
        st_centroid_udf()(F.col("geom")).alias("c")).collect()}
    assert out[1]["area"] == 2.0
    assert out[2]["length"] == 7.0
    assert abs(out[1]["c"]["cx"] - 1.0) < 1e-12
    # L-path: len-3 seg midpoint (1.5,0), len-4 seg midpoint (3,2)
    assert abs(out[2]["c"]["cx"] - 16.5 / 7) < 1e-12
    assert abs(out[2]["c"]["cy"] - 8.0 / 7) < 1e-12


def test_dp_simplify_properties():
    import numpy as np

    from spatial.kernels import dp_simplify

    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(3, 60))
        x = np.cumsum(rng.uniform(0.1, 1.0, n))
        y = rng.normal(0, 1.0, n)
        tol = float(rng.uniform(0.05, 2.0))
        keep = dp_simplify(x, y, tol)
        assert keep[0] and keep[-1]
        kx, ky = x[keep], y[keep]
        # every dropped vertex is within tol of the simplified polyline's
        # corresponding chord (the DP guarantee)
        ki = np.flatnonzero(keep)
        for a, b in zip(ki[:-1], ki[1:]):
            if b - a < 2:
                continue
            dx, dy = x[b] - x[a], y[b] - y[a]
            L2 = dx * dx + dy * dy
            seg = slice(a + 1, b)
            cross = (x[seg] - x[a]) * dy - (y[seg] - y[a]) * dx
            d2 = cross * cross / L2 if L2 else \
                (x[seg] - x[a]) ** 2 + (y[seg] - y[a]) ** 2
            assert (d2 <= tol * tol + 1e-12).all()
        # idempotence
        keep2 = dp_simplify(kx, ky, tol)
        assert keep2.all()


def test_point_geom_distance():
    from spatial.kernels import point_geom_distance

    sq_x, sq_y, off = [0, 2, 2, 0, 0], [0, 0, 2, 2, 0], [0, 5]
    assert point_geom_distance(5, 6, sq_x, sq_y, off) == 5.0   # corner
    assert point_geom_distance(1, 3, sq_x, sq_y, off) == 1.0   # edge
    assert point_geom_distance(1, 0, sq_x, sq_y, off) == 0.0   # on edge
    assert point_geom_distance(1, 1, sq_x, sq_y, off) == 1.0   # interior->boundary
    # cross-part joint segments must not count: two far-apart rings
    assert point_geom_distance(
        0, 0, [10, 11, 11, 10, 10, 5, 6, 6, 5, 5],
        [10, 10, 11, 11, 10, 0, 0, 1, 1, 0], [0, 5, 10]) == 5.0
    # single point geometry
    assert point_geom_distance(3, 4, [0.0], [0.0], [0, 1]) == 5.0


def test_clip_ring_bbox():
    from spatial.kernels import clip_ring_bbox, geom_area

    # overlapping squares -> intersection square
    xs, ys = clip_ring_bbox([0, 4, 4, 0, 0], [0, 0, 4, 4, 0], 2, 2, 6, 6)
    assert geom_area(xs, ys, [0, len(xs)]) == 4.0
    # fully outside -> empty
    assert clip_ring_bbox([0, 1, 1, 0, 0], [0, 0, 1, 1, 0], 5, 5, 6, 6) == ([], [])
    # fully inside -> unchanged area
    xs, ys = clip_ring_bbox([0, 1, 1, 0, 0], [0, 0, 1, 1, 0], -5, -5, 5, 5)
    assert geom_area(xs, ys, [0, len(xs)]) == 1.0
    # triangle x+y<=4 clipped to [0,3]^2: area 8 - corner triangle over the
    # line inside the window: window corner (3,3) is outside (3+3>4) ->
    # clipped area = 9 - 0.5*2*2 = 7... compute independently:
    xs, ys = clip_ring_bbox([0, 4, 0, 0], [0, 0, 4, 0], 0, 0, 3, 3)
    a = geom_area(xs, ys, [0, len(xs)])
    assert abs(a - 7.0) < 1e-12
    # random convex-window clip property: clipped area <= both areas
    import numpy as np

    rng = np.random.default_rng(5)
    for _ in range(10):
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        r = rng.uniform(1, 5, 8)
        ring_x = list(r * np.cos(ang)) + [float(r[0] * np.cos(ang[0]))]
        ring_y = list(r * np.sin(ang)) + [float(r[0] * np.sin(ang[0]))]
        area0 = geom_area(ring_x, ring_y, [0, len(ring_x)])
        xs, ys = clip_ring_bbox(ring_x, ring_y, -2, -2, 2, 2)
        if xs:
            a = geom_area(xs, ys, [0, len(xs)])
            assert a <= area0 + 1e-9 and a <= 16.0 + 1e-9


def test_clip_bbox_multipolygon_parts_and_polygon_only(spark):
    """MultiPolygon clips per part (surviving second shell stays its own
    part); non-polygon gtypes yield null (polygon-only contract)."""
    from pyspark.sql import functions as F

    from spatial.geometry import GEOMETRY
    from spatial.kernels import st_clip_bbox_udf

    # two unit squares at x in [0,1] and [3,4]; window keeps both
    mp = {
        "gtype": 6, "srid": None, "has_z": False, "has_m": False,
        "xs": [0.0, 1.0, 1.0, 0.0, 0.0, 3.0, 4.0, 4.0, 3.0, 3.0],
        "ys": [0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0],
        "zs": None, "ms": None,
        "ring_offsets": [0, 5, 10], "part_offsets": [0, 1, 2],
    }
    ls = {
        "gtype": 2, "srid": None, "has_z": False, "has_m": False,
        "xs": [0.0, 1.0, 2.0], "ys": [0.0, 0.0, 1.0],
        "zs": None, "ms": None,
        "ring_offsets": [0, 3], "part_offsets": [0, 1],
    }
    df = spark.createDataFrame(
        [(1, mp), (2, ls)], f"id long, geom {GEOMETRY.simpleString()}")
    out = {r["id"]: r["c"] for r in df.select(
        "id", st_clip_bbox_udf(-10.0, -10.0, 10.0, 10.0)(F.col("geom")).alias("c")
    ).collect()}
    assert out[1]["part_offsets"] == [0, 1, 2]          # parts preserved
    assert out[1]["ring_offsets"] == [0, 5, 10]
    assert out[2]["gtype"] is None                      # linestring -> null
    # window clipping away the second part drops that part entirely
    out1 = df.where("id = 1").select(
        st_clip_bbox_udf(-10.0, -10.0, 2.0, 10.0)(F.col("geom")).alias("c")
    ).first()["c"]
    assert out1["part_offsets"] == [0, 1]


def test_measure_kernels_survive_empty_geometries(spark):
    """Regression (review r2): a trailing EMPTY geometry made reduceat's
    sentinel one short and crashed the whole Arrow batch; empty rows must
    yield 0/None like the scalar kernels did."""
    from pyspark.sql import functions as F

    from spatial.geometry import GEOMETRY
    from spatial.kernels import (st_area_udf, st_distance_udf, st_isvalid_udf,
                                 st_length_udf)

    square = {
        "gtype": 3, "srid": None, "has_z": False, "has_m": False,
        "xs": [0.0, 2.0, 2.0, 0.0, 0.0], "ys": [0.0, 0.0, 2.0, 2.0, 0.0],
        "zs": None, "ms": None, "ring_offsets": [0, 5], "part_offsets": [0, 1],
    }
    empty = {
        "gtype": 2, "srid": None, "has_z": False, "has_m": False,
        "xs": [], "ys": [], "zs": None, "ms": None,
        "ring_offsets": [0], "part_offsets": [0],
    }
    empty_ring = {  # decodable: second ring has zero points
        "gtype": 3, "srid": None, "has_z": False, "has_m": False,
        "xs": [0.0, 1.0, 1.0, 0.0], "ys": [0.0, 0.0, 1.0, 0.0],
        "zs": None, "ms": None, "ring_offsets": [0, 4, 4],
        "part_offsets": [0, 2],
    }
    df = spark.createDataFrame(
        [(1, square), (2, empty), (3, empty_ring)],
        f"id long, geom {GEOMETRY.simpleString()}")
    rows = {r["id"]: r for r in df.select(
        "id",
        st_area_udf()(F.col("geom")).alias("area"),
        st_length_udf()(F.col("geom")).alias("length"),
        st_isvalid_udf()(F.col("geom")).alias("ok"),
        st_distance_udf()(F.lit(5.0), F.lit(0.0), F.col("geom")).alias("d"),
    ).collect()}
    assert rows[1]["area"] == 4.0 and rows[1]["ok"] is True
    assert rows[1]["d"] == 3.0
    assert rows[2]["area"] == 0.0 and rows[2]["length"] == 0.0
    import math
    assert rows[2]["d"] is None or math.isnan(rows[2]["d"])
    assert rows[3]["ok"] is False  # zero-point ring fails the size check
