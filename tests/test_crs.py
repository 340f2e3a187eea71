"""4326 <-> 3857 reprojection: known anchors + round-trip identity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spatial.crs import MERC_MAX_LAT, R_3857, st_transform


def test_known_anchors(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (180.0, 0.0), (0.0, MERC_MAX_LAT)], "lon double, lat double")
    x, y = st_transform(F.col("lon"), F.col("lat"), 4326, 3857)
    rows = df.select(x.alias("x"), y.alias("y")).collect()
    # y(0) carries tan(pi/4) != 1 float residue: sub-nanometre, not zero
    assert rows[0]["x"] == 0.0 and abs(rows[0]["y"]) < 1e-6
    assert abs(rows[1]["x"] - np.pi * R_3857) < 1e-6       # 20037508.34
    # the Mercator square: at the clamp latitude, y == x_max
    assert abs(rows[2]["y"] - np.pi * R_3857) < 1.0


def test_roundtrip_identity(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "lon": rng.uniform(-180, 180, 500),
        "lat": rng.uniform(-MERC_MAX_LAT, MERC_MAX_LAT, 500),
    })
    df = spark.createDataFrame(pdf)
    x, y = st_transform(F.col("lon"), F.col("lat"), 4326, 3857)
    lon2, lat2 = st_transform(x, y, 3857, 4326)
    out = df.select(
        (F.abs(lon2 - F.col("lon"))).alias("dlon"),
        (F.abs(lat2 - F.col("lat"))).alias("dlat"),
    ).agg(F.max("dlon"), F.max("dlat")).first()
    assert out[0] < 1e-9 and out[1] < 1e-9


def test_identity_and_unsupported():
    c = F.lit(1.0)
    assert st_transform(c, c, 4326, 4326) == (c, c)
    with pytest.raises(ValueError):
        st_transform(c, c, 4326, 27700)


def test_st_transform_geom_roundtrip(spark):
    """Geometry-struct transform: 4326 -> 3857 -> 4326 round-trips every
    vertex of a polygon (pure JVM array transform; srid restamped)."""
    from pyspark.sql import functions as F

    from spatial.crs import st_transform_geom
    from spatial.geometry import GEOMETRY, polygon

    ring = [(-118.25, 34.05), (-118.0, 34.05), (-118.0, 34.3),
            (-118.25, 34.3), (-118.25, 34.05)]
    g = polygon([ring], srid=4326)
    df = spark.createDataFrame([(1, g.as_row())],
                               f"id long, geom {GEOMETRY.simpleString()}")
    out = df.select(
        st_transform_geom(
            st_transform_geom(F.col("geom"), 4326, 3857), 3857, 4326
        ).alias("g"),
        st_transform_geom(F.col("geom"), 4326, 3857).alias("m"))
    row = out.first()
    assert row["m"]["srid"] == 3857
    assert row["g"]["srid"] == 4326
    for got, want in zip(row["g"]["xs"], [p[0] for p in ring]):
        assert abs(got - want) < 1e-9
    for got, want in zip(row["g"]["ys"], [p[1] for p in ring]):
        assert abs(got - want) < 1e-9
    assert list(row["g"]["ring_offsets"]) == [0, 5]
    # plan stays JVM-side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
