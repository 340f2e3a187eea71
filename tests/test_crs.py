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
