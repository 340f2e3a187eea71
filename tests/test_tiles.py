import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from spatial.tiles import tile_assign, tile_assign_oracle_sql


def _slippy(lon, lat, z):
    """Independent closed-form oracle (OSM wiki formula)."""
    n = 2 ** z
    lat = min(max(lat, -85.05112878), 85.05112878)
    tx = int(min(max(math.floor((lon + 180.0) / 360.0 * n), 0), n - 1))
    lr = math.radians(lat)
    ty = int(min(max(math.floor((1.0 - math.asinh(math.tan(lr)) / math.pi) / 2.0 * n), 0), n - 1))
    return tx, ty


def test_tile_assign_matches_formula(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "lon": np.concatenate([rng.uniform(-180, 180, 500), [-180.0, 180.0, 0.0]]),
        "lat": np.concatenate([rng.uniform(-90, 90, 500), [90.0, -90.0, 0.0]]),
    })
    for z in (0, 4, 12):
        df = tile_assign(spark.createDataFrame(pdf), "lon", "lat", z)
        rows = df.select("lon", "lat", "tile_x", "tile_y").collect()
        for r in rows:
            tx, ty = _slippy(r["lon"], r["lat"], z)
            assert (r["tile_x"], r["tile_y"]) == (tx, ty), (r["lon"], r["lat"], z)


def test_oracle_sql_matches_spark(spark):
    """The DuckDB-oracle SQL text must agree with the Spark columns exactly
    (this is the same pairing the driver checks in CORRECTNESS_r{N}.json)."""
    rng = np.random.default_rng(12)
    pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, 1000),
                        "lat": rng.uniform(-88, 88, 1000)})
    z = 10
    df = tile_assign(spark.createDataFrame(pdf), "lon", "lat", z)
    spark_rows = sorted((r["tile_x"], r["tile_y"]) for r in df.collect())
    txe, tye = tile_assign_oracle_sql("lon", "lat", z)
    duck = duckdb.connect()
    duck.register("pts", pdf)
    duck_rows = sorted(duck.sql(f"SELECT {txe} AS tx, {tye} AS ty FROM pts").fetchall())
    assert spark_rows == duck_rows


def test_tile_assign_stays_jvm_side(spark):
    """No Python/Arrow eval in the plan -- tile math must be codegen'd."""
    pdf = pd.DataFrame({"lon": [1.0], "lat": [2.0]})
    df = tile_assign(spark.createDataFrame(pdf), "lon", "lat", 8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_tile_cover_matches_per_point_assignment(spark):
    """Every tile that any vertex of the polygon maps to must appear in the
    polygon's tile_cover (bbox cover is a superset of vertex tiles)."""
    import math

    from spatial import polygon
    from spatial.geometry import GEOMETRY
    from spatial.tiles import tile_cover

    ring = [(-10.0, -5.0), (25.0, -5.0), (25.0, 20.0), (-10.0, 20.0),
            (-10.0, -5.0)]
    g = polygon([ring], srid=4326)
    from pyspark.sql.types import LongType, StructField, StructType
    df = spark.createDataFrame(
        [(1, g.as_row())],
        StructType([StructField("id", LongType()), StructField("geom", GEOMETRY)]))
    got = {(r["tile_x"], r["tile_y"])
           for r in tile_cover(df, "geom", 4).collect()}

    def slippy(lon, lat, z):
        n = 2 ** z
        tx = min(max(int(math.floor((lon + 180) / 360 * n)), 0), n - 1)
        lr = math.radians(max(min(lat, 85.05112878), -85.05112878))
        ty = min(max(int(math.floor(
            (1 - math.asinh(math.tan(lr)) / math.pi) / 2 * n)), 0), n - 1)
        return tx, ty

    for lon, lat in ring:
        assert slippy(lon, lat, 4) in got
    # cover is exactly the bbox tile rectangle
    txs = sorted({t[0] for t in got})
    tys = sorted({t[1] for t in got})
    assert txs == list(range(txs[0], txs[-1] + 1))
    assert tys == list(range(tys[0], tys[-1] + 1))
    assert len(got) == len(txs) * len(tys)
