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
