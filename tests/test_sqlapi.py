"""spark.sql surface: the registered functions compute the same values as
the DataFrame API (same kernels underneath)."""

from pyspark.sql import functions as F

from spatial.ewkb import encode_hex
from spatial.geometry import GEOMETRY, polygon
from spatial.sqlapi import register_sql_functions


def test_sql_surface_end_to_end(spark):
    names = register_sql_functions(spark)
    assert {"st_geomfromewkb", "st_area", "st_isvalid", "st_cell_10"} <= set(names)

    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (0.0, 0.0)]
    hx = encode_hex(polygon([ring], srid=4326))
    spark.createDataFrame([(1, hx)], "id long, hex string") \
        .createOrReplaceTempView("shapes_hex")

    row = spark.sql("""
        SELECT st_area(g) AS area, st_isvalid(g) AS ok,
               st_srid, st_astext(g) AS wkt, st_asewkb(g) AS rehex
        FROM (SELECT st_geomfromewkb(hex) AS g, st_geomfromewkb(hex).srid AS st_srid
              FROM shapes_hex)
    """).first()
    assert row["area"] == 12.0
    assert row["ok"] is True
    assert row["st_srid"] == 4326
    assert row["wkt"].startswith("SRID=4326;POLYGON")
    assert row["rehex"] == hx

    # cell assignment from SQL == the DataFrame kernel
    pts = spark.range(100).select(
        ((F.col("id") * 7919 % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 17000).cast("double") / 100.0 - 85.0).alias("lat"))
    pts.createOrReplaceTempView("pts")
    from spatial.cells import cell_from_lonlat
    got = {(r["lon"], r["lat"]): r["c"] for r in
           spark.sql("SELECT lon, lat, st_cell_10(lon, lat) AS c FROM pts").collect()}
    for (lon, lat), c in got.items():
        assert int(cell_from_lonlat(lon, lat, 10)[0].astype("int64")) == c
