"""PostGIS-over-JDBC geometry I/O: the reference's actual use case.

haskell-postgis exists to round-trip geometry columns through
postgresql-simple (`ToField Geometry` writes `writeGeometry`'s hex EWKB
inline into the SQL; `FromField Geometry` feeds the returned field bytes to
`readGeometry` -- /root/reference/README.md:13-34). This module is the
engine's analog at DataFrame granularity:

* PostGIS's wire convention for geometry in the TEXT protocol is exactly the
  hex-EWKB string this engine's codec produces/consumes, so the JDBC
  boundary is a pair of column transforms:
      write:  GEOMETRY struct -> ewkb_encode -> string column  (PostGIS
              ingests a hex-EWKB literal into a geometry column directly)
      read:   string column   -> ewkb_decode -> GEOMETRY struct
* ``write_jdbc``/``read_jdbc`` wire those transforms to spark.jdbc. No JDBC
  driver jar (or PostGIS extension) exists in this sandbox, so that exact
  path raises a clear error if the driver is missing; the FIELD-LEVEL
  contract (what bytes cross the boundary, both directions, all six kinds,
  Z/M/SRID) is pinned two ways: tests/test_pg.py against the codec -- the
  same boundary the reference's GeoSpec golden fixtures pin (reference
  tests/GeoSpec.hs:17-44) -- and tests/test_pg_live.py through a REAL
  PostgreSQL 15 server (initdb'd per-run; hex-EWKB INSERTed and SELECTed
  back byte-identically, NULL fields -> null structs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ewkb import ewkb_decode, ewkb_encode


def to_pg_field(geom_col) -> F.Column:
    """GEOMETRY struct column -> the exact field text postgresql ingests
    into a PostGIS geometry column (hex EWKB, reference ToField's
    `writeGeometry` output, README.md:28-29)."""
    return ewkb_encode(geom_col)


def from_pg_field(field_col) -> F.Column:
    """PostGIS geometry field text (hex EWKB as returned by the text
    protocol / JDBC getString) -> GEOMETRY struct (reference FromField's
    `readGeometry`, README.md:31-34). Malformed fields decode to null rows
    rather than erroring (the reference `error`s on NULL fields)."""
    return ewkb_decode(field_col)


def write_jdbc(df: DataFrame, url: str, table: str, geom_col: str = "geom",
               mode: str = "append", **options) -> None:
    """Write a DataFrame with a GEOMETRY struct column to a JDBC table,
    shipping the geometry as hex EWKB text (PostGIS casts it on ingest --
    `INSERT ... VALUES ('0101000020E6100000...')` is valid for geometry
    columns). Requires a JDBC driver on the Spark classpath."""
    out = df.withColumn(geom_col, to_pg_field(F.col(geom_col)))
    out.write.format("jdbc").option("url", url).option("dbtable", table) \
        .options(**options).mode(mode).save()


def read_jdbc(spark, url: str, table: str, geom_col: str = "geom",
              **options) -> DataFrame:
    """Read a JDBC table whose ``geom_col`` is a PostGIS geometry column,
    decoding it to the GEOMETRY struct. Pushdown note: pass a subquery as
    ``table`` (e.g. ``(SELECT id, geom::text AS geom FROM t WHERE ...) q``)
    so the server renders hex text and filters before shipping rows."""
    df = spark.read.format("jdbc").option("url", url) \
        .option("dbtable", table).options(**options).load()
    return df.withColumn(geom_col, from_pg_field(F.col(geom_col)))
