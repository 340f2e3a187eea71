"""Geohash encoding (PostGIS ``ST_GeoHash`` analog) as pure-JVM column
math -- no UDF, whole-stage codegen end to end.

Geohash (public spec, Niemeyer 2008; also PostGIS ST_GeoHash,
postgis/lwgeom_export.c) interleaves quantized longitude/latitude bits --
starting with longitude -- and renders 5-bit groups in a base-32 alphabet
that omits a,i,l,o.  Cell prefixes nest: the first p characters of a
(p+1)-char geohash are the parent cell, so geohash columns range-partition
and prefix-rollup exactly like the engine's S2-style cells
(spatial/cells.py), with string ordering = Z-order locality.

Implementation: quantize ``lon_q = floor((lon+180) * (2^b_lon/360))``
(clamped), likewise lat; spread bits with the Morton magic-number shifts
(the cells.py discipline -- staged pure-JVM projections, no Python);
OR the spread halves together; slice 5-bit groups into alphabet chars.

Cross-engine exactness (oracle policy): the quantization is one add and
one multiply of IEEE doubles -- deterministic, identical in Spark and
DuckDB when written in the same operation order (no sums, no
transcendentals); everything after the floor is integer bit arithmetic,
replayed verbatim in BIGINT SQL by :func:`geohash_oracle_sql`.

100 TB shape: a handful of staged projections per row, zero shuffles,
zero Python; the output column is a natural range-partitioning /
clustering key (``repartitionByRange(geohash)`` co-locates spatial
neighborhoods for downstream joins, same as cluster_by_cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Morton spread constants for 32->64 bit interleave (public magic numbers,
# same family cells.py uses for the S2 curve)
_SPREAD = [
    (32, 0x00000000FFFFFFFF),
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(col: Column) -> Column:
    """Insert a zero bit between consecutive bits of a <=32-bit value
    (Morton spread), as a chain of shift/mask stages."""
    x = col
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _spread_bits_sql(expr: str) -> str:
    x = expr
    for shift, mask in _SPREAD:
        x = f"((({x}) | (({x}) << {shift})) & {mask})"
    return x


def geohash_col(lon: Column, lat: Column, precision: int = 9) -> Column:
    """Geohash string of ``precision`` chars (<= 12).  Pure column math."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    total = 5 * precision
    b_lon = (total + 1) // 2          # lon takes the even (first) bits
    b_lat = total // 2
    lon_q = F.least(
        F.lit((1 << b_lon) - 1),
        F.greatest(F.lit(0), F.floor(
            (lon + F.lit(180.0)) * F.lit(float(1 << b_lon) / 360.0))),
    ).cast("long")
    lat_q = F.least(
        F.lit((1 << b_lat) - 1),
        F.greatest(F.lit(0), F.floor(
            (lat + F.lit(90.0)) * F.lit(float(1 << b_lat) / 180.0))),
    ).cast("long")
    # Interleave MSB-first starting with lon.  Working LSB-up: for even
    # total the last (LSB) bit is lat[0], so lat bit j sits at position 2j
    # and lon bit j at 2j+1; for odd total lon has one extra bit and the
    # LSB is lon[0], so the parities swap.
    if total % 2 == 0:
        h = F.shiftleft(_spread_bits(lon_q), 1).bitwiseOR(
            _spread_bits(lat_q))
    else:
        h = _spread_bits(lon_q).bitwiseOR(
            F.shiftleft(_spread_bits(lat_q), 1))
    alphabet = F.lit(list(BASE32))     # element_at: robust to int-only
    chars = [                          # substring signatures across versions
        F.element_at(alphabet,
                     (F.shiftright(h, 5 * (precision - 1 - c))
                      .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lon: str, lat: str, precision: int = 9) -> str:
    """The identical computation in DuckDB SQL (same operation order)."""
    from .synth import sql_double

    total = 5 * precision
    b_lon = (total + 1) // 2
    b_lat = total // 2
    klon = sql_double(float(1 << b_lon) / 360.0)
    klat = sql_double(float(1 << b_lat) / 180.0)
    lon_q = (f"CAST(LEAST({(1 << b_lon) - 1}, GREATEST(0, "
             f"FLOOR((({lon}) + 180.0) * {klon}))) AS BIGINT)")
    lat_q = (f"CAST(LEAST({(1 << b_lat) - 1}, GREATEST(0, "
             f"FLOOR((({lat}) + 90.0) * {klat}))) AS BIGINT)")
    if total % 2 == 0:
        h = (f"((({_spread_bits_sql(lon_q)}) << 1) | "
             f"({_spread_bits_sql(lat_q)}))")
    else:
        h = (f"(({_spread_bits_sql(lon_q)}) | "
             f"(({_spread_bits_sql(lat_q)}) << 1))")
    chars = [
        f"SUBSTRING('{BASE32}', "
        f"CAST(((({h}) >> {5 * (precision - 1 - c)}) & 31) + 1 AS INT), 1)"
        for c in range(precision)
    ]
    return " || ".join(chars)


def with_geohash(df: DataFrame, lon_col: str, lat_col: str,
                 precision: int = 9, out_col: str = "geohash") -> DataFrame:
    """Staged-projection form (the cells.with_cell discipline): each Morton
    stage is one select over named columns, so the analyzed plan stays
    linear in stages instead of 2^stages leaf copies -- and the expression
    Catalyst sees per stage is small (the constraint-propagation hazard
    documented in CLAUDE.md)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    total = 5 * precision
    b_lon = (total + 1) // 2
    b_lat = total // 2
    keep = df.columns
    out = df.withColumn("__ghx", F.least(
        F.lit((1 << b_lon) - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col(lon_col) + F.lit(180.0))
            * F.lit(float(1 << b_lon) / 360.0)))).cast("long"))
    out = out.withColumn("__ghy", F.least(
        F.lit((1 << b_lat) - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col(lat_col) + F.lit(90.0))
            * F.lit(float(1 << b_lat) / 180.0)))).cast("long"))
    for shift, mask in _SPREAD:
        out = out.withColumn(
            "__ghx", F.col("__ghx").bitwiseOR(
                F.shiftleft(F.col("__ghx"), shift)).bitwiseAND(F.lit(mask)))
        out = out.withColumn(
            "__ghy", F.col("__ghy").bitwiseOR(
                F.shiftleft(F.col("__ghy"), shift)).bitwiseAND(F.lit(mask)))
    if total % 2 == 0:
        h = F.shiftleft(F.col("__ghx"), 1).bitwiseOR(F.col("__ghy"))
    else:
        h = F.col("__ghx").bitwiseOR(F.shiftleft(F.col("__ghy"), 1))
    out = out.withColumn("__ghh", h)
    alphabet = F.lit(list(BASE32))
    chars = [
        F.element_at(alphabet,
                     (F.shiftright(F.col("__ghh"), 5 * (precision - 1 - c))
                      .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for c in range(precision)
    ]
    return (out.withColumn(out_col, F.concat(*chars))
            .select(*keep, out_col))


def geohash_oracle_sql(table_sql: str, lon: str, lat: str,
                       precision: int = 9,
                       extra_cols: str = "") -> str:
    """CTE-staged replay (one CTE per Morton stage -- the string form of
    the staged projections above, avoiding 2^stages expression blowup).
    ``extra_cols`` (e.g. ``"url, "``) are carried through every stage."""
    from .synth import sql_double

    total = 5 * precision
    b_lon = (total + 1) // 2
    b_lat = total // 2
    klon = sql_double(float(1 << b_lon) / 360.0)
    klat = sql_double(float(1 << b_lat) / 180.0)
    ctes = [f"""__gh0 AS (
  SELECT {extra_cols}
    CAST(LEAST({(1 << b_lon) - 1}, GREATEST(0,
      FLOOR((({lon}) + 180.0) * {klon}))) AS BIGINT) AS x,
    CAST(LEAST({(1 << b_lat) - 1}, GREATEST(0,
      FLOOR((({lat}) + 90.0) * {klat}))) AS BIGINT) AS y
  FROM ({table_sql}) __ghsrc)"""]
    for i, (shift, mask) in enumerate(_SPREAD, 1):
        ctes.append(f"""__gh{i} AS (
  SELECT {extra_cols}
    ((x | (x << {shift})) & {mask}) AS x,
    ((y | (y << {shift})) & {mask}) AS y
  FROM __gh{i - 1})""")
    last = f"__gh{len(_SPREAD)}"
    h = "((x << 1) | y)" if total % 2 == 0 else "(x | (y << 1))"
    chars = " || ".join(
        f"SUBSTRING('{BASE32}', "
        f"CAST(((h >> {5 * (precision - 1 - c)}) & 31) + 1 AS INT), 1)"
        for c in range(precision))
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
__ghh AS (SELECT {extra_cols} {h} AS h FROM {last})
SELECT {extra_cols} {chars} AS geohash FROM __ghh"""
