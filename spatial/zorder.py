"""Z-order (Morton) storage-layout keys: multi-dimensional clustering for
the 100-TB write path.

At petabyte scale the dominant cost of a spatial workload is the SCAN, and
the scan is won or lost at write time: rows laid out in (lon, lat) Z-order
put spatially-near points in the same parquet files/row groups, so min/max
column statistics prune most of the table for any bbox/cell predicate --
the same mechanism as Delta Lake's OPTIMIZE ZORDER BY and Iceberg's
sort-order clustering, built here from first principles (public technique:
Morton 1966; Bayer's UB-tree).

Relationship to ``spatial/cells.py``: cell ids are S2-style face/uv quadkeys
used as JOIN keys; the z-key here is a plain equirectangular Morton
interleave used as a SORT/LAYOUT key. Both share the bit-interleave idea;
the z-key skips the cube-face projection because a layout key only needs
locality, not equal-area cells or ring arithmetic.

Reference scope note: the reference (haskell-postgis, src/Database/Postgis/
Serialize.hs) is a codec library with no storage layer; this module is part
of the engine's scale mandate (SURVEY.md section 2.3: cell-prefix range
partitioning).

Float-parity policy: quantization is add / divide / multiply / floor in a
fixed op order, replayed verbatim in the DuckDB oracle -- bit-identical on
integer-derived coordinates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quant(coord: Column, lo: float, span: float, n: int) -> Column:
    """floor((coord - lo) / span * n) clamped to [0, n-1] -- one add, one
    divide, one multiply, one floor (the oracle replays the same ops)."""
    q = F.floor((coord - F.lit(lo)) / F.lit(span) * F.lit(float(n)))
    return F.least(F.greatest(q, F.lit(0)), F.lit(n - 1)).cast("long")


def zkey_col(lon: Column, lat: Column, level: int = 12) -> Column:
    """(lon, lat) -> Z-order key: ``level``-bit quantization per axis,
    Morton-interleaved (lon bits in the odd/higher positions, matching
    cells.morton_encode's (i, j) convention). Pure JVM column math,
    whole-stage codegen, zero Python."""
    n = 1 << level
    x = _quant(lon, -180.0, 360.0, n)
    y = _quant(lat, -90.0, 180.0, n)
    z = F.lit(0).cast("long")
    for b in range(level):
        z = (z
             .bitwiseOR(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)),
                                    2 * b + 1))
             .bitwiseOR(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)),
                                    2 * b)))
    return z


def with_zkey(df: DataFrame, lon_col, lat_col, level: int = 12,
              out_col: str = "zkey") -> DataFrame:
    """df -> df + z-key column, quantized coords staged as named columns
    (same CollapseProject rationale as cells.with_cell: the Morton fold
    references each quantized axis ``level`` times)."""
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    n = 1 << level
    s1 = df.withColumns({
        "__zo_x": _quant(lon, -180.0, 360.0, n),
        "__zo_y": _quant(lat, -90.0, 180.0, n),
    })
    x, y = F.col("__zo_x"), F.col("__zo_y")
    z = F.lit(0).cast("long")
    for b in range(level):
        z = (z
             .bitwiseOR(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)),
                                    2 * b + 1))
             .bitwiseOR(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)),
                                    2 * b)))
    return s1.withColumn(out_col, z).drop("__zo_x", "__zo_y")


def write_zordered(df: DataFrame, path: str, lon_col: str, lat_col: str,
                   level: int = 12, n_files: int = 8,
                   key_col: str = "zkey") -> None:
    """Write ``df`` as parquet clustered by z-key: repartitionByRange on
    the key (files own DISJOINT key ranges -> file-level skipping) +
    sortWithinPartitions (row groups within a file own narrow ranges ->
    row-group skipping via parquet min/max stats). This is the whole
    OPTIMIZE ZORDER mechanism; at 100 TB the reader's bbox predicate
    becomes a z-range union and the scan touches only overlapping files."""
    (with_zkey(df, lon_col, lat_col, level, key_col)
     .repartitionByRange(n_files, F.col(key_col))
     .sortWithinPartitions(key_col)
     .write.mode("overwrite").parquet(path))


def zkey_oracle_sql(lon_sql: str, lat_sql: str, level: int = 12) -> str:
    """DuckDB replay of zkey_col: identical quantization op order, the
    Morton interleave expanded bit-by-bit over BIGINT."""
    n = 1 << level

    def quant(expr: str, lo: float, span: float) -> str:
        q = f"FLOOR((({expr}) - ({lo})) / ({span}) * {float(n)})"
        return f"CAST(LEAST(GREATEST({q}, 0), {n - 1}) AS BIGINT)"

    x = quant(lon_sql, -180.0, 360.0)
    y = quant(lat_sql, -90.0, 180.0)
    terms = []
    for b in range(level):
        terms.append(f"(((__zx >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"(((__zy >> {b}) & 1) << {2 * b})")
    return (f"SELECT *, ({' | '.join(terms)}) AS zkey "
            f"FROM (SELECT *, {x} AS __zx, {y} AS __zy FROM __zo_in)")
