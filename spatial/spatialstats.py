"""Spatial statistics: Moran's I spatial autocorrelation in EXACT integer
pieces.

Moran's I over cell-aggregated counts answers the analyst question "are
high-count cells next to high-count cells?" (I > 0 clustered, ~0 random,
< 0 dispersed). The classic statistic

    I = (n / W) * sum_adj((c_i - mean)(c_j - mean)) / sum_i (c_i - mean)^2

has a float-fragile mean; multiplying through by n^2 removes it: with
v_i = n*c_i - S (S = sum of counts) every factor is an integer and

    I = (n / W) * NUM / DEN,  NUM = sum_adj v_i v_j,  DEN = sum_i v_i^2

so the engine returns the four BIGINT pieces (n_cells, w_pairs, num, den)
-- bit-exact cross-engine; the float division is the consumer's choice.

Population definition (documented contract): the OBSERVED cells -- unit
lon/lat grid cells containing at least one row -- with rook (4-neighbor)
adjacency between observed cells, each unordered pair counted twice in W
and NUM (the standard symmetric-weight convention, where W = sum_ij w_ij).

Scale shape: one groupBy(cell) count, one 4-offset explode + self
equi-join on the shifted key (observed-cell table sized, dim-like after
aggregation), two map-side-combinable sums. No all-pairs, no floats.
The reference (a geometry codec, src/Database/Postgis/*.hs) has no
statistics surface; this is training-data/GIS analytics mandated by the
engine's scope (SURVEY.md section 2.3 lineage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morans_i_pieces(df: DataFrame, x_col: Column | str,
                    y_col: Column | str, cell_size: float = 1.0) -> DataFrame:
    """One row (n_cells, w_pairs, num, den): the exact integer pieces of
    Moran's I for per-cell row counts of df at floor(x/cell_size),
    floor(y/cell_size). I = (n_cells / w_pairs) * (num / den) -- consumer
    divides. Pick cell_size so counts actually vary (cells of one point
    each make every centered v_i zero and the statistic degenerate)."""
    x = (F.col(x_col) if isinstance(x_col, str) else x_col) / float(cell_size)
    y = (F.col(y_col) if isinstance(y_col, str) else y_col) / float(cell_size)
    cells = (df.select(F.floor(x).alias("gx"), F.floor(y).alias("gy"))
             .groupBy("gx", "gy").agg(F.count("*").alias("c"))
             .persist())
    tot = cells.agg(F.sum("c").alias("S"),
                    F.count("*").alias("n")).collect()[0]
    S, n = int(tot["S"]), int(tot["n"])
    v = cells.select("gx", "gy",
                     (F.lit(n) * F.col("c") - F.lit(S)).alias("v"))
    nbrs = v.select(
        "v",
        F.explode(F.array(
            F.struct((F.col("gx") + 1).alias("nx"), F.col("gy").alias("ny")),
            F.struct((F.col("gx") - 1).alias("nx"), F.col("gy").alias("ny")),
            F.struct(F.col("gx").alias("nx"), (F.col("gy") + 1).alias("ny")),
            F.struct(F.col("gx").alias("nx"), (F.col("gy") - 1).alias("ny")),
        )).alias("nb")) \
        .select(F.col("v").alias("va"), F.col("nb.nx").alias("gx"),
                F.col("nb.ny").alias("gy"))
    adj = nbrs.join(v.select("gx", "gy", F.col("v").alias("vb")),
                    ["gx", "gy"])
    num_w = adj.agg(F.sum(F.col("va") * F.col("vb")).alias("num"),
                    F.count("*").alias("w_pairs")).collect()[0]
    den = v.agg(F.sum(F.col("v") * F.col("v")).alias("den")).collect()[0]
    cells.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, int(num_w["w_pairs"]), int(num_w["num"]), int(den["den"]))],
        "n_cells long, w_pairs long, num long, den long")


def local_moran_hotspots(df: DataFrame, x_col: Column | str,
                         y_col: Column | str, cell_size: float = 1.0,
                         k: int = 20) -> DataFrame:
    """Top-k LISA hotspot cells (Anselin's local Moran, integer form):
    per observed cell, local_num_i = v_i * sum of rook-neighbor v_j with
    v = n*c - S -- large positive = a high(low)-count cell surrounded by
    like cells, the hotspot/coldspot core. All-integer, so the top-k
    selection (local_num DESC, gx, gy tie-break) is deterministic and
    bit-exact cross-engine. Same physical shape as morans_i_pieces plus
    one exact top-k sort on the dim-sized cell table."""
    x = (F.col(x_col) if isinstance(x_col, str) else x_col) / float(cell_size)
    y = (F.col(y_col) if isinstance(y_col, str) else y_col) / float(cell_size)
    cells = (df.select(F.floor(x).alias("gx"), F.floor(y).alias("gy"))
             .groupBy("gx", "gy").agg(F.count("*").alias("c"))
             .persist())
    tot = cells.agg(F.sum("c").alias("S"),
                    F.count("*").alias("n")).collect()[0]
    S, n = int(tot["S"]), int(tot["n"])
    v = cells.select("gx", "gy",
                     (F.lit(n) * F.col("c") - F.lit(S)).alias("v"))
    nbrs = v.select(
        "gx", "gy",
        F.explode(F.array(
            F.struct((F.col("gx") + 1).alias("nx"), F.col("gy").alias("ny")),
            F.struct((F.col("gx") - 1).alias("nx"), F.col("gy").alias("ny")),
            F.struct(F.col("gx").alias("nx"), (F.col("gy") + 1).alias("ny")),
            F.struct(F.col("gx").alias("nx"), (F.col("gy") - 1).alias("ny")),
        )).alias("nb")) \
        .select("gx", "gy", F.col("nb.nx").alias("nx"),
                F.col("nb.ny").alias("ny"))
    nbr_sum = (nbrs.join(v.select(F.col("gx").alias("nx"),
                                  F.col("gy").alias("ny"),
                                  F.col("v").alias("vn")), ["nx", "ny"])
               .groupBy("gx", "gy").agg(F.sum("vn").alias("nbr_sum")))
    out = (v.join(nbr_sum, ["gx", "gy"])
           .select("gx", "gy", "v", "nbr_sum",
                   (F.col("v") * F.col("nbr_sum")).alias("local_num"))
           .orderBy(F.col("local_num").desc(), "gx", "gy")
           .limit(int(k)))
    cells.unpersist()
    return out


def local_moran_oracle_sql(src_sql: str, x_expr: str, y_expr: str,
                           cell_size: float = 1.0, k: int = 20) -> str:
    """DuckDB replay of local_moran_hotspots: identical transform +
    rook-neighbor sum + the same deterministic top-k ordering."""
    from .synth import sql_double

    cs = sql_double(float(cell_size))
    return f"""
WITH __rows AS ({src_sql}),
__cells AS (
  SELECT CAST(FLOOR({x_expr} / {cs}) AS BIGINT) AS gx,
         CAST(FLOOR({y_expr} / {cs}) AS BIGINT) AS gy,
         COUNT(*) AS c
  FROM __rows GROUP BY 1, 2),
__tot AS (SELECT CAST(SUM(c) AS BIGINT) AS S,
                 CAST(COUNT(*) AS BIGINT) AS n FROM __cells),
__v AS (
  SELECT gx, gy, CAST(t.n * c - t.S AS BIGINT) AS v
  FROM __cells, __tot t),
__ns AS (
  SELECT a.gx, a.gy, CAST(SUM(b.v) AS BIGINT) AS nbr_sum
  FROM __v a JOIN __v b
    ON (abs(a.gx - b.gx) = 1 AND a.gy = b.gy)
    OR (a.gx = b.gx AND abs(a.gy - b.gy) = 1)
  GROUP BY a.gx, a.gy)
SELECT v.gx, v.gy, v.v, ns.nbr_sum,
       CAST(v.v * ns.nbr_sum AS BIGINT) AS local_num
FROM __v v JOIN __ns ns ON ns.gx = v.gx AND ns.gy = v.gy
ORDER BY local_num DESC, v.gx, v.gy
LIMIT {int(k)}"""


def morans_i_oracle_sql(src_sql: str, x_expr: str, y_expr: str,
                        cell_size: float = 1.0) -> str:
    """DuckDB replay: identical cell aggregation, centered-integer
    transform, rook self-join and BIGINT sums over {src_sql} rows with
    coordinates {x_expr}/{y_expr}."""
    from .synth import sql_double

    cs = sql_double(float(cell_size))
    return f"""
WITH __rows AS ({src_sql}),
__cells AS (
  SELECT CAST(FLOOR({x_expr} / {cs}) AS BIGINT) AS gx,
         CAST(FLOOR({y_expr} / {cs}) AS BIGINT) AS gy,
         COUNT(*) AS c
  FROM __rows GROUP BY 1, 2),
__tot AS (SELECT CAST(SUM(c) AS BIGINT) AS S,
                 CAST(COUNT(*) AS BIGINT) AS n FROM __cells),
__v AS (
  SELECT gx, gy, CAST(t.n * c - t.S AS BIGINT) AS v
  FROM __cells, __tot t),
__adj AS (
  SELECT a.v AS va, b.v AS vb
  FROM __v a JOIN __v b
    ON (abs(a.gx - b.gx) = 1 AND a.gy = b.gy)
    OR (a.gx = b.gx AND abs(a.gy - b.gy) = 1))
SELECT (SELECT n FROM __tot) AS n_cells,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM __adj) AS w_pairs,
       (SELECT CAST(SUM(va * vb) AS BIGINT) FROM __adj) AS num,
       (SELECT CAST(SUM(v * v) AS BIGINT) FROM __v) AS den"""
