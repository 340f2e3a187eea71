"""Grid-pruned k-nearest-neighbors via cell-disk expansion.

Net-new surface (BASELINE.json north_star: "grid-pruned kNN via cell-ring
expansion"); the reference's only gesture at this is the lexicographic
``Ord Point`` "for use in convex hull algorithm" comment
(/root/reference/src/Database/Postgis/Vector.hs:10-16).

Algorithm (bounded driver-side loop of DataFrame ops, SURVEY.md §2.1.6):

1. index both sides at a fixed cell level L;
2. round r = 1, 2, ...: explode each *unresolved* query to its Chebyshev
   cell disk of radius r, equi-join to points on cell, take per-query top-k
   by great-circle distance (window row_number);
3. a query resolves when it has >= k candidates AND its kth distance is
   <= (r-1)/2^L * R_earth * SAFETY: any point outside disk r is at least
   (r-1) cell-min-spans away angularly (cells.cell_size_degrees bound), so
   nothing outside the disk can beat the current kth. SAFETY=0.9 absorbs the
   face-seam chart distortion of the linear st projection;
4. queries still unresolved after max_rounds fall back to an exact
   brute-force crossJoin -- correctness is never sacrificed, and at scale
   only a vanishing tail (queries in empty deserts) pays it.

At 100TB the probe side (points) is the big table and never moves except one
hash exchange on cell; the exploded query side is small and explicitly
broadcast, so every round is a broadcast hash join + one window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .cells import cell_from_lonlat, make_cell_of, neighbors_disk
from .kernels import EARTH_RADIUS_M, haversine_col

SAFETY = 0.9


def _make_disk_udf(r: int):
    @pandas_udf(ArrayType(LongType()))
    def disk_udf(cell: pd.Series) -> pd.Series:
        disks = neighbors_disk(cell.to_numpy(np.int64).astype(np.uint64), r)
        return pd.Series([d.astype(np.int64).tolist() for d in disks])

    return disk_udf


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    level: int = 8,
    point_x: str = "x",
    point_y: str = "y",
    point_id: str = "id",
    query_x: str = "qx",
    query_y: str = "qy",
    query_id: str = "query_id",
    max_rounds: int = 4,
) -> DataFrame:
    """Top-k nearest points per query: (query_id, id, rank, dist_m)."""
    spark = points.sparkSession
    cell_of = make_cell_of(level)
    pts = points.select(
        F.col(point_id).alias("id"),
        F.col(point_x).alias("px"),
        F.col(point_y).alias("py"),
        cell_of(F.col(point_x), F.col(point_y)).alias("cell"),
    )
    qrs = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_x).alias("qx"),
        F.col(query_y).alias("qy"),
        cell_of(F.col(query_x), F.col(query_y)).alias("qcell"),
    )

    cell_span_m = EARTH_RADIUS_M / (1 << level)  # lower bound per cell step
    win = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("id").asc())

    unresolved = qrs
    resolved_parts: list[DataFrame] = []

    for r in range(1, max_rounds + 1):
        if unresolved.isEmpty():
            break
        disk_udf = _make_disk_udf(r)
        exploded = unresolved.withColumn("cell", F.explode(disk_udf("qcell")))
        cand = pts.join(F.broadcast(exploded), "cell", "inner")
        scored = cand.withColumn(
            "dist_m",
            haversine_col(F.col("px"), F.col("py"), F.col("qx"), F.col("qy")),
        )
        topk = (
            scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
        )
        guaranteed_m = (r - 1) * cell_span_m * SAFETY
        stats = topk.groupBy("query_id").agg(
            F.count("*").alias("n"), F.max("dist_m").alias("kth")
        )
        done_ids = stats.where(
            (F.col("n") >= k) & (F.col("kth") <= F.lit(guaranteed_m))
        ).select("query_id")
        done_rows = topk.join(F.broadcast(done_ids), "query_id", "left_semi")
        resolved_parts.append(
            done_rows.select("query_id", "id", "rank", "dist_m").persist()
        )
        resolved_parts[-1].count()
        unresolved = unresolved.join(F.broadcast(done_ids), "query_id", "left_anti")

    # exact fallback for the unresolved tail
    if not unresolved.isEmpty():
        brute = (
            pts.crossJoin(F.broadcast(unresolved.select("query_id", "qx", "qy")))
            .withColumn("dist_m", haversine_col(F.col("px"), F.col("py"),
                                                F.col("qx"), F.col("qy")))
            .withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select("query_id", "id", "rank", "dist_m")
        )
        resolved_parts.append(brute)

    if not resolved_parts:
        return spark.createDataFrame([], "query_id long, id long, rank int, dist_m double")
    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)
    return out


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int, **cols) -> DataFrame:
    """Exact reference implementation (used as the test oracle and as the
    right plan when the query side is trivially small)."""
    point_x = cols.get("point_x", "x")
    point_y = cols.get("point_y", "y")
    point_id = cols.get("point_id", "id")
    query_x = cols.get("query_x", "qx")
    query_y = cols.get("query_y", "qy")
    query_id = cols.get("query_id", "query_id")
    win = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("id").asc())
    return (
        points.select(F.col(point_id).alias("id"), F.col(point_x).alias("px"),
                      F.col(point_y).alias("py"))
        .crossJoin(F.broadcast(queries.select(
            F.col(query_id).alias("query_id"), F.col(query_x).alias("qx"),
            F.col(query_y).alias("qy"))))
        .withColumn("dist_m", haversine_col(F.col("px"), F.col("py"),
                                            F.col("qx"), F.col("qy")))
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rank", "dist_m")
    )
