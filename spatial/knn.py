"""Grid-pruned k-nearest-neighbors via cell-disk expansion.

Net-new surface (BASELINE.json north_star: "grid-pruned kNN via cell-ring
expansion"); the reference's only gesture at this is the lexicographic
``Ord Point`` "for use in convex hull algorithm" comment
(/root/reference/src/Database/Postgis/Vector.hs:10-16).

Algorithm (SURVEY.md §2.1.6), sized for "big points table x broadcast-sized
query set" -- the shape that occurs in practice (reverse-geocode probes,
POI lookups):

1. index the points at a fixed cell level L once (persisted: every round
   reuses the same partitioned candidates, no re-scan);
2. the query set is collected to the driver (it is broadcast-sized by
   assumption) so round control costs zero Spark jobs;
3. rounds with DOUBLING Chebyshev radius r = 1, 2, 4, ...: explode each
   unresolved query to its cell disk, broadcast-join to the points, window
   top-k by great-circle distance -- exactly ONE Spark job per round;
4. a query resolves when it has >= k candidates whose kth distance is
   <= (r-1)/2^L * R_earth * SAFETY: any point outside disk r is at least
   (r-1) cell-min-spans away angularly (cells.cell_size_degrees bound), so
   nothing outside the disk can beat the current kth. SAFETY=0.9 absorbs the
   face-seam chart distortion of the linear st projection;
5. queries still unresolved after the radius budget fall back to one exact
   brute-force pass -- correctness is never sacrificed; at scale only
   queries in empty deserts pay it.

The per-round result sets are k rows per query (tiny), so they are collected
rather than unioned into an ever-deeper plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cells import cell_from_lonlat, neighbors_disk
from .kernels import EARTH_RADIUS_M, haversine_col, haversine_m

SAFETY = 0.9


def _index_points(points, point_x, point_y, point_id, level):
    from .cells import make_cell_of

    cell_of = make_cell_of(level)
    return points.select(
        F.col(point_id).alias("id"),
        F.col(point_x).alias("px"),
        F.col(point_y).alias("py"),
        cell_of(F.col(point_x), F.col(point_y)).alias("cell"),
    )


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
    init_r: int = 2,
) -> DataFrame:
    """Top-k nearest points per query: (query_id, id, rank, dist_m)."""
    spark = points.sparkSession
    pts = _index_points(points, point_x, point_y, point_id, level).persist()

    qrows = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_x).alias("qx"),
        F.col(query_y).alias("qy"),
    ).collect()
    if not qrows:
        pts.unpersist()
        return spark.createDataFrame([], "query_id long, id long, rank int, dist_m double")

    qids = np.asarray([r["query_id"] for r in qrows], dtype=np.int64)
    qx = np.asarray([r["qx"] for r in qrows], dtype=np.float64)
    qy = np.asarray([r["qy"] for r in qrows], dtype=np.float64)
    qcell = cell_from_lonlat(qx, qy, level)

    cell_span_m = EARTH_RADIUS_M / (1 << level)
    win = Window.partitionBy("query_id").orderBy(
        F.col("dist_m").asc(), F.col("id").asc())

    unresolved = np.arange(len(qids))
    results: dict[int, list] = {}

    # Start at r >= 2: the resolution guarantee is (r-1) cell spans, so an
    # r=1 round can NEVER resolve a query -- it would be a pure wasted job.
    r = max(2, init_r)
    for _ in range(max_rounds):
        # driver-side disk computation for the unresolved queries
        disks = neighbors_disk(qcell[unresolved], r)
        explode_rows = [
            (int(qids[qi]), float(qx[qi]), float(qy[qi]), int(c))
            for qi, d in zip(unresolved, disks)
            for c in d.astype(np.int64)
        ]
        exploded = spark.createDataFrame(
            explode_rows, "query_id long, qx double, qy double, cell long")
        topk = (
            pts.join(F.broadcast(exploded), "cell", "inner")
            .withColumn("dist_m", haversine_col(F.col("px"), F.col("py"),
                                                F.col("qx"), F.col("qy")))
            .withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select("query_id", "id", "rank", "dist_m")
            .collect()
        )
        by_q: dict[int, list] = {}
        for row in topk:
            by_q.setdefault(row["query_id"], []).append(row)
        guaranteed_m = (r - 1) * cell_span_m * SAFETY
        still = []
        for qi in unresolved:
            rows = by_q.get(int(qids[qi]), [])
            if len(rows) >= k and max(x["dist_m"] for x in rows) <= guaranteed_m:
                results[int(qids[qi])] = rows
            else:
                still.append(qi)
        unresolved = np.asarray(still, dtype=np.int64)
        if len(unresolved) == 0:
            break
        r *= 2

    if len(unresolved) > 0:
        brute_q = spark.createDataFrame(
            [(int(qids[i]), float(qx[i]), float(qy[i])) for i in unresolved],
            "query_id long, qx double, qy double")
        brute = (
            pts.crossJoin(F.broadcast(brute_q))
            .withColumn("dist_m", haversine_col(F.col("px"), F.col("py"),
                                                F.col("qx"), F.col("qy")))
            .withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select("query_id", "id", "rank", "dist_m")
            .collect()
        )
        for row in brute:
            results.setdefault(row["query_id"], []).append(row)

    pts.unpersist()
    flat = [(qid, row["id"], row["rank"], row["dist_m"])
            for qid, rows in results.items() for row in rows]
    return spark.createDataFrame(
        flat, "query_id long, id long, rank int, dist_m double")


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int, **cols) -> DataFrame:
    """Exact reference implementation (test oracle; also the right plan when
    the query side is trivially small)."""
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
