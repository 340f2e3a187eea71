"""Grid-based DBSCAN: exact density clustering as relational algebra.

The classic density-based spatial clustering (Ester et al. 1996) in its
deterministic formulation, composed entirely from operators the engine
already proves out:

  1. eps-grid assign: cell = (floor(x/eps), floor(y/eps)) -- pure JVM.
  2. neighbor pairs: each point probes its 3x3 neighbor cells and
     equi-joins against points indexed by their OWN cell, then the exact
     dist_sq <= eps^2 refine (mul/add only -- bit-exact cross-engine). A
     directed pair (a, b) matches in exactly one probe cell (b's own), so
     no dedup shuffle is needed; the candidate volume is bounded by local
     density x n -- the same sweep-line-style invariant as the spatial
     join's cover-cells plan (MR-DBSCAN's published grid shape).
  3. core points: |eps-neighbors| + 1 >= min_pts (the classic counting
     INCLUDING the point itself; min_pts >= 2 required, so every core has
     an edge unless all its neighbors are border -- singleton-core
     components get their own id as label).
  4. clusters: connected components over CORE-CORE edges via the proven
     log-round pointer-jumping CC (datapipe/cluster.py) -- cluster_id =
     component-minimum core id, a deterministic canonical label.
  5. border points: non-core with >= 1 core eps-neighbor join the MIN of
     their core neighbors' cluster ids (textbook DBSCAN is
     scan-order-dependent here; the min rule is the deterministic
     refinement, same spirit as every other tie-break in the engine).
     Noise (neither core nor border) is dropped.

Exactness: with fixture coordinates shared as literals and eps/min_pts
integers-or-exact-decimals, every comparison (dist_sq <= eps^2, counts,
mins) is bit-identical in DuckDB, so the whole clustering -- ids, labels,
core flags -- replays exactly (dbscan_oracle_sql).

Scale shape (100 TB): shuffles are the cell equi-join (key = cell), one
count aggregate, and the CC loop's (id, label) rounds -- all keyed, all
map-side combinable where applicable; no all-pairs anywhere. Skewed hot
cells fall under AQE skew handling like every other keyed join. The
reference serializes the Point model this clusters (Geometry.hs:33-41)
but has no analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .datapipe.cluster import connected_components


def eps_neighbor_pairs(points: DataFrame, eps: float,
                       id_col: str = "id", x_col: str = "x",
                       y_col: str = "y") -> DataFrame:
    """Directed exact eps-neighbor pairs (ia, ib), ia != b, each exactly
    once: 3x3 grid-cell probe join + dist_sq refine, all pure JVM."""
    eps = float(eps)
    p = points.select(
        F.col(id_col).alias("__id"), F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        F.floor(F.col(x_col) / eps).alias("__cx"),
        F.floor(F.col(y_col) / eps).alias("__cy"))
    probe = (p.select(
        "__id", "__x", "__y",
        F.explode(F.array(*[
            F.struct((F.col("__cx") + dx).alias("nx"),
                     (F.col("__cy") + dy).alias("ny"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("__nb"))
        .select("__id", "__x", "__y",
                F.col("__nb.nx").alias("__cx"), F.col("__nb.ny").alias("__cy")))
    build = p.select(F.col("__id").alias("__ib"), F.col("__x").alias("__xb"),
                     F.col("__y").alias("__yb"), "__cx", "__cy")
    dx = F.col("__x") - F.col("__xb")
    dy = F.col("__y") - F.col("__yb")
    return (probe.join(build, ["__cx", "__cy"])
            .where((F.col("__id") != F.col("__ib"))
                   & (dx * dx + dy * dy <= F.lit(eps * eps)))
            .select(F.col("__id").alias("ia"), F.col("__ib").alias("ib")))


def dbscan(points: DataFrame, eps: float, min_pts: int,
           id_col: str = "id", x_col: str = "x",
           y_col: str = "y") -> DataFrame:
    """(id, cluster_id, is_core) for every core or border point (noise is
    dropped). min_pts counts the point itself and must be >= 2."""
    if min_pts < 2:
        raise ValueError("min_pts must be >= 2 (min_pts=1 makes every "
                         "point a singleton core cluster)")
    pairs = eps_neighbor_pairs(points, eps, id_col, x_col, y_col).persist()
    deg = pairs.groupBy("ia").agg(F.count("*").alias("__n"))
    core = deg.where(F.col("__n") + 1 >= int(min_pts)) \
              .select(F.col("ia").alias("__core_id"))
    core_edges = (pairs
                  .join(core.select(F.col("__core_id").alias("ia")), "ia")
                  .join(core.select(F.col("__core_id").alias("ib")), "ib")
                  .select("ia", "ib"))
    cc = connected_components(core_edges, src="ia", dst="ib")
    core_lab = (core.select(F.col("__core_id").alias("id"))
                .join(cc, "id", "left")
                .select("id", F.coalesce("cluster_id", F.col("id"))
                        .alias("cluster_id")))
    border = (pairs
              .join(core.select(F.col("__core_id").alias("ib")), "ib")
              .join(core.select(F.col("__core_id").alias("ia")), "ia",
                    "left_anti")
              .join(core_lab.select(F.col("id").alias("ib"),
                                    F.col("cluster_id")), "ib")
              .groupBy("ia")
              .agg(F.min("cluster_id").alias("cluster_id"))
              .select(F.col("ia").alias("id"), "cluster_id"))
    out = (core_lab.withColumn("is_core", F.lit(True))
           .unionByName(border.withColumn("is_core", F.lit(False))))
    return out


def _points_values_sql(points, sql_double) -> str:
    """[(id, x, y)] -> VALUES body."""
    return ",\n".join(f"({pid}, {sql_double(x)}, {sql_double(y)})"
                      for pid, x, y in points)


def dbscan_oracle_sql(points_values: str, eps: float, min_pts: int,
                      id_col: str = "id") -> str:
    """DuckDB replay of dbscan() over a shared (id, x, y) VALUES fixture:
    the O(n^2) pair spec (the grid join is a guaranteed-superset pruning of
    exactly this), the same count/core/min rules, and the proven recursive
    transitive-closure CC (connected_components_oracle_sql) over core-core
    edges. All comparisons are mul/add on shared literals -- bit-exact."""
    from .datapipe.cluster import connected_components_oracle_sql
    from .synth import sql_double

    eps2 = sql_double(float(eps) * float(eps))
    defs = f"""WITH __pts({id_col}, x, y) AS (VALUES
{points_values}
),
__cand AS (
  SELECT a.{id_col} AS ia, b.{id_col} AS ib
  FROM __pts a JOIN __pts b
    ON a.{id_col} <> b.{id_col}
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {eps2}),
__deg AS (SELECT ia, COUNT(*) AS n FROM __cand GROUP BY ia),
__core AS (SELECT ia AS cid FROM __deg WHERE n + 1 >= {int(min_pts)})"""
    core_edges = f"""{defs}
SELECT ia AS id_a, ib AS id_b FROM __cand
WHERE ia IN (SELECT cid FROM __core) AND ib IN (SELECT cid FROM __core)"""
    return connected_components_oracle_sql(core_edges) + f"""
, __pts2({id_col}, x, y) AS (VALUES
{points_values}
),
__cand2 AS (
  SELECT a.{id_col} AS ia, b.{id_col} AS ib
  FROM __pts2 a JOIN __pts2 b
    ON a.{id_col} <> b.{id_col}
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {eps2}),
__deg2 AS (SELECT ia, COUNT(*) AS n FROM __cand2 GROUP BY ia),
__core2 AS (SELECT ia AS cid FROM __deg2 WHERE n + 1 >= {int(min_pts)}),
__corelab AS (
  SELECT c.cid AS {id_col}, COALESCE(cc.cluster_id, c.cid) AS cluster_id
  FROM __core2 c LEFT JOIN __cc cc ON cc.id = c.cid),
__border AS (
  SELECT d.ia AS {id_col}, MIN(l.cluster_id) AS cluster_id
  FROM __cand2 d
  JOIN __corelab l ON l.{id_col} = d.ib
  WHERE d.ia NOT IN (SELECT cid FROM __core2)
  GROUP BY d.ia)
SELECT {id_col}, cluster_id, TRUE AS is_core FROM __corelab
UNION ALL
SELECT {id_col}, cluster_id, FALSE AS is_core FROM __border"""
