"""Distributed interval joins via time-bucket expansion -- the 1-D analog
of the engine's cell-grid spatial join.

Spark has no range-join operator: ``l JOIN r ON key AND r.lo <= l.ts AND
l.ts <= r.hi`` plans as a BroadcastNestedLoopJoin (O(|l| * |r|) per key) or
a full sort-merge on the key alone followed by a post-filter over the whole
per-key cross product.  Neither survives a 100 TB event table.

The distributed-native shape is the same one the spatial join uses for 2-D
cells, dropped to 1-D:

* points get ONE bucket: ``ts DIV width``;
* intervals EXPLODE into every bucket they overlap
  (``sequence(lo DIV width, hi DIV width)`` -- pure JVM, no Python);
* equi-join on (keys..., bucket), then the exact range predicate refines.

Because buckets partition the line, each matching (point, interval) pair
meets in EXACTLY one bucket (the point's) -- no dedup pass needed.  For
interval x interval overlap, a pair meets in every shared bucket, so the
standard dedup predicate keeps only the canonical meeting bucket
``greatest(lo_a, lo_b) DIV width`` -- one boolean per row, still no
distinct/shuffle.

Scale levers (100 TB):
* fan-out per interval = len/width + 1: pick ``bucket_s`` near the median
  interval length so the explode stays O(1) per row.  A handful of
  pathologically long intervals (the skew analog of the spatial join's hot
  cells) can be routed to a broadcast side-channel by the caller; AQE's
  skew-join split handles moderate cases.
* only (keys, bucket, bounds, payload) columns shuffle; the equi-join is a
  plain hash/sort-merge join Catalyst can broadcast when one side is small.
* everything is integer-seconds arithmetic -- exactly replayable in
  BIGINT SQL (the oracle renders the same DIV/BETWEEN algebra).

Reference scope note: haskell-postgis is a geometry codec library with no
temporal surface; interval joins belong to the event-enrichment half of the
pipeline mandate (SURVEY.md section 2.3), and reuse the spatial join's
grid-meeting discipline (spatial/join.py) in one dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__ivl_bucket"


def _check_disjoint(left: DataFrame, right: DataFrame,
                    on: Sequence[str]) -> None:
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(
            f"non-key columns appear on both sides: {sorted(clash)}; "
            "rename before joining (same guard as spatial/join.py)")


def interval_point_join(points: DataFrame, intervals: DataFrame,
                        on: Sequence[str], point_ts: str,
                        lo: str, hi: str, bucket_s: int) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``lo <= point_ts <= hi`` per ``on`` key.  All timestamp columns are
    integer seconds (the caller converts; integer algebra keeps the result
    bit-exactly SQL-replayable).  Output: all point columns + all interval
    columns; each matching pair appears exactly once."""
    on = list(on)
    _check_disjoint(points, intervals, on)
    p = points.withColumn(_B, F.expr(f"{point_ts} DIV {bucket_s}"))
    i = intervals.withColumn(
        _B, F.explode(F.sequence(F.expr(f"{lo} DIV {bucket_s}"),
                                 F.expr(f"{hi} DIV {bucket_s}"))))
    return (p.join(i, on + [_B])
            .where((F.col(point_ts) >= F.col(lo))
                   & (F.col(point_ts) <= F.col(hi)))
            .drop(_B))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          on: Sequence[str], left_lo: str, left_hi: str,
                          right_lo: str, right_hi: str,
                          bucket_s: int) -> DataFrame:
    """Inner-join interval rows that OVERLAP (``a.lo <= b.hi AND
    b.lo <= a.hi``, closed ends) per ``on`` key.  A pair shares every
    bucket both intervals cover; the canonical-bucket predicate
    ``greatest(lo_a, lo_b) DIV width == bucket`` keeps exactly one copy
    without any distinct."""
    on = list(on)
    _check_disjoint(left, right, on)
    l = left.withColumn(
        _B, F.explode(F.sequence(F.expr(f"{left_lo} DIV {bucket_s}"),
                                 F.expr(f"{left_hi} DIV {bucket_s}"))))
    r = right.withColumn(
        _B, F.explode(F.sequence(F.expr(f"{right_lo} DIV {bucket_s}"),
                                 F.expr(f"{right_hi} DIV {bucket_s}"))))
    return (l.join(r, on + [_B])
            .where((F.col(left_lo) <= F.col(right_hi))
                   & (F.col(right_lo) <= F.col(left_hi))
                   & (F.expr(f"greatest({left_lo}, {right_lo}) "
                             f"DIV {bucket_s}") == F.col(_B)))
            .drop(_B))
