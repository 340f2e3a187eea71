"""Distributed as-of join (point-in-time / "last observation carried
forward" join) -- the temporal analog of the engine's spatial joins.

Spark has no ASOF JOIN operator (DuckDB and pandas do); the naive
range-join formulation (``l JOIN r ON key AND r.ts <= l.ts`` + argmax)
explodes to O(|l| * avg matches) intermediate rows.  The distributed-native
shape used here is the union-tag trick:

    union(right rows tagged 0, left rows tagged 1)
      -> ONE window pass per key ordered by (ts, tag, tiebreak):
         last non-null right payload at-or-before each left row
      -> filter back to the left rows

One shuffle (the window partitioning), zero row amplification, and the
window state is O(1) per row -- the plan that survives a 100 TB event
table.  Equal timestamps: right rows sort BEFORE left rows (tag 0 < 1), so
the match is inclusive (r.ts <= l.ts); among equal-ts right rows the
largest ``right_tiebreak`` wins -- a total order, so results are
deterministic and SQL-oracle-able (DuckDB LATERAL replay with the same
ORDER BY).

Reference scope note: haskell-postgis is a geometry codec library with no
temporal surface; as-of joins belong to the event-enrichment half of the
pipeline mandate (SURVEY.md section 2.3: the events table feeds sessionize/
window operators; as-of closes the "attach latest prior state" gap).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: Sequence[str] = ("value",),
              right_tiebreak: str | None = None,
              prefix: str = "asof_",
              tolerance_s: int | None = None) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` per ``on`` key (backward as-of).

    Output: all left columns + ``{prefix}ts`` (the matched right timestamp,
    null when no prior right row) + ``{prefix}<col>`` for each of
    ``value_cols``.  With ``tolerance_s``, matches older than the tolerance
    are nulled out (the match must be recent enough to be meaningful).

    ``right_tiebreak`` names a right column giving equal-timestamp right
    rows a total order (largest wins); required for determinism whenever
    right can hold duplicate (key, ts) pairs.
    """
    on = list(on)
    vals = list(value_cols)
    payload = [F.col(c).alias(f"__v_{c}") for c in vals]
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0))
        .cast("long").alias("__tb"),
        F.col(right_ts).alias("__rts"),
        *payload,
    )
    l = left.withColumn("__ts", F.col(left_ts)) \
            .withColumn("__tag", F.lit(1)) \
            .withColumn("__tb", F.lit(0).cast("long"))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*on).orderBy("__ts", "__tag", "__tb")
         .rowsBetween(Window.unboundedPreceding, 0))
    matched_ts = F.last("__rts", ignorenulls=True).over(w)
    u = u.withColumn(f"{prefix}ts", matched_ts)
    for c in vals:
        u = u.withColumn(f"{prefix}{c}",
                         F.last(f"__v_{c}", ignorenulls=True).over(w))
    out = u.where(F.col("__tag") == 1)
    if tolerance_s is not None:
        # materialize staleness BEFORE nulling asof_ts (the null would make
        # the predicate itself null for the later value columns)
        out = out.withColumn(
            "__stale",
            (F.unix_timestamp(F.col(left_ts))
             - F.unix_timestamp(F.col(f"{prefix}ts"))) > tolerance_s)
        for c in [f"{prefix}ts"] + [f"{prefix}{v}" for v in vals]:
            out = out.withColumn(
                c, F.when(F.col("__stale"), F.lit(None)).otherwise(F.col(c)))
    drop = ["__ts", "__tag", "__tb", "__rts", "__stale"] \
        + [f"__v_{c}" for c in vals]
    return out.drop(*drop)
