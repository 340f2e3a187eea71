"""Skew-safe two-stage aggregation: salt the hot keys apart, partially
aggregate, then re-aggregate -- the aggregation-side twin of the spatial
join's hot-cell salting (spatial/join.py).

Why: a plain ``groupBy(key).agg(...)`` hash-partitions rows by key; one
pathological key (a mirror domain with 10^9 pages, a bot user) lands on
one reducer and the stage runs at the speed of that straggler.  Salting
splits each key's rows across ``buckets`` reducers in stage one; stage
two re-aggregates the per-(key, salt) partials -- ``buckets`` rows per
key, trivially balanced.

Correctness requires the aggregate to be decomposable with an exact,
order-independent merge.  COUNT/SUM-of-integers/SUM-of-decimals/MIN/MAX
qualify; float sums do NOT (order-dependence is why the repo policy sums
money as DECIMAL).  This module exposes exactly the decomposable set, so
the salted result is bit-identical to the unsalted one -- which is what
the driver oracle asserts (the plain GROUP BY in SQL).

The salt is ``mix_hash(id) % buckets`` -- a pure function of a row id
(curation.py's multiplicative-congruential hash), so the plan is
deterministic at any partitioning; Spark's own map-side partial
aggregation already smooths MODERATE skew, and AQE can split skewed
shuffle partitions, but neither helps when a single KEY exceeds one
reducer's capacity -- explicit salting is the standing fix.

100 TB shape: stage one's map-side combine bounds the shuffle at
``buckets x |keys|`` rows; stage two is over that bounded set.  Use for
per-domain / per-user / per-language rollups where the key distribution
is Zipfian (i.e. always, for web data).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import mix_hash


def salted_agg(df: DataFrame, group_cols: Sequence[str], id_col: str,
               sum_col: str | None = None, buckets: int = 16,
               sum_type: str = "decimal(18,2)") -> DataFrame:
    """Skew-safe ``groupBy(group_cols).agg(count, sum, min, max)`` over
    ``sum_col`` (cast to an exact decimal type).  Output columns:
    group_cols + ``n`` (+ ``total``, ``v_min``, ``v_max`` when sum_col is
    given).  Bit-identical to the plain aggregation by construction."""
    groups = list(group_cols)
    salt = F.pmod(mix_hash(F.col(id_col)), F.lit(buckets)).alias("__salt")
    stage1_aggs = [F.count("*").alias("__n")]
    stage2_aggs = [F.sum("__n").cast("long").alias("n")]
    if sum_col is not None:
        v = F.col(sum_col).cast(sum_type)
        stage1_aggs += [F.sum(v).alias("__s"), F.min(v).alias("__mn"),
                        F.max(v).alias("__mx")]
        stage2_aggs += [F.sum("__s").cast("double").alias("total"),
                        F.min("__mn").cast("double").alias("v_min"),
                        F.max("__mx").cast("double").alias("v_max")]
    partial = (df.select(*groups, salt,
                         *([F.col(sum_col)] if sum_col else []))
               .groupBy(*groups, "__salt").agg(*stage1_aggs))
    return partial.groupBy(*groups).agg(*stage2_aggs)


def plain_agg_oracle_sql(table_sql: str, group_cols: Sequence[str],
                         sum_col: str | None = None,
                         sum_type: str = "DECIMAL(18,2)") -> str:
    """The semantically-identical PLAIN aggregation in DuckDB -- the
    oracle's whole point: salted == unsalted, bit for bit."""
    groups = ", ".join(group_cols)
    cols = [f"COUNT(*) AS n"]
    if sum_col is not None:
        cols += [
            f"CAST(SUM(CAST({sum_col} AS {sum_type})) AS DOUBLE) AS total",
            f"CAST(MIN(CAST({sum_col} AS {sum_type})) AS DOUBLE) AS v_min",
            f"CAST(MAX(CAST({sum_col} AS {sum_type})) AS DOUBLE) AS v_max",
        ]
    sel = ", ".join(cols)
    return (f"SELECT {groups}, {sel} FROM ({table_sql}) __src "
            f"GROUP BY {groups}")
