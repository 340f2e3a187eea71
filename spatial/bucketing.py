"""Bucketed-table storage layout: pre-shuffled, co-located joins.

The one storage trick the engine's layout surface (z-order clustering,
IVF cluster partitions, cell-prefix ranges) did not yet cover: HASH
bucketing, Spark's mechanism for making the big-big equi-join shuffle a
WRITE-ONCE cost. Both sides are written with ``bucketBy(n, key)`` (and
``sortBy`` within buckets); every subsequent join/aggregate on that key
reads bucket i against bucket i directly -- the physical plan contains NO
Exchange on either side (pinned by tests/test_plan_audit.py). At 100 TB
this is the difference between re-shuffling the fact table on every run
and shuffling it once at ingest: the canonical pattern for a pages table
joined daily against per-url signals.

Bucket-pruning caveats handled here:
* both sides must agree on bucket count (or one be a multiple) -- the
  writer takes it as one shared parameter;
* bucketed output must go through ``saveAsTable`` (the metastore carries
  the bucket spec; plain parquet paths lose it) -- an explicit ``path``
  keeps the data out of the default warehouse while the (in-memory or
  Hive) catalog keeps the spec.

Reference scope note: haskell-postgis is a codec library with no storage
layer; bucketing realizes SURVEY.md section 4.3's "co-located joins via
bucketing or pre-partitioning" mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   path: str | None = None) -> None:
    """Write ``df`` as a bucketed+sorted parquet table (replacing any
    previous version). Sorting within buckets lets the join skip its Sort
    as well when both sides are written this way."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(n_buckets, key).sortBy(key))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key: a sort-merge
    join with ZERO Exchange (each task reads bucket i of both sides).
    autoBroadcast is disabled for this plan so small test fixtures prove
    the co-located shape rather than silently broadcasting."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right.hint("merge"), key, how)
