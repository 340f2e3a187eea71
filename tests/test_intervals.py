"""Interval joins: bucket-expansion result == brute-force cross-join
filter, at several bucket widths (the width is a performance knob, never a
semantics knob), and the column-collision guard fires."""

import pytest
from pyspark.sql import functions as F

from spatial.intervals import interval_overlap_join, interval_point_join


def _points(spark):
    # deterministic arithmetic spread: 120 points, 3 keys, ts 0..4000
    return spark.range(120).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("pid"),
        ((F.col("id") * 37) % 4001).alias("ts"))


def _intervals(spark):
    # 45 intervals of varying length incl. zero-length and long ones
    return spark.range(45).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("iid"),
        ((F.col("id") * 89) % 3900).alias("lo"),
        (((F.col("id") * 89) % 3900) + (F.col("id") * 13) % 700).alias("hi"))


def _brute_point(p, i):
    return (p.join(i, "k")
            .where((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
            .select("k", "pid", "iid"))


def _key(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("width", [1, 64, 500, 10000])
def test_interval_point_join_matches_bruteforce(spark, width):
    p, i = _points(spark), _intervals(spark)
    got = interval_point_join(p, i, on=["k"], point_ts="ts",
                              lo="lo", hi="hi", bucket_s=width) \
        .select("k", "pid", "iid").collect()
    want = _brute_point(p, i).collect()
    assert _key(got) == _key(want)
    assert len(got) == len(set(map(tuple, got)))  # exactly-once per pair


@pytest.mark.parametrize("width", [1, 64, 500, 10000])
def test_interval_overlap_join_matches_bruteforce(spark, width):
    a = _intervals(spark).select("k", F.col("iid").alias("aid"),
                                 F.col("lo").alias("alo"),
                                 F.col("hi").alias("ahi"))
    b = _intervals(spark).select("k", (F.col("iid") + 100).alias("bid"),
                                 ((F.col("lo") * 7) % 3900).alias("blo"),
                                 (((F.col("lo") * 7) % 3900)
                                  + (F.col("hi") - F.col("lo"))).alias("bhi"))
    got = interval_overlap_join(a, b, on=["k"], left_lo="alo",
                                left_hi="ahi", right_lo="blo",
                                right_hi="bhi", bucket_s=width) \
        .select("k", "aid", "bid").collect()
    want = (a.join(b, "k")
            .where((F.col("alo") <= F.col("bhi"))
                   & (F.col("blo") <= F.col("ahi")))
            .select("k", "aid", "bid").collect())
    assert _key(got) == _key(want)
    assert len(got) == len(set(map(tuple, got)))


def test_interval_join_collision_guard(spark):
    p, i = _points(spark), _intervals(spark)
    with pytest.raises(ValueError, match="both sides"):
        interval_point_join(p, i.withColumnRenamed("iid", "pid"),
                            on=["k"], point_ts="ts", lo="lo", hi="hi",
                            bucket_s=100)
