"""DBSCAN scale-growth evidence (round 4): the grid neighbor join's
published claim is candidate volume bounded by local density x n -- so at
CONSTANT density (area grows with n) the eps-pair count, core count and
wall time must grow ~linearly, never quadratically. This runs the full
dbscan() at three sizes with the synthetic area scaled to hold expected
neighbors-per-point fixed (~6: W = sqrt(pi * n / 6) for eps=1), and
records counts + wall seconds. Points are a pure function of (seed, id)
(Weyl-sequence uniforms, partition-stable like every synth table), so
every count is a determinism pin.

The honest-experiment rules from bench/stress.py apply: auto-broadcast
is DISABLED so all scales run the identical plan, and each op is
best-of-2 with the first run as warm-up.

Usage: python bench/dbscan_stress.py [n=1000000]
       -> one JSON line on stdout (artifact: BENCH/stress_dbscan_r4.json)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dbscan-stress")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def scaled_points(spark, n: int):
    """n uniform points over a W x W window with W chosen so the expected
    eps=1 neighbor count (~pi * n / W^2) stays ~6 at every n: the
    constant-density regime the growth claim is about. xxhash64 mixing
    keeps coordinates a pure function of id (partition-stable) WITHOUT
    the 2-D lattice structure of multiplicative congruences (a Weyl
    generator packed points along torus lines: measured avg-neighbor
    count HALVED from 100k to 400k, breaking the constant-density
    premise this experiment depends on)."""
    from pyspark.sql import functions as F

    w = math.sqrt(math.pi * n / 6.0)
    m = 1 << 30
    ux = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(m)) \
        .cast("double") / float(m)
    uy = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(m)) \
        .cast("double") / float(m)
    return spark.range(n).select(
        F.col("id"),
        (ux * w).alias("x"),
        (uy * w).alias("y"))


def main():
    from spatial.dbscan import dbscan, eps_neighbor_pairs

    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    out = {"metric": "dbscan constant-density growth", "cpus": cpus,
           "eps": 1.0, "min_pts": 5, "sizes": {}}
    for label, n in [("1x", n_top // 10), ("4x", n_top * 4 // 10),
                     ("10x", n_top)]:
        pts = scaled_points(spark, n).persist()
        pts.count()
        rec = {"n": n}
        for op_name, fn in [
            ("pairs", lambda: eps_neighbor_pairs(pts, 1.0).count()),
            ("dbscan", lambda: dbscan(pts, eps=1.0, min_pts=5)
             .groupBy("is_core").count().collect()),
        ]:
            t0 = time.perf_counter()
            r1 = fn()
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            r2 = fn()
            dt = time.perf_counter() - t0
            assert str(sorted(map(str, r1 if isinstance(r1, list) else [r1]))) \
                == str(sorted(map(str, r2 if isinstance(r2, list) else [r2]))), \
                f"{op_name}@{label} nondeterministic"
            rec[f"{op_name}_sec"] = round(min(dt, warm), 3)
            if op_name == "pairs":
                rec["pair_rows"] = r1
            else:
                for row in r1:
                    rec["cores" if row["is_core"] else "border"] = row["count"]
        pts.unpersist()
        out["sizes"][label] = rec
    s = out["sizes"]
    out["pair_growth_4x_over_1x"] = round(
        s["4x"]["pair_rows"] / max(s["1x"]["pair_rows"], 1), 3)
    out["pair_growth_10x_over_4x"] = round(
        s["10x"]["pair_rows"] / max(s["4x"]["pair_rows"], 1), 3)
    out["sec_growth_10x_over_1x"] = round(
        s["10x"]["dbscan_sec"] / max(s["1x"]["dbscan_sec"], 1e-9), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
