"""Scaling-efficiency evidence: the same flagship job at two parallelism
levels (local[N] vs local[4N]) on identical input.

Sandbox proxy for the north rule's N-vs-4N-executor requirement (no real
cluster here, per the driver instruction): throughput at both levels plus
efficiency = throughput(4N) / (4 x throughput(N)) is recorded in
BENCH/BASELINE.md. Each parallelism level runs in its own fresh JVM (a
subprocess) so executor-thread pools, shuffle partitions, and memory fractions
are configured per level and nothing leaks between runs.

Usage: python bench/scaling.py [n_pages] -> one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cpus = {cpus}
n_pages = {n_pages}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.constraintPropagation.enabled", "false")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
from spatial.ewkb import ewkb_decode
from spatial.join import SpatialJoinPlan
from spatial.pipeline import enrich_pages
from spatial.synth import synth_pages, synth_regions

regions = synth_regions(spark).withColumn("geom", ewkb_decode("geom_hex")).select("region_id", "geom")
plan = SpatialJoinPlan(regions)  # dim side prepared once, like any real pipeline
# warm-up
plan.join(enrich_pages(synth_pages(spark, 2000), 12), x_col="lon", y_col="lat").count()
pages = synth_pages(spark, n_pages).persist()
n = pages.count()
best = None
for _ in range(3):
    t0 = time.perf_counter()
    out = plan.join(enrich_pages(pages, 12), x_col="lon", y_col="lat").count()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cpus": cpus, "n_pages": n, "sec": round(best, 3),
                   "pages_per_sec": round(n / best, 1), "join_rows": out}}))
spark.stop()
"""


def run_level(cpus: int, n_pages: int) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, n_pages=n_pages)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


_CALIB = r"""
import json, sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false").getOrCreate())
df = spark.range(0, 400_000_000, 1, cpus * 4)
df.select(F.sum(F.sin(F.col("id") * 1e-7))).collect()
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    df.select(F.sum(F.sin(F.col("id") * 1e-7) + F.cos(F.col("id") * 1e-6))).collect()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"cpus": cpus, "sec": round(best, 3)}}))
spark.stop()
"""


def run_calib(cpus: int) -> dict:
    code = _CALIB.format(cpus=cpus)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    """Primary N->4N pair is 4->16: the pure-JVM calibration shows this
    sandbox VM only sustains ~16 cores' worth of compute (16->32 threads give
    1.2x even for embarrassingly-parallel JVM sin/cos), so 8->32 measures the
    host's ceiling, not the engine. Both pairs are reported, each alongside
    the hardware calibration at the same thread counts, plus the
    hardware-normalized efficiency (job efficiency / JVM-compute efficiency,
    capped at 1)."""
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    report: dict = {"n_pages": n_pages, "pairs": {}}
    for n, n4 in [(4, 16), (8, 32)]:
        lo = run_level(n, n_pages)
        hi = run_level(n4, n_pages)
        clo = run_calib(n)
        chi = run_calib(n4)
        eff = hi["pages_per_sec"] / (4 * lo["pages_per_sec"])
        hw_eff = clo["sec"] / (4 * chi["sec"])
        report["pairs"][f"{n}to{n4}"] = {
            f"local{n}": lo,
            f"local{n4}": hi,
            "scaling_efficiency": round(eff, 3),
            "hw_jvm_compute_efficiency": round(hw_eff, 3),
            "normalized_efficiency": round(min(eff / hw_eff, 1.0), 3),
        }
    primary = report["pairs"]["4to16"]["scaling_efficiency"]
    report["primary_pair"] = "4to16"
    report["primary_efficiency"] = primary
    report["target"] = 0.8
    report["pass"] = primary >= 0.8
    print(json.dumps(report))


if __name__ == "__main__":
    main()
