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


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    lo = run_level(8, n_pages)
    hi = run_level(32, n_pages)
    eff = hi["pages_per_sec"] / (4 * lo["pages_per_sec"])
    print(json.dumps({
        "n_pages": n_pages,
        "local8": lo,
        "local32": hi,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
