"""spark-submit entry point for the flagship pages pipeline.

The north star mandates jobs "launched via spark-submit --py-files"
(BASELINE.json.north_star); this is that launcher. Package the engine with
``scripts/package_pyfiles.sh`` (builds ``dist/spatial.zip``), then:

    spark-submit --py-files dist/spatial.zip jobs/run_pipeline.py \
        --pages /path/to/pages_parquet --regions /path/to/regions_parquet \
        --out /path/to/out --batches 8 --zoom 12 --salt 8

On a real cluster add ``--master yarn``/``--master k8s://...`` and executor
sizing flags; the job itself is master-agnostic (it calls
``SparkSession.builder.getOrCreate()`` and inherits whatever spark-submit
configured). Re-running with the same ``--out`` resumes: batches already
recorded in ``<out>/_manifest`` are skipped (checkpoint/resume contract,
spatial/pipeline.py).

``--pages synth:N`` / ``--regions synth`` generate the deterministic
Common-Crawl-shaped synthetic tables (spatial/synth.py, fixed seed) so the
launcher can be smoke-tested with no input data.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--pages", required=True,
                   help="parquet path of pages(url, warc_ts, html, text, lang), "
                        "or synth:N for N deterministic synthetic rows")
    p.add_argument("--regions", required=True,
                   help="parquet path of regions(region_id, geom_hex), or 'synth'")
    p.add_argument("--out", required=True, help="output directory (checkpointed)")
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--zoom", type=int, default=12)
    p.add_argument("--cell-level", type=int, default=None)
    p.add_argument("--salt", type=int, default=0,
                   help="salt buckets for hot-cell skew mitigation (0 = off)")
    p.add_argument("--broadcast-threshold", type=int, default=2_000_000)
    p.add_argument("--cluster-cells", type=int, default=0,
                   help="range-partition join output on cell id into this "
                        "many partitions before writing (spatial locality)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("spatial-pages-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from spatial.pipeline import PipelineConfig, run_pipeline
    from spatial.synth import synth_pages, synth_regions

    if args.pages.startswith("synth:"):
        pages = synth_pages(spark, int(args.pages.split(":", 1)[1]))
    else:
        pages = spark.read.parquet(args.pages)
    if args.regions == "synth":
        regions = synth_regions(spark)
    else:
        regions = spark.read.parquet(args.regions)

    cfg = PipelineConfig(
        out_dir=args.out,
        n_batches=args.batches,
        zoom=args.zoom,
        cell_level=args.cell_level,
        salt_buckets=args.salt,
        broadcast_threshold=args.broadcast_threshold,
        cluster_cells=args.cluster_cells,
    )
    t0 = time.time()
    stats = run_pipeline(spark, pages, regions, cfg)
    stats["wall_sec"] = round(time.time() - t0, 3)
    # one JSON line on stdout: scriptable (Spark noise goes to stderr)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
