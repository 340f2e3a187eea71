"""Flagship job: pages -> extract_text -> geocode -> cell/tile -> spatial
join -> sinks, with batch checkpoint/resume and per-partition lineage.

This is the pipeline the north rule mandates over the 10^12-row pages table
(SURVEY.md §3.4). Sandbox storage is parquet laid out Iceberg-style (one
committed snapshot per input batch + a manifest of committed batch ids); on a
real cluster the same code targets ``df.writeTo(table).append()`` and the
manifest becomes the Iceberg snapshot log -- the resume logic is identical
because it keys on *batch ids*, not file paths.

Checkpoint/resume semantics:
* input is processed in deterministic batches (pmod of a url hash, so batch
  membership is stable across runs/cluster sizes);
* each batch's outputs (join_out, tile_assign) are committed atomically
  (parquet dir rename-on-success by Spark's committer) together with a
  manifest row;
* resume = read the manifest, skip committed batches -- an anti-join at the
  batch-id level, costing one tiny scan instead of a 10^12-row exceptAll.
  Because extract_text/geocode are bytewise-deterministic per url, a resumed
  run's union of outputs is byte-identical to an uninterrupted run's.

Per-partition lineage/metrics: each committed batch also writes a metrics
table (batch, spark partition id, rows in/out per stage) via
``groupBy(spark_partition_id())`` -- cheap, no extra shuffle.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ewkb import ewkb_decode
from .geocode import geocode_page
from .join import SpatialJoinPlan
from .textextract import extract_text
from .tiles import tile_assign


@dataclass
class PipelineConfig:
    out_dir: str
    n_batches: int = 4
    zoom: int = 12
    cell_level: Optional[int] = None
    salt_buckets: int = 0
    broadcast_threshold: int = 2_000_000
    # >0: repartitionByRange the join output on the cell id into this many
    # partitions before writing (cell-prefix locality; join.cluster_by_cell)
    cluster_cells: int = 0


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def committed_batches(out_dir: str) -> set[int]:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return set()
    out = set()
    for name in os.listdir(path):
        if name.startswith("batch-") and name.endswith(".json"):
            with open(os.path.join(path, name)) as f:
                out.add(json.load(f)["batch"])
    return out


def _commit_batch(out_dir: str, batch: int, stats: dict) -> None:
    path = _manifest_path(out_dir)
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".batch-{batch}.json.tmp")
    final = os.path.join(path, f"batch-{batch}.json")
    with open(tmp, "w") as f:
        json.dump({"batch": batch, **stats}, f)
    os.replace(tmp, final)  # atomic commit


def enrich_pages(pages: DataFrame, zoom: int) -> DataFrame:
    """extract_text (only where text is missing -- never re-read html when
    text is populated, the column-pruning win from SURVEY §4.2), geocode,
    tile-assign. Pure narrow ops: no shuffle at all."""
    # Mask html to null JVM-side for rows whose text is already populated:
    # ArrowEvalPython computes UDF columns unconditionally, so a plain
    # coalesce(text, extract_text(html)) would serialize every row's html
    # binary across the Arrow boundary and parse it, then throw the result
    # away. With the mask, decided rows ship a null instead of the payload.
    enriched = pages.withColumn(
        "text",
        F.coalesce(
            F.col("text"),
            extract_text(F.when(F.col("text").isNull(), F.col("html")))),
    ).drop("html")
    located = geocode_page(enriched).where(F.col("lon").isNotNull())
    return tile_assign(located, "lon", "lat", zoom)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    regions: DataFrame,
    cfg: PipelineConfig,
    fail_after_batch: Optional[int] = None,
) -> dict:
    """Run (or resume) the flagship job. ``fail_after_batch`` simulates a
    mid-job kill for the resume tests. Returns summary stats."""
    regions_geom = regions.withColumn("geom", ewkb_decode("geom_hex")).select(
        "region_id", "geom"
    )
    # prepare the polygon build side ONCE; every batch reuses it
    plan = SpatialJoinPlan(
        regions_geom,
        level=cfg.cell_level,
        broadcast_threshold=cfg.broadcast_threshold,
        salt_buckets=cfg.salt_buckets,
    )
    done = committed_batches(cfg.out_dir)
    ran = []
    for batch in range(cfg.n_batches):
        if batch in done:
            continue
        # deterministic batch membership: stable across runs & cluster sizes
        batch_pages = pages.where(
            F.pmod(F.xxhash64("url"), F.lit(cfg.n_batches)) == batch
        )
        enriched = enrich_pages(batch_pages, cfg.zoom)
        joined = plan.join(enriched, x_col="lon", y_col="lat", salt_key="url")
        join_out = joined.select(
            "url", "region_id", "cell", F.col("lon").alias("x"), F.col("lat").alias("y")
        )
        tiles_out = enriched.select("url", "tile_z", "tile_x", "tile_y")

        if cfg.cluster_cells > 0:
            from .join import cluster_by_cell
            join_out = cluster_by_cell(join_out, "cell", cfg.cluster_cells)
        join_out.write.mode("overwrite").parquet(
            os.path.join(cfg.out_dir, "join_out", f"batch={batch}"))
        tiles_out.write.mode("overwrite").parquet(
            os.path.join(cfg.out_dir, "tile_assign", f"batch={batch}"))

        # per-partition lineage counters (groupBy partition id: map-side agg)
        metrics = (
            join_out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"),
                 F.approx_count_distinct("url").alias("urls_out"))
            .withColumn("batch", F.lit(batch))
        )
        metrics.write.mode("overwrite").parquet(
            os.path.join(cfg.out_dir, "metrics", f"batch={batch}"))

        n_join = spark.read.parquet(
            os.path.join(cfg.out_dir, "join_out", f"batch={batch}")).count()
        n_tiles = spark.read.parquet(
            os.path.join(cfg.out_dir, "tile_assign", f"batch={batch}")).count()
        _commit_batch(cfg.out_dir, batch, {"join_rows": n_join, "tile_rows": n_tiles})
        ran.append(batch)
        if fail_after_batch is not None and batch >= fail_after_batch:
            raise RuntimeError(f"simulated failure after batch {batch}")
    return {"ran_batches": ran, "committed": sorted(committed_batches(cfg.out_dir))}


def read_output(spark: SparkSession, out_dir: str, table: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(out_dir, table)).parquet(
        os.path.join(out_dir, table, "batch=*"))
