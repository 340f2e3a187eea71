"""Structured Streaming: incremental tile rollup equals the batch rollup;
watermarked windows; stateful sessionization."""

import pytest
from pyspark.sql import functions as F

from spatial.streaming import (
    run_available_now,
    sessionize_stream,
    stream_pages,
    streaming_tile_rollup,
    windowed_event_counts,
)
from spatial.synth import synth_pages
from spatial.geocode import geocode_page
from spatial.tiles import tile_assign


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_stream")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    synth_pages(spark, 3000, partitions=6).write.mode("overwrite").parquet(str(d / "pages"))
    return str(d / "pages")


def test_streaming_tile_rollup_matches_batch(spark, pages_dir, tmp_path):
    stream = stream_pages(spark, pages_dir, max_files_per_trigger=2)
    rollup = streaming_tile_rollup(stream, zoom=6)
    run_available_now(rollup, str(tmp_path / "ckpt"), "tiles_stream",
                      output_mode="complete")
    got = {
        (r["tile_x"], r["tile_y"]): r["n_pages"]
        for r in spark.sql("select * from tiles_stream").collect()
    }
    batch = geocode_page(spark.read.parquet(pages_dir)).where(F.col("lon").isNotNull())
    batch = tile_assign(batch, "lon", "lat", 6)
    want = {
        (r["tile_x"], r["tile_y"]): r["cnt"]
        for r in batch.groupBy("tile_x", "tile_y").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_windowed_counts_with_watermark(spark, pages_dir, tmp_path):
    stream = stream_pages(spark, pages_dir)
    win = windowed_event_counts(stream, ts_col="warc_ts",
                                window="30 days", watermark="10 days")
    run_available_now(win, str(tmp_path / "ckpt2"), "win_stream",
                      output_mode="append")
    rows = spark.sql("select * from win_stream").collect()
    # append mode emits only watermark-closed windows; the table exists and
    # the plan executed with event-time state (count may be 0 for one pass)
    assert rows is not None
    batch_total = spark.read.parquet(pages_dir).count()
    assert sum(r["n_pages"] for r in rows) <= batch_total


def test_sessionize_stream(spark, pages_dir, tmp_path):
    stream = stream_pages(spark, pages_dir)
    sess = sessionize_stream(stream, ts_col="warc_ts", key_col="lang",
                             gap="12 hours", watermark="1 hour")
    run_available_now(sess, str(tmp_path / "ckpt3"), "sess_stream",
                      output_mode="complete")
    rows = spark.sql("select * from sess_stream").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_stream_static_enrich_matches_batch_left_join(spark, tmp_path):
    """Stream-static broadcast enrichment across several real micro-batches:
    result equals the batch LEFT join (unmatched keys survive with nulls),
    and the static side is broadcast (no stream-side exchange for the
    join)."""
    from spatial.streaming import enrich_stream_static, run_available_now

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
              .select("event_id", "user_id")
    src = str(tmp_path / "ev_src")
    ev.repartition(6).write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame(
        [(u, f"seg_{u % 3}") for u in range(0, 100, 2)],  # odd users unmatched
        "ukey long, segment string")

    # plan shape: the same function on the batch frame must broadcast the dim
    batch_join = enrich_stream_static(ev, dim, "user_id", "ukey")
    plan = batch_join._sc._jvm.PythonSQLUtils.explainString(
        batch_join._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    out = enrich_stream_static(stream, dim, "user_id", "ukey") \
        .select("event_id", "user_id", "segment")
    run_available_now(out, str(tmp_path / "ckpt_enrich"), "enrich_stream",
                      output_mode="append")
    got = {(r["event_id"], r["user_id"], r["segment"])
           for r in spark.table("enrich_stream").collect()}
    want = {(r["event_id"], r["user_id"], r["segment"])
            for r in batch_join.select("event_id", "user_id",
                                       "segment").collect()}
    assert got == want
    assert any(seg is None for _, _, seg in got)  # left-join null path hit


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    """applyInPandasWithState custom operator: state carried across several
    real micro-batches; final per-key total == batch groupBy count."""
    from pyspark.sql import functions as F

    from spatial.streaming import run_available_now, stateful_running_totals

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_src")
    ev.repartition(6).write.mode("overwrite").parquet(src)  # 6 files
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))  # ~3 batches
    out = stateful_running_totals(stream, "user_id")
    run_available_now(out, str(tmp_path / "ckpt"), "stateful_totals",
                      output_mode="update")
    got = (spark.table("stateful_totals")
           .groupBy("user_id").agg(F.max("n_events").alias("n"))
           .collect())
    want = {r["user_id"]: r["n"] for r in
            ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert {r["user_id"]: r["n"] for r in got} == want
    # state genuinely spanned batches: some key must have been emitted more
    # than once with increasing totals
    multi = (spark.table("stateful_totals").groupBy("user_id")
             .agg(F.count("*").alias("k")).where("k > 1").count())
    assert multi > 0
