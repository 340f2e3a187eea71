"""100-TB plan audit pins (SURVEY §4 / the "push down and prune" rubric):
predicate pushdown and column pruning must reach the parquet scan, the
flagship join must stay broadcast (no sort-merge), and these properties
must survive refactors -- so they are asserted on the physical plan, not
just eyeballed once."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection over the 5-column documents table must scan
    only those 2 columns."""
    from spatial.datapipe.textstats import token_count

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    plan = _plan(q)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    # none of the unused columns may reach the scan
    for col in ("lang", "source", "n_chars"):
        assert f"{col}:" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_predicate_pushdown_reaches_scan(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.where(F.col("value") > 50.0).select("event_id")
    plan = _plan(q)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThan(value,50.0)" in pushed
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan


def test_flagship_join_is_broadcast_not_sortmerge(spark):
    """The spatial join's candidate and refine joins must both broadcast
    (geometry-free cells + per-region geometry) -- a SortMergeJoin here
    means the probe side started shuffling, the round-1 scale-killer."""
    from spatial.ewkb import ewkb_decode
    from spatial.join import spatial_join
    from spatial.pipeline import enrich_pages
    from spatial.synth import synth_pages, synth_regions

    regions = synth_regions(spark).withColumn(
        "geom", ewkb_decode("geom_hex")).select("region_id", "geom")
    pages = enrich_pages(synth_pages(spark, 200), 12)
    out = spatial_join(pages, regions, x_col="lon", y_col="lat")
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_embedding_scan_prunes_to_used_columns(spark):
    from spatial.datapipe.similarity import cosine_topk_bruteforce
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = cosine_topk_bruteforce(emb, np.zeros((1, 64)) + 1.0, k=3)
    plan = _plan(q)
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in plan


def test_incremental_dedup_broadcasts_batch_side(spark):
    """The incremental dedup candidate join must broadcast the (small)
    batch side -- a sort-merge join there means the corpus bucket table
    started shuffling against the batch, defeating the incremental
    design."""
    from spatial.datapipe.dedup import incremental_dup_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    batch = (docs.where(F.col("doc_id") % 5 == 0)
             .withColumn("doc_id", F.col("doc_id") + 1_000_000)
             .withColumn("text", F.concat(F.col("text"), F.lit(" t"))))
    out = incremental_dup_pairs(docs, batch, threshold=0.7,
                                num_perm=64, bands=16)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan


def test_zorder_and_pyramid_plans_are_pure_jvm(spark):
    """No Python evaluation anywhere in the z-order key or tile pyramid
    plans (whole-stage codegen end to end)."""
    from spatial.tiles import tile_pyramid
    from spatial.zorder import with_zkey

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id",
        ((F.col("event_id") * 7919 % 36000).cast("double") / 100.0 - 180.0)
        .alias("lon"),
        ((F.col("event_id") * 104729 % 17000).cast("double") / 100.0 - 85.0)
        .alias("lat"))
    for q in (with_zkey(ev, "lon", "lat", 12),
              tile_pyramid(ev, "lon", "lat", base_zoom=6, min_zoom=4)):
        plan = _plan(q)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_repetition_signals_no_shuffle(spark):
    """The zero-shuffle claim on the real documents table: no Exchange in
    the physical plan."""
    from spatial.datapipe.textstats import repetition_signals

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(repetition_signals(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Both sides hash-bucketed+sorted on the join key: the sort-merge
    join must read bucket i vs bucket i directly -- zero Exchange, zero
    Sort in the physical plan (the write pre-paid the shuffle)."""
    from spatial.bucketing import bucketed_join, write_bucketed

    c = spark.read.parquet(f"{SF}/customer.parquet") \
        .select("c_custkey", "c_mktsegment")
    o = spark.read.parquet(f"{SF}/orders.parquet") \
        .select(F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    write_bucketed(c, "sg_pa_customer", "c_custkey", 4,
                   path="/tmp/sg_plan_audit/customer")
    write_bucketed(o, "sg_pa_orders", "c_custkey", 4,
                   path="/tmp/sg_plan_audit/orders")
    j = bucketed_join(spark, "sg_pa_customer", "sg_pa_orders", "c_custkey")
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # content identical to the plain join (layout never changes results)
    plain = c.join(o, "c_custkey")
    assert j.count() == plain.count()


def test_text_set_operators_are_pure_jvm(spark):
    """The round-3 text operators built on split/explode/window
    (set-similarity join, PMI collocations, inverted index) must stay
    whole-stage-codegen JVM: tokenization is F.split, never a Python UDF."""
    from spatial.datapipe.index import inverted_index
    from spatial.datapipe.setjoin import similarity_join
    from spatial.datapipe.textstats import pmi_bigrams

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    for q in (similarity_join(docs, 19, 20),
              pmi_bigrams(docs, k=10, min_count=3),
              inverted_index(docs, max_df=300, max_postings=8)):
        plan = _plan(q)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_polygon_join_plan_broadcast_and_geometry_free_candidates(spark):
    """polygon_join's scale claims, asserted on the physical plan: with a
    dim-sized right side (1) the candidate and geometry-attach joins
    broadcast -- no SortMergeJoin anywhere; (2) the candidate equi-join
    carries only (cell, id, bbox) -- the geometry struct must not appear
    below the candidate BroadcastExchange (it re-attaches by id after the
    canonical-corner dedup)."""
    from spatial.ewkb import ewkb_decode
    from spatial.overlay import polygon_join
    from spatial.synth import synth_regions

    A = synth_regions(spark).select(
        F.col("region_id").alias("region_a"),
        ewkb_decode("geom_hex").alias("geom"))
    B = synth_regions(spark, seed=202).select(
        F.col("region_id").alias("region_b"),
        ewkb_decode("geom_hex").alias("geom"))
    out = polygon_join(A, B, "region_a", "region_b")
    plan = _plan(out)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # structure: one join keyed on the cover cell (geometry-free candidate
    # side carries the __b* bbox columns), geometry re-attached by separate
    # joins keyed on the region ids
    assert "BroadcastHashJoin [cell" in plan
    assert "__bminx" in plan
    assert ("BroadcastHashJoin [region_b" in plan
            or "BroadcastHashJoin [region_a" in plan)


def test_lm_score_and_union_area_plans(spark):
    """Round-4 operators stay on the fast path: lm_score is pure JVM (no
    Python UDF anywhere -- the LM is two count aggregates + integer
    arithmetic), and union_area's slab join is an EQUI join on
    (key, x-bucket) -- a BroadcastNestedLoopJoin/CartesianProduct here is
    the within-key quasi-cartesian that measured 110s at bench shape
    before the bucket term was added."""
    from spatial.datapipe.textstats import lm_score
    from spatial.overlay import union_area

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
                .select("doc_id", "text")
    plan = _plan(lm_score(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    rects = spark.range(2000).select(
        (F.col("id") % 4).alias("key"),
        (F.col("id") * 37 % 5000).alias("xmin"),
        (F.col("id") * 91 % 5000).alias("ymin"),
        (F.col("id") * 37 % 5000 + 40).alias("xmax"),
        (F.col("id") * 91 % 5000 + 40).alias("ymax"))
    plan = _plan(union_area(rects, "key"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_nearest_route_plan_broadcast_and_partial_agg(spark):
    """q_nearest_route's scale claims on the physical plan: the dim route
    set broadcasts (BroadcastNestedLoopJoin -- the deliberate brute-force
    plan for a 24-row build side; no shuffle of the probe side before the
    aggregate), and the argmin is a map-side-combinable min(struct(...)):
    a partial_min must appear BELOW the exchange, so only one combined row
    per event crosses the wire, not the 24x candidate stream."""
    import __spark_entry__ as entry_mod

    out = entry_mod.queries()["q_nearest_route"](spark, SF)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_min" in plan
    # exactly ONE exchange: the final aggregation by event_id
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert body.count("Exchange hashpartitioning") == 1


def test_spatialstats_plans_pure_jvm(spark):
    """Moran's I and LISA never cross into Python: the centered transform,
    rook join and sums are all JVM column programs."""
    import __spark_entry__ as entry_mod

    for q in ("q_morans_i", "q_local_moran"):
        plan = _plan(entry_mod.queries()[q](spark, SF))
        assert "BatchEvalPython" not in plan, q
        assert "ArrowEvalPython" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_grid_areal_weights_plan_no_shuffle_before_kernel(spark):
    """grid_areal_weights is a projection + explode over the dim table:
    the only exchange in its plan is the window's partitionBy(region_id);
    the cover-cell explode and the clip kernel run shuffle-free."""
    import __spark_entry__ as entry_mod

    out = entry_mod.queries()["q_grid_areal_weights"](spark, SF)
    plan = _plan(out)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert body.count("Exchange hashpartitioning") == 1  # the window only
