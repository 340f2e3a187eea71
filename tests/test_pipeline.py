"""E2E flagship pipeline: determinism, parallelism-invariance, kill/resume
byte-identity (FIXTURES.md §5, BASELINE.json input_hint invariants)."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from spatial.pipeline import (
    PipelineConfig,
    committed_batches,
    read_output,
    run_pipeline,
)
from spatial.synth import synth_pages, synth_regions
from spatial.textextract import extract_text_py

N_PAGES = 3000

GOLDEN_HTML = (b"<html><head><title>t</title><script>var x=1;</script>"
               b"<style>.a{}</style></head><body><h1>Doc &amp; 7</h1>"
               b"<p>hello  world</p><!-- c --></body></html>")
GOLDEN_TEXT = "t Doc & 7 hello world"


def test_extract_text_golden_pin():
    """The extraction function is golden-pinned: changing it breaks the
    byte-identity invariant and MUST fail here first."""
    assert extract_text_py(GOLDEN_HTML) == GOLDEN_TEXT
    assert extract_text_py(None) is None
    assert extract_text_py(b"") == ""
    # deterministic replacement for invalid utf-8
    assert extract_text_py(b"<p>a\xffb</p>") == "a�b"


def _run(spark, tmp, **kw):
    pages = synth_pages(spark, N_PAGES)
    regions = synth_regions(spark)
    cfg = PipelineConfig(out_dir=str(tmp), **kw)
    return run_pipeline(spark, pages, regions, cfg)


def _table_hash(spark, out_dir, table, cols):
    df = read_output(spark, str(out_dir), table).select(*cols)
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.sha256(repr(rows).encode()).hexdigest(), len(rows)


def test_pipeline_end_to_end(spark, tmp_path):
    res = _run(spark, tmp_path / "a")
    assert res["committed"] == [0, 1, 2, 3]
    h, n = _table_hash(spark, tmp_path / "a", "join_out",
                       ["url", "region_id", "x", "y"])
    assert n > 0
    ht, nt = _table_hash(spark, tmp_path / "a", "tile_assign",
                         ["url", "tile_z", "tile_x", "tile_y"])
    assert nt > 0
    # metrics exist with per-partition rows
    m = read_output(spark, str(tmp_path / "a"), "metrics")
    assert m.agg(F.sum("rows_out")).first()[0] == n


def test_kill_and_resume_byte_identical(spark, tmp_path):
    # uninterrupted run
    _run(spark, tmp_path / "full")
    want = _table_hash(spark, tmp_path / "full", "join_out",
                       ["url", "region_id", "x", "y"])

    # killed after batch 1, then resumed
    pages = synth_pages(spark, N_PAGES)
    regions = synth_regions(spark)
    cfg = PipelineConfig(out_dir=str(tmp_path / "resumed"))
    with pytest.raises(RuntimeError, match="simulated failure"):
        run_pipeline(spark, pages, regions, cfg, fail_after_batch=1)
    assert committed_batches(cfg.out_dir) == {0, 1}
    res = run_pipeline(spark, pages, regions, cfg)
    assert res["ran_batches"] == [2, 3]  # committed batches were skipped
    got = _table_hash(spark, tmp_path / "resumed", "join_out",
                      ["url", "region_id", "x", "y"])
    assert got == want


def test_parallelism_invariance(spark, tmp_path):
    """Same outputs at different partition counts (sandbox proxy for the
    N-vs-4N-executor invariance required by the north rule)."""
    pages2 = synth_pages(spark, N_PAGES, partitions=2)
    pages8 = synth_pages(spark, N_PAGES, partitions=8)
    regions = synth_regions(spark)
    for name, p in [("p2", pages2), ("p8", pages8)]:
        run_pipeline(spark, p, regions, PipelineConfig(out_dir=str(tmp_path / name)))
    a = _table_hash(spark, tmp_path / "p2", "join_out", ["url", "region_id", "x", "y"])
    b = _table_hash(spark, tmp_path / "p8", "join_out", ["url", "region_id", "x", "y"])
    assert a == b


def test_join_out_matches_oracle(spark, tmp_path):
    """join_out rows == pure-Python PIP oracle over the same synthetic rows."""
    import numpy as np

    from spatial.ewkb import decode_hex
    from spatial.kernels import pip_even_odd
    from spatial.pipeline import enrich_pages

    pages = synth_pages(spark, N_PAGES)
    regions = synth_regions(spark)
    _run(spark, tmp_path / "o")
    got = {
        (r["url"], r["region_id"])
        for r in read_output(spark, str(tmp_path / "o"), "join_out").collect()
    }
    located = enrich_pages(pages, 12).select("url", "lon", "lat").toPandas()
    want = set()
    for rid, _, ghex in regions.collect():
        g = decode_hex(ghex)
        inside = pip_even_odd(located.lon.to_numpy(), located.lat.to_numpy(),
                              g.xs, g.ys, g.ring_offsets)
        for u in located.url.to_numpy()[inside]:
            want.add((u, rid))
    assert got == want


def test_cluster_cells_output_identical_and_range_partitioned(spark, tmp_path):
    """cluster_cells=N must not change the join_out row set, and each written
    parquet part file must own a cell interval disjoint from the others."""
    import pyarrow.parquet as pq

    _run(spark, tmp_path / "plain")
    _run(spark, tmp_path / "clustered", cluster_cells=4)
    h1, n1 = _table_hash(spark, tmp_path / "plain", "join_out",
                         ["url", "region_id", "x", "y"])
    h2, n2 = _table_hash(spark, tmp_path / "clustered", "join_out",
                         ["url", "region_id", "x", "y"])
    assert (h1, n1) == (h2, n2)

    # per-file cell min/max from parquet footers, per batch dir
    import glob
    import os

    for bdir in sorted(glob.glob(str(tmp_path / "clustered" / "join_out" / "batch=*"))):
        spans = []
        for f in glob.glob(os.path.join(bdir, "*.parquet")):
            pf = pq.ParquetFile(f)
            ci = pf.schema_arrow.names.index("cell")
            md = pf.metadata
            stats = [md.row_group(i).column(ci).statistics
                     for i in range(md.num_row_groups)]
            spans.append((min(s.min for s in stats), max(s.max for s in stats)))
        assert len(spans) > 1  # clustering actually produced multiple files
        spans.sort()
        for (l1, u1), (l2, u2) in zip(spans, spans[1:]):
            assert u1 <= l2, (u1, l2)
