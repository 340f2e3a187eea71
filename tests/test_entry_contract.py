"""Local re-implementation of the driver's verify: every queries() entry runs
at sf0.01; SQL-oracled entries must match DuckDB on row count, column names,
and order-insensitive values (the CORRECTNESS gate)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # bit-level like the driver's value hash: catches -0.0 vs +0.0,
        # which compare == but hash differently (the round-1 q_st_transform
        # failure mode)
        import struct
        return struct.pack("<d", v).hex()
    if hasattr(v, "is_integer") and not isinstance(v, (int, float)):  # Decimal
        return _norm(float(v))
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: rows may contain NULLs (None is not orderable against str)
    return sorted((tuple(_norm(r[i]) for i in order) for r in data), key=repr)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["tile_x", "tile_y", "n_points"]


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_data = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    d_cols = rel.columns
    d_data = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_data) == len(d_data), f"{name}: row count {len(s_data)} vs {len(d_data)}"
    sr = _rows(s_cols, s_data)
    dr = _rows(d_cols, d_data)
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_flagship_queries_inside_correctness_window():
    """The driver's correctness file records ~the first 50 queries() entries
    in registration order (round-2 finding: the 9 flagship operators
    registered last and fell outside it). Pin them to the front."""
    flagship = [
        "q_spatial_join_pages", "q_knn_grid", "q_minhash_pairs",
        # round-4 additions: never driver-recorded before, must be in the
        # round-4 window (q_geocode_rollup / q_s2_cell_rollup /
        # q_geom_collection / q_simhash_pairs / q_embedding_dups /
        # q_multimodal_features / q_ann_ivf / q_knn_distributed /
        # q_spatial_join_salted made room -- all nine recorded green in
        # r1-r3)
        "q_span_dedup", "q_span_dedup_clean", "q_winnow",
        "q_lm_score", "q_cluster_split", "q_stream_enrich", "q_union_area",
        "q_curation_pipeline",
        "q_spatial_join_regions", "q_intersection_area",
        "q_intersection_area_general", "q_stream_late",
    ]
    order = list(entry_mod.queries())
    for name in flagship:
        assert order.index(name) < 50, f"{name} registered at {order.index(name)}"


def test_round4_window_covers_never_recorded_queries():
    """Round-4 rotation (VERDICT r3 task #1): the first 50 registry entries
    must include every query that had never appeared in any
    CORRECTNESS_r{1,2,3}.json, so cumulative driver-proven coverage reaches
    122/122. The historical recorded sets are pinned from the committed
    correctness files."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    recorded: set = set()
    for f in ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json",
              "CORRECTNESS_r03.json"]:
        recorded |= set(json.loads((root / f).read_text()))
    order = list(entry_mod.queries())
    window = set(order[:50])
    # Queries added AFTER the round-4 window freeze: the window is full at
    # the 3-sentinel minimum with never-recorded queries, so these register
    # past it (oracle-verified by the full replay below) and are the
    # round-5 window-rotation candidates. Pinned by name so any OTHER
    # never-recorded query outside the window still fails this test.
    post_freeze = {"q_overlay_areas", "q_line_polygon_join",
                   "q_route_region_length", "q_line_line_join",
                   "q_grid_areal_weights", "q_nearest_route", "q_dbscan",
                   "q_morans_i", "q_local_moran", "q_line_locate",
                   "q_route_dwithin"}
    missing = [q for q in order if q not in recorded and q not in window
               and q not in post_freeze]
    assert not missing, f"never-driver-recorded queries outside window: {missing}"


def test_documented_counts_match_registry():
    """One source of truth, enforced (VERDICT r2 task #8): the query count
    claimed in COVERAGE.md / BENCH/BASELINE.md / README.md must equal
    len(queries()) == len(oracle_sql()). Counts drifted twice in round 2
    before being hand-resynced; this pins them."""
    import pathlib
    import re

    n = len(entry_mod.queries())
    assert n == len(entry_mod.oracle_sql()), \
        "every queries() entry needs an oracle_sql() entry (and vice versa)"
    root = pathlib.Path(__file__).resolve().parent.parent
    claims = {
        "COVERAGE.md": r"\*\*Totals:\*\* (\d+) `queries\(\)` entries, "
                       r"\*\*(\d+) with exact DuckDB oracles\*\*",
        "BENCH/BASELINE.md": r"(\d+) queries, \*\*(\d+) with exact DuckDB",
        "README.md": r"\*\*(\d+) driver queries",
    }
    for rel, pat in claims.items():
        text = (root / rel).read_text()
        m = re.search(pat, text)
        assert m, f"{rel}: count claim line not found (pattern {pat!r})"
        for g in m.groups():
            assert int(g) == n, f"{rel} claims {g} queries, registry has {n}"


@pytest.mark.parametrize("name", sorted(set(entry_mod.queries())
                                        - set(entry_mod.oracle_sql())))
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    # every rows-only operator must actually produce rows on this data
    assert n > 0, f"{name} produced no rows at sf0.01"
