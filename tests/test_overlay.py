"""Polygon x polygon overlay join + convex clip (spatial/overlay.py).

Ground truth for the pair predicate comes from hand-constructed
configurations with known answers (incl. the hole case an even-odd cast
must get right); the join plan is tested for broadcast/shuffle parity and
for exactly-once pair emission (the canonical-corner dedup claim). The
convex clip is pinned against closed-form rectangle/hexagon intersections
and against kernels.clip_ring_bbox on rectangle clippers.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial.overlay import (
    _poly_arrays,
    convex_clip_ring,
    polygon_join,
    polygons_properly_intersect,
    shoelace_area_abs,
)


def _P(rings):
    xs, ys, ro = [], [], [0]
    for r in rings:
        for x, y in r:
            xs.append(float(x))
            ys.append(float(y))
        ro.append(len(xs))
    return _poly_arrays(xs, ys, ro)


def _sq(x0, y0, s):
    return [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)]


A = _P([_sq(0, 0, 4)])


@pytest.mark.parametrize("name,a,b,want", [
    ("disjoint", A, _P([_sq(10, 10, 2)]), False),
    ("corner overlap", A, _P([_sq(3, 3, 4)]), True),
    ("nested", A, _P([_sq(1, 1, 1)]), True),
    ("nested reversed", _P([_sq(1, 1, 1)]), A, True),
    # no vertex of either inside the other; edges must catch it
    ("plus-cross", _P([[(-1, 1), (5, 1), (5, 2), (-1, 2), (-1, 1)]]),
     _P([[(1, -1), (2, -1), (2, 5), (1, 5), (1, -1)]]), True),
    # B entirely inside A's hole: even-odd parity must say NO
    ("in-hole", _P([_sq(0, 0, 6), _sq(2, 2, 2)]),
     _P([_sq(2.5, 2.5, 1)]), False),
    # B straddles the hole boundary: YES
    ("hole-straddle", _P([_sq(0, 0, 6), _sq(2, 2, 2)]),
     _P([_sq(1.5, 1.5, 1)]), True),
])
def test_pair_predicate_ground_truth(name, a, b, want):
    assert polygons_properly_intersect(a, b) == want, name


def test_pair_predicate_boundary_tiebreak_documented():
    """Boundary-only contact (module docstring): for touching axis-aligned
    boxes some vertex always lands on the other polygon's counted
    bottom/left boundary, so all four simple touches read as intersecting
    (the closed-set ST_Intersects answer). Pinned so the deterministic
    tie-break semantics can't drift silently."""
    for b in [_P([_sq(4, 0, 2)]), _P([_sq(-2, 0, 2)]),
              _P([_sq(0, 4, 2)]), _P([_sq(0, -2, 2)])]:
        assert polygons_properly_intersect(A, b) is True


def _fixture_frames(spark):
    from spatial.ewkb import ewkb_decode
    from spatial.synth import synth_regions

    A_ = synth_regions(spark).select(
        F.col("region_id").alias("region_a"),
        ewkb_decode("geom_hex").alias("geom"))
    B_ = synth_regions(spark, seed=202).select(
        F.col("region_id").alias("region_b"),
        ewkb_decode("geom_hex").alias("geom"))
    return A_, B_


def test_polygon_join_broadcast_equals_shuffle(spark):
    """Forcing the non-broadcast path (threshold 0) must give the identical
    pair set -- the physical strategy is correctness-neutral."""
    A_, B_ = _fixture_frames(spark)
    bc = sorted(tuple(r) for r in polygon_join(
        A_, B_, "region_a", "region_b").collect())
    sh = sorted(tuple(r) for r in polygon_join(
        A_, B_, "region_a", "region_b", broadcast_threshold=0).collect())
    assert bc == sh and len(bc) > 0


def test_polygon_join_emits_each_pair_once(spark):
    """Canonical-corner dedup: every surviving pair exactly once even when
    bboxes share many cover cells (forced by a fine level)."""
    A_, B_ = _fixture_frames(spark)
    rows = [tuple(r) for r in polygon_join(
        A_, B_, "region_a", "region_b", level=8).collect()]
    assert len(rows) == len(set(rows))
    # same pair set as the auto-picked level
    auto = sorted(tuple(r) for r in polygon_join(
        A_, B_, "region_a", "region_b").collect())
    assert sorted(rows) == auto


def test_polygon_join_matches_bruteforce_kernel(spark):
    """The distributed plan must equal the driver-side all-pairs kernel
    (candidate pruning is a guaranteed superset; refine decides)."""
    from spatial.synth import region_rings

    A_, B_ = _fixture_frames(spark)
    got = sorted(tuple(r) for r in polygon_join(
        A_, B_, "region_a", "region_b").collect())
    pa = {rid: _P(rings) for rid, _c, rings in region_rings()}
    pb = {rid: _P(rings) for rid, _c, rings in region_rings(seed=202)}
    want = sorted((i, j) for i in pa for j in pb
                  if polygons_properly_intersect(pa[i], pb[j]))
    assert got == want


# ---------------------------------------------------------------------------
# line x polygon
# ---------------------------------------------------------------------------

def _L(parts):
    from spatial.overlay import _line_arrays

    xs, ys, ro = [], [], [0]
    for part in parts:
        for x, y in part:
            xs.append(float(x))
            ys.append(float(y))
        ro.append(len(xs))
    return _line_arrays(xs, ys, ro)


@pytest.mark.parametrize("name,line,poly,want", [
    ("disjoint", _L([[(10, 10), (12, 12)]]), A, False),
    ("fully inside (no edge crossing)", _L([[(1, 1), (2, 2)]]), A, True),
    # passes straight through: NO line vertex inside, edges must catch it
    ("pass-through", _L([[(-1, 2), (5, 2.1)]]), A, True),
    ("one endpoint inside", _L([[(2, 2), (9, 9)]]), A, True),
    # line entirely within the hole of a holed polygon: even-odd says NO
    ("in-hole", _L([[(2.5, 2.5), (3.5, 3.6)]]),
     _P([_sq(0, 0, 6), _sq(2, 2, 2)]), False),
    # crosses from the hole into the polygon body: YES
    ("hole-escape", _L([[(2.5, 2.5), (5.5, 5.6)]]),
     _P([_sq(0, 0, 6), _sq(2, 2, 2)]), True),
    # only the SECOND part of a multi-part line touches
    ("second-part hit", _L([[(10, 10), (12, 12)], [(1, 1), (2, 2)]]),
     A, True),
    # 2-point parts too short for _ring_edges' ring logic still work
    ("two-point crossing", _L([[(-1, 2), (5, 2.3)]]), A, True),
])
def test_line_polygon_predicate_ground_truth(name, line, poly, want):
    from spatial.overlay import line_intersects_polygon

    assert line_intersects_polygon(line, poly) == want, name


def test_line_polygon_join_matches_bruteforce_kernel(spark):
    """Distributed line x polygon plan == driver all-pairs kernel, and the
    route fixture exercises every predicate branch (vertex-containment
    only, crossing only, both) plus a multi-part-only hit."""
    from spatial.ewkb import ewkb_decode
    from spatial.kernels import _segments_intersect, pip_even_odd
    from spatial.overlay import line_intersects_polygon, line_polygon_join
    from spatial.synth import (region_rings, route_lines, synth_regions,
                               synth_routes)

    L_ = synth_routes(spark).select(
        "route_id", ewkb_decode("geom_hex").alias("geom"))
    R_ = synth_regions(spark).select(
        "region_id", ewkb_decode("geom_hex").alias("geom"))
    got = sorted(tuple(r) for r in line_polygon_join(
        L_, R_, "route_id", "region_id").collect())
    sh = sorted(tuple(r) for r in line_polygon_join(
        L_, R_, "route_id", "region_id", broadcast_threshold=0).collect())
    assert got == sh, "broadcast vs shuffle path disagree"

    la = {rid: _L(parts) for rid, parts in route_lines()}
    pa = {rid: _P(rings) for rid, _c, rings in region_rings()}
    want = sorted((i, j) for i in la for j in pa
                  if line_intersects_polygon(la[i], pa[j]))
    assert got == want and len(got) > 0

    branches = {"vertex_only": 0, "cross_only": 0, "both": 0}
    for (i, j) in got:
        lx, ly, (l1x, l1y, l2x, l2y) = la[i]
        px, py, pro, (p1x, p1y, p2x, p2y) = pa[j]
        vin = bool(pip_even_odd(lx, ly, px, py, pro).any())
        cross = bool(_segments_intersect(
            (l1x[:, None], l1y[:, None]), (l2x[:, None], l2y[:, None]),
            (p1x[None, :], p1y[None, :]), (p2x[None, :], p2y[None, :])).any())
        branches["both" if (vin and cross) else
                 "vertex_only" if vin else "cross_only"] += 1
    assert all(v > 0 for v in branches.values()), branches


def test_line_line_join_matches_bruteforce(spark):
    """Distributed line x line plan == driver all-pairs strict-crossing
    test, broadcast == shuffle, and hand cases pin the predicate."""
    from spatial.ewkb import ewkb_decode
    from spatial.kernels import _segments_intersect
    from spatial.overlay import line_line_join
    from spatial.synth import route_lines, synth_routes

    def crosses(a, b):
        (a1x, a1y, a2x, a2y) = a[2]
        (b1x, b1y, b2x, b2y) = b[2]
        if len(a1x) == 0 or len(b1x) == 0:
            return False
        return bool(_segments_intersect(
            (a1x[:, None], a1y[:, None]), (a2x[:, None], a2y[:, None]),
            (b1x[None, :], b1y[None, :]), (b2x[None, :], b2y[None, :])).any())

    # hand cases: X-cross yes; parallel no; T-touch (endpoint on interior) no
    assert crosses(_L([[(0, 0), (2, 2)]]), _L([[(0, 2), (2, 0)]]))
    assert not crosses(_L([[(0, 0), (2, 0)]]), _L([[(0, 1), (2, 1)]]))
    assert not crosses(_L([[(0, 0), (2, 0)]]), _L([[(1, 0), (1, 2)]]))

    A_ = synth_routes(spark).select(
        F.col("route_id").alias("line_a"), ewkb_decode("geom_hex").alias("geom"))
    B_ = synth_routes(spark, seed=11).select(
        F.col("route_id").alias("line_b"), ewkb_decode("geom_hex").alias("geom"))
    got = sorted(tuple(r) for r in line_line_join(A_, B_).collect())
    sh = sorted(tuple(r) for r in line_line_join(
        A_, B_, broadcast_threshold=0).collect())
    assert got == sh
    la = {rid: _L(parts) for rid, parts in route_lines()}
    lb = {rid: _L(parts) for rid, parts in route_lines(seed=11)}
    want = sorted((i, j) for i in la for j in lb if crosses(la[i], lb[j]))
    assert got == want and len(got) > 0


@pytest.mark.parametrize("name,line,poly,want_micro", [
    # horizontal pass through the 4x4 square: inside length = 4
    ("pass-through", _L([[(-1, 2), (5, 2)]]), A, 4_000_000),
    # wholly inside: full length 2
    ("inside", _L([[(1, 1), (3, 1)]]), A, 2_000_000),
    ("disjoint", _L([[(10, 0), (12, 0)]]), A, 0),
    # through the holed 6x6 square (hole 2..4): 6 - 2 = 4
    ("hole subtracts", _L([[(-1, 3), (7, 3)]]),
     _P([_sq(0, 0, 6), _sq(2, 2, 2)]), 4_000_000),
    # diagonal corner cut of the unit square at y = 1 - x: from (0.5, 0.5)
    # to edges -> length inside = hypot(.5,.5)*2 = sqrt(2)/2... use exact:
    # segment (0,1)-(1,0) lies inside the 4x4 square entirely: sqrt(2)
    ("diagonal", _L([[(0.25, 1), (1.25, 0.0001)]]), A, 1_414_284),
    # both parts contribute: 1 + 2
    ("multi-part", _L([[(1, 1), (2, 1)], [(1, 2), (3, 2)]]), A, 3_000_000),
])
def test_line_clip_length_ground_truth(name, line, poly, want_micro):
    from spatial.overlay import line_clip_length_micro

    got = line_clip_length_micro(line, poly)
    if name == "diagonal":
        import math
        want_micro = int(math.floor(
            math.hypot(1.0, 0.9999) * 1000000.0 + 0.5))
    assert got == want_micro, (name, got, want_micro)


def test_point_line_dist_sq_known_values(spark):
    """Closed-form checks of the squared point-to-polyline distance:
    projection interior, endpoint clamp, vertex corner, multi-part min."""
    from spatial.ewkb import encode_hex, ewkb_decode
    from spatial.geometry import linestring, multilinestring
    from spatial.overlay import make_point_line_dist_sq

    geoms = {
        # horizontal segment y=0, x in [0, 10]
        1: linestring([(0, 0), (10, 0)], srid=4326),
        # L-shape with corner at (5, 5)
        2: linestring([(0, 5), (5, 5), (5, 0)], srid=4326),
        # two parts: far part and near part; no bridge segment between
        3: multilinestring([[(100, 100), (101, 100)], [(0, 3), (10, 3)]],
                           srid=4326),
    }
    cases = [  # (geom_id, px, py, want_d2)
        (1, 3.0, 4.0, 16.0),      # interior projection -> (3, 0)
        (1, -3.0, 4.0, 25.0),     # clamp to endpoint (0,0): 9+16
        (1, 13.0, -4.0, 25.0),    # clamp to endpoint (10,0)
        (2, 7.0, 7.0, 8.0),       # nearest is corner vertex (5,5)
        (3, 5.0, 0.0, 9.0),       # near part wins; if a phantom bridge
                                  # segment existed it would pass closer
    ]
    rows = [(gid, px, py, encode_hex(geoms[gid]))
            for (gid, px, py, _w) in cases]
    df = spark.createDataFrame(
        rows, "gid long, px double, py double, geom_hex string")
    d2 = make_point_line_dist_sq()
    got = {(r["gid"], r["px"]): r["d2"] for r in df.select(
        "gid", "px", d2("px", "py", ewkb_decode("geom_hex")).alias("d2")
    ).collect()}
    for gid, px, py, want in cases:
        assert got[(gid, px)] == want, (gid, px, py, got[(gid, px)], want)


def test_point_line_locate_known_values(spark):
    """Closed-form linear referencing: interior projection t, endpoint
    clamps, nearest-segment index on an L-shape, and the shared-vertex
    tie resolving to the LOWER segment index with t=1."""
    from spatial.ewkb import encode_hex, ewkb_decode
    from spatial.geometry import linestring
    from spatial.overlay import make_point_line_locate

    L = linestring([(0, 0), (10, 0), (10, 10)], srid=4326)
    cases = [  # (px, py, want_seg, want_t, want_d2)
        (3.0, 4.0, 0, 0.3, 16.0),     # interior of segment 0
        (-5.0, 0.0, 0, 0.0, 25.0),    # clamp to start
        (12.0, 5.0, 1, 0.5, 4.0),     # interior of segment 1
        (14.0, -3.0, 0, 1.0, 25.0),   # equidistant corner (10,0): both
                                      # segs give d2=25 -> seg 0, t=1
    ]
    rows = [(i, px, py, encode_hex(L)) for i, (px, py, *_ ) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, px double, py double, g string")
    loc = make_point_line_locate()
    got = {r["i"]: (r["L"]["seg"], r["L"]["t"], r["L"]["d2"])
           for r in df.select("i", loc("px", "py",
                                       ewkb_decode("g")).alias("L")).collect()}
    for i, (_px, _py, seg, t, d2) in enumerate(cases):
        assert got[i] == (seg, t, d2), (i, got[i])


def test_line_dwithin_join_matches_bruteforce(spark):
    """Grid-pruned dwithin join == driver all-pairs d2 <= eps^2 over the
    route fixture at a non-query eps, each pair exactly once, and the
    forced-shuffle path agrees."""
    from spatial.ewkb import ewkb_decode
    from spatial.overlay import line_dwithin_join
    from spatial.synth import route_lines, synth_routes

    eps = 1.5
    pts = [(i, -180.0 + (i * 77 % 3600) / 10.0, -85.0 + (i * 131 % 1700) / 10.0)
           for i in range(800)]
    P = spark.createDataFrame(pts, "pid long, x double, y double")
    R = synth_routes(spark).select(
        "route_id", ewkb_decode("geom_hex").alias("geom"))
    got = [(r["pid"], r["route_id"]) for r in line_dwithin_join(
        P, R, eps=eps, point_id="pid", line_id="route_id").collect()]
    assert len(got) == len(set(got)), "duplicate pair emitted"
    sh = sorted((r["pid"], r["route_id"]) for r in line_dwithin_join(
        P, R, eps=eps, point_id="pid", line_id="route_id",
        broadcast_threshold=0).collect())
    assert sorted(got) == sh

    la = {rid: _L(parts) for rid, parts in route_lines()}

    def d2_min(px, py, line):
        import numpy as np
        (l1x, l1y, l2x, l2y) = line[2]
        dx, dy = l2x - l1x, l2y - l1y
        L2 = dx * dx + dy * dy
        tr = ((px - l1x) * dx + (py - l1y) * dy) / np.where(L2 > 0, L2, 1.0)
        t = np.where(L2 > 0, np.clip(tr, 0.0, 1.0), 0.0)
        ddx = px - (l1x + t * dx)
        ddy = py - (l1y + t * dy)
        return float((ddx * ddx + ddy * ddy).min())

    want = sorted((pid, rid) for pid, px, py in pts for rid in la
                  if d2_min(px, py, la[rid]) <= eps * eps)
    assert sorted(got) == want and len(want) > 0


def test_grid_areal_weights_hand_and_conservation(spark):
    """Hand case: a 2x2 square at (0.5, 0.5) splits 4 quarter-cells of 1e6
    micro each; the holed fixture regions conserve total area across cells
    within the per-cell half-unit quantization slack, and the window
    denominator equals the sum."""
    import collections
    import math

    from spatial.ewkb import encode_hex, ewkb_decode
    from spatial.geometry import polygon
    from spatial.overlay import grid_areal_weights, shoelace_area_abs
    from spatial.synth import region_rings, synth_regions

    sq = [(0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5), (0.5, 0.5)]
    df = spark.createDataFrame(
        [(0, encode_hex(polygon([sq], srid=4326)))],
        "region_id long, geom_hex string").select(
        "region_id", ewkb_decode("geom_hex").alias("geom"))
    got = {(r["gx"], r["gy"]): (r["area_micro"], r["region_total_micro"])
           for r in grid_areal_weights(df).collect()}
    want_cells = {(0, 0): 250000, (1, 0): 500000, (2, 0): 250000,
                  (0, 1): 500000, (1, 1): 1000000, (2, 1): 500000,
                  (0, 2): 250000, (1, 2): 500000, (2, 2): 250000}
    assert {k: v[0] for k, v in got.items()} == want_cells
    assert all(v[1] == 4000000 for v in got.values())

    R = synth_regions(spark).select(
        "region_id", ewkb_decode("geom_hex").alias("geom"))
    rows = grid_areal_weights(R).collect()
    tot = collections.defaultdict(int)
    ncells = collections.defaultdict(int)
    for r in rows:
        tot[r["region_id"]] += r["area_micro"]
        ncells[r["region_id"]] += 1
        assert r["area_micro"] > 0
    for rid, _c, rings in region_rings():
        want = sum((1 if k == 0 else -1)
                   * shoelace_area_abs([(x, y) for x, y in ring[:-1]]) * 1e6
                   for k, ring in enumerate(rings))
        assert abs(tot[rid] - want) <= 0.5 * ncells[rid] + 1.0, rid
    totals = {r["region_id"]: r["region_total_micro"] for r in rows}
    assert all(totals[k] == tot[k] for k in tot)


# ---------------------------------------------------------------------------
# convex clip
# ---------------------------------------------------------------------------

def test_convex_clip_matches_rect_clip_kernel():
    """On a rectangle clipper the generalized Sutherland-Hodgman must agree
    with kernels.clip_ring_bbox (same algorithm, specialized) on the
    clipped area for random rings."""
    from spatial.kernels import clip_ring_bbox

    rng = np.random.default_rng(5)
    rect = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    for _ in range(50):
        n = int(rng.integers(5, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(0.5, 5.0, n)
        xs = (2.0 + r * np.cos(ang)).tolist() + [2.0 + r[0] * np.cos(ang[0])]
        ys = (2.0 + r * np.sin(ang)).tolist() + [2.0 + r[0] * np.sin(ang[0])]
        verts = convex_clip_ring(xs, ys, [p[0] for p in rect],
                                 [p[1] for p in rect])
        cx, cy = clip_ring_bbox(xs, ys, 0.0, 0.0, 4.0, 4.0)
        want = shoelace_area_abs(list(zip(cx[:-1], cy[:-1])))
        got = shoelace_area_abs(verts)
        assert got == pytest.approx(want, rel=1e-12)


def test_convex_clip_known_areas():
    # unit square clipped by itself -> area 1
    sq = _sq(0, 0, 1)
    v = convex_clip_ring([p[0] for p in sq], [p[1] for p in sq],
                         [p[0] for p in sq], [p[1] for p in sq])
    assert shoelace_area_abs(v) == pytest.approx(1.0)
    # half-overlapping squares -> 0.5
    sq2 = _sq(0.5, 0, 1)
    v = convex_clip_ring([p[0] for p in sq], [p[1] for p in sq],
                         [p[0] for p in sq2], [p[1] for p in sq2])
    assert shoelace_area_abs(v) == pytest.approx(0.5)
    # disjoint -> 0
    sq3 = _sq(5, 5, 1)
    v = convex_clip_ring([p[0] for p in sq], [p[1] for p in sq],
                         [p[0] for p in sq3], [p[1] for p in sq3])
    assert shoelace_area_abs(v) == 0.0
    # subject fully inside clipper -> subject area
    big = _sq(-10, -10, 20)
    v = convex_clip_ring([p[0] for p in sq], [p[1] for p in sq],
                         [p[0] for p in big], [p[1] for p in big])
    assert shoelace_area_abs(v) == pytest.approx(1.0)


def test_clip_area_commutes_for_convex_pairs():
    """For two convex rings, clip(A by B) and clip(B by A) describe the
    same region -- areas must agree to float tolerance."""
    rng = np.random.default_rng(9)
    for _ in range(25):
        def hexring(cx, cy, r):
            ang = np.arange(6) * np.pi / 3.0
            pts = [(float(cx + r * np.cos(a)), float(cy + r * np.sin(a)))
                   for a in ang]
            return pts + [pts[0]]
        h1 = hexring(0, 0, rng.uniform(0.5, 2.0))
        h2 = hexring(rng.uniform(-1, 1), rng.uniform(-1, 1),
                     rng.uniform(0.5, 2.0))
        a1 = shoelace_area_abs(convex_clip_ring(
            [p[0] for p in h1], [p[1] for p in h1],
            [p[0] for p in h2], [p[1] for p in h2]))
        a2 = shoelace_area_abs(convex_clip_ring(
            [p[0] for p in h2], [p[1] for p in h2],
            [p[0] for p in h1], [p[1] for p in h1]))
        assert a1 == pytest.approx(a2, rel=1e-9, abs=1e-12)


def test_union_area_matches_pixel_bruteforce(spark):
    """union_area vs exhaustive pixel counting on small integer rects
    (unit-cell coverage IS the union area for integer coordinates), plus
    hand cases: disjoint, nested, partial overlap, exact duplicates."""
    from spatial.overlay import union_area

    hand = [
        # key 0: two disjoint 2x2 squares -> 8
        (0, 0, 0, 2, 2), (0, 10, 10, 12, 12),
        # key 1: nested (big 10x10 contains small) -> 100
        (1, 0, 0, 10, 10), (1, 2, 2, 5, 5),
        # key 2: partial overlap 4x4 + 4x4 shifted by 2 -> 16+16-4 = 28
        (2, 0, 0, 4, 4), (2, 2, 2, 6, 6),
        # key 3: exact duplicates -> counted once, 9
        (3, 1, 1, 4, 4), (3, 1, 1, 4, 4),
    ]
    rng = np.random.default_rng(41)
    rand = []
    for i in range(120):
        x0, y0 = int(rng.integers(0, 60)), int(rng.integers(0, 60))
        rand.append((4 + i % 3, x0, y0,
                     x0 + int(rng.integers(1, 14)),
                     y0 + int(rng.integers(1, 14))))
    rows = hand + rand
    df = spark.createDataFrame(
        rows, "key long, xmin long, ymin long, xmax long, ymax long")
    got = {r["key"]: r["union_area"]
           for r in union_area(df, "key").collect()}

    want: dict = {}
    for key in sorted({r[0] for r in rows}):
        grid = np.zeros((80, 80), dtype=bool)
        for k, x0, y0, x1, y1 in rows:
            if k == key:
                grid[x0:x1, y0:y1] = True
        want[key] = int(grid.sum())
    assert got == want
    assert got[0] == 8 and got[1] == 100 and got[2] == 28 and got[3] == 9

    # DuckDB oracle replay on the same rows: bit-identical integers
    import duckdb

    from spatial.overlay import union_area_oracle_sql

    vals = ",".join(f"({k},{a},{b},{c},{d})" for k, a, b, c, d in rows)
    cte = ("SELECT * FROM (VALUES " + vals
           + ") AS t(key, xmin, ymin, xmax, ymax)")
    ora = {r[0]: r[1]
           for r in duckdb.sql(union_area_oracle_sql(cte, "key")).fetchall()}
    assert ora == want


def test_intersection_area_general_ground_truth(spark):
    """General (concave + holed) intersection area vs three independent
    ground truths: an exact hand case with a hole, rasterized Monte-Carlo
    area on the real fixture, and agreement with the convex-clip kernel
    where both apply."""
    from spatial.overlay import (convex_clip_ring, make_intersection_area_general,
                                 shoelace_area_abs, triangulate_ring)
    from spatial.ewkb import encode_hex
    from spatial.geometry import polygon
    from spatial.ewkb import ewkb_decode as dec
    import __spark_entry__ as entry_mod

    def sq(x0, y0, s):
        r = [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)]
        return [(float(a), float(b)) for a, b in r] + [(float(x0), float(y0))]

    inter = make_intersection_area_general()
    # A = 10x10 square with a 2x2 hole; B = 20x20 covering everything
    # -> exact area = 100 - 4 = 96
    rows = [(1, encode_hex(polygon([sq(0, 0, 10), sq(4, 4, 2)], srid=4326)),
             encode_hex(polygon([sq(-5, -5, 20)], srid=4326))),
            # disjoint -> 0
            (2, encode_hex(polygon([sq(0, 0, 2)], srid=4326)),
             encode_hex(polygon([sq(50, 50, 2)], srid=4326))),
            # partial: 4x4 at origin vs 4x4 at (2,2) -> 4
            (3, encode_hex(polygon([sq(0, 0, 4)], srid=4326)),
             encode_hex(polygon([sq(2, 2, 4)], srid=4326)))]
    df = spark.createDataFrame(rows, "rid long, a string, b string")
    got = {r["rid"]: r["am"] for r in
           df.select("rid", inter(dec("a"), dec("b")).alias("am")).collect()}
    assert got == {1: 96_000_000, 2: 0, 3: 4_000_000}

    # fixture pairs vs dense-grid rasterization (even-odd, holes subtract)
    fixture = entry_mod._general_overlay_fixture()[:4]
    rows = [(rid, encode_hex(polygon(rings, srid=4326)),
             encode_hex(polygon([star], srid=4326)))
            for rid, rings, star in fixture]
    df = spark.createDataFrame(rows, "rid long, a string, b string")
    got = {r["rid"]: r["am"] / 1e6 for r in
           df.select("rid", inter(dec("a"), dec("b")).alias("am")).collect()}

    def inside(ring, px, py):
        n = len(ring) - 1
        c = False
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[i + 1]
            if (y1 > py) != (y2 > py):
                xc = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
                if px < xc:
                    c = not c
        return c

    for rid, rings, star in fixture:
        xs = [p[0] for ring in rings + [star] for p in ring]
        ys = [p[1] for ring in rings + [star] for p in ring]
        x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
        n = 260
        hits = 0
        for i in range(n):
            for j in range(n):
                px = x0 + (i + 0.5) * (x1 - x0) / n
                py = y0 + (j + 0.5) * (y1 - y0) / n
                in_a = sum(inside(r, px, py) for r in rings) % 2 == 1
                if in_a and inside(star, px, py):
                    hits += 1
        approx = hits * (x1 - x0) * (y1 - y0) / (n * n)
        assert abs(got[rid] - approx) < 0.05 * max(approx, 0.1), \
            (rid, got[rid], approx)

    # convex-on-convex agreement with the convex clip kernel
    hexring = [(float(2 * np.cos(k * np.pi / 3)), float(2 * np.sin(k * np.pi / 3)))
               for k in range(6)]
    hexring.append(hexring[0])
    sq1 = sq(-1, -1, 3)
    want = shoelace_area_abs(convex_clip_ring(
        [p[0] for p in sq1], [p[1] for p in sq1],
        [p[0] for p in hexring], [p[1] for p in hexring]))
    rows = [(9, encode_hex(polygon([sq1], srid=4326)),
             encode_hex(polygon([hexring], srid=4326)))]
    df = spark.createDataFrame(rows, "rid long, a string, b string")
    gm = df.select(inter(dec("a"), dec("b")).alias("am")).collect()[0]["am"]
    assert abs(gm / 1e6 - want) < 2e-6
