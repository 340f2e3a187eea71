"""Moran's I integer pieces (spatial/spatialstats.py): closed-form hand
cases and the sign sanity the statistic exists for."""

from __future__ import annotations


def _pieces(spark, pts):
    from spatial.spatialstats import morans_i_pieces

    df = spark.createDataFrame(pts, "x double, y double")
    return morans_i_pieces(df, "x", "y").collect()[0]


def test_morans_i_two_cell_dispersion(spark):
    """Cells (0,0) c=3 and (1,0) c=1: n=2, S=4, v=(2,-2); W=2 (symmetric
    count), NUM = 2 * (2 * -2) = -8, DEN = 8 -> I = (2/2)*(-8/8) = -1,
    perfect dispersion."""
    r = _pieces(spark, [(0.5, 0.5)] * 3 + [(1.5, 0.5)])
    assert (r["n_cells"], r["w_pairs"], r["num"], r["den"]) == (2, 2, -8, 8)


def test_local_moran_hotspots_bruteforce(spark):
    """Top-k LISA cells == a driver-side brute-force replay on a 6x6
    block layout, and the hotspot core (high cell with all-high
    neighbors) ranks first."""
    from spatial.spatialstats import local_moran_hotspots

    pts = []
    counts = {}
    for gx in range(6):
        for gy in range(6):
            c = 5 if (gx < 3 and gy < 3) else 1
            counts[(gx, gy)] = c
            pts += [(gx + 0.5, gy + 0.5)] * c
    df = spark.createDataFrame(pts, "x double, y double")
    got = [(r["gx"], r["gy"], r["v"], r["nbr_sum"], r["local_num"])
           for r in local_moran_hotspots(df, "x", "y", k=10).collect()]

    n = len(counts)
    S = sum(counts.values())
    v = {k: n * c - S for k, c in counts.items()}
    rows = []
    for (gx, gy), vi in v.items():
        ns = sum(v[(gx + dx, gy + dy)]
                 for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
                 if (gx + dx, gy + dy) in v)
        rows.append((gx, gy, vi, ns, vi * ns))
    want = sorted(rows, key=lambda r: (-r[4], r[0], r[1]))[:10]
    assert got == want
    # rank-1 hotspot: an interior high cell surrounded by high cells
    assert got[0][0] in (0, 1) and got[0][1] in (0, 1) and got[0][4] > 0


def test_morans_i_checkerboard_negative_blocks_positive(spark):
    """A 4x4 checkerboard of counts {1, 3} gives I < 0 (every neighbor is
    the opposite value); the same counts sorted into two 2x4 blocks give
    I > 0. Same multiset of counts, opposite autocorrelation -- the
    statistic reacts to ARRANGEMENT only."""
    checker, blocks = [], []
    for gx in range(4):
        for gy in range(4):
            c_checker = 3 if (gx + gy) % 2 == 0 else 1
            c_blocks = 3 if gx < 2 else 1
            checker += [(gx + 0.5, gy + 0.5)] * c_checker
            blocks += [(gx + 0.5, gy + 0.5)] * c_blocks
    rc = _pieces(spark, checker)
    rb = _pieces(spark, blocks)
    assert rc["n_cells"] == rb["n_cells"] == 16
    assert rc["w_pairs"] == rb["w_pairs"] == 48  # 24 rook pairs, twice
    assert rc["den"] == rb["den"] > 0            # same count multiset
    assert rc["num"] < 0 < rb["num"]
