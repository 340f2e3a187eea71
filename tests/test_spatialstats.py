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
