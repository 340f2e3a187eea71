"""Grid-based DBSCAN (spatial/dbscan.py): hand-case ground truth, engine
vs brute-force parity on the clustered fixture, and the grid join's
exactly-once pair claim."""

from __future__ import annotations

import numpy as np
import pytest

from spatial.dbscan import dbscan, eps_neighbor_pairs


def _df(spark, pts):
    return spark.createDataFrame(pts, "id long, x double, y double")


def test_dbscan_hand_case(spark):
    """Two blobs, one border point, one noise point. eps=1, min_pts=3
    (incl. self): blob A = {0,1,2} around origin (mutually within 1),
    blob B = {10,11,12} at (10,0); point 20 at (1.7, 0.5) is within eps
    of only point 2 -> non-core, border of A's cluster; point 30 at
    (50,50) is noise."""
    pts = [(0, 0.0, 0.0), (1, 0.6, 0.0), (2, 0.9, 0.3),
           (10, 10.0, 0.0), (11, 10.5, 0.2), (12, 10.2, 0.7),
           (20, 1.7, 0.5), (30, 50.0, 50.0)]
    out = {r["id"]: (r["cluster_id"], r["is_core"])
           for r in dbscan(_df(spark, pts), eps=1.0, min_pts=3).collect()}
    assert out == {0: (0, True), 1: (0, True), 2: (0, True),
                   10: (10, True), 11: (10, True), 12: (10, True),
                   20: (0, False)}


def test_dbscan_singleton_core_component(spark):
    """A core whose neighbors are all border keeps its own id as label:
    star of 4 leaves around one hub, eps=1, min_pts=5 -> hub is core
    (4 neighbors + self), leaves are border (1 neighbor + self < 5), no
    core-core edge exists."""
    pts = [(7, 0.0, 0.0), (1, 0.9, 0.0), (2, -0.9, 0.0),
           (3, 0.0, 0.9), (4, 0.0, -0.9)]
    out = {r["id"]: (r["cluster_id"], r["is_core"])
           for r in dbscan(_df(spark, pts), eps=1.0, min_pts=5).collect()}
    assert out == {7: (7, True), 1: (7, False), 2: (7, False),
                   3: (7, False), 4: (7, False)}


def test_dbscan_min_pts_guard():
    with pytest.raises(ValueError):
        dbscan(None, eps=1.0, min_pts=1)


def test_eps_pairs_exactly_once_and_exact(spark):
    """The 3x3 grid probe join must emit each directed eps-pair EXACTLY
    once and match the brute-force O(n^2) pair set bit-for-bit."""
    from spatial.synth import cluster_points

    pts = cluster_points(n=300, seed=99)
    got = [(r["ia"], r["ib"]) for r in eps_neighbor_pairs(
        _df(spark, pts), eps=1.0).collect()]
    assert len(got) == len(set(got)), "duplicate pair emitted"
    x = np.array([p[1] for p in pts])
    y = np.array([p[2] for p in pts])
    ids = np.array([p[0] for p in pts])
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    ii, jj = np.where(d2 <= 1.0)
    want = set(zip(ids[ii].tolist(), ids[jj].tolist()))
    assert set(got) == want and len(want) > 0


def test_dbscan_matches_bruteforce_on_fixture(spark):
    """Full engine output == the driver-side brute-force DBSCAN (same
    min-label CC + min-border rules) on the 1200-point fixture."""
    from spatial.synth import cluster_points, synth_cluster_points

    eps, mp = 1.0, 5
    got = {r["id"]: (r["cluster_id"], r["is_core"])
           for r in dbscan(synth_cluster_points(spark), eps=eps, min_pts=mp,
                           id_col="point_id").collect()}
    pts = cluster_points()
    x = np.array([p[1] for p in pts])
    y = np.array([p[2] for p in pts])
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    near = d2 <= eps * eps
    core = near.sum(1) + 1 >= mp
    lab = np.arange(len(x))
    adj = near & core[:, None] & core[None, :]
    for _ in range(100):
        nl = np.where(adj.any(1),
                      np.min(np.where(adj, lab[None, :], 10 ** 9), axis=1),
                      lab)
        new = np.minimum(lab, nl)
        new = new[new]
        if (new == lab).all():
            break
        lab = new
    want = {}
    for i in range(len(x)):
        if core[i]:
            want[i] = (int(lab[i]) if adj[i].any() else i, True)
        else:
            nbr = [int(lab[j]) if adj[j].any() else int(j)
                   for j in np.where(near[i] & core)[0]]
            if nbr:
                want[i] = (min(nbr), False)
    assert got == want
    assert sum(1 for v in got.values() if v[1]) == 822
    assert len({v[0] for v in got.values() if v[1]}) == 27
    assert sum(1 for v in got.values() if not v[1]) == 29
