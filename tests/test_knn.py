"""kNN vs exact brute-force oracle, clustered + sparse data (FIXTURES.md §5)."""

import numpy as np
import pandas as pd
import pytest

from spatial.knn import knn_bruteforce, knn_join

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def data(spark):
    # clusters plus a sparse desert so the brute-force fallback is exercised
    n = 3000
    cx = np.concatenate([RNG.normal(-118.2, 0.5, n // 2),
                         RNG.normal(2.3, 0.5, n // 3),
                         RNG.uniform(-170, 170, n - n // 2 - n // 3)])
    cy = np.concatenate([RNG.normal(34.0, 0.5, n // 2),
                         RNG.normal(48.8, 0.5, n // 3),
                         RNG.uniform(-80, 80, n - n // 2 - n // 3)])
    points = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "x": cx, "y": cy}))
    queries = spark.createDataFrame(pd.DataFrame({
        "query_id": np.arange(8),
        "qx": [-118.2, -118.9, 2.3, 2.9, 100.0, -60.0, 0.0, 179.5],
        "qy": [34.0, 34.5, 48.8, 48.2, 0.0, -40.0, 0.0, 0.0],
    }))
    return points, queries


def _as_map(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["id"], r["dist_m"]))
    return {q: sorted(v) for q, v in out.items()}


def test_knn_matches_bruteforce(spark, data):
    points, queries = data
    k = 5
    got = _as_map(knn_join(points, queries, k=k, level=8))
    want = _as_map(knn_bruteforce(points, queries, k=k))
    assert set(got) == set(want)
    for q in want:
        got_ids = [t[1] for t in got[q]]
        want_ids = [t[1] for t in want[q]]
        assert got_ids == want_ids, (q, got[q], want[q])
        for (_, _, d1), (_, _, d2) in zip(got[q], want[q]):
            assert abs(d1 - d2) < 1e-6


def test_knn_k1_and_large_k(spark, data):
    points, queries = data
    got = _as_map(knn_join(points, queries.limit(3), k=1, level=8))
    want = _as_map(knn_bruteforce(points, queries.limit(3), k=1))
    assert got == want


def test_knn_distributed_matches_bruteforce_large_queries(spark):
    """DataFrame-native round control: 10k-query set (far beyond the driver
    loop's collect contract) matches exact brute-force kNN."""
    from spatial.knn import KnnIndex

    rng = np.random.default_rng(11)
    npts, nq, k = 10_000, 10_000, 3
    px = np.concatenate([rng.normal(-118.2, 1.0, npts // 2),
                         rng.uniform(-170, 170, npts - npts // 2)])
    py = np.concatenate([rng.normal(34.0, 1.0, npts // 2),
                         rng.uniform(-80, 80, npts - npts // 2)])
    points = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(npts), "x": px, "y": py}))
    qx = np.concatenate([rng.normal(-118.2, 1.0, nq // 2),
                         rng.uniform(-170, 170, nq - nq // 2)])
    qy = np.concatenate([rng.normal(34.0, 1.0, nq // 2),
                         rng.uniform(-80, 80, nq - nq // 2)])
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(nq), "qx": qx, "qy": qy}))

    idx = KnnIndex(points, level=6)
    got = _as_map(idx.join_distributed(queries, k=k))
    idx.unpersist()
    want = _as_map(knn_bruteforce(points, queries, k=k))
    assert set(got) == set(want)
    bad = [q for q in want
           if [t[1] for t in got[q]] != [t[1] for t in want[q]]]
    assert not bad, (len(bad), bad[:3])
