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
