"""Span-level dedup + winnowing (spatial/datapipe/spandedup.py): planted
ground truth, keep-first semantics, brute-force winnowing parity (the
A/B-distance selection formula vs canonical window enumeration), the
winnowing coverage guarantee, DuckDB oracle parity, and the zero-exchange
plan pin."""

import hashlib

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial.datapipe.dedup import _hash_shingles
from spatial.datapipe.spandedup import (
    clean_oracle_sql,
    drop_duplicated_spans,
    duplicated_spans,
    spans_oracle_sql,
    winnow_fingerprints,
    winnow_oracle_sql,
)

W = 10  # test span window (chars)

# flanks are pairwise-disjoint character sets; SHARED has no repeated
# 10-gram internally, so the ONLY duplicated windows are the 15 fully
# inside a SHARED occurrence.
SHARED = "zyxwvutsrq!@#$%^&*()_+=["  # 24 chars, all distinct
U1, U2 = "abcdefghijkl", "ABCDEFGHIJKL"
V1, V2 = "mnopqrstuvwx", "MNOPQRSTUVWX"
W1, W2, W3 = "0123456789", "~`;:,.<>?/", "dcba4321"


def _corpus():
    return [
        (1, U1 + SHARED + U2),            # earliest occurrence -> kept
        (2, V1 + SHARED + V2),            # cross-doc dup -> cut
        (3, W1 + "|" + W2 + "|" + W3),    # no duplicated windows
        (4, ""),                          # empty doc
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_corpus(), ["doc_id", "text"])


def _values_cte():
    rows = ", ".join(f"({i}, '{t}')" for i, t in _corpus())
    return f"SELECT * FROM (VALUES {rows}) AS t(id, text)"


def test_duplicated_spans_ground_truth(docs, spark):
    out = {r["id"]: r for r in duplicated_spans(docs, window=W).collect()}
    assert set(out) == {1, 2}
    # windows fully inside SHARED: len(SHARED) - W + 1 = 15; the merged
    # span covers exactly the SHARED region of each doc.
    n_win = len(SHARED) - W + 1
    for i, flank in [(1, U1), (2, V1)]:
        r = out[i]
        assert r["n_windows"] == n_win
        assert r["span_start"] == len(flank) + 1
        assert r["span_end"] == len(flank) + len(SHARED)
        assert r["doc_len"] == len(flank) + len(SHARED) + 12


def test_keep_first_clean(docs):
    out = {r["id"]: r for r in drop_duplicated_spans(docs, window=W).collect()}
    # doc 1 is the earliest occurrence of every duplicated window -> intact
    assert out[1]["clean_len"] == out[1]["orig_len"]
    assert out[1]["clean_md5"] == hashlib.md5(
        (U1 + SHARED + U2).encode()).hexdigest()
    # doc 2 loses exactly the SHARED region
    assert out[2]["clean_md5"] == hashlib.md5((V1 + V2).encode()).hexdigest()
    assert out[2]["clean_len"] == len(V1) + len(V2)
    # untouched and empty docs pass through
    assert out[3]["clean_len"] == out[3]["orig_len"]
    assert out[4]["clean_len"] == 0
    assert out[4]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_within_doc_repeat_removed(spark):
    """The SECOND in-doc occurrence of a repeated substring is cut, the
    first kept (keep-first applies inside one document too)."""
    rep = "QWERTYUIOPASD"  # 13 distinct chars, > W
    txt = "11111" + rep + "22222" + rep + "33333"
    d = spark.createDataFrame([(7, txt)], ["doc_id", "text"])
    out = drop_duplicated_spans(d, window=W).collect()[0]
    expect = "11111" + rep + "22222" + "33333"
    assert out["clean_md5"] == hashlib.md5(expect.encode()).hexdigest()
    assert out["clean_len"] == len(expect)


def test_short_doc_pair_cut_to_empty(spark):
    """Texts shorter than the window are padded to ONE window; an exact
    short-pair dup keeps doc 1 and cuts doc 2 to empty (span clipped to
    the real length)."""
    d = spark.createDataFrame([(1, "abc"), (2, "abc")], ["doc_id", "text"])
    out = {r["id"]: r for r in drop_duplicated_spans(d, window=W).collect()}
    assert out[1]["clean_len"] == 3
    assert out[2]["clean_len"] == 0


def _brute_winnow(h, w):
    """Canonical winnowing: rightmost minimum of every w-window (whole doc
    if fewer than w hashes). h holds uint64 values as Python ints."""
    n = len(h)
    if n == 0:
        return set()
    if n < w:
        m = min(h)
        return {max(i for i in range(n) if h[i] == m) + 1}
    sel = set()
    for q in range(n - w + 1):
        m = min(h[q:q + w])
        sel.add(max(i for i in range(q, q + w) if h[i] == m) + 1)
    return sel


def test_winnow_matches_bruteforce_on_real_docs(spark):
    """Engine selection == canonical enumeration on real corpus docs plus
    short/degenerate texts (the parity that justifies the formula)."""
    real = [r["text"] for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(15).collect()]
    texts = real + ["a", "ab", "abcdefgh", "aaaaaaaaaaaaaaaa", "xy" * 7]
    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in
           winnow_fingerprints(d, window=8, w=8).collect()}
    for i, t in rows:
        if not t:
            continue
        h = [int(x) for x in _hash_shingles(t, 8)]
        sel = _brute_winnow(h, 8)
        assert got[i]["n_windows"] == len(h)
        assert got[i]["n_fingerprints"] == len(sel), f"doc {i}"
        assert got[i]["fp_pos_sum"] == sum(sel), f"doc {i}"


def test_winnow_coverage_guarantee():
    """Schleimer et al. guarantee: every w consecutive windows contain at
    least one fingerprint (checked on the brute-force reference, which the
    engine is pinned to above)."""
    rng = np.random.default_rng(11)
    for _ in range(200):
        n = int(rng.integers(8, 60))
        h = [int(x) for x in rng.integers(0, 50, n)]
        sel = sorted(_brute_winnow(h, 8))
        assert sel[0] <= 8 and sel[-1] >= n - 8 + 1
        assert all(b - a <= 8 for a, b in zip(sel, sel[1:]))


def test_winnow_plan_has_no_exchange(docs):
    """The selection rule runs inside one projection over the per-doc hash
    array: ZERO Exchange in the physical plan (the 100 TB point -- no
    shuffle happens before fingerprint density reduction)."""
    q = winnow_fingerprints(docs, window=8, w=8)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_oracle_parity_duckdb(docs, spark):
    """All three oracle renderers replay the engine bit-for-bit on the
    planted corpus (the same protocol the driver runs at sf0.01)."""
    con = duckdb.connect()
    cte = _values_cte()

    spans = sorted(tuple(r) for r in duplicated_spans(docs, window=W)
                   .select("id", "doc_len", "span_start", "span_end",
                           "n_windows").collect())
    o = sorted(map(tuple, con.execute(
        spans_oracle_sql(cte, window=W)).fetchall()))
    assert spans == o

    clean = sorted(tuple(r) for r in drop_duplicated_spans(docs, window=W)
                   .select("id", "orig_len", "clean_len", "clean_md5")
                   .collect())
    o = sorted(map(tuple, con.execute(clean_oracle_sql(cte, W)).fetchall()))
    assert clean == o

    win = sorted(tuple(r) for r in winnow_fingerprints(docs, window=8, w=8)
                 .select("id", "n_windows", "n_fingerprints", "fp_pos_sum")
                 .collect())
    o = sorted(map(tuple, con.execute(
        winnow_oracle_sql(cte, window=8, w=8)).fetchall()))
    assert win == o
