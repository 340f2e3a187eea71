"""Bigram-LM quality score + leakage-free cluster split.

Planted-ground-truth tests: the LM score is recomputed by hand (Python
math.log on the identical exact integer counts, same micronat floor), the
split's atomicity is checked pair-by-pair, and both operators are replayed
in DuckDB over the same tiny corpus (the same oracle renderers the driver
uses at sf0.01).
"""

import math

import duckdb
import pytest

from spatial.datapipe.cluster import (leakage_free_split,
                                      leakage_free_split_oracle_sql)
from spatial.datapipe.curation import PERMYRIAD, _C1, _M1, _M2, _P
from spatial.datapipe.dedup import minhash_dedup_pairs, minhash_pairs_oracle_sql
from spatial.datapipe.textstats import lm_score, lm_score_oracle_sql


def _ln_micro(c: int) -> int:
    return math.floor(math.log(c) * 1e6)


def test_lm_score_planted(spark):
    """Hand-computed Laplace bigram NLL on a 3-doc corpus."""
    rows = [(1, "a b a b"), (2, "a b c"), (3, "z z"), (4, "solo"), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_micro"])
           for r in lm_score(df).collect()}

    # V = |{a,b,c,z,solo}| = 5; C12: ab=3, ba=1, bc=1, zz=1;
    # C1 (prefix): a=3, b=2, z=1
    V = 5
    li_ab = _ln_micro(3 + 1) - _ln_micro(3 + V)
    li_ba = _ln_micro(1 + 1) - _ln_micro(2 + V)
    li_bc = _ln_micro(1 + 1) - _ln_micro(2 + V)
    li_zz = _ln_micro(1 + 1) - _ln_micro(1 + V)
    assert got[1] == (3, -(2 * li_ab + li_ba))
    assert got[2] == (2, -(li_ab + li_bc))
    assert got[3] == (1, -li_zz)
    # docs with < 2 tokens produce no row (no bigrams to score)
    assert 4 not in got and 5 not in got


def test_lm_score_ranks_gibberish_above_formula(spark):
    """Self-trained LM: a doc made of corpus-frequent bigrams must score a
    LOWER per-bigram NLL than a doc of corpus-unique bigrams."""
    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(6)] + [(99, "qq ww ee rr tt yy")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["nll_micro"] / r["n_bigrams"]
           for r in lm_score(df).collect()}
    assert got[99] > got[0]


def test_lm_score_duckdb_parity(spark):
    rows = [(1, "a b a b c d"), (2, "a b c"), (3, None), (4, ""),
            (5, "the quick brown fox the quick red fox")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vals = ", ".join(
        f"({i}, {'CAST(NULL AS VARCHAR)' if t is None else t.__repr__()})"
        for i, t in rows)
    cte = f"SELECT id, text FROM (VALUES {vals}) AS t(id, text)"
    eng = sorted(tuple(r) for r in lm_score(df).collect())
    ora = sorted(duckdb.sql(lm_score_oracle_sql(cte)).fetchall())
    assert eng == ora
    assert eng  # non-degenerate


@pytest.fixture()
def split_corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to find food and water")
    alt = ("columnar execution engines use vectorized arrow kernels for "
           "distributed analytical queries over object storage parquet")
    rows = []
    for i in range(8):  # 8 twin families: (10i, 10i+1) near-dups
        salt = " ".join(f"w{i}x{j}" for j in range(6))
        rows.append((10 * i, f"{base} {salt}"))
        rows.append((10 * i + 1, f"{base} {salt} tail"))
    for i in range(12):  # singletons, pairwise far
        salt = " ".join(f"s{i}y{j}" for j in range(12))
        rows.append((1000 + i, f"{alt} {salt}"))
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_cluster_split_never_leaks(split_corpus):
    rows, df = split_corpus
    pairs = minhash_dedup_pairs(df, threshold=0.7, num_perm=64, bands=16)
    got_pairs = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert len(got_pairs) >= 8  # every planted family fires
    split = {r["doc_id"]: r["split"]
             for r in leakage_free_split(df.select("doc_id"), pairs,
                                         cuts=(6000, 8000)).collect()}
    assert len(split) == len(rows)
    for a, b in got_pairs:  # the leakage guarantee, pair by pair
        assert split[a] == split[b], (a, b)
    assert set(split.values()) <= {"train", "val", "test"}
    assert len(set(split.values())) >= 2  # cuts chosen so both sides occur

    # singletons: split is the documented pure hash of their own id
    def bucket(i):
        h = (i % _P * _M1 + _C1) % _P * _M2 % _P
        return h % PERMYRIAD

    for i in range(1000, 1012):
        want = ("train" if bucket(i) < 6000
                else "val" if bucket(i) < 8000 else "test")
        assert split[i] == want


def test_cluster_split_duckdb_parity(split_corpus):
    rows, df = split_corpus
    vals = ", ".join(f"({i}, {t.__repr__()})" for i, t in rows)
    cte = f"SELECT id, text FROM (VALUES {vals}) AS t(id, text)"
    docs_cte = f"SELECT id AS doc_id FROM ({cte})"
    pairs = minhash_dedup_pairs(df, threshold=0.7, num_perm=64, bands=16)
    eng = sorted(
        tuple(r) for r in leakage_free_split(df.select("doc_id"), pairs)
        .select("doc_id", "cluster_id", "split").collect())
    ora = sorted(duckdb.sql(leakage_free_split_oracle_sql(
        docs_cte, minhash_pairs_oracle_sql(
            cte, threshold=0.7, num_perm=64, bands=16))).fetchall())
    assert eng == ora
