"""Geocode signal priority, determinism, and trie-regex equivalence."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial.gazetteer import CITIES, gazetteer_df
from spatial.geocode import _CITY_NAMES, geocode_page, trie_regex


def test_trie_regex_equivalent_to_flat_alternation():
    flat = r"\b(" + "|".join(re.escape(n) for n in _CITY_NAMES) + r")\b"
    trie = r"\b(" + trie_regex(_CITY_NAMES) + r")\b"
    rng = np.random.default_rng(3)
    names = [c[0] for c in CITIES]
    fillers = ["alpha", "beta", "sublima", "parisian", "new", "york", "xlondon",
               "londonx", "the", "of", "in"]
    for _ in range(500):
        k = rng.integers(3, 12)
        words = [str(rng.choice(fillers + names)) for _ in range(k)]
        t = " ".join(words)
        a = re.search(flat, t)
        b = re.search(trie, t)
        assert (a is None) == (b is None), t
        if a:
            assert a.group(1) == b.group(1) and a.start() == b.start(), t
    # word boundaries: no match inside words
    assert re.search(trie, "parisian sublimate newyork") is None
    # multi-word and longest-at-position
    m = re.search(trie, "flew to los angeles yesterday")
    assert m.group(1) == "los angeles"


@pytest.fixture(scope="module")
def geo(spark):
    rows = [
        (1, "https://a.com/x", "coords 34.05220, -118.24370 and paris too"),
        (2, "https://b.com/x", "we visited Paris and then london"),
        (3, "https://c.de/x", "nothing spatial at all"),
        (4, "https://d.com/x", "nothing spatial at all"),
        (5, "https://e.jp/x", "Tokyo station"),
        (6, "https://f.com/x", "invalid pair 95.12345, 300.54321 but berlin"),
    ]
    df = spark.createDataFrame(rows, "page_id long, url string, text string")
    out = geocode_page(df)
    return {r["page_id"]: r for r in out.collect()}


def test_priority_coords_beats_city(geo):
    r = geo[1]
    assert r["geo_source"] == "coords"
    assert abs(r["lat"] - 34.0522) < 1e-4 and abs(r["lon"] + 118.2437) < 1e-4
    assert r["geo_confidence"] == 1.0


def test_city_earliest_match_case_insensitive(geo):
    r = geo[2]
    assert r["geo_source"] == "city"
    paris = next(c for c in CITIES if c[0] == "paris")
    assert (r["lon"], r["lat"]) == (paris[3], paris[4])


def test_cctld_fallback(geo):
    r = geo[3]
    assert r["geo_source"] == "cctld"
    r5 = geo[5]  # explicit city beats its own cctld
    assert r5["geo_source"] == "city"


def test_no_signal_is_null(geo):
    r = geo[4]  # .com tld is not a country code in the gazetteer
    assert r["geo_source"] is None and r["lon"] is None


def test_out_of_range_coords_rejected(geo):
    r = geo[6]
    assert r["geo_source"] == "city"  # falls through to berlin


def test_geocode_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, "https://a.com/", "x")],
                               "page_id long, url string, text string")
    plan = geocode_page(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
