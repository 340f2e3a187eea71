"""Span-level (substring) deduplication and winnowing fingerprints.

Doc-level dedup (dedup.py) removes whole near-duplicate documents; the
complementary training-data hygiene step is SPAN-level: long character
sequences repeated verbatim across (or within) documents -- boilerplate
navigation, license blocks, quoted reposts -- inflate memorization even
when no document pair crosses a whole-doc threshold (Lee et al., 2022,
"Deduplicating Training Data Makes Language Models Better": exact
substring dedup at 50-BPE-token granularity).  This module provides the
Spark-native span family:

* ``duplicated_spans``       -- maximal duplicated character spans per doc
                                (detection / measurement).
* ``drop_duplicated_spans``  -- rewrite each doc with every NON-FIRST
                                occurrence of a duplicated window cut out
                                (keep-first-occurrence removal).
* ``winnow_fingerprints``    -- Schleimer et al. (SIGMOD 2003) winnowing:
                                the rightmost-minimum-per-window hash
                                selection that guarantees at least one
                                fingerprint in every w consecutive windows
                                while shuffling only ~2/(w+1) of them --
                                the published scale path when stride-1
                                (id, pos, hash) rows are too many.

100 TB shape:
* The window-hash stream reuses dedup.py's vectorized rolling hash
  (`_hash_shingles` -- O(n) NumPy per Arrow batch); only (id, pos, sh)
  LONG rows ever shuffle, never text.
* Detection aggregates are map-side combinable: per-hash ``count`` and
  ``min(first-occurrence key)`` -- deliberately NOT a row_number window
  over the hash (a boilerplate hash shared by millions of docs would pin
  one task); the join back to the stream is an AQE-skew-handled long-only
  hash join.
* Span merging is per-document (shuffle on id, bounded partitions).
* Winnowing runs ENTIRELY inside one projection -- the selection rule is
  evaluated with array expressions over the per-doc hash array, zero
  exchange, zero Python (plan-asserted in tests) -- and reduces the
  shuffled fingerprint volume by the documented 2/(w+1) density factor
  before any cross-doc work.
* ``max_df`` analog: callers measuring only (not rewriting) can bound the
  per-hash fan-out via ``min_count``/boilerplate caps upstream; the
  detection join itself is 1:1 per stream row (each (id,pos,sh) row meets
  exactly one per-hash aggregate row), so there is NO quadratic candidate
  blow-up anywhere in this module -- unlike pair-generating dedup, span
  dedup never materializes document pairs.

Oracle: the shared ``shingle_hash_oracle_sql`` replay (dedup.py) produces
the identical (id, pos, sh) stream in DuckDB; detection, keep-first,
island merging, character cutting and md5 are exact integer/string SQL.
Winnowing's rightmost-min selection is replayed via an equivalent
prev-smaller / next-smaller-or-equal distance formulation (see
``winnow_oracle_sql``) -- integer comparisons on identical uint64 hashes,
so cross-engine parity is bit-exact including on hash collisions.

Reference scope note: haskell-postgis (/root/reference) is a geometry
codec library; this module belongs to the training-data-pipeline mandate
(SURVEY.md section 2.3) layered on the codec core.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .dedup import _hash_shingles, shingle_hash_oracle_sql

# first-occurrence key: id * 2^32 + pos packs (id, pos) into one BIGINT so
# "earliest occurrence" is a plain MIN aggregate (map-side combinable) in
# both engines. Requires id < 2^31 and pos < 2^32 -- true for every synth
# table and asserted cheap at query build.
_KEY = 4294967296  # 2^32


def make_window_hash_udf(window: int):
    """text -> position-ordered rolling-hash array (int64 view of uint64;
    values only feed equality joins and comparisons). One entry per
    character window start; texts shorter than `window` are space-padded
    to exactly one window (dedup.py short-text parity)."""

    @pandas_udf(ArrayType(LongType()))
    def window_hashes(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: _hash_shingles(t, window).view(np.int64).tolist()
            if t else [])

    return window_hashes


def _hash_stream(df: DataFrame, window: int, id_col: str,
                 text_col: str) -> DataFrame:
    """(id, len, pos, sh) rows -- pos is the 1-based window start, len the
    ORIGINAL text length (rides the same projection as the explode, no
    second text scan)."""
    wh = make_window_hash_udf(window)
    return (
        df.where(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col).alias("id"),
                F.length(F.col(text_col)).alias("len"),
                wh(F.col(text_col)).alias("__arr"))
        .select("id", "len", F.posexplode("__arr").alias("pos0", "sh"))
        .select("id", "len", (F.col("pos0") + 1).alias("pos"), "sh")
    )


def _merge_islands(marked: DataFrame, window: int) -> DataFrame:
    """consecutive marked window positions -> maximal spans per doc:
    (id, len, span_start, span_end, n_windows). span_end is clipped to the
    original text length (short-text padding never extends a span past the
    real document)."""
    w = Window.partitionBy("id").orderBy("pos")
    grp = (F.col("pos") - F.row_number().over(w)).alias("__g")
    return (
        marked.select("id", "len", "pos", grp)
        .groupBy("id", "len", "__g")
        .agg(F.min("pos").alias("span_start"),
             F.max("pos").alias("__last"),
             F.count("*").alias("n_windows"))
        .select("id", "len", "span_start",
                F.least(F.col("__last") + (window - 1),
                        F.col("len")).alias("span_end"),
                "n_windows")
    )


def duplicated_spans(df: DataFrame, window: int = 24,
                     min_count: int = 2, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Maximal duplicated character spans: every position covered by a
    `window`-char substring occurring >= min_count times corpus-wide
    (across docs OR repeated within one doc), with overlapping/adjacent
    duplicated windows merged into (id, doc_len, span_start, span_end,
    n_windows) rows. Detection only -- see drop_duplicated_spans for the
    rewrite."""
    stream = _hash_stream(df, window, id_col, text_col)
    counts = stream.groupBy("sh").agg(F.count("*").alias("__cnt"))
    marked = (stream.join(counts.where(F.col("__cnt") >= min_count), "sh")
              .select("id", "len", "pos"))
    return _merge_islands(marked, window).withColumnRenamed("len", "doc_len")


def drop_duplicated_spans(df: DataFrame, window: int = 24,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Keep-first span removal: every character covered by a duplicated
    `window`-char substring occurrence that is NOT the corpus-earliest
    occurrence of that substring (earliest = min (id, pos)) is cut; the
    doc is reassembled from the surviving characters. Returns
    (id, orig_len, clean_len, clean_md5) -- md5 of the cleaned text is the
    cross-engine value pin. Empty docs pass through (md5 of '')."""
    stream = _hash_stream(df, window, id_col, text_col)
    agg = stream.groupBy("sh").agg(
        F.count("*").alias("__cnt"),
        F.min(F.col("id") * _KEY + F.col("pos")).alias("__first"))
    removed = (
        stream.join(agg, "sh")
        .where((F.col("__cnt") >= 2)
               & (F.col("id") * _KEY + F.col("pos") != F.col("__first")))
        .select("id", "len", "pos"))
    spans = _merge_islands(removed, window).groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans"))

    base = (df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
            .join(spans, "id", "left")
            .withColumn("__spans", F.coalesce(
                F.col("__spans"),
                F.array().cast("array<struct<span_start:int,span_end:int>>"))))
    # pure-JVM cut, O(spans) not O(chars): the merged spans are disjoint,
    # so sorting them and folding left concatenates exactly the KEPT
    # chunks between/around them -- a handful of substring calls per doc
    # instead of one per character (the per-char transform was
    # O(chars x spans) and substring(t, p, 1) walks the string for
    # non-ASCII, quadratic on long docs -- the 100x-scale liability this
    # fold removes; the output string, hence the md5 pin, is identical).
    clean = F.expr(
        "aggregate(sort_array(__spans), "
        "struct(1 AS cur, '' AS acc), "
        "(st, sp) -> struct(sp.span_end + 1 AS cur, "
        "concat(st.acc, substring(t, st.cur, sp.span_start - st.cur)) AS acc), "
        "st -> concat(st.acc, substring(t, st.cur, length(t) - st.cur + 1)))")
    return base.select(
        "id", F.length("t").alias("orig_len"),
        F.length(clean).alias("clean_len"),
        F.md5(clean.cast("binary")).alias("clean_md5"))


# -- winnowing ---------------------------------------------------------------

def winnow_fingerprints(df: DataFrame, window: int = 8, w: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Winnowing (Schleimer, Wilkerson, Aiken 2003): from the per-doc
    rolling-hash stream h[1..n] (`window`-char hashes), select the
    RIGHTMOST MINIMUM of every w consecutive hashes; the union of selected
    positions is the document fingerprint set. Guarantee: every w
    consecutive windows contribute >= 1 fingerprint (no gap longer than
    w + window - 1 chars escapes), at expected density 2/(w+1).

    Selection rule, evaluated per position p without enumerating windows
    (both engines replay the identical integer formula, so parity is
    bit-exact even on hash collisions):

        A  = distance to the previous STRICTLY smaller hash (capped at w)
        B  = distance to the next smaller-OR-EQUAL hash    (capped at w)
        t0 = max(0, w - A, w - p)          -- smallest right-extension that
                                              clears every smaller left
                                              neighbor and keeps the window
                                              inside the doc
        t1 = min(w - 1, n - p)             -- largest valid right-extension
        selected(p)  <=>  t0 <= t1  AND  B > t0

    (p selected by window [p-w+1+t, p+t] iff nothing strictly smaller sits
    left of p inside it and nothing <= sits right of p inside it; the left
    constraint loosens and the right constraint tightens monotonically in
    t, so feasibility collapses to the single check at t0.)

    Runs entirely inside one projection: the rule reads only h[p-w+1 ..
    p+w-1], expressed with array expressions over the per-doc hash array
    -- ZERO exchange, zero Python past the hash UDF (plan-asserted).
    Returns (id, n_windows, n_fingerprints, fp_pos_sum) per doc --
    fp_pos_sum (the sum of selected 1-based positions) is the scalar
    digest of the selection set, so the oracle pins WHICH positions were
    picked, not just how many."""
    wh = make_window_hash_udf(window)
    # the UDF emits int64 views of uint64 hashes; winnowing COMPARES
    # hashes, and the signed view inverts the order across the sign bit.
    # XOR with the sign bit maps unsigned order onto signed order (values
    # never surface -- only positions do).
    base = (df.where(F.length(F.col(text_col)) > 0)
            .select(F.col(id_col).alias("id"), wh(F.col(text_col)).alias("h0"))
            .withColumn(
                "h", F.expr("transform(h0, x -> x ^ -9223372036854775808)"))
            .withColumn("n", F.size("h")))

    # A(p): first j in 1..w-1 with h[p-j] < h[p], else w. element_at is
    # 1-based; out-of-range left indices are avoided by the j < p guard
    # (NULL-safe: the CASE ladder demands a definite '<').
    a_ladder = "CASE " + " ".join(
        f"WHEN p > {j} AND element_at(h, p - {j}) < element_at(h, p) THEN {j}"
        for j in range(1, w)) + f" ELSE {w} END"
    # B(p): first j in 1..w-1 with h[p+j] <= h[p], else w.
    b_ladder = "CASE " + " ".join(
        f"WHEN p + {j} <= n AND element_at(h, p + {j}) <= element_at(h, p) "
        f"THEN {j}" for j in range(1, w)) + f" ELSE {w} END"
    # short-doc branch: fewer hashes than the window (n < w) -- no w-window
    # fits, so the whole doc is treated as ONE window and its rightmost
    # minimum is selected (A >= p: nothing strictly smaller anywhere left;
    # B > n - p: nothing <= anywhere right).
    sel = (
        f"filter(sequence(1, n), p -> IF(n < {w}, "
        f"({a_ladder}) >= p AND ({b_ladder}) > n - p, "
        f"greatest(0, {w} - ({a_ladder}), {w} - p) <= least({w} - 1, n - p) "
        f"AND ({b_ladder}) > greatest(0, {w} - ({a_ladder}), {w} - p)))")
    return base.select(
        "id", F.col("n").alias("n_windows"),
        F.expr(sel).alias("__fp")
    ).select("id", "n_windows",
             F.size("__fp").alias("n_fingerprints"),
             F.expr("aggregate(__fp, 0L, (acc, x) -> acc + x)")
             .alias("fp_pos_sum"))


# -- DuckDB oracle renderers --------------------------------------------------

def spans_oracle_sql(docs_cte: str, window: int, min_count: int = 2) -> str:
    """duplicated_spans replay: shared hash-stream CTE -> per-hash count
    filter -> island merge (pos - row_number) -> clip span_end to the
    original length."""
    return f"""
WITH {shingle_hash_oracle_sql(docs_cte, window)},
__orig AS (SELECT id, length(text) AS len FROM ({docs_cte})),
__dup AS (
  SELECT id, pos FROM __sh
  WHERE sh IN (SELECT sh FROM __sh GROUP BY sh
               HAVING count(*) >= {min_count})
),
__isl AS (
  SELECT id, pos,
         pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS g
  FROM __dup
),
__spans AS (
  SELECT id, min(pos) AS span_start, max(pos) AS last_pos,
         count(*) AS n_windows
  FROM __isl GROUP BY id, g
)
SELECT s.id, CAST(o.len AS INT) AS doc_len,
       CAST(s.span_start AS INT) AS span_start,
       CAST(least(s.last_pos + {window - 1}, o.len) AS INT) AS span_end,
       s.n_windows
FROM __spans s JOIN __orig o USING (id)"""


def clean_oracle_sql(docs_cte: str, window: int) -> str:
    """drop_duplicated_spans replay: keep-first via min(id*2^32+pos) per
    hash, island merge of removed positions, then per-character survival
    and string_agg reconstruction (ordered), md5 value pin."""
    return f"""
WITH {shingle_hash_oracle_sql(docs_cte, window)},
__orig AS (SELECT id, text, length(text) AS len FROM ({docs_cte})),
__agg AS (
  SELECT sh, count(*) AS cnt,
         min(id * {_KEY} + pos) AS first_key
  FROM __sh GROUP BY sh
),
__rm AS (
  SELECT s.id, s.pos FROM __sh s JOIN __agg a USING (sh)
  WHERE a.cnt >= 2 AND s.id * {_KEY} + s.pos <> a.first_key
),
__isl AS (
  SELECT id, pos,
         pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS g
  FROM __rm
),
__spans AS (
  SELECT id, min(pos) AS s, max(pos) + {window - 1} AS e
  FROM __isl GROUP BY id, g
),
__chars AS (
  SELECT id, text, unnest(generate_series(1, len)) AS pos FROM __orig
),
__kept AS (
  SELECT c.id, c.pos, substr(c.text, c.pos, 1) AS ch FROM __chars c
  WHERE NOT EXISTS (SELECT 1 FROM __spans sp
                    WHERE sp.id = c.id AND c.pos BETWEEN sp.s AND sp.e)
),
__clean AS (
  SELECT o.id, o.len AS orig_len,
         coalesce(k.txt, '') AS clean_text
  FROM __orig o LEFT JOIN (
    SELECT id, string_agg(ch, '' ORDER BY pos) AS txt
    FROM __kept GROUP BY id) k USING (id)
)
SELECT id, CAST(orig_len AS INT) AS orig_len,
       CAST(length(clean_text) AS INT) AS clean_len,
       md5(clean_text) AS clean_md5
FROM __clean"""


def winnow_oracle_sql(docs_cte: str, window: int, w: int) -> str:
    """winnow_fingerprints replay: the identical A/B/t0/t1 selection rule
    over the shared hash stream, with A/B as lag/lead CASE ladders (the
    per-position array probes of the engine and these lag/leads read the
    same h[p-j]/h[p+j] values)."""
    a_sql = "CASE " + " ".join(
        f"WHEN lag(sh, {j}) OVER win < sh THEN {j}"
        for j in range(1, w)) + f" ELSE {w} END"
    b_sql = "CASE " + " ".join(
        f"WHEN lead(sh, {j}) OVER win <= sh THEN {j}"
        for j in range(1, w)) + f" ELSE {w} END"
    return f"""
WITH {shingle_hash_oracle_sql(docs_cte, window)},
__ab AS (
  SELECT id, pos, sh,
         {a_sql} AS a,
         {b_sql} AS b,
         count(*) OVER (PARTITION BY id) AS n,
         row_number() OVER win AS p
  FROM __sh
  WINDOW win AS (PARTITION BY id ORDER BY pos)
),
__sel AS (
  SELECT id, n, p,
         CASE WHEN n < {w} THEN a >= p AND b > n - p
              ELSE greatest(0, {w} - a, {w} - p) <= least({w} - 1, n - p)
                   AND b > greatest(0, {w} - a, {w} - p) END AS hit
  FROM __ab
)
SELECT id, CAST(n AS INT) AS n_windows,
       CAST(count(*) FILTER (WHERE hit) AS INT) AS n_fingerprints,
       CAST(coalesce(sum(p) FILTER (WHERE hit), 0) AS BIGINT) AS fp_pos_sum
FROM __sel GROUP BY id, n"""
