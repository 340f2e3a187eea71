"""Inverted index construction -- the search-engine-side operator of a
web-corpus engine: term -> (doc_freq, total occurrences, capped posting
list of doc ids).

Scale shape (the one that survives 10^12 documents):

* tokenize + explode is map-side; the (term, doc) occurrence count and the
  per-term stats are two map-side-combined aggregates -- only (term, id,
  count) rows ever shuffle, never text.
* ``max_df`` drops corpus-stopword terms BEFORE any posting list
  materializes (the bucket-guard discipline from the MinHash pipeline:
  never collect_list an unbounded group).
* ``max_postings`` bounds every posting row via the salted two-stage
  top-k (the cap_per_key discipline): a local rank within (term,
  source-partition) prunes to <= P rows per term per task, so a term
  appearing in 10^9 documents never concentrates in one task, THEN the
  global rank keeps the P smallest doc ids. Per-term top-k by a total
  order is decomposable, so the two-stage result equals the single-pass
  global rank -- which is exactly what the DuckDB oracle computes.
* posting lists are sorted doc-id arrays (delta-encodable downstream).

Determinism: postings are the P smallest doc ids per term -- a pure
function of corpus content, independent of partitioning/arrival order.

Reference scope note: haskell-postgis is a geometry codec library with no
text surface; the inverted index belongs to the engine's web-corpus
mandate (SURVEY.md section 2.3) layered over the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", max_df: int | None = None,
                   max_postings: int = 32) -> DataFrame:
    """Build (term, doc_freq, n_occurrences, postings) with bounded rows.

    ``doc_freq``/``n_occurrences`` are FULL corpus counts; ``postings`` is
    the capped sorted prefix (the first ``max_postings`` doc ids), so the
    stats stay exact even where the list is truncated. Terms with
    doc_freq > ``max_df`` (corpus stopwords) are dropped entirely when
    ``max_df`` is given."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda w: w != "")
    tf = (df.select(F.col(id_col).alias("doc_id"),
                    F.explode(toks).alias("term"))
          .groupBy("term", "doc_id").agg(F.count("*").alias("n_occ")))
    stats = (tf.groupBy("term")
             .agg(F.count("*").alias("doc_freq"),
                  F.sum("n_occ").alias("n_occurrences")))
    if max_df is not None:
        stats = stats.where(F.col("doc_freq") <= max_df)
    # two-stage capped top-k on doc_id (smallest ids win): local prune
    # within (term, partition) bounds every task, global rank finishes.
    kept = tf.join(stats.select("term"), "term")
    local = Window.partitionBy("term", F.spark_partition_id()) \
                  .orderBy(F.col("doc_id").asc())
    pruned = (kept.withColumn("__lrk", F.row_number().over(local))
              .where(F.col("__lrk") <= max_postings).drop("__lrk"))
    final = Window.partitionBy("term").orderBy(F.col("doc_id").asc())
    postings = (pruned.withColumn("__rk", F.row_number().over(final))
                .where(F.col("__rk") <= max_postings)
                .groupBy("term")
                .agg(F.sort_array(F.collect_list("doc_id"))
                     .alias("postings")))
    return (stats.join(postings, "term")
            .select("term", "doc_freq",
                    F.col("n_occurrences").cast("bigint")
                    .alias("n_occurrences"), "postings"))


def inverted_index_oracle_sql(max_df: int | None = None,
                              max_postings: int = 32,
                              table: str = "documents") -> str:
    """The identical index in DuckDB SQL: full-count stats + the global
    ROW_NUMBER() cap the two-stage engine plan is provably equal to."""
    df_guard = f"HAVING COUNT(*) <= {max_df}" if max_df is not None else ""
    return f"""
WITH tf AS (
  SELECT term, doc_id, COUNT(*) AS n_occ FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              t -> t <> '')) AS term
    FROM {table} WHERE text IS NOT NULL)
  GROUP BY term, doc_id),
stats AS (
  SELECT term, COUNT(*) AS doc_freq,
         CAST(SUM(n_occ) AS BIGINT) AS n_occurrences
  FROM tf GROUP BY term {df_guard}),
capped AS (
  SELECT t.term, t.doc_id,
         ROW_NUMBER() OVER (PARTITION BY t.term ORDER BY t.doc_id) AS rk
  FROM tf t JOIN stats s ON s.term = t.term)
SELECT s.term, s.doc_freq, s.n_occurrences,
       (SELECT list(c.doc_id ORDER BY c.doc_id) FROM capped c
        WHERE c.term = s.term AND c.rk <= {max_postings}) AS postings
FROM stats s"""
