"""Exact set-similarity join via prefix filtering (PPJoin-style): all
document pairs with token-set Jaccard >= t, with NO false negatives --
the deterministic, threshold-exact counterpart to the MinHash pipeline
(which is probabilistic: its bands can miss a qualifying pair).

Prefix-filter principle (Chaudhuri et al. SSJoin / Xiao et al. PPJoin):
order every document's distinct tokens by one GLOBAL rarity rank
(ascending document frequency -- rarest first). If |A inter B| >= o then
A and B must share a token among the first |A| - o + 1 tokens of A (and
likewise B): remove any prefix token and you can delete at most p-1
elements of the intersection. For Jaccard >= t the intersection bound is
o = ceil(t * m) (|A inter B| >= t * |A union B| >= t * m_A), so a prefix
of length m - ceil(t*m) + 1 per document suffices -- every qualifying
pair collides on some prefix token, and rare-token prefixes keep those
collision buckets small (the frequency ordering is the entire pruning
power: a stopword prefix would pair everything).

The overlap bound is computed in INTEGER arithmetic from the rational
threshold (``ceil(num*m/den)`` as ``(num*m + den - 1) DIV den``):
float ``ceil(0.95 * 20) = 20`` (0.95 rounds up in binary) would SHRINK
the prefix below the theorem's bound and silently drop pairs.

Scale shape: tokens shuffle as (doc, term) once for the distinct + the
frequency count; ranks join back broadcast-from-summary (vocab-sized);
candidate generation explodes only the SHORT prefixes and equi-joins on
rank; verification re-joins the two token-rank arrays by pair and
computes exact intersection sizes -- ids and small int arrays shuffle,
never text. The final jaccard is one IEEE division of exact integers
(repo float-parity policy), so the >= t cut is bit-identical in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def similarity_join(df: DataFrame, threshold_num: int, threshold_den: int,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """All pairs with distinct-token Jaccard >= threshold_num/threshold_den:
    (id_a, id_b, n_inter, n_union, jaccard). Exact -- equals the all-pairs
    result by the prefix-filter theorem."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda w: w != "")
    dt = (df.select(F.col(id_col).alias("doc_id"),
                    F.explode(toks).alias("term"))
          .distinct())
    freq = dt.groupBy("term").agg(F.count("*").alias("df"))
    # global rarity rank over the vocab-sized summary (total order)
    w = Window.orderBy(F.col("df").asc(), F.col("term").asc())
    rank = freq.withColumn("rk", F.row_number().over(w)).select("term", "rk")
    # per-doc sorted rank array, rarest first
    docs = (dt.join(rank, "term")
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("rk")).alias("rks"))
            .withColumn("m", F.size("rks"))
            # integer ceil: o = (num*m + den - 1) DIV den; prefix = m - o + 1
            .withColumn("p", F.col("m")
                        - F.expr(f"({threshold_num} * m + {threshold_den} - 1) "
                                 f"DIV {threshold_den}") + 1))
    pref = docs.select("doc_id",
                       F.explode(F.slice("rks", 1, F.col("p"))).alias("rk"))
    cand = (pref.alias("a").join(pref.alias("b"), "rk")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct())
    da = docs.select(F.col("doc_id").alias("id_a"), F.col("rks").alias("ra"),
                     F.col("m").alias("ma"))
    db = docs.select(F.col("doc_id").alias("id_b"), F.col("rks").alias("rb"),
                     F.col("m").alias("mb"))
    t = F.lit(float(threshold_num) / threshold_den)
    return (
        cand.join(da, "id_a").join(db, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("ra", "rb"))
                    .cast("bigint"))
        .withColumn("n_union", (F.col("ma") + F.col("mb")
                                - F.col("n_inter")).cast("bigint"))
        .withColumn("jaccard", F.col("n_inter").cast("double")
                    / F.col("n_union").cast("double"))
        .where(F.col("jaccard") >= t)
        .select("id_a", "id_b", "n_inter", "n_union", "jaccard")
    )


def similarity_join_oracle_sql(threshold_num: int, threshold_den: int,
                               table: str = "documents") -> str:
    """The ALL-PAIRS exact result the prefix-filtered engine plan is
    provably equal to: intersection counts from a token self-join (a pair
    with zero shared tokens cannot reach any t > 0), one exact division,
    the same rational threshold."""
    t = f"(CAST({threshold_num} AS DOUBLE) / {threshold_den})"
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            x -> x <> '')) AS term
  FROM {table} WHERE text IS NOT NULL),
m AS (SELECT doc_id, COUNT(*) AS m FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM toks a JOIN toks b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, CAST(n_inter AS BIGINT) AS n_inter,
       CAST(ma.m + mb.m - n_inter AS BIGINT) AS n_union,
       CAST(n_inter AS DOUBLE) / CAST(ma.m + mb.m - n_inter AS DOUBLE)
         AS jaccard
FROM inter JOIN m ma ON ma.doc_id = id_a JOIN m mb ON mb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / CAST(ma.m + mb.m - n_inter AS DOUBLE) >= {t}"""
