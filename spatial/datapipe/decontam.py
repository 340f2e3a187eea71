"""Eval-set decontamination: detect test documents whose character-shingle
sets substantially overlap a training-corpus document.

The standard hygiene step before training on web text: a benchmark document
that leaked into the training corpus (verbatim or lightly edited) inflates
eval scores; n-gram overlap against the training set is the accepted
detector.  This operator reports (test_id, train_id, overlap, n_test
shingles, ratio) for every pair whose containment ratio

    ratio = |shingles(test) ∩ shingles(train)| / |shingles(test)|

meets a threshold -- containment (not Jaccard), because a short benchmark
item embedded in a long crawled page is still contamination.

100 TB shape (same discipline as dedup.py):
* Shingle hashes are the engine's uint64 rolling hash (`_hash_shingles`,
  vectorized NumPy per Arrow batch); only (id, shingle) LONG rows shuffle
  -- never text.
* The candidate join is on the shingle hash; web boilerplate would make
  ubiquitous shingles join-explode, so train-side shingles appearing in
  more than ``max_df`` train documents are dropped FIRST (a frequent
  shingle carries no contamination signal -- the analog of dedup.py's
  bucket cap, and of stopword removal in every published decontamination
  pipeline).  The guard also bounds the per-shingle join fan-out to
  max_df, making worst-case intermediate size |test shingles| * max_df.
* The denominator counts the FULL test shingle set (computed before any
  filtering), so the guard can only under-report, never inflate, a ratio.
* Empty/sub-k documents on either side are excluded (no shingles, no set
  to overlap) -- matching the SQL oracle's no-shingle-rows semantics
  exactly (the dedup empty-doc parity rule).

Oracle: the shared ``shingle_hash_oracle_sql`` replay over a combined
corpus CTE, split back into test/train by id predicate, with the identical
max_df guard and the exact integer-ratio division (one IEEE division of
exact counts -- bit-identical cross-engine).

Reference scope note: haskell-postgis is a geometry codec library; this
operator belongs to the training-data-pipeline mandate (SURVEY.md section
2.3) layered on the codec core.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .dedup import _hash_shingles, shingle_hash_oracle_sql


def make_shingle_set_udf(shingle_k: int = 8):
    """text -> sorted DISTINCT shingle hashes (int64 view of the uint64
    rolling hash; signedness is irrelevant -- values only ever feed
    equality joins and counts)."""

    @pandas_udf(ArrayType(LongType()))
    def shingles(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sh = _hash_shingles(t if isinstance(t, str) else "", shingle_k)
            out.append(np.unique(sh).view(np.int64).tolist())
        return pd.Series(out)

    return shingles


def contamination_pairs(test_df: DataFrame, train_df: DataFrame,
                        threshold: float = 0.8, shingle_k: int = 8,
                        max_df: int = 100, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(test_id, train_id, overlap, n_test_shingles, ratio) for every
    test/train pair with containment ratio >= threshold.

    The train shingle rows stay persisted behind the returned lazy frame
    (they back both the guard aggregate and the candidate join); callers
    running many corpora through one session may ``spark.catalog.
    clearCache()`` or unpersist after consuming the result."""
    sh = make_shingle_set_udf(shingle_k)

    # ONE UDF pass on the test side: the denominator (full distinct-set
    # size, before any guard) rides the same projection as the explode --
    # F.size(__arr) and explode(__arr) both read the one bound attribute,
    # so no second text scan and no separate sizes aggregate/join.
    tsh = (
        test_df.where(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col).alias("test_id"),
                sh(F.col(text_col)).alias("__arr"))
        .select("test_id", F.size("__arr").alias("n_test_shingles"),
                F.explode("__arr").alias("sh"))
    )
    # ONE UDF pass on the train side: the exploded (train_id, sh) longs are
    # persisted text-free (the dedup.py signature-cache discipline), so the
    # boilerplate-guard aggregate fills the cache and the candidate join
    # reads it back instead of re-running the Python shingler.
    rsh = (
        train_df.where(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col).alias("train_id"),
                F.explode(sh(F.col(text_col))).alias("sh"))
    ).persist()
    # boilerplate guard: drop train shingles present in > max_df train docs
    ok = (rsh.groupBy("sh").agg(F.count("*").alias("__df"))
          .where(F.col("__df") <= max_df).select("sh"))
    matches = (
        tsh.join(rsh.join(ok, "sh"), "sh")
        .groupBy("test_id", "train_id", "n_test_shingles")
        .agg(F.count("*").alias("overlap"))
    )
    return (
        matches
        .withColumn("ratio",
                    F.col("overlap").cast("double")
                    / F.col("n_test_shingles").cast("double"))
        .where(F.col("ratio") >= threshold)
        .select("test_id", "train_id", "overlap", "n_test_shingles", "ratio")
    )


def contamination_oracle_sql(docs_cte: str, test_pred: str, train_pred: str,
                             threshold: float, shingle_k: int = 8,
                             max_df: int = 100) -> str:
    """Full SQL replay over a combined (id, text) corpus CTE: the engine's
    rolling shingle hash (shared renderer), split into test/train by id
    predicate, identical max_df guard, exact count-ratio division against
    the same float threshold the engine uses."""
    from ..synth import sql_double

    return f"""
WITH {shingle_hash_oracle_sql(docs_cte, shingle_k)},
__dsh AS (SELECT DISTINCT id, sh FROM __sh),
__tsh AS (SELECT id AS test_id, sh FROM __dsh WHERE {test_pred}),
__rsh0 AS (SELECT id AS train_id, sh FROM __dsh WHERE {train_pred}),
__sizes AS (SELECT test_id, COUNT(*) AS n_test_shingles
            FROM __tsh GROUP BY test_id),
__ok AS (SELECT sh FROM __rsh0 GROUP BY sh HAVING COUNT(*) <= {max_df}),
__rsh AS (SELECT r.train_id, r.sh FROM __rsh0 r JOIN __ok USING (sh)),
__m AS (
  SELECT t.test_id, r.train_id, COUNT(*) AS overlap
  FROM __tsh t JOIN __rsh r ON t.sh = r.sh
  GROUP BY t.test_id, r.train_id
)
SELECT m.test_id, m.train_id, m.overlap, s.n_test_shingles,
       CAST(m.overlap AS DOUBLE) / CAST(s.n_test_shingles AS DOUBLE) AS ratio
FROM __m m JOIN __sizes s USING (test_id)
WHERE CAST(m.overlap AS DOUBLE) / CAST(s.n_test_shingles AS DOUBLE)
      >= {sql_double(threshold)}"""
