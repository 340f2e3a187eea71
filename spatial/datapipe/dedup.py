"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Shapes chosen for 100TB: every method is
    signature (narrow, vectorized NumPy per Arrow batch)
    -> band/bucket key explode of (id, key) rows only
    -> ONE aggregate per bucket (map-side partial) collecting the capped
       member list, with ordered candidate pairs expanded JVM-side by array
       transforms -- no self-join, no window pass
    -> exact verify on the candidate pairs (vectorized)
so the full text/embedding columns never shuffle -- only (id, key) rows and
then (id, id) candidates do. Bucket keys are Zipf-prone on boilerplate text;
the generator drops buckets with more than ``max_bucket`` members rather
than letting one degenerate bucket produce O(n^2) pairs -- the standard
web-dedup guard (and the cap also bounds the collect_list row size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# -- deterministic 64-bit string/shingle hashing (NumPy-vectorizable) -------

_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(z: np.ndarray) -> np.ndarray:
    z = (z ^ (z >> np.uint64(33))) * _M1
    z = (z ^ (z >> np.uint64(33))) * _M2
    return z ^ (z >> np.uint64(33))


def _hash_shingles(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hash of all k-char shingles -- O(n) vectorized."""
    if not text:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    P = np.uint64(1099511628211)
    # prefix hashes h[i] = b[0]*P^(i) + ... ; shingle hash via subtraction-free
    # scheme: cumulative product windows are numerically messy in modular
    # arithmetic without pow tables, so build the k-gram hash directly:
    n = len(b) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):  # k is small (4-8); each step vectorized over n
        acc = acc * P + b[j : j + n]
    return _mix64(acc)


# -- exact dedup -------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact-text group.

    One shuffle on a short digest (never on the text itself)."""
    h = F.md5(F.col(text_col))
    win = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, keeper_id) for every group with duplicates."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_dups") > 1)
    )


# -- MinHash + LSH ------------------------------------------------------------

def make_minhash_udf(num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
    rng = np.random.default_rng(seed)
    A = rng.integers(1, 2**63 - 1, num_perm, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    B = rng.integers(0, 2**63 - 1, num_perm, dtype=np.int64).astype(np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def minhash(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sh = _hash_shingles(t if isinstance(t, str) else "", shingle_k)
            if len(sh) == 0:
                out.append([0] * num_perm)
                continue
            # (num_perm, n_shingles) universal-hash matrix, min over shingles
            vals = (sh[None, :] * A[:, None] + B[:, None])
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 1000,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash LSH.

    ``sig_df`` (columns ``id``, ``sig``), when given, is used instead of
    recomputing signatures -- the caller persists it so the (Python UDF)
    signature pass and the parquet scan run once, not once per join branch.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    if sig_df is None:
        mh = make_minhash_udf(num_perm, shingle_k)
        sig = df.select(F.col(id_col).alias("id"), mh(F.col(text_col)).alias("sig"))
    else:
        sig = sig_df.select("id", "sig")
    band_cols = [
        F.xxhash64(F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band))
        .alias("bucket")
        for b in range(bands)
    ]
    banded = sig.select("id", F.explode(F.array(*band_cols)).alias("bucket"))
    # One aggregate replaces the window-count guard + self-join: collect the
    # (capped) member list per bucket, then expand ordered pairs JVM-side
    # with array transforms -- no second shuffle of the banded rows, no hash
    # build of a self-join, and map-side partial aggregation on the way in.
    buckets = (
        banded.groupBy("bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = F.expr(
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), b -> struct(a AS id_a, b AS id_b))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        # strict <: a bucket-hash collision across bands could list one id twice
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def make_jaccard_udf(shingle_k: int = 5):
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def jaccard(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
        # candidate pairs repeat the same documents many times within a
        # batch; memoize shingle sets per distinct text
        cache: dict = {}

        def sh(t):
            key = t if isinstance(t, str) else ""
            s = cache.get(key)
            if s is None:
                s = set(_hash_shingles(key, shingle_k).tolist())
                cache[key] = s
            return s

        out = np.zeros(len(text_a))
        for i, (ta, tb) in enumerate(zip(text_a, text_b)):
            sa, sb = sh(ta), sh(tb)
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 1.0
        return pd.Series(out)

    return jaccard


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    estimate_margin: float = 0.2,
    **lsh_kw,
) -> DataFrame:
    """Verified near-dup pairs: LSH candidates -> minhash-estimate prefilter
    -> exact n-gram Jaccard.

    The prefilter computes the unbiased Jaccard estimate (fraction of equal
    signature components) entirely JVM-side and drops candidates estimated
    below ``threshold - estimate_margin`` before the (Python) exact verify.
    With 64 permutations, a pair whose TRUE Jaccard >= threshold estimating
    more than 0.2 below it is a >3-sigma binomial tail (sigma ~ 0.057), so
    the prefilter is sound in practice while cutting the exact-verify load
    by the mass of sub-threshold candidates (web corpora: the vast
    majority)."""
    num_perm = lsh_kw.get("num_perm", 64)
    mh = make_minhash_udf(num_perm, lsh_kw.get("shingle_k", 5))
    # One signature pass, persisted: the plan below references `sigs` three
    # times (banded candidate gen + both sides of the verify join); without
    # the persist each branch would re-scan the source and re-run the UDF.
    # MEMORY_AND_DISK default spills rather than OOMs at corpus scale; the
    # cached width is id + 64 longs + the text needed for exact verify.
    sigs = df.select(F.col(id_col).alias("id"), mh(F.col(text_col)).alias("sig"),
                     F.col(text_col).alias("t")).persist()
    cand = minhash_candidates(df, text_col, id_col, sig_df=sigs, **lsh_kw)
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                        lambda x: x))
        / F.lit(float(num_perm))
    )
    jac = make_jaccard_udf(lsh_kw.get("shingle_k", 5))
    pairs = (
        cand.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
                              F.col("t").alias("ta")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
                          F.col("t").alias("tb")), "id_b")
        .withColumn("est", est)
        .where(F.col("est") >= threshold - estimate_margin)
        .withColumn("jaccard", jac("ta", "tb"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


# -- SimHash -------------------------------------------------------------------

def make_simhash_udf(shingle_k: int = 4):
    @pandas_udf(LongType())
    def simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        bitpos = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(text):
            sh = _hash_shingles(t if isinstance(t, str) else "", shingle_k)
            if len(sh) == 0:
                continue
            bits = (sh[:, None] >> bitpos[None, :]) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 >= len(sh)
            val = np.uint64(0)
            for p in np.nonzero(votes)[0]:
                val |= np.uint64(1) << np.uint64(p)
            out[i] = val.astype(np.int64)
        return pd.Series(out)

    return simhash


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, shingle_k: int = 4,
                  max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole: split 64 bits into max_hamming+1 blocks; any pair within the
    Hamming budget agrees exactly on >= 1 block, so block-equality buckets
    are a complete candidate generator."""
    sh = make_simhash_udf(shingle_k)
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    sigs = df.select(F.col(id_col).alias("id"), sh(F.col(text_col)).alias("sh"))
    block_cols = [
        F.xxhash64(F.lit(blk),
                   F.shiftrightunsigned(F.col("sh"), blk * width)
                   .bitwiseAND(F.lit((1 << width) - 1)))
        .alias("bucket")
        for blk in range(n_blocks)
    ]
    banded = sigs.select("id", "sh", F.explode(F.array(*block_cols)).alias("bucket"))
    # one aggregate per bucket, then JVM-side ordered-pair expansion with the
    # hamming filter applied BEFORE the dedup shuffle (no self-join, no
    # window pass; signatures ride along inside the collected structs)
    buckets = (
        banded.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("id", "sh"))).alias("ms"))
        .where((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
    )
    pairs = F.expr(
        "flatten(transform(ms, (a, i) -> "
        "transform(slice(ms, i + 2, size(ms)), b -> "
        "struct(a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b))))"
    )
    hamming = F.bit_count(F.col("p.sh_a").bitwiseXOR(F.col("p.sh_b")))
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .withColumn("hamming", hamming)
        .where((F.col("hamming") <= max_hamming)
               & (F.col("p.id_a") < F.col("p.id_b")))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"),
                "hamming")
        .distinct()
    )


# -- embedding cosine near-dup --------------------------------------------------

def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    max_bucket: int = 2000,
    n_tables: int = 4,
) -> DataFrame:
    """Pairs with cosine >= threshold via sign-LSH bucketing + exact verify.

    n_tables independent hyperplane tables keep recall high at tight
    thresholds (a pair collides if it matches in ANY table)."""
    from pyspark.sql.types import DoubleType

    dim_probe = df.select(F.size(vec_col)).first()[0]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim_probe))

    @pandas_udf(ArrayType(LongType()))
    def sketch(vecs: pd.Series) -> pd.Series:
        V = np.asarray(vecs.tolist(), dtype=np.float64)
        out = np.zeros((len(V), n_tables), dtype=np.int64)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        for t in range(n_tables):
            signs = (V @ planes[t].T) > 0
            out[:, t] = signs @ weights + t * (1 << (n_planes + 2))
        return pd.Series(out.tolist())

    @pandas_udf(DoubleType())
    def cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.asarray(va.tolist(), dtype=np.float64)
        B = np.asarray(vb.tolist(), dtype=np.float64)
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(np.where(den > 0, num / den, 0.0))

    # Bucket on ids ONLY (8 bytes x n_tables per vector into the shuffle,
    # never the embedding itself), expand ordered pairs JVM-side, then join
    # the two vectors back for the exact verify -- the column-pruned source
    # scan is far cheaper than replicating vectors through bucket explode +
    # self-join.
    sk = df.select(F.col(id_col).alias("id"),
                   F.explode(sketch(vec_col)).alias("bucket"))
    buckets = (
        sk.groupBy("bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = F.expr(
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), b -> struct(a AS id_a, b AS id_b))))"
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine", cosine("va", "vb"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
