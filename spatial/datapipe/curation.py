"""Corpus curation operators for training-data assembly: deterministic
stratified sampling and token-budget shard packing.

Both are pure-JVM column programs (whole-stage codegen, no Python in the
hot path) and both are SQL-replayable bit-for-bit, so they sit under the
driver's exact-oracle gate like every other operator.

* ``hash_sample``    -- seedless deterministic sampling: keep a row iff a
                        multiplicative-congruential hash of its id lands
                        under the stratum's rate.  Unlike ``df.sample()``
                        (partition-order-dependent RNG), the decision is a
                        pure function of the id, so the sample is stable
                        across partitioning, retries, and engines -- the
                        property a 100 TB pipeline actually needs (re-runs
                        and backfills must pick the SAME rows).
* ``pack_by_budget`` -- assign documents to fixed-token-budget training
                        shards via a per-group running sum: shard_id =
                        floor(exclusive_cumsum(n_tokens) / budget).  The
                        sequential greedy packer ("close shard when the next
                        doc overflows") is inherently serial -- state at doc
                        i depends on all i-1 predecessors -- so the
                        distributed-native equivalent is cumulative-sum
                        packing, which wastes at most one document's tokens
                        per shard boundary and is a single window pass.

Scale notes: ``pack_by_budget`` parallelizes across groups (the window
partitions by ``group_col`` -- languages, sources, date buckets...).  For
one giant group, the same math runs as a two-phase prefix sum
(per-partition partials, broadcast offsets); the grouped shape is shipped
because training shards are grouped in practice.  ``hash_sample`` is
embarrassingly parallel.

The hash is a two-round multiplicative-congruential mixer over the prime
modulus P = 4294967291 (largest prime < 2^32) with multipliers < 2^31, so
every intermediate product stays below 2^63: no overflow under Spark 4's
ANSI mode, and DuckDB BIGINT replays it exactly (all values non-negative,
so ``%`` == ``pmod``).

Reference scope note: haskell-postgis (a geometry codec library) has no
sampling/packing surface; these belong to the training-data-pipeline
mandate (SURVEY.md section 2.3) layered on the codec core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count

_P = 4294967291          # largest prime below 2^32
_M1 = 1597334677         # multipliers < 2^31: P * m < 2^63 (ANSI-safe)
_C1 = 40503
_M2 = 279470273
PERMYRIAD = 10000        # rates are expressed per ten thousand


def mix_hash(id_col: Column) -> Column:
    """Two-round multiplicative-congruential mix of a non-negative id into
    [0, P) -- every intermediate < 2^63 (ANSI-safe), exactly replayable in
    BIGINT SQL."""
    h = F.pmod(id_col, F.lit(_P))
    h = F.pmod(h * _M1 + _C1, F.lit(_P))
    return F.pmod(h * _M2, F.lit(_P))


def mix_hash_sql(id_expr: str) -> str:
    """The identical mix in DuckDB SQL (all values non-negative, so ``%``
    coincides with pmod)."""
    return (f"(((({id_expr}) % {_P}) * {_M1} + {_C1}) % {_P} * {_M2} "
            f"% {_P})")


def sample_bucket(id_col: Column) -> Column:
    """Deterministic bucket in [0, 10000) -- a pure function of the id."""
    return F.pmod(mix_hash(id_col), F.lit(PERMYRIAD))


def sample_bucket_sql(id_expr: str) -> str:
    """The identical bucket computation in DuckDB SQL."""
    return f"{mix_hash_sql(id_expr)} % {PERMYRIAD}"


def hash_sample(df: DataFrame, rates: dict[str, int],
                id_col: str = "doc_id", stratum_col: str = "lang",
                default_rate: int = 0) -> DataFrame:
    """Stratified deterministic sample: keep a row iff
    ``sample_bucket(id) < rates[stratum]`` (rates per-10000).  Strata
    missing from ``rates`` fall back to ``default_rate``.  Adds the
    ``bucket`` column (useful for audit / consistent sub-sampling: a 5%%
    sample is a strict subset of the 10%% sample by construction)."""
    rate = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(r)).otherwise(rate)
    return (
        df.withColumn("bucket", sample_bucket(F.col(id_col)))
        .where(F.col("bucket") < rate)
    )


def hash_sample_case_sql(rates: dict[str, int], stratum_col: str = "lang",
                         default_rate: int = 0) -> str:
    cases = " ".join(f"WHEN {stratum_col} = '{s}' THEN {r}"
                     for s, r in sorted(rates.items()))
    return f"CASE {cases} ELSE {default_rate} END"


def pack_by_budget(df: DataFrame, budget: int = 512,
                   id_col: str = "doc_id", text_col: str = "text",
                   group_col: str = "lang") -> DataFrame:
    """Token-budget shard assignment: within each group (ordered by id),
    shard_id = exclusive-running-sum(n_tokens) DIV budget.  A document
    never splits across shards; a document longer than the budget owns
    one-plus shards' worth of one shard (standard no-split semantics).
    Adds ``n_tokens`` and ``shard_id``.  Integer-only arithmetic."""
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        df.withColumn("n_tokens", token_count(F.col(text_col)).cast("bigint"))
        .withColumn("__cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("shard_id", F.expr(f"CAST(__cum DIV {budget} AS BIGINT)"))
        .drop("__cum")
    )


def cap_per_key(df: DataFrame, key_col: str, k: int,
                id_col: str = "doc_id") -> DataFrame:
    """FREQUENCY CAPPING: keep at most ``k`` rows per key (the MassiveText/
    web-curation guard against one domain flooding the corpus), selected
    by deterministic mix-hash order of the id with id tie-break -- a pure
    function of content ids, stable across partitionings and retries
    (arrival-order capping is neither).

    Scale shape -- the salted two-stage top-k: stage 1 ranks within
    (key, source-partition) so a hot key (one domain with 10^9 pages)
    never concentrates in a single task; each group keeps its local top-k
    (per-key top-k is decomposable, so this drops no global winner).
    Stage 2 ranks the <= k * n_partitions survivors per key globally.
    Adds ``rank`` (1..k in the final hash order)."""
    h = mix_hash(F.col(id_col))
    local = Window.partitionBy(key_col, F.spark_partition_id()) \
                  .orderBy(h.asc(), F.col(id_col).asc())
    pruned = (df.withColumn("__lrk", F.row_number().over(local))
              .where(F.col("__lrk") <= k).drop("__lrk"))
    final = Window.partitionBy(key_col).orderBy(h.asc(), F.col(id_col).asc())
    return (pruned.withColumn("rank", F.row_number().over(final).cast("int"))
            .where(F.col("rank") <= k))


def weighted_sample(df: DataFrame, weight: Column,
                    id_col: str = "doc_id") -> DataFrame:
    """Per-row WEIGHTED deterministic Bernoulli sampling: keep a row iff
    ``sample_bucket(id) < weight`` where ``weight`` is any integer column
    expression in [0, 10000] (per-ten-thousand keep probability) -- the
    quality-weighted curation sampler (upweight high-quality sources,
    downweight boilerplate domains) with hash_sample's stability contract:
    the decision is a pure function of (id, weight), identical across
    partitionings, retries, and engines, and monotone in the weight (a row
    kept at weight w stays kept at any w' >= w, so tightening a sampling
    schedule only removes rows -- the property reproducible data pipelines
    need). Embarrassingly parallel; adds ``bucket``."""
    return (
        df.withColumn("bucket", sample_bucket(F.col(id_col)))
        .where(F.col("bucket") < weight)
    )


def curation_pipeline(docs: DataFrame, eval_df: DataFrame, *,
                      minhash_threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16, dedup_shingle_k: int = 5,
                      min_tokens: int = 20, max_tokens: int = 90,
                      decontam_threshold: float = 0.8, shingle_k: int = 8,
                      max_df: int = 100, cuts: tuple[int, int] = (9000, 9500),
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """END-TO-END training-corpus curation: the composed pipeline a user of
    this engine actually runs, as ONE lazy DataFrame program --

        near-dup removal  (MinHash LSH pairs -> connected components,
                           keep = component-min doc)
      -> length filter    (token_count in [min_tokens, max_tokens] --
                           integer bounds, the Gopher-style cut, chosen
                           integer-exact so no float threshold can sit on
                           a rounding boundary)
      -> decontamination  (drop any surviving doc that >=80%-contains an
                           eval-set document's shingles)
      -> leakage-free split (split = hash of the near-dup COMPONENT id,
                           so residual dup partners can never straddle
                           the train/eval boundary)
      -> per-split corpus stats (doc + token counts, exact BIGINTs).

    Every stage is an already-oracled operator; the composition is itself
    exactly SQL-replayable (the driver query q_curation_pipeline pins the
    full five-stage result). Scale shape: each stage's 100 TB argument is
    its module's (dedup.py / cluster.py / decontam.py / curation.py);
    composition adds NO new shuffle beyond its stages -- the component map
    and contaminated-id list ride broadcast-sized joins onto the corpus,
    and stats are one map-side-combined aggregate."""
    from .cluster import dedup_assign
    from .decontam import contamination_pairs
    from .dedup import minhash_dedup_pairs
    from .textstats import token_count

    # dedup_shingle_k (near-dup detection, word-scale 5) is deliberately
    # independent of shingle_k (decontamination containment, 8): the two
    # stages answer different questions and the driver oracle composes the
    # SAME ks.
    pairs = minhash_dedup_pairs(docs, text_col=text_col, id_col=id_col,
                                threshold=minhash_threshold,
                                num_perm=num_perm, bands=bands,
                                shingle_k=dedup_shingle_k)
    assigned = dedup_assign(docs.select(id_col, text_col), pairs,
                            id_col=id_col)
    kept = assigned.where(F.col("keep"))
    qual = (kept.withColumn("__n_tokens",
                            token_count(F.col(text_col)).cast("long"))
            .where((F.col("__n_tokens") >= min_tokens)
                   & (F.col("__n_tokens") <= max_tokens)))
    cont = contamination_pairs(eval_df, qual,
                               threshold=decontam_threshold,
                               shingle_k=shingle_k, max_df=max_df,
                               id_col=id_col, text_col=text_col)
    clean = qual.join(
        cont.select(F.col("train_id").alias(id_col)).distinct(),
        id_col, "left_anti")
    lo, hi = cuts
    b = sample_bucket(F.col("cluster_id"))
    return (clean
            .withColumn("split",
                        F.when(b < lo, F.lit("train"))
                         .when(b < hi, F.lit("val"))
                         .otherwise(F.lit("test")))
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("__n_tokens").alias("n_tokens"))
            .select("split", "n_docs", "n_tokens"))
