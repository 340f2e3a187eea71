"""Bloom-filter semi-join: push a compact membership filter of the build
side into the probe-side scan before the exact join.

This is the classic distributed join optimization (Spark's own runtime
row-level filtering does the same under AQE): at 100 TB the probe table is
the dominant cost, and shuffling probe rows that cannot possibly match is
pure waste.  A Bloom filter of the build-side keys is a few KB of
bit-state; testing it is a handful of pure-JVM bit operations inside the
probe scan (whole-stage codegen), so non-matching rows die before the
shuffle.

Correctness: a Bloom filter has false positives but NO false negatives,
so ``prefilter -> exact semi-join`` returns exactly the rows of the plain
semi-join -- which is what the driver oracle asserts (the plain semi-join
SQL).  The filter is an invisible physical optimization, like an index.

Determinism: the k bit positions come from the same lowbias32 non-linear
chain as the repo's sketches (affine hash chains lattice on sequential
ids); the filter words are built with a bitwise-OR aggregate -- OR is
commutative/associative/idempotent, so the bit array is identical at any
partitioning.

100 TB shape:
* build side: ``groupBy(word) bit_or`` -- two-level hash aggregate, at
  most m/64 output rows regardless of build cardinality; collected to the
  driver (bounded: m bits = 8 KB at m=2^16) and shipped to executors as
  one array literal in the plan -- the same shape Spark's own
  runtime-filter subquery broadcast uses.
* probe side: k ANDed bit tests against the literal array -- no join, no
  shuffle, no Python; survivors proceed to the ordinary exact semi-join
  whose shuffle is proportional to the SURVIVORS only.
* sizing: ~10 bits per build key with k=3 gives ~1.7% false positives;
  m is a power of two so position reduction is a mask, not a mod.

Reference scope note: haskell-postgis is a codec library with no join
surface; joins belong to the engine mandate (SURVEY.md section 2.1.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK = 0xFFFFFFFF
_MUL1 = 0x21F0AAAD      # lowbias32 multipliers (< 2^31: ANSI-safe)
_MUL2 = 0x735A2D97
_SALT = 0x9E3779B1      # per-hash-index salt, folded in BEFORE the chain


def _chain(x: Column) -> Column:
    """lowbias32 non-linear finalizer (same rounds as sketches.py)."""
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = (x * _MUL1).bitwiseAND(F.lit(_MASK))
    x = x.bitwiseXOR(F.shiftright(x, 15))
    x = (x * _MUL2).bitwiseAND(F.lit(_MASK))
    return x.bitwiseXOR(F.shiftright(x, 15))


def bit_pos(key: Column, i, m_bits: int) -> Column:
    """Bit position #i for ``key`` in [0, m_bits); ``i`` may be an int or a
    Column; m_bits must be a power of two."""
    i_col = i if isinstance(i, Column) else F.lit(i)
    k32 = F.shiftright(key, 32).bitwiseXOR(key).bitwiseAND(F.lit(_MASK))
    x0 = (k32 + i_col * F.lit(_SALT)).bitwiseAND(F.lit(_MASK))
    return _chain(x0).bitwiseAND(F.lit(m_bits - 1))


def bloom_build(build: DataFrame, key_col: str, m_bits: int = 1 << 16,
                k: int = 3) -> list[int]:
    """Aggregate the k bit positions of every build key into m_bits/64
    words via bit_or; returns the zero-filled word list (bounded driver
    state, m_bits/8 bytes)."""
    pos = (
        build.select(F.col(key_col).alias("__k"))
        .withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("__p", bit_pos(F.col("__k"), F.col("__i"), m_bits))
        .select(F.shiftright(F.col("__p"), 6).alias("word"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))")
                .alias("bit"))
        .groupBy("word").agg(F.expr("bit_or(bit)").alias("bits"))
    )
    arr = [0] * (m_bits // 64)
    for r in pos.collect():            # bounded: <= m_bits/64 rows
        arr[int(r["word"])] = int(r["bits"])
    return arr


def with_bloom_test(df: DataFrame, key_col: str, words: list[int],
                    k: int = 3, out_col: str = "__bloom_hit") -> DataFrame:
    """Adds a boolean column: all k bits of ``key_col`` set in ``words``.
    The word array enters the plan once as an array<long> literal; the
    test is pure-JVM bit arithmetic (named intermediate columns so the
    column-amount shifts can use the SQL form)."""
    m_bits = len(words) * 64
    out = df.withColumn("__bloom_arr", F.lit(words))
    tests = []
    for i in range(k):
        out = out.withColumn(f"__bp{i}", bit_pos(F.col(key_col), i, m_bits))
        tests.append(
            "(element_at(__bloom_arr, CAST((__bp{i} >> 6) + 1 AS INT)) & "
            "shiftleft(CAST(1 AS BIGINT), CAST(__bp{i} % 64 AS INT))) != 0"
            .format(i=i))
    out = out.withColumn(out_col, F.expr(" AND ".join(tests)))
    return out.drop("__bloom_arr", *[f"__bp{i}" for i in range(k)])


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_col: str,
                    build_col: str, m_bits: int = 1 << 16,
                    k: int = 3) -> DataFrame:
    """Exact semi-join with a Bloom prefilter on the probe side: identical
    result set to ``probe.join(build, ..., 'left_semi')`` -- the filter
    only removes rows that provably cannot match; false positives are
    eliminated by the exact join that follows."""
    words = bloom_build(build, build_col, m_bits=m_bits, k=k)
    pre = (with_bloom_test(probe, probe_col, words, k=k)
           .where(F.col("__bloom_hit")).drop("__bloom_hit"))
    return pre.join(
        build.select(F.col(build_col).alias(probe_col)).distinct(),
        probe_col, "left_semi")


def bloom_selectivity(probe: DataFrame, build: DataFrame, probe_col: str,
                      build_col: str, m_bits: int = 1 << 16,
                      k: int = 3) -> dict:
    """Diagnostic: probe rows before/after the prefilter and after the
    exact join (false-positive accounting for sizing decisions)."""
    words = bloom_build(build, build_col, m_bits=m_bits, k=k)
    tested = with_bloom_test(probe, probe_col, words, k=k)
    n_total = probe.count()
    n_pass = tested.where(F.col("__bloom_hit")).count()
    n_true = probe.join(
        build.select(F.col(build_col).alias(probe_col)).distinct(),
        probe_col, "left_semi").count()
    return {"probe_rows": n_total, "bloom_pass": n_pass,
            "true_matches": n_true,
            "false_positives": n_pass - n_true}
