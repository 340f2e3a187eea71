"""Deterministic HyperLogLog: approximate COUNT DISTINCT whose every bit is
reproducible -- across partitionings, retries, AND engines.

Spark's built-in ``approx_count_distinct`` (HLL++) and DuckDB's
``approx_count_distinct`` use different hashes and bias tables, so their
estimates can never be compared exactly.  This implementation fixes both:

* the hash is a 3-round xorshift-multiply 32-bit finalizer (the public
  "lowbias32" constants from Wellons' hash-prospector search) -- chosen
  over the repo's curation mix-hash because ANY chain of affine rounds
  modulo one prime collapses algebraically to a single affine map, so
  sequential ids form a perfect lattice and the leading-zero statistics
  HLL depends on are destroyed (measured: -23% at n=5000).  The xorshift
  rounds are non-linear; both multipliers are < 2^31 so every intermediate
  stays below 2^63 (ANSI-safe, BIGINT-replayable);
* the register value ("rho" = leading-zero count + 1) is a pure integer
  CASE ladder -- no log2(), no float anywhere in the sketch;
* the harmonic mean is computed as the INTEGER sum ``S = sum(2^(25 - M))``
  over the m registers (each term <= 2^24, sum <= m * 2^25 -- exact BIGINT,
  order-independent, unlike a float sum of 2^-M terms whose rounding would
  depend on aggregation order);
* the final estimate ``alpha * m^2 * 2^25 / S`` is ONE IEEE division of
  exactly-agreed operands -- bit-identical cross-engine (the repo
  float-parity policy).

This is the raw HLL estimator (Flajolet et al. 2007) without the
small-range/large-range corrections (those need ln(), which is not
bit-portable; with m = 256 registers the raw estimator's standard error is
~1.04/sqrt(m) = 6.5%, and the driver query reports the EXACT distinct count
alongside for visible calibration).

100 TB shape: the sketch is two map-side-combinable aggregates
(max per register, then sum per group) over (group, bucket, rho) longs --
the canonical distributed-sketch plan; register count m = 2^p bounds state
at m longs per group regardless of input size.  The hash is staged pure-JVM
projections (the cells.with_cell discipline: small plan, no Python).

Reference scope note: haskell-postgis is a geometry codec library; sketches
belong to the training-data-pipeline mandate (SURVEY.md section 2.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK = 0xFFFFFFFF       # 2^32 - 1
_MUL1 = 0x21F0AAAD       # lowbias32 round-1 multiplier (< 2^31)
_MUL2 = 0x735A2D97       # lowbias32 round-2 multiplier (< 2^31)
_RHO_BITS = 24           # hash32 output < 2^32; w = h // m < 2^24 for m = 256
_K = _RHO_BITS + 1


def _alpha(m: int) -> float:
    # standard HLL bias constant for m >= 128
    return 0.7213 / (1.0 + 1.079 / m)


def _hash32_stages(df: DataFrame, src_col: str,
                   groups: Sequence[str]) -> DataFrame:
    """lowbias32 over a non-negative int64 id, folded to 32 bits, as staged
    projections producing column ``__x`` in [0, 2^32).  Staged selects keep
    the analyzed plan linear in rounds (no 2^rounds expression blowup)."""
    x = F.col("__x")
    stages = [
        F.shiftright(F.col(src_col), 32).bitwiseXOR(F.col(src_col))
        .bitwiseAND(F.lit(_MASK)),
        x.bitwiseXOR(F.shiftright(x, 16)),
        (x * _MUL1).bitwiseAND(F.lit(_MASK)),
        x.bitwiseXOR(F.shiftright(x, 15)),
        (x * _MUL2).bitwiseAND(F.lit(_MASK)),
        x.bitwiseXOR(F.shiftright(x, 15)),
    ]
    out = df.select(*groups, stages[0].alias("__x"))
    for s in stages[1:]:
        out = out.select(*groups, s.alias("__x"))
    return out


def _rho(w: Column) -> Column:
    """Integer CASE ladder: position of the leading 1-bit of ``w`` within a
    24-bit field, as rho = leading_zeros + 1 in [1, 25] (w == 0 -> 25)."""
    expr = F.lit(_K)
    # descending thresholds so the FIRST matching when() wins in the chain
    for r in range(_RHO_BITS, 0, -1):          # r = 24 .. 1
        expr = F.when(w >= (1 << (_RHO_BITS - r)), F.lit(r)).otherwise(expr)
    return expr


def _rho_sql(w: str) -> str:
    cases = " ".join(
        f"WHEN {w} >= {1 << (_RHO_BITS - r)} THEN {r}"
        for r in range(1, _RHO_BITS + 1))      # ascending = same semantics
    return f"CASE {cases} ELSE {_K} END"


def approx_count_distinct(df: DataFrame, value_col: str,
                          group_cols: Sequence[str] = (),
                          p: int = 8) -> DataFrame:
    """Per-group deterministic-HLL distinct estimate of ``value_col``
    (non-negative integer ids).  Output: group cols + ``harmonic_sum``
    (the exact integer sketch state), ``n_registers_hit``,
    ``approx_distinct``."""
    m = 1 << p
    groups = list(group_cols)
    hashed = _hash32_stages(df, value_col, groups)
    regs = (
        hashed.select(*groups,
                      F.pmod(F.col("__x"), F.lit(m)).alias("__bucket"),
                      _rho(F.expr(f"__x DIV {m}")).alias("__rho"))
        .groupBy(*groups, "__bucket").agg(F.max("__rho").alias("__M"))
    )
    # integer-exact harmonic sum: present registers contribute 2^(K - M),
    # absent registers contribute 2^K each.  F.shiftleft's Python signature
    # wants an int shift; the SQL form accepts a column shift amount.
    s_present = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_K} - __M)")).cast("long")
    n_hit = F.count("*").cast("long")
    out = regs.groupBy(*groups).agg(
        s_present.alias("__sp"), n_hit.alias("n_registers_hit"))
    s_total = (F.col("__sp")
               + (F.lit(m) - F.col("n_registers_hit")) * F.lit(1 << _K))
    num = _alpha(m) * float(m * m) * float(1 << _K)
    return (
        out.withColumn("harmonic_sum", s_total.cast("long"))
        .withColumn("approx_distinct",
                    F.lit(num) / F.col("harmonic_sum").cast("double"))
        .select(*groups, "harmonic_sum", "n_registers_hit",
                "approx_distinct")
    )


def approx_count_distinct_sql(table_sql: str, value_col: str,
                              group_cols: Sequence[str] = (),
                              p: int = 8) -> str:
    """The identical sketch in DuckDB SQL (BIGINT arithmetic throughout;
    DuckDB's bitwise xor is the ``xor()`` function -- its ``^`` operator is
    exponentiation; the one float constant renders via synth.sql_double)."""
    from ..synth import sql_double

    m = 1 << p
    groups = list(group_cols)
    gsel = (", ".join(groups) + ", ") if groups else ""
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    gby_b = "GROUP BY " + ", ".join(groups + ["__bucket"]) if groups \
        else "GROUP BY __bucket"
    steps = [
        f"(xor(({value_col} >> 32), {value_col}) & {_MASK})",
        "xor(__x, (__x >> 16))",
        f"((__x * {_MUL1}) & {_MASK})",
        "xor(__x, (__x >> 15))",
        f"((__x * {_MUL2}) & {_MASK})",
        "xor(__x, (__x >> 15))",
    ]
    ctes = [f"__x0 AS (SELECT {gsel}{steps[0]} AS __x FROM ({table_sql}))"]
    for i, s in enumerate(steps[1:], 1):
        ctes.append(f"__x{i} AS (SELECT {gsel}{s} AS __x FROM __x{i - 1})")
    last = f"__x{len(steps) - 1}"
    num = _alpha(m) * float(m * m) * float(1 << _K)
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
__hash AS (
  SELECT {gsel}__x % {m} AS __bucket,
         {_rho_sql(f"(__x // {m})")} AS __rho
  FROM {last}
),
__regs AS (
  SELECT {gsel}__bucket, MAX(__rho) AS __M FROM __hash {gby_b}
),
__agg AS (
  SELECT {gsel}
         CAST(SUM(1::BIGINT << ({_K} - __M)) AS BIGINT) AS __sp,
         COUNT(*) AS n_registers_hit
  FROM __regs {gby}
)
SELECT {gsel}
       CAST(__sp + ({m} - n_registers_hit) * {1 << _K} AS BIGINT)
         AS harmonic_sum,
       n_registers_hit,
       {sql_double(num)}
         / CAST(__sp + ({m} - n_registers_hit) * {1 << _K} AS DOUBLE)
         AS approx_distinct
FROM __agg"""
