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

from pyspark.sql import Column, DataFrame, Window
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


def _cm_chain(x0: Column) -> Column:
    """The lowbias32 xorshift-multiply chain over an initial 32-bit value,
    as one nested expression (bounded depth: 5 rounds)."""
    x = x0
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = (x * _MUL1).bitwiseAND(F.lit(_MASK))
    x = x.bitwiseXOR(F.shiftright(x, 15))
    x = (x * _MUL2).bitwiseAND(F.lit(_MASK))
    x = x.bitwiseXOR(F.shiftright(x, 15))
    return x


_CM_SALT = 0x9E3779B1    # row salt; row < d <= 8 so x0 + row*salt < 2^36


def _cm_bucket(key: Column, row: Column, w: int) -> Column:
    """Bucket of ``key`` under hash row ``row``: fold the id to 32 bits,
    add a per-row salt, run the non-linear chain, reduce mod w.  The chain
    is non-linear, so the d rows are decorrelated (an affine salt alone
    would collapse -- the HLL lattice lesson above)."""
    k32 = F.shiftright(key, 32).bitwiseXOR(key).bitwiseAND(F.lit(_MASK))
    x0 = (k32 + row * F.lit(_CM_SALT)).bitwiseAND(F.lit(_MASK))
    return F.pmod(_cm_chain(x0), F.lit(w))


def _cm_bucket_sql(key: str, row: str, w: int) -> str:
    steps = f"(xor(({key} >> 32), {key}) & {_MASK})"
    x = f"(({steps} + {row} * {_CM_SALT}) & {_MASK})"
    for s in [f"xor(__X, (__X >> 16))", f"((__X * {_MUL1}) & {_MASK})",
              f"xor(__X, (__X >> 15))", f"((__X * {_MUL2}) & {_MASK})",
              f"xor(__X, (__X >> 15))"]:
        x = s.replace("__X", x)
    return f"({x} % {w})"


def cm_sketch(df: DataFrame, key_col: str, d: int = 4,
              w: int = 1024) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies: a (row, bucket, cnt)
    table with at most d*w cells TOTAL regardless of input size.  Exact
    integer counts -> bit-reproducible at any partitioning.

    100 TB shape: the explode-by-d rows feed a two-level hash aggregate;
    map-side combine collapses every partition to <= d*w cells before the
    shuffle, so the shuffle volume is O(partitions * d * w), independent
    of row count -- the canonical distributed-sketch plan (same as HLL
    above)."""
    rows = df.select(F.col(key_col).alias("__k")).withColumn(
        "row", F.explode(F.sequence(F.lit(0), F.lit(d - 1))))
    return (
        rows.select("row", _cm_bucket(F.col("__k"), F.col("row"), w)
                    .alias("bucket"))
        .groupBy("row", "bucket").agg(F.count("*").alias("cnt"))
    )


def cm_estimate(sketch: DataFrame, candidates: DataFrame, key_col: str,
                d: int = 4, w: int = 1024) -> DataFrame:
    """Point-estimate counts for ``candidates`` (one key per row) against a
    built sketch: est = min over the d rows of the hashed cell's count.
    The sketch side is <= d*w cells -- always broadcast-able; candidates
    stream through without shuffling."""
    probes = candidates.select(F.col(key_col)).withColumn(
        "row", F.explode(F.sequence(F.lit(0), F.lit(d - 1))))
    probes = probes.withColumn(
        "bucket", _cm_bucket(F.col(key_col), F.col("row"), w))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def heavy_hitters(df: DataFrame, key_col: str, threshold: int,
                  d: int = 4, w: int = 1024) -> DataFrame:
    """Keys whose count-min estimate reaches ``threshold`` (CM never
    underestimates, so recall is 1.0 by construction; false positives are
    bounded by the d,w choice).  Candidate generation here enumerates
    distinct keys -- at 100 TB the candidate set comes from a cheap
    prefilter (hash_sample of the keyspace or the previous day's hitters);
    the sketch itself is the bounded-state operator either way."""
    sketch = cm_sketch(df, key_col, d=d, w=w)
    cand = df.select(key_col).distinct()
    return (cm_estimate(sketch, cand, key_col, d=d, w=w)
            .where(F.col("est_count") >= threshold))


def heavy_hitters_oracle_sql(table_sql: str, key_col: str, threshold: int,
                             d: int = 4, w: int = 1024) -> str:
    """The identical sketch + estimate in BIGINT DuckDB SQL."""
    b_build = _cm_bucket_sql(key_col, "t.j", w)
    return f"""
WITH __rows AS (SELECT UNNEST(range({d})) AS j),
__cells AS (
  SELECT t.j AS row, {b_build} AS bucket, COUNT(*) AS cnt
  FROM ({table_sql}) __src, __rows t
  GROUP BY 1, 2
),
__cand AS (SELECT DISTINCT {key_col} FROM ({table_sql}) __src2),
__probe AS (
  SELECT c.{key_col}, t.j AS row, {_cm_bucket_sql(f'c.{key_col}', 't.j', w)} AS bucket
  FROM __cand c, __rows t
),
__est AS (
  SELECT p.{key_col},
         MIN(COALESCE(s.cnt, 0)) AS est_count
  FROM __probe p LEFT JOIN __cells s
    ON p.row = s.row AND p.bucket = s.bucket
  GROUP BY p.{key_col}
)
SELECT {key_col}, est_count FROM __est WHERE est_count >= {threshold}"""


def fixed_histogram(df: DataFrame, value_col: str, lo: float, width: float,
                    n_bins: int) -> DataFrame:
    """Fixed-bin histogram of a double column: bin = clamp(floor((v - lo) /
    width)), plus per-bin count and min/max.  With a dyadic ``width`` the
    bin computation is mul/add + floor -- deterministic IEEE ops replayed
    identically in SQL; counts are integers and min/max of doubles are
    order-independent, so the whole summary is bit-reproducible.

    This is the distributed quantile-summary primitive: one map-side
    combinable aggregate with at most n_bins output rows; quantiles read
    off the cumulative counts without a sort of the data."""
    inv = 1.0 / width                 # exact for dyadic width
    raw = F.floor((F.col(value_col) - F.lit(lo)) * F.lit(inv))
    bin_ = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw)).cast("long")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(bin_.alias("bin"), F.col(value_col).alias("__v"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"),
             F.min("__v").alias("v_min"), F.max("__v").alias("v_max"))
        .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(width))
        .select("bin", "bin_lo", "n", "v_min", "v_max")
    )


def fixed_histogram_sql(table_sql: str, value_col: str, lo: float,
                        width: float, n_bins: int) -> str:
    """The identical binning in DuckDB SQL (same op order; sql_double
    renders the float constants exactly)."""
    from ..synth import sql_double

    inv = sql_double(1.0 / width)
    lo_s = sql_double(lo)
    w_s = sql_double(width)
    raw = f"FLOOR(({value_col} - {lo_s}) * {inv})"
    bin_ = f"CAST(GREATEST(0, LEAST({n_bins - 1}, {raw})) AS BIGINT)"
    return f"""
WITH __b AS (
  SELECT {bin_} AS bin, {value_col} AS __v
  FROM ({table_sql}) __src WHERE {value_col} IS NOT NULL
)
SELECT bin, {lo_s} + bin * {w_s} AS bin_lo, COUNT(*) AS n,
       MIN(__v) AS v_min, MAX(__v) AS v_max
FROM __b GROUP BY bin"""


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


def histogram_quantiles(df: DataFrame, value_col: str, lo: float,
                        width: float, n_bins: int,
                        qs: Sequence[float]) -> DataFrame:
    """Distributed approximate quantiles from the fixed-bin histogram:
    (q, n_le, est) where ``est`` is the lower edge of the bin containing
    the ceil(q*N)-th value and ``n_le`` the cumulative count through it.

    Scale shape: the data pays ONE map-side-combinable histogram aggregate
    (<= n_bins rows out); the quantile selection is a window + join over
    that n_bins-row summary -- never a sort or percentile shuffle of the
    raw column. The summary is mergeable across partitions/streams by
    construction (integer bin counts add). Error is bounded by the bin
    width; tighten by narrowing [lo, lo + n_bins*width) around the mass.

    Determinism: bin indices are the dyadic-width mul/add/floor program of
    fixed_histogram; the rank target is CEIL(q * N) (one IEEE multiply of
    exact operands); bin selection is integer comparisons; ``est`` is
    lo + bin*width (exact dyadic arithmetic) -- all replayed verbatim in
    the DuckDB oracle."""
    hist = fixed_histogram(df, value_col, lo, width, n_bins)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    cum = hist.select("bin", "bin_lo", "n") \
              .withColumn("n_le", F.sum("n").over(w))
    tot = cum.agg(F.sum("n").alias("__N"))
    qdf = (df.sparkSession.range(1)
           .select(F.explode(F.array(*[F.lit(float(q)) for q in qs]))
                   .alias("q"))
           .crossJoin(tot)
           .withColumn("__t", F.greatest(
               F.lit(1).cast("long"),
               F.ceil(F.col("q") * F.col("__N")).cast("long"))))
    return (
        qdf.join(cum, (F.col("n_le") >= F.col("__t"))
                 & (F.col("n_le") - F.col("n") < F.col("__t")))
        .select("q", "n_le", F.col("bin_lo").alias("est"))
    )


def histogram_quantiles_sql(table_sql: str, value_col: str, lo: float,
                            width: float, n_bins: int,
                            qs: Sequence[float]) -> str:
    """The identical summary + selection in DuckDB SQL."""
    from ..synth import sql_double

    hist = fixed_histogram_sql(table_sql, value_col, lo, width, n_bins)
    qvals = ", ".join(f"({sql_double(float(q))})" for q in qs)
    return f"""
WITH __h AS ({hist}),
__c AS (
  SELECT bin, bin_lo, n,
         SUM(n) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n_le
  FROM __h
),
__tot AS (SELECT SUM(n) AS __N FROM __h),
__q AS (
  SELECT q, GREATEST(1, CAST(CEIL(q * __N) AS BIGINT)) AS __t
  FROM (VALUES {qvals}) AS __qs(q) CROSS JOIN __tot
)
SELECT q, CAST(n_le AS BIGINT) AS n_le, bin_lo AS est
FROM __q JOIN __c ON n_le >= __t AND n_le - n < __t"""


def approx_distinct_cumulative(df: DataFrame, value_col: str,
                               time_col: str, p: int = 8) -> DataFrame:
    """Time-cumulative deterministic-HLL: for every day, the distinct
    estimate over ALL rows up to and including it -- computed by MERGING
    the per-day register sets (register merge = elementwise MAX), never by
    re-scanning history.  This is the property that makes a sketch a
    sketch: daily states are tiny (<= m longs), and the running estimate
    is a summary-side window over the |days| x m grid -- the
    incremental/streaming "distinct users to date" plan whose exact
    counterpart needs the full id history every day.

    Determinism: identical lowbias32 hash + integer rho as
    approx_count_distinct; merge is MAX (order-free); the per-day harmonic
    sum stays an exact integer; one IEEE division per day.  Output:
    (day, harmonic_sum, approx_distinct)."""
    m = 1 << p
    base = df.select(F.date_trunc("day", F.col(time_col)).alias("__day"),
                     F.col(value_col))
    hashed = _hash32_stages(base, value_col, ["__day"])
    daily = (
        hashed.select("__day", F.pmod(F.col("__x"), F.lit(m)).alias("__bucket"),
                      _rho(F.expr(f"__x DIV {m}")).alias("__rho"))
        .groupBy("__day", "__bucket").agg(F.max("__rho").alias("__M"))
    )
    # day x observed-bucket grid so each day sees every bucket's history
    days = daily.select("__day").distinct()
    buckets = daily.select("__bucket").distinct()
    grid = (days.crossJoin(buckets)
            .join(daily, ["__day", "__bucket"], "left"))
    w = Window.partitionBy("__bucket").orderBy("__day") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grid.withColumn("__Mc", F.max("__M").over(w))  # max ignores nulls
    per_day = (
        cum.groupBy("__day")
        .agg(F.sum(F.when(F.col("__Mc").isNull(), F.lit(1 << _K))
                   .otherwise(F.expr(
                       f"shiftleft(CAST(1 AS BIGINT), {_K} - __Mc)")))
             .alias("__sp"),
             F.count("*").alias("__nb"))
    )
    s_total = F.col("__sp") + (F.lit(m) - F.col("__nb")) * F.lit(1 << _K)
    num = _alpha(m) * float(m * m) * float(1 << _K)
    return (
        per_day.withColumn("harmonic_sum", s_total.cast("long"))
        .withColumn("approx_distinct",
                    F.lit(num) / F.col("harmonic_sum").cast("double"))
        .select(F.col("__day").alias("day"), "harmonic_sum",
                "approx_distinct")
    )


def approx_distinct_cumulative_sql(table_sql: str, value_col: str,
                                   time_col: str, p: int = 8) -> str:
    """The identical cumulative merge in DuckDB SQL (BIGINT throughout;
    day CAST to TIMESTAMP to match Spark's date_trunc type)."""
    from ..synth import sql_double

    m = 1 << p
    steps = [
        f"(xor(({value_col} >> 32), {value_col}) & {_MASK})",
        "xor(__x, (__x >> 16))",
        f"((__x * {_MUL1}) & {_MASK})",
        "xor(__x, (__x >> 15))",
        f"((__x * {_MUL2}) & {_MASK})",
        "xor(__x, (__x >> 15))",
    ]
    ctes = [f"""__x0 AS (
  SELECT CAST(date_trunc('day', {time_col}) AS TIMESTAMP) AS __day,
         {steps[0]} AS __x FROM ({table_sql}))"""]
    for i, s in enumerate(steps[1:], 1):
        ctes.append(f"__x{i} AS (SELECT __day, {s} AS __x FROM __x{i - 1})")
    last = f"__x{len(steps) - 1}"
    num = _alpha(m) * float(m * m) * float(1 << _K)
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
__daily AS (
  SELECT __day, __x % {m} AS __bucket,
         MAX({_rho_sql(f"(__x // {m})")}) AS __M
  FROM {last} GROUP BY __day, __x % {m}
),
__days AS (SELECT DISTINCT __day FROM __daily),
__buckets AS (SELECT DISTINCT __bucket FROM __daily),
__grid AS (
  SELECT d.__day, b.__bucket, dd.__M
  FROM __days d CROSS JOIN __buckets b
  LEFT JOIN __daily dd ON dd.__day = d.__day AND dd.__bucket = b.__bucket
),
__cum AS (
  SELECT __day, __bucket,
         MAX(__M) OVER (PARTITION BY __bucket ORDER BY __day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS __Mc
  FROM __grid
),
__agg AS (
  SELECT __day,
         CAST(SUM(CASE WHEN __Mc IS NULL THEN {1 << _K}
                       ELSE (1::BIGINT << ({_K} - __Mc)) END) AS BIGINT)
           AS __sp,
         COUNT(*) AS __nb
  FROM __cum GROUP BY __day
)
SELECT __day AS day,
       CAST(__sp + ({m} - __nb) * {1 << _K} AS BIGINT) AS harmonic_sum,
       {sql_double(num)}
         / CAST(__sp + ({m} - __nb) * {1 << _K} AS DOUBLE) AS approx_distinct
FROM __agg"""


def grouped_histogram_quantiles(df: DataFrame, value_col: str,
                                group_cols: Sequence[str], lo: float,
                                width: float, n_bins: int,
                                qs: Sequence[float]) -> DataFrame:
    """Per-GROUP mergeable quantiles: the histogram_quantiles plan with the
    group key threaded through every stage -- the data still pays exactly
    ONE map-side-combinable aggregate (groups x n_bins rows out), and the
    selection windows/joins run over that summary only. This is the shape
    that answers "p50/p95 per language over 10^12 docs" without a
    per-group percentile sort. Output: group cols + (q, n_le, est)."""
    groups = list(group_cols)
    inv = 1.0 / width
    raw = F.floor((F.col(value_col) - F.lit(lo)) * F.lit(inv))
    bin_ = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw)).cast("long")
    hist = (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, bin_.alias("bin"))
        .groupBy(*groups, "bin").agg(F.count("*").alias("n"))
        .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(width))
    )
    w = Window.partitionBy(*groups).orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.withColumn("n_le", F.sum("n").over(w))
    tot = hist.groupBy(*groups).agg(F.sum("n").alias("__N"))
    qdf = (tot.select(*groups, "__N",
                      F.explode(F.array(*[F.lit(float(q)) for q in qs]))
                      .alias("q"))
           .withColumn("__t", F.greatest(
               F.lit(1).cast("long"),
               F.ceil(F.col("q") * F.col("__N")).cast("long"))))
    cond = (F.col("n_le") >= F.col("__t")) \
        & (F.col("n_le") - F.col("n") < F.col("__t"))
    joined = qdf.join(cum, groups).where(cond)
    return joined.select(*groups, "q",
                         F.col("n_le").cast("long").alias("n_le"),
                         F.col("bin_lo").alias("est"))


def grouped_histogram_quantiles_sql(table_sql: str, value_col: str,
                                    group_cols: Sequence[str], lo: float,
                                    width: float, n_bins: int,
                                    qs: Sequence[float]) -> str:
    """The identical grouped summary + selection in DuckDB SQL."""
    from ..synth import sql_double

    g = ", ".join(group_cols)
    inv = sql_double(1.0 / width)
    lo_s = sql_double(lo)
    w_s = sql_double(width)
    raw = f"FLOOR(({value_col} - {lo_s}) * {inv})"
    bin_ = f"CAST(GREATEST(0, LEAST({n_bins - 1}, {raw})) AS BIGINT)"
    qvals = ", ".join(sql_double(float(q)) for q in qs)
    on = " AND ".join(f"c.{col} = __q.{col}" for col in group_cols)
    gsel = ", ".join(f"c.{col}" for col in group_cols)
    return f"""
WITH __h AS (
  SELECT {g}, {bin_} AS bin, COUNT(*) AS n,
         {lo_s} + {bin_} * {w_s} AS bin_lo
  FROM ({table_sql}) __src WHERE {value_col} IS NOT NULL
  GROUP BY {g}, bin, bin_lo
),
__c AS (
  SELECT {g}, bin, bin_lo, n,
         SUM(n) OVER (PARTITION BY {g} ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n_le
  FROM __h
),
__tot AS (SELECT {g}, SUM(n) AS __N FROM __h GROUP BY {g}),
__q AS (
  SELECT {g}, q, GREATEST(1, CAST(CEIL(q * __N) AS BIGINT)) AS __t
  FROM __tot CROSS JOIN (SELECT unnest([{qvals}]) AS q) __qs
)
SELECT {gsel}, __q.q, CAST(c.n_le AS BIGINT) AS n_le, c.bin_lo AS est
FROM __q JOIN __c c ON {on}
WHERE c.n_le >= __q.__t AND c.n_le - c.n < __q.__t"""
