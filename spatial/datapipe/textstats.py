"""Text analysis for training-data pipelines -- JVM-side where possible.

Every function here is a deterministic column program (whole-stage codegen;
no Python) except where noted. Designed for the ``documents`` table shape
(doc_id, text, lang, source, n_chars) but any text column works.

* ``token_count``   -- whitespace tokenization, plus a BPE-ish regex variant
                       that splits punctuation from words.
* ``quality_score`` -- [0,1] heuristic from length, alpha ratio, mean word
                       length, and stopword hit-rate: the standard cheap
                       pre-filter before expensive dedup/training.
* ``lang_id``       -- stopword-overlap heuristic over 8 languages; pure
                       column expressions (array_intersect against literal
                       stopword arrays), argmax by chained greatest().
* ``fingerprint64`` -- order-sensitive 64-bit document fingerprint:
                       xxhash64 of the word-normalized text (rolling-hash
                       equivalent class: same normalized content <=> same
                       fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "für", "auf", "nicht"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "dans", "pour", "que"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "es", "por", "con"],
    "pt": ["o", "a", "os", "de", "que", "e", "em", "é", "por", "com"],
    "it": ["il", "la", "di", "che", "e", "in", "è", "per", "con", "non"],
    "nl": ["de", "het", "een", "van", "en", "is", "dat", "op", "te", "niet"],
    "ru": ["и", "в", "не", "на", "что", "я", "с", "это", "как", "по"],
}


def words(text: Column) -> Column:
    """Lower-cased whitespace word array (empty array for blank text)."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token proxy: words and punctuation runs count separately."""
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"(\s+|(?<=\W)(?=\w)|(?<=\w)(?=\W))"),
        lambda w: w != "",
    )
    return F.size(toks)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    ws = words(text)
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    ws = words(text)
    return F.when(
        F.size(ws) > 0,
        F.aggregate(ws, F.lit(0).cast("double"),
                    lambda acc, w: acc + F.length(w)) / F.size(ws),
    ).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    total = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-zÀ-ɏ ]", ""))
    return F.when(total > 0, alpha / total).otherwise(F.lit(0.0))


def quality_score(text: Column, lang: str = "en") -> Column:
    """[0,1]; equal-weight blend of four bounded signals."""
    n = token_count(text)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    mwl = mean_word_len(text)
    wl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.3))
    return (len_score + wl_score + alpha_ratio(text) + stopword_ratio(text, lang)) / F.lit(4.0)


def lang_id(text: Column) -> Column:
    """Argmax stopword-hit language; 'und' (undetermined) when no hits."""
    ws = words(text)
    scores = {}
    for lang, sw_list in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in sw_list])
        scores[lang] = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (deterministic priority order)
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint64(text: Column) -> Column:
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\W+", " ")
    return F.xxhash64(normalized)


def ngrams(text: Column, n: int = 2) -> Column:
    """Lower-cased alphabetic word n-grams (space-joined), pure JVM: split
    on ``[^a-z]+``, drop empties, slide an n-window via transform/element_at.
    Empty array when the text has fewer than n tokens (sequence() would
    otherwise generate a DESCENDING range -- guarded)."""
    toks = F.filter(F.split(F.lower(text), r"[^a-z]+"), lambda w: w != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j)
                                     for j in range(n)]))
    return F.when(F.size(toks) >= n, grams) \
        .otherwise(F.array().cast("array<string>"))


def top_ngrams(df: DataFrame, n: int = 2, k: int = 20,
               text_col: str = "text") -> DataFrame:
    """Corpus-level top-k n-grams: (ngram, n_occurrences, rank).

    Scale shape: the count aggregate is a normal map-side-combined shuffle
    on the (short) ngram string; the global top-k uses orderBy+limit, which
    Spark executes as TakeOrderedAndProject (per-partition partial top-k
    merged on the driver) -- NOT a single-task global sort over all distinct
    ngrams. Ties broken (count desc, ngram asc): a total order, so the
    result is deterministic and SQL-oracle-able."""
    counts = (
        df.select(F.explode(ngrams(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram").agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
    return counts.withColumn("rank", F.row_number().over(w).cast("int"))


def tfidf_topk(df: DataFrame, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-document top-k salient terms by TF-IDF: (doc_id, term, tf,
    doc_freq, rank, score).

    The idf factor is the BM25-style RATIONAL odds form
        score = tf * (N - doc_freq + 0.5) / (doc_freq + 0.5)
               = tf * (2N - 2*doc_freq + 1) / (2*doc_freq + 1)
    rather than the log form: numerator and denominator are exact small
    integers, so the score is ONE IEEE division of exact operands --
    bit-identical in Spark and DuckDB (the repo float-parity policy), where
    ln() differs in the last ulp between libm implementations.  Ranking is
    integer-deterministic (tf desc, doc_freq asc, term asc), so the top-k
    cut never depends on float comparison.

    Scale shape: tokenize+explode is map-side; the (doc, term) count and
    the doc_freq count are two map-side-combined aggregates; N arrives via
    a crossJoin with a 1-row aggregate (broadcast by the planner); top-k is
    one window pass partitioned by doc -- no driver actions, no Python."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda w: w != "")
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    ndocs = tf.select(F.countDistinct(id_col).alias("__n"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("doc_freq").asc(), F.col("term").asc())
    return (
        tf.join(dfreq, "term").crossJoin(ndocs)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .withColumn("score",
                    (F.col("tf") * (2 * F.col("__n") - 2 * F.col("doc_freq") + 1)
                     ).cast("double") / (2 * F.col("doc_freq") + 1).cast("double"))
        .select(id_col, "term", "tf", "doc_freq", "rank", "score")
    )


def with_textstats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_pred", lang_id(t))
        .withColumn("fp64", fingerprint64(t))
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (zero-shuffle per-document design)
# ---------------------------------------------------------------------------

def _grams_from(toks: Column, n: int) -> Column:
    """Word n-grams from an already-tokenized array column (same windowing
    as ``ngrams``, without re-splitting the text)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j)
                                     for j in range(n)]))
    return F.when(F.size(toks) >= n, grams) \
        .otherwise(F.array().cast("array<string>"))


def _rep_rle(sorted_grams: Column, n: int) -> Column:
    """Run-length scan over a SORTED gram array -> struct(top, dup, total):
    ``top``   = chars in the most repeated n-gram (count * gram chars,
                separator spaces excluded),
    ``dup``   = chars across n-grams occurring >= 2 times,
    ``total`` = chars across all n-gram occurrences.
    All integers -- the fractions downstream are ONE exact-operand IEEE
    division each (repo float-parity policy). Equal grams are adjacent
    after array_sort, so one aggregate() pass with a (prev, run) carry
    counts every gram's occurrences without any shuffle."""
    zero = F.lit(0).cast("long")

    def close(acc):
        # chars contributed by the run that just ended (0 when run == 0)
        return acc["run"] * (F.length(acc["prev"]) - (n - 1))

    def merge(acc, g):
        same = acc["prev"] == g
        c = close(acc)
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
             .alias("run"),
            F.when(same, acc["top"]).otherwise(F.greatest(acc["top"], c))
             .alias("top"),
            F.when(same | (acc["run"] < 2), acc["dup"]).otherwise(acc["dup"] + c)
             .alias("dup"),
            F.when(same, acc["total"]).otherwise(acc["total"] + c)
             .alias("total"),
        )

    def finish(acc):
        c = close(acc)
        return F.struct(
            F.greatest(acc["top"], c).alias("top"),
            F.when(acc["run"] < 2, acc["dup"]).otherwise(acc["dup"] + c)
             .alias("dup"),
            (acc["total"] + c).alias("total"),
        )

    init = F.struct(F.lit("").alias("prev"), zero.alias("run"),
                    zero.alias("top"), zero.alias("dup"), zero.alias("total"))
    return F.aggregate(sorted_grams, init, merge, finish)


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics a la Gopher's quality filters:

    * ``word_chars``     -- total chars across alphabetic tokens,
    * ``top2_char_frac`` -- chars in the single most-repeated word bigram /
                            word_chars,
    * ``dup3_char_frac`` -- chars in word trigrams occurring >= 2 times /
                            chars in all trigram occurrences.

    Scale shape: repetition is PER-DOCUMENT state, so the whole computation
    is a zero-shuffle column program -- tokenize, build the gram arrays,
    array_sort them, and run-length-count in one higher-order aggregate()
    per row (whole-stage codegen, no Python, no explode+groupBy shuffle of
    the token stream). At 10^12 docs the alternative (explode grams +
    groupBy(doc, gram)) shuffles ~2x the corpus; this shuffles nothing.
    Fractions are exact-integer divisions (one IEEE op), hence bit-equal
    to the DuckDB oracle replay.

    Reference scope note: the reference (haskell-postgis) is a geometry
    codec library with no text analytics; this operator belongs to the
    engine's web-corpus curation surface (SURVEY.md section 2.3)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda w: w != "")
    s1 = df.withColumn("__rp_t", toks)
    t = F.col("__rp_t")
    s2 = s1.withColumns({
        "__rp_wc": F.coalesce(
            F.aggregate(t, F.lit(0).cast("long"),
                        lambda acc, w: acc + F.length(w)),
            F.lit(0).cast("long")),
        "__rp_a2": _rep_rle(F.array_sort(_grams_from(t, 2)), 2),
        "__rp_a3": _rep_rle(F.array_sort(_grams_from(t, 3)), 3),
    })
    wc, a2, a3 = F.col("__rp_wc"), F.col("__rp_a2"), F.col("__rp_a3")
    return s2.select(
        F.col(id_col),
        wc.alias("word_chars"),
        F.when(wc > 0, a2["top"].cast("double") / wc.cast("double"))
         .otherwise(F.lit(0.0)).alias("top2_char_frac"),
        F.when(a3["total"] > 0,
               a3["dup"].cast("double") / a3["total"].cast("double"))
         .otherwise(F.lit(0.0)).alias("dup3_char_frac"),
    )


def pmi_bigrams(df: DataFrame, k: int = 30, min_count: int = 5,
                text_col: str = "text") -> DataFrame:
    """Top-k collocations by pointwise mutual information over word
    bigrams: (w1, w2, n_pair, n_w1, n_w2, rank, score) -- the classic
    phrase-mining / tokenizer-merge-candidate pass over a web corpus.

    Float-parity design: instead of log [P(xy) / (P(x)P(y))] the score is
    the RATIONAL odds form
        score = (n_pair * N_uni^2) / (N_bigrams * n_w1 * n_w2)
    -- numerator and denominator are each one exact BIGINT product, so the
    score is ONE IEEE int64->double conversion pair + ONE division,
    bit-identical in Spark and DuckDB (ln() is not). Monotone in PMI, so
    the ranking is the PMI ranking. Exact while N_bigrams * n_w1 * n_w2
    < 2^63 (holds through ~10^6-token-vocab corpora of 3M tokens; beyond
    that, pre-divide by gcd or rank on the log form with a rounded
    tie-margin). Ranking ties break on (w1, w2) -- a total order, so the
    top-k cut is deterministic.

    Scale shape: unigram and bigram counts are two map-side-combined
    aggregates over exploded short strings; the totals arrive via crossJoin
    with 1-row aggregates (planner broadcasts); min_count prunes the long
    tail BEFORE the count-joins (the bucket-guard discipline); the global
    top-k is orderBy+limit = TakeOrderedAndProject, never a full sort."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda w: w != "")
    base = df.select(toks.alias("__ts")).where(F.size("__ts") > 0)
    uni = (base.select(F.explode("__ts").alias("w"))
           .groupBy("w").agg(F.count("*").alias("n_w")))
    pairs = (base.select(F.explode(_grams_from(F.col("__ts"), 2)).alias("g"))
             .groupBy("g").agg(F.count("*").alias("n_pair"))
             .where(F.col("n_pair") >= min_count)
             .withColumn("w1", F.split(F.col("g"), " ")[0])
             .withColumn("w2", F.split(F.col("g"), " ")[1]))
    n_uni = uni.agg(F.sum("n_w").alias("__nu"))
    n_bi = (base.select((F.greatest(F.size("__ts") - 1, F.lit(0)))
                 .alias("nb")).agg(F.sum("nb").alias("__nb")))
    scored = (
        pairs
        .join(uni.withColumnRenamed("w", "w1")
                 .withColumnRenamed("n_w", "n_w1"), "w1")
        .join(uni.withColumnRenamed("w", "w2")
                 .withColumnRenamed("n_w", "n_w2"), "w2")
        .crossJoin(n_uni).crossJoin(n_bi)
        .withColumn("score",
                    (F.col("n_pair") * F.col("__nu") * F.col("__nu"))
                    .cast("double")
                    / (F.col("__nb") * F.col("n_w1") * F.col("n_w2"))
                    .cast("double"))
        .orderBy(F.col("score").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("w1").asc(),
                       F.col("w2").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("w1", "w2", "n_pair", "n_w1", "n_w2", "rank", "score"))


def lm_score(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Corpus-self-trained bigram-LM quality score (perplexity proxy): the
    CCNet/Gopher-style statistical filter -- docs whose word sequences are
    improbable under a language model score high negative log-likelihood
    (gibberish, boilerplate soup, OCR noise) and get cut before training.
    Here the LM is trained on the corpus itself in the SAME job (two count
    aggregates), the honest self-contained variant: no external model.

    Model: Laplace-smoothed bigram,  P(w2|w1) = (C12 + 1) / (C1 + V)
    with C12 = corpus bigram count, C1 = corpus count of w1 as a bigram
    prefix, V = corpus distinct-token vocabulary.  Per doc with n >= 1
    bigrams the result is the total negative log-likelihood.

    Float-parity design (oracle policy): ln() is NOT IEEE-portable, and a
    per-doc SUM of doubles is aggregation-order-dependent.  Both are
    eliminated by quantizing ln of each *integer count* to micronats:

        L(c)      = floor(ln(c) * 1e6)            (BIGINT)
        li        = L(C12 + 1) - L(C1 + V)        (exact long)
        nll_micro = -sum(li * m)                  (exact long sum)

    Only ln of EXACT SMALL INTEGERS is ever taken, so the set of distinct
    ln arguments is the distinct-count set (thousands, not millions) and a
    cross-engine ulp flip would have to land within ~1e-9 of a floor
    boundary to matter -- far from boundaries in the policy's sense.  The
    long sum is order-free, so output is bit-exact and integer-only.

    Scale shape (100 TB): token/bigram counts are two map-side-combined
    aggregates; the doc stream is pre-aggregated per (doc, gram) so the
    count-joins carry distinct grams per doc, not raw positions; V arrives
    as a broadcast 1-row aggregate; joins are string-keyed with AQE skew
    handling (stopword-pair grams are hot); output is one integer row per
    doc -- no floats and no text ever shuffle past tokenization."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z]+"),
                    lambda w: w != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("__ts"))
    vocab = (base.select(F.explode("__ts").alias("w"))
             .agg(F.count_distinct("w").alias("__v")))
    big = (base.where(F.size("__ts") >= 2)
           .select("id", F.explode(_grams_from(F.col("__ts"), 2)).alias("g"))
           .groupBy("id", "g").agg(F.count("*").alias("m"))
           .withColumn("w1", F.split(F.col("g"), " ")[0]))
    c12 = big.groupBy("g").agg(F.sum("m").alias("c12"))
    c1 = big.groupBy("w1").agg(F.sum("m").alias("c1"))

    def _ln_micro(c: Column) -> Column:
        return F.floor(F.log(c.cast("double")) * F.lit(1000000.0)) \
                .cast("long")

    scored = (big.join(c12, "g").join(c1, "w1").crossJoin(vocab)
              .withColumn("__li",
                          _ln_micro(F.col("c12") + F.lit(1))
                          - _ln_micro(F.col("c1") + F.col("__v"))))
    return (scored.groupBy("id")
            .agg(F.sum("m").cast("int").alias("n_bigrams"),
                 (-F.sum(F.col("__li") * F.col("m"))).alias("nll_micro"))
            .select(F.col("id").alias("doc_id"), "n_bigrams", "nll_micro"))


def lm_score_oracle_sql(docs_cte: str) -> str:
    """DuckDB replay of lm_score: identical tokenization (the PMI regex),
    identical counts, the identical L(c) = floor(ln(c)*1e6) quantization of
    integer counts, exact BIGINT sums."""
    return f"""
WITH __toks AS (
  SELECT id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         t -> t <> '') AS ts
  FROM ({docs_cte}) WHERE text IS NOT NULL),
__vocab AS (SELECT COUNT(DISTINCT w) AS v
            FROM (SELECT unnest(ts) AS w FROM __toks)),
__big AS (
  SELECT id, g, COUNT(*) AS m FROM (
    SELECT id, unnest(list_transform(generate_series(1, len(ts) - 1),
                                     i -> ts[i] || ' ' || ts[i+1])) AS g
    FROM __toks WHERE len(ts) >= 2) __g
  GROUP BY id, g),
__c12 AS (SELECT g, SUM(m) AS c12 FROM __big GROUP BY g),
__c1 AS (SELECT string_split(g, ' ')[1] AS w1, SUM(m) AS c1
         FROM __big GROUP BY 1),
__s AS (
  SELECT b.id, b.m,
         CAST(FLOOR(LN(CAST(c.c12 + 1 AS DOUBLE)) * 1000000.0) AS BIGINT)
       - CAST(FLOOR(LN(CAST(p.c1 + v.v AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS li
  FROM __big b
  JOIN __c12 c USING (g)
  JOIN __c1 p ON p.w1 = string_split(b.g, ' ')[1]
  CROSS JOIN __vocab v)
SELECT id AS doc_id, CAST(SUM(m) AS INT) AS n_bigrams,
       CAST(-SUM(li * m) AS BIGINT) AS nll_micro
FROM __s GROUP BY id"""
