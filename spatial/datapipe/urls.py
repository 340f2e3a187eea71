"""URL structure analytics for web-crawl corpora: host / TLD / registered
domain / path depth as pure-JVM column programs, plus per-domain rollups.

Every operator is a composition of built-in string functions (regexp over
patterns valid in BOTH Java regex and RE2, length/replace arithmetic), so
the hot path is whole-stage codegen with zero Python, and the DuckDB
oracle replays the identical expressions.

Why it matters at 100 TB: domain-level statistics drive crawl curation --
per-domain page counts feed quality weighting and rate caps, distinct-host
counts catch mirror farms, path depth separates hubs from leaves.  The
rollup is a two-level hash aggregate keyed by a low-cardinality column
(TLD / registered domain), with partial aggregation map-side; distinct
hosts use the standard two-phase (group by (tld, host), then count) shape
that avoids a count-distinct shuffle of raw rows.

Reference scope note: haskell-postgis is a geometry codec library; URL
analytics belong to the web-corpus mandate (BASELINE.json input_hint:
Common-Crawl-style pages with a url column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround
_HOST_RE = "^[a-z]+://([^/]+)"
_TLD_RE = "([^.]+)$"
_REG_RE = "([^.]+\\.[^.]+)$"


def url_host(url: Column) -> Column:
    """Hostname: the authority between ``scheme://`` and the next slash."""
    return F.regexp_extract(url, _HOST_RE, 1)


def url_tld(url: Column) -> Column:
    """Last dot-label of the host (public-suffix-list-free TLD; a real
    deployment would join a suffix table -- a broadcast dim join)."""
    return F.regexp_extract(url_host(url), _TLD_RE, 1)


def url_registered_domain(url: Column) -> Column:
    """Last two labels of the host (eTLD+1 approximation)."""
    return F.regexp_extract(url_host(url), _REG_RE, 1)


def url_path_depth(url: Column) -> Column:
    """Number of path segments: slashes in the URL minus the two protocol
    slashes (integer arithmetic over length/replace -- no regex)."""
    slashes = F.length(url) - F.length(F.regexp_replace(url, "/", ""))
    return (slashes - 2).cast("long")


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    u = F.col(url_col)
    return (df.withColumn("host", url_host(u))
            .withColumn("tld", url_tld(u))
            .withColumn("reg_domain", url_registered_domain(u))
            .withColumn("path_depth", url_path_depth(u)))


def domain_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-TLD: page count, distinct hosts, max path depth.  Distinct
    hosts via the two-phase (tld, host) pre-aggregation so no raw-row
    count-distinct shuffle."""
    parts = with_url_parts(df, url_col)
    per_host = (parts.groupBy("tld", "host")
                .agg(F.count("*").alias("n_pages_host"),
                     F.max("path_depth").alias("max_depth_host")))
    return (per_host.groupBy("tld")
            .agg(F.sum("n_pages_host").alias("n_pages"),
                 F.count("*").alias("n_hosts"),
                 F.max("max_depth_host").alias("max_path_depth"))
            .orderBy("tld"))


def domain_rollup_oracle_sql(pages_sql: str, url_col: str = "url") -> str:
    """The identical expressions in DuckDB SQL."""
    host = f"regexp_extract({url_col}, '{_HOST_RE}', 1)"
    tld = f"regexp_extract({host}, '{_TLD_RE}', 1)"
    depth = (f"CAST(LENGTH({url_col}) - "
             f"LENGTH(REPLACE({url_col}, '/', '')) - 2 AS BIGINT)")
    return f"""
WITH __parts AS (
  SELECT {tld} AS tld, {host} AS host, {depth} AS path_depth
  FROM ({pages_sql}) __u
),
__per_host AS (
  SELECT tld, host, COUNT(*) AS n_pages_host,
         MAX(path_depth) AS max_depth_host
  FROM __parts GROUP BY tld, host
)
SELECT tld, CAST(SUM(n_pages_host) AS BIGINT) AS n_pages, COUNT(*) AS n_hosts,
       MAX(max_depth_host) AS max_path_depth
FROM __per_host GROUP BY tld ORDER BY tld"""


# ---------------------------------------------------------------------------
# URL canonicalization (crawl dedup key)
# ---------------------------------------------------------------------------
#
# Crawls see the same page under many spellings -- case-variant hosts,
# www. prefixes, default ports, fragments, tracking params, permuted query
# strings, trailing slashes. Exact URL dedup without canonicalization
# over-counts; the canonical form below is the standard normal form (RFC
# 3986 case rules + the usual tracking-param hygiene). Every step is a
# Java-regex/RE2-shared pattern or an array op (split / filter /
# array_sort / concat_ws), so the whole thing is one JVM column program
# replayed verbatim in the DuckDB oracle.

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"


def canonical_url(url: Column) -> Column:
    """URL -> canonical form: lowercase scheme+host, strip ``www.``,
    scheme-default ports, fragments, ``utm_*`` params and trailing
    slashes; sort remaining query params lexicographically."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    after = F.regexp_replace(url, _SCHEME_RE, "")
    nofrag = F.regexp_replace(after, "#.*$", "")
    hostport = F.lower(F.regexp_extract(nofrag, "^([^/?]+)", 1))
    rest = F.regexp_replace(nofrag, "^[^/?]+", "")
    host0 = F.regexp_replace(hostport, "^www\\.", "")
    host = (F.when(scheme == "http", F.regexp_replace(host0, ":80$", ""))
            .when(scheme == "https", F.regexp_replace(host0, ":443$", ""))
            .otherwise(host0))
    path = F.regexp_replace(F.regexp_extract(rest, "^([^?]*)", 1),
                            "/+$", "")
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith("utm_")))
    qcanon = F.when(F.size(params) > 0,
                    F.concat(F.lit("?"), F.concat_ws("&", params))) \
              .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qcanon)


def canonical_url_sql(url_expr: str) -> str:
    """The identical canonicalization in DuckDB SQL (shared-dialect
    regexes, list_sort for the param ordering)."""
    scheme = f"lower(regexp_extract({url_expr}, '{_SCHEME_RE}', 1))"
    after = f"regexp_replace({url_expr}, '{_SCHEME_RE}', '')"
    nofrag = f"regexp_replace({after}, '#.*$', '')"
    hostport = f"lower(regexp_extract({nofrag}, '^([^/?]+)', 1))"
    rest = f"regexp_replace({nofrag}, '^[^/?]+', '')"
    host0 = f"regexp_replace({hostport}, '^www\\.', '')"
    host = (f"CASE WHEN {scheme} = 'http' "
            f"THEN regexp_replace({host0}, ':80$', '') "
            f"WHEN {scheme} = 'https' "
            f"THEN regexp_replace({host0}, ':443$', '') "
            f"ELSE {host0} END")
    path = (f"regexp_replace(regexp_extract({rest}, '^([^?]*)', 1), "
            f"'/+$', '')")
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    params = (f"list_sort(list_filter(string_split({query}, '&'), "
              f"p -> p <> '' AND NOT starts_with(p, 'utm_')))")
    qcanon = (f"CASE WHEN len({params}) > 0 "
              f"THEN '?' || array_to_string({params}, '&') ELSE '' END")
    return f"({scheme} || '://' || {host} || {path} || {qcanon})"


def canonical_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_variants): exact URL dedup after
    canonicalization -- the crawl-frontier dedup key. Map-side-combined
    hash aggregate on the canonical string."""
    return (df.select(canonical_url(F.col(url_col)).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.count("*").alias("n_variants")))
