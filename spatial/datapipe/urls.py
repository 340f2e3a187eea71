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
