"""robots.txt compliance: parse per-domain robots files into a disallow
dimension and filter crawled documents against it.

A responsible crawl pipeline re-checks robots rules at curation time
(policies change between fetch and training). Semantics implemented — the
subset virtually all robots files use, documented rather than implied:

* line-based; ``#`` comments stripped; directives case-insensitive;
* consecutive ``User-agent:`` lines form a GROUP header; the rules that
  follow (until the next User-agent run) belong to that group;
* only groups whose header includes ``*`` apply (we are a generic crawler);
* ``Disallow: <prefix>`` with a non-empty prefix blocks any URL whose
  path starts with that prefix; empty ``Disallow:`` allows everything;
  ``Allow:`` overrides and wildcards are NOT implemented (declared —
  a blocked Allow-carveout errs on the side of dropping data, the safe
  direction for compliance).

Everything is pure Columns + two windows PER DOMAIN (a robots file is a
few KB — the window partitions are tiny by construction); the resulting
(host, prefix) dimension is broadcast against the corpus, which is never
shuffled (the urls.filter_blocked_domains shape, plus a startswith
predicate on the parsed path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .urls import host_expr


def disallow_rules(robots: DataFrame, domain_col: str = "domain",
                   txt_col: str = "robots_txt") -> DataFrame:
    """(domain, robots_txt) -> (host, prefix): the Disallow prefixes whose
    User-agent group includes ``*``."""
    lines = (robots.select(F.lower(F.col(domain_col)).alias("host"),
                           F.posexplode(F.split(F.col(txt_col), "\n"))
                           .alias("pos", "raw"))
             .withColumn("line", F.trim(F.regexp_replace("raw", "#.*", "")))
             .withColumn("lline", F.lower(F.col("line"))))
    is_ua = F.col("lline").startswith("user-agent:")
    w = Window.partitionBy("host").orderBy("pos")
    # a group starts where a user-agent line follows a non-user-agent line
    grouped = (lines
               .withColumn("_ua", is_ua)
               .withColumn("_start",
                           (F.col("_ua") &
                            ~F.coalesce(F.lag("_ua").over(w), F.lit(False)))
                           .cast("int"))
               .withColumn("grp", F.sum("_start").over(w)))
    star_groups = (grouped.filter(F.col("_ua") &
                                  (F.trim(F.substring_index("line", ":", -1))
                                   == "*"))
                   .select("host", "grp").distinct())
    dis = (grouped.filter(F.col("lline").startswith("disallow:"))
           .withColumn("prefix",
                       F.trim(F.expr("substring(line, 10)")))
           .filter(F.length("prefix") > 0)
           .select("host", "grp", "prefix"))
    return dis.join(star_groups, ["host", "grp"]).select("host", "prefix") \
        .distinct()


def _path_expr(url_col: str):
    """URL -> path (starting '/'; '' when none): strip scheme+authority,
    then the query/fragment."""
    after = F.substring_index(
        F.regexp_replace(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*",
                         ""), "#", 1)
    return F.substring_index(after, "?", 1)


def robots_compliance(docs: DataFrame, robots: DataFrame,
                      url_col: str = "url") -> DataFrame:
    """docs + per-url verdict: (url..., robots_disallowed boolean). The
    rules dimension is aggregated to ONE row per host (prefix array) and
    broadcast, so the verdict is a single broadcast left join plus an
    ``exists`` over the host's prefixes — the corpus is never shuffled.
    (The r5 shape semi-joined for hits and then LEFT-joined the hit set
    back on url: two corpus shuffles for a per-row predicate.)"""
    per_host = F.broadcast(
        disallow_rules(robots)
        .groupBy("host")
        .agg(F.collect_list("prefix").alias("_prefixes")))
    d = docs.withColumn("_host", host_expr(url_col)) \
            .withColumn("_path", _path_expr(url_col))
    path = F.col("_path")
    return (d.join(per_host, F.col("_host") == F.col("host"), "left")
            .withColumn(
                "robots_disallowed",
                F.coalesce(
                    F.exists("_prefixes", lambda p: path.startswith(p)),
                    F.lit(False)))
            .drop("_host", "_path", "host", "_prefixes"))


def filter_robots_disallowed(docs: DataFrame, robots: DataFrame,
                             url_col: str = "url") -> DataFrame:
    """Corpus minus disallowed urls — anti-join against the broadcast rules
    (document bytes pass through untouched)."""
    rules = F.broadcast(disallow_rules(robots))
    d = docs.withColumn("_host", host_expr(url_col)) \
            .withColumn("_path", _path_expr(url_col))
    return (d.join(rules, (F.col("_host") == F.col("host"))
                   & F.col("_path").startswith(F.col("prefix")), "left_anti")
            .drop("_host", "_path"))
