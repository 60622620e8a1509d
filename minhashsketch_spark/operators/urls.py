"""URL operators — the crawl pipeline's step zero, before any content
dedup: canonicalize URLs (the same page is crawled as HTTP://Example.COM:80/a
and http://example.com/a), collapse URL-level duplicates, and drop
blocklisted domains.

All pure Column expressions (narrow, zero shuffle for the normalize/filter
forms; one hash-agg shuffle for the dedup stats) built ONLY from string
ops whose semantics are identical in Spark and DuckDB (lower,
substring_index/split_part, simple RE2-compatible regexes) so the oracle
replays them verbatim.

Canonicalization choices (documented, deliberately minimal — crawl
canonicalizers disagree beyond this core):
* strip the fragment (#...)
* lowercase scheme and host:port (path/query keep their case)
* drop the scheme's default port (:80 for http, :443 for https)
* drop a trailing "?" (empty query)
* empty path -> "/"
* un-parseable strings (no scheme://) pass through fragment-stripped
Query parameters are NOT reordered or dropped (utm-stripping etc. is
site-policy, not canonicalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_PAT = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^#]*)$"


def normalize_url_expr(url_col: str = "url"):
    """The canonical URL as a pure Column expression."""
    u = F.substring_index(F.col(url_col), "#", 1)
    scheme = F.lower(F.regexp_extract(u, _URL_PAT, 1))
    hostport = F.lower(F.regexp_extract(u, _URL_PAT, 2))
    rest = F.regexp_extract(u, _URL_PAT, 3)
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport))
    rest = F.regexp_replace(rest, r"\?$", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return (F.when(scheme == "", u)
            .otherwise(F.concat(scheme, F.lit("://"), hostport, rest)))


def host_expr(url_col: str = "url"):
    """Lowercased host (no port) of a URL; '' when un-parseable. The
    fragment is stripped first — the anchored pattern's [^#]* tail would
    otherwise fail to match any URL carrying one."""
    u = F.substring_index(F.col(url_col), "#", 1)
    hostport = F.lower(F.regexp_extract(u, _URL_PAT, 2))
    return F.substring_index(hostport, ":", 1)


def url_dedup_stats(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(norm_url, n_variants, keeper_url): URL-level duplicate groups under
    canonicalization; keeper = lexicographic min raw URL (deterministic).
    One hash-agg shuffle on the normalized key — at crawl scale this is
    the cheapest dedup in the pipeline and runs before any content work."""
    return (
        docs.select(F.col(url_col),
                    normalize_url_expr(url_col).alias("norm_url"))
        .groupBy("norm_url")
        .agg(F.count("*").alias("n_variants"),
             F.min(url_col).alias("keeper_url"))
    )


def domain_stats(docs: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-domain crawl dashboard: (host, n_docs, n_dup_docs, n_chars) —
    the dup column counts docs whose exact content appears in >= 2 docs
    corpus-wide, so boilerplate/mirror farms jump out per host.

    Plan: md5 fingerprint -> corpus-wide fingerprint counts (one hash-agg)
    -> join back -> per-host agg. Both shuffles are over 16-byte keys /
    hosts, never raw text."""
    d = docs.select(host_expr(url_col).alias("host"),
                    F.md5(F.col(text_col)).alias("fp"),
                    F.length(F.col(text_col)).alias("len"))
    fp_n = d.groupBy("fp").agg(F.count("*").alias("fp_count"))
    return (
        d.join(fp_n, "fp")
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"),
             F.sum((F.col("fp_count") >= 2).cast("bigint")).alias("n_dup_docs"),
             F.sum("len").alias("n_chars"))
    )


def filter_blocked_domains(docs: DataFrame, blocked: DataFrame,
                           url_col: str = "url",
                           domain_col: str = "domain") -> DataFrame:
    """Drop documents whose host is in the blocklist. The blocklist is a
    dimension (thousands of rows vs 10^12 docs) — a broadcast LEFT ANTI
    join, so the corpus is never shuffled."""
    b = F.broadcast(blocked.select(F.lower(F.col(domain_col)).alias("_bhost"))
                    .distinct())
    return (docs.withColumn("_host", host_expr(url_col))
            .join(b, F.col("_host") == F.col("_bhost"), "left_anti")
            .drop("_host"))
