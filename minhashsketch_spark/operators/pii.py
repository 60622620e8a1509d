"""PII scrubbing: detect and redact emails / phone numbers / IPv4
addresses in document text — the compliance pass every public-crawl
training pipeline runs before anything ships.

Pure-Column ``regexp_replace``/``regexp_count`` (whole-stage codegen,
narrow map, zero shuffle — the only plan that survives 10^12 rows). The
patterns are deliberately restricted to the regex subset that Java
(Spark) and RE2 (DuckDB) evaluate identically — no backreferences, no
lookaround, no possessive quantifiers — so the DuckDB oracle is exact.
Redaction replaces each match with a fixed token (<EMAIL>/<PHONE>/<IP>),
preserving surrounding bytes; detection-only callers get integer counts
(oracle-friendly, no text crosses the compare boundary).

Order matters: emails first (an email's domain must not be half-eaten by
the IP pattern), then IPs, then phones (the loosest pattern last so it
cannot swallow parts of the structured matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# dialect-shared subset: character classes, bounded repetition, alternation
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = (r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
           r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}")
# international-ish phone: optional +CC, then 3 groups of digits with
# -/./space separators, 7+ digits total — anchored on separators so plain
# long numbers (ids, years) don't false-positive
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{2,4}[-. ][0-9]{2,6}"

_ORDERED = [("email", EMAIL_RE, "<EMAIL>"),
            ("ip", IPV4_RE, "<IP>"),
            ("phone", PHONE_RE, "<PHONE>")]


def pii_counts(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, n_emails, n_ips, n_phones, has_pii) — detection only, all
    integers/booleans (exact across engines). Counts follow the same
    redaction order (each pattern counts on the text with the previous
    kinds already redacted), so n_ips never double-counts an email's
    dotted domain."""
    out = docs.select(F.col(id_col), F.col(text_col).alias("_t"))
    counts = []
    for name, pat, token in _ORDERED:
        out = out.withColumn(f"n_{name}s", F.regexp_count("_t", F.lit(pat)))
        out = out.withColumn("_t", F.regexp_replace("_t", pat, token))
        counts.append(f"n_{name}s")
    return out.select(
        F.col(id_col), *[F.col(c).cast("bigint").alias(c) for c in counts],
        (sum(F.col(c) for c in counts) > 0).alias("has_pii"))


def pii_report(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, n_emails, n_ips, n_phones, has_pii, scrubbed) in ONE projection.

    The per-kind counts are taken on the progressively-redacted text, so
    the text after the last replace IS ``scrub_pii``'s output — computing
    counts and scrubbed text as two operators and joining them back (the
    r5 driver-query shape) ran the three-regex chain twice and paid a
    corpus shuffle for the join; this is the same expressions once, as a
    narrow map (guide §2.4)."""
    out = docs.select(F.col(id_col), F.col(text_col).alias("_t"))
    counts = []
    for name, pat, token in _ORDERED:
        out = out.withColumn(f"n_{name}s", F.regexp_count("_t", F.lit(pat)))
        out = out.withColumn("_t", F.regexp_replace("_t", pat, token))
        counts.append(f"n_{name}s")
    return out.select(
        F.col(id_col), *[F.col(c).cast("bigint").alias(c) for c in counts],
        (sum(F.col(c) for c in counts) > 0).alias("has_pii"),
        F.col("_t").alias("scrubbed"))


def scrub_pii(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """docs with ``text_col`` redacted in place (or into ``out_col``):
    every email/IP/phone match replaced by its fixed token. Bytes outside
    matches pass through untouched."""
    s = F.col(text_col)
    for _, pat, token in _ORDERED:
        s = F.regexp_replace(s, pat, token)
    return docs.withColumn(out_col or text_col, s)
