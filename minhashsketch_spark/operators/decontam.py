"""Benchmark decontamination: flag/drop corpus documents that share long
token n-grams with an evaluation set.

Every serious LLM training-data pipeline runs this (the GPT-3 paper's
13-gram filter is the canonical configuration): a training document that
contains a verbatim benchmark span corrupts downstream evals. This is a
distinct op from dedup — the reference set is EXTERNAL and tiny relative
to the corpus, and the output is a per-document contamination report plus
a filtered corpus.

Scale shape (10^12-doc corpus vs a 10^3..10^5-doc benchmark):

* the benchmark's distinct n-gram key set is a DIMENSION (an eval suite is
  a few MB of text -> ~10^6 grams) — broadcast to every executor; the
  corpus is never shuffled for the match.
* the corpus side is one narrow projection (tokenize -> n-gram keys) and
  an explode; only MATCHED rows (a vanishing fraction) reach the per-doc
  aggregation shuffle.
* n-gram keys are 60-bit md5-prefix bigints (sampling.hash60_expr's
  construction — cross-engine identical, so the DuckDB oracle is exact;
  8-byte join keys, never raw strings). A key collision can only ADD a
  false contamination hit (conservative direction for decontamination);
  P ~ (benchmark grams * corpus grams) / 2^60.
* tokenization is the repo's Java-\\s-exact convention (same as simhash),
  and the token array is materialized in its own projection before the
  n-gram lambda references it (the round-3 O(n^2) re-evaluation hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import ensure_parallelism


def _with_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col), toks.alias("_toks"))


def _gram_keys_col(n: int):
    """array column of 60-bit n-gram keys over the materialized ``_toks``
    column (empty when the doc has < n tokens — F.sequence would otherwise
    step -1, the round-3 ANSI hazard)."""
    gram = lambda i: F.conv(
        F.substring(F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n))),
                    1, 15), 16, 10).cast("bigint")
    return F.when(
        F.size("_toks") >= n,
        F.transform(F.sequence(F.lit(0), F.size("_toks") - n), gram)
    ).otherwise(F.array().cast("array<bigint>"))


def ngram_keys(docs: DataFrame, n: int = 13, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, gram_key) — one row per n-gram occurrence."""
    return (_with_tokens(docs, id_col, text_col)
            .select(F.col(id_col), F.explode(_gram_keys_col(n)).alias("gram_key")))


def contamination_stats(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_text_col: str = "text",
                        min_distinct_hits: int = 1) -> DataFrame:
    """Per-document contamination report vs the benchmark set:
    (id, n_ngrams, n_matched, n_matched_distinct, contaminated).

    ``contaminated`` = shares >= ``min_distinct_hits`` distinct n-grams
    with the benchmark (1 = the GPT-3-style any-13-gram rule). The
    benchmark frame only needs ``bench_text_col``.
    """
    bench = benchmark.select(F.col(bench_text_col).alias("text")) \
        .withColumn("_bid", F.monotonically_increasing_id())
    bench_set = F.broadcast(
        ngram_keys(bench, n, id_col="_bid").select("gram_key").distinct())

    corpus = _with_tokens(docs, id_col, text_col)
    matched = (corpus.select(F.col(id_col),
                             F.explode(_gram_keys_col(n)).alias("gram_key"))
               .join(bench_set, "gram_key"))
    per_doc = matched.groupBy(id_col).agg(
        F.count("*").alias("n_matched"),
        F.countDistinct("gram_key").alias("n_matched_distinct"))
    spine = corpus.select(
        F.col(id_col),
        F.greatest(F.size("_toks") - (n - 1), F.lit(0))
        .cast("bigint").alias("n_ngrams"))
    return (
        spine.join(per_doc, id_col, "left")
        .select(F.col(id_col), "n_ngrams",
                F.coalesce("n_matched", F.lit(0)).cast("bigint").alias("n_matched"),
                F.coalesce("n_matched_distinct", F.lit(0)).cast("bigint")
                .alias("n_matched_distinct"))
        .withColumn("contaminated",
                    F.col("n_matched_distinct") >= min_distinct_hits)
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text",
                  min_distinct_hits: int = 1) -> DataFrame:
    """Corpus minus contaminated docs — an anti-join on the (small) flagged
    id set; the surviving documents' bytes pass through untouched (the
    corpus is never shuffled, the input_hint byte-identity invariant)."""
    bad = (contamination_stats(docs, benchmark, n, id_col, text_col,
                               bench_text_col, min_distinct_hits)
           .filter("contaminated").select(id_col))
    return docs.join(bad, id_col, "left_anti")
