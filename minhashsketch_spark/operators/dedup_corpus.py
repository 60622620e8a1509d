"""Corpus-level dedup output — the end product of the pipeline: one keeper
per duplicate cluster plus every unclustered doc, with byte-identical text
(the input_hint invariant).

Two variants:
* ``exact_dedup_corpus``   — md5-exact (SQL-expressible, DuckDB oracle)
* ``near_dedup_corpus``    — from the near-dup ``clusters`` table
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_dedup_corpus(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Keep the min-id doc of every exact-content group.

    Scale shape (round-5 rewrite): the old form windowed
    ``row_number() over (partition by md5(text))`` — a full-corpus exchange
    that shuffles the raw text bytes. At 100 TB that is the single most
    expensive stage of ``curate()``. The scale-safe form shuffles only
    (16-byte md5, id): aggregate keepers with ``groupBy(md5).agg(min(id))``
    (map-side partial combine), derive the loser-id set from the duplicate
    groups, and left-anti-join the ids against the unshuffled corpus — the
    same corpus-never-shuffled shape as ``near_dedup_corpus``. Text bytes
    pass through untouched (the input_hint byte-identity invariant).
    """
    fps = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("_fp"))
    keepers = fps.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"),
                                     F.count("*").alias("_n"))
    losers = (
        fps.join(keepers.filter(F.col("_n") >= 2), "_fp")
        .filter(F.col(id_col) != F.col("_keep_id"))
        .select(id_col)
    )
    return docs.join(losers, on=id_col, how="left_anti")


def near_dedup_corpus(docs: DataFrame, clusters: DataFrame,
                      url_col: str = "url") -> DataFrame:
    """docs + clusters(url, cluster_id) -> docs minus non-keeper cluster
    members. Keeper = the doc whose url IS the cluster_id (the
    lexicographic min — how connected_components names clusters).

    Scale: one broadcast-or-SMJ anti join against the (small) loser set;
    the documents table itself is never shuffled or rewritten, so text
    bytes pass through untouched.
    """
    losers = clusters.filter(F.col(url_col) != F.col("cluster_id")).select(url_col)
    return docs.join(losers, on=url_col, how="left_anti")


def near_dedup_corpus_best(docs: DataFrame, clusters: DataFrame,
                           score, url_col: str = "url") -> DataFrame:
    """Quality-aware keeper selection: keep the HIGHEST-``score`` member of
    every near-dup cluster (ties broken by min url — deterministic), not
    the lexicographic-min url. This is what a training-data pipeline
    actually wants: among near-identical pages, keep the cleanest one.

    ``score`` is a pure Column expression over the docs row (e.g.
    text.quality_score_expr()), so scoring happens inline during the single
    join — no extra corpus scan. Plan: clusters (small relative to the
    corpus — only docs in dup clusters appear) join docs on url, one
    window over cluster_id picks the keeper, then a left-anti join removes
    the losers from the corpus; the corpus itself is scanned once and
    never shuffled, the same shape as near_dedup_corpus."""
    members = (docs.join(clusters.select(url_col, "cluster_id"), url_col)
               .withColumn("_s", score))
    w = Window.partitionBy("cluster_id").orderBy(F.desc("_s"), F.asc(url_col))
    losers = (members.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") > 1).select(url_col))
    return docs.join(losers, on=url_col, how="left_anti")


def line_dedup_stats(docs: DataFrame, min_df: int = 2,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """CCNet/Gopher-style LINE-level dedup: drop every line that appears in
    >= ``min_df`` distinct documents (headers, nav bars, cookie banners —
    crawl boilerplate repeats across pages while body text does not), keep
    the rest in original order.

    Returns (doc_id, n_lines, n_kept, cleaned_md5, cleaned_len): counts and
    a fingerprint of the cleaned text rather than the text itself — callers
    reconstructing the corpus join the kept-lines aggregation back to the
    table; the stats form is what quality dashboards and the oracle check.

    Scale shape: posexplode lines -> per-line document frequency over an
    8-byte xxhash64 key (lines can be long; the df join must shuffle 8-byte
    keys, not raw strings — hash collisions merge two distinct lines'
    counts with P ~ n^2/2^64, which can only over-drop a single boilerplate
    -lookalike line) -> broadcast-or-SMJ join of the boilerplate key set ->
    per-doc ordered reassembly via array_sort over (pos, line) structs.
    Two shuffles (line-df agg, per-doc agg); both AQE-coalesced.

    Empty documents have one empty line ([""]) — if "" is boilerplate
    (min_df docs are empty/blank-lined) those lines drop like any other;
    a doc whose every line drops yields the empty string (md5 of ""), the
    same convention the DuckDB oracle's spine join uses.
    """
    from ..partitioning import ensure_parallelism

    lines = (
        ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col),
                F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
        .withColumn("lh", F.xxhash64("line"))
    )
    # document frequency per distinct line (count each doc once)
    line_df = (lines.select(id_col, "lh").distinct()
               .groupBy("lh").agg(F.count("*").alias("df")))
    boiler = line_df.filter(F.col("df") >= min_df).select("lh")
    kept = lines.join(boiler, "lh", "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"]), "\n").alias("cleaned"),
    )
    spine = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"))
    return (
        spine.join(agg, id_col, "left")
        .select(
            F.col(id_col),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.md5(F.coalesce("cleaned", F.lit(""))).alias("cleaned_md5"),
            F.length(F.coalesce("cleaned", F.lit(""))).alias("cleaned_len"),
        )
    )
