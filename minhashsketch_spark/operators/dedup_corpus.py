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

    Scale shape (r6 — the corpus text never shuffles, mirroring
    exact_dedup_corpus): the ONLY shuffle is the per-line document
    frequency over (doc_id, xxhash64(line)) int pairs — the line strings
    are projected away before the exchange. The resulting boilerplate key
    set (lines repeated across >= min_df docs: headers, nav bars, cookie
    banners — a corpus-wide DIMENSION by the same argument that makes
    decontam's benchmark grams broadcastable; hash collisions merge two
    distinct lines' counts with P ~ n^2/2^64, which can only over-drop a
    boilerplate-lookalike line) is aggregated into one sorted array row
    and broadcast; cleaning is then a NARROW per-row
    split/filter/array_join against that array — no anti-join carrying
    line strings, no per-doc reassembly shuffle (the r5 shape paid two
    full-corpus text exchanges here).

    Empty documents have one empty line ([""]) — if "" is boilerplate
    (min_df docs are empty/blank-lined) those lines drop like any other;
    a doc whose every line drops yields the empty string (md5 of "").
    """
    from ..partitioning import ensure_parallelism

    # (doc_id, lh) int pairs: project the line string away BEFORE any
    # exchange (ensure_parallelism repartitions the already-hashed frame)
    line_keys = ensure_parallelism(
        docs.select(F.col(id_col), F.col(text_col))
        .select(F.col(id_col),
                F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
        .select(F.col(id_col), F.xxhash64("line").alias("lh")))
    line_df = (line_keys.distinct()
               .groupBy("lh").agg(F.count("*").alias("df")))
    # one row holding every boilerplate key, sorted (deterministic plan)
    boiler = (line_df.filter(F.col("df") >= min_df)
              .agg(F.sort_array(F.collect_list("lh")).alias("_boiler")))
    arr = F.split(F.col(text_col), "\n")
    kept = F.filter(arr, lambda ln: ~F.coalesce(
        F.array_contains("_boiler", F.xxhash64(ln)), F.lit(False)))
    cleaned = F.coalesce(F.array_join(kept, "\n"), F.lit(""))
    return (
        docs.select(F.col(id_col), F.col(text_col))
        # 1-row dimension: a broadcast nested-loop join, no corpus shuffle
        .crossJoin(F.broadcast(boiler))
        .select(
            F.col(id_col),
            F.size(arr).alias("n_lines"),
            F.coalesce(F.size(kept), F.lit(0)).cast("bigint").alias("n_kept"),
            F.md5(cleaned).alias("cleaned_md5"),
            F.length(cleaned).alias("cleaned_len"),
        )
    )
