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
    """Keep the min-id doc of every exact-content group."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


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
